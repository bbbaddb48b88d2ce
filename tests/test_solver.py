"""Solver tests: full (recon, b_norm, delta[, MSE]) traces vs the golden
numpy loop; early stop; hybrid schedule; convergence on synthetic noisy data
(SURVEY.md §4.2)."""

import numpy as np
import pytest

import golden
from cytvdn_tpu import denoise3D, denoise4D

RNG = np.random.default_rng(7)


def make_cube(shape, dtype=np.float64):
    return (RNG.standard_normal(shape) * 0.5 + 2.0).astype(dtype)


def run_golden(cube, mu, lam_div, n_f, n_u, **kw):
    lam = mu / lam_div
    return golden.solve(cube, 1.0 / lam, lam / mu, n_f, n_u, **kw)


def test_denoise3d_unaccelerated_traces():
    cube = make_cube((6, 7, 8))
    mu = np.full(3, 0.8)
    want = run_golden(cube, mu, 16.0, 0, 12)
    got = denoise3D(cube, mu, iterations=12, quiet=True)
    for g, w in zip(got, want):
        np.testing.assert_allclose(g, w, rtol=1e-10, atol=1e-12)


def test_denoise3d_fista_traces():
    cube = make_cube((6, 7, 8))
    mu = np.full(3, 0.8)
    want = run_golden(cube, mu, 16.0, 10, 0)
    got = denoise3D(cube, mu, iterations=10, FISTA=True, quiet=True)
    for g, w in zip(got, want):
        np.testing.assert_allclose(g, w, rtol=1e-10, atol=1e-12)


def test_denoise4d_fista_traces_with_mse():
    cube = make_cube((4, 5, 6, 7))
    ref = make_cube((4, 5, 6, 7))
    mu = np.full(4, 1.0)
    want = run_golden(cube, mu, 32.0, 8, 0, reference_data=ref)
    got = denoise4D(cube, mu, iterations=8, reference_data=ref, quiet=True)
    assert len(got) == 4
    for g, w in zip(got, want):
        np.testing.assert_allclose(g, w, rtol=1e-10, atol=1e-12)


def test_denoise4d_hybrid_schedule():
    """iterations=(n_fista, n_unacc) runs FISTA then unaccelerated sharing
    accumulators (reference cyTVDN.py:100-108)."""
    cube = make_cube((4, 5, 6, 7))
    mu = np.full(4, 1.0)
    want = run_golden(cube, mu, 32.0, 5, 4)
    got = denoise4D(cube, mu, iterations=(5, 4), FISTA=False, quiet=True)
    for g, w in zip(got, want):
        np.testing.assert_allclose(g, w, rtol=1e-10, atol=1e-12)


def test_denoise4d_isotropic_traces():
    cube = make_cube((4, 5, 6, 7))
    mu = np.full(4, 1.0)
    want = run_golden(cube, mu, 32.0, 6, 0, isotropic_R=True, isotropic_Q=True)
    got = denoise4D(
        cube, mu, iterations=6, isotropic_R=True, isotropic_Q=True, quiet=True
    )
    for g, w in zip(got, want):
        np.testing.assert_allclose(g, w, rtol=1e-10, atol=1e-12)


@pytest.mark.parametrize("bc", [0, 1, 2])
def test_denoise3d_bc_modes(bc):
    cube = make_cube((6, 7, 8))
    mu = np.full(3, 0.8)
    want = run_golden(cube, mu, 16.0, 0, 6, bc=bc)
    got = denoise3D(cube, mu, iterations=6, BC_mode=bc, quiet=True)
    for g, w in zip(got, want):
        np.testing.assert_allclose(g, w, rtol=1e-10, atol=1e-12)


def test_early_stop_pads_traces_with_zeros():
    """After early stop the remaining trace entries stay zero
    (reference cyTVDN.py:127-128, 189-194)."""
    cube = make_cube((6, 7, 8))
    mu = np.full(3, 0.8)
    stop = 0.05
    want = run_golden(cube, mu, 16.0, 0, 500, stopping=stop)
    got = denoise3D(
        cube, mu, iterations=500, stopping_relative_change=stop, quiet=True
    )
    for g, w in zip(got, want):
        np.testing.assert_allclose(g, w, rtol=1e-9, atol=1e-12)
    # the stop actually triggered well before 500
    nz = np.nonzero(got[2])[0]
    assert len(nz) < 400
    assert got[2][nz[-1]] < stop


def test_float32_path():
    cube = make_cube((6, 7, 8), dtype=np.float32)
    mu = np.full(3, 0.8, dtype=np.float32)
    want = run_golden(cube.astype(np.float64), mu.astype(np.float64), 16.0, 0, 10)
    recon, b_norm, delta = denoise3D(cube, mu, iterations=10, quiet=True)
    assert recon.dtype == np.float32
    np.testing.assert_allclose(recon, want[0], rtol=1e-4, atol=1e-5)


def test_denoising_improves_snr():
    """Monotone convergence oracle (the reference author's implied
    validation, SURVEY.md §4): denoising a noisy piecewise-constant cube
    moves it toward the clean cube, and delta decreases."""
    clean = np.zeros((8, 8, 32))
    clean[:, :, 16:] = 1.0
    noisy = clean + RNG.standard_normal(clean.shape) * 0.2
    mu = np.full(3, 2.0)
    recon, b_norm, delta, mse = denoise3D(
        noisy, mu, iterations=60, FISTA=True, reference_data=clean, quiet=True
    )
    assert mse[-1] < mse[0] * 0.5
    assert delta[-1] < delta[2]


def test_param_validation():
    cube = make_cube((6, 7, 8))
    with pytest.raises(ValueError):
        denoise3D(cube, np.full(3, 0.8), lam=np.full(3, 0.8), iterations=2,
                  quiet=True)  # λ/μ = 1 > 1/16
    with pytest.raises(TypeError):
        denoise3D(cube.astype(np.int32), np.full(3, 0.8), iterations=2,
                  quiet=True)
    with pytest.raises(TypeError):
        denoise3D(cube, np.full(3, 0.8, dtype=np.float32), iterations=2,
                  quiet=True)  # mu dtype mismatch


def test_presets():
    from cytvdn_tpu.presets import denoise_preset, get_preset, PRESETS

    assert set(get_preset("stem4d")) >= {"iterations", "FISTA"}
    import pytest as _pytest
    with _pytest.raises(KeyError):
        get_preset("nope")
    cube = make_cube((6, 7, 8), dtype=np.float64)
    mu = np.full(3, 0.8)
    r, bn, dl = denoise_preset(cube, mu, "eels3d", iterations=5, quiet=True)
    assert r.shape == cube.shape


def test_fista_only_early_stop_metadata():
    """Regression: a pure-FISTA run that early-stops must report the true
    iteration count and the early_stopped flag (previously the phase
    boundary overwrote both even with no second phase scheduled)."""
    import jax.numpy as jnp
    from cytvdn_tpu.config import SolverOptions
    from cytvdn_tpu.solver.engine import run_solver

    cube = make_cube((6, 7, 8))
    mu = np.full(3, 0.8)
    lam = mu / 16.0
    opts = SolverOptions(ndim=3, iterations_fista=50, iterations_unacc=0,
                         stopping_relative_change=0.5)
    out = run_solver(jnp.asarray(cube), jnp.asarray(1 / lam),
                     jnp.asarray(lam / mu), opts)
    n_run = int(out["iterations_run"])
    assert bool(out["early_stopped"])
    assert n_run < 50
    assert np.count_nonzero(np.asarray(out["delta"])) == n_run


def test_float32_drift_bounded_over_long_runs():
    """SURVEY.md §7 hard part 5: the 1e-5 rel-L2 float32 parity target must
    hold over thousands of iterations. The proximal iteration is
    contractive, so f32-vs-f64 divergence saturates (~4e-8 measured at
    7500 iterations); assert an order-of-magnitude margin."""
    cube64 = make_cube((12, 12, 32))
    mu64 = np.full(3, 1.0)
    r64 = denoise3D(cube64, mu64, iterations=1000, quiet=True)[0]
    r32 = denoise3D(cube64.astype(np.float32), mu64.astype(np.float32),
                    iterations=1000, quiet=True)[0]
    rel = np.linalg.norm(r32.astype(np.float64) - r64) / np.linalg.norm(r64)
    assert rel < 1e-6


def test_fista_restart_converges_and_defaults_unchanged():
    """Opt-in adaptive FISTA restart: produces a valid (often faster)
    converging run; the default path stays bit-identical to before."""
    cube = make_cube((8, 8, 32))
    mu = np.full(3, 1.0)
    base = denoise3D(cube, mu, iterations=80, FISTA=True, quiet=True)
    rest = denoise3D(cube, mu, iterations=80, FISTA=True, quiet=True,
                     fista_restart=True)
    # both converge to similar reconstructions
    rel = np.linalg.norm(rest[0] - base[0]) / np.linalg.norm(base[0])
    assert rel < 0.05
    # restart run's tail delta is no worse than 3x the baseline's
    assert rest[2][-1] < max(base[2][-1] * 3, 1e-3)
    # default path unchanged vs golden (momentum schedule untouched)
    want = run_golden(cube, mu, 16.0, 12, 0)
    got = denoise3D(cube, mu, iterations=12, FISTA=True, quiet=True)
    np.testing.assert_allclose(got[0], want[0], rtol=1e-10, atol=1e-12)
