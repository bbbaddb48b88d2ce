"""VMEM-resident whole-run kernel (kernels/resident.py): every iteration
inside one pallas launch must reproduce the streaming (K=1 fused) path
bit-for-bit on recon/accs, with traces equal to reduction-grouping ulps.

All runs use interpret mode (CPU CI); the compiled-on-TPU check lives in
tests/manual_fused_check.py / TPU_FUSED_PARITY.json.
"""

import numpy as np
import pytest
import jax.numpy as jnp

from cytvdn_tpu.config import Backend, BCMode, SolverOptions
from cytvdn_tpu.kernels import resident as R
from cytvdn_tpu.solver.engine import _resolve_resident, run_solver


def _state(shape, seed=0):
    rng = np.random.default_rng(seed)
    ndim = len(shape)
    orig = jnp.asarray(rng.standard_normal(shape) * 0.4 + 1.0,
                       dtype=jnp.float32)
    li = jnp.asarray(np.full(ndim, 32.0, np.float32))
    lm = jnp.asarray(np.full(ndim, 1 / 32.0, np.float32))
    return orig, li, lm


CASES = [
    ((8, 6, 64), (5, 0)),        # 3D single layout, FISTA
    ((8, 6, 64), (0, 6)),        # 3D unaccelerated
    ((8, 6, 64), (3, 4)),        # hybrid (rho=0 tail in fista mode)
    ((6, 5, 256), (4, 0)),       # 3D flat-fold layout
    ((6, 4, 6, 16), (4, 0)),     # 4D FISTA
    ((6, 4, 6, 16), (0, 3)),     # 4D unaccelerated
]


@pytest.mark.parametrize("shape,iters", CASES)
def test_resident_matches_streaming(shape, iters):
    """Full schedules through the engine: the resident path must equal
    the streaming fused path bit-for-bit on the recon."""
    orig, li, lm = _state(shape, seed=7)
    base = dict(ndim=len(shape), iterations_fista=iters[0],
                iterations_unacc=iters[1], backend=Backend.PALLAS)
    want = run_solver(orig, li, lm,
                      SolverOptions(**base, vmem_resident=False))
    opts_r = SolverOptions(**base, vmem_resident=True)
    assert _resolve_resident(opts_r, shape, jnp.float32, None)[0]
    got = run_solver(orig, li, lm, opts_r)
    assert int(got["iterations_run"]) == int(want["iterations_run"])
    np.testing.assert_array_equal(np.asarray(got["recon"]),
                                  np.asarray(want["recon"]))
    np.testing.assert_allclose(np.asarray(got["b_norm"]),
                               np.asarray(want["b_norm"]), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(got["delta"]),
                               np.asarray(want["delta"]), rtol=1e-4)


@pytest.mark.parametrize("iters", [(6, 0), (0, 6), (3, 4)])
def test_resident_mse_matches_streaming(iters):
    """Per-iteration MSE rides the resident kernel (reference cube in
    one extra VMEM window): recon exact, mse trace equal to
    reduction-grouping ulps vs the streaming K=1 MSE loop."""
    shape = (8, 6, 64)
    orig, li, lm = _state(shape, seed=23)
    rng = np.random.default_rng(24)
    ref = jnp.asarray(rng.standard_normal(shape).astype(np.float32))
    base = dict(ndim=3, iterations_fista=iters[0],
                iterations_unacc=iters[1], backend=Backend.PALLAS,
                calculate_mse=True)
    opts_r = SolverOptions(**base, vmem_resident=True,
                           temporal_pairs=False)
    assert _resolve_resident(opts_r, shape, jnp.float32, None)[0], \
        "the resident gate must accept MSE configs"
    got = run_solver(orig, li, lm, opts_r, reference_data=ref)
    want = run_solver(orig, li, lm,
                      SolverOptions(**base, vmem_resident=False,
                                    temporal_pairs=False),
                      reference_data=ref)
    np.testing.assert_array_equal(np.asarray(got["recon"]),
                                  np.asarray(want["recon"]))
    assert np.all(np.asarray(got["mse"]) > 0)
    np.testing.assert_allclose(np.asarray(got["mse"]),
                               np.asarray(want["mse"]), rtol=1e-5)


def test_resident_chunks_mse(monkeypatch):
    """Stop-aware resident chunks record the mse trace too — and the
    chunks must actually run (spy), not silently fall back."""
    from cytvdn_tpu.kernels import resident as RR

    calls = []
    real = RR.resident_solve

    def spy(*a, **k):
        calls.append(k.get("ref") is not None)
        return real(*a, **k)

    monkeypatch.setattr(RR, "resident_solve", spy)
    # engine imports resident_solve inside the function body from the
    # module, so patching the module attribute is enough
    shape = (8, 6, 64)
    orig, li, lm = _state(shape, seed=29)
    rng = np.random.default_rng(30)
    ref = jnp.asarray(rng.standard_normal(shape).astype(np.float32))
    base = dict(ndim=3, iterations_fista=40, iterations_unacc=0,
                backend=Backend.PALLAS, calculate_mse=True,
                stopping_relative_change=1e-8)
    got = run_solver(orig, li, lm,
                     SolverOptions(**base, vmem_resident=True,
                                   temporal_pairs=False),
                     reference_data=ref)
    assert calls and all(calls), "resident chunks must run with ref"
    want = run_solver(orig, li, lm,
                      SolverOptions(**base, vmem_resident=False,
                                    temporal_pairs=False),
                      reference_data=ref)
    assert int(got["iterations_run"]) == int(want["iterations_run"])
    np.testing.assert_array_equal(np.asarray(got["recon"]),
                                  np.asarray(want["recon"]))
    np.testing.assert_allclose(np.asarray(got["mse"]),
                               np.asarray(want["mse"]), rtol=1e-5)


def test_resident_keep_state_matches():
    """keep_state outputs (accs/ds) must match the streaming path."""
    shape = (8, 6, 64)
    orig, li, lm = _state(shape, seed=11)
    base = dict(ndim=3, iterations_fista=5, iterations_unacc=0,
                backend=Backend.PALLAS)
    want = run_solver(orig, li, lm,
                      SolverOptions(**base, vmem_resident=False),
                      keep_state=True)
    got = run_solver(orig, li, lm, SolverOptions(**base),
                     keep_state=True)
    for k in range(3):
        np.testing.assert_array_equal(np.asarray(got["accs"][k]),
                                      np.asarray(want["accs"][k]))
        np.testing.assert_array_equal(np.asarray(got["ds"][k]),
                                      np.asarray(want["ds"][k]))


def test_resident_state_resume_matches():
    """resident_solve with a state input must continue exactly where a
    fresh run left off (split 8 = 5 + 3)."""
    shape = (8, 6, 64)
    orig, li, lm = _state(shape, seed=19)
    rhos = np.linspace(0.0, 0.6, 8).astype(np.float32)
    full = R.resident_solve(orig, jnp.asarray(rhos), li, lm,
                            n_iters=8, fista=True, interpret=True)
    a = R.resident_solve(orig, jnp.asarray(rhos[:5]), li, lm,
                         n_iters=5, fista=True, interpret=True)
    b = R.resident_solve(orig, jnp.asarray(rhos[5:]), li, lm,
                         n_iters=3, fista=True, interpret=True,
                         state=(a[0], a[1], a[2]))
    np.testing.assert_array_equal(np.asarray(b[0]), np.asarray(full[0]))
    for k in range(3):
        np.testing.assert_array_equal(np.asarray(b[1][k]),
                                      np.asarray(full[1][k]))
    np.testing.assert_allclose(np.asarray(b[3]), np.asarray(full[3][5:]),
                               rtol=1e-6)


def _stop_case(shape, iters, seed, stop_at):
    orig, li, lm = _state(shape, seed=seed)
    base = dict(ndim=len(shape), iterations_fista=iters[0],
                iterations_unacc=iters[1], backend=Backend.PALLAS)
    probe = run_solver(orig, li, lm,
                       SolverOptions(**base, vmem_resident=False,
                                     temporal_pairs=False))
    d = np.asarray(probe["delta"])
    assert d[stop_at] > 0 and d[stop_at] < d[stop_at - 1]
    stopping = float(np.sqrt(d[stop_at] * min(d[stop_at - 1],
                                              d[stop_at] * 4)))
    return orig, li, lm, base, stopping


@pytest.mark.parametrize("iters,stop_at", [((60, 0), 45), ((0, 60), 50)])
def test_stop_aware_resident_chunks_match(iters, stop_at):
    """Stop-aware runs ride resident chunks (guard) then pairs then K=1:
    the stop iteration and recon must match the plain streaming run."""
    shape = (8, 6, 64)
    orig, li, lm, base, stopping = _stop_case(shape, iters, 23, stop_at)
    want = run_solver(orig, li, lm, SolverOptions(
        **base, stopping_relative_change=stopping,
        vmem_resident=False, temporal_pairs=False))
    opts = SolverOptions(**base, stopping_relative_change=stopping)
    from cytvdn_tpu.solver.engine import _resolve_resident_chunks
    assert _resolve_resident_chunks(opts, shape, jnp.float32, None)[0]
    got = run_solver(orig, li, lm, opts)
    assert int(got["iterations_run"]) == int(want["iterations_run"])
    assert bool(got["early_stopped"]) == bool(want["early_stopped"])
    np.testing.assert_array_equal(np.asarray(got["recon"]),
                                  np.asarray(want["recon"]))
    np.testing.assert_allclose(np.asarray(got["delta"]),
                               np.asarray(want["delta"]), rtol=1e-4)


@pytest.mark.parametrize("iters", [(0, 40), (40, 0), (20, 20)])
def test_chunked_runs_ride_resident_chunks(monkeypatch, iters):
    """Dynamically capped chunked runs (checkpoint/progress execution,
    run_chunked) must take the resident-chunk path — stopping is no
    longer required — and stay bit-exact vs the unchunked streaming
    run."""
    from cytvdn_tpu.kernels import resident as RK
    from cytvdn_tpu.utils.checkpoint import run_chunked

    shape = (8, 6, 64)
    orig, li, lm = _state(shape, seed=41)
    base = dict(ndim=3, iterations_fista=iters[0],
                iterations_unacc=iters[1], backend=Backend.PALLAS)
    want = run_solver(orig, li, lm,
                      SolverOptions(**base, vmem_resident=False))
    calls = []
    real = RK.resident_solve

    def counting(*a, **k):
        calls.append(k.get("n_iters"))
        return real(*a, **k)

    monkeypatch.setattr(RK, "resident_solve", counting)
    got = run_chunked(np.asarray(orig), np.asarray(li), np.asarray(lm),
                      SolverOptions(**base), checkpoint_path=None,
                      checkpoint_every=20)
    assert calls, "resident chunks did not engage on the chunked run"
    assert int(got["iterations_run"]) == int(want["iterations_run"])
    np.testing.assert_array_equal(np.asarray(got["recon"]),
                                  np.asarray(want["recon"]))
    np.testing.assert_allclose(np.asarray(got["delta"]),
                               np.asarray(want["delta"]), rtol=1e-4)


def test_resident_chunk_bails_exactly_on_guard_beat():
    """When delta crosses the stopping threshold mid-chunk — the
    predictive guard beaten — the chunk must be DISCARDED: the loop
    returns the pre-chunk carry bit-exactly (state, traces, i, done all
    unchanged), so the exact stop-checking pair/K=1 phases redo those
    iterations and the run matches streaming in every case."""
    from cytvdn_tpu.solver.engine import (_RESIDENT_CHUNK, _PhaseCarry,
                                          _run_phase_resident)

    shape = (8, 6, 64)
    orig, li, lm = _state(shape, seed=7)
    n = 40
    assert n >= _RESIDENT_CHUNK + 2
    # recorded history shows a plateau (d1 = d2 = 1.0 -> r = 1, pred =
    # 1.0 >= stopping) so the guard lets the chunk run; the ACTUAL
    # deltas of a fresh TV state are orders of magnitude below
    # stopping=0.5, so the chunk crosses mid-flight
    delta = jnp.zeros((n,), jnp.float32).at[0].set(1.0).at[1].set(1.0)
    carry = _PhaseCarry(
        i=jnp.int32(2), done=jnp.zeros((), bool),
        recon=orig + 0.0,
        accs=tuple(jnp.zeros(shape, jnp.float32) for _ in range(3)),
        ds=(),
        b_norm=jnp.zeros((n,), jnp.float32), delta=delta,
        mse=jnp.zeros((0,), jnp.float32), tk=jnp.float32(1.0),
    )
    opts = SolverOptions(ndim=3, iterations_fista=0, iterations_unacc=n,
                         backend=Backend.PALLAS,
                         stopping_relative_change=0.5)
    out = _run_phase_resident(False, n, carry, orig, jnp.zeros((n,)),
                              li, lm, opts, interpret=True, i_stop=n)
    assert int(out.i) == 2, "bail must leave i at the chunk start"
    assert not bool(out.done), "bail must not latch done"
    np.testing.assert_array_equal(np.asarray(out.recon),
                                  np.asarray(carry.recon))
    for a, b in zip(out.accs, carry.accs):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    np.testing.assert_array_equal(np.asarray(out.delta),
                                  np.asarray(carry.delta))
    np.testing.assert_array_equal(np.asarray(out.b_norm),
                                  np.asarray(carry.b_norm))


def test_resident_gates():
    """Configs the resident kernel cannot serve must resolve off."""
    ok = dict(ndim=3, iterations_fista=4, iterations_unacc=0,
              backend=Backend.PALLAS)
    shape, dt = (8, 6, 64), jnp.float32
    assert _resolve_resident(SolverOptions(**ok), shape, dt, None)[0]
    # periodic and (corrected) mirror are covered since round 3
    for bc in (BCMode.PERIODIC, BCMode.MIRROR):
        assert _resolve_resident(
            SolverOptions(**{**ok, "bc_mode": bc}), shape, dt, None)[0]
    # ... but not on the flat-folded 3D layout (cross-fold edges):
    # (8, 8, 32768) exceeds the single-slab budget and folds E -> (256, 128)
    assert R.resident_plan((8, 8, 32768), True)[1]  # folds
    assert R.resident_supported((8, 8, 32768), jnp.float32,
                                BCMode.JIA_ZHAO, fista=True)
    assert not R.resident_supported((8, 8, 32768), jnp.float32,
                                    BCMode.PERIODIC, fista=True)
    for bad in (
        dict(stopping_relative_change=0.01),
        dict(fista_restart=True),
        dict(vmem_resident=False),
        dict(backend=Backend.JAX),
    ):
        assert not _resolve_resident(
            SolverOptions(**{**ok, **bad}), shape, dt, None)[0], bad
    # MSE resolves ON since late round 3 (ref cube in one extra window)
    assert _resolve_resident(
        SolverOptions(**{**ok, "calculate_mse": True}), shape, dt,
        None)[0]
    # a mesh comm gates off
    comm = type("C", (), {"split_axes": (0,)})()
    assert not _resolve_resident(SolverOptions(**ok), shape, dt, comm)[0]
    # states that exceed the VMEM budget gate off
    assert not R.resident_supported((256, 256, 2048), jnp.float32,
                                    BCMode.JIA_ZHAO, fista=True)
    # the BASELINE cfg1 shape must be IN budget (the whole point)
    assert R.resident_supported((64, 64, 512), jnp.float32,
                                BCMode.JIA_ZHAO, fista=False)


@pytest.mark.parametrize("iso_kw,iters", [
    (dict(isotropic_R=True), (4, 0)),
    (dict(isotropic_Q=True), (0, 4)),
    (dict(isotropic_R=True, isotropic_Q=True), (3, 2)),
])
def test_resident_iso_matches_streaming(iso_kw, iters):
    """Half-isotropic pairs through the resident kernel (joint L2
    projection, reference halfisotropic.pyx:84-95) must match the
    streaming fused path bit-for-bit on the recon."""
    shape = (6, 4, 6, 16)
    orig, li, lm = _state(shape, seed=41)
    base = dict(ndim=4, iterations_fista=iters[0],
                iterations_unacc=iters[1], backend=Backend.PALLAS,
                **iso_kw)
    opts_r = SolverOptions(**base, vmem_resident=True,
                           temporal_pairs=False)
    assert _resolve_resident(opts_r, shape, jnp.float32, None)[0], \
        "the resident gate must accept 4D JZ iso configs"
    want = run_solver(orig, li, lm,
                      SolverOptions(**base, vmem_resident=False,
                                    temporal_pairs=False))
    got = run_solver(orig, li, lm, opts_r)
    np.testing.assert_array_equal(np.asarray(got["recon"]),
                                  np.asarray(want["recon"]))
    np.testing.assert_allclose(np.asarray(got["b_norm"]),
                               np.asarray(want["b_norm"]), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(got["delta"]),
                               np.asarray(want["delta"]), rtol=1e-4)


@pytest.mark.parametrize("pairs,res", [(True, False), (False, True)])
def test_mse_float64_reference_normalized(pairs, res):
    """A float64 reference (numpy's default under x64) next to a float32
    cube must be cast at run_solver entry — the MSE kernels' gates check
    only the datacube dtype, and Mosaic cannot lower f64 on TPU
    (review-caught; previously a hard crash where the old gates fell
    back to streaming)."""
    from cytvdn_tpu.solver.engine import run_solver

    orig, li, lm = _state((8, 6, 64), seed=47)
    rng = np.random.default_rng(48)
    ref64 = jnp.asarray(rng.standard_normal((8, 6, 64)))  # float64
    opts = SolverOptions(ndim=3, iterations_fista=4, iterations_unacc=0,
                         backend=Backend.PALLAS, calculate_mse=True,
                         temporal_pairs=pairs, vmem_resident=res)
    out = run_solver(orig, li, lm, opts, reference_data=ref64)
    assert out["mse"].dtype == jnp.float32
    assert np.all(np.asarray(out["mse"]) > 0)


def test_resident_iso_gates():
    """Iso configs resolve on only for 4D Jia-Zhao (the fused kernel's
    envelope, reference halfisotropic.pyx:70-82)."""
    ok4 = dict(ndim=4, iterations_fista=4, iterations_unacc=0,
               backend=Backend.PALLAS, isotropic_R=True)
    assert _resolve_resident(
        SolverOptions(**ok4), (6, 4, 6, 16), jnp.float32, None)[0]
    assert not R.resident_supported((6, 4, 6, 16), jnp.float32,
                                    BCMode.PERIODIC, fista=True,
                                    isotropic_R=True)
    assert not R.resident_supported((8, 6, 64), jnp.float32,
                                    BCMode.JIA_ZHAO, fista=True,
                                    isotropic_R=True)


@pytest.mark.parametrize("bc", [BCMode.PERIODIC, BCMode.MIRROR])
@pytest.mark.parametrize("shape", [(8, 6, 64), (6, 4, 6, 16)])
def test_resident_bc_modes(shape, bc):
    """Periodic / corrected-mirror through the resident kernel must
    match the streaming path bit-for-bit."""
    orig, li, lm = _state(shape, seed=31)
    base = dict(ndim=len(shape), iterations_fista=4, iterations_unacc=2,
                backend=Backend.PALLAS, bc_mode=bc)
    want = run_solver(orig, li, lm,
                      SolverOptions(**base, vmem_resident=False))
    got = run_solver(orig, li, lm, SolverOptions(**base))
    np.testing.assert_array_equal(np.asarray(got["recon"]),
                                  np.asarray(want["recon"]))
    np.testing.assert_allclose(np.asarray(got["b_norm"]),
                               np.asarray(want["b_norm"]), rtol=1e-5)


def test_resident_vs_golden():
    """Direct kernel check against the float64 golden model."""
    import sys
    import os
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    import golden

    shape = (6, 4, 32)
    orig, li, lm = _state(shape, seed=3)
    n = 3
    rhos = np.array([0.0, 0.28, 0.43], np.float64)
    recon, accs, ds, bn, dnum, dden = R.resident_solve(
        orig, jnp.asarray(rhos, jnp.float32), li, lm,
        n_iters=n, fista=True, interpret=True)
    g_r = np.asarray(orig, np.float64)
    g_accs = [np.zeros_like(g_r) for _ in range(3)]
    g_ds = [np.zeros_like(g_r) for _ in range(3)]
    for i in range(n):
        for k in range(3):
            g_accs[k], g_ds[k], _ = golden.accumulator_update_fista(
                g_r, g_accs[k], g_ds[k], float(rhos[i]), k, 32.0, 2)
        g_r, _ = golden.datacube_update(
            np.asarray(orig, np.float64), g_r, g_accs,
            np.full(3, 1 / 32.0), 2)
    assert np.max(np.abs(np.asarray(recon) - g_r)) < 1e-5
    for k in range(3):
        assert np.max(np.abs(np.asarray(accs[k]) - g_accs[k])) < 1e-5


@pytest.mark.parametrize("seed", range(4))
def test_resident_fuzz(seed):
    """Randomized shapes/schedules: resident must match streaming."""
    rng = np.random.default_rng(3000 + seed)
    ndim = int(rng.choice([3, 4]))
    if ndim == 4:
        shape = (int(rng.integers(4, 10)), int(rng.integers(2, 8)),
                 int(rng.integers(2, 8)), int(rng.integers(8, 20)))
    else:
        shape = (int(rng.integers(4, 10)), int(rng.integers(2, 8)),
                 int(rng.integers(16, 200)))
    n_f = int(rng.integers(0, 5))
    n_u = int(rng.integers(0, 4))
    if n_f + n_u == 0:
        n_f = 2
    orig, li, lm = _state(shape, seed=seed)
    base = dict(ndim=ndim, iterations_fista=n_f, iterations_unacc=n_u,
                backend=Backend.PALLAS)
    want = run_solver(orig, li, lm,
                      SolverOptions(**base, vmem_resident=False))
    got = run_solver(orig, li, lm, SolverOptions(**base))
    np.testing.assert_array_equal(
        np.asarray(got["recon"]), np.asarray(want["recon"]),
        err_msg=f"{shape} iters=({n_f},{n_u})")
