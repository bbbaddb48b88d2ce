"""Native C++/OpenMP backend tests: kernel parity vs the golden model and
full-solver parity vs the JAX backend."""

import numpy as np
import pytest

import golden
from cytvdn_tpu import denoise3D, denoise4D
from cytvdn_tpu.cpp import backend as cpp

pytestmark = pytest.mark.skipif(
    not cpp.native_available(), reason="no C++ toolchain available"
)

RNG = np.random.default_rng(5)


def test_native_threads_reported():
    assert cpp.native_num_threads() >= 1


@pytest.mark.parametrize("bc", [0, 1, 2])
@pytest.mark.parametrize("dtype", [np.float32, np.float64])
def test_acc_update_matches_golden(bc, dtype):
    a = RNG.standard_normal((5, 6, 7, 8)).astype(dtype)
    for ax in range(4):
        b = (RNG.standard_normal(a.shape) * 0.1).astype(dtype)
        want_b, want_n = golden.accumulator_update(a, b, ax, dtype(0.3), bc)
        got_b = b.copy()
        got_n = cpp.acc_update(a, got_b, ax, 0.3, bc)
        tol = 1e-6 if dtype == np.float32 else 1e-14
        np.testing.assert_allclose(got_b, want_b, atol=tol)
        np.testing.assert_allclose(got_n, want_n, rtol=1e-5)


def test_acc_update_fista_matches_golden():
    a = RNG.standard_normal((6, 7, 8))
    for ax in range(3):
        b = RNG.standard_normal(a.shape) * 0.1
        d = RNG.standard_normal(a.shape) * 0.1
        want_b, want_d, want_n = golden.accumulator_update_fista(
            a, b, d, 0.7, ax, 0.3, 2)
        got_b, got_d = b.copy(), d.copy()
        got_n = cpp.acc_update(a, got_b, ax, 0.3, 2, d=got_d, tk=0.7)
        np.testing.assert_allclose(got_b, want_b, atol=1e-14)
        np.testing.assert_allclose(got_d, want_d, atol=1e-14)
        np.testing.assert_allclose(got_n, want_n, rtol=1e-12)


def test_iso_update_matches_golden():
    a = RNG.standard_normal((4, 5, 6, 7))
    b1 = RNG.standard_normal(a.shape) * 0.1
    b2 = RNG.standard_normal(a.shape) * 0.1
    for ax1, ax2 in [(0, 1), (2, 3)]:
        want1, want2, wn = golden.iso_accumulator_update(a, b1, b2, ax1, ax2,
                                                         0.2)
        g1, g2 = b1.copy(), b2.copy()
        gn = cpp.iso_update(a, g1, g2, ax1, ax2, 0.2)
        np.testing.assert_allclose(g1, want1, atol=1e-14)
        np.testing.assert_allclose(g2, want2, atol=1e-14)
        np.testing.assert_allclose(gn, wn, rtol=1e-12)


@pytest.mark.parametrize("bc", [0, 1, 2])
def test_recon_update_matches_golden(bc):
    for shape in [(5, 6, 7), (4, 5, 6, 7)]:
        nd = len(shape)
        orig = RNG.standard_normal(shape)
        recon = RNG.standard_normal(shape)
        bs = [RNG.standard_normal(shape) * 0.2 for _ in range(nd)]
        lam_mu = np.full(nd, 1.0 / 32)
        want, want_delta = golden.datacube_update(orig, recon, bs, lam_mu, bc)
        got = recon.copy()
        got_delta = cpp.recon_update(orig, got, bs, lam_mu, bc)
        np.testing.assert_allclose(got, want, atol=1e-14)
        np.testing.assert_allclose(got_delta, want_delta, rtol=1e-12)


def test_solver_cpp_3d_matches_jax():
    cube = (RNG.standard_normal((6, 7, 8)) * 0.5 + 2.0)
    mu = np.full(3, 0.8)
    want = denoise3D(cube, mu, iterations=10, FISTA=True, quiet=True,
                     backend="jax")
    got = denoise3D(cube, mu, iterations=10, FISTA=True, quiet=True,
                    backend="cpp")
    for g, w in zip(got, want):
        np.testing.assert_allclose(g, w, rtol=1e-10, atol=1e-12)


def test_solver_cpp_4d_iso_hybrid_matches_jax():
    cube = (RNG.standard_normal((4, 5, 6, 7)) * 0.5 + 2.0)
    mu = np.full(4, 1.0)
    kw = dict(iterations=(4, 3), isotropic_R=True, isotropic_Q=True,
              quiet=True)
    want = denoise4D(cube, mu, backend="jax", **kw)
    got = denoise4D(cube, mu, backend="cpp", **kw)
    for g, w in zip(got, want):
        np.testing.assert_allclose(g, w, rtol=1e-10, atol=1e-12)


def test_solver_cpp_early_stop_and_mse():
    cube = (RNG.standard_normal((6, 7, 8)) * 0.5 + 2.0)
    ref = (RNG.standard_normal((6, 7, 8)) * 0.5 + 2.0)
    mu = np.full(3, 0.8)
    kw = dict(iterations=200, stopping_relative_change=0.05,
              reference_data=ref, quiet=True)
    want = denoise3D(cube, mu, backend="jax", **kw)
    got = denoise3D(cube, mu, backend="cpp", **kw)
    assert len(got) == 4
    for g, w in zip(got, want):
        np.testing.assert_allclose(g, w, rtol=1e-9, atol=1e-12)


def test_cpp_noncontiguous_reference_data():
    """Regression: a Fortran-order / wrong-dtype reference_data must give
    the same MSE as the JAX path (it is normalized before the native call),
    not silently wrong values."""
    cube = (RNG.standard_normal((6, 7, 8)) * 0.5 + 2.0)
    ref = np.asfortranarray(RNG.standard_normal((6, 7, 8)) * 0.5 + 2.0)
    mu = np.full(3, 0.8)
    want = denoise3D(cube, mu, iterations=4, reference_data=ref, quiet=True,
                     backend="jax")
    got = denoise3D(cube, mu, iterations=4, reference_data=ref, quiet=True,
                    backend="cpp")
    np.testing.assert_allclose(got[3], want[3], rtol=1e-10)
