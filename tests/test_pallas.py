"""Fused Pallas kernel parity tests (interpreter mode on CPU).

The kernel itself is validated against the numpy golden model in
tests/manual_fused_check.py (runnable on real TPU too); here the full
solver is run end-to-end with backend="pallas" and compared to the XLA ops
backend at float32 tolerance.
"""

import numpy as np
import pytest

from cytvdn_tpu import denoise3D, denoise4D
from cytvdn_tpu.kernels.fused import _plan, fused_supported
from cytvdn_tpu.config import BCMode

RNG = np.random.default_rng(11)


def _cube(shape):
    return (RNG.standard_normal(shape) * 0.5 + 2.0).astype(np.float32)


def _compare(got, want, rtol=2e-5, atol=2e-6):
    for g, w in zip(got, want):
        np.testing.assert_allclose(g, w, rtol=rtol, atol=atol)


def test_solver_pallas_3d_matches_jax():
    cube = _cube((6, 8, 16))
    mu = np.full(3, 1.0, np.float32)
    want = denoise3D(cube, mu, iterations=6, FISTA=True, quiet=True,
                     backend="jax")
    got = denoise3D(cube, mu, iterations=6, FISTA=True, quiet=True,
                    backend="pallas")
    _compare(got, want)


def test_solver_pallas_4d_hybrid_matches_jax():
    cube = _cube((5, 6, 8, 16))
    mu = np.full(4, 1.0, np.float32)
    want = denoise4D(cube, mu, iterations=(4, 3), quiet=True, backend="jax")
    got = denoise4D(cube, mu, iterations=(4, 3), quiet=True,
                    backend="pallas")
    _compare(got, want)


def test_solver_pallas_early_stop_matches_jax():
    cube = _cube((6, 8, 16))
    mu = np.full(3, 1.0, np.float32)
    kw = dict(iterations=80, stopping_relative_change=0.05, quiet=True)
    want = denoise3D(cube, mu, backend="jax", **kw)
    got = denoise3D(cube, mu, backend="pallas", **kw)
    _compare(got, want)
    nz = np.nonzero(got[2])[0]
    assert len(nz) < 80


def test_plan_strategies():
    # 3D small: direct single-strip layout
    shape, inblock, flat, b1 = _plan((64, 64, 512), 4)
    assert shape == (64, 64, 512) and not flat and b1 == 64
    # 3D large: folded energy axis
    shape, inblock, flat, b1 = _plan((256, 256, 2048), 4)
    assert shape == (256, 256, 16, 128) and flat
    # 4D
    shape, inblock, flat, b1 = _plan((128, 128, 64, 64), 4)
    assert shape == (128, 128, 64, 64) and inblock == (2, 3)
    # unsupported tail: too big for VMEM
    assert _plan((64, 64, 512, 512), 4) is None


def test_fused_supported_gates():
    assert fused_supported((64, 64, 512), np.dtype(np.float32),
                           BCMode.JIA_ZHAO)
    assert not fused_supported((64, 64, 512), np.dtype(np.float64),
                               BCMode.JIA_ZHAO)
    assert not fused_supported((64, 64, 512), np.dtype(np.float32),
                               BCMode.PERIODIC)
    assert not fused_supported((16, 16, 8, 8), np.dtype(np.float32),
                               BCMode.JIA_ZHAO, isotropic_R=True)
