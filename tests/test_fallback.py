"""VMEM-gate miscalibration fallback (solver/engine.py::vmem_fallback):
a compile-time RESOURCE_EXHAUSTED from a multi-iteration kernel must
degrade to the K=1 streaming path (bit-identical results) instead of
crashing. The device OOM is simulated; the real-TPU behaviour is the
same exception type surfacing through the same call path."""

import numpy as np
import pytest
import jax.numpy as jnp

import cytvdn_tpu.kernels.resident as RR
import cytvdn_tpu.kernels.temporal as TT
from cytvdn_tpu.config import Backend, SolverOptions

_OOM = ("XLA:TPU compile permanent error. Ran out of memory in memory "
        "space vmem. Used 200.00M of 128.00M vmem.")


def _cube(shape, seed=0):
    rng = np.random.default_rng(seed)
    return (rng.standard_normal(shape) * 0.3 + 1.0).astype(np.float32)


def test_resident_oom_falls_back(monkeypatch):
    from cytvdn_tpu import denoise3D

    calls = []
    real = RR.resident_solve

    def boom(*a, **k):
        calls.append(1)
        raise RuntimeError(_OOM)

    monkeypatch.setattr(RR, "resident_solve", boom)
    cube = _cube((8, 6, 64))
    mu = np.full(3, 1.0, np.float32)
    with pytest.warns(UserWarning, match="vmem_resident=False"):
        got = denoise3D(cube, mu, iterations=5, FISTA=True, quiet=True,
                        backend="pallas")
    assert calls  # the resident path was attempted first
    monkeypatch.setattr(RR, "resident_solve", real)
    want = denoise3D(cube, mu, iterations=5, FISTA=True, quiet=True,
                     backend="pallas")
    np.testing.assert_array_equal(got[0], want[0])


def test_pair_oom_falls_back_to_k1(monkeypatch):
    from cytvdn_tpu import denoise4D

    def boom(*a, **k):
        raise RuntimeError(_OOM)

    monkeypatch.setattr(RR, "resident_solve", boom)
    monkeypatch.setattr(TT, "fused_pair_iteration", boom)
    cube = _cube((7, 6, 6, 16))
    mu = np.full(4, 1.0, np.float32)
    with pytest.warns(UserWarning, match="temporal_pairs=False"):
        got = denoise4D(cube, mu, iterations=4, quiet=True,
                        backend="pallas")
    want = denoise4D(cube, mu, iterations=4, quiet=True, backend="pallas",
                     )
    np.testing.assert_array_equal(got[0], want[0])


def test_pair_oom_shrinks_strips_before_k1(monkeypatch):
    """A pair-kernel VMEM miscalibration first SHRINKS the strips
    (the ``pair_block_cap`` rung — preserving the ~1.8x pair rate) and
    only flips ``temporal_pairs`` off if no smaller plan helps. The
    rung skips caps that cannot change the block plan (no wasted
    recompiles) — here the first rung that re-plans (7,12,6,16) is
    16384 (b1 12 -> 4), so exactly one failing compile is paid.
    On-chip motivation: 4D FISTA at (128,128,64,64) — Mosaic asks 164M
    of 128M VMEM at the budget model's b1=32 while b1=16 fits and runs
    (probe, round 4)."""
    import dataclasses

    import cytvdn_tpu.solver.engine as ENG
    from cytvdn_tpu.solver.engine import run_solver, vmem_fallback

    shape = (7, 12, 6, 16)
    monkeypatch.setattr(ENG, "_FALLBACK_PAIR_CAPS", (65536, 16384))
    real = TT.fused_pair_iteration
    attempts = []

    def miscalibrated(*a, **k):
        if k.get("block_cap") is None:
            attempts.append(None)
            raise RuntimeError(_OOM)
        attempts.append(k["block_cap"])
        return real(*a, **k)

    monkeypatch.setattr(TT, "fused_pair_iteration", miscalibrated)
    orig = jnp.asarray(_cube(shape))
    li = jnp.full(4, 32.0, jnp.float32)
    lm = jnp.full(4, 1 / 32.0, jnp.float32)
    opts = SolverOptions(ndim=4, iterations_fista=4, iterations_unacc=0,
                         backend=Backend.PALLAS, vmem_resident=False)
    with pytest.warns(UserWarning, match="pair_block_cap=16384"):
        got = vmem_fallback(opts, lambda o: run_solver(orig, li, lm, o),
                            knobs=("temporal_pairs",), local_shape=shape)
    assert attempts[0] is None  # the miscalibrated plan failed once
    assert set(attempts[1:]) == {16384}  # ... then capped strips ran
    # bit-identical at any strip width (the pair kernel invariant)
    monkeypatch.setattr(TT, "fused_pair_iteration", real)
    want = run_solver(orig, li, lm, opts)
    np.testing.assert_array_equal(np.asarray(got["recon"]),
                                  np.asarray(want["recon"]))
    # explicit caps are honored end-to-end too (not just via the ladder)
    direct = run_solver(orig, li, lm,
                        dataclasses.replace(opts, pair_block_cap=16384))
    np.testing.assert_array_equal(np.asarray(direct["recon"]),
                                  np.asarray(want["recon"]))


def test_non_oom_errors_propagate(monkeypatch):
    from cytvdn_tpu import denoise3D

    def boom(*a, **k):
        raise RuntimeError("some unrelated lowering failure")

    monkeypatch.setattr(RR, "resident_solve", boom)
    cube = _cube((8, 6, 64))
    mu = np.full(3, 1.0, np.float32)
    with pytest.raises(RuntimeError, match="unrelated"):
        denoise3D(cube, mu, iterations=5, FISTA=True, quiet=True,
                  backend="pallas")


def test_sharded_oom_falls_back(monkeypatch):
    from cytvdn_tpu.parallel.sharded import run_sharded

    def boom(*a, **k):
        raise RuntimeError(_OOM)

    monkeypatch.setattr(TT, "fused_pair_iteration", boom)
    cube = _cube((16, 8, 6, 16))
    li = np.full(4, 32.0, np.float32)
    lm = np.full(4, 1 / 32.0, np.float32)
    opts = SolverOptions(ndim=4, iterations_fista=4, iterations_unacc=0,
                         backend=Backend.PALLAS)
    with pytest.warns(UserWarning, match="temporal_pairs=False") as rec:
        got = run_sharded(cube, li, lm, opts, shard=(4, 1, 1, 1))
    # the mesh path must NOT waste a failing recompile flipping
    # vmem_resident (the resident kernel never engages under a mesh)
    assert not any("vmem_resident" in str(w.message) for w in rec)
    want = run_sharded(cube, li, lm,
                       SolverOptions(ndim=4, iterations_fista=4,
                                     iterations_unacc=0,
                                     backend=Backend.PALLAS,
                                     temporal_pairs=False),
                       shard=(4, 1, 1, 1))
    np.testing.assert_array_equal(np.asarray(got["recon"]),
                                  np.asarray(want["recon"]))


def test_outofcore_sharded_remembers_degradation(monkeypatch):
    """The sharded slab sweeps must pay a miscalibrated pair plan's
    failing compile ONCE, remembering the degraded opts across the
    2 x n_slabs x n_sweeps run_sharded calls — not re-attempting (and
    re-warning) per call."""
    import warnings

    from cytvdn_tpu.solver.outofcore import solve_outofcore_sharded_temporal

    booms = []

    def boom(*a, **k):
        booms.append(1)
        raise RuntimeError(_OOM)

    monkeypatch.setattr(TT, "fused_pair_iteration", boom)
    shape = (12, 4, 32)
    cube = _cube(shape)
    mu = np.full(3, 1.0, np.float32)
    lam = mu / 16.0
    opts = SolverOptions(ndim=3, iterations_fista=0, iterations_unacc=6,
                         backend=Backend.PALLAS)
    with warnings.catch_warnings(record=True) as rec:
        warnings.simplefilter("always")
        out = solve_outofcore_sharded_temporal(
            cube, (1.0 / lam), (lam / mu), opts, n_slabs=2, temporal_k=3,
            shard_w=2)
    fb = [w for w in rec if "temporal_pairs=False" in str(w.message)]
    assert len(fb) == 1, f"expected one degradation warning, got {len(fb)}"
    assert len(booms) == 1, f"failing compile attempted {len(booms)} times"
    from cytvdn_tpu import denoise3D

    want = denoise3D(np.asarray(cube), mu, iterations=(0, 6), FISTA=False,
                     quiet=True, backend="pallas")
    np.testing.assert_allclose(out["recon"], want[0], rtol=2e-6, atol=2e-6)
