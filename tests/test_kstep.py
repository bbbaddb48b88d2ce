"""Generalized K-step temporal kernel (kernels/kstep.py): K iterations
per HBM pass must be bit-identical to K passes of the K=1 fused kernel,
and the engine's kstep phase runner must preserve full-schedule results
through any K / pair / K=1 mix.

All kernel runs use interpret mode (CPU CI); the real-TPU compiled
check lives in tests/manual_fused_check.py / TPU_FUSED_PARITY.json and
the cross-K bitwise hash equality in SWEEP_KSTEP.json.
"""

import numpy as np
import pytest
import jax.numpy as jnp

import cytvdn_tpu.kernels.fused as F
import cytvdn_tpu.kernels.kstep as KS
from cytvdn_tpu.config import Backend, BCMode, SolverOptions


def _state(shape, fista, seed=0):
    rng = np.random.default_rng(seed)
    ndim = len(shape)
    orig = jnp.asarray(rng.standard_normal(shape) * 0.4 + 1.0,
                       dtype=jnp.float32)
    accs = tuple(jnp.zeros(shape, jnp.float32) for _ in range(ndim))
    ds = tuple(jnp.zeros(shape, jnp.float32) for _ in range(ndim)) \
        if fista else None
    li = jnp.asarray(np.full(ndim, 32.0, np.float32))
    lm = jnp.asarray(np.full(ndim, 1 / 32.0, np.float32))
    return orig, accs, ds, li, lm


CASES = [
    ((8, 6, 64), 3, True),       # 3D single layout
    ((8, 6, 64), 3, False),
    ((8, 6, 64), 4, True),
    ((16, 6, 64), 6, True),
    ((16, 6, 64), 8, False),
    ((8, 4, 6, 16), 3, True),    # 4D single strip
    ((8, 4, 6, 16), 4, False),
    ((6, 5, 256), 3, True),      # 3D flat fold, single strip
]


@pytest.mark.parametrize("shape,k,fista", CASES)
def test_kstep_bitexact_vs_k1_passes(shape, k, fista):
    orig, accs, ds, li, lm = _state(shape, fista)
    ndim = len(shape)
    rhos = np.linspace(0.0, 0.6, k).astype(np.float32)
    assert KS.kstep_plan(shape, 4, k, fista) is not None

    rK, aK, dK, bn, dnum, dden = KS.fused_kstep_iteration(
        orig, orig, accs, ds, jnp.asarray(rhos), li, lm,
        k=k, fista=fista, interpret=True)

    r_f, a_f, d_f = orig, accs, ds
    tr = []
    for i in range(k):
        o = F.fused_iteration(orig, r_f, a_f, d_f, jnp.float32(rhos[i]),
                              li, lm, fista=fista, interpret=True)
        r_f, a_f, d_f = o[0], o[1], o[2]
        tr.append((float(o[3]), float(o[4]), float(o[5])))

    np.testing.assert_array_equal(np.asarray(rK), np.asarray(r_f))
    for q in range(ndim):
        np.testing.assert_array_equal(np.asarray(aK[q]),
                                      np.asarray(a_f[q]))
        if fista:
            np.testing.assert_array_equal(np.asarray(dK[q]),
                                          np.asarray(d_f[q]))
    got = [(float(bn[t]), float(dnum[t]), float(dden[t]))
           for t in range(k)]
    np.testing.assert_allclose(got, tr, rtol=1e-5)


@pytest.mark.parametrize("iters,tk", [
    ((7, 0), 3),     # K=3 x2 + K=1 remainder
    ((0, 9), 4),     # unaccelerated, K=4 x2 + K=1
    ((8, 5), None),  # hybrid, auto depth
    ((11, 0), 3),    # K=3 x3 + pair remainder
    ((3, 0), None),  # phase SHORTER than the auto depth (regression:
                     # tracing the K-pass body would slice k momentum
                     # ratios out of a 3-long schedule)
    ((5, 2), 4),     # one K=4 pass + K=1; unacc phase shorter than K
])
def test_solver_kstep_matches_unblocked(iters, tk):
    """Full schedules through the engine: K-step execution (plus the
    pair/K=1 finishers) must reproduce the one-at-a-time fused path
    exactly."""
    from cytvdn_tpu.solver.engine import run_solver

    shape = (16, 6, 64)
    orig, _, _, li, lm = _state(shape, True, seed=3)
    base = dict(ndim=3, iterations_fista=iters[0],
                iterations_unacc=iters[1], backend=Backend.PALLAS,
                vmem_resident=False)
    want = run_solver(orig, li, lm,
                      SolverOptions(**base, temporal_pairs=False))
    got = run_solver(orig, li, lm,
                     SolverOptions(**base, temporal_k=tk))
    np.testing.assert_array_equal(np.asarray(got["recon"]),
                                  np.asarray(want["recon"]))
    np.testing.assert_allclose(np.asarray(got["b_norm"]),
                               np.asarray(want["b_norm"]), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(got["delta"]),
                               np.asarray(want["delta"]), rtol=1e-4)


def test_kstep_actually_engages(monkeypatch):
    """The auto policy must route eligible runs through the K-step
    kernel (spy on the pallas wrapper), with pairs/K=1 only finishing
    the remainder."""
    from cytvdn_tpu.solver.engine import run_solver

    calls = []
    real = KS.fused_kstep_iteration

    def spy(*a, **kw):
        calls.append(kw.get("k"))
        return real(*a, **kw)

    monkeypatch.setattr(KS, "fused_kstep_iteration", spy)
    shape = (16, 6, 64)
    orig, _, _, li, lm = _state(shape, True)
    run_solver(orig, li, lm,
               SolverOptions(ndim=3, iterations_fista=9,
                             iterations_unacc=0,
                             backend=Backend.PALLAS,
                             vmem_resident=False))
    assert calls and all(k == 8 for k in calls)


def test_kstep_gates():
    """No K-step under meshes, MSE, strip-split layouts, a disabled
    knob, or sub-3 forced depth; stop-aware runs DO K-step (the
    predictive-guard / block-discard machinery covers them)."""
    from cytvdn_tpu.solver.engine import _resolve_kstep

    base = dict(ndim=3, iterations_fista=6, iterations_unacc=0,
                backend=Backend.PALLAS)
    shape = (16, 6, 64)
    ok = _resolve_kstep(SolverOptions(**base), shape, jnp.float32,
                        None, True)
    assert ok >= 3

    class FakeComm:
        split_axes = (0,)

    assert _resolve_kstep(SolverOptions(**base), shape, jnp.float32,
                          FakeComm(), True) == 0
    assert _resolve_kstep(
        SolverOptions(**base, stopping_relative_change=1e-6),
        shape, jnp.float32, None, True) >= 3
    assert _resolve_kstep(
        SolverOptions(**base, calculate_mse=True),
        shape, jnp.float32, None, True) == 0
    assert _resolve_kstep(
        SolverOptions(**base, temporal_kstep=False),
        shape, jnp.float32, None, True) == 0
    assert _resolve_kstep(
        SolverOptions(**base, temporal_k=2),
        shape, jnp.float32, None, True) == 0
    # strip-split work layouts (the 4D flagship class) stay on pairs
    assert KS.kstep_plan((256, 256, 72, 72), 4, 3, True) is None
    # pipeline deeper than the row count
    assert KS.kstep_plan((6, 6, 64), 4, 4, True) is None


def test_kstep_lossy_matches_k1_lossy():
    """Lossy-duals cadence: K-step execution with bf16 shadow duals must
    bit-match the K=1 lossy run (every intermediate level quantizes on
    the same grid K=1's HBM writeback/reload rounds on)."""
    from cytvdn_tpu.solver.engine import run_solver

    shape = (16, 6, 64)
    orig, _, _, li, lm = _state(shape, True, seed=7)
    base = dict(ndim=3, iterations_fista=9, iterations_unacc=0,
                backend=Backend.PALLAS, vmem_resident=False,
                lossy_duals=True)
    want = run_solver(orig, li, lm,
                      SolverOptions(**base, temporal_pairs=False))
    got = run_solver(orig, li, lm,
                     SolverOptions(**base, temporal_k=3))
    np.testing.assert_array_equal(np.asarray(got["recon"]),
                                  np.asarray(want["recon"]))


def _stop_case(shape, iters, seed, stop_at):
    """(orig, li, lm, base, stopping) with a threshold landing between
    recorded deltas ``stop_at-1`` and ``stop_at`` of the unblocked run
    (same construction as tests/test_temporal.py::_stop_case)."""
    from cytvdn_tpu.solver.engine import run_solver

    orig, _, _, li, lm = _state(shape, True, seed=seed)
    base = dict(ndim=len(shape), iterations_fista=iters[0],
                iterations_unacc=iters[1], backend=Backend.PALLAS,
                vmem_resident=False)
    probe = run_solver(orig, li, lm,
                       SolverOptions(**base, temporal_pairs=False))
    d = np.asarray(probe["delta"])
    assert d[stop_at] > 0 and d[stop_at] < d[stop_at - 1], d
    stopping = float(np.sqrt(d[stop_at] * min(d[stop_at - 1],
                                              d[stop_at] * 4)))
    return orig, li, lm, base, stopping


@pytest.mark.parametrize("iters,stop_at,tk", [
    ((24, 0), 17, 3),    # stop mid-FISTA, forced K=3
    ((0, 24), 18, 4),    # unaccelerated, forced K=4
    ((24, 0), 17, None),  # auto depth
])
def test_stop_aware_kstep_matches_unblocked(iters, stop_at, tk):
    """With stopping_relative_change set, the K-step engine must stop at
    the SAME iteration as the unblocked run with bit-identical state:
    the K-deep predictive guard hands the final approach to the exact
    pairs/K=1 finishers."""
    from cytvdn_tpu.solver.engine import run_solver

    shape = (16, 6, 64)
    orig, li, lm, base, stopping = _stop_case(shape, iters, 3, stop_at)
    want = run_solver(orig, li, lm, SolverOptions(
        **base, stopping_relative_change=stopping, temporal_pairs=False))
    got = run_solver(orig, li, lm, SolverOptions(
        **base, stopping_relative_change=stopping, temporal_k=tk))
    assert int(want["iterations_run"]) == int(got["iterations_run"])
    assert bool(want["early_stopped"]) == bool(got["early_stopped"])
    np.testing.assert_array_equal(np.asarray(got["recon"]),
                                  np.asarray(want["recon"]))
    np.testing.assert_allclose(np.asarray(got["delta"]),
                               np.asarray(want["delta"]), rtol=1e-5)


def test_stop_aware_kstep_actually_ksteps(monkeypatch):
    """The stop-aware path must route iterations through the K-step
    kernel (not silently fall back to pairs/K=1)."""
    from cytvdn_tpu.solver.engine import run_solver

    calls = []
    real = KS.fused_kstep_iteration

    def spy(*a, **kw):
        calls.append(kw.get("k"))
        return real(*a, **kw)

    monkeypatch.setattr(KS, "fused_kstep_iteration", spy)
    shape = (16, 6, 64)
    orig, _, _, li, lm = _state(shape, True)
    run_solver(orig, li, lm,
               SolverOptions(ndim=3, iterations_fista=12,
                             iterations_unacc=0,
                             backend=Backend.PALLAS,
                             vmem_resident=False,
                             stopping_relative_change=1e-12))
    assert calls and all(k == 8 for k in calls)


def test_kstep_guard_beat_end_to_end_matches_unblocked():
    """Full-run equivalence when the K-deep guard IS beaten: resuming
    from a fabricated plateau history (recorded deltas 1.0, actual
    deltas far below the threshold) the K-step engine must discard the
    crossing block and stop at the identical iteration with
    bit-identical recon and traces."""
    from cytvdn_tpu.solver.engine import run_solver

    shape = (8, 6, 64)
    orig, _, _, li, lm = _state(shape, False, seed=9)
    n = 12
    base = dict(ndim=3, iterations_fista=0, iterations_unacc=n,
                backend=Backend.PALLAS, stopping_relative_change=0.5,
                vmem_resident=False)
    state = {
        "recon": orig + 0.0,
        "accs": tuple(jnp.zeros(shape, jnp.float32) for _ in range(3)),
        "ds": (),
        "b_norm": jnp.zeros((n,), jnp.float32),
        "delta": jnp.zeros((n,), jnp.float32).at[0].set(1.0).at[1]
        .set(1.0),
        "i": 2,
    }
    want = run_solver(orig, li, lm,
                      SolverOptions(**base, temporal_pairs=False),
                      state=dict(state))
    got = run_solver(orig, li, lm,
                     SolverOptions(**base, temporal_k=3),
                     state=dict(state))
    assert int(got["iterations_run"]) == int(want["iterations_run"])
    assert bool(got["early_stopped"]) and bool(want["early_stopped"])
    np.testing.assert_array_equal(np.asarray(got["recon"]),
                                  np.asarray(want["recon"]))
    np.testing.assert_array_equal(np.asarray(got["delta"]),
                                  np.asarray(want["delta"]))
    np.testing.assert_array_equal(np.asarray(got["b_norm"]),
                                  np.asarray(want["b_norm"]))


def test_kstep_chunked_resume_bitexact(tmp_path):
    """Chunked execution across arbitrary boundaries must stay
    bit-identical when the chunks run through different K mixes."""
    from cytvdn_tpu.solver.engine import run_solver
    from cytvdn_tpu.utils.checkpoint import run_chunked

    shape = (16, 6, 64)
    orig, _, _, li, lm = _state(shape, True, seed=5)
    li_np = np.asarray(li)
    lm_np = np.asarray(lm)
    opts = SolverOptions(ndim=3, iterations_fista=8, iterations_unacc=5,
                         backend=Backend.PALLAS, vmem_resident=False,
                         temporal_k=3)
    want = run_solver(orig, li, lm, opts)
    got = run_chunked(np.asarray(orig), li_np, lm_np, opts,
                      checkpoint_path=str(tmp_path / "ck.npz"),
                      checkpoint_every=5)
    np.testing.assert_array_equal(np.asarray(got["recon"]),
                                  np.asarray(want["recon"]))
