"""Temporally-blocked K=2 kernel (kernels/temporal.py): two iterations
per HBM pass must be bit-identical to two passes of the K=1 fused kernel,
and the engine's paired phase runner must preserve full-schedule results.

All kernel runs use interpret mode (CPU CI); the real-TPU compiled-kernel
check lives in tests/manual_fused_check.py / TPU_FUSED_PARITY.json.
"""

import numpy as np
import pytest
import jax.numpy as jnp

import cytvdn_tpu.kernels.fused as F
import cytvdn_tpu.kernels.temporal as T
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


# (shape, fista, fused-budget override (layout forcing), pair block cap
# (seam forcing)) — the pair planner otherwise grows strips so large that
# tiny test shapes never have seams
CASES = [
    ((6, 4, 6, 16), True, None, None),      # 4D, single strip (no seams)
    ((6, 4, 6, 16), False, None, None),
    ((7, 12, 6, 16), True, None, 16384),    # 4D, 3 strips (bands+colbuf)
    ((7, 12, 6, 16), False, None, 16384),
    ((5, 24, 6, 16), True, None, 16384),    # many strips
    ((5, 24, 6, 16), True, None, 4096),     # single-column strips (b1=1)
    ((8, 6, 64), True, None, None),         # 3D single layout
    ((6, 5, 256), True, 3000, 4096),        # 3D flat fold, b1=1 strips
    ((6, 5, 256), False, 3000, None),       # 3D flat fold, single strip
]


@pytest.mark.parametrize("shape,fista,budget,cap", CASES)
def test_pair_bitexact_vs_two_k1_passes(monkeypatch, shape, fista, budget,
                                        cap):
    if budget is not None:
        monkeypatch.setattr(F, "_BLOCK_BYTES_TARGET", budget)
    if cap is not None:
        monkeypatch.setattr(T, "_PAIR_BLOCK_CAP", cap)
    orig, accs, ds, li, lm = _state(shape, fista)
    rhos = [0.0, 0.28, 0.43, 0.52]
    ndim = len(shape)

    r_p, a_p, d_p = orig, accs, ds
    tr_p = []
    for i in (0, 2):
        out = T.fused_pair_iteration(
            orig, r_p, a_p, d_p, jnp.float32(rhos[i]),
            jnp.float32(rhos[i + 1]), li, lm, fista=fista, interpret=True)
        r_p, a_p, d_p = out[0], out[1], out[2]
        tr_p += list(out[3:9])

    r_f, a_f, d_f = orig, accs, ds
    tr_f = []
    for i in range(4):
        o = F.fused_iteration(orig, r_f, a_f, d_f, jnp.float32(rhos[i]),
                              li, lm, fista=fista, interpret=True)
        r_f, a_f, d_f = o[0], o[1], o[2]
        tr_f += [o[3], o[4], o[5]]

    np.testing.assert_array_equal(np.asarray(r_p), np.asarray(r_f))
    for k in range(ndim):
        np.testing.assert_array_equal(np.asarray(a_p[k]), np.asarray(a_f[k]))
        if fista:
            np.testing.assert_array_equal(np.asarray(d_p[k]),
                                          np.asarray(d_f[k]))
    # reductions agree to grouping ulps (identical when the K=1 plan has
    # B0 == 1, which holds for every bandwidth-relevant shape)
    np.testing.assert_allclose([float(x) for x in tr_p],
                               [float(x) for x in tr_f], rtol=1e-5)


@pytest.mark.parametrize("iters", [(4, 0), (5, 0), (0, 6), (3, 4), (5, 3)])
def test_solver_paired_matches_unpaired(iters):
    """Full schedules (odd counts, hybrid) through the engine: paired
    execution must reproduce the one-at-a-time fused path exactly."""
    from cytvdn_tpu.solver.engine import run_solver

    shape = (7, 12, 6, 16)
    orig, _, _, li, lm = _state(shape, True, seed=3)
    base = dict(ndim=4, iterations_fista=iters[0],
                iterations_unacc=iters[1], backend=Backend.PALLAS)
    want = run_solver(orig, li, lm,
                      SolverOptions(**base, temporal_pairs=False))
    got = run_solver(orig, li, lm,
                     SolverOptions(**base, temporal_pairs=True))
    np.testing.assert_array_equal(np.asarray(got["recon"]),
                                  np.asarray(want["recon"]))
    np.testing.assert_allclose(np.asarray(got["b_norm"]),
                               np.asarray(want["b_norm"]), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(got["delta"]),
                               np.asarray(want["delta"]), rtol=1e-4)


@pytest.mark.parametrize("shard,shape,iters", [
    ((8, 1, 1, 1), (32, 8, 6, 16), (4, 0)),
    ((4, 1, 1, 1), (16, 8, 6, 16), (5, 0)),     # odd: pair + K=1 mop-up
    ((2, 1, 1, 1), (8, 8, 6, 16), (3, 2)),      # hybrid
    ((4, 1, 1), (16, 6, 64), (0, 4)),           # 3D unaccelerated
    ((1, 4, 1, 1), (8, 16, 6, 16), (4, 0)),     # axis-1 mesh
    ((1, 2, 1, 1), (8, 8, 6, 16), (3, 2)),      # axis-1 hybrid
    ((1, 8, 1, 1), (8, 16, 6, 16), (5, 0)),     # axis-1, 2-col shards
    ((1, 4, 1), (6, 12, 64), (0, 4)),           # axis-1 3D unacc
])
def test_sharded_pairs_match_single_device(shard, shape, iters):
    """Axis-0 / axis-1 meshes through the K=2 pair kernel (2-deep halo
    bands, seam recomputes) must equal the single-device run exactly."""
    import jax.numpy as jnp
    import cytvdn_tpu.solver.engine as E
    from cytvdn_tpu.config import SolverOptions
    from cytvdn_tpu.parallel.sharded import run_sharded
    from cytvdn_tpu.solver.engine import run_solver

    ndim = len(shape)
    orig, _, _, li, lm = _state(shape, True, seed=5)
    opts = SolverOptions(ndim=ndim, iterations_fista=iters[0],
                         iterations_unacc=iters[1],
                         backend=Backend.PALLAS)
    # the sharded run must actually take the paired path
    split_ax = next((ax for ax, w in enumerate(shard) if w > 1), None)
    local = tuple(s // w for s, w in zip(shape, shard))
    assert E._resolve_temporal(
        opts, local, jnp.float32,
        type("C", (), {"split_axes": (split_ax,)})()
        if split_ax is not None else None)

    single = run_solver(orig, li, lm, opts)
    got = run_sharded(np.asarray(orig), np.asarray(li), np.asarray(lm),
                      opts, shard=shard)
    # seam recomputes perform the same math, but the compiler may contract
    # c + rho*(c-d) to an FMA in one code path and not the other — ulp
    # tolerance, same as the K=1 sharded equivalence tests
    np.testing.assert_allclose(np.asarray(got["recon"]),
                               np.asarray(single["recon"]),
                               rtol=5e-7, atol=1e-7)
    np.testing.assert_allclose(np.asarray(got["b_norm"]),
                               np.asarray(single["b_norm"]), rtol=2e-5)
    np.testing.assert_allclose(np.asarray(got["delta"]),
                               np.asarray(single["delta"]), rtol=2e-4)


@pytest.mark.parametrize("shard,shape,iters", [
    ((2, 2, 1, 1), (8, 8, 6, 16), (4, 0)),      # smallest 2D grid
    ((2, 4, 1, 1), (8, 16, 6, 16), (5, 0)),     # odd count: pair + K=1
    ((4, 2, 1, 1), (16, 8, 6, 16), (3, 2)),     # hybrid
    ((2, 2, 1), (8, 8, 64), (0, 4)),            # 3D unaccelerated
    ((2, 2, 1, 1), (8, 8, 6, 16), (0, 6)),      # 4D unaccelerated
])
def test_sharded_pairs_2d_grid(shard, shape, iters):
    """2D device grids (axes 0 AND 1 split) through the pair kernel +
    the axis-1 seam repair (parallel/pairfix.py) must equal the
    single-device run to ulp tolerance."""
    import jax.numpy as jnp
    import cytvdn_tpu.solver.engine as E
    from cytvdn_tpu.parallel.sharded import run_sharded
    from cytvdn_tpu.solver.engine import run_solver

    ndim = len(shape)
    orig, _, _, li, lm = _state(shape, True, seed=13)
    opts = SolverOptions(ndim=ndim, iterations_fista=iters[0],
                         iterations_unacc=iters[1],
                         backend=Backend.PALLAS)
    local = tuple(s // w for s, w in zip(shape, shard))
    assert E._resolve_temporal(
        opts, local, jnp.float32,
        type("C", (), {"split_axes": (0, 1)})())

    single = run_solver(orig, li, lm, opts)
    got = run_sharded(np.asarray(orig), np.asarray(li), np.asarray(lm),
                      opts, shard=shard)
    np.testing.assert_allclose(np.asarray(got["recon"]),
                               np.asarray(single["recon"]),
                               rtol=5e-7, atol=1e-7)
    np.testing.assert_allclose(np.asarray(got["b_norm"]),
                               np.asarray(single["b_norm"]), rtol=1e-4)
    np.testing.assert_allclose(np.asarray(got["delta"]),
                               np.asarray(single["delta"]), rtol=2e-4)


def test_sharded_pairs_2d_grid_flat_fold(monkeypatch):
    """2D grid on a 3D cube whose energy axis takes the flat fold — the
    seam-repair strips must cross the fold (ops semantics) exactly."""
    from cytvdn_tpu.parallel.sharded import run_sharded
    from cytvdn_tpu.solver.engine import run_solver

    monkeypatch.setattr(F, "_BLOCK_BYTES_TARGET", 1500)  # force flat
    shape = (8, 8, 256)
    orig, _, _, li, lm = _state(shape, True, seed=15)
    opts = SolverOptions(ndim=3, iterations_fista=4, iterations_unacc=0,
                         backend=Backend.PALLAS)
    single = run_solver(orig, li, lm, opts)
    got = run_sharded(np.asarray(orig), np.asarray(li), np.asarray(lm),
                      opts, shard=(2, 2, 1))
    np.testing.assert_allclose(np.asarray(got["recon"]),
                               np.asarray(single["recon"]),
                               rtol=5e-7, atol=1e-7)


def test_sharded_pairs_2d_grid_with_strips(monkeypatch):
    """2D grid AND in-shard axis-1 strips (the kernel's band machinery
    interacting with the seam repair)."""
    import cytvdn_tpu.kernels.temporal as TT
    from cytvdn_tpu.parallel.sharded import run_sharded
    from cytvdn_tpu.solver.engine import run_solver

    monkeypatch.setattr(TT, "_PAIR_BLOCK_CAP", 16384)
    shape = (8, 24, 6, 16)
    orig, _, _, li, lm = _state(shape, True, seed=14)
    opts = SolverOptions(ndim=4, iterations_fista=4, iterations_unacc=0,
                         backend=Backend.PALLAS)
    single = run_solver(orig, li, lm, opts)
    got = run_sharded(np.asarray(orig), np.asarray(li), np.asarray(lm),
                      opts, shard=(2, 2, 1, 1))
    np.testing.assert_allclose(np.asarray(got["recon"]),
                               np.asarray(single["recon"]),
                               rtol=5e-7, atol=1e-7)


def test_sharded_pairs_with_strip_seams(monkeypatch):
    """Axis-0 mesh AND in-shard axis-1 strips together (bands + colbufs +
    shard halos interacting)."""
    import cytvdn_tpu.kernels.temporal as TT
    from cytvdn_tpu.config import SolverOptions
    from cytvdn_tpu.parallel.sharded import run_sharded
    from cytvdn_tpu.solver.engine import run_solver

    monkeypatch.setattr(TT, "_PAIR_BLOCK_CAP", 16384)  # force G1 > 1
    shape = (16, 12, 6, 16)
    orig, _, _, li, lm = _state(shape, True, seed=9)
    opts = SolverOptions(ndim=4, iterations_fista=4, iterations_unacc=2,
                         backend=Backend.PALLAS)
    single = run_solver(orig, li, lm, opts)
    got = run_sharded(np.asarray(orig), np.asarray(li), np.asarray(lm),
                      opts, shard=(4, 1, 1, 1))
    np.testing.assert_allclose(np.asarray(got["recon"]),
                               np.asarray(single["recon"]),
                               rtol=5e-7, atol=1e-7)


def test_temporal_gates():
    """Configs the pair kernel cannot serve must resolve temporal off."""
    from cytvdn_tpu.solver.engine import _resolve_temporal

    ok = dict(ndim=4, iterations_fista=4, iterations_unacc=0,
              backend=Backend.PALLAS)
    shape, dt = (8, 8, 6, 16), jnp.float32
    assert _resolve_temporal(SolverOptions(**ok), shape, dt, None)
    # stopping_relative_change no longer gates pairs off (stop-aware
    # pairing runs the bulk through the pair kernel, K=1 finishes)
    assert _resolve_temporal(
        SolverOptions(**{**ok, "stopping_relative_change": 0.01}),
        shape, dt, None)
    for bad in (
        dict(fista_restart=True),
        dict(isotropic_R=True),
        dict(bc_mode=BCMode.PERIODIC),
        dict(temporal_pairs=False),
        dict(backend=Backend.JAX),
    ):
        assert not _resolve_temporal(
            SolverOptions(**{**ok, **bad}), shape, dt, None), bad
    # MSE resolves ON since late round 3 (in-kernel SSE reductions;
    # 2D-grid meshes repair the SSE sums in parallel/pairfix.py)
    assert _resolve_temporal(
        SolverOptions(**{**ok, "calculate_mse": True}), shape, dt, None)


def _stop_case(shape, iters, seed, stop_at, **opt_kw):
    """Build (orig, li, lm, opts±stopping): picks a stopping threshold
    that triggers between recorded deltas ``stop_at-1`` and ``stop_at``
    of the reference (unpaired) run, so the early stop lands mid-run."""
    from cytvdn_tpu.solver.engine import run_solver

    orig, _, _, li, lm = _state(shape, True, seed=seed)
    base = dict(ndim=len(shape), iterations_fista=iters[0],
                iterations_unacc=iters[1], backend=Backend.PALLAS,
                **opt_kw)
    probe = run_solver(orig, li, lm,
                       SolverOptions(**base, temporal_pairs=False))
    d = np.asarray(probe["delta"])
    assert d[stop_at] > 0 and d[stop_at] < d[stop_at - 1], d
    stopping = float(np.sqrt(d[stop_at] * min(d[stop_at - 1],
                                              d[stop_at] * 4)))
    return orig, li, lm, base, stopping


@pytest.mark.parametrize("iters,stop_at", [((16, 0), 9), ((0, 16), 10),
                                           ((6, 12), 13)])
def test_stop_aware_pairs_match_unpaired(iters, stop_at):
    """With stopping_relative_change set, the paired engine must stop at
    the SAME iteration as the unpaired run with bit-identical state: the
    predictive guard hands the final approach to the exact K=1 loop."""
    from cytvdn_tpu.solver.engine import run_solver

    shape = (7, 12, 6, 16)
    orig, li, lm, base, stopping = _stop_case(shape, iters, 3, stop_at)
    want = run_solver(orig, li, lm, SolverOptions(
        **base, stopping_relative_change=stopping, temporal_pairs=False))
    got = run_solver(orig, li, lm, SolverOptions(
        **base, stopping_relative_change=stopping, temporal_pairs=True))
    assert int(want["iterations_run"]) == int(got["iterations_run"])
    assert bool(want["early_stopped"]) == bool(got["early_stopped"])
    np.testing.assert_array_equal(np.asarray(got["recon"]),
                                  np.asarray(want["recon"]))
    # trace reductions agree to grouping ulps (as in the unstoppped
    # paired-vs-unpaired test); recon and the stop iteration are exact
    np.testing.assert_allclose(np.asarray(got["delta"]),
                               np.asarray(want["delta"]), rtol=1e-5)


def test_stop_aware_pairs_actually_pair(monkeypatch):
    """The stop-aware path must route iterations through the pair kernel
    (not silently fall back to K=1 end to end)."""
    import cytvdn_tpu.kernels.temporal as TT
    from cytvdn_tpu.solver.engine import run_solver

    calls = []
    real = TT.fused_pair_iteration

    def spy(*a, **k):
        calls.append(1)
        return real(*a, **k)

    monkeypatch.setattr(TT, "fused_pair_iteration", spy)
    shape = (7, 12, 6, 16)
    orig, _, _, li, lm = _state(shape, True, seed=3)
    opts = SolverOptions(ndim=4, iterations_fista=12, iterations_unacc=0,
                         backend=Backend.PALLAS,
                         stopping_relative_change=1e-9)
    run_solver(orig, li, lm, opts)
    assert calls  # the pair kernel was traced into the program


def test_stop_aware_immediate_stop():
    """A threshold the very first deltas satisfy stops inside the K=1
    prologue — pairs never run, results identical to the unpaired run."""
    from cytvdn_tpu.solver.engine import run_solver

    shape = (6, 4, 6, 16)
    orig, _, _, li, lm = _state(shape, True, seed=4)
    base = dict(ndim=4, iterations_fista=10, iterations_unacc=0,
                backend=Backend.PALLAS, stopping_relative_change=1e6)
    want = run_solver(orig, li, lm,
                      SolverOptions(**base, temporal_pairs=False))
    got = run_solver(orig, li, lm,
                     SolverOptions(**base, temporal_pairs=True))
    assert int(got["iterations_run"]) == int(want["iterations_run"]) == 1
    assert bool(got["early_stopped"])
    np.testing.assert_array_equal(np.asarray(got["recon"]),
                                  np.asarray(want["recon"]))


def test_paired_bails_exactly_on_guard_beat():
    """When the pair's FIRST delta crosses the threshold — the predictive
    guard beaten — the pair must be DISCARDED: the loop returns the
    pre-pair carry bit-exactly (state, traces, i, done all unchanged) so
    the K=1 finisher redoes those iterations with its exact stop check."""
    from cytvdn_tpu.solver.engine import _PhaseCarry, _run_phase_paired

    shape = (8, 6, 64)
    orig, _, _, li, lm = _state(shape, False, seed=7)
    n = 12
    # recorded history shows a plateau (d1 = d2 = 1.0 -> pred = 1.0 >=
    # stopping) so the guard admits a pair; the ACTUAL deltas of a fresh
    # TV state are far below stopping=0.5, so dv1 crosses immediately
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
    out = _run_phase_paired(False, n, carry, orig, jnp.zeros((n,)),
                            li, lm, opts, interpret=True, i_stop=n)
    assert int(out.i) == 2, "bail must leave i at the pair start"
    assert not bool(out.done), "bail must not latch done"
    np.testing.assert_array_equal(np.asarray(out.recon),
                                  np.asarray(carry.recon))
    for a, b in zip(out.accs, carry.accs):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    np.testing.assert_array_equal(np.asarray(out.delta),
                                  np.asarray(carry.delta))
    np.testing.assert_array_equal(np.asarray(out.b_norm),
                                  np.asarray(carry.b_norm))


def test_guard_beat_end_to_end_matches_unpaired():
    """Full-run equivalence when the guard IS beaten: resuming from a
    fabricated plateau history (recorded deltas 1.0, actual deltas far
    below the threshold) the paired engine must discard the crossing
    pair and stop at the identical iteration with bit-identical recon —
    the corner the old latch-one-extra-iteration semantics got wrong."""
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
                     SolverOptions(**base, temporal_pairs=True),
                     state=dict(state))
    assert int(got["iterations_run"]) == int(want["iterations_run"])
    assert bool(got["early_stopped"]) and bool(want["early_stopped"])
    np.testing.assert_array_equal(np.asarray(got["recon"]),
                                  np.asarray(want["recon"]))
    np.testing.assert_array_equal(np.asarray(got["delta"]),
                                  np.asarray(want["delta"]))
    np.testing.assert_array_equal(np.asarray(got["b_norm"]),
                                  np.asarray(want["b_norm"]))


@pytest.mark.parametrize("block", [1, 3])
def test_guard_beat_any_block_length(monkeypatch, block):
    """The blocked stop loop's exactness must not depend on the block
    length: with _STOP_CKPT_PAIRS patched to 1 and 3 the fabricated
    guard-beat scenario still stops at the identical iteration with a
    bit-identical recon (block=1 reproduces the old per-pair-checkpoint
    semantics; block=3 discards a partial block)."""
    import cytvdn_tpu.solver.engine as E
    from cytvdn_tpu.solver.engine import run_solver

    monkeypatch.setattr(E, "_STOP_CKPT_PAIRS", block)
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
                     SolverOptions(**base, temporal_pairs=True),
                     state=dict(state))
    assert int(got["iterations_run"]) == int(want["iterations_run"])
    np.testing.assert_array_equal(np.asarray(got["recon"]),
                                  np.asarray(want["recon"]))
    np.testing.assert_array_equal(np.asarray(got["delta"]),
                                  np.asarray(want["delta"]))


@pytest.mark.parametrize("block", [2, 5])
def test_stop_block_boundaries_exact(monkeypatch, block):
    """Natural converging runs crossing multiple checkpoint blocks
    (block lengths 2 and 5 force many refreshes) must stop at the same
    iteration as the unpaired run with bit-identical state."""
    import cytvdn_tpu.solver.engine as E
    from cytvdn_tpu.solver.engine import run_solver

    monkeypatch.setattr(E, "_STOP_CKPT_PAIRS", block)
    orig, li, lm, base, stopping = _stop_case(
        (8, 6, 64), (0, 60), 21, 40, vmem_resident=False)
    want = run_solver(orig, li, lm,
                      SolverOptions(**base, temporal_pairs=False,
                                    stopping_relative_change=stopping))
    got = run_solver(orig, li, lm,
                     SolverOptions(**base, temporal_pairs=True,
                                   stopping_relative_change=stopping))
    assert int(got["iterations_run"]) == int(want["iterations_run"])
    np.testing.assert_array_equal(np.asarray(got["recon"]),
                                  np.asarray(want["recon"]))


def test_stop_aware_sharded_pairs():
    """Stop-aware pairing on an axis-0 mesh: same stop iteration and
    ulp-level recon agreement with the unsharded unpaired run."""
    from cytvdn_tpu.parallel.sharded import run_sharded
    from cytvdn_tpu.solver.engine import run_solver

    shape = (16, 8, 6, 16)
    orig, li, lm, base, stopping = _stop_case(shape, (14, 0), 5, 9)
    opts = SolverOptions(**base, stopping_relative_change=stopping)
    want = run_solver(orig, li, lm, SolverOptions(
        **base, stopping_relative_change=stopping, temporal_pairs=False))
    got = run_sharded(np.asarray(orig), np.asarray(li), np.asarray(lm),
                      opts, shard=(4, 1, 1, 1))
    assert int(want["iterations_run"]) == int(got["iterations_run"])
    np.testing.assert_allclose(np.asarray(got["recon"]),
                               np.asarray(want["recon"]),
                               rtol=5e-7, atol=1e-7)


@pytest.mark.parametrize("iters", [(8, 0), (0, 8), (5, 4)])
def test_pair_mse_matches_k1(iters):
    """Per-iteration MSE rides the pair kernel's SSE reductions (one
    extra operand at S_D): recon/state exact vs the unpaired run, the
    mse trace equal to reduction-grouping ulps."""
    from cytvdn_tpu.solver.engine import run_solver

    shape = (8, 6, 4, 16)
    orig, _, _, li, lm = _state(shape, True, seed=11)
    rng = np.random.default_rng(12)
    ref = jnp.asarray(rng.standard_normal(shape).astype(np.float32))
    base = dict(ndim=4, iterations_fista=iters[0],
                iterations_unacc=iters[1], backend=Backend.PALLAS,
                calculate_mse=True, vmem_resident=False)
    want = run_solver(orig, li, lm,
                      SolverOptions(**base, temporal_pairs=False),
                      reference_data=ref)
    got = run_solver(orig, li, lm,
                     SolverOptions(**base, temporal_pairs=True),
                     reference_data=ref)
    np.testing.assert_array_equal(np.asarray(got["recon"]),
                                  np.asarray(want["recon"]))
    assert np.all(np.asarray(got["mse"]) > 0)
    np.testing.assert_allclose(np.asarray(got["mse"]),
                               np.asarray(want["mse"]), rtol=1e-5)


def test_pair_mse_actually_pairs(monkeypatch):
    """MSE no longer gates the pair kernel off — the paired loop must
    receive the reference operand."""
    import cytvdn_tpu.kernels.temporal as TT
    from cytvdn_tpu.solver.engine import run_solver

    calls = []
    real = TT.fused_pair_iteration

    def spy(*a, **k):
        calls.append(k.get("ref") is not None)
        return real(*a, **k)

    monkeypatch.setattr(TT, "fused_pair_iteration", spy)
    shape = (8, 6, 4, 16)
    orig, _, _, li, lm = _state(shape, True, seed=11)
    ref = orig + 0.5
    opts = SolverOptions(ndim=4, iterations_fista=8, iterations_unacc=0,
                         backend=Backend.PALLAS, calculate_mse=True,
                         vmem_resident=False)
    run_solver(orig, li, lm, opts, reference_data=ref)
    assert calls and all(calls)


def test_pair_mse_sharded_matches_single():
    """MSE pairing on an axis-0 mesh: mse trace matches the unsharded
    unpaired run to psum-grouping ulps; recon at ulp tolerance."""
    from cytvdn_tpu.parallel.sharded import run_sharded
    from cytvdn_tpu.solver.engine import run_solver

    shape = (16, 8, 6, 16)
    orig, _, _, li, lm = _state(shape, True, seed=13)
    rng = np.random.default_rng(14)
    ref = np.asarray(rng.standard_normal(shape), np.float32)
    base = dict(ndim=4, iterations_fista=10, iterations_unacc=0,
                backend=Backend.PALLAS, calculate_mse=True)
    want = run_solver(orig, li, lm,
                      SolverOptions(**base, temporal_pairs=False),
                      reference_data=jnp.asarray(ref))
    got = run_sharded(np.asarray(orig), np.asarray(li), np.asarray(lm),
                      SolverOptions(**base), shard=(4, 1, 1, 1),
                      reference_data=ref)
    np.testing.assert_allclose(np.asarray(got["recon"]),
                               np.asarray(want["recon"]),
                               rtol=5e-7, atol=1e-7)
    np.testing.assert_allclose(np.asarray(got["mse"]),
                               np.asarray(want["mse"]), rtol=1e-5)


@pytest.mark.parametrize("shard,shape,iters", [
    ((2, 2, 1, 1), (8, 8, 6, 16), (8, 0)),   # FISTA 2D grid
    ((2, 2, 1), (8, 8, 64), (0, 6)),         # 3D unaccelerated
    ((2, 4, 1, 1), (8, 16, 6, 16), (5, 2)),  # hybrid, odd pair count
])
def test_pair_mse_sharded_2d_grid_matches_single(shard, shape, iters):
    """MSE pairing on a 2D device grid: the seam repair must adjust the
    kernel's SSE reductions over the recon wrong sets
    (parallel/pairfix.py), so the mse trace matches the unsharded
    unpaired run to psum-grouping ulps."""
    from cytvdn_tpu.parallel.sharded import run_sharded
    from cytvdn_tpu.solver.engine import run_solver

    ndim = len(shape)
    orig, _, _, li, lm = _state(shape, True, seed=17)
    rng = np.random.default_rng(18)
    ref = np.asarray(rng.standard_normal(shape), np.float32)
    base = dict(ndim=ndim, iterations_fista=iters[0],
                iterations_unacc=iters[1],
                backend=Backend.PALLAS, calculate_mse=True)
    local = tuple(s // w for s, w in zip(shape, shard))
    from cytvdn_tpu.solver.engine import _resolve_temporal
    assert _resolve_temporal(
        SolverOptions(**base), local, jnp.float32,
        type("C", (), {"split_axes": (0, 1)})())
    want = run_solver(orig, li, lm,
                      SolverOptions(**base, temporal_pairs=False),
                      reference_data=jnp.asarray(ref))
    got = run_sharded(np.asarray(orig), np.asarray(li), np.asarray(lm),
                      SolverOptions(**base), shard=shard,
                      reference_data=ref)
    np.testing.assert_allclose(np.asarray(got["recon"]),
                               np.asarray(want["recon"]),
                               rtol=5e-7, atol=1e-7)
    np.testing.assert_allclose(np.asarray(got["mse"]),
                               np.asarray(want["mse"]), rtol=1e-5)


def test_pair_plan_row_floor():
    assert T.pair_plan((3, 8, 6, 16)) is None  # pipeline needs >= 4 rows
    assert T.pair_plan((4, 8, 6, 16)) is not None


def test_headline_geometry_stays_pair_eligible():
    """Regression guard: the bench headline work shape (the permuted
    256,256,72,72 cube) must resolve to the pair kernel — a prior HBM
    gate misfire silently dropped the headline back to K=1."""
    import jax.numpy as jnp
    from cytvdn_tpu.solver.engine import _resolve_temporal

    opts = SolverOptions(ndim=4, iterations_fista=24, iterations_unacc=0,
                         backend=Backend.PALLAS)
    assert _resolve_temporal(opts, (72, 256, 72, 256), jnp.float32, None)
    # the 3D flagship too
    opts3 = SolverOptions(ndim=3, iterations_fista=24, iterations_unacc=0,
                          backend=Backend.PALLAS)
    assert _resolve_temporal(opts3, (256, 256, 2048), jnp.float32, None)
    # pod-scale sharded shards with non-viable band HBM fall back on TPU
    # only; on CPU (tests) they stay eligible
    from cytvdn_tpu.kernels.temporal import pair_hbm_viable
    assert not pair_hbm_viable((8, 512, 256, 256))
    assert pair_hbm_viable((16, 256, 128, 128))


@pytest.mark.parametrize("seed", range(6))
def test_pair_fuzz_random_shapes(monkeypatch, seed):
    """Randomized shapes/caps through full solver runs: the paired engine
    path must match the unpaired fused path exactly (recon/accs) across
    odd extents, prime strips, forced-small blocks, 3D/4D, hybrid and
    unaccelerated schedules."""
    from cytvdn_tpu.solver.engine import run_solver

    rng = np.random.default_rng(1000 + seed)
    ndim = int(rng.choice([3, 4]))
    if ndim == 4:
        shape = (int(rng.integers(4, 12)), int(rng.integers(2, 14)),
                 int(rng.integers(2, 9)), int(rng.integers(8, 20)))
    else:
        shape = (int(rng.integers(4, 12)), int(rng.integers(2, 10)),
                 int(rng.integers(16, 300)))
    cap = int(rng.choice([0, 4096, 16384]))
    if cap:
        monkeypatch.setattr(T, "_PAIR_BLOCK_CAP", cap)
    n_f = int(rng.integers(0, 6))
    n_u = int(rng.integers(0, 5))
    if n_f + n_u == 0:
        n_f = 3
    orig, _, _, li, lm = _state(shape, True, seed=seed)
    base = dict(ndim=ndim, iterations_fista=n_f, iterations_unacc=n_u,
                backend=Backend.PALLAS)
    want = run_solver(orig, li, lm,
                      SolverOptions(**base, temporal_pairs=False))
    got = run_solver(orig, li, lm,
                     SolverOptions(**base, temporal_pairs=True))
    np.testing.assert_array_equal(np.asarray(got["recon"]),
                                  np.asarray(want["recon"]),
                                  err_msg=f"{shape} cap={cap} "
                                          f"iters=({n_f},{n_u})")


@pytest.mark.parametrize("seed", range(4))
def test_pair_fuzz_sharded_single_axis(monkeypatch, seed):
    """Randomized single-axis (0 or 1) meshes through the paired sharded
    path vs the single-device run (ulp tolerance — FMA contraction
    differs between seam recomputes and in-carry computation)."""
    from cytvdn_tpu.parallel.sharded import run_sharded
    from cytvdn_tpu.solver.engine import run_solver

    rng = np.random.default_rng(2000 + seed)
    n_shards = int(rng.choice([2, 4, 8]))
    split_ax = int(rng.choice([0, 1]))
    rows = n_shards * int(rng.integers(4, 8)) if split_ax == 0 \
        else int(rng.integers(4, 12))
    cols = int(rng.integers(2, 10)) if split_ax == 0 \
        else n_shards * int(rng.integers(2, 5))
    ndim = int(rng.choice([3, 4]))
    if ndim == 4:
        shape = (rows, cols,
                 int(rng.integers(2, 8)), int(rng.integers(8, 18)))
    else:
        shape = (rows, cols, int(rng.integers(16, 128)))
    cap = int(rng.choice([0, 16384]))
    if cap:
        monkeypatch.setattr(T, "_PAIR_BLOCK_CAP", cap)
    n_f = int(rng.integers(1, 5))
    n_u = int(rng.integers(0, 3))
    orig, _, _, li, lm = _state(shape, True, seed=seed)
    opts = SolverOptions(ndim=ndim, iterations_fista=n_f,
                         iterations_unacc=n_u, backend=Backend.PALLAS)
    shard = tuple(n_shards if ax == split_ax else 1 for ax in range(ndim))
    single = run_solver(orig, li, lm, opts)
    got = run_sharded(np.asarray(orig), np.asarray(li), np.asarray(lm),
                      opts, shard=shard)
    np.testing.assert_allclose(
        np.asarray(got["recon"]), np.asarray(single["recon"]),
        rtol=5e-7, atol=1e-7,
        err_msg=f"{shape} shard={shard} cap={cap} iters=({n_f},{n_u})")


@pytest.mark.parametrize("seed", range(4))
def test_pair_fuzz_sharded_2d_grid(monkeypatch, seed):
    """Randomized 2D device grids through the paired sharded path + seam
    repair vs the single-device run (ulp tolerance)."""
    from cytvdn_tpu.parallel.sharded import run_sharded
    from cytvdn_tpu.solver.engine import run_solver

    rng = np.random.default_rng(4000 + seed)
    w0 = int(rng.choice([2, 4]))
    w1 = int(rng.choice([2, 4]))
    while w0 * w1 > 8:
        w1 = 2
        w0 = int(rng.choice([2, 4]))
    rows = w0 * int(rng.integers(4, 8))
    cols = w1 * int(rng.integers(4, 7))
    ndim = int(rng.choice([3, 4]))
    if ndim == 4:
        shape = (rows, cols, int(rng.integers(2, 8)),
                 int(rng.integers(8, 18)))
    else:
        shape = (rows, cols, int(rng.integers(16, 128)))
    if int(rng.choice([0, 1])):
        monkeypatch.setattr(T, "_PAIR_BLOCK_CAP", 16384)
    n_f = int(rng.integers(1, 5))
    n_u = int(rng.integers(0, 3))
    with_mse = bool(rng.choice([False, True]))
    ref = (jnp.asarray(
        rng.standard_normal(shape).astype(np.float32)) if with_mse
        else None)
    orig, _, _, li, lm = _state(shape, True, seed=seed)
    opts = SolverOptions(ndim=ndim, iterations_fista=n_f,
                         iterations_unacc=n_u, backend=Backend.PALLAS,
                         calculate_mse=with_mse)
    shard = (w0, w1) + (1,) * (ndim - 2)
    single = run_solver(orig, li, lm, opts, ref)
    got = run_sharded(np.asarray(orig), np.asarray(li), np.asarray(lm),
                      opts, shard=shard,
                      reference_data=(np.asarray(ref) if with_mse
                                      else None))
    np.testing.assert_allclose(
        np.asarray(got["recon"]), np.asarray(single["recon"]),
        rtol=5e-7, atol=1e-7,
        err_msg=f"{shape} shard={shard} iters=({n_f},{n_u})")
    if with_mse:
        np.testing.assert_allclose(
            np.asarray(got["mse"]), np.asarray(single["mse"]),
            rtol=1e-5,
            err_msg=f"mse {shape} shard={shard} iters=({n_f},{n_u})")


def test_sharded_pairs_axis1_flat_fold(monkeypatch):
    """Axis-1 mesh on a 3D cube whose energy axis takes the flat fold —
    the left/right seam recomputes must cross the fold correctly."""
    from cytvdn_tpu.parallel.sharded import run_sharded
    from cytvdn_tpu.solver.engine import run_solver

    monkeypatch.setattr(F, "_BLOCK_BYTES_TARGET", 1500)  # force flat
    shape = (6, 8, 256)
    orig, _, _, li, lm = _state(shape, True, seed=21)
    opts = SolverOptions(ndim=3, iterations_fista=4, iterations_unacc=0,
                         backend=Backend.PALLAS)
    single = run_solver(orig, li, lm, opts)
    got = run_sharded(np.asarray(orig), np.asarray(li), np.asarray(lm),
                      opts, shard=(1, 4, 1))
    np.testing.assert_allclose(np.asarray(got["recon"]),
                               np.asarray(single["recon"]),
                               rtol=5e-7, atol=1e-7)


def test_sharded_pairs_axis1_single_column_strips(monkeypatch):
    """Axis-1 mesh with B1==1 in-shard strips (the band's c1 crosses both
    strip AND shard boundaries)."""
    from cytvdn_tpu.parallel.sharded import run_sharded
    from cytvdn_tpu.solver.engine import run_solver

    monkeypatch.setattr(T, "_PAIR_BLOCK_CAP", 4096)
    shape = (5, 24, 6, 16)
    orig, _, _, li, lm = _state(shape, True, seed=22)
    opts = SolverOptions(ndim=4, iterations_fista=4, iterations_unacc=2,
                         backend=Backend.PALLAS)
    single = run_solver(orig, li, lm, opts)
    got = run_sharded(np.asarray(orig), np.asarray(li), np.asarray(lm),
                      opts, shard=(1, 2, 1, 1))
    np.testing.assert_allclose(np.asarray(got["recon"]),
                               np.asarray(single["recon"]),
                               rtol=5e-7, atol=1e-7)
