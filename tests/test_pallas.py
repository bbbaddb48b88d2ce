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
    # 3D small: direct single-strip layout, b0 amortizes the step floor
    shape, inblock, flat, b0, b1 = _plan((64, 64, 512), 4)
    assert shape == (64, 64, 512) and not flat and b1 == 64
    assert b0 >= 2  # whole strips are small; blocks batch rows
    # 3D large: folded energy axis
    shape, inblock, flat, b0, b1 = _plan((256, 256, 2048), 4)
    assert shape == (256, 256, 16, 128) and flat
    # 4D
    shape, inblock, flat, b0, b1 = _plan((128, 128, 64, 64), 4)
    assert shape == (128, 128, 64, 64) and inblock == (2, 3)
    assert b0 * b1 * 64 * 64 * 4 <= 640 * 1024
    # unsupported tail: too big for VMEM
    assert _plan((8, 8, 1024, 1024), 4) is None


def test_fused_supported_gates():
    assert fused_supported((64, 64, 512), np.dtype(np.float32),
                           BCMode.JIA_ZHAO)
    assert not fused_supported((64, 64, 512), np.dtype(np.float64),
                               BCMode.JIA_ZHAO)
    # periodic/mirror: supported except on the folded 3D layout
    assert fused_supported((64, 64, 512), np.dtype(np.float32),
                           BCMode.PERIODIC)
    assert not fused_supported((256, 256, 2048), np.dtype(np.float32),
                               BCMode.PERIODIC)  # flat fold
    # iso pairs: 4D JZ only
    assert fused_supported((16, 16, 8, 8), np.dtype(np.float32),
                           BCMode.JIA_ZHAO, isotropic_R=True)
    assert not fused_supported((16, 16, 8), np.dtype(np.float32),
                               BCMode.JIA_ZHAO, isotropic_R=True)
    assert not fused_supported((16, 16, 8, 8), np.dtype(np.float32),
                               BCMode.PERIODIC, isotropic_R=True)


@pytest.mark.parametrize("bc", [0, 1, 2])
@pytest.mark.parametrize("fista", [True, False])
def test_fused_bc_modes_match_ops(bc, fista):
    """Periodic / mirror / JZ boundary conditions through the fused kernel
    (interpret) vs the XLA ops path — 3D single-layout and 4D."""
    for shape in [(6, 8, 16), (5, 6, 8, 16)]:
        cube = _cube(shape)
        ndim = len(shape)
        mu = np.linspace(1.0, 2.0, ndim).astype(np.float32)
        fn = denoise3D if ndim == 3 else denoise4D
        kw = dict(iterations=5, FISTA=fista, BC_mode=bc, quiet=True)
        want = fn(cube, mu, backend="jax", **kw)
        got = fn(cube, mu, backend="pallas", **kw)
        _compare(got, want)


@pytest.mark.parametrize("iso_r,iso_q", [(True, False), (False, True),
                                         (True, True)])
def test_fused_iso_pairs_match_ops(iso_r, iso_q):
    """Half-isotropic joint projections through the fused kernel
    (interpret) vs the XLA ops path, including the iso (0,1) axis-1 seam
    recompute (shape chosen so the axis-1 grid has seams)."""
    shape = (6, 8, 6, 16)
    cube = _cube(shape)
    mu = np.asarray([1.0, 1.0, 2.0, 2.0], np.float32)
    kw = dict(iterations=(3, 2), isotropic_R=iso_r, isotropic_Q=iso_q,
              quiet=True)
    want = denoise4D(cube, mu, backend="jax", **kw)
    got = denoise4D(cube, mu, backend="pallas", **kw)
    _compare(got, want)


def test_fused_iso_seam_many_columns(monkeypatch):
    """iso (0,1) with several axis-1 column strips — stresses the ip-2
    operand of the iso seam recompute (block budget pinned so G1 > 1;
    at the default budget this shape fits one strip and has no seams)."""
    from cytvdn_tpu.config import SolverOptions, Backend
    from cytvdn_tpu.solver.engine import run_solver
    import cytvdn_tpu.kernels.fused as F
    import jax.numpy as jnp

    # NOTE: a shape no other test traces — jit caches key on shapes and
    # statics, not on the (patched) block-budget global, so reusing a
    # shape already traced at the default budget would silently test the
    # seam-free plan again
    shape = (7, 12, 6, 16)
    monkeypatch.setattr(F, "_BLOCK_BYTES_TARGET", 800)
    plan = F._plan(shape, 4)
    assert plan is not None and shape[1] // plan[4] > 1, plan
    cube = _cube(shape)
    mu = np.full(4, 1.0, np.float32)
    lam = mu / 32.0
    li, lm = (1.0 / lam).astype(np.float32), (lam / mu).astype(np.float32)
    base = dict(ndim=4, iterations_fista=4, iterations_unacc=0,
                isotropic_R=True)
    want = run_solver(jnp.asarray(cube), jnp.asarray(li), jnp.asarray(lm),
                      SolverOptions(**base, backend=Backend.JAX))
    got = run_solver(jnp.asarray(cube), jnp.asarray(li), jnp.asarray(lm),
                     SolverOptions(**base, backend=Backend.PALLAS))
    np.testing.assert_allclose(np.asarray(got["recon"]),
                               np.asarray(want["recon"]),
                               rtol=2e-5, atol=2e-6)


def test_sharded_pallas_q_axis_split():
    """Fused kernel with operand halos along the in-block (Q/energy) axes:
    mesh over axes 2(,3) must equal the single-device run."""
    import jax.numpy as jnp
    from cytvdn_tpu.config import SolverOptions, Backend
    from cytvdn_tpu.parallel.sharded import run_sharded
    from cytvdn_tpu.solver.engine import run_solver

    mu4 = np.full(4, 1.0, np.float32)
    lam4 = mu4 / 32.0
    li4 = (1.0 / lam4).astype(np.float32)
    lm4 = (lam4 / mu4).astype(np.float32)
    cube4 = _cube((6, 6, 8, 16))
    base = SolverOptions(ndim=4, iterations_fista=4, iterations_unacc=2)
    opts_jax = SolverOptions(**{**base.__dict__, "backend": Backend.JAX})
    opts_pls = SolverOptions(**{**base.__dict__, "backend": Backend.PALLAS})
    single = run_solver(jnp.asarray(cube4), jnp.asarray(li4),
                        jnp.asarray(lm4), opts_jax)
    for shard in [(1, 1, 4, 2), (1, 1, 1, 8), (2, 1, 2, 1), (1, 2, 1, 4)]:
        got = run_sharded(cube4, li4, lm4, opts_pls, shard=shard)
        np.testing.assert_allclose(np.asarray(got["recon"]),
                                   np.asarray(single["recon"]),
                                   rtol=2e-6, atol=2e-7)
        np.testing.assert_allclose(np.asarray(got["b_norm"]),
                                   np.asarray(single["b_norm"]), rtol=2e-4)

    # periodic BC sharded: ring halos, no edge masking
    from cytvdn_tpu.config import BCMode
    per = dict(base.__dict__)
    per["bc_mode"] = BCMode.PERIODIC
    opts_pj = SolverOptions(**{**per, "backend": Backend.JAX})
    opts_pp = SolverOptions(**{**per, "backend": Backend.PALLAS})
    single_p = run_solver(jnp.asarray(cube4), jnp.asarray(li4),
                          jnp.asarray(lm4), opts_pj)
    for shard in [(2, 3, 1, 1), (2, 1, 2, 2)]:
        got_p = run_sharded(cube4, li4, lm4, opts_pp, shard=shard)
        np.testing.assert_allclose(np.asarray(got_p["recon"]),
                                   np.asarray(single_p["recon"]),
                                   rtol=2e-6, atol=2e-7)

    # 3D single-layout with the energy axis split
    cube3 = _cube((6, 8, 32))
    mu3 = np.full(3, 1.0, np.float32)
    lam3 = mu3 / 16.0
    li3 = (1.0 / lam3).astype(np.float32)
    lm3 = (lam3 / mu3).astype(np.float32)
    b3 = SolverOptions(ndim=3, iterations_fista=3, iterations_unacc=2)
    o3_jax = SolverOptions(**{**b3.__dict__, "backend": Backend.JAX})
    o3_pls = SolverOptions(**{**b3.__dict__, "backend": Backend.PALLAS})
    single3 = run_solver(jnp.asarray(cube3), jnp.asarray(li3),
                         jnp.asarray(lm3), o3_jax)
    got3 = run_sharded(cube3, li3, lm3, o3_pls, shard=(2, 1, 4))
    np.testing.assert_allclose(np.asarray(got3["recon"]),
                               np.asarray(single3["recon"]),
                               rtol=2e-6, atol=2e-7)


def test_sharded_pallas_flat_energy_split(monkeypatch):
    """Folded-3D energy-axis sharding through the fused kernel (round 3:
    flat-element halos patch the fold's global first/last elements) must
    equal the single-device ops run."""
    import jax.numpy as jnp
    import cytvdn_tpu.kernels.fused as F
    from cytvdn_tpu.config import Backend, SolverOptions
    from cytvdn_tpu.parallel.sharded import run_sharded
    from cytvdn_tpu.solver.engine import _resolve_fused, run_solver

    monkeypatch.setattr(F, "_BLOCK_BYTES_TARGET", 1500)  # force the fold
    cube3 = _cube((6, 8, 1024))
    mu3 = np.full(3, 1.0, np.float32)
    lam3 = mu3 / 16.0
    li3 = (1.0 / lam3).astype(np.float32)
    lm3 = (lam3 / mu3).astype(np.float32)
    # the LOCAL shard shapes must themselves take the fold
    assert F._plan((6, 8, 256), 4)[2] and F._plan((6, 8, 128), 4)[2]
    b3 = SolverOptions(ndim=3, iterations_fista=3, iterations_unacc=2,
                       backend=Backend.PALLAS)
    comm = type("C", (), {"split_axes": (2,)})()
    assert _resolve_fused(b3, (6, 8, 256), jnp.float32, comm)[0]
    o3_jax = SolverOptions(ndim=3, iterations_fista=3, iterations_unacc=2,
                           backend=Backend.JAX)
    single3 = run_solver(jnp.asarray(cube3), jnp.asarray(li3),
                         jnp.asarray(lm3), o3_jax)
    for shard in [(1, 1, 4), (1, 1, 8), (2, 1, 2)]:
        got3 = run_sharded(cube3, li3, lm3, b3, shard=shard)
        np.testing.assert_allclose(np.asarray(got3["recon"]),
                                   np.asarray(single3["recon"]),
                                   rtol=2e-6, atol=2e-7,
                                   err_msg=str(shard))
        np.testing.assert_allclose(np.asarray(got3["b_norm"]),
                                   np.asarray(single3["b_norm"]),
                                   rtol=2e-4)


def test_sharded_pallas_mirror_bc():
    """Sharded mirror BC on the fused kernel: interior shards read halo
    recomputes, the global trailing shard its own updated slab (selected
    by the per-shard edge flags) — must equal the single-device run."""
    import jax.numpy as jnp
    from cytvdn_tpu.config import SolverOptions, Backend, BCMode
    from cytvdn_tpu.parallel.sharded import run_sharded
    from cytvdn_tpu.solver.engine import run_solver

    mu4 = np.full(4, 1.0, np.float32)
    lam4 = mu4 / 32.0
    li4 = (1.0 / lam4).astype(np.float32)
    lm4 = (lam4 / mu4).astype(np.float32)
    cube4 = _cube((8, 8, 6, 16))
    base = dict(ndim=4, iterations_fista=4, iterations_unacc=2,
                bc_mode=BCMode.MIRROR)
    opts_jax = SolverOptions(**base, backend=Backend.JAX)
    opts_pls = SolverOptions(**base, backend=Backend.PALLAS)
    single = run_solver(jnp.asarray(cube4), jnp.asarray(li4),
                        jnp.asarray(lm4), opts_jax)
    for shard in [(2, 4, 1, 1), (4, 1, 1, 1), (1, 2, 2, 2), (2, 1, 1, 2)]:
        got = run_sharded(cube4, li4, lm4, opts_pls, shard=shard)
        np.testing.assert_allclose(np.asarray(got["recon"]),
                                   np.asarray(single["recon"]),
                                   rtol=2e-6, atol=2e-7)
        np.testing.assert_allclose(np.asarray(got["b_norm"]),
                                   np.asarray(single["b_norm"]), rtol=2e-4)

    # 3D single-layout, unaccelerated, energy axis split
    cube3 = _cube((6, 8, 32))
    mu3 = np.full(3, 1.0, np.float32)
    lam3 = mu3 / 16.0
    li3 = (1.0 / lam3).astype(np.float32)
    lm3 = (lam3 / mu3).astype(np.float32)
    b3 = dict(ndim=3, iterations_fista=0, iterations_unacc=5,
              bc_mode=BCMode.MIRROR)
    single3 = run_solver(jnp.asarray(cube3), jnp.asarray(li3),
                         jnp.asarray(lm3),
                         SolverOptions(**b3, backend=Backend.JAX))
    got3 = run_sharded(cube3, li3, lm3,
                       SolverOptions(**b3, backend=Backend.PALLAS),
                       shard=(2, 1, 4))
    np.testing.assert_allclose(np.asarray(got3["recon"]),
                               np.asarray(single3["recon"]),
                               rtol=2e-6, atol=2e-7)


def test_sharded_pallas_matches_sharded_jax():
    """Fused kernel inside shard_map (operand halos over ppermute) must
    match the XLA sharded path and the single-device run exactly at f32."""
    import jax.numpy as jnp
    from cytvdn_tpu.config import SolverOptions, Backend
    from cytvdn_tpu.parallel.sharded import run_sharded
    from cytvdn_tpu.solver.engine import run_solver

    cube = _cube((8, 8, 6, 16))
    mu = np.full(4, 1.0, np.float32)
    lam = mu / 32.0
    li, lm = (1.0 / lam).astype(np.float32), (lam / mu).astype(np.float32)
    base = SolverOptions(ndim=4, iterations_fista=5, iterations_unacc=2)
    opts_jax = SolverOptions(**{**base.__dict__, "backend": Backend.JAX})
    opts_pls = SolverOptions(**{**base.__dict__, "backend": Backend.PALLAS})

    single = run_solver(jnp.asarray(cube), jnp.asarray(li), jnp.asarray(lm),
                        opts_jax)
    for shard in [(2, 4, 1, 1), (4, 1, 1, 1), (1, 8, 1, 1)]:
        sh_jax = run_sharded(cube, li, lm, opts_jax, shard=shard)
        sh_pls = run_sharded(cube, li, lm, opts_pls, shard=shard)
        np.testing.assert_allclose(np.asarray(sh_pls["recon"]),
                                   np.asarray(sh_jax["recon"]),
                                   rtol=2e-6, atol=2e-7)
        np.testing.assert_allclose(np.asarray(sh_pls["recon"]),
                                   np.asarray(single["recon"]),
                                   rtol=2e-6, atol=2e-7)
        np.testing.assert_allclose(np.asarray(sh_pls["b_norm"]),
                                   np.asarray(single["b_norm"]),
                                   rtol=2e-4)


@pytest.mark.parametrize("fista,bc,iso_r,iso_q", [
    (True, 2, False, False),
    (False, 2, False, False),
    (True, 0, False, False),
    (True, 1, False, False),
    (True, 2, True, False),    # iso (0,1) seam recompute incl. ip-2 operand
    (False, 2, True, True),
])
def test_fused_seam_paths_forced_small_blocks(monkeypatch, fista, bc,
                                              iso_r, iso_q):
    """Force B1 small so the axis-1 grid has real seams (G1 > 1) and B0 is
    multi-row: exercises the pre-gathered seam-column operands, the seam
    recompute (aniso and iso), and their interaction with every BC — the
    code paths most production shapes hit but most small test shapes
    don't (their whole axis 1 fits one block)."""
    import warnings

    import cytvdn_tpu.kernels.fused as F

    shape = (8, 12, 6, 16)
    # tail real bytes = 6*16*4 = 384; target 800 → B1 = 2, B0 = 1..
    monkeypatch.setattr(F, "_BLOCK_BYTES_TARGET", 800)
    plan = F._plan(shape, 4)
    assert plan is not None and shape[1] // plan[4] > 1, plan  # G1 > 1

    cube = _cube(shape)
    mu = np.linspace(1.0, 2.0, 4).astype(np.float32)
    kw = dict(iterations=(3, 2) if fista else 5, FISTA=fista, quiet=True,
              isotropic_R=iso_r, isotropic_Q=iso_q)
    if not (iso_r or iso_q):
        kw["BC_mode"] = bc
    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        want = denoise4D(cube, mu, backend="jax", **kw)
        got = denoise4D(cube, mu, backend="pallas", **kw)
    _compare(got, want)


@pytest.mark.parametrize("iso_r", [False, True])
def test_fused_seam_paths_multirow_blocks(monkeypatch, iso_r):
    """Seams with B0 > 1: multi-row blocks AND multiple column strips
    together (the seam concat paths with a real in-block body, and for
    iso the rc_up/prev_last axis-0 recompute with b0 > 1)."""
    import cytvdn_tpu.kernels.fused as F

    shape = (8, 15, 4, 8)
    # tail real = 4*8*4 = 128 B. b1_target = max(T, min(4*128, cap)) = T
    # for T=1408 → b1 ≤ 11 → divisors of 15 → 5 (G1 = 3);
    # b0: c*5*128 ≤ 1408 → 2 (divides 8). Verified by the assert below.
    monkeypatch.setattr(F, "_BLOCK_BYTES_TARGET", 1408)
    plan = F._plan(shape, 4)
    _, _, _, b0, b1 = plan
    assert b0 > 1 and shape[1] // b1 > 1, (b0, b1)
    cube = _cube(shape)
    mu = np.linspace(1.0, 2.0, 4).astype(np.float32)
    kw = dict(iterations=(3, 2), quiet=True, isotropic_R=iso_r)
    want = denoise4D(cube, mu, backend="jax", **kw)
    got = denoise4D(cube, mu, backend="pallas", **kw)
    _compare(got, want)


def test_lane_dense_permutation_matches_ops():
    """Shapes with a lane-hostile tail (e.g. (..., 9, 18)) run the fused
    kernel under the axis permutation chosen by choose_perm; results must
    match the un-permuted XLA ops path (per-element math is exact under
    permutation — only reduction order differs)."""
    from cytvdn_tpu.kernels.fused import choose_perm

    shape = (16, 12, 9, 18)
    # the permuted orientation must differ and be plannable
    assert choose_perm(shape) != (0, 1, 2, 3)
    cube = _cube(shape)
    # anisotropic per-axis parameters catch any axis-mapping mistake:
    # each axis gets a distinct lambda via a distinct mu
    mu = np.asarray([1.0, 2.0, 3.0, 4.0], np.float32)
    want = denoise4D(cube, mu, iterations=(3, 2), quiet=True, backend="jax")
    got = denoise4D(cube, mu, iterations=(3, 2), quiet=True,
                    backend="pallas")
    _compare(got, want)


def test_permuted_chunked_resume_bitexact(tmp_path):
    """Chunked execution through the permuted fused path: solver state
    round-trips user-layout → work-layout → user-layout across chunks and
    must stay bit-identical to the one-shot run."""
    from cytvdn_tpu.config import Backend, SolverOptions
    from cytvdn_tpu.utils.checkpoint import run_chunked
    from cytvdn_tpu.solver.engine import run_solver
    import jax.numpy as jnp

    shape = (12, 8, 9, 18)
    cube = _cube(shape)
    mu = np.asarray([1.0, 2.0, 3.0, 4.0], np.float32)
    lam = mu / 32.0
    li, lm = (1.0 / lam).astype(np.float32), (lam / mu).astype(np.float32)
    opts = SolverOptions(ndim=4, iterations_fista=4, iterations_unacc=3,
                         backend=Backend.PALLAS)
    want = run_solver(jnp.asarray(cube), jnp.asarray(li), jnp.asarray(lm),
                      opts)
    got = run_chunked(cube, li, lm, opts,
                      checkpoint_path=str(tmp_path / "ck.npz"),
                      checkpoint_every=3)
    np.testing.assert_array_equal(np.asarray(got["recon"]),
                                  np.asarray(want["recon"]))
    # solver STATE is bit-exact across chunk boundaries; the b_norm trace
    # may differ in the last ulp because chunking changes which kernel
    # (K=2 pair vs K=1 with B0>1) sums a given iteration's reduction —
    # different float grouping, same values (the reference's own traces
    # are order-nondeterministic OpenMP reductions, SURVEY.md §2.1)
    np.testing.assert_allclose(np.asarray(got["b_norm"]),
                               np.asarray(want["b_norm"]), rtol=1e-6)


def test_choose_perm_dense_cases():
    from cytvdn_tpu.kernels.fused import choose_perm

    # already dense: identity preferred
    assert choose_perm((128, 128, 128, 128)) == (0, 1, 2, 3)
    assert choose_perm((64, 64, 512)) == (0, 1, 2)
    # (256,256,72,72): some permutation must make the tail lane-dense
    perm = choose_perm((256, 256, 72, 72))
    ws = tuple((256, 256, 72, 72)[p] for p in perm)
    assert ws[-1] % 128 == 0 and ws[-2] % 8 == 0


@pytest.mark.parametrize("shape,fista,bc,iso_r,iso_q", [
    ((7, 10, 12), True, 2, False, False),
    ((3, 5, 9, 11), False, 2, False, False),
    ((9, 4, 6, 13), True, 2, False, False),
    ((7, 9, 11), False, 0, False, False),     # periodic, odd 3D
    ((5, 7, 4, 9), True, 0, False, False),    # periodic, odd 4D
    ((5, 7, 4, 9), True, 1, False, False),    # mirror, odd 4D
    ((3, 9, 5, 7), False, 1, False, False),
    ((5, 4, 7, 9), True, 2, True, False),     # iso_R, odd
    ((5, 4, 7, 9), False, 2, False, True),    # iso_Q, odd
])
def test_fused_fuzz_shapes(shape, fista, bc, iso_r, iso_q):
    """Odd, non-aligned shapes through the full solver across BC modes and
    iso pairs: fused (interpret) vs XLA ops."""
    import warnings

    cube = _cube(shape)
    ndim = len(shape)
    mu = np.linspace(1.0, 2.0, ndim).astype(np.float32)
    fn = denoise3D if ndim == 3 else denoise4D
    kw = dict(iterations=4, FISTA=fista, BC_mode=bc, quiet=True)
    if ndim == 4:
        kw.update(isotropic_R=iso_r, isotropic_Q=iso_q)
    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        want = fn(cube, mu, backend="jax", **kw)
        got = fn(cube, mu, backend="pallas", **kw)
    _compare(got, want)


def test_write_emd_sharded(tmp_path):
    """Region-writing a sharded device array without a host gather."""
    import jax
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P
    from cytvdn_tpu.io.emd import read_emd, write_emd_sharded
    from cytvdn_tpu.parallel.sharded import make_mesh

    mesh, names = make_mesh((2, 4, 1))
    data = _cube((8, 8, 6))
    arr = jax.device_put(
        jnp.asarray(data), NamedSharding(mesh, P("ax0", "ax1", None))
    )
    path = write_emd_sharded(str(tmp_path / "sharded.emd"), arr)
    np.testing.assert_array_equal(read_emd(path), data)
