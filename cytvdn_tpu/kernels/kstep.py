"""Generalized temporal blocking: K full TV iterations per HBM pass, for
single-strip layouts.

The K=2 pair kernel (``kernels/temporal.py``) halves streaming traffic by
keeping one iteration's state in VMEM row carries. Its cost structure is
dominated by the axis-1 strip-seam machinery (band recomputes + the
2·N0·tail seam-column double buffer), which is what bounds it at K=2 on
strip-split shapes. But shapes whose whole axis 1 fits one block — every
3D benchmark geometry, e.g. (2048, 256, 256) — have NO seams at all, and
there the staircase generalizes to arbitrary depth with VMEM growing only
LINEARLY in K (~2 row carries per state array per extra iteration):

    step ``ip`` of the 1-D sequential grid runs a 2K-stage staircase —
      dual-t   at row ip - 2(t-1)     (t = 1..K)
      recon-t  at row ip - (2t - 1)   (t = 1..K)
    Iterations 1..K-1 exist ONLY in VMEM ring carries; HBM sees one read
    and one write of each state array per K iterations: ~(4n+3)/K
    traversals per iteration (19/K for 4D FISTA, 15/K for 3D FISTA).

Every dependency is satisfied by the same ring-carry pattern the pair
kernel uses, one level per iteration. At step ``ip`` (after the previous
step's end-of-step shifts):

  - level-t dual ring slot [0] holds b_t at row ip-(2t-1), slot [1] at
    row ip-2t; the d rings mirror them;
  - level-t recon ring slot [0] holds R_t at row ip-2t, slot [1] at row
    ip-(2t+1);
  - the orig ring ``c_og[m]`` holds orig at row ip-2-m.

  dual-t at row ip-2(t-1) then reads R_{t-1} from (slot[0], slot[1]) of
  level t-1's recon ring (level 0: the fetched block + ``c_r0``), and
  its accumulator inputs b_{t-1}/d_{t-1} from level t-1's dual ring
  slot [1]. recon-t at row ip-(2t-1) reads b_t from level t's dual ring
  slot [0] (level K: the 1-deep ``c_bK``), its axis-0 forward operand
  from THIS step's fresh dual-t (the staircase trick), orig from
  ``c_og[2t-3]`` and the delta baseline R_{t-1} from level t-1's recon
  ring slot [1].

Because each stage performs identical arithmetic to the K=1 kernel's
corresponding pass, in the same row order, and each per-iteration
reduction accumulates in the same row order into its own SMEM cell,
results — recon, accumulators, b_norm and delta traces — are
**bit-identical** to running the fused K=1 kernel K times (asserted
compiled-on-TPU in TPU_FUSED_PARITY.json ``kstep_vs_k1``). Under
``lossy_duals`` every intermediate level quantizes its plain duals to
the bf16 grid (``temporal.round_bf16``) and the final level stores bf16
— exactly the rounding K=1 execution applies through its HBM
writeback/reload — so the solver-state invariant (CLAUDE.md) holds for
any mix of K values across chunk boundaries, lossy or exact.

Scope: float32, Jia-Zhao, anisotropic, single device, single-strip
layouts (``kstep_plan``), FISTA and unaccelerated, any K >= 2. Sharded
meshes, strip-split shapes (the 4D flagship), stop-aware runs and
per-iteration MSE keep riding the K=2 pair kernel (``solver.engine``
gates); shapes whose whole state fits VMEM ride the resident kernel.

Reference baseline for the math: one iteration = per-axis dual update +
reconstruction update (reference cyTVDN/cyTVDN.py:147-194, spec
SURVEY.md §8.1); this kernel computes exactly K of them.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from cytvdn_tpu.kernels.fused import (
    _plan,
    _shift_down_inblock,
    _shift_up_inblock,
    _shift_down_flat,
    _shift_up_flat,
)
from cytvdn_tpu.kernels.temporal import (
    round_bf16,
    _VMEM_CAP,
    _SMALL_RESERVE,
)

Array = jax.Array

#: candidate staircase depths, deepest first (the engine picks the first
#: viable one). Deeper K keeps cutting HBM traffic by 1/K but the VPU
#: roofline flattens the rate curve; the on-chip sweep (SWEEP_KSTEP.json)
#: pins where that happens for the benchmark geometries.
KSTEP_CANDIDATES = (8, 6, 4, 3)

#: fixed slack on the live-buffer count (pallas bookkeeping, the scal
#: SMEM block, grid semaphores). Calibrated on-chip: at 6, the
#: (32,32,64,64) FISTA k=4 plan (109 modeled buffers x 1.05 MB padded
#: blocks ~ 114M) sat exactly at the 116M scoped ask and Mosaic's true
#: accounting rejected it; 18 keeps a ~15% margin at block sizes ~1 MB
#: while leaving k=8 viable on every 3D benchmark geometry.
_KSTEP_SLACK = 18


def kstep_buffers(k: int, ndim: int, fista: bool,
                  with_sse: bool = False) -> int:
    """Conservative live block-buffer count of the K-step kernel: the
    pipelined I/O blocks (double-buffered) plus the ring carries.
    ``with_sse`` charges the streamed reference-data block and its ring
    (per-iteration MSE runs)."""
    nd = ndim
    n_in = 2 + nd + (nd if fista else 0)          # orig, r0, accs [, ds]
    n_in += 1 if with_sse else 0                  # reference data
    n_out = 1 + nd + (nd if fista else 0)         # rK, bK [, dK]
    io = 2 * (n_in + n_out)
    carries = (
        1                                         # c_r0
        + (2 * k - 2)                             # orig ring
        + ((2 * k - 2) if with_sse else 0)        # ref ring
        + (k - 1) * 2 * nd                        # b_t rings
        + ((k - 1) * 2 * nd if fista else 0)      # d_t rings
        + (k - 1) * 2                             # r_t rings
        + nd                                      # c_bK
    )
    return io + carries + _KSTEP_SLACK


def kstep_plan(shape: Tuple[int, ...], itemsize: int, k: int,
               fista: bool, with_sse: bool = False):
    """Single-strip block plan for a K-step run: the fused kernel's
    layout with axis 1 whole in one block and B0 = 1. Returns
    ``(work_shape, inblock_axes, flat)`` or None (strip-split shapes,
    pipelines deeper than the row count, or VMEM-infeasible depths)."""
    plan = _plan(tuple(shape), itemsize)
    if plan is None:
        return None
    work_shape, inblock_axes, flat, _, _ = plan
    n0, n1 = work_shape[0], work_shape[1]
    if n0 < 2 * k:
        return None
    tail = work_shape[2:]
    # padded bytes of the (1, n1, *tail) block: the minor two dims of
    # the BLOCK tile to (8, 128)
    dims = [n1] + list(tail)
    dims[-1] = -(-dims[-1] // 128) * 128
    dims[-2] = -(-dims[-2] // 8) * 8
    block_pad = int(np.prod(dims)) * itemsize
    cap = (_VMEM_CAP - _SMALL_RESERVE) \
        // kstep_buffers(k, len(shape), fista, with_sse)
    if block_pad > cap:
        return None
    return work_shape, inblock_axes, flat


def kstep_supported(shape, dtype, bc, k: int, fista: bool,
                    with_sse: bool = False) -> bool:
    """Whether the K-step kernel covers this config (single-device
    Jia-Zhao anisotropic float32 on a single-strip layout)."""
    from cytvdn_tpu.config import BCMode

    if dtype != jnp.float32:
        return False
    if len(shape) not in (3, 4):
        return False
    if bc != BCMode.JIA_ZHAO:
        return False
    return kstep_plan(tuple(shape), 4, k, fista, with_sse) is not None


def best_kstep(shape, dtype, bc, fista: bool,
               forced: Optional[int] = None,
               with_sse: bool = False) -> int:
    """Largest viable staircase depth beyond the pair kernel (0 = none).
    ``forced`` pins a specific K (still validated against the plan)."""
    cands = (forced,) if forced else KSTEP_CANDIDATES
    for k in cands:
        if k and k >= 3 and kstep_supported(shape, dtype, bc, k, fista,
                                            with_sse):
            return k
    return 0


def _make_kstep_kernel(n_ax: int, inblock_axes: Tuple[int, ...],
                       flat: bool, fista: bool, k: int, n0: int,
                       lossy: bool, with_sse: bool = False):
    """Kernel body; operand order must match :func:`fused_kstep_iteration`.

    Stage guards (grid index ``ip`` in [0, n0 + 2k - 2]):
    dual-t active for 2(t-1) <= ip <= n0-1+2(t-1); recon-t for
    2t-1 <= ip <= n0-1+2t-1. Ring carries shift at the END of the step
    (reads happen first), so a carry read at step ``ip`` sees the value
    produced ``depth`` steps ago.

    ``with_sse`` streams the reference datacube alongside ``orig`` (one
    block at row ip-1, ringed exactly like the orig ring) and
    accumulates each level's squared error against it at that level's
    recon row — K per-iteration SSE scalars per pass, one reference
    traversal per K iterations (reference cyTVDN/cyTVDN.py:176-181).
    """
    n_sums = 3 * k + (k if with_sse else 0)

    def kernel(*refs):
        it = iter(refs)
        scal = next(it)                        # SMEM (1, 2n + k)
        orig = next(it)                        # block @ ip-1
        r0 = next(it)                          # block @ ip
        acc0 = [next(it) for _ in range(n_ax)]     # blocks @ ip
        d0 = [next(it) for _ in range(n_ax)] if fista else None
        ref_in = next(it) if with_sse else None    # block @ ip-1
        rK_out = next(it)                      # block @ ip-(2k-1)
        bK_out = [next(it) for _ in range(n_ax)]   # blocks @ ip-(2k-2)
        dK_out = [next(it) for _ in range(n_ax)] if fista else None
        sums_o = [next(it) for _ in range(n_sums)]  # SMEM (1, 1) each

        c_r0 = next(it)                        # R0 row ip-1
        c_og = next(it)                        # orig ring, (2k-2, ...)
        c_ref = next(it) if with_sse else None  # ref ring, (2k-2, ...)
        c_bs, c_ds, c_rs = [], [], []
        for _t in range(k - 1):                # levels 1..k-1
            c_bs.append([next(it) for _ in range(n_ax)])   # (2, ...)
            if fista:
                c_ds.append([next(it) for _ in range(n_ax)])
            c_rs.append(next(it))              # (2, ...)
        c_bK = [next(it) for _ in range(n_ax)]     # b_K rows ip-(2k-1)
        s_sums = next(it)                      # SMEM (n_sums,)

        ip = pl.program_id(0)
        # Ring carries are CIRCULAR buffers — no per-step copy shifts
        # (measured: the copied-ring variant plateaued at ~29 G on the
        # 3D benchmark geometry because k*(2n+3) block copies per step
        # dwarfed the useful I/O). A value produced at step s lives in
        # slot s mod depth; reads happen before this step's write, so
        # the slot being overwritten (depth steps old) is still valid
        # when read earlier in the same step.
        two = jnp.int32(2)
        par0 = lax.rem(ip, two)                # slot written this step
        par1 = lax.rem(ip + jnp.int32(1), two)  # value from step ip-1
        d_og = jnp.int32(2 * k - 2)

        def rd(ref, slot):
            return ref[pl.ds(slot, 1)]

        @pl.when(ip == 0)
        def _():
            for q in range(3 * k):
                s_sums[q] = jnp.float32(0.0)

        lam_inv = [scal[0, q] for q in range(n_ax)]
        lam_mu = [scal[0, n_ax + q] for q in range(n_ax)]
        rhos = [scal[0, 2 * n_ax + t] for t in range(k)]

        def qd(v):
            # intermediate-level duals round to the bf16 storage grid
            # under lossy mode — matching K=1's HBM writeback/reload
            return round_bf16(v) if lossy else v

        def dual(diff, acc_v, d_v, ax, rho):
            """One dual update (reference anisotropic.pyx:127-132;
            plain when not FISTA)."""
            c = jnp.clip(diff + acc_v, -lam_inv[ax], lam_inv[ax])
            if fista:
                return c + rho * (c - d_v), c
            return c, c

        def back_diffs(r_now, r_prev, lead_zero):
            """All per-axis backward differences of one row block;
            ``lead_zero`` marks the global first row (JZ: axis-0 diff
            is zero there). Axes >= 1 live whole in the block, so their
            JZ edges are realized by the in-block shift helpers."""
            diffs = [jnp.where(lead_zero, jnp.zeros_like(r_now),
                               r_now - r_prev)]
            diffs.append(r_now - _shift_down_inblock(r_now, 1))
            for ax in inblock_axes:
                diffs.append(r_now - _shift_down_inblock(r_now, ax))
            if flat:
                diffs.append(r_now - _shift_down_flat(r_now))
            return diffs

        def fwd_div(b_row, b_next0, have_next0):
            """Divergence Σ_q lam_mu_q (b_q - S_q+ b_q) of one row's
            duals; axis 0's forward operand is the row above's fresh
            dual (zero past the global last row — JZ). Axes >= 1 wrap
            in-block onto the identically-zero JZ leading slab."""
            f0 = jnp.where(have_next0, b_next0,
                           jnp.zeros_like(b_row[0]))
            div = lam_mu[0] * (b_row[0] - f0)
            div = div + lam_mu[1] * (b_row[1]
                                     - _shift_up_inblock(b_row[1], 1))
            for i_ax, ax in enumerate(inblock_axes):
                q = 2 + i_ax
                div = div + lam_mu[q] * (
                    b_row[q] - _shift_up_inblock(b_row[q], ax))
            if flat:
                q = n_ax - 1
                div = div + lam_mu[q] * (
                    b_row[q] - _shift_up_flat(b_row[q]))
            return div

        a = r0[...]
        og = orig[...]

        fresh_b, fresh_d, fresh_r = [], [], []

        for t in range(1, k + 1):
            in_dual = jnp.logical_and(ip >= 2 * (t - 1),
                                      ip <= n0 - 1 + 2 * (t - 1))
            in_recon = jnp.logical_and(ip >= 2 * t - 1,
                                       ip <= n0 - 1 + 2 * t - 1)

            # ---- dual-t at row ip - 2(t-1) ----
            if t == 1:
                r_now, r_prev = a, c_r0[...]
            else:
                r_now = rd(c_rs[t - 2], par1)      # R_{t-1}, 1 step old
                r_prev = rd(c_rs[t - 2], par0)     # 2 steps old
            diffs = back_diffs(r_now, r_prev, ip <= 2 * (t - 1))
            b_t, d_t = [], []
            bnorm = jnp.zeros((), jnp.float32)
            for ax in range(n_ax):
                if t == 1:
                    av = acc0[ax][...]
                    dv = (d0[ax][...].astype(a.dtype)
                          if fista else None)
                else:
                    av = rd(c_bs[t - 2][ax], par0)     # 2 steps old
                    dv = (rd(c_ds[t - 2][ax], par0)
                          if fista else None)
                bk, dk = dual(diffs[ax], av, dv, ax, rhos[t - 1])
                b_t.append(bk)
                d_t.append(qd(dk) if (fista and t < k) else dk)
                bnorm = bnorm + jnp.sum(jnp.abs(bk))

            @pl.when(in_dual)
            def _(bnorm=bnorm, t=t, b_t=b_t, d_t=d_t):
                s_sums[3 * (t - 1)] = s_sums[3 * (t - 1)] + bnorm
                if t == k:
                    for ax in range(n_ax):
                        bK_out[ax][...] = b_t[ax]
                        if fista:
                            dK_out[ax][...] = \
                                d_t[ax].astype(dK_out[ax].dtype)

            fresh_b.append(b_t)
            fresh_d.append(d_t)

            # ---- recon-t at row ip - (2t - 1) ----
            if t == 1:
                og_row = og
                r_base = c_r0[...]
            else:
                # orig fetched at step ip-(2t-2) covers row ip-(2t-1)
                og_row = rd(c_og,
                            jnp.mod(ip - jnp.int32(2 * t - 2), d_og))
                r_base = rd(c_rs[t - 2], par0)
            if t < k:
                b_row = [rd(c_bs[t - 1][ax], par1)
                         for ax in range(n_ax)]
            else:
                b_row = [c_bK[ax][...] for ax in range(n_ax)]
            div = fwd_div(b_row, b_t[0], in_dual)
            r_t = og_row - div

            @pl.when(in_recon)
            def _(r_t=r_t, r_base=r_base, t=t):
                s_sums[3 * (t - 1) + 1] = s_sums[3 * (t - 1) + 1] \
                    + jnp.sum(jnp.abs(r_t - r_base))
                s_sums[3 * (t - 1) + 2] = s_sums[3 * (t - 1) + 2] \
                    + jnp.sum(jnp.abs(r_base))
                if t == k:
                    rK_out[...] = r_t

            fresh_r.append(r_t)

        # ---- end of step: write this step's values into their slots ----
        for t in range(1, k):                  # intermediate levels
            for ax in range(n_ax):
                c_bs[t - 1][ax][pl.ds(par0, 1)] = fresh_b[t - 1][ax]
                if fista:
                    c_ds[t - 1][ax][pl.ds(par0, 1)] = fresh_d[t - 1][ax]
            c_rs[t - 1][pl.ds(par0, 1)] = fresh_r[t - 1]
        for ax in range(n_ax):
            c_bK[ax][...] = fresh_b[k - 1][ax]
        c_og[pl.ds(lax.rem(ip, d_og), 1)] = og
        c_r0[...] = a

        # ---- final step: publish the reductions ----
        @pl.when(ip == n0 + 2 * k - 2)
        def _():
            for q in range(3 * k):
                sums_o[q][0, 0] = s_sums[q]

    return kernel


@functools.partial(jax.jit, static_argnames=("k", "fista", "interpret"))
def fused_kstep_iteration(
    orig: Array,
    recon: Array,
    accs: Tuple[Array, ...],
    ds: Optional[Tuple[Array, ...]],
    rhos: Array,
    lambda_inv: Array,
    lam_mu: Array,
    k: int,
    fista: bool = True,
    interpret: bool = False,
):
    """K full TV iterations in one temporally-blocked Pallas pass.

    ``rhos`` is the (k,)-shaped array of FISTA momentum ratios for the K
    iterations (ignored unaccelerated). Returns
    ``(reconK, accsK, dsK, bn, dnum, dden)`` where the last three are
    (k,)-shaped per-iteration reduction vectors, bit-matching K passes
    of the K=1 kernel.
    """
    in_shape = orig.shape
    ndim = len(in_shape)
    plan = kstep_plan(in_shape, orig.dtype.itemsize, k, fista)
    if plan is None:
        raise ValueError(
            f"kstep kernel does not support shape {in_shape} at K={k}")
    shape, inblock_axes, flat = plan
    lossy = bool(fista) and ds[0].dtype == jnp.bfloat16

    def emb(x):
        return x.reshape(shape)

    orig_w, recon_w = emb(orig), emb(recon)
    accs_w = tuple(emb(x) for x in accs)
    ds_w = tuple(emb(x) for x in ds) if fista else None

    n0, n1 = shape[0], shape[1]
    tail = shape[2:]
    block = (1, n1) + tail
    zeros_tail = tuple(0 for _ in tail)

    n_scal = 2 * ndim + k
    scal = jnp.concatenate([
        lambda_inv.astype(jnp.float32),
        lam_mu.astype(jnp.float32),
        jnp.asarray(rhos, jnp.float32).reshape(k),
    ]).reshape(1, n_scal)

    def at(o):
        def m(ip):
            return (jnp.clip(ip - o, 0, n0 - 1), 0) + zeros_tail
        return m

    def blk(m):
        return pl.BlockSpec(block, m, memory_space=pltpu.VMEM)

    in_specs = [
        pl.BlockSpec((1, n_scal), lambda ip: (0, 0),
                     memory_space=pltpu.SMEM),
        blk(at(1)),     # orig
        blk(at(0)),     # R0
    ]
    inputs = [scal, orig_w, recon_w]
    aliases = {2: 0}    # R0 -> RK
    acc_base = len(inputs)
    in_specs += [blk(at(0)) for _ in range(ndim)]
    inputs += [*accs_w]
    for q in range(ndim):
        aliases[acc_base + q] = 1 + q              # acc0_q -> bK_q
    if fista:
        d_base = len(inputs)
        in_specs += [blk(at(0)) for _ in range(ndim)]
        inputs += [*ds_w]
        for q in range(ndim):
            aliases[d_base + q] = 1 + ndim + q     # d0_q -> dK_q

    dt = orig.dtype
    scal_out = pl.BlockSpec((1, 1), lambda ip: (0, 0),
                            memory_space=pltpu.SMEM)
    out_specs = [blk(at(2 * k - 1))]               # RK
    out_shape = [jax.ShapeDtypeStruct(shape, dt)]
    out_specs += [blk(at(2 * k - 2)) for _ in range(ndim)]   # bK
    out_shape += [jax.ShapeDtypeStruct(shape, dt)] * ndim
    if fista:
        out_specs += [blk(at(2 * k - 2)) for _ in range(ndim)]  # dK
        # dK keeps ds's storage dtype (bf16 under lossy-duals) so the
        # HBM alias d0_q -> dK_q holds and the traffic saving is real
        out_shape += [jax.ShapeDtypeStruct(shape, ds_w[0].dtype)] * ndim
    out_specs += [scal_out] * (3 * k)
    out_shape += [jax.ShapeDtypeStruct((1, 1), jnp.float32)] * (3 * k)

    ring2 = (2,) + block[1:]
    scratch = [pltpu.VMEM(block, dt)]                      # c_r0
    scratch += [pltpu.VMEM((2 * k - 2,) + block[1:], dt)]  # c_og ring
    for _t in range(k - 1):
        scratch += [pltpu.VMEM(ring2, dt)
                    for _ in range(ndim)]                  # c_b rings
        if fista:
            scratch += [pltpu.VMEM(ring2, dt)
                        for _ in range(ndim)]              # c_d rings
        scratch += [pltpu.VMEM(ring2, dt)]                 # c_r ring
    scratch += [pltpu.VMEM(block, dt) for _ in range(ndim)]   # c_bK
    scratch += [pltpu.SMEM((3 * k,), jnp.float32)]

    outs = pl.pallas_call(
        _make_kstep_kernel(ndim, inblock_axes, flat, fista, k, n0,
                           lossy),
        grid=(n0 + 2 * k - 1,),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=scratch,
        input_output_aliases=aliases,
        interpret=interpret,
        compiler_params=None if interpret else pltpu.CompilerParams(
            vmem_limit_bytes=_VMEM_CAP
        ),
    )(*inputs)

    def unemb(x):
        return x.reshape(in_shape)

    reconK = unemb(outs[0])
    accsK = tuple(unemb(o) for o in outs[1:1 + ndim])
    if fista:
        dsK = tuple(unemb(o) for o in outs[1 + ndim:1 + 2 * ndim])
        scals = outs[1 + 2 * ndim:]
    else:
        dsK = None
        scals = outs[1 + ndim:]
    svals = [s[0, 0] for s in scals]
    bn = jnp.stack([svals[3 * t] for t in range(k)])
    dnum = jnp.stack([svals[3 * t + 1] for t in range(k)])
    dden = jnp.stack([svals[3 * t + 2] for t in range(k)])
    return reconK, accsK, dsK, bn, dnum, dden
