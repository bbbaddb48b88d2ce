"""Axis-1 seam repair for the K=2 pair kernel on 2D device grids.

The temporally-blocked pair kernel (``kernels/temporal.py``) supports
shard halos on ONE axis at a time in-kernel: combining its axis-0 band
machinery with axis-1 column staging would need corner operands from all
four diagonal neighbor shards threaded through three recompute stages.
Instead of growing the kernel, a 2D-grid run (mesh split on data axes 0
AND 1) executes:

1. the pair kernel with its axis-0 halo bands and *Jia-Zhao* axis-1
   edges — exact everywhere EXCEPT a fixed 2-column light cone at each
   interior axis-1 seam (the stencil radius is 1 column/iteration);
2. this module's **strip repair**: an 8-column strip straddling each
   seam (own 4 edge columns + the axis-1 neighbor's 4, one packed
   ppermute) is advanced TWO iterations through the XLA ops path with
   proper axis-0 shard halos — the strip's row exchanges ARE the corner
   data, expressed as ordinary ppermutes — and the exact values
   overwrite the wrong columns;
3. trace repair: the kernel's per-iteration reductions included the
   wrong columns' contributions; a second strip pass with the kernel's
   own (JZ-edge) semantics reproduces those values so each sum is
   adjusted by (correct − kernel-wrong) over exactly the wrong sets.
   Per-iteration SSE reductions (``ref`` given) are adjusted the same
   way over the recon wrong sets — the reference columns involved are
   the shard's own, so no extra exchange is needed.

Wrong-set derivation (per shard of local width m, JZ axis-1 edges):
iteration-1 duals are wrong only at the axis-1 dual's column 0
(missing left operand); recon-1 at columns {0, m−1} (col 0 via its
wrong dual, col m−1 via the missing forward wrap); iteration-2 duals at
columns {0, 1(axis-1 only), m−1}; recon-2 at columns {0, 1, m−2, m−1}.
An 8-column strip provides exact values over seam±2: validity creeps in
one column per difference stage from each strip edge, and the needed
columns stay ≥2 inside.

Column repairs are ulp-accurate, not bitwise (ops vs Mosaic FMA
contraction — the same tolerance the in-kernel seam recomputes already
carry, kernels/temporal.py docstring); state outside the light cone is
untouched and therefore bit-identical to the kernel.

Reference context: the reference's entire scale story is this 2D scan
grid (reference cyTVDN/mpi.py:130-214); its halo exchange never needed
corners because it is one-iteration-deep (and off-by-one, SURVEY §8.3).
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax import lax

from cytvdn_tpu import ops
from cytvdn_tpu.config import BCMode
from cytvdn_tpu.ops.stencil import _slab

Array = jax.Array

#: columns taken from each side of a seam (4+4 strip)
_SW = 4


def _cols(x: Array, lo: int, hi: Optional[int]) -> Array:
    n = x.shape[1]
    if hi is None:
        hi = n
    return lax.slice_in_dim(x, lo, hi, axis=1)


def _strip_two_iters(orig_s, r0_s, accs_s, ds_s, rho1, rho2, li, lm,
                     comm0, zero_next1: bool,
                     d_store=None):
    """Two TV iterations on a column strip via the ops path.

    ``comm0`` exchanges axis-0 shard halos only (the strip's own row
    seams). Axis-1 edges inside the strip follow plain JZ semantics;
    ``zero_next1`` replaces the recon updates' axis-1 forward wrap with
    an explicit zero slab — the pair kernel's behavior at a shard's last
    column (``lastc``/``lastc2`` masked to zero without axis-1 halos).

    ``d_store`` is the duals' HBM storage dtype (bfloat16 under
    ``lossy_duals``): iteration-1 duals round to it before iteration 2
    reads them — the kernel's per-iteration qd1 cadence
    (kernels/temporal.py), so the repaired columns follow the same
    rounding the kernel's own columns do. The rounding is the shared
    ``round_bf16`` integer-bit RNE (kernels/temporal.py), NOT
    ``astype(bf16).astype(f32)``: both iterations live in ONE jit
    trace here, and XLA's excess-precision rule folds an inline
    down-up convert pair to a no-op (proven on-chip,
    tests/manual_fused_check.py lossy section) — which would silently
    give the repaired columns exact duals while the kernel's own columns
    round, breaking the lossy mesh ≡ single-device invariant.

    Returns ``(r1, b1s, r2, b2s, d2s)``.
    """
    from cytvdn_tpu.kernels.temporal import round_bf16

    ndim = r0_s.ndim
    fista = ds_s is not None
    if fista and d_store is None:
        d_store = ds_s[0].dtype
    lossy = fista and jnp.dtype(d_store) == jnp.bfloat16

    def round_d(d):
        return round_bf16(d) if lossy else d

    def one(r, accs, ds, rho):
        accs_n, ds_n = [], []
        for ax in range(ndim):
            halo = comm0.prev_halo(r, ax) if ax == 0 else None
            if fista:
                b, d, _ = ops.accumulator_update_fista(
                    r, accs[ax], ds[ax], rho, ax, li[ax], BCMode.JIA_ZHAO,
                    halo)
                ds_n.append(round_d(d))
            else:
                b, _ = ops.accumulator_update(
                    r, accs[ax], ax, li[ax], BCMode.JIA_ZHAO, halo)
            accs_n.append(b)
        hn = [None] * ndim
        hn[0] = comm0.next_halo(accs_n[0], 0)
        if zero_next1:
            hn[1] = jnp.zeros_like(_slab(accs_n[1], 1, 0))
        r_n, _, _ = ops.datacube_update(
            orig_s, r, accs_n, lm, BCMode.JIA_ZHAO, hn)
        return r_n, accs_n, (ds_n if fista else None)

    r1, b1s, d1s = one(r0_s, accs_s, ds_s, rho1)
    r2, b2s, d2s = one(r1, b1s, d1s, rho2)
    return r1, b1s, r2, b2s, d2s


def _sum_abs(x):
    return jnp.sum(jnp.abs(x))


def repair_axis1_seams(
    comm,
    orig: Array,
    recon0: Array,
    accs0: Tuple[Array, ...],
    ds0,
    recon2: Array,
    accs2: Tuple[Array, ...],
    ds2,
    rho1,
    rho2,
    lambda_inv,
    lam_mu,
    sums,
    ref: Optional[Array] = None,
    sse: Optional[Tuple[Array, Array]] = None,
):
    """Repair one pair step's axis-1 shard seams.

    ``recon0/accs0/ds0`` are the PRE-pair state (the same operands the
    kernel consumed), ``recon2/accs2/ds2`` the kernel's outputs computed
    with JZ axis-1 edges. ``sums = (bn1, dn1, dd1, bn2, dn2, dd2)`` are
    the kernel's local (pre-psum) reductions. With ``ref`` (the shard's
    reference-data block) and ``sse = (sse1, sse2)`` (the kernel's local
    per-iteration SSE reductions, reference cyTVDN/cyTVDN.py:176-181),
    the SSE sums are repaired over the recon wrong sets too. Returns the
    repaired ``(recon2, accs2, ds2, sums, sse)`` (``sse`` is None when
    not given).
    """
    from cytvdn_tpu.parallel.halo import MeshComm

    ndim = orig.ndim
    fista = ds0 is not None
    m = orig.shape[1]
    with_sse = ref is not None
    if with_sse:
        sse1, sse2 = sse

    def _sq(a, r):
        d = a.astype(jnp.float32) - r.astype(jnp.float32)
        return jnp.sum(d * d)
    comm0 = MeshComm({0: comm.axis_names[0]}, comm.bc) \
        if 0 in comm.axis_names else MeshComm({}, comm.bc)
    first1 = comm.is_first(1) > 0
    last1 = comm.is_last(1) > 0
    bn1, dn1, dd1, bn2, dn2, dd2 = sums

    # duals pack/compute at f32 (exact widening from the bf16 storage
    # under lossy_duals); their storage dtype drives the strip's
    # per-iteration rounding cadence (see _strip_two_iters)
    d_store = ds0[0].dtype if fista else None
    state = [recon0, orig] + list(accs0) \
        + ([d.astype(orig.dtype) for d in ds0] if fista else [])

    # one packed collective per direction: own edge columns of the whole
    # pre-update state
    right_recv = comm.pack_exchange_next(
        [_cols(x, 0, _SW) for x in state], 1)
    left_recv = comm.pack_exchange_prev(
        [_cols(x, m - _SW, None) for x in state], 1)

    def unpack(recv):
        r, og = recv[0], recv[1]
        accs = tuple(recv[2:2 + ndim])
        ds = tuple(recv[2 + ndim:2 + 2 * ndim]) if fista else None
        return r, og, accs, ds

    def own(lo, hi):
        r = _cols(recon0, lo, hi)
        og = _cols(orig, lo, hi)
        accs = tuple(_cols(a, lo, hi) for a in accs0)
        ds = tuple(_cols(d, lo, hi).astype(orig.dtype)
                   for d in ds0) if fista else None
        return r, og, accs, ds

    def cat(a, b):
        return jnp.concatenate([a, b], axis=1)

    # ---- RIGHT seam (own last columns {m-2, m-1}; skipped on last1) ----
    oR, oO, oA, oD = own(m - _SW, None)
    nR, nO, nA, nD = unpack(right_recv)
    r1R, b1R, r2R, b2R, d2R = _strip_two_iters(
        cat(oO, nO), cat(oR, nR),
        tuple(cat(a, b) for a, b in zip(oA, nA)),
        tuple(cat(a, b) for a, b in zip(oD, nD)) if fista else None,
        rho1, rho2, lambda_inv, lam_mu, comm0, zero_next1=False,
        d_store=d_store)
    # kernel-wrong variant: own 4 columns with the kernel's zero forward
    r1Rw, b1Rw, r2Rw, b2Rw, _ = _strip_two_iters(
        oO, oR, oA, oD, rho1, rho2, lambda_inv, lam_mu, comm0,
        zero_next1=True, d_store=d_store)

    # strip coords: own cols [m-4..m-1] are strip cols 0..3
    cW = slice(2, 4)       # own wrong cols {m-2, m-1}
    fix = jnp.logical_not(last1)

    def put(dst, src, col_lo, col_hi, cond):
        cur = _cols(dst, col_lo, col_hi)
        val = jnp.where(cond, src, cur)
        return lax.dynamic_update_slice_in_dim(dst, val, col_lo, axis=1)

    recon2 = put(recon2, r2R[:, cW], m - 2, m, fix)
    accs2 = tuple(put(a, b[:, cW], m - 2, m, fix)
                  for a, b in zip(accs2, b2R))
    if fista:
        # strips carry duals at f32 on the storage grid (round_bf16
        # cadence); narrowing to the bf16 state dtype here is exact
        ds2 = tuple(put(a, b[:, cW].astype(a.dtype), m - 2, m, fix)
                    for a, b in zip(ds2, d2R))

    zero = jnp.zeros((), jnp.float32)

    def corr(c):
        return jnp.where(fix, c.astype(jnp.float32), zero)

    # iteration-1 traces: r1 wrong at col m-1 only (dual-1 values at the
    # right edge are local and correct)
    r0_m1 = _cols(recon0, m - 1, m)
    dn1 = dn1 + corr(_sum_abs(r1R[:, 3:4] - r0_m1)
                     - _sum_abs(r1Rw[:, 3:4] - r0_m1))
    # iteration-2: duals wrong at col m-1 (all axes)
    for k in range(ndim):
        bn2 = bn2 + corr(_sum_abs(b2R[k][:, 3:4])
                         - _sum_abs(b2Rw[k][:, 3:4]))
    dn2 = dn2 + corr(
        _sum_abs(r2R[:, cW] - r1R[:, cW])
        - _sum_abs(r2Rw[:, cW] - r1Rw[:, cW]))
    dd2 = dd2 + corr(_sum_abs(r1R[:, 3:4]) - _sum_abs(r1Rw[:, 3:4]))
    if with_sse:
        # r1 wrong at col m-1; r2 wrong at cols {m-2, m-1}
        ref_m1 = _cols(ref, m - 1, m)
        ref_cW = _cols(ref, m - 2, m)
        sse1 = sse1 + corr(_sq(r1R[:, 3:4], ref_m1)
                           - _sq(r1Rw[:, 3:4], ref_m1))
        sse2 = sse2 + corr(_sq(r2R[:, cW], ref_cW)
                           - _sq(r2Rw[:, cW], ref_cW))

    # ---- LEFT seam (own first columns {0, 1}; skipped on first1) -------
    oR, oO, oA, oD = own(0, _SW)
    pR, pO, pA, pD = unpack(left_recv)
    r1L, b1L, r2L, b2L, d2L = _strip_two_iters(
        cat(pO, oO), cat(pR, oR),
        tuple(cat(a, b) for a, b in zip(pA, oA)),
        tuple(cat(a, b) for a, b in zip(pD, oD)) if fista else None,
        rho1, rho2, lambda_inv, lam_mu, comm0, zero_next1=False,
        d_store=d_store)
    r1Lw, b1Lw, r2Lw, b2Lw, _ = _strip_two_iters(
        oO, oR, oA, oD, rho1, rho2, lambda_inv, lam_mu, comm0,
        zero_next1=False, d_store=d_store)

    # strip coords: own cols {0, 1} are strip cols 4, 5 in the correct
    # strip, cols 0, 1 in the wrong strip
    cC = slice(4, 6)
    cWn = slice(0, 2)
    fixL = jnp.logical_not(first1)

    recon2 = put(recon2, r2L[:, cC], 0, 2, fixL)
    accs2 = tuple(put(a, b[:, cC], 0, 2, fixL)
                  for a, b in zip(accs2, b2L))
    if fista:
        ds2 = tuple(put(a, b[:, cC].astype(a.dtype), 0, 2, fixL)
                    for a, b in zip(ds2, d2L))

    def corrL(c):
        return jnp.where(fixL, c.astype(jnp.float32), zero)

    # iteration-1: the axis-1 dual and recon-1 are wrong at col 0
    bn1 = bn1 + corrL(_sum_abs(b1L[1][:, 4:5]) - _sum_abs(b1Lw[1][:, 0:1]))
    r0_0 = _cols(recon0, 0, 1)
    dn1 = dn1 + corrL(_sum_abs(r1L[:, 4:5] - r0_0)
                      - _sum_abs(r1Lw[:, 0:1] - r0_0))
    # iteration-2: duals wrong at col 0 (all axes) + col 1 (axis 1 only)
    for k in range(ndim):
        bn2 = bn2 + corrL(_sum_abs(b2L[k][:, 4:5])
                          - _sum_abs(b2Lw[k][:, 0:1]))
    bn2 = bn2 + corrL(_sum_abs(b2L[1][:, 5:6]) - _sum_abs(b2Lw[1][:, 1:2]))
    dn2 = dn2 + corrL(
        _sum_abs(r2L[:, cC] - r1L[:, cC])
        - _sum_abs(r2Lw[:, cWn] - r1Lw[:, cWn]))
    dd2 = dd2 + corrL(_sum_abs(r1L[:, 4:5]) - _sum_abs(r1Lw[:, 0:1]))
    if with_sse:
        # r1 wrong at col 0; r2 wrong at cols {0, 1}
        ref_0 = _cols(ref, 0, 1)
        ref_01 = _cols(ref, 0, 2)
        sse1 = sse1 + corrL(_sq(r1L[:, 4:5], ref_0)
                            - _sq(r1Lw[:, 0:1], ref_0))
        sse2 = sse2 + corrL(_sq(r2L[:, cC], ref_01)
                            - _sq(r2Lw[:, cWn], ref_01))

    return (recon2, accs2, ds2, (bn1, dn1, dd1, bn2, dn2, dd2),
            (sse1, sse2) if with_sse else None)
