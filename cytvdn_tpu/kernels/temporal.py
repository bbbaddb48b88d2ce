"""Temporally-blocked fused Pallas kernel: TWO full TV iterations per HBM
pass.

The single-iteration fused kernel (``kernels/fused.py``) already runs at
the streaming floor of ~(4n+3) cube traversals per iteration — on a
bandwidth-bound stencil the only remaining lever is *temporal blocking*:
keep a moving window of rows resident in VMEM and advance the iteration
count twice before the window is written back. Per-iteration HBM traffic
drops from 19 traversals (4D FISTA) to ~9.5 + O(1/B1) seam bands — a
~1.8-2x reduction, which is the ceiling XLA/HBM leaves on this workload.

Design (extends the fused kernel's software pipeline two stages deeper;
grid ``(G1, N0+3)``, axis-1 strips outer, single rows inner):

Step ``(j, ip)`` executes a 4-stage staircase over rows::

    S_A  dual-1   row ip      (reads R0/acc0/d0 blocks; VMEM-only output)
    S_B  recon-1  row ip-1    (VMEM-only output R1)
    S_C  dual-2   row ip-2    (writes b2/d2 to HBM)
    S_D  recon-2  row ip-3    (writes R2 to HBM)

Iteration-1 values (R1, b1, d1) live ONLY in VMEM row carries — they
never touch HBM. Cross-row (axis-0) stencils ride the carries exactly as
in the one-iteration kernel.

Axis-1 strip seams need iteration-1 values from neighbor strips:

- LEFT (strip j-1, processed earlier): R1's last column is stored into a
  persistent VMEM *column buffer* as strip j-1 runs and read back during
  strip j (double-buffered by strip parity) — zero HBM traffic.
- RIGHT (strip j+1, processed later): iteration-1 values at its first
  column are *recomputed* from pre-update state — the identical-arithmetic
  seam-recompute trick of the one-iteration kernel, one level deeper. The
  recompute consumes a pre-gathered band of ``::B1``-strided columns
  (R0 cols {0,1}, per-axis acc0/d0 col {0} (+{1} for axis 1), orig col
  {0}) — O(1/B1) of a traversal each, and every cube-size array still
  appears exactly once in the pallas_call so input→output HBM aliasing
  holds (2n+2 cube arrays + orig, same floor as the K=1 kernel).

Because every seam value is recomputed with the same arithmetic the
owning block performs, and reductions accumulate in the same (strip, row)
order as two passes of the K=1 kernel, results — recon, accumulators,
b_norm and delta traces — are **bit-identical** to running the fused
kernel twice.

Scope: float32, Jia-Zhao BCs, anisotropic, 4D and 3D (single-strip and
folded layouts), FISTA and unaccelerated, single-row blocks (B0=1 — true
for every bandwidth-relevant shape); single device, axis-0 meshes (2-row
neighbor bands) and axis-1 meshes (the right shard's columns ride the
band machinery as an extra slot, the left shard's last-column recon-1 is
recomputed per row). Q-splits and 2D grids (which would need corner
exchanges) run the K=1 kernel / ops path (``solver.engine`` gates).

Reference baseline for the math: one iteration = per-axis dual update +
reconstruction update (reference cyTVDN/cyTVDN.py:147-194, spec
SURVEY.md §8.1); this kernel computes exactly two of them.
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
    _tail_bytes,
)

Array = jax.Array


def round_bf16(v: Array) -> Array:
    """Round-to-nearest-even onto the bfloat16 grid, staying float32 —
    the per-iteration lossy-duals quantization (``qd1``), shared by the
    pair kernel and the 2D-grid seam repair (parallel/pairfix.py).

    Integer bit arithmetic, NOT ``astype(bf16).astype(f32)`` and NOT
    ``lax.reduce_precision``: the rounding is load-bearing, a convert
    down-up pair is exactly what excess-precision rules let a compiler
    fold to a no-op (XLA:TPU does, proven on-chip), and Mosaic has no
    ``reduce_precision`` lowering (NotImplementedError on compile). The
    add-0x7FFF-plus-lsb trick is RNE to the upper-16-bit grid for every
    finite value (denormals and carry-to-infinity included) — bit-equal
    to the hardware f32→bf16 convert + exact widen that the K=1 kernel's
    HBM writeback/reload performs — and integer ops cannot be folded as
    excess precision on any backend."""
    u = lax.bitcast_convert_type(v, jnp.uint32)
    r = (u + jnp.uint32(0x7FFF) + ((u >> 16) & jnp.uint32(1))) \
        & jnp.uint32(0xFFFF0000)
    return lax.bitcast_convert_type(r, jnp.float32)


# The pair kernel is per-step-floor bound, not DMA bound, at the K=1
# kernel's bandwidth-tuned block size (measured: b1=8 blocks run the pair
# at K=1 speed; b1=16 runs it 1.8x faster on the same shape). Its strips
# are therefore sized as LARGE as the VMEM budget allows: ~80 live block
# buffers with seams (pipelined I/O + two iterations of row carries +
# the R1 seam-column double buffer), ~50 without.
_VMEM_CAP = 116 * 1024 * 1024   # scoped ask; 128 MB physical on v5e
_PAIR_BUFFERS = 82
_PAIR_BUFFERS_NOSEAM = 52
# extra block buffers in axis-0 halo mode: the 2-row neighbor bands, the
# per-strip halo row operands and the four edge-recompute scratches, each
# pipelined — calibrated against the compiler's own VMEM accounting for
# the 512^2x256^2 per-shard geometry (an estimate of 26 under-counted:
# Mosaic measured ~159 block-equivalents total at b1=4 there)
_PAIR_BUFFERS_HALO0 = 80
_SMALL_RESERVE = 2 * 1024 * 1024
# test hook: cap block bytes to force small strips/seams (None = auto)
_PAIR_BLOCK_CAP = None


def pair_plan(shape: Tuple[int, ...], itemsize: int = 4,
              halo0: bool = False, with_mse: bool = False,
              block_cap: Optional[int] = None):
    """Block plan for the pair kernel: the fused kernel's *layout* (4D /
    3D-single / 3D-flat) with B0 forced to 1 (the row pipeline is four
    stages deep) and B1 grown to the VMEM budget — per-step floors, not
    bandwidth, bound this kernel, so bigger strips win until VMEM runs
    out.

    ``with_mse`` charges the pipelined reference-data block the
    per-iteration SSE reductions read at S_D.

    ``block_cap`` (bytes, optional) bounds the strip's block size below
    the budget model's pick — the VMEM-miscalibration fallback ladder
    (solver/engine.py::vmem_fallback) retries with shrinking caps when
    Mosaic's actual accounting exceeds the ~82-buffer model (measured:
    4D FISTA at (128,128,64,64) asks 164M of 128M at the model's b1=32
    while b1=16 fits — the per-shape gap the ladder absorbs).

    Returns ``(work_shape, inblock_axes, flat, b1)`` or None.
    """
    plan = _plan(tuple(shape), itemsize)
    if plan is None:
        return None
    work_shape, inblock_axes, flat, b0, _ = plan
    if work_shape[0] < 4:
        return None  # pipeline depth exceeds the row count
    real, pad = _tail_bytes(work_shape, itemsize)
    n0, n1 = work_shape[0], work_shape[1]

    def max_divisor(limit_bytes):
        best = 0
        for c in range(1, n1 + 1):
            if n1 % c == 0 and c * pad <= limit_bytes:
                best = c
        return best

    extra = (_PAIR_BUFFERS_HALO0 if halo0 else 0) + (2 if with_mse else 0)
    cap_noseam = ((_VMEM_CAP - _SMALL_RESERVE)
                  // (_PAIR_BUFFERS_NOSEAM + extra))
    cap_seam = ((_VMEM_CAP - _SMALL_RESERVE - 2 * n0 * pad)
                // (_PAIR_BUFFERS + extra))
    for cap in (_PAIR_BLOCK_CAP, block_cap):
        if cap is not None:
            cap_noseam = min(cap_noseam, cap)
            cap_seam = min(cap_seam, cap)
    if n1 * pad <= cap_noseam:
        return work_shape, inblock_axes, flat, n1  # single strip, no seams
    if cap_seam < pad:
        return None  # not even one-column strips fit (huge tails / N0)
    b1 = max_divisor(cap_seam)
    if b1 == 0:
        return None
    return work_shape, inblock_axes, flat, b1


def pair_hbm_viable(shape, itemsize: int = 4,
                    usable_hbm: float = 15.3e9,
                    halo1: bool = False,
                    with_mse: bool = False,
                    block_cap: Optional[int] = None) -> bool:
    """Whether the pair program's HBM footprint fits one device for this
    (local) shape: 2n+2 state arrays + orig + the pre-gathered seam/band
    columns (~15 column sets of cube/B1 bytes each — significant when
    VMEM forces small strips, e.g. pod-scale 256-square tails).
    ``halo1`` (axis-1-sharded shards): the band machinery is forced on
    even for single-strip shards, plus the packed left-column operand.
    ``with_mse`` adds the resident reference-data cube."""
    ndim = len(shape)
    plan = pair_plan(tuple(shape), itemsize, halo0=True,
                     with_mse=with_mse, block_cap=block_cap)
    if plan is None:
        return False
    work_shape, _, _, b1 = plan
    cube = int(np.prod(work_shape)) * itemsize
    seams = work_shape[1] // b1 > 1 or halo1
    n_band = (2 * ndim + 6) if seams else 0
    # orig + recon + accs + ds (+ reference data)
    state = (2 * ndim + 3 + (1 if with_mse else 0)) * cube
    bands = (n_band + 1) * cube // b1 if seams else 0
    if halo1:
        # left pack: (3+2n) column slabs of cube/n1 each
        bands += (3 + 2 * ndim) * cube // work_shape[1]
    return state + bands <= usable_hbm


def pair_supported(shape, dtype, bc, isotropic_R=False,
                   isotropic_Q=False, halo0: bool = False,
                   with_mse: bool = False,
                   block_cap: Optional[int] = None) -> bool:
    """Whether the temporally-blocked pair kernel covers this config
    (Jia-Zhao anisotropic float32; ``shape`` is the per-device local
    shape, ``halo0`` for axis-0-sharded runs, ``with_mse`` for runs
    recording per-iteration SSE vs reference data)."""
    from cytvdn_tpu.config import BCMode

    if dtype != jnp.float32:
        return False
    if len(shape) not in (3, 4):
        return False
    if bc != BCMode.JIA_ZHAO or isotropic_R or isotropic_Q:
        return False
    return pair_plan(tuple(shape), 4, halo0=halo0,
                     with_mse=with_mse, block_cap=block_cap) is not None


def _make_pair_kernel(n_ax: int, inblock_axes: Tuple[int, ...], flat: bool,
                      fista: bool, b1: int, has_seam: bool, n0: int,
                      g1: int, debug: bool = False,
                      with_halo0: bool = False,
                      with_halo1: bool = False,
                      with_mse: bool = False):
    """Kernel body; operand order must match :func:`fused_pair_iteration`.

    Stage guards (grid inner index ``ip`` in [0, n0+2]):
    S_A ip<=n0-1, S_B 1<=ip<=n0, S_C 2<=ip<=n0+1, S_D 3<=ip<=n0+2.
    Ring carries shift at the END of the step (reads happen first), so a
    carry read at step ``ip`` sees the value produced ``depth`` steps ago.

    ``with_halo0`` (sharded axis-0 meshes): pre-update 2-row bands from
    the +/-1 axis-0 neighbor shards replace the Jia-Zhao row edges at
    shard seams. Iteration-1 values the seams need (the -1 neighbor's
    last-row recon-1, the +1 neighbor's first-row dual/recon-1) are
    RECOMPUTED from the bands with the identical arithmetic the neighbor
    performs — exact seams, as in the K=1 scheme (SURVEY.md §8.3), one
    iteration deeper. Global edges are selected by the first0/last0 scal
    flags (band fills there are never read).
    """

    def kernel(*refs):
        it = iter(refs)
        scal = next(it)                        # SMEM (1, 2n+6)
        orig = next(it)                        # block @ (ip-1, j)
        r0 = next(it)                          # block @ (ip,   j)
        r0_last = next(it) if has_seam else None   # col @ (ip, j-1)
        acc0 = [next(it) for _ in range(n_ax)]     # blocks @ (ip, j)
        d0 = [next(it) for _ in range(n_ax)] if fista else None
        if has_seam:
            # pre-gathered band columns of strip j+1 @ row ip-1 (c1 is the
            # band's second global column — strip j+2's first when b1==1)
            # all band columns ride ONE packed operand (one DMA program
            # instead of 13 — the kernel's throughput is partly bound by
            # fixed per-operand pipeline cost). Pack layout along axis 2:
            # [r0_c0, r0_c1, acc0..acc{n-1} (c0), acc1_c1,
            #  d0..d{n-1} (c0), d1_c1 (fista), orig_c0]
            bandpk = next(it)                  # (1,1,C)+tail @ (ip-1, j+1)

            def _bp(i):
                v = bandpk[...]
                v = lax.slice_in_dim(v, i, i + 1, axis=2)
                return v.reshape((1, 1) + v.shape[3:])

            class _Slot:
                def __init__(self, i):
                    self.i = i

                def __getitem__(self, _):
                    return _bp(self.i)

            r0b_c0 = _Slot(0)
            r0b_c1 = _Slot(1)
            acc0b = [_Slot(2 + k) for k in range(n_ax)]
            acc0b1_c1 = _Slot(2 + n_ax)
            if fista:
                d0b = [_Slot(3 + n_ax + k) for k in range(n_ax)]
                d0b1_c1 = _Slot(3 + 2 * n_ax)
                origb = _Slot(4 + 2 * n_ax)
            else:
                d0b = None
                d0b1_c1 = None
                origb = _Slot(3 + n_ax)
        if with_halo0:
            # axis-0 shard-seam operands; row blocks are constant in ip
            # (fetched once per strip). p_* = -1 neighbor's last rows,
            # n_* = +1 neighbor's first rows (pre-update state).
            h_p_r0 = next(it)                  # (2, b1)+tail @ (0, j)
            h_p_orig = next(it)                # (1, b1)+tail @ (0, j)
            h_p_acc = [next(it) for _ in range(n_ax)]
            h_p_d = [next(it) for _ in range(n_ax)] if fista else None
            # seam columns of the -1 band row: backward col (strip j-1's
            # last) and forward col (strip j+1's first) of R0/acc1/d1
            h_p_r0_cb = next(it)               # (2, 1)+tail @ col j*b1-1
            h_p_r0_cf = next(it)               # (2, 1)+tail @ col (j+1)*b1
            h_p_acc1_cf = next(it)
            h_p_d1_cf = next(it) if fista else None
            h_n_r0 = next(it)                  # (2, b1)+tail @ (0, j)
            h_n_orig = next(it)                # (1, b1)+tail @ (0, j)
            h_n_acc = [next(it) for _ in range(n_ax)]   # next row 0
            h_n_d = [next(it) for _ in range(n_ax)] if fista else None
            h_n_acc0_r1 = next(it)             # acc0_0 @ next row 1
            h_n_d0_r1 = next(it) if fista else None
            h_n_r0_cb = next(it)               # (2, 1)+tail @ col j*b1-1
            h_n_r0_cf = next(it)               # (2, 1)+tail @ col (j+1)*b1
            h_n_acc1_cf = next(it)
            h_n_d1_cf = next(it) if fista else None
            h_n_acc0_cf = next(it)             # acc0_0 @ next row0, col f
            h_n_d0_cf = next(it) if fista else None
        if with_halo1:
            # LEFT axis-1 neighbor's packed last-column state, fetched at
            # two row offsets (S_A needs row ip; the left-band recon-1
            # staging needs row ip-1). Pack layout along axis 2:
            # [r0 col -2, r0 col -1, orig col -1, acc0..acc{n-1} col -1,
            #  d0..d{n-1} col -1 (fista)]
            h1L_i = next(it)                   # (1,1,L)+tail @ (ip, 0)
            h1L_im1 = next(it)                 # (1,1,L)+tail @ (ip-1, 0)

            def _lp(ref, i):
                v = ref[...]
                v = lax.slice_in_dim(v, i, i + 1, axis=2)
                return v.reshape((1, 1) + v.shape[3:])

        # per-iteration SSE vs reference data: ONE extra operand at row
        # ip-3 — at S_D the r1 ring carry (c_r1_1) already holds
        # iteration-1's row ip-3, so both iterations' SSE terms reduce
        # against the same reference block with no extra carries
        mse_ref = next(it) if with_mse else None   # block @ (ip-3, j)
        r2_out = next(it)                      # block @ (ip-3, j)
        if debug:
            r1_out = next(it)                  # block @ (ip-1, j)
            b1_outs = [next(it) for _ in range(n_ax)]  # blocks @ (ip, j)
        b2_out = [next(it) for _ in range(n_ax)]   # blocks @ (ip-2, j)
        d2_out = [next(it) for _ in range(n_ax)] if fista else None
        bnorm1_o = next(it)
        dnum1_o = next(it)
        dden1_o = next(it)
        bnorm2_o = next(it)
        dnum2_o = next(it)
        dden2_o = next(it)
        if with_mse:
            sse1_o = next(it)
            sse2_o = next(it)

        c_r0 = next(it)                        # R0 row ip-1
        c_og0 = next(it)                       # orig row ip-2
        c_og1 = next(it)                       # orig row ip-3
        c_b1a = [next(it) for _ in range(n_ax)]    # b1 rows ip-1
        c_b1b = [next(it) for _ in range(n_ax)]    # b1 rows ip-2
        if fista:
            c_d1a = [next(it) for _ in range(n_ax)]  # d1 rows ip-1
            c_d1b = [next(it) for _ in range(n_ax)]  # d1 rows ip-2
        c_r1_0 = next(it)                      # R1 row ip-2
        c_r1_1 = next(it)                      # R1 row ip-3
        c_b2 = [next(it) for _ in range(n_ax)]     # b2 rows ip-3
        if has_seam:
            s_colA = next(it)                  # R1 last col, even strips
            s_colB = next(it)                  # R1 last col, odd strips
            bb1_a = [next(it) for _ in range(n_ax)]  # band b1 rows ip-2
            bb1_b = [next(it) for _ in range(n_ax)]  # band b1 rows ip-3
            if fista:
                bd1_a = next(it)               # band d1_1 (c0) row ip-2
                bd1_b = next(it)               # band d1_1 (c0) row ip-3
            boga = next(it)                    # band orig row ip-2
            bogb = next(it)                    # band orig row ip-3
            br0_prev = next(it)                # band R0 (c0) row ip-2
        if with_halo0:
            s_r1pm1 = next(it)                 # -1 shard last-row recon-1
            s_b1n0 = next(it)                  # +1 shard row-0 dual-1 (ax0)
            s_d1n0 = next(it) if fista else None
            s_b2n0 = next(it)                  # +1 shard row-0 dual-2 (ax0)
        if with_halo1:
            lb1 = [next(it) for _ in range(n_ax)]  # left-band b1 @ ip-2
            lr0_prev = next(it)                # left r0 col -1 @ ip-2
            l_og = next(it)                    # left orig col -1 @ ip-2
        s_sums = next(it)                      # SMEM (6,) / (8,) with mse
        n_sums = 8 if with_mse else 6

        j = pl.program_id(0)
        ip = pl.program_id(1)

        @pl.when(jnp.logical_and(j == 0, ip == 0))
        def _():
            for q in range(n_sums):
                s_sums[q] = jnp.float32(0.0)

        lam_inv = [scal[0, k] for k in range(n_ax)]
        lam_mu = [scal[0, n_ax + k] for k in range(n_ax)]
        rho1 = scal[0, 2 * n_ax]
        rho2 = scal[0, 2 * n_ax + 1]
        # global-edge flags (1.0 when this shard owns the global edge of
        # the axis; always 1.0 single-device)
        first0 = scal[0, 2 * n_ax + 2]
        last0 = scal[0, 2 * n_ax + 3]
        first1 = scal[0, 2 * n_ax + 4]
        last1 = scal[0, 2 * n_ax + 5]

        in_A = ip <= n0 - 1
        in_B = jnp.logical_and(ip >= 1, ip <= n0)
        in_C = jnp.logical_and(ip >= 2, ip <= n0 + 1)
        in_D = ip >= 3  # upper bound is the grid end

        # lossy-duals (bf16 HBM duals): quantize iteration-1's plain
        # duals to the bf16 storage grid mid-pair, in VMEM — exactly the
        # rounding K=1 execution applies through its HBM writeback +
        # reload — so the pair kernel's state sequence is bit-identical
        # to K=1 under lossy mode too, and pairing/chunk/checkpoint
        # boundaries cannot change the result (the CLAUDE.md state
        # invariant holds for lossy runs as well). f32 runs: no-op.
        lossy = fista and d0[0].dtype == jnp.bfloat16

        def qd1(v):
            return round_bf16(v) if lossy else v

        def dual(diff, acc_v, d_v, k, rho):
            """(b_new, d_new) of one dual update (reference
            anisotropic.pyx:127-132; plain when not FISTA)."""
            c = jnp.clip(diff + acc_v, -lam_inv[k], lam_inv[k])
            if fista:
                return c + rho * (c - d_v), c
            return c, c

        # ---------------- S_A: dual-1 at row ip --------------------------
        a = r0[...]
        a_c0 = lax.slice_in_dim(a, 0, 1, axis=1)
        diffs1 = []
        row0 = a - c_r0[...]
        if with_halo0:
            # shard leading row: backward operand is the -1 shard's last
            # row (global edge shards keep the JZ zero, selected by flag)
            edge0_A = jnp.where(
                first0 > 0, jnp.zeros_like(a),
                a - lax.slice_in_dim(h_p_r0[...], 1, 2, axis=0))
        else:
            edge0_A = jnp.zeros_like(a)
        diffs1.append(jnp.where(ip > 0, row0, edge0_A))
        if has_seam:
            seam = a_c0 - r0_last[...]
            if with_halo1:
                # shard leading column: backward operand is the left
                # shard's last column (global edges keep the JZ zero)
                e1_A = jnp.where(first1 > 0, jnp.zeros_like(a_c0),
                                 a_c0 - _lp(h1L_i, 1))
            else:
                e1_A = jnp.zeros_like(a_c0)
            seam = jnp.where(j > 0, seam, e1_A)
        else:
            seam = jnp.zeros_like(a_c0)
        if b1 > 1:
            body = a - _shift_down_inblock(a, 1)
            diffs1.append(lax.concatenate(
                [seam, lax.slice_in_dim(body, 1, b1, axis=1)], dimension=1))
        else:
            diffs1.append(seam)
        for ax in inblock_axes:
            diffs1.append(a - _shift_down_inblock(a, ax))
        if flat:
            diffs1.append(a - _shift_down_flat(a))

        b1f, d1f = [], []
        bnorm1 = jnp.zeros((), jnp.float32)
        for k in range(n_ax):
            # d0 may be stored bf16 in HBM (opt-in lossy-duals mode):
            # compute stays f32 in VMEM; iteration-1 plain duals are
            # quantized to the bf16 grid before they enter the ring
            # carries (qd1) — matching K=1's writeback/reload exactly
            bk, dk = dual(diffs1[k], acc0[k][...],
                          d0[k][...].astype(diffs1[k].dtype)
                          if fista else None, k, rho1)
            b1f.append(bk)
            d1f.append(qd1(dk))
            bnorm1 = bnorm1 + jnp.sum(jnp.abs(bk))

        @pl.when(in_A)
        def _():
            s_sums[0] = s_sums[0] + bnorm1
            if debug:
                for k in range(n_ax):
                    b1_outs[k][...] = b1f[k]

        # ------------- band dual-1 at row ip-1, strip j+1 ----------------
        if has_seam:
            bc0 = r0b_c0[...]
            bc1 = r0b_c1[...]
            own_last = lax.slice_in_dim(c_r0[...], b1 - 1, b1, axis=1)
            bb1f, bd1f = [], None
            for k in range(n_ax):
                if k == 1:
                    dif = lax.concatenate(
                        [bc0 - own_last, bc1 - bc0], dimension=1)
                    av = lax.concatenate(
                        [acc0b[1][...], acc0b1_c1[...]], dimension=1)
                    dv = (lax.concatenate(
                        [d0b[1][...], d0b1_c1[...]], dimension=1)
                        if fista else None)
                else:
                    av = acc0b[k][...]
                    dv = d0b[k][...] if fista else None
                    if k == 0:
                        if with_halo0:
                            bedge = jnp.where(
                                first0 > 0, jnp.zeros_like(bc0),
                                bc0 - lax.slice_in_dim(
                                    h_p_r0_cf[...], 1, 2, axis=0))
                        else:
                            bedge = jnp.zeros_like(bc0)
                        dif = jnp.where(ip > 1, bc0 - br0_prev[...], bedge)
                    elif flat and k == n_ax - 1:
                        dif = bc0 - _shift_down_flat(bc0)
                    else:
                        dif = bc0 - _shift_down_inblock(
                            bc0, inblock_axes[k - 2])
                bk, dk = dual(dif, av, dv, k, rho1)
                bb1f.append(bk)
                if k == 1:
                    bd1f = qd1(lax.slice_in_dim(dk, 0, 1, axis=1))

        # ------------- axis-0 shard-seam recomputes ----------------------
        if with_halo0:
            def halo_row_duals(rm, r_back, accs_h, ds_h, back_col,
                               r_cf, acc1_cf, d1_cf):
                """All per-axis dual-1 values of one neighbor row ``rm``
                (1, b1, tail), plus the axis-1 forward-column value —
                identical arithmetic to the neighbor's own S_A."""
                outs = []
                for k in range(n_ax):
                    dvk = ds_h[k][...] if fista else None
                    if k == 0:
                        dif = rm - r_back
                    elif k == 1:
                        c0d = (lax.slice_in_dim(rm, 0, 1, axis=1)
                               - back_col)
                        c0d = jnp.where(j > 0, c0d,
                                        jnp.zeros_like(c0d))
                        if b1 > 1:
                            bod = rm - _shift_down_inblock(rm, 1)
                            dif = lax.concatenate(
                                [c0d,
                                 lax.slice_in_dim(bod, 1, b1, axis=1)],
                                dimension=1)
                        else:
                            dif = c0d
                    elif flat and k == n_ax - 1:
                        dif = rm - _shift_down_flat(rm)
                    else:
                        dif = rm - _shift_down_inblock(
                            rm, inblock_axes[k - 2])
                    outs.append(dual(dif, accs_h[k][...], dvk, k, rho1))
                # axis-1 forward column (strip j+1's first col of this
                # row); zero wrap (b1_1 global-col-0 invariant) at the
                # global last strip
                fc = dual(
                    r_cf - lax.slice_in_dim(rm, b1 - 1, b1, axis=1),
                    acc1_cf[...],
                    d1_cf[...] if fista else None, 1, rho1,
                )[0]
                fc = jnp.where(j < g1 - 1, fc, jnp.zeros_like(fc))
                return outs, fc

            def halo_row_recon(orig_row, duals, fwd0, fc):
                """recon-1 of a neighbor row from its dual-1 values."""
                div = lam_mu[0] * (duals[0][0] - fwd0)
                b1r = duals[1][0]
                if b1 > 1:
                    f1 = lax.concatenate(
                        [lax.slice_in_dim(b1r, 1, b1, axis=1), fc],
                        dimension=1)
                else:
                    f1 = fc
                div = div + lam_mu[1] * (b1r - f1)
                for i_ax, ax in enumerate(inblock_axes):
                    k = 2 + i_ax
                    div = div + lam_mu[k] * (
                        duals[k][0] - _shift_up_inblock(duals[k][0], ax))
                if flat:
                    k = n_ax - 1
                    div = div + lam_mu[k] * (
                        duals[k][0] - _shift_up_flat(duals[k][0]))
                return orig_row - div

            p_rm = lax.slice_in_dim(h_p_r0[...], 1, 2, axis=0)
            p_rb = lax.slice_in_dim(h_p_r0[...], 0, 1, axis=0)
            n_r0v = h_n_r0[...]
            n_rm = lax.slice_in_dim(n_r0v, 0, 1, axis=0)
            n_r1r = lax.slice_in_dim(n_r0v, 1, 2, axis=0)

            # the -1 shard's last-row recon-1, needed by S_C's row-0
            # backward at step ip==2 only
            @pl.when(jnp.logical_and(ip == 2, first0 < 1))
            def _():
                duals_p, fc_p = halo_row_duals(
                    p_rm, p_rb, h_p_acc, h_p_d,
                    lax.slice_in_dim(h_p_r0_cb[...], 1, 2, axis=0),
                    lax.slice_in_dim(h_p_r0_cf[...], 1, 2, axis=0),
                    h_p_acc1_cf, h_p_d1_cf,
                )
                # forward axis-0 of the -1 row is our own row 0's dual-1
                s_r1pm1[...] = halo_row_recon(
                    h_p_orig[...], duals_p, c_b1b[0][...], fc_p)

            # the +1 shard's first-row dual-1 (axis 0), needed by S_B's
            # last-row forward at ip==n0 and by S_D at ip==n0+2; `a` is
            # clamped to our own last row at both steps
            @pl.when(jnp.logical_and(ip == n0, last0 < 1))
            def _():
                bv, cv = dual(n_rm - a, h_n_acc[0][...],
                              h_n_d[0][...] if fista else None, 0, rho1)
                s_b1n0[...] = bv
                if fista:
                    # qd1: the owning shard quantizes this plain dual to
                    # the bf16 grid before its own dual-2 reads it (lossy
                    # mode) — the recompute must round identically for
                    # the mesh ≡ single-device invariant to hold
                    s_d1n0[...] = qd1(cv)

            # the +1 shard's first-row dual-2 (axis 0) — its recon-1 is
            # recomputed from the band, its axis-0 forward from the +1
            # shard's second row
            @pl.when(jnp.logical_and(ip == n0 + 2, last0 < 1))
            def _():
                duals_n, fc_n = halo_row_duals(
                    n_rm, a, h_n_acc, h_n_d,
                    lax.slice_in_dim(h_n_r0_cb[...], 0, 1, axis=0),
                    lax.slice_in_dim(h_n_r0_cf[...], 0, 1, axis=0),
                    h_n_acc1_cf, h_n_d1_cf,
                )
                fwd0_n, _ = dual(
                    n_r1r - n_rm, h_n_acc0_r1[...],
                    h_n_d0_r1[...] if fista else None, 0, rho1)
                r1_n0 = halo_row_recon(h_n_orig[...], duals_n, fwd0_n,
                                       fc_n)
                b2v, _ = dual(
                    r1_n0 - c_r1_1[...],
                    s_b1n0[...],
                    s_d1n0[...] if fista else None, 0, rho2)
                s_b2n0[...] = b2v

        # --------- axis-1 LEFT-shard seam staging (sharded axis 1) -------
        if with_halo1:
            # fresh left-band dual-1 values at row ip-1 from the left
            # shard's packed last-column pre-update state
            Lr0 = _lp(h1L_im1, 1)      # left r0 col -1
            Lr0m2 = _lp(h1L_im1, 0)    # left r0 col -2
            Log = _lp(h1L_im1, 2)
            lb1f = []
            for k in range(n_ax):
                avL = _lp(h1L_im1, 3 + k)
                dvL = _lp(h1L_im1, 3 + n_ax + k) if fista else None
                if k == 0:
                    difL = jnp.where(ip > 1, Lr0 - lr0_prev[...],
                                     jnp.zeros_like(Lr0))
                elif k == 1:
                    difL = Lr0 - Lr0m2
                elif flat and k == n_ax - 1:
                    difL = Lr0 - _shift_down_flat(Lr0)
                else:
                    difL = Lr0 - _shift_down_inblock(
                        Lr0, inblock_axes[k - 2])
                lb1f.append(dual(difL, avL, dvL, k, rho1)[0])
            # the left shard's last-column recon-1 at row ip-2 (the
            # dual-2 backward operand at our first column): ringed duals;
            # axis-0 forward is the fresh row above (JZ zero at the
            # global last row), axis-1 forward is OUR OWN global-col-0
            # dual-1 at the same row (c_b1b)
            divL = lam_mu[0] * (lb1[0][...] - jnp.where(
                ip <= n0, lb1f[0], jnp.zeros_like(lb1f[0])))
            f1L = lax.slice_in_dim(c_b1b[1][...], 0, 1, axis=1)
            divL = divL + lam_mu[1] * (lb1[1][...] - f1L)
            for i_ax, ax in enumerate(inblock_axes):
                k = 2 + i_ax
                divL = divL + lam_mu[k] * (
                    lb1[k][...] - _shift_up_inblock(lb1[k][...], ax))
            if flat:
                k = n_ax - 1
                divL = divL + lam_mu[k] * (
                    lb1[k][...] - _shift_up_flat(lb1[k][...]))
            r1L = l_og[...] - divL

        # ---------------- S_B: recon-1 at row ip-1 -----------------------
        og = orig[...]
        fwd1 = []
        # axis 0: next row's fresh dual; at the shard's last row the +1
        # shard's row-0 dual (recomputed), zero at the global last row
        if with_halo0:
            edge1_B = jnp.where(last0 > 0, jnp.zeros_like(b1f[0]),
                                s_b1n0[...])
        else:
            edge1_B = jnp.zeros_like(b1f[0])
        fwd1.append(jnp.where(in_A, b1f[0], edge1_B))
        # axis 1: in-block forward; last col from the band (strip j+1's
        # first column — the RIGHT shard's first column at the last strip
        # of an axis-1-sharded run), zero wrap at the global last column
        if has_seam:
            if with_halo1:
                onr = jnp.logical_or(j < g1 - 1, last1 < 1)
            else:
                onr = j < g1 - 1
            lastc = jnp.where(onr,
                              lax.slice_in_dim(bb1f[1], 0, 1, axis=1),
                              jnp.zeros_like(a_c0))
        else:
            lastc = jnp.zeros_like(a_c0)
        if b1 > 1:
            fwd1.append(lax.concatenate(
                [lax.slice_in_dim(c_b1a[1][...], 1, b1, axis=1), lastc],
                dimension=1))
        else:
            fwd1.append(lastc)
        for i_ax, ax in enumerate(inblock_axes):
            fwd1.append(_shift_up_inblock(c_b1a[2 + i_ax][...], ax))
        if flat:
            fwd1.append(_shift_up_flat(c_b1a[n_ax - 1][...]))

        div1 = jnp.zeros_like(og)
        for k in range(n_ax):
            div1 = div1 + lam_mu[k] * (c_b1a[k][...] - fwd1[k])
        r1f = og - div1

        @pl.when(in_B)
        def _():
            s_sums[1] = s_sums[1] + jnp.sum(jnp.abs(r1f - c_r0[...]))
            s_sums[2] = s_sums[2] + jnp.sum(jnp.abs(c_r0[...]))
            if debug:
                r1_out[...] = r1f
            if has_seam:
                row = jnp.maximum(ip - 1, 0)
                last = lax.slice_in_dim(r1f, b1 - 1, b1, axis=1)

                @pl.when(j % 2 == 0)
                def _():
                    s_colA[pl.ds(row, 1)] = last

                @pl.when(j % 2 == 1)
                def _():
                    s_colB[pl.ds(row, 1)] = last

        # ---------------- S_C: dual-2 at row ip-2 ------------------------
        r1v = c_r1_0[...]
        r1p = c_r1_1[...]
        r1_c0 = lax.slice_in_dim(r1v, 0, 1, axis=1)
        diffs2 = []
        if with_halo0:
            edge2_C = jnp.where(first0 > 0, jnp.zeros_like(r1v),
                                r1v - s_r1pm1[...])
        else:
            edge2_C = jnp.zeros_like(r1v)
        diffs2.append(jnp.where(ip > 2, r1v - r1p, edge2_C))
        if has_seam:
            row2 = jnp.maximum(ip - 2, 0)

            def read_other(sA, sB):
                # strip j reads strip j-1's buffer: the opposite parity
                vA = sA[pl.ds(row2, 1)]
                vB = sB[pl.ds(row2, 1)]
                return jnp.where(j % 2 == 1, vA, vB)

            left = read_other(s_colA, s_colB)
            if with_halo1:
                e2C = jnp.where(first1 > 0, jnp.zeros_like(r1_c0),
                                r1_c0 - r1L)
            else:
                e2C = jnp.zeros_like(r1_c0)
            seam2 = jnp.where(j > 0, r1_c0 - left, e2C)
        else:
            seam2 = jnp.zeros_like(r1_c0)
        if b1 > 1:
            body2 = r1v - _shift_down_inblock(r1v, 1)
            diffs2.append(lax.concatenate(
                [seam2, lax.slice_in_dim(body2, 1, b1, axis=1)],
                dimension=1))
        else:
            diffs2.append(seam2)
        for ax in inblock_axes:
            diffs2.append(r1v - _shift_down_inblock(r1v, ax))
        if flat:
            diffs2.append(r1v - _shift_down_flat(r1v))

        b2f, d2f = [], []
        bnorm2 = jnp.zeros((), jnp.float32)
        for k in range(n_ax):
            bk, dk = dual(diffs2[k], c_b1b[k][...],
                          c_d1b[k][...] if fista else None, k, rho2)
            b2f.append(bk)
            d2f.append(dk)
            bnorm2 = bnorm2 + jnp.sum(jnp.abs(bk))

            @pl.when(in_C)
            def _(k=k, bk=bk, dk=dk):
                b2_out[k][...] = bk
                if fista:
                    d2_out[k][...] = dk.astype(d2_out[k].dtype)

        @pl.when(in_C)
        def _():
            s_sums[3] = s_sums[3] + bnorm2

        # ---------------- S_D: recon-2 at row ip-3 -----------------------
        fwd2 = []
        if with_halo0:
            edge2_D = jnp.where(last0 > 0, jnp.zeros_like(b2f[0]),
                                s_b2n0[...])
        else:
            edge2_D = jnp.zeros_like(b2f[0])
        fwd2.append(jnp.where(in_C, b2f[0], edge2_D))
        if has_seam:
            # recompute strip j+1's first-column b2_1 at row ip-3 from the
            # banded iteration-1 values (identical arithmetic to what
            # strip j+1 will compute at its own S_C)
            own_r1_last = lax.slice_in_dim(r1p, b1 - 1, b1, axis=1)
            # R1 at (j+1, c0, ip-3): banded recon-1 recompute. Its axis-0
            # forward at the shard's last row is the +1 shard's row-0 dual
            # at the band column (r0b_c0 is clamped to our last row at the
            # drain steps, exactly the backward operand that dual needs).
            if with_halo0:
                bnext0 = dual(
                    lax.slice_in_dim(h_n_r0_cf[...], 0, 1, axis=0)
                    - r0b_c0[...],
                    h_n_acc0_cf[...],
                    h_n_d0_cf[...] if fista else None, 0, rho1,
                )[0]
                bedge0 = jnp.where(last0 > 0, jnp.zeros_like(bnext0),
                                   bnext0)
            else:
                bedge0 = jnp.zeros_like(bb1_a[0][...])
            bfwd0 = jnp.where(ip <= n0 + 1, bb1_a[0][...], bedge0)
            divb = lam_mu[0] * (bb1_b[0][...] - bfwd0)
            b1b_c0 = lax.slice_in_dim(bb1_b[1][...], 0, 1, axis=1)
            b1b_c1 = lax.slice_in_dim(bb1_b[1][...], 1, 2, axis=1)
            if b1 == 1:
                # the band's c1 is the next strip's first column; when
                # the band is the global last strip, c0's forward wrap is
                # the JZ zero (with an axis-1 right shard, the columns
                # continue into it instead)
                keep_c1 = j + 2 <= g1 - 1
                if with_halo1:
                    keep_c1 = jnp.logical_or(keep_c1, last1 < 1)
                b1b_c1 = jnp.where(keep_c1, b1b_c1,
                                   jnp.zeros_like(b1b_c1))
            divb = divb + lam_mu[1] * (b1b_c0 - b1b_c1)
            for i_ax, ax in enumerate(inblock_axes):
                k = 2 + i_ax
                bv = bb1_b[k][...]
                divb = divb + lam_mu[k] * (bv - _shift_up_inblock(bv, ax))
            if flat:
                bv = bb1_b[n_ax - 1][...]
                divb = divb + lam_mu[n_ax - 1] * (bv - _shift_up_flat(bv))
            r1b = bogb[...] - divb
            cb = jnp.clip((r1b - own_r1_last) + b1b_c0,
                          -lam_inv[1], lam_inv[1])
            if fista:
                b2_1b = cb + rho2 * (cb - bd1_b[...])
            else:
                b2_1b = cb
            if with_halo1:
                onr2 = jnp.logical_or(j < g1 - 1, last1 < 1)
            else:
                onr2 = j < g1 - 1
            lastc2 = jnp.where(onr2, b2_1b, jnp.zeros_like(b2_1b))
        else:
            lastc2 = jnp.zeros_like(r1_c0)
        if b1 > 1:
            fwd2.append(lax.concatenate(
                [lax.slice_in_dim(c_b2[1][...], 1, b1, axis=1), lastc2],
                dimension=1))
        else:
            fwd2.append(lastc2)
        for i_ax, ax in enumerate(inblock_axes):
            fwd2.append(_shift_up_inblock(c_b2[2 + i_ax][...], ax))
        if flat:
            fwd2.append(_shift_up_flat(c_b2[n_ax - 1][...]))

        div2 = jnp.zeros_like(r1p)
        for k in range(n_ax):
            div2 = div2 + lam_mu[k] * (c_b2[k][...] - fwd2[k])
        r2f = c_og1[...] - div2

        @pl.when(in_D)
        def _():
            r2_out[...] = r2f
            s_sums[4] = s_sums[4] + jnp.sum(jnp.abs(r2f - r1p))
            s_sums[5] = s_sums[5] + jnp.sum(jnp.abs(r1p))
            if with_mse:
                rv = mse_ref[...]
                e1 = r1p - rv
                e2 = r2f - rv
                s_sums[6] = s_sums[6] + jnp.sum(e1 * e1)
                s_sums[7] = s_sums[7] + jnp.sum(e2 * e2)

        # ---------------- end of step: shift the rings -------------------
        for k in range(n_ax):
            c_b2[k][...] = b2f[k]
            c_b1b[k][...] = c_b1a[k][...]
            c_b1a[k][...] = b1f[k]
            if fista:
                c_d1b[k][...] = c_d1a[k][...]
                c_d1a[k][...] = d1f[k]
        c_r1_1[...] = r1v
        c_r1_0[...] = r1f
        c_og1[...] = c_og0[...]
        c_og0[...] = og
        c_r0[...] = a
        if has_seam:
            for k in range(n_ax):
                bb1_b[k][...] = bb1_a[k][...]
                bb1_a[k][...] = bb1f[k]
            if fista:
                bd1_b[...] = bd1_a[...]
                bd1_a[...] = bd1f
            bogb[...] = boga[...]
            boga[...] = origb[...]
            br0_prev[...] = bc0
        if with_halo1:
            for k in range(n_ax):
                lb1[k][...] = lb1f[k]
            lr0_prev[...] = Lr0
            l_og[...] = Log

        # ---------------- final step: publish the reductions -------------
        @pl.when(jnp.logical_and(j == g1 - 1, ip == n0 + 2))
        def _():
            bnorm1_o[0, 0] = s_sums[0]
            dnum1_o[0, 0] = s_sums[1]
            dden1_o[0, 0] = s_sums[2]
            bnorm2_o[0, 0] = s_sums[3]
            dnum2_o[0, 0] = s_sums[4]
            dden2_o[0, 0] = s_sums[5]
            if with_mse:
                sse1_o[0, 0] = s_sums[6]
                sse2_o[0, 0] = s_sums[7]

    return kernel


@functools.partial(jax.jit, static_argnames=("fista", "interpret", "debug",
                                             "block_cap"))
def fused_pair_iteration(
    orig: Array,
    recon: Array,
    accs: Tuple[Array, ...],
    ds: Optional[Tuple[Array, ...]],
    rho1: Array,
    rho2: Array,
    lambda_inv: Array,
    lam_mu: Array,
    fista: bool = True,
    interpret: bool = False,
    debug: bool = False,
    halos0=None,
    first0=None,
    last0=None,
    halos1=None,
    first1=None,
    last1=None,
    ref: Optional[Array] = None,
    block_cap: Optional[int] = None,
):
    """TWO full TV iterations in one temporally-blocked Pallas pass.

    ``rho1``/``rho2`` are the FISTA momentum ratios of the first/second
    iteration of the pair (ignored unaccelerated). Returns
    ``(recon2, accs2, ds2, bnorm1, dnum1, dden1, bnorm2, dnum2, dden2)``
    — the per-iteration reductions of BOTH iterations, as deterministic
    float32 scalars, bit-matching two passes of the K=1 kernel.

    ``ref`` (per-iteration MSE runs, reference cyTVDN/cyTVDN.py:176-181):
    the reference datacube; appends ``(sse1, sse2)`` — the summed squared
    error of each iteration's reconstruction — to the return tuple. Both
    reduce at S_D against one extra pipelined operand (the r1 ring carry
    already holds iteration-1's row there), ~0.5 extra HBM traversals
    per iteration.

    ``halos0`` (axis-0-sharded runs, used inside ``shard_map``): dict of
    pre-update neighbor bands — ``p_r0`` (2 rows: the -1 shard's rows
    [-2,-1]), ``p_orig``/``p_acc{k}``/``p_d{k}`` (its row -1), ``n_r0``
    (the +1 shard's rows [0,1]), ``n_orig``/``n_acc{k}``/``n_d{k}`` (its
    row 0) and ``n_acc0_r1``/``n_d0_r1`` (axis-0 state at its row 1).
    ``first0``/``last0``: 1.0 on the shards owning the global row edges.
    """
    in_shape = orig.shape
    ndim = len(in_shape)
    with_halo0 = halos0 is not None
    with_halo1 = halos1 is not None
    with_mse = ref is not None
    assert not (with_halo0 and with_halo1), "one split axis at a time"
    plan = pair_plan(in_shape, orig.dtype.itemsize,
                     halo0=with_halo0 or with_halo1, with_mse=with_mse,
                     block_cap=block_cap)
    if plan is None:
        raise ValueError(f"pair kernel does not support shape {in_shape}")
    shape, inblock_axes, flat, b1 = plan

    def emb(x):
        return x.reshape(shape)

    orig_w, recon_w = emb(orig), emb(recon)
    accs_w = tuple(emb(x) for x in accs)
    ds_w = tuple(emb(x) for x in ds) if fista else None

    n0, n1 = shape[0], shape[1]
    g1 = n1 // b1
    # an axis-1-sharded shard needs the full seam machinery even when its
    # own columns fit one strip (the shard seams ARE column seams)
    has_seam = g1 > 1 or with_halo1
    tail = shape[2:]
    block = (1, b1) + tail
    one_tail = (1, 1) + tail
    zeros_tail = tuple(0 for _ in tail)

    n_scal = 2 * ndim + 6
    one_f = jnp.ones((), jnp.float32)
    scal = jnp.concatenate(
        [
            lambda_inv.astype(jnp.float32),
            lam_mu.astype(jnp.float32),
            jnp.asarray(rho1, jnp.float32).reshape(1),
            jnp.asarray(rho2, jnp.float32).reshape(1),
            jnp.asarray(one_f if first0 is None else first0,
                        jnp.float32).reshape(1),
            jnp.asarray(one_f if last0 is None else last0,
                        jnp.float32).reshape(1),
            jnp.asarray(one_f if first1 is None else first1,
                        jnp.float32).reshape(1),
            jnp.asarray(one_f if last1 is None else last1,
                        jnp.float32).reshape(1),
        ]
    ).reshape(1, n_scal)

    def at_i(j, ip):
        return (jnp.minimum(ip, n0 - 1), j) + zeros_tail

    def at_im1(j, ip):
        return (jnp.clip(ip - 1, 0, n0 - 1), j) + zeros_tail

    def at_im2(j, ip):
        return (jnp.clip(ip - 2, 0, n0 - 1), j) + zeros_tail

    def at_im3(j, ip):
        return (jnp.clip(ip - 3, 0, n0 - 1), j) + zeros_tail

    def lastcol_map(j, ip):
        return (jnp.minimum(ip, n0 - 1), jnp.maximum(j - 1, 0)) + zeros_tail

    def band_map(j, ip):
        return (jnp.clip(ip - 1, 0, n0 - 1),
                jnp.minimum(j + 1, g1 - 1)) + zeros_tail

    def blk(m):
        return pl.BlockSpec(block, m, memory_space=pltpu.VMEM)

    def col(m):
        return pl.BlockSpec(one_tail, m, memory_space=pltpu.VMEM)

    in_specs = [
        pl.BlockSpec((1, n_scal), lambda j, ip: (0, 0),
                     memory_space=pltpu.SMEM),
        blk(at_im1),    # orig
        blk(at_i),      # R0
    ]
    inputs = [scal, orig_w, recon_w]
    ndbg = (1 + ndim) if debug else 0  # debug outputs shift b2/d2 slots
    aliases = {2: 0}    # R0 -> R2

    if has_seam:
        # pre-gathered seam/band columns: reshape + unit slice (NOT a
        # strided slice — see kernels/fused.py on layout assignment), so
        # every cube array appears exactly once in the pallas_call and
        # HBM-aliases cleanly
        def col_gather(x, idx):
            g = x.reshape((n0, g1, b1) + tail)
            g = lax.slice_in_dim(g, idx, idx + 1, axis=2)
            return g.reshape((n0, g1) + tail)

        def col_gather_c1(x):
            # the band's second global column: in-strip col 1, or the
            # NEXT strip's col 0 when strips are single columns
            if b1 >= 2:
                return col_gather(x, 1)
            c0 = col_gather(x, 0)
            lastrep = lax.slice_in_dim(c0, g1 - 1, g1, axis=1)
            return lax.concatenate(
                [lax.slice_in_dim(c0, 1, g1, axis=1), lastrep], dimension=1)

        in_specs.append(col(lastcol_map))
        inputs.append(col_gather(recon_w, b1 - 1))     # r0_last

    acc_base = len(inputs)
    in_specs += [blk(at_i) for _ in range(ndim)]
    inputs += [*accs_w]
    for k in range(ndim):
        aliases[acc_base + k] = 1 + ndbg + k           # acc0_k -> b2_k
    if fista:
        d_base = len(inputs)
        in_specs += [blk(at_i) for _ in range(ndim)]
        inputs += [*ds_w]
        for k in range(ndim):
            aliases[d_base + k] = 1 + ndbg + ndim + k  # d0_k -> d2_k

    if has_seam:
        # pack every band column into ONE operand (order must match the
        # kernel's _Slot indices). On an axis-1-sharded run the RIGHT
        # shard's first columns ride along as an extra band slot — the
        # in-kernel band machinery then computes the shard-seam values
        # with zero new staging.
        def hslab(key):
            return halos1[key].reshape((n0, 1) + tail)

        def add_slot(own, key):
            if not with_halo1:
                return own
            return jnp.concatenate([own, hslab(key)], axis=1)

        def c1_of(x, key_c0):
            # the band's second global column per slot; for b1==1 that is
            # the NEXT strip's first column (the right SHARD's first for
            # the last own strip)
            if b1 >= 2:
                return col_gather(x, 1)
            c0 = col_gather(x, 0)
            fill = (hslab(key_c0) if with_halo1
                    else lax.slice_in_dim(c0, g1 - 1, g1, axis=1))
            return lax.concatenate(
                [lax.slice_in_dim(c0, 1, g1, axis=1), fill], dimension=1)

        band_cols = [
            add_slot(col_gather(recon_w, 0), "n_r0_c0"),
            add_slot(c1_of(recon_w, "n_r0_c0"), "n_r0_c1"),
        ]
        band_cols += [add_slot(col_gather(accs_w[k], 0), f"n_acc{k}_c0")
                      for k in range(ndim)]
        band_cols += [add_slot(c1_of(accs_w[1], "n_acc1_c0"), "n_acc1_c1")]
        if fista:
            # the packed band operand is uniform f32; under lossy-duals
            # the d columns widen bf16→f32 here (exact)
            def _f32(x):
                return x.astype(orig.dtype)

            band_cols += [add_slot(_f32(col_gather(ds_w[k], 0)),
                                   f"n_d{k}_c0")
                          for k in range(ndim)]
            band_cols += [add_slot(_f32(c1_of(ds_w[1], "n_d1_c0")),
                                   "n_d1_c1")]
        band_cols += [add_slot(col_gather(orig_w, 0), "n_orig_c0")]
        n_band = len(band_cols)
        bandpk = jnp.stack(band_cols, axis=2)   # (n0, g1[+1], C)+tail
        g1b = g1 + (1 if with_halo1 else 0)

        def bandpk_map(j, ip):
            return (jnp.clip(ip - 1, 0, n0 - 1),
                    jnp.minimum(j + 1, g1b - 1), 0) + zeros_tail

        in_specs.append(pl.BlockSpec((1, 1, n_band) + tail, bandpk_map,
                                     memory_space=pltpu.VMEM))
        inputs.append(bandpk)

    if with_halo0:
        # axis-0 neighbor bands: full-width (1|2, N1)+tail arrays read as
        # per-strip row blocks plus a few direct column blocks (halo
        # arrays are not aliased, so double-reads are safe). Row blocks
        # are constant in ip — fetched once per strip.
        def hemb(x, rows):
            return x.reshape((rows, n1) + tail)

        def hrow(rows):
            return pl.BlockSpec((rows, b1) + tail,
                                lambda j, ip: (0, j) + zeros_tail,
                                memory_space=pltpu.VMEM)

        def hcol(rows, which):
            if which == "back":
                def m(j, ip):
                    return (0, jnp.maximum(j * b1 - 1, 0)) + zeros_tail
            else:
                def m(j, ip):
                    return (0, jnp.minimum((j + 1) * b1, n1 - 1)) \
                        + zeros_tail
            return pl.BlockSpec((rows, 1) + tail, m,
                                memory_space=pltpu.VMEM)

        p_r0 = hemb(halos0["p_r0"], 2)
        n_r0 = hemb(halos0["n_r0"], 2)
        in_specs += [hrow(2), hrow(1)]
        inputs += [p_r0, hemb(halos0["p_orig"], 1)]
        in_specs += [hrow(1)] * ndim
        inputs += [hemb(halos0[f"p_acc{k}"], 1) for k in range(ndim)]
        if fista:
            in_specs += [hrow(1)] * ndim
            inputs += [hemb(halos0[f"p_d{k}"], 1) for k in range(ndim)]
        in_specs += [hcol(2, "back"), hcol(2, "fwd"), hcol(1, "fwd")]
        inputs += [p_r0, p_r0, hemb(halos0["p_acc1"], 1)]
        if fista:
            in_specs += [hcol(1, "fwd")]
            inputs += [hemb(halos0["p_d1"], 1)]
        in_specs += [hrow(2), hrow(1)]
        inputs += [n_r0, hemb(halos0["n_orig"], 1)]
        in_specs += [hrow(1)] * ndim
        inputs += [hemb(halos0[f"n_acc{k}"], 1) for k in range(ndim)]
        if fista:
            in_specs += [hrow(1)] * ndim
            inputs += [hemb(halos0[f"n_d{k}"], 1) for k in range(ndim)]
        in_specs += [hrow(1)]
        inputs += [hemb(halos0["n_acc0_r1"], 1)]
        if fista:
            in_specs += [hrow(1)]
            inputs += [hemb(halos0["n_d0_r1"], 1)]
        in_specs += [hcol(2, "back"), hcol(2, "fwd"), hcol(1, "fwd")]
        inputs += [n_r0, n_r0, hemb(halos0["n_acc1"], 1)]
        if fista:
            in_specs += [hcol(1, "fwd")]
            inputs += [hemb(halos0["n_d1"], 1)]
        in_specs += [hcol(1, "fwd")]
        inputs += [hemb(halos0["n_acc0"], 1)]
        if fista:
            in_specs += [hcol(1, "fwd")]
            inputs += [hemb(halos0["n_d0"], 1)]

    if with_halo1:
        # LEFT shard's packed last-column state, read at rows ip and ip-1
        lcols = [hslab("p_r0_m2"), hslab("p_r0_m1"), hslab("p_orig_m1")]
        lcols += [hslab(f"p_acc{k}_m1") for k in range(ndim)]
        if fista:
            lcols += [hslab(f"p_d{k}_m1") for k in range(ndim)]
        n_l = len(lcols)
        lpk = jnp.stack(lcols, axis=2)          # (n0, 1, L)+tail

        def lspec(row_off):
            def m(j, ip):
                return (jnp.clip(ip - row_off, 0, n0 - 1), 0, 0) \
                    + zeros_tail
            return pl.BlockSpec((1, 1, n_l) + tail, m,
                                memory_space=pltpu.VMEM)

        in_specs += [lspec(0), lspec(1)]
        inputs += [lpk, lpk]

    if with_mse:
        in_specs.append(blk(at_im3))
        inputs.append(emb(ref))

    scal_out = pl.BlockSpec(
        (1, 1), lambda j, ip: (0, 0), memory_space=pltpu.SMEM
    )
    dt = orig.dtype
    out_specs = [blk(at_im3)]                          # R2
    out_shape = [jax.ShapeDtypeStruct(shape, dt)]
    n_dbg = 0
    if debug:
        # expose the VMEM-only iteration-1 values (tests only)
        out_specs += [blk(at_im1)] + [blk(at_i) for _ in range(ndim)]
        out_shape += [jax.ShapeDtypeStruct(shape, dt)] * (1 + ndim)
        n_dbg = 1 + ndim
    out_specs += [blk(at_im2) for _ in range(ndim)]    # b2
    out_shape += [jax.ShapeDtypeStruct(shape, dt)] * ndim
    if fista:
        out_specs += [blk(at_im2) for _ in range(ndim)]  # d2
        # d2 keeps ds's storage dtype (bf16 under lossy-duals) so the
        # HBM alias d0_k → d2_k holds and the traffic saving is real
        out_shape += [jax.ShapeDtypeStruct(shape, ds_w[0].dtype)] * ndim
    n_scal_out = 8 if with_mse else 6
    out_specs += [scal_out] * n_scal_out
    out_shape += [jax.ShapeDtypeStruct((1, 1), jnp.float32)] * n_scal_out

    scratch = [pltpu.VMEM(block, dt) for _ in range(3)]   # c_r0, c_og0/1
    scratch += [pltpu.VMEM(block, dt) for _ in range(2 * ndim)]  # c_b1a/b
    if fista:
        scratch += [pltpu.VMEM(block, dt) for _ in range(2 * ndim)]
    scratch += [pltpu.VMEM(block, dt) for _ in range(2)]  # c_r1_0/1
    scratch += [pltpu.VMEM(block, dt) for _ in range(ndim)]  # c_b2
    if has_seam:
        scratch += [pltpu.VMEM((n0, 1) + tail, dt)] * 2   # s_colA/B
        band_blk = [(1, 2) + tail if k == 1 else one_tail
                    for k in range(ndim)]
        scratch += [pltpu.VMEM(band_blk[k], dt) for k in range(ndim)]
        scratch += [pltpu.VMEM(band_blk[k], dt) for k in range(ndim)]
        if fista:
            scratch += [pltpu.VMEM(one_tail, dt)] * 2     # bd1_a/b
        scratch += [pltpu.VMEM(one_tail, dt)] * 3  # boga, bogb, br0_prev
    if with_halo0:
        scratch += [pltpu.VMEM(block, dt)]                # s_r1pm1
        scratch += [pltpu.VMEM(block, dt)]                # s_b1n0
        if fista:
            scratch += [pltpu.VMEM(block, dt)]            # s_d1n0
        scratch += [pltpu.VMEM(block, dt)]                # s_b2n0
    if with_halo1:
        scratch += [pltpu.VMEM(one_tail, dt)
                    for _ in range(ndim)]                 # lb1 rings
        scratch += [pltpu.VMEM(one_tail, dt)] * 2  # lr0_prev, l_og
    scratch += [pltpu.SMEM((8 if with_mse else 6,), jnp.float32)]

    outs = pl.pallas_call(
        _make_pair_kernel(ndim, inblock_axes, flat, fista, b1, has_seam,
                          n0, g1, debug=debug, with_halo0=with_halo0,
                          with_halo1=with_halo1, with_mse=with_mse),
        grid=(g1, n0 + 3),
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

    recon2 = unemb(outs[0])
    dbg = None
    if debug:
        dbg = tuple(unemb(o) for o in outs[1:1 + ndim + 1])  # (r1, b1_k...)
    base = 1 + n_dbg
    accs2 = tuple(unemb(o) for o in outs[base:base + ndim])
    if fista:
        ds2 = tuple(unemb(o) for o in outs[base + ndim:base + 2 * ndim])
        scals = outs[base + 2 * ndim:]
    else:
        ds2 = None
        scals = outs[base + ndim:]
    svals = [s[0, 0] for s in scals]
    bnorm1, dnum1, dden1, bnorm2, dnum2, dden2 = svals[:6]
    out = (recon2, accs2, ds2, bnorm1, dnum1, dden1, bnorm2, dnum2, dden2)
    if with_mse:
        out = out + (svals[6], svals[7])
    return out + ((dbg,) if debug else ())
