"""Fused Pallas TPU kernel: one full TV iteration in a single pass.

The reference needs ~22 cube-size array traversals per 4D FISTA iteration
(4×(read recon, rw acc, rw d) + (read orig, read 4 accs, rw recon) —
SURVEY.md §3.1); a two-pass XLA fusion needs ~24. This kernel performs the
whole iteration — all per-axis dual updates *and* the reconstruction
update, plus the bnorm/delta reductions — in ONE sweep at the memory-traffic
floor of ~(4n+3) traversals (19 for 4D FISTA, 11 unaccelerated):

    reads:  orig, recon, n accs [, n shadow duals]   (+O(1/B1) halo columns)
    writes: recon, n accs [, n shadow duals]

Design (TPU-first, exploits the sequential Pallas grid):

- Grid ``(G1, G0+1)``: axis 1 in ``B1``-column blocks (outer), axis 0 in
  single-row blocks (inner, fastest). Trailing axes (2..n-1) live whole
  inside each block — their stencil shifts are in-register.
- **Software pipeline with VMEM carries**: grid step ``(j, ip)`` computes
  the dual updates for row-block ``ip`` and the reconstruction update for
  row-block ``ip-1``. The previous row's recon (the backward-difference
  operand AND the delta baseline) and its freshly-updated accumulators (the
  forward-difference operands) are carried in VMEM scratch — never
  re-fetched from HBM. One trailing grid step (``ip = G0``) drains the
  pipeline. The axis-0 stencil therefore costs zero extra HBM traffic.
- Axis-1 seams cost three ``(1,1,tail)`` column operands per step (the
  neighbor column of recon/acc1/d1), recomputing the neighbor column's
  updated accumulator instead of waiting for it — O(1/B1) traffic, and the
  recomputation performs *identical arithmetic* to what the neighbor block
  computes, so the result is exact, not approximate.
- Jia-Zhao boundaries are applied by position masks (edge difference zero;
  trailing forward wrap reads the identically-zero leading slab, so the
  wrap contributes exactly 0 — the invariant of SURVEY.md §8.1).
- bnorm / delta reductions are emitted as per-block float32 partials and
  tree-summed outside: deterministic, unlike the reference's OpenMP
  reduction order (reference anisotropic.pyx:53).
- In-place: EVERY state array — recon, accumulators and shadow duals — is
  HBM-aliased input→output, reaching the 2n+2 cube-array floor (10 for 4D
  FISTA; the same count the reference's in-place NumPy arrays hold,
  SURVEY.md §2.7). The seam operands that would forbid aliasing (they
  re-read a column another block's output write may already have
  overwritten, and a doubly-read aliased input makes XLA insert a
  defensive full-cube copy) instead read **pre-gathered seam-column
  arrays**: before the kernel launches, the ``::B1``-strided columns of
  recon/acc1/d1 are copied into small ``(N0, G1, tail)`` side arrays
  (O(1/B1) of a traversal each), so each cube-size array appears exactly
  once in the pallas_call and aliases cleanly.

Scope (round 2): float32, all three BC modes (periodic / corrected mirror
/ Jia-Zhao), anisotropic and half-isotropic pairs, single device and
shard_map meshes with operand halos on ANY axis (scan and Q); sharded
periodic rides ring halos, sharded mirror rides edge-flagged halos (the
global trailing shard takes its own updated slab, interior shards the
neighbor recompute). The XLA ops backend (``cytvdn_tpu/ops``) remains
the executable spec and covers float64 plus the two sharded interplays
the kernel gates off (split iso-pair axes, folded-3D energy splits) —
see ``solver.engine._resolve_fused``.

float64 is gated off by measurement, not by omission: Mosaic cannot
lower f64 on this hardware at all — a trivial f64 pallas kernel fails
TPU compilation (verified round 3 on the v5e; the VPU has no f64 lanes).
The reference's ``ctypedef fused _float`` f64 variants
(anisotropic.pyx:7-9) therefore map to the XLA ops path, where XLA:TPU
applies its own f64 handling, and to the native C++ backend on CPU.
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

Array = jax.Array

# VMEM working-set target per block-sized buffer (bytes, after Mosaic
# (8,128)-tile padding). For FISTA there are ~(4n+3) pipelined in/out blocks
# (double-buffered) + (n+1) scratch carries ≈ 43 block buffers at n=4.
# Measured on v5e: the grid has a ~10 µs/step floor, so blocks should carry
# ≥ ~500 KB of real data per step to stay bandwidth-bound; Mosaic's scoped
# VMEM can be raised well past its 16 MB default (128 MB physical on v5e),
# so the padded working set is capped against _VMEM_CAP instead.
_BLOCK_BYTES_TARGET = 640 * 1024          # real bytes per block
_VMEM_CAP = 100 * 1024 * 1024             # scoped-VMEM ask
_BUFFER_COUNT = 45                         # conservative live-buffer count
_PAD_CAP = _VMEM_CAP // _BUFFER_COUNT      # padded bytes per block


def _tail_bytes(shape: Tuple[int, ...], itemsize: int) -> Tuple[int, int]:
    """(real, Mosaic-padded) bytes of the (1, 1, *tail) slab: the lane axis
    pads to 128, the sublane axis to 8."""
    tail = list(shape[2:])
    real = int(np.prod(tail)) * itemsize
    tail[-1] = -(-tail[-1] // 128) * 128
    if len(tail) >= 2:
        tail[-2] = -(-tail[-2] // 8) * 8
    return real, int(np.prod(tail)) * itemsize


def _pick_blocks(shape: Tuple[int, ...],
                 itemsize: int) -> Optional[Tuple[int, int]]:
    """(B0, B1) block extents: maximize B1 (shrinks axis-1 seam traffic),
    then B0 (amortizes the per-step floor for small tails), subject to the
    real-bytes target and the padded VMEM cap."""
    real, pad = _tail_bytes(shape, itemsize)
    if pad > _PAD_CAP:
        return None
    n0, n1 = shape[0], shape[1]
    # fat tails: allow blocks past the bandwidth target up to b1=4 (VMEM
    # permitting) — the seam-column gathers are sized cube/B1, so b1=2
    # would cost two extra cube-halves of HBM (measured on the 512² per-
    # shard geometry: 14.3 vs 12.3 shard-cubes)
    b1_target = max(_BLOCK_BYTES_TARGET, min(4 * real, _PAD_CAP))
    b1 = 1
    for c in range(1, n1 + 1):
        if n1 % c == 0 and c * real <= b1_target \
                and c * pad <= _PAD_CAP:
            b1 = c
    b0 = 1
    for c in range(1, n0 + 1):
        if n0 % c == 0 and c * b1 * real <= _BLOCK_BYTES_TARGET \
                and c * b1 * pad <= _PAD_CAP:
            b0 = c
    return b0, b1


def choose_perm(shape: Tuple[int, ...], itemsize: int = 4) -> Tuple[int, ...]:
    """Pick the axis permutation under which the kernel should run.

    TPU arrays tile the two minor dims to (8, 128): a trailing extent of
    e.g. 72 pads the lane dim to 128 — 1.78× wasted HBM *and* bandwidth on
    every cube-size array. The TV update is fully symmetric under axis
    permutation (per-axis stencils with per-axis parameters), so the solver
    transposes the whole problem ONCE per run (not per iteration) to the
    densest orientation: e.g. (256, 256, 72, 72) → (72, 256, 72, 256),
    whose (72, 256) tail tiles exactly.

    Scoring: minimize Mosaic padding waste of the (1, 1, *tail) slab, then
    minimize axis-1 seam-column overhead (1/B1), then minimize the PAIR
    kernel's seam overhead (1/B1 under its own planner — orientations with
    a smaller leading axis shrink the 2·N0·tail seam-column double buffer
    the pair kernel holds in VMEM, freeing budget for wider strips:
    measured +2.6% bit-identical on the 4D flagship, SWEEP_PAIR4D.json
    orientation_ab — (72,256,72,256) b1=16 at 13.70 G vs the
    (256,72,72,256) b1=12 wall at 13.36 G), then prefer identity.
    Only permutations the block planner accepts are considered; identity is
    returned when nothing plannable beats it (the caller falls back to the
    XLA ops path if even identity has no plan).
    """
    import itertools

    from cytvdn_tpu.kernels import temporal  # deferred: temporal imports us

    ndim = len(shape)
    ident = tuple(range(ndim))
    best = None
    for perm in itertools.permutations(range(ndim)):
        ws = tuple(shape[p] for p in perm)
        if ws[0] < 2:
            # fused_supported rejects work shapes with a degenerate
            # pipeline axis — choosing one would silently disable the
            # kernel while still paying the transposes
            continue
        plan = _plan(ws, itemsize)
        if plan is None:
            continue
        work_shape, _, _, b0, b1 = plan
        real, pad = _tail_bytes(work_shape, itemsize)
        waste = pad / real
        seam = 0.0 if work_shape[1] == b1 else 1.0 / b1
        pplan = temporal.pair_plan(ws, itemsize)
        if pplan is None:
            pseam = 1.0
        else:
            pb1 = pplan[3]
            pseam = 0.0 if pplan[0][1] == pb1 else 1.0 / pb1
        key = (round(waste, 3), round(seam, 4), round(pseam, 4),
               perm != ident, perm)
        if best is None or key < best[0]:
            best = (key, perm)
    return best[1] if best else ident


def fused_supported(shape, dtype, bc, isotropic_R=False, isotropic_Q=False):
    """Whether the fused kernel covers this configuration (shape/dtype/BC
    feasibility; the engine separately gates the sharded interplays, see
    ``solver.engine._resolve_fused``)."""
    from cytvdn_tpu.config import BCMode

    if dtype != jnp.float32:
        return False
    if len(shape) not in (3, 4):
        return False
    if shape[0] < 2:
        return False
    plan = _plan(tuple(shape), 4)
    if plan is None:
        return False
    flat = plan[2]
    if bc != BCMode.JIA_ZHAO:
        # periodic/mirror edges on a folded energy axis would need
        # cross-fold patches; the 3D "single" layout and all 4D layouts
        # support every BC mode
        if flat:
            return False
        if bc == BCMode.MIRROR and min(shape) < 2:
            return False
    if isotropic_R or isotropic_Q:
        # half-isotropic pairs: 4D, Jia-Zhao only (as in the reference,
        # halfisotropic.pyx:70-82; README.md:15-16)
        if len(shape) != 4 or bc != BCMode.JIA_ZHAO:
            return False
    return True


def _shift_down_inblock(x: Array, ax: int) -> Array:
    """s_i = x_{i-1} along in-block axis ``ax``; s_0 = x_0 (JZ: diff 0)."""
    n = x.shape[ax]
    first = lax.slice_in_dim(x, 0, 1, axis=ax)
    body = lax.slice_in_dim(x, 0, n - 1, axis=ax)
    return lax.concatenate([first, body], dimension=ax)


def _shift_up_inblock(x: Array, ax: int) -> Array:
    """s_i = x_{i+1} along in-block axis ``ax``; s_{N-1} = x_0 (wrap — under
    JZ the leading slab is identically zero, reference utils.pyx:98-101)."""
    n = x.shape[ax]
    body = lax.slice_in_dim(x, 1, n, axis=ax)
    first = lax.slice_in_dim(x, 0, 1, axis=ax)
    return lax.concatenate([body, first], dimension=ax)


def _shift_down_flat(x: Array) -> Array:
    """Backward shift along the *flattened* pair of trailing axes (2,3) —
    used when a 3D cube's energy axis is folded to (E1, E2) for efficient
    (sublane, lane) tiling. JZ at the global first element: the shifted
    value equals x there, so the difference vanishes."""
    e2 = x.shape[3]
    lastcol = lax.slice_in_dim(x, e2 - 1, e2, axis=3)    # x[.., e1, E2-1]
    patch = _shift_down_inblock(lastcol, 2)              # x[.., e1-1, E2-1]
    e1_ids = lax.broadcasted_iota(jnp.int32, patch.shape, dimension=2)
    firstelem = lax.slice_in_dim(
        lax.slice_in_dim(x, 0, 1, axis=2), 0, 1, axis=3
    )
    patch = jnp.where(e1_ids == 0, firstelem, patch)     # JZ: self at (0,0)
    body = lax.slice_in_dim(x, 0, e2 - 1, axis=3)
    return lax.concatenate([patch, body], dimension=3)


def _shift_up_flat(x: Array) -> Array:
    """Forward shift along the flattened trailing pair; the global last
    element wraps to the global first (the JZ zero slab)."""
    e2 = x.shape[3]
    firstcol = lax.slice_in_dim(x, 0, 1, axis=3)         # x[.., e1, 0]
    patch = _shift_up_inblock(firstcol, 2)               # x[.., e1+1, 0]
    body = lax.slice_in_dim(x, 1, e2, axis=3)
    return lax.concatenate([body, patch], dimension=3)


def _plan(shape: Tuple[int, ...], itemsize: int):
    """Choose the block layout for a cube shape.

    Returns ``(work_shape, inblock_axes, flat, b0, b1)`` or None:

    - 4D: work on the cube directly; in-block stencil axes (2, 3).
    - 3D "single": if one (1, N1, E) slab fits the block budget, keep the
      rank-3 layout with axis 1 whole in-block (no seam operands at all).
    - 3D "flat": fold E → (E1, 128) so the (sublane, lane) tiling is dense,
      and compute the energy-axis stencil across the fold (exact).
    """
    ndim = len(shape)
    if ndim == 4:
        picked = _pick_blocks(shape, itemsize)
        if picked is None:
            return None
        return shape, (2, 3), False, picked[0], picked[1]
    n0, n1, e = shape
    single_real = n1 * e * itemsize
    single_pad = (-(-n1 // 8) * 8) * (-(-e // 128) * 128) * itemsize
    if single_real <= _BLOCK_BYTES_TARGET and single_pad <= _PAD_CAP:
        # grow b0 over whole (N1, E) strips
        b0 = 1
        for c in range(1, n0 + 1):
            if n0 % c == 0 and c * single_real <= _BLOCK_BYTES_TARGET \
                    and c * single_pad <= _PAD_CAP:
                b0 = c
        return shape, (2,), False, b0, n1
    if e % 128 == 0:
        work = (n0, n1, e // 128, 128)
        picked = _pick_blocks(work, itemsize)
        if picked is not None:
            return work, (), True, picked[0], picked[1]
    return None


def _make_kernel(n_ax: int, inblock_axes: Tuple[int, ...], flat: bool,
                 fista: bool, b0: int, b1: int, has_seam: bool,
                 with_halo: bool, bc: int = 2,
                 iso_pairs: Tuple[Tuple[int, int], ...] = (),
                 halo_inblock: Tuple[int, ...] = (),
                 halo_flat: bool = False,
                 iso_next: Tuple[int, ...] = (),
                 iso_corner: Tuple[int, ...] = (),
                 prev0_seam: bool = False):
    """Build the kernel body; operand order matches :func:`fused_iteration`.

    Accumulator axes, in order: array axis 0 (pipelined via VMEM carries),
    array axis 1 (gridded in B1-wide blocks, seams via column operands when
    ``has_seam``), then ``inblock_axes`` and/or the flattened trailing pair
    (``flat``, for a 3D energy axis folded to (E1, E2)).

    ``with_halo`` adds shard-seam operands (used inside ``shard_map``):
    pre-update neighbor slabs along axes 0 and 1 replace the Jia-Zhao edge
    behavior — the backward differences at the leading edges read the -1
    neighbor's last slab, and the forward differences at the trailing edges
    *recompute* the +1 neighbor's first updated-accumulator slab from its
    pre-update state (identical arithmetic to what the neighbor computes —
    exact seams, SURVEY.md §8.3). Global domain edges are realized by halo
    *values* (the caller masks edge shards: prev := own edge slab so the
    difference vanishes; next recon := own last slab and next acc/d := 0 so
    the recomputed slab is exactly the JZ zero). ``halo_inblock`` lists
    in-block axes with shard halos (Q-axis meshes) — same scheme, whole
    in-block slabs. The single-device periodic path synthesizes halo
    *values* from the array's own wrap slabs through the same operands
    (reference anisotropic.pyx:67-68).

    ``bc`` is static: 0 periodic, 1 mirror, 2 Jia-Zhao. Mirror forward
    edges read the trailing slab of the freshly-updated accumulator itself
    (zero trailing difference — the *corrected* mirror semantics, cf. the
    reference defect utils.pyx:117-120), available from the VMEM carries.
    In-block backward edges for periodic/mirror are pure in-block reads.

    ``iso_pairs`` jointly L2-projects axis pairs (half-isotropic,
    reference halfisotropic.pyx:84-95; JZ only). The axis-1 seam column
    for an iso (0,1) pair is recomputed from the neighbor column's
    pre-update state along *both* pair axes (extra column operands).

    ``iso_next`` lists SPLIT axes belonging to an iso pair (sharded iso —
    beyond the reference, which has no distributed iso at all,
    README.md:25-26): the +1 shard-seam recompute for such an axis uses
    the joint projection, which needs the neighbor slab's backward
    difference along the pair PARTNER axis and the partner's pre-update
    accumulator slab (extra operands per axis). ``iso_corner`` lists the
    subset whose partner is ALSO split: the partner-backward difference
    at the slab's leading index then lives on the diagonal-neighbor
    shard — a corner operand (recon, both pair axes collapsed to 1).
    ``prev0_seam`` (iso (0,1) with axis 0 split and multiple strips):
    the intra-strip seam recompute's axis-0 backward at the block's
    global-first row reads the -0 shard's last row via a pre-gathered
    first-column set of the ``prev0`` halo instead of the JZ zero mask.
    """
    iso_r = (0, 1) in iso_pairs
    partner = {p: q for pr in iso_pairs for p, q in (pr, pr[::-1])}

    def kernel(*refs):
        it = iter(refs)
        scal = next(it)                       # SMEM (1, 2n+1)
        orig = next(it)                       # block @ (ip-1, j)
        recon = next(it)                      # block @ (ip, j)
        recon_prev1 = next(it) if has_seam else None
        accs = [next(it) for _ in range(n_ax)]           # blocks @ (ip, j)
        acc1_next1 = next(it) if has_seam else None
        ds = [next(it) for _ in range(n_ax)] if fista else None
        d1_next1 = next(it) if (fista and has_seam) else None
        recon_next1 = next(it) if has_seam else None
        if iso_r and has_seam:
            # iso (0,1) seam recompute needs the neighbor column's axis-0
            # difference too: the column at row-block ip-2 (for its row-0
            # backward operand) and the axis-0 accumulator column. (The
            # axis-0 dual d0 is NOT needed — only the b1 component of the
            # pair is reconstructed at the seam.)
            recon_c_ip2 = next(it)            # col @ (ip-2, j+1)
            acc0_next1 = next(it)             # col @ (ip-1, j+1)
        if with_halo:
            h_prev0 = next(it)                # (1,b1)+tail @ (0, j)
            h_prev1 = next(it)                # (1,1)+tail @ (ip, 0)
            h_next0_recon = next(it)          # (1,b1)+tail @ (0, j)
            h_next0_acc = next(it)            # (1,b1)+tail @ (0, j)
            h_next0_d = next(it) if fista else None
            h_next1_recon = next(it)          # (1,1)+tail @ (ip-1, 0)
            h_next1_acc = next(it)            # (1,1)+tail @ (ip-1, 0)
            h_next1_d = next(it) if fista else None
            h_in = {}
            for ax in halo_inblock:
                hp = next(it)                 # axis-ax slab @ (ip, j)
                hr = next(it)                 # axis-ax slab @ (ip-1, j)
                ha = next(it)
                hd = next(it) if fista else None
                h_in[ax] = (hp, hr, ha, hd)
            if halo_flat:
                # folded-energy-axis shard halos: single flat elements
                # per (row, col) — (b0, b1, 1, 1) blocks
                hf_prev = next(it)            # @ (ip, j)
                hf_recon = next(it)           # @ (ip-1, j)
                hf_acc = next(it)
                hf_d = next(it) if fista else None
            # sharded-iso extras (order mirrors fused_iteration's appends)
            iso_ops = {}
            if 0 in iso_next:
                iso_ops["acc1_n0"] = next(it)     # (1,b1) row @ (0, j)
                iso_ops["rlast_n0"] = next(it)    # (1,1) col @ (0, j-1)
                if 0 in iso_corner:
                    iso_ops["corner0"] = next(it)
            if 1 in iso_next:
                iso_ops["acc0_n1"] = next(it)     # (b0,1) col @ (ip-1, 0)
                iso_ops["rec_n1_ip2"] = next(it)  # (b0,1) col @ (ip-2, 0)
                if 1 in iso_corner:
                    iso_ops["corner1"] = next(it)
            for ax in halo_inblock:
                if ax in iso_next:
                    iso_ops[f"accp_n{ax}"] = next(it)   # @ (ip-1, j)
                    if ax in iso_corner:
                        iso_ops[f"corner{ax}"] = next(it)
            if prev0_seam:
                iso_ops["p0_first"] = next(it)    # (1,1) col @ (0, j+1)

        recon_new = next(it)                  # block @ (ip-1, j)
        b_outs = [next(it) for _ in range(n_ax)]
        d_outs = [next(it) for _ in range(n_ax)] if fista else None
        bnorm_out = next(it)                  # SMEM (1,1), written at end
        dnum_out = next(it)                   # SMEM (1,1), written at end
        dden_out = next(it)                   # SMEM (1,1), written at end

        s_recon = next(it)                    # VMEM carry: recon block ip-1
        s_b = [next(it) for _ in range(n_ax)]  # carry: b_new blocks ip-1
        s_sums = next(it)                     # SMEM (3,) running reductions

        j = pl.program_id(0)
        ip = pl.program_id(1)
        g0 = pl.num_programs(1) - 1
        g1 = pl.num_programs(0)
        in_acc_phase = ip < g0

        # per-axis "this shard owns the global trailing edge" flags (1.0
        # single-device / unsplit axes; set per-shard by the engine for
        # sharded mirror, where the edge shard's forward edge is its own
        # updated trailing slab while interior shards recompute the +1
        # neighbor's slab from halos)
        edge_fl = [scal[0, 2 * n_ax + 1 + k] for k in range(n_ax)]

        # reductions run in SMEM scratch across the sequential grid
        # (deterministic order) and land in the outputs at the final step
        @pl.when(jnp.logical_and(j == 0, ip == 0))
        def _():
            s_sums[0] = jnp.float32(0.0)
            s_sums[1] = jnp.float32(0.0)
            s_sums[2] = jnp.float32(0.0)

        lam_inv = [scal[0, k] for k in range(n_ax)]
        lam_mu = [scal[0, n_ax + k] for k in range(n_ax)]
        rho = scal[0, 2 * n_ax] if fista else None

        # ------------- dual-update phase for row-block ip ----------------
        # (values computed unconditionally — the drain step ip==G0 computes
        # garbage that is never written or used; all writes are guarded)
        a = recon[...]
        prev_row = s_recon[...]

        diffs = []
        # axis 0: rows 1..B0-1 shift in-block; row 0 reads the carried
        # previous block's last row, or at the global leading edge the halo
        # slab (whose value realizes the BC: JZ edge shards get their own
        # first row, so the difference vanishes; single-device periodic and
        # mirror synthesize the wrap/adjacent slab) / the JZ zero
        a_row0 = lax.slice_in_dim(a, 0, 1, axis=0)
        if with_halo:
            edge0 = a_row0 - h_prev0[...]
        else:
            edge0 = jnp.zeros_like(a_row0)
        seam0 = a_row0 - lax.slice_in_dim(prev_row, b0 - 1, b0, axis=0)
        row0 = jnp.where(ip > 0, seam0, edge0)
        if b0 > 1:
            inb0 = a - _shift_down_inblock(a, 0)
            diffs.append(lax.concatenate(
                [row0, lax.slice_in_dim(inb0, 1, b0, axis=0)], dimension=0
            ))
        else:
            diffs.append(row0)
        # axis 1: in-block backward shift; seam column from the operand;
        # leading column from the halo (or JZ zero)
        a_col0 = lax.slice_in_dim(a, 0, 1, axis=1)
        if with_halo:
            edge1 = a_col0 - h_prev1[...]
        else:
            edge1 = jnp.zeros_like(a_col0)
        if has_seam:
            seam = a_col0 - recon_prev1[...]
            seam = jnp.where(j > 0, seam, edge1)
        else:
            seam = edge1
        if b1 > 1:
            body = a - _shift_down_inblock(a, 1)
            diff1 = lax.concatenate(
                [seam, lax.slice_in_dim(body, 1, b1, axis=1)], dimension=1
            )
        else:
            diff1 = seam
        diffs.append(diff1)

        # trailing axes: in-block shifts. The backward-edge slab realizes
        # the BC (shard halo > periodic wrap > mirror adjacent > JZ self)
        def down_in(x, ax, h_prev):
            n = x.shape[ax]
            if h_prev is not None:
                first = h_prev[...]
            elif bc == 0:                     # periodic: global wrap
                first = lax.slice_in_dim(x, n - 1, n, axis=ax)
            elif bc == 1:                     # mirror: adjacent interior
                first = lax.slice_in_dim(x, 1, 2, axis=ax)
            else:                             # JZ: zero difference
                first = lax.slice_in_dim(x, 0, 1, axis=ax)
            body_ = lax.slice_in_dim(x, 0, n - 1, axis=ax)
            return lax.concatenate([first, body_], dimension=ax)

        for ax in inblock_axes:
            hp = h_in[ax][0] if (with_halo and ax in h_in) else None
            diffs.append(a - down_in(a, ax, hp))
        if flat:
            sd = _shift_down_flat(a)
            if with_halo and halo_flat:
                # folded-axis shard seam: the global first element's
                # backward operand is the -1 shard's last element (edge
                # shards receive their own first element — zero diff, JZ)
                e1i = lax.broadcasted_iota(jnp.int32, sd.shape, 2)
                e2i = lax.broadcasted_iota(jnp.int32, sd.shape, 3)
                sd = jnp.where(jnp.logical_and(e1i == 0, e2i == 0),
                               hf_prev[...], sd)
            diffs.append(a - sd)

        # dual projection: per-axis clip, or joint L2 for iso pairs
        deltas = [diffs[k] + accs[k][...] for k in range(n_ax)]
        proj = [None] * n_ax
        for (k1, k2) in iso_pairs:
            # pair shares one clip radius (reference cyTVDN.py:160-162)
            mag = jnp.sqrt(deltas[k1] * deltas[k1] + deltas[k2] * deltas[k2])
            clipv = lam_inv[k1]
            scale = jnp.where(
                mag > clipv, clipv / jnp.where(mag > 0, mag, 1.0), 1.0
            )
            proj[k1] = deltas[k1] * scale
            proj[k2] = deltas[k2] * scale
        for k in range(n_ax):
            if proj[k] is None:
                proj[k] = jnp.clip(deltas[k], -lam_inv[k], lam_inv[k])

        b_new = []
        bnorm = jnp.zeros((), jnp.float32)
        for k in range(n_ax):
            clipped = proj[k]
            if fista:
                # ds may be stored bf16 in HBM (opt-in lossy-duals mode,
                # SolverOptions.lossy_duals): compute stays f32 in VMEM
                bk = clipped + rho * (
                    clipped - ds[k][...].astype(clipped.dtype))
            else:
                bk = clipped
            b_new.append(bk)
            bnorm = bnorm + jnp.sum(jnp.abs(bk))
            if fista:
                d_new = clipped

                @pl.when(in_acc_phase)
                def _(k=k, bk=bk, d_new=d_new):
                    b_outs[k][...] = bk
                    d_outs[k][...] = d_new.astype(d_outs[k].dtype)
            else:

                @pl.when(in_acc_phase)
                def _(k=k, bk=bk):
                    b_outs[k][...] = bk

        @pl.when(in_acc_phase)
        def _():
            s_sums[0] = s_sums[0] + bnorm

        # ------------- reconstruction phase for row-block ip-1 -----------
        @pl.when(ip > 0)
        def _():
            recon_old = prev_row
            bp = [s_b[k][...] for k in range(n_ax)]

            def recompute_b(diff, acc_h, d_h, k):
                """The neighbor slab's updated accumulator from its
                pre-update state — identical arithmetic to the neighbor's
                own update, so seams are exact."""
                c = jnp.clip(diff + acc_h, -lam_inv[k], lam_inv[k])
                return c + rho * (c - d_h) if fista else c

            def iso_recompute(delta_s, delta_o, clipv, d_s):
                """Half-isotropic neighbor-slab recompute: jointly project
                the pair deltas (identical arithmetic to the dual phase —
                float add is commutative, so the s/o order of the squares
                is bit-irrelevant) and keep the split axis's component."""
                mag = jnp.sqrt(delta_s * delta_s + delta_o * delta_o)
                scale = jnp.where(
                    mag > clipv, clipv / jnp.where(mag > 0, mag, 1.0), 1.0
                )
                p = delta_s * scale
                return p + rho * (p - d_s) if fista else p

            fwds = []
            # axis 0: rows 0..B0-2 shift in-block from the carried b_new;
            # the last row reads this step's fresh b_new[0] first row, or
            # at the global trailing edge: mirror → own trailing slab (zero
            # difference), halo (shard seam / synthesized periodic wrap) →
            # recomputed +1 slab, JZ → the zero wrap.
            a_last = lax.slice_in_dim(a, b0 - 1, b0, axis=0)
            if bc == 1:
                edge_f0 = lax.slice_in_dim(bp[0], b0 - 1, b0, axis=0)
                if with_halo:
                    # interior shards of a sharded mirror run read the +1
                    # shard's recomputed slab; only the global trailing
                    # shard uses the own-slab (zero difference) edge
                    edge_f0 = jnp.where(
                        edge_fl[0] > 0, edge_f0,
                        recompute_b(
                            h_next0_recon[...] - a_last,
                            h_next0_acc[...],
                            h_next0_d[...] if fista else None, 0,
                        ),
                    )
            elif with_halo and 0 in iso_next:
                # iso (0,1), axis 0 split: the +0 shard's first-row b0
                # needs BOTH pair deltas at that row. delta0 = its axis-0
                # backward diff (vs our last row); delta1 = its in-row
                # axis-1 backward diff — column 0 reading strip j-1's last
                # halo column (pre-gathered), the shard's first column
                # reading the corner operand (axis 1 split) or the JZ
                # zero (own column 0; axis 1 unsplit).
                rn = h_next0_recon[...]
                d0n = (rn - a_last) + h_next0_acc[...]
                gath = iso_ops["rlast_n0"][...]
                if 0 in iso_corner:
                    first = jnp.where(j > 0, gath, iso_ops["corner0"][...])
                else:
                    first = jnp.where(
                        j > 0, gath, lax.slice_in_dim(rn, 0, 1, axis=1))
                rn_sh = (lax.concatenate(
                    [first, lax.slice_in_dim(rn, 0, b1 - 1, axis=1)],
                    dimension=1) if b1 > 1 else first)
                d1n = (rn - rn_sh) + iso_ops["acc1_n0"][...]
                edge_f0 = iso_recompute(
                    d0n, d1n, lam_inv[0],
                    h_next0_d[...] if fista else None)
            elif with_halo:
                edge_f0 = recompute_b(
                    h_next0_recon[...] - a_last,
                    h_next0_acc[...],
                    h_next0_d[...] if fista else None, 0,
                )
            else:
                edge_f0 = jnp.zeros_like(a_last)
            seam_f0 = jnp.where(
                ip < g0, lax.slice_in_dim(b_new[0], 0, 1, axis=0), edge_f0
            )
            if b0 > 1:
                fwds.append(lax.concatenate(
                    [lax.slice_in_dim(bp[0], 1, b0, axis=0), seam_f0],
                    dimension=0,
                ))
            else:
                fwds.append(seam_f0)
            # axis 1: in-block forward shift; seam column recomputed from
            # the neighbor column's pre-update state; trailing edge from
            # the mirror self-slab, the +1 shard halo, or the JZ zero wrap.
            old_lastcol = lax.slice_in_dim(recon_old, b1 - 1, b1, axis=1)
            if bc == 1:
                edge_f1 = lax.slice_in_dim(bp[1], b1 - 1, b1, axis=1)
                if with_halo:
                    edge_f1 = jnp.where(
                        edge_fl[1] > 0, edge_f1,
                        recompute_b(
                            h_next1_recon[...] - old_lastcol,
                            h_next1_acc[...],
                            h_next1_d[...] if fista else None, 1,
                        ),
                    )
            elif with_halo and 1 in iso_next:
                # iso (0,1), axis 1 split: the +1 shard's first-col b1
                # recompute. delta1 vs our last column; delta0 = the halo
                # column's own axis-0 backward diff, row 0 reading the
                # ip-2 block's last row (same array, shifted index map),
                # the shard's first row reading the corner operand (axis 0
                # split) or the JZ zero (own row 0).
                cn = h_next1_recon[...]
                d1n = (cn - old_lastcol) + h_next1_acc[...]
                prev_l = lax.slice_in_dim(
                    iso_ops["rec_n1_ip2"][...], b0 - 1, b0, axis=0)
                if 1 in iso_corner:
                    first = jnp.where(
                        ip == 1, iso_ops["corner1"][...], prev_l)
                else:
                    first = jnp.where(
                        ip == 1, lax.slice_in_dim(cn, 0, 1, axis=0),
                        prev_l)
                cn_sh = (lax.concatenate(
                    [first, lax.slice_in_dim(cn, 0, b0 - 1, axis=0)],
                    dimension=0) if b0 > 1 else first)
                d0n = (cn - cn_sh) + iso_ops["acc0_n1"][...]
                edge_f1 = iso_recompute(
                    d1n, d0n, lam_inv[0],
                    h_next1_d[...] if fista else None)
            elif with_halo:
                edge_f1 = recompute_b(
                    h_next1_recon[...] - old_lastcol,
                    h_next1_acc[...],
                    h_next1_d[...] if fista else None, 1,
                )
            else:
                edge_f1 = jnp.zeros_like(old_lastcol)
            if has_seam and not iso_r:
                seam_b1 = recompute_b(
                    recon_next1[...] - old_lastcol,
                    acc1_next1[...],
                    d1_next1[...] if fista else None, 1,
                )
                seam_b1 = jnp.where(j < g1 - 1, seam_b1, edge_f1)
            elif has_seam:
                # iso (0,1): the neighbor column's updated b1 needs BOTH
                # pair deltas at that column. delta1 = its axis-1 backward
                # diff (vs our last column); delta0 = its axis-0 in-column
                # diff, row 0 reading the ip-2 block's last row (JZ zero at
                # the global first row, masked by ip==1).
                rc = recon_next1[...]
                delta1_c = (rc - old_lastcol) + acc1_next1[...]
                rc_up = lax.slice_in_dim(rc, 0, b0 - 1, axis=0) \
                    if b0 > 1 else None
                prev_last = lax.slice_in_dim(
                    recon_c_ip2[...], b0 - 1, b0, axis=0
                )
                rc_row0 = lax.slice_in_dim(rc, 0, 1, axis=0)
                if prev0_seam:
                    # axis 0 split: the seam column's row-0 backward
                    # operand is the -0 shard's last row at strip j+1's
                    # first column (pre-gathered prev0 halo columns; edge
                    # shards' prev0 is their own first row — zero diff,
                    # exactly the JZ mask this replaces)
                    first = jnp.where(
                        ip == 1, iso_ops["p0_first"][...], prev_last)
                else:
                    first = jnp.where(ip == 1, rc_row0, prev_last)
                rc_shift = (lax.concatenate([first, rc_up], dimension=0)
                            if b0 > 1 else first)
                delta0_c = (rc - rc_shift) + acc0_next1[...]
                mag = jnp.sqrt(delta0_c * delta0_c + delta1_c * delta1_c)
                clipv = lam_inv[0]
                scale = jnp.where(
                    mag > clipv, clipv / jnp.where(mag > 0, mag, 1.0), 1.0
                )
                p1 = delta1_c * scale
                if fista:
                    p1 = p1 + rho * (p1 - d1_next1[...])
                seam_b1 = jnp.where(j < g1 - 1, p1, edge_f1)
            else:
                seam_b1 = edge_f1
            if b1 > 1:
                fwd1 = lax.concatenate(
                    [lax.slice_in_dim(bp[1], 1, b1, axis=1), seam_b1],
                    dimension=1,
                )
            else:
                fwd1 = seam_b1
            fwds.append(fwd1)
            # in-block axes: the JZ zero-slab invariant AND periodic both
            # wrap last→first; mirror reads the own trailing slab; a shard
            # halo recomputes the +1 shard's first updated slab
            for i_ax, ax in enumerate(inblock_axes):
                k = 2 + i_ax
                base = _shift_up_inblock(bp[k], ax)
                n = bp[k].shape[ax]
                if bc == 1:
                    last = lax.slice_in_dim(bp[k], n - 1, n, axis=ax)
                    if with_halo and ax in h_in:
                        _, hr, ha, hd = h_in[ax]
                        last = jnp.where(
                            edge_fl[k] > 0, last,
                            recompute_b(
                                hr[...] - lax.slice_in_dim(
                                    recon_old, n - 1, n, axis=ax),
                                ha[...],
                                hd[...] if fista else None, k,
                            ),
                        )
                elif with_halo and ax in h_in and ax in iso_next:
                    # iso (2,3), axis ``ax`` split: the +ax shard's first
                    # slab needs both pair deltas — its partner-axis
                    # backward diff is in-slab (JZ zero at the leading
                    # index, or the diagonal corner when the partner is
                    # split too).
                    o = partner[ax]
                    _, hr, ha, hd = h_in[ax]
                    hrv = hr[...]
                    dsn = (hrv - lax.slice_in_dim(
                        recon_old, n - 1, n, axis=ax)) + ha[...]
                    hr_sh = _shift_down_inblock(hrv, o)
                    if ax in iso_corner:
                        oi = lax.broadcasted_iota(jnp.int32, hrv.shape, o)
                        hr_sh = jnp.where(
                            oi == 0, iso_ops[f"corner{ax}"][...], hr_sh)
                    don = (hrv - hr_sh) + iso_ops[f"accp_n{ax}"][...]
                    last = iso_recompute(
                        dsn, don, lam_inv[min(ax, o)],
                        hd[...] if fista else None)
                elif with_halo and ax in h_in:
                    _, hr, ha, hd = h_in[ax]
                    last = recompute_b(
                        hr[...] - lax.slice_in_dim(
                            recon_old, n - 1, n, axis=ax),
                        ha[...],
                        hd[...] if fista else None, k,
                    )
                else:
                    last = None
                if last is not None:
                    base = lax.concatenate(
                        [lax.slice_in_dim(bp[k], 1, n, axis=ax), last],
                        dimension=ax,
                    )
                fwds.append(base)
            if flat:
                su = _shift_up_flat(bp[n_ax - 1])
                if with_halo and halo_flat:
                    # global last element's forward operand: the +1
                    # shard's first updated accumulator, recomputed from
                    # its pre-update state (identical arithmetic — exact;
                    # edge shards' halo values realize the JZ zero wrap)
                    e1n, e2n = recon_old.shape[2], recon_old.shape[3]
                    r_last = lax.slice_in_dim(
                        lax.slice_in_dim(recon_old, e1n - 1, e1n, axis=2),
                        e2n - 1, e2n, axis=3)
                    nb = recompute_b(
                        hf_recon[...] - r_last, hf_acc[...],
                        hf_d[...] if fista else None, n_ax - 1)
                    e1i = lax.broadcasted_iota(jnp.int32, su.shape, 2)
                    e2i = lax.broadcasted_iota(jnp.int32, su.shape, 3)
                    su = jnp.where(
                        jnp.logical_and(e1i == e1n - 1, e2i == e2n - 1),
                        nb, su)
                fwds.append(su)

            div = jnp.zeros_like(recon_old)
            for k in range(n_ax):
                div = div + lam_mu[k] * (bp[k] - fwds[k])
            newr = orig[...] - div
            recon_new[...] = newr
            s_sums[1] = s_sums[1] + jnp.sum(jnp.abs(newr - recon_old))
            s_sums[2] = s_sums[2] + jnp.sum(jnp.abs(recon_old))

        # ------------- update carries for the next step ------------------
        @pl.when(in_acc_phase)
        def _():
            s_recon[...] = a
            for k in range(n_ax):
                s_b[k][...] = b_new[k]

        # ------------- final step: publish the reductions ----------------
        @pl.when(jnp.logical_and(j == g1 - 1, ip == g0))
        def _():
            bnorm_out[0, 0] = s_sums[0]
            dnum_out[0, 0] = s_sums[1]
            dden_out[0, 0] = s_sums[2]

    return kernel


@functools.partial(jax.jit, static_argnames=("fista", "interpret", "bc",
                                              "iso_r", "iso_q"))
def fused_iteration(
    orig: Array,
    recon: Array,
    accs: Tuple[Array, ...],
    ds: Optional[Tuple[Array, ...]],
    tk_ratio: Array,
    lambda_inv: Array,
    lam_mu: Array,
    fista: bool = True,
    interpret: bool = False,
    halos=None,
    bc: int = 2,
    iso_r: bool = False,
    iso_q: bool = False,
    edge_next=None,
):
    """One full TV iteration as a single fused Pallas pass.

    ``halos`` (optional, used per-shard inside ``shard_map``, or synthesized
    for single-device periodic/mirror) is a dict of pre-update neighbor
    slabs: ``prev0`` (1,N1,…), ``prev1`` (N0,1,…),
    ``next0_recon``/``next0_acc``[/``next0_d``] (1,N1,…),
    ``next1_recon``/``next1_acc``[/``next1_d``] (N0,1,…), and per split
    in-block axis A: ``prevA``/``nextA_recon``/``nextA_acc``[/``nextA_d``]
    (axis-A extent 1). See :func:`_make_kernel` for seam semantics.

    ``bc``: 0 periodic, 1 mirror, 2 Jia-Zhao (static). ``iso_r``/``iso_q``
    jointly project the (0,1)/(2,3) pairs (4D, JZ only). ``edge_next``
    (sharded mirror only): per-data-axis floats, 1.0 where this shard owns
    the global trailing edge — selects own-slab mirror edges vs neighbor
    halo recomputes per shard.

    Returns ``(recon_new, accs_new, ds_new, bnorm, delta_num, recon_norm)``
    with the reductions as deterministic float32 scalars.
    """
    in_shape = orig.shape
    ndim = len(in_shape)
    plan = _plan(in_shape, orig.dtype.itemsize)
    if plan is None:
        raise ValueError(f"fused kernel does not support shape {in_shape}")
    shape, inblock_axes, flat, b0, b1 = plan
    iso_pairs = tuple(
        p for p, on in (((0, 1), iso_r), ((2, 3), iso_q)) if on
    )
    with_halo = halos is not None

    def emb(x):
        return x.reshape(shape)

    orig, recon = emb(orig), emb(recon)
    accs = tuple(emb(x) for x in accs)
    if fista:
        ds = tuple(emb(x) for x in ds)
    halo_inblock = ()
    halo_flat = False
    if with_halo:
        # halo slabs share the data layout except one axis is 1; embed by
        # reshaping exactly like the data with that axis collapsed. A
        # folded energy axis's slab (user axis 2, extent 1) collapses
        # BOTH fold axes: (n0, n1, 1) → (n0, n1, 1, 1).
        def emb_slab(x, ax):
            if flat and ax == 2:
                return x.reshape(shape[:2] + (1, 1))
            s = list(shape)
            s[ax] = 1
            return x.reshape(tuple(s))

        def slab_axis(key):
            return int(key.replace("prev", "").replace("next", "")
                       .split("_")[0])

        iso_partner = {p: q for pr in iso_pairs for p, q in (pr, pr[::-1])}

        def emb_corner(x, s):
            # corner operands collapse BOTH pair axes (iso is 4D-only, so
            # the work layout is the identity — no fold interplay)
            sh = list(shape)
            sh[s] = 1
            sh[iso_partner[s]] = 1
            return x.reshape(tuple(sh))

        halos = {
            k: ((emb_corner(v, int(k[len("corner"):]))
                 if k.startswith("corner") else emb_slab(v, slab_axis(k)))
                if v is not None else None)
            for k, v in halos.items()
        }
        halo_inblock = tuple(sorted(
            ax for ax in inblock_axes if f"prev{ax}" in halos
        ))
        halo_flat = flat and "prev2" in halos
        # sharded half-isotropic: split pair axes whose +1 seam recompute
        # is the joint projection (engine supplies the partner acc slab),
        # and the subset whose partner is split too (corner operands)
        iso_next = tuple(sorted(
            s for s in iso_partner
            if f"next{s}_acc{iso_partner[s]}" in halos))
        iso_corner = tuple(s for s in iso_next if f"corner{s}" in halos)
    else:
        iso_next = ()
        iso_corner = ()

    n0, n1 = shape[0], shape[1]
    g0, g1 = n0 // b0, n1 // b1
    has_seam = g1 > 1
    prev0_seam = has_seam and 0 in iso_next
    tail = shape[2:]
    one_tail = (b0, 1) + tail   # seam-column operand blocks
    block = (b0, b1) + tail

    n_scal = 3 * ndim + 1
    if edge_next is None:
        edge_next = jnp.ones((ndim,), jnp.float32)
    scal = jnp.concatenate(
        [
            lambda_inv.astype(jnp.float32),
            lam_mu.astype(jnp.float32),
            jnp.asarray(tk_ratio, jnp.float32).reshape(1),
            jnp.asarray(edge_next, jnp.float32).reshape(ndim),
        ]
    ).reshape(1, n_scal)

    def blk(index_map):
        return pl.BlockSpec(block, index_map, memory_space=pltpu.VMEM)

    def col(index_map):
        return pl.BlockSpec(one_tail, index_map, memory_space=pltpu.VMEM)

    zeros_tail = tuple(0 for _ in tail)

    # index maps receive grid coords (j, ip) and return block indices;
    # axis 0 blocks are single rows, so block index == row index there
    def at_i_j(j, ip):
        return (jnp.minimum(ip, g0 - 1), j) + zeros_tail

    def at_im1_j(j, ip):
        return (jnp.maximum(ip - 1, 0), j) + zeros_tail

    # Seam-column operands are read from PRE-GATHERED (N0, G1, tail) copies
    # of the ::B1-strided columns, not from the cube-size arrays themselves:
    # each cube array then appears exactly once in the pallas_call and can
    # be HBM-aliased input→output (a doubly-read aliased input makes XLA
    # insert a defensive full-cube copy, and the prev-column read would see
    # the aliased write). Gathers cost O(1/B1) of a traversal each.
    if has_seam:
        # expressed as reshape + unit slice (NOT a strided slice): a strided
        # slice makes XLA's layout assignment prefer a non-row-major entry
        # layout for the whole program, which then wraps the pallas call in
        # 19 full-cube layout-conversion copies (measured)
        def col_gather(x, idx):
            g = x.reshape((n0, g1, b1) + tail)
            g = lax.slice_in_dim(g, idx, idx + 1, axis=2)
            return g.reshape((n0, g1) + tail)

        recon_lastcols = col_gather(recon, b1 - 1)  # strip j's last column
        recon_firstcols = col_gather(recon, 0)      # strip j's first column
        acc1_firstcols = col_gather(accs[1], 0)
        # seam operands stay f32 (exact bf16→f32 widening in lossy mode)
        d1_firstcols = (col_gather(ds[1], 0).astype(orig.dtype)
                        if fista else None)
        if iso_r:
            # the iso (0,1) seam recompute additionally reads the neighbor
            # column's axis-0 accumulator state
            acc0_firstcols = col_gather(accs[0], 0)

    def prev1_map(j, ip):  # strip j-1's last column (clamped) at row ip
        return (
            jnp.minimum(ip, g0 - 1),
            jnp.maximum(j - 1, 0),
        ) + zeros_tail

    def next1_map(j, ip):  # strip j+1's first column (clamped) at row ip-1
        return (
            jnp.maximum(ip - 1, 0),
            jnp.minimum(j + 1, g1 - 1),
        ) + zeros_tail

    in_specs = [
        pl.BlockSpec((1, n_scal), lambda j, ip: (0, 0),
                     memory_space=pltpu.SMEM),
        blk(at_im1_j),   # orig
        blk(at_i_j),     # recon
    ]
    inputs = [scal, orig, recon]
    aliases = {2: 0}                                # recon → recon_new

    if has_seam:
        in_specs += [col(prev1_map)]
        inputs += [recon_lastcols]
    acc_base = len(inputs)
    in_specs += [blk(at_i_j) for _ in range(ndim)]  # accs
    inputs += [*accs]
    for k in range(ndim):
        aliases[acc_base + k] = 1 + k               # acc_k → b_new_k
    if has_seam:
        in_specs += [col(next1_map)]                # acc1_next1
        inputs += [acc1_firstcols]
    if fista:
        d_base = len(inputs)
        in_specs += [blk(at_i_j) for _ in range(ndim)]  # ds
        inputs += [*ds]
        for k in range(ndim):
            aliases[d_base + k] = 1 + ndim + k      # d_k → d_new_k
        if has_seam:
            in_specs += [col(next1_map)]            # d1_next1
            inputs += [d1_firstcols]
    if has_seam:
        in_specs += [col(next1_map)]                # recon_next1
        inputs += [recon_firstcols]
        if iso_r:
            def next1_ip2_map(j, ip):   # column j+1 at row-block ip-2
                return (
                    jnp.maximum(ip - 2, 0),
                    jnp.minimum(j + 1, g1 - 1),
                ) + zeros_tail

            in_specs += [col(next1_ip2_map), col(next1_map)]
            inputs += [recon_firstcols, acc0_firstcols]
    # recon IS aliased: its pallas input blocks (ip, j) are each read before
    # the output write of block (ip-1, j) in the same strip touches them,
    # strips write disjoint columns, and all seam re-reads go through the
    # gathered copies above.

    if with_halo:
        # shard-seam operands: whole-row slabs fetched once per column
        # strip, one-column slabs per step (O(1/B1) traffic)
        row_spec = pl.BlockSpec(
            (1, b1) + tail, lambda j, ip: (0, j) + zeros_tail,
            memory_space=pltpu.VMEM,
        )
        col_i = col(lambda j, ip: (jnp.minimum(ip, g0 - 1), 0) + zeros_tail)
        col_im1 = col(lambda j, ip: (jnp.maximum(ip - 1, 0), 0) + zeros_tail)
        in_specs += [row_spec, col_i, row_spec, row_spec]
        inputs += [halos["prev0"], halos["prev1"],
                   halos["next0_recon"], halos["next0_acc"]]
        if fista:
            in_specs += [row_spec]
            inputs += [halos["next0_d"]]
        in_specs += [col_im1, col_im1]
        inputs += [halos["next1_recon"], halos["next1_acc"]]
        if fista:
            in_specs += [col_im1]
            inputs += [halos["next1_d"]]
        # split in-block (Q) axes: whole (b0, b1, …, 1, …) slabs per step
        for ax in halo_inblock:
            slab_block = tuple(
                1 if d == ax else (b0 if d == 0 else (b1 if d == 1 else e))
                for d, e in enumerate(shape)
            )

            def mk_map(row):
                def m(j, ip, row=row):
                    r = (jnp.minimum(ip, g0 - 1) if row == 0
                         else jnp.maximum(ip - 1, 0))
                    return (r, j) + zeros_tail
                return m

            sp_i = pl.BlockSpec(slab_block, mk_map(0),
                                memory_space=pltpu.VMEM)
            sp_im1 = pl.BlockSpec(slab_block, mk_map(1),
                                  memory_space=pltpu.VMEM)
            in_specs += [sp_i, sp_im1, sp_im1]
            inputs += [halos[f"prev{ax}"], halos[f"next{ax}_recon"],
                       halos[f"next{ax}_acc"]]
            if fista:
                in_specs += [sp_im1]
                inputs += [halos[f"next{ax}_d"]]
        if halo_flat:
            # folded-energy-axis shard halos: (b0, b1, 1, 1) element slabs
            fe_i = pl.BlockSpec(
                (b0, b1, 1, 1),
                lambda j, ip: (jnp.minimum(ip, g0 - 1), j, 0, 0),
                memory_space=pltpu.VMEM)
            fe_im1 = pl.BlockSpec(
                (b0, b1, 1, 1),
                lambda j, ip: (jnp.maximum(ip - 1, 0), j, 0, 0),
                memory_space=pltpu.VMEM)
            in_specs += [fe_i, fe_im1, fe_im1]
            inputs += [halos["prev2"], halos["next2_recon"],
                       halos["next2_acc"]]
            if fista:
                in_specs += [fe_im1]
                inputs += [halos["next2_d"]]
        # sharded-iso extras (append order mirrors the kernel's reads)
        elem = pl.BlockSpec((1, 1) + tail,
                            lambda j, ip: (0, 0) + zeros_tail,
                            memory_space=pltpu.VMEM)
        if 0 in iso_next:
            # the +0 halo row's per-strip LAST columns (the in-row axis-1
            # backward operand at each strip's first column), pre-gathered
            # so the halo row appears once per strip
            nr0 = halos["next0_recon"].reshape((1, g1, b1) + tail)
            nr0_lastcols = lax.slice_in_dim(
                nr0, b1 - 1, b1, axis=2).reshape((1, g1) + tail)
            in_specs += [row_spec, pl.BlockSpec(
                (1, 1) + tail,
                lambda j, ip: (0, jnp.maximum(j - 1, 0)) + zeros_tail,
                memory_space=pltpu.VMEM)]
            inputs += [halos["next0_acc1"], nr0_lastcols]
            if 0 in iso_corner:
                in_specs += [elem]
                inputs += [halos["corner0"]]
        if 1 in iso_next:
            col_im2 = col(
                lambda j, ip: (jnp.maximum(ip - 2, 0), 0) + zeros_tail)
            in_specs += [col_im1, col_im2]
            inputs += [halos["next1_acc0"], halos["next1_recon"]]
            if 1 in iso_corner:
                in_specs += [elem]
                inputs += [halos["corner1"]]
        for ax in halo_inblock:
            if ax not in iso_next:
                continue
            o = iso_partner[ax]
            slab_block = tuple(
                1 if d == ax else (b0 if d == 0 else (b1 if d == 1 else e))
                for d, e in enumerate(shape)
            )
            sp_im1 = pl.BlockSpec(
                slab_block,
                lambda j, ip: (jnp.maximum(ip - 1, 0), j) + zeros_tail,
                memory_space=pltpu.VMEM)
            in_specs += [sp_im1]
            inputs += [halos[f"next{ax}_acc{o}"]]
            if ax in iso_corner:
                cor_block = tuple(
                    1 if d in (ax, o)
                    else (b0 if d == 0 else (b1 if d == 1 else e))
                    for d, e in enumerate(shape)
                )
                in_specs += [pl.BlockSpec(
                    cor_block,
                    lambda j, ip: (jnp.maximum(ip - 1, 0), j) + zeros_tail,
                    memory_space=pltpu.VMEM)]
                inputs += [halos[f"corner{ax}"]]
        if prev0_seam:
            p0g = halos["prev0"].reshape((1, g1, b1) + tail)
            p0_firstcols = lax.slice_in_dim(
                p0g, 0, 1, axis=2).reshape((1, g1) + tail)
            in_specs += [pl.BlockSpec(
                (1, 1) + tail,
                lambda j, ip: (0, jnp.minimum(j + 1, g1 - 1)) + zeros_tail,
                memory_space=pltpu.VMEM)]
            inputs += [p0_firstcols]

    scal_out = pl.BlockSpec(
        (1, 1), lambda j, ip: (0, 0), memory_space=pltpu.SMEM
    )

    out_specs = [blk(at_im1_j)]                       # recon_new
    out_specs += [blk(at_i_j) for _ in range(ndim)]   # b_new
    if fista:
        out_specs += [blk(at_i_j) for _ in range(ndim)]  # d_new
    out_specs += [scal_out, scal_out, scal_out]       # bnorm, dnum, dden

    dt = orig.dtype
    out_shape = [jax.ShapeDtypeStruct(shape, dt)]               # recon_new
    out_shape += [jax.ShapeDtypeStruct(shape, dt)] * ndim       # b_new
    if fista:
        # d_new keeps ds's storage dtype (bf16 under lossy-duals) so the
        # HBM alias d_k → d_new_k holds and the traffic saving is real
        out_shape += [jax.ShapeDtypeStruct(shape, ds[0].dtype)] * ndim
    out_shape += [jax.ShapeDtypeStruct((1, 1), jnp.float32)] * 3

    scratch = [pltpu.VMEM(block, dt) for _ in range(1 + ndim)]
    scratch += [pltpu.SMEM((3,), jnp.float32)]

    outs = pl.pallas_call(
        _make_kernel(ndim, inblock_axes, flat, fista, b0, b1, has_seam,
                     with_halo, bc=int(bc), iso_pairs=iso_pairs,
                     halo_inblock=halo_inblock, halo_flat=halo_flat,
                     iso_next=iso_next, iso_corner=iso_corner,
                     prev0_seam=prev0_seam),
        grid=(g1, g0 + 1),
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

    recon_new = unemb(outs[0])
    accs_new = tuple(unemb(o) for o in outs[1:1 + ndim])
    if fista:
        ds_new = tuple(unemb(o) for o in outs[1 + ndim:1 + 2 * ndim])
        bnorm_p, dnum_p, dden_p = outs[1 + 2 * ndim:]
    else:
        ds_new = None
        bnorm_p, dnum_p, dden_p = outs[1 + ndim:]

    return (
        recon_new,
        accs_new,
        ds_new,
        bnorm_p[0, 0],
        dnum_p[0, 0],
        dden_p[0, 0],
    )
