"""VMEM-resident Pallas solver: the ENTIRE run in one kernel launch.

Small cubes (the 64×64×512 EELS config, BASELINE configs[0]) are grid-floor
bound on the K=1/K=2 streaming kernels: at ~10 µs/step and hundreds of grid
steps per iteration they reach ~7% of the chip. But their whole solver
state fits VMEM (128 MB on v5e) with room to spare — so instead of
streaming HBM, this kernel runs ``grid=(T,)`` with every state array held
in a persistent VMEM window:

- step ``t`` performs one full TV iteration (all per-axis dual updates +
  the reconstruction update + the bnorm/delta reductions) on the resident
  arrays — the same arithmetic as one grid-sweep of ``kernels/fused.py``,
  so results are bit-identical to the streaming kernels;
- HBM traffic for the whole run is ONE read of the input and ONE write of
  the final state (output windows have constant index maps, so Mosaic
  flushes them once, at the end) — per-iteration HBM traffic is O(1/T);
- per-iteration traces land in ``(T, 1)`` outputs indexed by ``t``.

Scope: float32, Jia-Zhao (all BC modes when unfolded), anisotropic and
half-isotropic pairs (4D, JZ only — the same envelope as the fused
kernel, reference halfisotropic.pyx:70-82); fresh runs (state initialized
in-kernel at ``t == 0``: recon ← orig, accumulators ← 0 — the reference's
init, cyTVDN/cyTVDN.py:131-145) and resumed runs (state enters through
HBM via ``pltpu.ANY`` + DMA, costing no VMEM windows — used by the
engine's stop-aware resident chunks). Hybrid schedules run in FISTA mode
with ``rho = 0`` for the unaccelerated phase — ``b = c + 0·(c − d) = c``
is the unaccelerated update exactly. Per-iteration MSE (reference
cyTVDN/cyTVDN.py:176-181) holds the reference cube in one extra
resident window and reduces SSE in-kernel. Early stopping rides chunks
+ the predictive guard (``solver.engine._run_phase_resident``).

Reference baseline: the 3D driver loop, cyTVDN/cyTVDN.py:368-430.
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
    _shift_down_flat,
    _shift_up_flat,
)

Array = jax.Array

# Whole-state VMEM budget. Live windows: orig + recon + n accs [+ n ds]
# (outputs persist across grid steps; constant index maps mean one fetch /
# one flush), plus headroom for the compiler's elementwise temporaries
# (the shifted operands and dual deltas are materialized array-size).
_RESIDENT_VMEM_CAP = 110 * 1024 * 1024
_TEMP_BUFFERS = 5


def _padded_cube_bytes(shape: Tuple[int, ...], itemsize: int) -> int:
    """Array bytes after Mosaic (8, 128) minor-tile padding."""
    dims = list(shape)
    dims[-1] = -(-dims[-1] // 128) * 128
    if len(dims) >= 2:
        dims[-2] = -(-dims[-2] // 8) * 8
    return int(np.prod(dims)) * itemsize


def resident_plan(shape: Tuple[int, ...], fista: bool, itemsize: int = 4,
                  n_iters: int = 0, with_mse: bool = False,
                  with_iso: bool = False):
    """Work layout for the resident kernel, or None when the state does
    not fit the VMEM budget. Reuses the fused planner's layout logic
    (4D direct / 3D single / 3D flat-fold) for lane-dense tiling, but
    with the whole array as one block. ``with_mse`` charges the
    resident reference-data window and the fourth trace; ``with_iso``
    charges the joint projection's magnitude/scale temporaries."""
    plan = _plan(tuple(shape), itemsize)
    if plan is None:
        # the fused planner's block budget is irrelevant here; retry the
        # flat fold directly for 3D shapes it rejected
        if len(shape) == 3 and shape[2] % 128 == 0:
            work = (shape[0], shape[1], shape[2] // 128, 128)
            flat = True
        else:
            return None
    else:
        work, _, flat = plan[0], plan[1], plan[2]
    n_live = 2 + (2 if fista else 1) * len(shape) + (1 if with_mse else 0)
    padded = _padded_cube_bytes(work, itemsize)
    temps = _TEMP_BUFFERS + (2 if with_iso else 0)
    # (T,1) trace windows pad their lane dim to 128
    trace_bytes = ((4 if with_mse else 3)
                   * (-(-max(n_iters, 1) // 8) * 8) * 128 * 4)
    if padded * (n_live + temps) + trace_bytes \
            > _RESIDENT_VMEM_CAP:
        return None
    return work, flat


def resident_supported(shape, dtype, bc, fista: bool, n_iters: int = 0,
                       isotropic_R=False, isotropic_Q=False,
                       with_mse: bool = False) -> bool:
    """Whether the resident whole-run kernel covers this config (all
    three BC modes; a folded 3D energy axis is JZ-only, and mirror needs
    2 elements per axis — the same envelope as the fused kernel;
    half-isotropic pairs are 4D Jia-Zhao only, as in the reference,
    halfisotropic.pyx:70-82)."""
    from cytvdn_tpu.config import BCMode

    if dtype != jnp.float32:
        return False
    if len(shape) not in (3, 4) or shape[0] < 2:
        return False
    with_iso = bool(isotropic_R or isotropic_Q)
    if with_iso and (len(shape) != 4 or bc != BCMode.JIA_ZHAO):
        return False
    plan = resident_plan(tuple(shape), fista, n_iters=n_iters,
                         with_mse=with_mse, with_iso=with_iso)
    if plan is None:
        return False
    if bc != BCMode.JIA_ZHAO:
        if plan[1]:  # flat fold: periodic/mirror edges would need
            return False  # cross-fold patches (same gate as the fused kernel)
        if bc == BCMode.MIRROR and min(shape) < 2:
            return False
    return True


def _make_resident_kernel(n_ax: int, work_ndim: int, flat: bool,
                          fista: bool, with_state: bool = False,
                          state_any: bool = False, bc: int = 2,
                          with_mse: bool = False,
                          iso_pairs: Tuple[Tuple[int, int], ...] = ()):
    """Kernel body for ``grid=(T,)``.

    Per-axis difference semantics are exactly the fused kernel's in-block
    path per BC mode: Jia-Zhao — backward edge difference zero, forward
    edge wraps to the identically-zero leading slab (the invariant of
    SURVEY.md §8.1); periodic — index wraparound both ways; mirror —
    backward edge reads the adjacent interior slab, forward edge reads
    the own trailing slab (zero difference — the *corrected* mirror, cf.
    reference defect utils.pyx:117-120).

    ``with_state``: resume from caller-provided ``(recon, accs[, ds])``
    instead of the fresh init. ``state_any`` keeps those inputs in HBM
    (``pltpu.ANY``) and DMAs them into the resident output windows at
    ``t == 0`` — the state then costs NO extra VMEM windows (an in+out
    VMEM pair per array would double the working set and halve the
    kernel's capacity). Interpret mode has no VMEM and no DMA engine:
    it passes the state as plain windows instead.
    """

    def kernel(*refs):
        it = iter(refs)
        scal = next(it)                         # SMEM (1, 2n)
        rho_ref = next(it)                      # SMEM (1, T), whole
        orig = next(it)                         # whole array, constant
        mse_ref = next(it) if with_mse else None   # whole, constant
        n_state_in = (1 + (2 if fista else 1) * n_ax) if with_state else 0
        state_ins = [next(it) for _ in range(n_state_in)]
        recon = next(it)                        # OUTPUT window (resident)
        b_outs = [next(it) for _ in range(n_ax)]
        d_outs = [next(it) for _ in range(n_ax)] if fista else None
        bnorm_out = next(it)                    # VMEM (T, 1), whole
        dnum_out = next(it)
        dden_out = next(it)
        sse_out = next(it) if with_mse else None
        sem = next(it) if (with_state and state_any) else None

        t = pl.program_id(0)
        lam_inv = [scal[0, k] for k in range(n_ax)]
        lam_mu = [scal[0, n_ax + k] for k in range(n_ax)]
        rho = rho_ref[0, t] if fista else None

        state_outs = [recon] + b_outs + (d_outs if fista else [])

        # t == 0: load the initial state into the resident windows —
        # fresh init (reference cyTVDN.py:131-145: recon = copy of the
        # input, accumulators/duals = 0) or the caller's state
        @pl.when(t == 0)
        def _():
            if not with_state:
                recon[...] = orig[...]
                for k in range(n_ax):
                    b_outs[k][...] = jnp.zeros_like(b_outs[k])
                    if fista:
                        d_outs[k][...] = jnp.zeros_like(d_outs[k])
            elif state_any:
                for src, dst in zip(state_ins, state_outs):
                    cp = pltpu.make_async_copy(src, dst, sem)
                    cp.start()
                    cp.wait()
            else:
                for src, dst in zip(state_ins, state_outs):
                    dst[...] = src[...]

        a = recon[...]

        def down(x, ax):
            # backward-shift operand per BC (cf. kernels/fused.py down_in)
            n = x.shape[ax]
            if bc == 0:                       # periodic: global wrap
                first = lax.slice_in_dim(x, n - 1, n, axis=ax)
            elif bc == 1:                     # mirror: adjacent interior
                first = lax.slice_in_dim(x, 1, 2, axis=ax)
            else:                             # JZ: zero difference
                first = lax.slice_in_dim(x, 0, 1, axis=ax)
            body = lax.slice_in_dim(x, 0, n - 1, axis=ax)
            return lax.concatenate([first, body], dimension=ax)

        def up(x, ax):
            # forward-shift operand: JZ/periodic wrap to the leading slab
            # (exact under JZ by the zero-slab invariant); mirror reads
            # the own trailing slab (zero difference, corrected mirror)
            n = x.shape[ax]
            if bc == 1:
                last = lax.slice_in_dim(x, n - 1, n, axis=ax)
            else:
                last = lax.slice_in_dim(x, 0, 1, axis=ax)
            body = lax.slice_in_dim(x, 1, n, axis=ax)
            return lax.concatenate([body, last], dimension=ax)

        # ---- dual updates (per-axis backward differences) ----
        diffs = []
        for ax in range(work_ndim if not flat else 2):
            diffs.append(a - down(a, ax))
        if flat:
            diffs.append(a - _shift_down_flat(a))

        # dual projection: per-axis clip, or joint L2 for iso pairs —
        # the exact expressions of kernels/fused.py (joint projection:
        # reference halfisotropic.pyx:84-95, shared clip cyTVDN.py:160-162)
        proj = [None] * n_ax
        for (k1, k2) in iso_pairs:
            dl1 = diffs[k1] + b_outs[k1][...]
            dl2 = diffs[k2] + b_outs[k2][...]
            mag = jnp.sqrt(dl1 * dl1 + dl2 * dl2)
            clipv = lam_inv[k1]
            scale = jnp.where(
                mag > clipv, clipv / jnp.where(mag > 0, mag, 1.0), 1.0)
            proj[k1] = dl1 * scale
            proj[k2] = dl2 * scale

        b_new = []
        bnorm = jnp.zeros((), jnp.float32)
        for k in range(n_ax):
            clipped = proj[k] if proj[k] is not None else \
                jnp.clip(diffs[k] + b_outs[k][...],
                         -lam_inv[k], lam_inv[k])
            if fista:
                bk = clipped + rho * (clipped - d_outs[k][...])
                d_outs[k][...] = clipped
            else:
                bk = clipped
            b_outs[k][...] = bk
            b_new.append(bk)
            bnorm = bnorm + jnp.sum(jnp.abs(bk))

        # ---- reconstruction update (per-axis forward differences) ----
        fwds = []
        for ax in range(work_ndim if not flat else 2):
            fwds.append(up(b_new[ax], ax))
        if flat:
            fwds.append(_shift_up_flat(b_new[n_ax - 1]))
        div = jnp.zeros_like(a)
        for k in range(n_ax):
            div = div + lam_mu[k] * (b_new[k] - fwds[k])
        newr = orig[...] - div
        recon[...] = newr

        # per-iteration trace rows: dynamic-row vector stores into VMEM
        # windows ((T,1) SMEM windows pad to 512 B/element and blow the
        # 1 MB SMEM cap at production iteration counts — measured)
        bnorm_out[pl.ds(t, 1), :] = jnp.reshape(bnorm, (1, 1))
        dnum_out[pl.ds(t, 1), :] = jnp.reshape(
            jnp.sum(jnp.abs(newr - a)), (1, 1))
        dden_out[pl.ds(t, 1), :] = jnp.reshape(
            jnp.sum(jnp.abs(a)), (1, 1))
        if with_mse:
            e = newr - mse_ref[...]
            sse_out[pl.ds(t, 1), :] = jnp.reshape(jnp.sum(e * e), (1, 1))

    return kernel


@functools.partial(jax.jit,
                   static_argnames=("n_iters", "fista", "interpret",
                                    "bc", "iso_r", "iso_q"))
def resident_solve(
    orig: Array,
    rhos: Array,
    lambda_inv: Array,
    lam_mu: Array,
    n_iters: int,
    fista: bool,
    interpret: bool = False,
    state=None,
    bc: int = 2,
    ref: Optional[Array] = None,
    iso_r: bool = False,
    iso_q: bool = False,
):
    """Run ``n_iters`` TV iterations entirely in VMEM.

    ``rhos`` is the per-iteration FISTA momentum schedule (length
    ``n_iters``; pass zeros for unaccelerated phases — with ``rho = 0``
    the FISTA update reduces to the plain one exactly).

    ``state`` (optional) is ``(recon, accs, ds)`` to resume from; None
    starts fresh (recon=orig, accs/ds=0). On the compiled path the state
    enters through HBM (``pltpu.ANY``) and is DMA'd into the resident
    windows at the first grid step, costing no extra VMEM.

    ``ref`` (per-iteration MSE runs): the reference datacube, held in
    one extra resident VMEM window; appends the per-iteration SSE trace
    to the return tuple.

    Returns ``(recon, accs, ds, b_norm, dnum, dden[, sse])`` — the
    traces are length-``n_iters`` float32 vectors (deterministic
    whole-array reductions; may differ from the streaming kernels'
    block-grouped sums in the last ulp, as chunking choices are allowed
    to, CLAUDE.md invariants).
    """
    in_shape = orig.shape
    ndim = len(in_shape)
    with_mse = ref is not None
    iso_pairs = tuple(
        p for p, on in (((0, 1), iso_r), ((2, 3), iso_q)) if on)
    plan = resident_plan(in_shape, fista, orig.dtype.itemsize, n_iters,
                         with_mse=with_mse, with_iso=bool(iso_pairs))
    if plan is None:
        raise ValueError(
            f"resident kernel does not support shape {in_shape}")
    work, flat = plan
    work_ndim = len(work)
    with_state = state is not None
    state_any = with_state and not interpret

    orig_w = orig.reshape(work)
    n_scal = 2 * ndim
    scal = jnp.concatenate([
        lambda_inv.astype(jnp.float32), lam_mu.astype(jnp.float32)
    ]).reshape(1, n_scal)
    rho_row = jnp.asarray(rhos, jnp.float32).reshape(1, n_iters)

    whole = pl.BlockSpec(work, lambda t: (0,) * work_ndim,
                         memory_space=pltpu.VMEM)
    trace_spec = pl.BlockSpec((n_iters, 1), lambda t: (0, 0),
                              memory_space=pltpu.VMEM)

    in_specs = [
        pl.BlockSpec((1, n_scal), lambda t: (0, 0),
                     memory_space=pltpu.SMEM),
        pl.BlockSpec((1, n_iters), lambda t: (0, 0),
                     memory_space=pltpu.SMEM),
        whole,
    ]
    inputs = [scal, rho_row, orig_w]
    if with_mse:
        in_specs.append(whole)
        inputs.append(ref.reshape(work))

    dt = orig.dtype
    n_state = 1 + (2 if fista else 1) * ndim
    aliases = {}
    if with_state:
        recon0, accs0, ds0 = state
        sins = [recon0.reshape(work)]
        sins += [a.reshape(work) for a in accs0]
        if fista:
            sins += [d.reshape(work) for d in ds0]
        assert len(sins) == n_state
        base = len(inputs)
        spec = (pl.BlockSpec(memory_space=pltpu.ANY) if state_any
                else whole)
        in_specs += [spec] * n_state
        inputs += sins
        for k in range(n_state):
            aliases[base + k] = k
    n_trace = 4 if with_mse else 3
    out_specs = [whole] * n_state + [trace_spec] * n_trace
    out_shape = [jax.ShapeDtypeStruct(work, dt)] * n_state
    out_shape += [jax.ShapeDtypeStruct((n_iters, 1), jnp.float32)] * n_trace

    scratch = [pltpu.SemaphoreType.DMA] if state_any else []

    outs = pl.pallas_call(
        _make_resident_kernel(ndim, work_ndim, flat, fista,
                              with_state=with_state, state_any=state_any,
                              bc=int(bc), with_mse=with_mse,
                              iso_pairs=iso_pairs),
        grid=(n_iters,),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=scratch,
        input_output_aliases=aliases,
        interpret=interpret,
        compiler_params=None if interpret else pltpu.CompilerParams(
            vmem_limit_bytes=_RESIDENT_VMEM_CAP
        ),
    )(*inputs)

    def unemb(x):
        return x.reshape(in_shape)

    recon = unemb(outs[0])
    accs = tuple(unemb(o) for o in outs[1:1 + ndim])
    ds = tuple(unemb(o) for o in outs[1 + ndim:1 + 2 * ndim]) if fista \
        else None
    traces = tuple(o[:, 0] for o in outs[n_state:])
    return (recon, accs, ds) + traces
