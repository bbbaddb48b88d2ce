"""Manual fused-kernel validation script (also usable on the real TPU where
the pytest suite forces CPU). Usage:

    python tests/manual_fused_check.py cpu     # interpret mode
    python tests/manual_fused_check.py tpu     # compiled on the TPU
"""

import os
import sys
import time

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, os.path.dirname(_HERE))  # repo root
sys.path.insert(0, _HERE)                   # tests/ (for golden)

ON = sys.argv[1] if len(sys.argv) > 1 else "cpu"

import jax  # noqa: E402

if ON == "cpu":
    jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp  # noqa: E402

sys.path.insert(0, "tests")
import golden  # noqa: E402

from cytvdn_tpu.kernels.fused import fused_iteration  # noqa: E402

INTERPRET = ON == "cpu"
rng = np.random.default_rng(1)


def setup(shape):
    ndim = len(shape)
    a = (rng.standard_normal(shape) * 0.5 + 2).astype(np.float32)
    recon = (rng.standard_normal(shape) * 0.5 + 2).astype(np.float32)
    accs, ds = [], []
    for k in range(ndim):
        arr = (rng.standard_normal(shape) * 0.05).astype(np.float32)
        darr = (rng.standard_normal(shape) * 0.05).astype(np.float32)
        sl = [slice(None)] * ndim
        sl[k] = 0
        arr[tuple(sl)] = 0.0  # JZ zero-slab invariant
        darr[tuple(sl)] = 0.0
        accs.append(arr)
        ds.append(darr)
    return a, recon, accs, ds


def check(shape, fista):
    ndim = len(shape)
    a, recon, accs, ds = setup(shape)
    lam_inv = np.full(ndim, 8.0, np.float32)
    lam_mu = np.full(ndim, 1 / 32, np.float32)
    rho = np.float32(0.6)
    g_accs, gbn = [], 0.0
    for k in range(ndim):
        if fista:
            b, d, n = golden.accumulator_update_fista(
                recon.astype(np.float64), accs[k].astype(np.float64),
                ds[k].astype(np.float64), float(rho), k, float(lam_inv[k]), 2)
        else:
            b, n = golden.accumulator_update(
                recon.astype(np.float64), accs[k].astype(np.float64), k,
                float(lam_inv[k]), 2)
        g_accs.append(b)
        gbn += n
    g_recon, g_delta = golden.datacube_update(
        a.astype(np.float64), recon.astype(np.float64), g_accs,
        lam_mu.astype(np.float64), 2)
    t0 = time.time()
    out = fused_iteration(
        jnp.asarray(a), jnp.asarray(recon),
        tuple(jnp.asarray(x) for x in accs),
        tuple(jnp.asarray(x) for x in ds) if fista else None,
        rho, jnp.asarray(lam_inv), jnp.asarray(lam_mu),
        fista=fista, interpret=INTERPRET)
    recon_new = np.asarray(out[0])
    dt = time.time() - t0
    err_r = np.max(np.abs(recon_new - g_recon))
    err_b = max(np.max(np.abs(np.asarray(out[1][k]) - g_accs[k]))
                for k in range(ndim))
    err_n = abs(float(out[3]) - gbn) / gbn
    err_dl = abs(float(out[4]) / float(out[5]) - g_delta) / g_delta
    status = "OK " if max(err_r, err_b) < 1e-5 and max(err_n, err_dl) < 1e-4 \
        else "FAIL"
    print(f"{status} {shape} fista={fista}: recon {err_r:.2e} "
          f"accs {err_b:.2e} bnorm {err_n:.2e} delta {err_dl:.2e} "
          f"[{dt:.1f}s]", flush=True)
    return status == "OK ", {
        "shape": list(shape), "fista": fista,
        "recon_max_abs_vs_golden": float(err_r),
        "accs_max_abs_vs_golden": float(err_b),
        "bnorm_rel_vs_golden": float(err_n),
        "delta_rel_vs_golden": float(err_dl),
        "ok": status == "OK ",
    }


def check_vs_ops(shape, bc, iso_r=False, iso_q=False):
    """Full-solver parity, fused vs XLA ops, on the SAME device — covers
    the BC and iso paths the golden model above doesn't parameterize."""
    from cytvdn_tpu import denoise3D, denoise4D
    from cytvdn_tpu.config import Backend  # noqa: F401

    ndim = len(shape)
    cube = (rng.standard_normal(shape) * 0.3 + 1.0).astype(np.float32)
    mu = np.linspace(1.0, 2.0, ndim).astype(np.float32)
    fn = denoise3D if ndim == 3 else denoise4D
    kw = dict(iterations=(4, 3), quiet=True)
    if ndim == 4:
        kw.update(isotropic_R=iso_r, isotropic_Q=iso_q)
    if not (iso_r or iso_q):
        kw["BC_mode"] = bc
    import warnings
    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        want = fn(cube, mu, backend="jax", **kw)
        got = fn(cube, mu, backend="pallas", **kw)
    err = float(np.max(np.abs(got[0] - want[0])) / np.max(np.abs(want[0])))
    ok = err < 1e-5
    print(f"{'OK ' if ok else 'FAIL'} vs-ops {shape} bc={bc} "
          f"iso=({iso_r},{iso_q}): recon rel-max {err:.2e}", flush=True)
    return ok, err


def check_pair(shape, iters_f, iters_u, stopping=None, mse=False):
    """Temporally-blocked K=2 kernel vs the K=1 kernel, compiled on the
    same device: full solver runs must agree bit-for-bit on the recon.
    With ``stopping`` set this exercises the stop-aware paired path,
    which must also stop at the identical iteration. With ``mse`` the
    pair kernel's SSE reductions are compared against the K=1 loop's
    XLA reduction (reduction-grouping ulps)."""
    import jax

    from cytvdn_tpu.config import SolverOptions
    from cytvdn_tpu.solver.engine import run_solver

    ndim = len(shape)
    cube = (rng.standard_normal(shape) * 0.3 + 1.0).astype(np.float32)
    ref = (jnp.asarray(
        (rng.standard_normal(shape) * 0.3 + 1.0).astype(np.float32))
        if mse else None)
    mu = np.full(ndim, 1.0, np.float32)
    lam = mu / (32.0 if ndim == 4 else 16.0)
    li = jnp.asarray(1.0 / lam)
    lm = jnp.asarray(lam / mu)
    outs = {}
    for pairs in (False, True):
        opts = SolverOptions(ndim=ndim, iterations_fista=iters_f,
                             iterations_unacc=iters_u,
                             stopping_relative_change=stopping,
                             calculate_mse=mse,
                             temporal_pairs=pairs)
        fn = jax.jit(lambda c, a, b, o=opts: run_solver(c, a, b, o, ref))
        outs[pairs] = {k: np.asarray(v) for k, v in
                       fn(jnp.asarray(cube), li, lm).items()}
    err_r = float(np.max(np.abs(outs[True]["recon"] - outs[False]["recon"])))
    bn_a, bn_b = outs[True]["b_norm"], outs[False]["b_norm"]
    err_t = float(np.max(np.abs(bn_a - bn_b) / np.maximum(np.abs(bn_b), 1)))
    same_stop = (int(outs[True]["iterations_run"])
                 == int(outs[False]["iterations_run"]))
    err_m = 0.0
    if mse:
        ms_a, ms_b = outs[True]["mse"], outs[False]["mse"]
        err_m = float(np.max(np.abs(ms_a - ms_b)
                             / np.maximum(np.abs(ms_b), 1)))
    ok = err_r == 0.0 and err_t < 1e-5 and err_m < 1e-5 and same_stop
    print(f"{'OK ' if ok else 'FAIL'} pair-vs-k1 {shape} "
          f"iters=({iters_f},{iters_u}) stop={stopping} mse={mse}: "
          f"recon max {err_r:.2e} bnorm rel {err_t:.2e} "
          + (f"mse rel {err_m:.2e} " if mse else "")
          + f"iters_run {int(outs[True]['iterations_run'])}"
          f"{'==' if same_stop else '!='}"
          f"{int(outs[False]['iterations_run'])}", flush=True)
    return ok, err_r, err_t, err_m, int(outs[True]["iterations_run"])


def check_kstep(shape, iters_f, iters_u, k, lossy=False):
    """Generalized K-step kernel vs the K=1 kernel, compiled on the same
    device: full solver runs must agree bit-for-bit on the recon (and
    under ``lossy`` the bf16-duals cadence must match K=1's writeback
    rounding bitwise too)."""
    import jax

    from cytvdn_tpu.config import SolverOptions
    from cytvdn_tpu.solver.engine import _resolve_kstep, run_solver

    ndim = len(shape)
    cube = (rng.standard_normal(shape) * 0.3 + 1.0).astype(np.float32)
    mu = np.full(ndim, 1.0, np.float32)
    lam = mu / (32.0 if ndim == 4 else 16.0)
    li = jnp.asarray(1.0 / lam)
    lm = jnp.asarray(lam / mu)
    outs = {}
    for deep in (False, True):
        opts = SolverOptions(ndim=ndim, iterations_fista=iters_f,
                             iterations_unacc=iters_u,
                             temporal_pairs=deep, temporal_k=k,
                             vmem_resident=False, lossy_duals=lossy)
        if deep:
            got_k = _resolve_kstep(opts, shape, jnp.float32, None,
                                   iters_f > 0)
            assert got_k == k, f"kstep gate resolved {got_k}, wanted {k}"
        fn = jax.jit(lambda c, a, b, o=opts: run_solver(c, a, b, o))
        outs[deep] = {q: np.asarray(v) for q, v in
                      fn(jnp.asarray(cube), li, lm).items()}
    err_r = float(np.max(np.abs(outs[True]["recon"]
                                - outs[False]["recon"])))
    bn_a, bn_b = outs[True]["b_norm"], outs[False]["b_norm"]
    err_t = float(np.max(np.abs(bn_a - bn_b)
                         / np.maximum(np.abs(bn_b), 1)))
    ok = err_r == 0.0 and err_t < 1e-5
    print(f"{'OK ' if ok else 'FAIL'} kstep-vs-k1 {shape} k={k} "
          f"iters=({iters_f},{iters_u}) lossy={lossy}: "
          f"recon max {err_r:.2e} bnorm rel {err_t:.2e}", flush=True)
    return ok, err_r, err_t


def check_resident(shape, iters_f, iters_u, stopping=None, bc=2,
                   mse=False, iso_r=False, iso_q=False):
    """VMEM-resident paths vs the plain streaming engine path, compiled
    on the same device: recon must agree bit-for-bit. With ``stopping``
    this exercises the full stop-aware ladder (resident chunks with the
    HBM-DMA state path → pairs → exact K=1 stop), which must stop at the
    identical iteration."""
    import jax

    from cytvdn_tpu.config import SolverOptions
    from cytvdn_tpu.solver.engine import _resolve_resident, \
        _resolve_resident_chunks, run_solver

    ndim = len(shape)
    cube = (rng.standard_normal(shape) * 0.3 + 1.0).astype(np.float32)
    ref = (jnp.asarray(
        (rng.standard_normal(shape) * 0.3 + 1.0).astype(np.float32))
        if mse else None)
    mu = np.full(ndim, 1.0, np.float32)
    lam = mu / (32.0 if ndim == 4 else 16.0)
    li = jnp.asarray(1.0 / lam)
    lm = jnp.asarray(lam / mu)
    outs = {}
    from cytvdn_tpu.config import BCMode
    for res in (False, True):
        opts = SolverOptions(ndim=ndim, iterations_fista=iters_f,
                             iterations_unacc=iters_u, vmem_resident=res,
                             stopping_relative_change=stopping,
                             calculate_mse=mse,
                             isotropic_R=iso_r, isotropic_Q=iso_q,
                             temporal_pairs=res and not (iso_r or iso_q),
                             bc_mode=BCMode(bc))
        if res:
            resolve = (_resolve_resident_chunks if stopping is not None
                       else _resolve_resident)
            assert resolve(opts, shape, jnp.float32, None)[0], \
                "resident gate must accept this config"
        fn = jax.jit(lambda c, a, b, o=opts: run_solver(c, a, b, o, ref))
        outs[res] = {k: np.asarray(v) for k, v in
                     fn(jnp.asarray(cube), li, lm).items()}
    err_r = float(np.max(np.abs(outs[True]["recon"] - outs[False]["recon"])))
    bn_a, bn_b = outs[True]["b_norm"], outs[False]["b_norm"]
    err_t = float(np.max(np.abs(bn_a - bn_b) / np.maximum(np.abs(bn_b), 1)))
    same_stop = (int(outs[True]["iterations_run"])
                 == int(outs[False]["iterations_run"]))
    err_m = 0.0
    if mse:
        ms_a, ms_b = outs[True]["mse"], outs[False]["mse"]
        err_m = float(np.max(np.abs(ms_a - ms_b)
                             / np.maximum(np.abs(ms_b), 1)))
    ok = err_r == 0.0 and err_t < 1e-5 and err_m < 1e-5 and same_stop
    print(f"{'OK ' if ok else 'FAIL'} resident-vs-streaming {shape} "
          f"iters=({iters_f},{iters_u}) stop={stopping} mse={mse}: "
          f"recon max {err_r:.2e} bnorm rel {err_t:.2e} "
          + (f"mse rel {err_m:.2e} " if mse else "")
          + f"iters_run {int(outs[True]['iterations_run'])}"
          f"{'==' if same_stop else '!='}"
          f"{int(outs[False]['iterations_run'])}", flush=True)
    return ok, err_r, err_t, err_m


def check_lossy(shape, n, pairs):
    """Compiled lossy-duals mode vs an on-device ops emulation rounding
    ``d`` to bf16 every iteration — the cadence of EVERY path since the
    pair kernel quantizes iteration-1 duals mid-pair (temporal.py::qd1,
    restoring the chunk/pairing state invariant for lossy runs). Also
    asserts the mode really engaged (drift vs the exact run in the
    measured envelope)."""
    import jax

    from cytvdn_tpu import ops
    from cytvdn_tpu.config import BCMode, SolverOptions
    from cytvdn_tpu.solver.engine import fista_tk_ratios, run_solver

    ndim = len(shape)
    cube = jnp.asarray(
        (rng.standard_normal(shape) * 0.3 + 1.0).astype(np.float32))
    mu = np.full(ndim, 1.0, np.float32)
    lam = mu / (32.0 if ndim == 4 else 16.0)
    li = jnp.asarray(1.0 / lam)
    lm = jnp.asarray(lam / mu)
    outs = {}
    for lossy in (False, True):
        opts = SolverOptions(ndim=ndim, iterations_fista=n,
                             iterations_unacc=0, temporal_pairs=pairs,
                             vmem_resident=False, lossy_duals=lossy)
        fn = jax.jit(lambda c, a, b, o=opts: run_solver(c, a, b, o))
        outs[lossy] = np.asarray(fn(cube, li, lm)["recon"], np.float64)

    # the state invariant on the real chip: lossy pair runs must equal
    # lossy K=1 runs BITWISE (temporal.py::qd1 quantizes iteration-1
    # duals mid-pair; Mosaic must not fold the convert pair)
    pair_eq_k1 = True
    if pairs:
        o1 = SolverOptions(ndim=ndim, iterations_fista=n,
                           iterations_unacc=0, temporal_pairs=False,
                           vmem_resident=False, lossy_duals=True)
        k1 = np.asarray(jax.jit(
            lambda c, a, b: run_solver(c, a, b, o1))(cube, li, lm)["recon"],
            np.float64)
        pair_eq_k1 = bool(np.array_equal(outs[True], k1))

    tks = fista_tk_ratios(n).astype(np.float32)
    every = 1  # per-iteration rounding in every path (pairs included)

    @jax.jit
    def emulate(orig):
        recon = orig
        accs = [jnp.zeros(shape, jnp.float32) for _ in range(ndim)]
        ds = [jnp.zeros(shape, jnp.float32) for _ in range(ndim)]
        for i in range(n):
            accs_n, ds_n = [], []
            for ax in range(ndim):
                b, d, _ = ops.accumulator_update_fista(
                    recon, accs[ax], ds[ax], jnp.float32(tks[i]), ax,
                    li[ax], BCMode.JIA_ZHAO, None)
                accs_n.append(b)
                ds_n.append(d)
            recon, _, _ = ops.datacube_update(
                orig, recon, accs_n, lm, BCMode.JIA_ZHAO, [None] * ndim)
            accs = accs_n
            # NOT astype(bf16).astype(f32): under jit, XLA:TPU's
            # excess-precision rule folds that convert pair to a no-op
            # (verified on-chip), silently making this emulation exact.
            # reduce_precision(8, 7) survives jit and is bit-identical
            # to the eager bf16 cast round-trip.
            ds = ([jax.lax.reduce_precision(d, exponent_bits=8,
                                            mantissa_bits=7)
                   for d in ds_n] if (i + 1) % every == 0 else ds_n)
        return recon

    want = np.asarray(emulate(cube), np.float64)
    scale = float(np.max(np.abs(want)))
    err = float(np.max(np.abs(outs[True] - want))) / scale
    drift = float(np.linalg.norm(outs[True] - outs[False])
                  / np.linalg.norm(outs[False]))
    ok = err < 1e-5 and 1e-6 < drift < 1e-2 and pair_eq_k1
    print(f"{'OK ' if ok else 'FAIL'} lossy-duals {shape} "
          f"{'pairs' if pairs else 'k1'} n={n}: vs-emulation rel-max "
          f"{err:.2e}, drift vs exact {drift:.2e}, pair==k1 bitwise "
          f"{pair_eq_k1}", flush=True)
    return ok, err, drift, pair_eq_k1


if __name__ == "__main__":
    import json

    np.asarray(jnp.ones((8,)))  # tunnel warmup on TPU
    ok = True
    results = {"mode": ON, "golden": [], "vs_ops": [], "pair_vs_k1": [],
               "kstep_vs_k1": [],
               "resident_vs_streaming": [], "lossy_duals": []}
    golden_cases = [
        ((6, 8, 16), True),       # 3D "single" layout
        ((6, 8, 16), False),
        ((6, 256, 512), True),    # 3D "flat" layout (E folded to 128)
        ((5, 6, 8, 16), True),
        ((5, 6, 8, 16), False),
    ]
    if ON == "tpu":
        golden_cases += [
            ((64, 64, 512), True),
            ((32, 32, 64, 64), True),
            ((32, 32, 64, 64), False),
        ]
    for shape, fista in golden_cases:
        good, rec = check(shape, fista)
        ok &= good
        results["golden"].append(rec)
    if ON == "tpu":
        # compiled-on-TPU sweep of the BC/iso/permutation paths
        sweep = [
            ((24, 24, 16, 24), 0, False, False),
            ((24, 24, 16, 24), 1, False, False),
            ((24, 24, 16, 24), 2, False, False),   # lane-hostile: permuted
            ((24, 24, 16, 24), 2, True, False),
            ((24, 24, 16, 24), 2, False, True),
            ((24, 24, 16, 24), 2, True, True),
            ((16, 16, 512), 0, False, False),
            ((16, 16, 512), 1, False, False),
        ]
        for shape, bc, ir, iq in sweep:
            good, err = check_vs_ops(shape, bc, ir, iq)
            ok &= good
            results["vs_ops"].append({
                "shape": list(shape), "bc": bc, "iso_r": ir, "iso_q": iq,
                "recon_rel_max_vs_ops": err, "ok": good,
            })
        # compiled K=2 temporal pairs vs K=1, incl. odd/hybrid schedules,
        # the lane-hostile permuted path, and the stop-aware paired path
        # (stopping set: guard + K=1 finisher must stop at the identical
        # iteration with a bit-identical recon)
        for shape, itf, itu, stop, mse in [
            ((32, 32, 64, 64), 5, 0, None, False),
            ((24, 24, 16, 24), 4, 3, None, False),
            ((64, 64, 512), 0, 6, None, False),
            ((32, 32, 64, 64), 40, 0, 0.0005, False),
            ((32, 32, 64, 64), 6, 0, None, True),   # SSE reductions
        ]:
            good, er, et, em, itr = check_pair(shape, itf, itu, stop, mse)
            ok &= good
            results["pair_vs_k1"].append({
                "shape": list(shape), "iters": [itf, itu],
                "stopping": stop, "mse": mse, "iterations_run": itr,
                "recon_max_abs_diff": er, "bnorm_rel_diff": et,
                "mse_rel_diff": em, "ok": good,
            })
        # compiled generalized K-step kernel (K >= 3 iterations per HBM
        # pass, single-strip layouts) vs K=1 — incl. remainder mixes,
        # hybrid schedules, unaccelerated, and the lossy-duals cadence
        for shape, itf, itu, kk, lossy in [
            ((64, 64, 512), 9, 0, 3, False),     # K=3 x3
            ((64, 64, 512), 11, 0, 4, False),    # K=4 x2 + pair + K=1
            ((64, 64, 512), 0, 13, 6, False),    # unacc, K=6 x2 + mix
            ((64, 64, 512), 17, 0, 8, False),    # K=8 x2 + mix
            ((64, 64, 512), 9, 0, 3, True),      # lossy cadence
        ]:
            good, er, et = check_kstep(shape, itf, itu, kk, lossy)
            ok &= good
            results["kstep_vs_k1"].append({
                "shape": list(shape), "iters": [itf, itu], "k": kk,
                "lossy": lossy, "recon_max_abs_diff": er,
                "bnorm_rel_diff": et, "ok": good,
            })
        # compiled VMEM-resident whole-run kernel vs the streaming path
        # (incl. the BASELINE cfg1 shape — its raison d'être), plus the
        # stop-aware resident-chunk ladder (HBM-DMA state path)
        for shape, itf, itu, stop, bc, mse, iso in [
            ((64, 64, 512), 0, 8, None, 2, False, (False, False)),
            ((64, 64, 512), 8, 0, None, 2, False, (False, False)),
            ((16, 16, 24, 24), 4, 3, None, 2, False, (False, False)),
            ((64, 64, 512), 0, 120, 1e-3, 2, False, (False, False)),
            # periodic, then corrected mirror
            ((64, 64, 512), 6, 0, None, 0, False, (False, False)),
            ((64, 64, 512), 6, 0, None, 1, False, (False, False)),
            # SSE reductions (unacc: the FISTA state + ref window would
            # exceed the VMEM cap at this shape — the gate rejects it)
            ((64, 64, 512), 0, 6, None, 2, True, (False, False)),
            # half-isotropic pairs (joint L2 projection in-kernel)
            ((16, 16, 24, 24), 4, 2, None, 2, False, (True, True)),
        ]:
            good, er, et, em = check_resident(shape, itf, itu, stop, bc,
                                              mse, iso_r=iso[0],
                                              iso_q=iso[1])
            ok &= good
            results["resident_vs_streaming"].append({
                "shape": list(shape), "iters": [itf, itu],
                "stopping": stop, "bc": bc, "mse": mse,
                "iso": list(iso),
                "recon_max_abs_diff": er, "bnorm_rel_diff": et,
                "mse_rel_diff": em, "ok": good,
            })
        # compiled lossy-duals mode (bf16 HBM duals, f32 compute) vs an
        # on-device ops emulation at the kernels' writeback cadences
        for shape, n, pairs in [
            ((32, 32, 64, 64), 6, True),
            ((32, 32, 64, 64), 5, False),
            ((64, 64, 512), 6, True),
        ]:
            good, err, drift, peq = check_lossy(shape, n, pairs)
            ok &= good
            results["lossy_duals"].append({
                "shape": list(shape), "n": n, "pairs": pairs,
                "rel_max_vs_emulation": err,
                "drift_rel_l2_vs_exact": drift,
                "pair_eq_k1_bitwise": peq, "ok": good,
            })
        results["all_ok"] = bool(ok)
        out = os.path.join(os.path.dirname(_HERE), "TPU_FUSED_PARITY.json")
        with open(out, "w") as f:
            json.dump(results, f, indent=2)
        print(f"artifact written to {out}")
    sys.exit(0 if ok else 1)
