"""Sweep the K=2 pair kernel's strip width (b1) on the 4D flagship shape.

Round-4 profiling (PROFILE_KERNELS.json) showed the 4D pair kernel at
586 GB/s of counter-verified HBM traffic while its 3D sibling reaches
694 on the same chip. The structural difference is strip count: the 4D
work shape (256, 72, 72, 256) carries a 37.7 MB seam-column double
buffer (2 x N0 x tail) in VMEM, which squeezes the budget model to
b1=12 -> 6 strips, while 3D runs b1=128 -> 2 strips. Seam overhead
scales ~1/b1 (pre-gathered operand columns are ~15 column sets of
cube/B1 bytes each, plus the boundary recompute VPU work), so fewer,
wider strips should close the gap IF Mosaic's true VMEM accounting
accepts them — the ~82-buffer model is deliberately conservative.

This tool measures, on the real chip, wall time per iteration of the
pair solver at the model's pick and at wider strips (fewer buffers
assumed), reporting effective GB/s against the same byte model the
profiler uses. Writes SWEEP_PAIR4D.json at the repo root. TPU only.
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp

    from cytvdn_tpu.config import SolverOptions
    from cytvdn_tpu.kernels import temporal
    from cytvdn_tpu.solver.engine import run_solver
    from cytvdn_tpu.utils.perf import traversals_per_iteration

    if jax.default_backend() not in ("tpu", "axon"):
        print("sweep_pair4d: needs the real TPU", file=sys.stderr)
        return 1

    shape = (256, 256, 72, 72)
    iters = 25
    ndim = 4
    mu = np.full(ndim, 1.0, np.float32)
    lam = mu / 32.0
    li = jnp.asarray((1.0 / lam).astype(np.float32))
    lm = jnp.asarray((lam / mu).astype(np.float32))
    opts = SolverOptions(ndim=ndim, iterations_fista=iters,
                         iterations_unacc=0, vmem_resident=False)
    cube = jax.jit(
        lambda k: jax.random.normal(k, shape, jnp.float32) * 0.3 + 1.0
    )(jax.random.key(0))

    trav = traversals_per_iteration(ndim, True, "pair")
    model_bytes = trav * 4 * int(np.prod(shape))

    # buffer-count hypotheses -> b1 on the (256,72,72,256) work shape:
    # 82 (the shipped model) -> 12; 61 -> 18; 46 -> 24; 30 -> 36
    results = {"shape": list(shape), "iterations": iters,
               "model_bytes_per_iter": model_bytes, "rows": []}
    golden = None
    for bufs in (82, 61, 46, 30):
        temporal._PAIR_BUFFERS = bufs
        plan = temporal.pair_plan((256, 72, 72, 256), 4)
        b1 = plan[3] if plan else None
        row = {"pair_buffers": bufs, "b1": b1}
        if b1 is None:
            row["error"] = "no plan"
            results["rows"].append(row)
            continue
        try:
            jax.clear_caches()

            def solve(c):
                r = run_solver(c, li, lm, opts)["recon"]
                # exact bitwise fingerprint, fetched as 1 scalar (the
                # full cube would cost 20+ s over the dev tunnel): sum
                # of the int32 bit patterns with wraparound is invariant
                # iff every bit pattern multiset matches; recon is
                # deterministic per plan, so equal hash == equal array
                # for all practical purposes (pair bit-identity proper
                # is asserted by TPU_FUSED_PARITY.json)
                bits = jax.lax.bitcast_convert_type(r, jnp.int32)
                return jnp.sum(bits.astype(jnp.uint32)
                               ).astype(jnp.uint32)

            fn = jax.jit(solve)
            t0 = time.time()
            h = int(np.asarray(fn(cube)))   # compile + run + tiny fetch
            row["compile_plus_first_s"] = round(time.time() - t0, 1)
            times = []
            for _ in range(3):
                t0 = time.time()
                h = int(np.asarray(fn(cube)))
                times.append(time.time() - t0)
            best = min(times)
            row["best_wall_s"] = round(best, 3)
            row["wall_gb_per_s"] = round(
                model_bytes * iters / best / 1e9, 1)
            row["vox_updates_per_sec"] = round(
                int(np.prod(shape)) * iters / best, 0)
            row["bits_hash"] = h
            if golden is None:
                golden = h
                row["hash_eq_b1_12"] = True
            else:
                row["hash_eq_b1_12"] = bool(h == golden)
        except Exception as e:
            row["error"] = f"{type(e).__name__}: {str(e)[:300]}"
        results["rows"].append(row)
        print(json.dumps(row), file=sys.stderr, flush=True)
    temporal._PAIR_BUFFERS = 82

    out_path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "SWEEP_PAIR4D.json")
    with open(out_path, "w") as f:
        json.dump(results, f, indent=1)
    print(json.dumps(results))
    return 0


if __name__ == "__main__":
    sys.exit(main())
