"""Sweep the K-step kernel's staircase depth on the 3D benchmark
geometry (256, 256, 2048) — work shape (2048, 256, 256), single strip.

Measures wall time of 24 iterations (divisible by every K) through
chained kernel calls at K in {2 (pair baseline), 3, 4, 6, 8, 10, 12},
recording effective rate and a bitwise recon fingerprint: every K must
produce the IDENTICAL bit pattern (the kernels are bit-exact vs K=1 by
construction; the hash equality re-proves it compiled-on-chip).

Writes SWEEP_KSTEP.json at the repo root. TPU only.
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
    from jax import lax

    from cytvdn_tpu.kernels import kstep as KS
    from cytvdn_tpu.kernels import temporal as T
    from cytvdn_tpu.solver.engine import fista_tk_ratios

    if jax.default_backend() not in ("tpu", "axon"):
        print("sweep_kstep: needs the real TPU", file=sys.stderr)
        return 1

    shape = (2048, 256, 256)   # cfg2's work orientation
    iters = 24
    ndim = 3
    mu = np.full(ndim, 1.0, np.float32)
    lam = mu / 16.0
    li = jnp.asarray((1.0 / lam).astype(np.float32))
    lm = jnp.asarray((lam / mu).astype(np.float32))
    tks = jnp.asarray(fista_tk_ratios(iters).astype(np.float32))

    state_bytes = 4 * int(np.prod(shape))
    results = {"shape": list(shape), "iterations": iters, "fista": True,
               "cube_bytes": state_bytes, "rows": []}

    def make_fn(k):
        # NOTE: each depth runs k * (iters // k) iterations — compare
        # hashes only among depths with equal totals (all listed
        # candidates divide 24)
        if k == 2:
            def run(orig, recon, accs, ds):
                def body(i, st):
                    r, a, d = st
                    out = T.fused_pair_iteration(
                        orig, r, a, d, tks[2 * i], tks[2 * i + 1],
                        li, lm, fista=True, interpret=False)
                    return out[0], out[1], out[2]
                r, a, d = lax.fori_loop(0, iters // 2, body,
                                        (recon, accs, ds))
                bits = lax.bitcast_convert_type(r, jnp.int32)
                return jnp.sum(bits.astype(jnp.uint32)).astype(jnp.uint32)
        else:
            def run(orig, recon, accs, ds):
                def body(i, st):
                    r, a, d = st
                    rhos = lax.dynamic_slice(tks, (i * k,), (k,))
                    out = KS.fused_kstep_iteration(
                        orig, r, a, d, rhos, li, lm, k=k, fista=True,
                        interpret=False)
                    return out[0], out[1], out[2]
                r, a, d = lax.fori_loop(0, iters // k, body,
                                        (recon, accs, ds))
                bits = lax.bitcast_convert_type(r, jnp.int32)
                return jnp.sum(bits.astype(jnp.uint32)).astype(jnp.uint32)
        return jax.jit(run)

    golden = None
    for k in (2, 3, 4, 6, 8, 12):
        row = {"k": k}
        if k > 2:
            plan = KS.kstep_plan(shape, 4, k, True)
            row["plan_ok"] = plan is not None
            row["buffers_model"] = KS.kstep_buffers(k, ndim, True)
            if plan is None:
                results["rows"].append(row)
                print(json.dumps(row), file=sys.stderr, flush=True)
                continue
        try:
            jax.clear_caches()
            orig = jax.jit(
                lambda key: jax.random.normal(key, shape, jnp.float32)
                * 0.3 + 1.0
            )(jax.random.key(0))
            accs = tuple(jnp.zeros(shape, jnp.float32)
                         for _ in range(ndim))
            ds = tuple(jnp.zeros(shape, jnp.float32)
                       for _ in range(ndim))
            fn = make_fn(k)
            t0 = time.time()
            h = int(np.asarray(fn(orig, orig, accs, ds)))
            row["compile_plus_first_s"] = round(time.time() - t0, 1)
            times = []
            for _ in range(3):
                t0 = time.time()
                h = int(np.asarray(fn(orig, orig, accs, ds)))
                times.append(time.time() - t0)
            best = min(times)
            ran = k * (iters // k)
            row["best_wall_s"] = round(best, 3)
            row["iterations_ran"] = ran
            row["vox_updates_per_sec"] = round(
                int(np.prod(shape)) * ran / best, 0)
            # traffic model: (4n+3)/k traversals/iter for FISTA
            trav = (4 * ndim + 3) / k
            row["model_gb_per_s"] = round(
                trav * state_bytes * ran / best / 1e9, 1)
            row["bits_hash"] = h
            if golden is None:
                golden = h
                row["hash_eq_k2"] = True
            else:
                row["hash_eq_k2"] = bool(h == golden)
        except Exception as e:
            row["error"] = f"{type(e).__name__}: {str(e)[:300]}"
        results["rows"].append(row)
        print(json.dumps(row), file=sys.stderr, flush=True)

    out_path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "SWEEP_KSTEP.json")
    with open(out_path, "w") as f:
        json.dump(results, f, indent=1)
    print(json.dumps(results))
    return 0


if __name__ == "__main__":
    sys.exit(main())
