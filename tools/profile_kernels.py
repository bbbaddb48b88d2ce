"""Counter-verify the kernel bandwidth claims with jax.profiler traces.

DESIGN.md §6 derives "achieved GB/s" from wall-clock and the traffic
model; VERDICT r3 item 6 asks for trace-derived numbers next to them.
This tool runs each kernel tier on the real chip under
``jax.profiler.trace``, reads the device plane back with
``jax.profiler.ProfileData``, sums the per-op device durations, and
records achieved HBM GB/s = model bytes / DEVICE time (not host wall)
for:

- K=1 fused streaming kernel (cfg2 geometry, 3D FISTA),
- K=2 pair kernel (same geometry; and the 4D cfg4-proxy geometry),
- VMEM-resident whole-run kernel (cfg1 geometry, 3D unaccelerated).

Writes PROFILE_KERNELS.json at the repo root. TPU only (the trace's
device plane is what distinguishes kernel time from dispatch/tunnel
overhead that wall-clock timing includes).
"""

import glob
import json
import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def _device_events(trace_dir):
    """Aggregate device-plane events: {name: total_duration_ns}."""
    import jax

    files = glob.glob(trace_dir + "/**/*.xplane.pb", recursive=True)
    if not files:
        raise RuntimeError(f"no xplane.pb under {trace_dir}")
    pd = jax.profiler.ProfileData.from_file(files[0])
    agg = {}
    planes = []
    for plane in pd.planes:
        planes.append(plane.name)
        if "TPU" not in plane.name and "device" not in plane.name.lower():
            continue
        for line in plane.lines:
            for e in line.events:
                if e.name.startswith("end:"):
                    continue
                agg[e.name] = agg.get(e.name, 0.0) + float(e.duration_ns)
    return agg, planes


def _profile(fn_iter, n_reps, fetch):
    """Run ``fn_iter`` ``n_reps`` times under a trace; return aggregated
    device events."""
    import jax

    d = tempfile.mkdtemp(prefix="cytv_prof_")
    fetch(fn_iter())  # compile + settle outside the trace
    with jax.profiler.trace(d):
        out = None
        for _ in range(n_reps):
            out = fn_iter()
        fetch(out)
    return _device_events(d)


def _topk(agg, k=6):
    return sorted(agg.items(), key=lambda kv: -kv[1])[:k]


def _bandwidth(model_bytes_per_iter, n_iters, device_ns):
    return model_bytes_per_iter * n_iters / (device_ns / 1e9) / 1e9


def main():
    import jax
    import jax.numpy as jnp

    from cytvdn_tpu.config import SolverOptions
    from cytvdn_tpu.solver.engine import run_solver
    from cytvdn_tpu.utils.perf import traversals_per_iteration

    if jax.default_backend() not in ("tpu", "axon"):
        print("profile_kernels: needs the real TPU", file=sys.stderr)
        return 1

    results = {}

    def run_case(name, shape, fista, backend_knobs, model_backend,
                 iters=25, reps=2, bf16_dual_traversals=0.0):
        """``bf16_dual_traversals``: cube traversals per iteration that
        move 2-byte (bf16) elements instead of 4-byte — the lossy-duals
        rows must shrink the byte model accordingly or their 'achieved
        GB/s' overstates the kernel (possibly above the roofline)."""
        ndim = len(shape)
        mu = np.full(ndim, 1.0, np.float32)
        lam = mu / (32.0 if ndim == 4 else 16.0)
        li = jnp.asarray((1.0 / lam).astype(np.float32))
        lm = jnp.asarray((lam / mu).astype(np.float32))
        opts = SolverOptions(
            ndim=ndim,
            iterations_fista=iters if fista else 0,
            iterations_unacc=0 if fista else iters,
            **backend_knobs,
        )
        cube = jax.jit(
            lambda k: jax.random.normal(k, shape, jnp.float32) * 0.3 + 1.0
        )(jax.random.key(0))
        fn = jax.jit(lambda c: run_solver(c, li, lm, opts)["delta"])
        agg, planes = _profile(lambda: fn(cube),
                               n_reps=reps,
                               fetch=lambda o: np.asarray(o))
        trav = traversals_per_iteration(ndim, fista, model_backend)
        model_bytes = int(
            (trav * 4 - bf16_dual_traversals * 2) * np.prod(shape))
        total_ns = sum(agg.values())
        top = _topk(agg)
        # the kernel dominates; take ops >=1% of device time as "kernel
        # + fused glue", and the single top op as the kernel proper
        kernel_ns = top[0][1] if top else 0.0
        sig_ns = sum(v for _, v in agg.items() if v >= 0.01 * total_ns)
        results[name] = {
            "shape": list(shape),
            "fista": fista,
            "iterations_per_run": iters,
            "runs_traced": reps,
            "model_backend": model_backend,
            "model_bytes_per_iter": model_bytes,
            "device_total_ns": total_ns,
            "device_top_op_ns": kernel_ns,
            "device_significant_ns": sig_ns,
            "achieved_gb_per_s_vs_total": round(
                _bandwidth(model_bytes, iters * reps, total_ns), 1)
            if total_ns else None,
            "achieved_gb_per_s_vs_top_op": round(
                _bandwidth(model_bytes, iters * reps, kernel_ns), 1)
            if kernel_ns else None,
            "top_ops": [{"name": n[:120], "ns": v} for n, v in top],
            "planes_seen": planes,
        }
        print(f"# {name}: total {total_ns/1e6:.1f} ms device, "
              f"top {top[0][0][:50] if top else '-'}", file=sys.stderr)

    # K=1 fused streaming (pairs off)
    run_case("k1_fused_3d_fista_256x256x2048", (256, 256, 2048), True,
             dict(temporal_pairs=False, vmem_resident=False), "fused")
    # K=2 pair kernel, 3D + the 4D flagship proxy
    run_case("pair_3d_fista_256x256x2048", (256, 256, 2048), True,
             dict(vmem_resident=False), "pair")
    run_case("pair_4d_fista_256x256x72x72", (256, 256, 72, 72), True,
             dict(vmem_resident=False), "pair")
    # lossy-duals pair variant (should show ~19% less device time/iter);
    # the d arrays contribute n=4 of the model's traversals per
    # iteration (read+write per pass / 2 iters per pass) at 2 B
    run_case("pair_4d_fista_lossy_256x256x72x72", (256, 256, 72, 72),
             True, dict(vmem_resident=False, lossy_duals=True), "pair",
             bf16_dual_traversals=4.0)
    # VMEM-resident whole-run kernel (model bytes/iter is tiny by design;
    # record device time/iter instead of a bandwidth)
    run_case("resident_3d_unacc_64x64x512_7500it", (64, 64, 512), False,
             dict(), "fused", iters=7500, reps=1)
    r = results["resident_3d_unacc_64x64x512_7500it"]
    r["device_us_per_iter_top_op"] = round(
        r["device_top_op_ns"] / 7500 / 1e3, 2) if r["device_top_op_ns"] \
        else None
    r["note"] = ("VMEM-resident: HBM traffic is O(1/T) so bandwidth is "
                 "not the metric — device µs/iteration is (claimed "
                 "~15.6 µs VPU-bound, STATUS round 3)")

    path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "PROFILE_KERNELS.json")
    with open(path, "w") as f:
        json.dump(results, f, indent=2)
    print(f"# written {path}", file=sys.stderr)
    return 0


if __name__ == "__main__":
    sys.exit(main())
