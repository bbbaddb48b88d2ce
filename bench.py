"""Benchmark harness: voxel-update throughput of the flagship 4D FISTA
solver on one TPU chip.

Prints ONE JSON line: {"metric": ..., "value": N, "unit": ...,
"vs_baseline": N}. The metric is voxel-updates/sec (one voxel-update = one
voxel through one full TV iteration: all four per-axis dual updates + the
reconstruction update), per BASELINE.json.

Methodology notes:
- Data is generated on device (host<->device moves through the axon tunnel
  are slow and would pollute the measurement).
- Completion is observed by fetching the small delta trace (the tunnel's
  ``block_until_ready`` does not reliably block; a fetch does), after a
  warmup fetch that absorbs the tunnel's one-time ~90 s channel setup.
- Baseline: the reference's Cython/OpenMP kernels at 64 threads. The bench
  host has one CPU core, so BASELINE_MEASURED.json records a single-thread
  measurement of the reference semantics (native csrc/ port) and the
  baseline is that number scaled by 64 — an *upper bound* on the real
  64-thread reference (memory-bandwidth-bound workloads scale sublinearly),
  making ``vs_baseline`` conservative.
"""

import json
import os
import sys
import time

import numpy as np

# Flagship target is 256^2 x 128^2 (BASELINE.json configs[4]), whose FISTA
# state (10 cube-size arrays ~= 43 GB) exceeds one v5e's 16 GB HBM
# (SURVEY.md §7 hard part 2) — that config is the multi-chip bench. The
# single-chip bench uses the largest FISTA 4D cube that fits.
CONFIGS = [
    (256, 256, 72, 72),
    (128, 128, 128, 128),
    (128, 128, 64, 64),
    (64, 64, 64, 64),
    (16, 16, 24, 24),  # CPU-safe fallback
]
# 25 iterations amortizes fixed dispatch/tunnel costs the way production
# runs do (the reference's Cori job runs 40, cori_MPI_example.sh:21-27)
ITERS = 25


def _measure(shape, iters, fista=True):
    import jax
    import jax.numpy as jnp

    from cytvdn_tpu.config import SolverOptions
    from cytvdn_tpu.solver.engine import run_solver

    ndim = len(shape)
    mu = np.full(ndim, 1.0, dtype=np.float32)
    lam = mu / (32.0 if ndim == 4 else 16.0)
    opts = SolverOptions(
        ndim=ndim,
        iterations_fista=iters if fista else 0,
        iterations_unacc=0 if fista else iters,
    )
    li = jnp.asarray((1.0 / lam).astype(np.float32))
    lm = jnp.asarray((lam / mu).astype(np.float32))

    cube = jax.jit(
        lambda key: jax.random.normal(key, shape, jnp.float32) * 0.3 + 1.0
    )(jax.random.key(0))

    fn = jax.jit(lambda c, a, b: run_solver(c, a, b, opts)["delta"])
    # compile + first run (also absorbs any remaining channel setup)
    d = np.asarray(fn(cube, li, lm))
    if not np.all(np.isfinite(d)):
        raise RuntimeError("non-finite delta")
    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        np.asarray(fn(cube, li, lm))
        times.append(time.perf_counter() - t0)
    dt = min(times)
    return int(np.prod(shape)) * iters / dt


# BASELINE.json's five configs (config 5, the 512²×256² v5e-16 mesh run,
# needs 16 chips — reported as unavailable on a single-chip bench host;
# config 4 at full 256²×128² exceeds one v5e's HBM, so the largest fitting
# cube stands in, with the full-size entry marked oom)
FULL_CONFIGS = [
    ("cfg1_3d_unacc_64x64x512", (64, 64, 512), False),
    ("cfg2_3d_fista_256x256x2048", (256, 256, 2048), True),
    ("cfg3_4d_unacc_128x128x64x64", (128, 128, 64, 64), False),
    ("cfg4_4d_fista_256x256x128x128", (256, 256, 128, 128), True),
    ("cfg4_proxy_4d_fista_128x128x128x128", (128, 128, 128, 128), True),
]


def run_full():
    detail = {}
    for name, shape, fista in FULL_CONFIGS:
        try:
            v = _measure(shape, ITERS, fista)
            detail[name] = {"voxel_updates_per_sec": round(v, 1),
                            "shape": list(shape), "fista": fista}
            print(f"# {name}: {v/1e9:.2f} Gvox-upd/s", file=sys.stderr)
        except Exception as e:
            detail[name] = {"error": type(e).__name__}
            print(f"# {name}: {type(e).__name__}", file=sys.stderr)
    out = os.path.join(os.path.dirname(__file__), "BENCH_DETAIL.json")
    with open(out, "w") as f:
        json.dump(detail, f, indent=2)
    print(f"# detail written to {out}", file=sys.stderr)


def main():
    import jax

    np.asarray(jax.numpy.ones((8,)))  # tunnel warmup fetch

    if "--full" in sys.argv:
        run_full()

    value, used = None, None
    for shape in CONFIGS:
        try:
            value = _measure(shape, ITERS)
            used = shape
            break
        except Exception as e:  # OOM etc. — try the next size down
            print(f"# config {shape} failed: {type(e).__name__}",
                  file=sys.stderr)
    if value is None:
        print(json.dumps({"metric": "voxel_updates_per_sec_4d_fista",
                          "value": 0, "unit": "voxel-updates/s",
                          "vs_baseline": 0}))
        return

    baseline = None
    # prefer the ACTUAL reference build's measured single-thread throughput
    # (tools/reference_parity.py builds the real cyTVDN Cython kernels);
    # fall back to the C++ proxy measurement
    ref_path = os.path.join(os.path.dirname(__file__),
                            "REFERENCE_PARITY.json")
    if os.path.exists(ref_path):
        with open(ref_path) as f:
            rp = json.load(f)
        st = rp.get("reference_measured", {}).get(
            "vox_updates_per_sec_1thread_4d_fista_48x48x48x48")
        if st:
            baseline = st * 64.0  # conservative linear 64-thread bound
    path = os.path.join(os.path.dirname(__file__), "BASELINE_MEASURED.json")
    if baseline is None and os.path.exists(path):
        with open(path) as f:
            measured = json.load(f)
        st = measured.get("reference_voxel_updates_per_sec_1thread")
        if st:
            baseline = st * 64.0
    if baseline is None:
        baseline = 64e6  # placeholder

    print(json.dumps({
        "metric": f"voxel_updates_per_sec_4d_fista_{'x'.join(map(str, used))}",
        "value": round(value, 1),
        "unit": "voxel-updates/s",
        "vs_baseline": round(value / baseline, 3),
    }))


if __name__ == "__main__":
    main()
