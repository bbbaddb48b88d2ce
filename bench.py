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
ITERS = 10


def _measure(shape, iters):
    import jax
    import jax.numpy as jnp

    from cytvdn_tpu.config import SolverOptions
    from cytvdn_tpu.solver.engine import run_solver

    mu = np.full(4, 1.0, dtype=np.float32)
    lam = mu / 32.0
    opts = SolverOptions(ndim=4, iterations_fista=iters, iterations_unacc=0)
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


def main():
    import jax

    np.asarray(jax.numpy.ones((8,)))  # tunnel warmup fetch

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
    path = os.path.join(os.path.dirname(__file__), "BASELINE_MEASURED.json")
    if os.path.exists(path):
        with open(path) as f:
            measured = json.load(f)
        st = measured.get("reference_voxel_updates_per_sec_1thread")
        if st:
            baseline = st * 64.0  # conservative 64-thread upper bound
    if baseline is None:
        baseline = 64e6  # placeholder until BASELINE_MEASURED.json lands

    print(json.dumps({
        "metric": f"voxel_updates_per_sec_4d_fista_{'x'.join(map(str, used))}",
        "value": round(value, 1),
        "unit": "voxel-updates/s",
        "vs_baseline": round(value / baseline, 3),
    }))


if __name__ == "__main__":
    main()
