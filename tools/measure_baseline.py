"""Measure the reference-equivalent native CPU kernels' throughput and
record BASELINE_MEASURED.json.

The reference publishes no benchmark numbers (BASELINE.md); its Cython
kernels cannot be built here (no Cython; the checked-in Cython-0.29 C does
not compile on Python 3.12). The native csrc/ kernels have the same memory
traffic structure (single read-modify-write traversal per kernel call,
OpenMP outer loops), so their throughput on this host is the proxy for the
reference's. Run with OMP_NUM_THREADS=1 on the single-core bench host; the
64-thread baseline used by bench.py is this number × 64 — an upper bound
on real 64-thread scaling for a memory-bandwidth-bound workload, making
the reported speedups conservative.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from cytvdn_tpu.config import SolverOptions
from cytvdn_tpu.cpp.backend import native_num_threads, solve_cpp


def measure(shape, fista, iters=4):
    ndim = len(shape)
    rng = np.random.default_rng(0)
    cube = (rng.standard_normal(shape) * 0.3 + 1.0).astype(np.float32)
    mu = np.full(ndim, 1.0, dtype=np.float32)
    lam = mu / 32.0
    opts = SolverOptions(
        ndim=ndim,
        iterations_fista=iters if fista else 0,
        iterations_unacc=0 if fista else iters,
    )
    li = (1.0 / lam).astype(np.float32)
    lm = (lam / mu).astype(np.float32)
    solve_cpp(cube, li, lm, opts)  # warm
    t0 = time.perf_counter()
    solve_cpp(cube, li, lm, opts)
    dt = time.perf_counter() - t0
    return int(np.prod(shape)) * iters / dt


def main():
    threads = native_num_threads()
    shape4 = (64, 64, 64, 64)
    fista = measure(shape4, True)
    unacc = measure(shape4, False)
    shape3 = (64, 64, 512)
    fista3 = measure(shape3, True)
    out = {
        "host_threads": threads,
        "omp_num_threads": os.environ.get("OMP_NUM_THREADS", "unset"),
        "config_4d": list(shape4),
        "reference_voxel_updates_per_sec_1thread": round(fista, 1),
        "reference_voxel_updates_per_sec_1thread_unaccelerated":
            round(unacc, 1),
        "reference_voxel_updates_per_sec_1thread_3d_fista": round(fista3, 1),
        "note": (
            "native C++/OpenMP reimplementation of the reference kernels "
            "(same traffic structure as cyTVDN's Cython/OpenMP), measured "
            "single-thread; bench.py scales by 64 as a conservative upper "
            "bound for the 64-thread reference"
        ),
    }
    path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "BASELINE_MEASURED.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=2)
    print(json.dumps(out, indent=2))


if __name__ == "__main__":
    main()
