"""Measure the out-of-core sweep's transfer/compute overlap on-chip.

The cfg4 north-star cube (256^2 x 128^2, 43 GB FISTA state) cannot fit
one v5e's HBM, so bench.py measures its device leg separately and
PROJECTS a PCIe4-host rate. Round-4 VERDICT item 5: that projection
assumed perfect transfer/compute overlap (``max(compute, transfer)``)
without a measurement. This tool runs a REAL out-of-core temporal sweep
on the chip under ``jax.profiler.trace``, reads back the device-compute
plane (``/device:TPU:0``) and the transfer plane (``#Chip0 Host
Interface``), and computes

    overlap_fraction = |compute spans ∩ transfer spans| / |compute spans|

i.e. the fraction of device-compute time during which a host-interface
transfer was simultaneously in flight. The OOC engine's pipeline
(solver/outofcore.py:15-22: device_put slab i+1 / compute slab i /
fetch slab i-1 ride JAX async dispatch) claims the compute leg hides
inside transfers on any transfer-bound host; this measures it. On this
dev host the tunnel is ~3 orders slower than PCIe, which only makes the
test SHARPER: compute windows are tiny targets inside huge transfer
spans, and they still only overlap if dispatch truly runs them
concurrently with the in-flight copies.

Writes OVERLAP_OOC.json; bench.py's cfg4 projection consumes the
fraction (``measured_overlap_fraction``) instead of assuming 1.0.
TPU only.
"""

import glob
import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import numpy as np


def _spans(trace_dir):
    """(compute_spans, transfer_spans) as [(start_ns, end_ns)] lists."""
    import jax

    files = glob.glob(trace_dir + "/**/*.xplane.pb", recursive=True)
    if not files:
        raise RuntimeError(f"no xplane.pb under {trace_dir}")
    pd = jax.profiler.ProfileData.from_file(files[0])
    compute, transfer, planes = [], [], []
    for plane in pd.planes:
        planes.append(plane.name)
        is_xfer = "Host Interface" in plane.name
        is_dev = ("TPU" in plane.name and "device" in plane.name.lower())
        if not (is_xfer or is_dev):
            continue
        for line in plane.lines:
            for e in line.events:
                if e.name.startswith("end:"):
                    continue
                span = (float(e.start_ns), float(e.end_ns))
                if span[1] <= span[0]:
                    continue
                (transfer if is_xfer else compute).append(span)
    return compute, transfer, planes


def _union(spans):
    """Total length of the union of [start, end) spans."""
    total = 0.0
    last_end = -np.inf
    for s, e in sorted(spans):
        if s > last_end:
            total += e - s
            last_end = e
        elif e > last_end:
            total += e - last_end
            last_end = e
    return total


def _merged(spans):
    out = []
    for s, e in sorted(spans):
        if out and s <= out[-1][1]:
            out[-1][1] = max(out[-1][1], e)
        else:
            out.append([s, e])
    return out


def _intersection(a, b):
    """Union-length of the pairwise intersection of two span sets."""
    a, b = _merged(a), _merged(b)
    i = j = 0
    total = 0.0
    while i < len(a) and j < len(b):
        s = max(a[i][0], b[j][0])
        e = min(a[i][1], b[j][1])
        if e > s:
            total += e - s
        if a[i][1] < b[j][1]:
            i += 1
        else:
            j += 1
    return total


def main():
    import jax

    from cytvdn_tpu.config import SolverOptions
    from cytvdn_tpu.solver.outofcore import solve_outofcore_temporal

    if jax.default_backend() not in ("tpu", "axon"):
        print("measure_overlap: needs the real TPU", file=sys.stderr)
        return 1

    # Small enough that one sweep's transfers stay bearable over the dev
    # tunnel (~10 arrays x 64 MB), real enough that every pipeline stage
    # (put / compute / fetch) runs many times: 8 slabs, K=2.
    shape = (64, 64, 64, 64)
    temporal_k = 2
    n_slabs = 8
    ndim = len(shape)
    mu = np.full(ndim, 1.0, np.float32)
    lam = mu / 32.0
    rng = np.random.default_rng(0)
    cube = (rng.standard_normal(shape).astype(np.float32) * 0.3 + 1.0)
    opts = SolverOptions(ndim=ndim, iterations_fista=temporal_k,
                         iterations_unacc=0)

    # warm-up sweep compiles every chunk program outside the trace
    t0 = time.time()
    solve_outofcore_temporal(cube, 1.0 / lam, lam / mu, opts,
                             n_slabs, temporal_k)
    warm_s = time.time() - t0
    print(f"# warm-up sweep {warm_s:.1f}s", file=sys.stderr, flush=True)

    d = tempfile.mkdtemp(prefix="cytv_ovl_")
    t0 = time.time()
    with jax.profiler.trace(d):
        out = solve_outofcore_temporal(cube, 1.0 / lam, lam / mu, opts,
                                       n_slabs, temporal_k)
    wall_s = time.time() - t0
    if not np.isfinite(out["delta"][temporal_k - 1]):
        raise RuntimeError("non-finite delta")

    compute, transfer, planes = _spans(d)
    uc = _union(compute)
    ut = _union(transfer)
    inter = _intersection(compute, transfer)
    frac = inter / uc if uc else 0.0
    results = {
        "shape": list(shape),
        "temporal_k": temporal_k,
        "n_slabs": n_slabs,
        "traced_wall_s": round(wall_s, 2),
        "device_compute_union_s": round(uc / 1e9, 4),
        "transfer_union_s": round(ut / 1e9, 4),
        "compute_transfer_intersection_s": round(inter / 1e9, 4),
        "measured_overlap_fraction": round(frac, 4),
        "n_compute_spans": len(compute),
        "n_transfer_spans": len(transfer),
        "planes_seen": planes,
        "note": "fraction of device-compute time with a host-interface "
                "transfer simultaneously in flight during a real "
                "out-of-core temporal sweep; bench.py's cfg4 PCIe4 "
                "projection consumes this instead of assuming 1.0",
        "measured_utc": time.strftime("%Y-%m-%dT%H:%M:%SZ",
                                      time.gmtime()),
    }
    out_path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "OVERLAP_OOC.json")
    with open(out_path, "w") as f:
        json.dump(results, f, indent=1)
    print(json.dumps(results))
    return 0


if __name__ == "__main__":
    sys.exit(main())
