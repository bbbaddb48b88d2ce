"""Roofline accounting for the TV iteration.

The workload is memory-bandwidth-bound (O(1) flops/voxel/pass — the
reference author's own characterization, reference README.md:114), so
throughput is bytes-touched per iteration vs HBM bandwidth. This module
encodes the per-backend traffic models used to judge how close a measured
run is to speed-of-light.
"""

from __future__ import annotations

from typing import Dict, Tuple

#: published per-chip HBM bandwidth (bytes/s)
HBM_BW = {
    "v5 lite": 819e9,
    "v5e": 819e9,
    "v4": 1228e9,
    "v5p": 2765e9,
}

#: measured practical bandwidth for looped read-modify-write workloads on
#: the bench chip. Round-2 note: round 1's lower numbers (425-560 GB/s
#: saxpy, ~470 kernel) were partly the lane-padding tax on non-128-lane
#: shapes; with lane-dense layouts the fused kernel sustains ~590-600
#: GB/s effective (~72% of the 819 GB/s spec peak) on both 3D and 4D —
#: use this, not the spec peak, when judging kernel efficiency
PRACTICAL_BW = {"v5e": 600e9, "v5 lite": 600e9}


def traversals_per_iteration(ndim: int, fista: bool, backend: str) -> float:
    """Cube-size array read+write traversals per full TV iteration.

    - ``fused`` (single Pallas pass): reads orig, recon, n accs [, n ds];
      writes recon, n accs [, n ds]  →  4n+3 (FISTA) / 2n+3 (plain).
    - ``xla`` (two fused XLA passes): the accumulator pass re-reads the
      accumulators in the reconstruction pass → ~(5n+4)/(3n+4).
    - ``pair`` (K=2 temporally-blocked Pallas kernel): two iterations
      per pass of the fused kernel's traffic, plus ~1 traversal/iter of
      seam-band gathers → (4n+3)/2+1 / (2n+3)/2+1.
    - ``kstep:K`` (generalized K-iteration staircase, single-strip
      layouts — kernels/kstep.py): K iterations per pass of the fused
      kernel's traffic, NO seam gathers → (4n+3)/K / (2n+3)/K.
    - ``reference``: per-kernel traversals of the Cython loops
      (SURVEY.md §3.1): 22 for 4D FISTA.
    """
    n = ndim
    if backend.startswith("kstep:"):
        k = int(backend.split(":", 1)[1])
        return ((4 * n + 3) / k) if fista else ((2 * n + 3) / k)
    if backend == "pair":
        return ((4 * n + 3) / 2 + 1) if fista else ((2 * n + 3) / 2 + 1)
    if backend == "fused":
        return (4 * n + 3) if fista else (2 * n + 3)
    if backend == "xla":
        return (5 * n + 4) if fista else (3 * n + 4)
    if backend == "reference":
        return (5 * n + 2) if fista else (3 * n + 2)
    raise ValueError(backend)


def speed_of_light(
    shape: Tuple[int, ...],
    fista: bool = True,
    backend: str = "fused",
    itemsize: int = 4,
    chip: str = "v5e",
) -> float:
    """Upper-bound voxel-updates/sec for a backend on a chip."""
    trav = traversals_per_iteration(len(shape), fista, backend)
    return HBM_BW[chip] / (trav * itemsize)


def efficiency(measured_vox_per_sec: float, shape, fista=True,
               backend="fused", chip="v5e") -> float:
    """Fraction of the traffic-model speed-of-light achieved."""
    return measured_vox_per_sec / speed_of_light(
        tuple(shape), fista, backend, chip=chip)


def practical_speed_of_light(
    shape: Tuple[int, ...],
    fista: bool = True,
    backend: str = "pair",
    itemsize: int = 4,
    chip: str = "v5e",
) -> float:
    """Voxel-updates/sec the backend's traffic model reaches at the
    chip's *measured sustained* bandwidth (PRACTICAL_BW) — the realistic
    target a healthy kernel should sit near, used for the bench harness's
    per-config regression floors."""
    trav = traversals_per_iteration(len(shape), fista, backend)
    bw = PRACTICAL_BW.get(chip, HBM_BW[chip] * 0.72)
    return bw / (trav * itemsize)
