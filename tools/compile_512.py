"""AOT compile evidence for the 512²×256² north-star config (BASELINE
configs[4]: "Sharded FISTA 4D on 512²×256² datacube over v5e-16 mesh").

No multi-chip hardware is available in this environment, so the evidence
is ahead-of-time compilation against real TPU topologies
(``jax.experimental.topologies`` — the actual TPU toolchain, no devices,
no data). The honest physics first (SURVEY.md §7 hard part 2):

- the cube is 512·512·256·256 f32 = 64 GiB; 4D FISTA holds 10 cube-size
  arrays ≈ 640 GiB of state. Over 16 chips that is ~43 GB/chip — nearly
  3× a v5e's 16 GB HBM. **No 16-way in-core decomposition exists**, on
  any axes; the reference's own MPI path has the same wall (it would need
  ~40 nodes of RAM).

This tool therefore records BOTH:

1. v5e:4x4 (16 chips): the full sharded solver *lowers and compiles*
   through the TPU toolchain until buffer assignment, whose report is the
   per-shard HBM math — 36.25 GB demanded of 15.75 GB. Captured
   verbatim: the config runs on 16 chips only in streaming mode
   (``solver/outofcore.py`` per host — the "streamed HDF5 I/O" in the
   BASELINE config text), not HBM-resident.
2. v5e:8x8 (64 chips): the same program compiles AND fits
   (~13.2 GB/chip) — the smallest standard v5e pod slice that runs the
   north-star config fully in HBM.

Writes COMPILE_512.json. Usage: python tools/compile_512.py
"""

import json
import os
import re
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SHAPE = (512, 512, 256, 256)
ITERS = 40  # the reference's Cori production iteration count


def _compile_for(topology_name: str, n_dev: int, axis0_pairs: bool = False,
                 shape=None, grid2d_pairs: bool = False):
    import jax
    from jax.experimental import topologies
    from jax.sharding import NamedSharding, PartitionSpec as P

    from cytvdn_tpu.config import SolverOptions
    from cytvdn_tpu.parallel.partition import choose_grid
    from cytvdn_tpu.parallel.sharded import _build_sharded_fn

    shape = tuple(shape) if shape is not None else SHAPE
    topo = topologies.get_topology_desc(platform="tpu",
                                        topology_name=topology_name)
    devices = tuple(topo.devices)
    assert len(devices) == n_dev, (topology_name, len(devices))

    if axis0_pairs:
        # the axis-0-only mesh the auto partitioner picks for
        # pair-eligible runs: the K=2 temporal kernel runs on every chip
        # (2-row halo bands over ICI)
        grid = (n_dev, 1)
        opts = SolverOptions(ndim=4, iterations_fista=ITERS,
                             iterations_unacc=0)
    elif grid2d_pairs:
        # square 2D scan grid riding the pair kernel + the axis-1 seam
        # repair (parallel/pairfix.py, round 3): the per-chip halo
        # volume shrinks vs a degenerate n-way axis-0 split
        import math

        g = int(math.isqrt(n_dev))
        assert g * g == n_dev
        grid = (g, g)
        opts = SolverOptions(ndim=4, iterations_fista=ITERS,
                             iterations_unacc=0)
    else:
        grid = choose_grid(n_dev, shape[:2])  # edge-minimizing partitioner
        opts = SolverOptions(ndim=4, iterations_fista=ITERS,
                             iterations_unacc=0,
                             stopping_relative_change=1e-6)
    shard = tuple(grid) + (1, 1)
    fn, mesh, data_spec = _build_sharded_fn(
        opts, shard, 4, False, False, False, devices
    )
    data_sh = NamedSharding(mesh, data_spec)
    rep_sh = NamedSharding(mesh, P())

    def sds(shape_, dtype, sh):
        return jax.ShapeDtypeStruct(shape_, dtype, sharding=sh)

    args = (
        sds(shape, np.float32, data_sh),
        sds((4,), np.float32, rep_sh),
        sds((4,), np.float32, rep_sh),
        sds((), np.int32, rep_sh),
    )
    lowered = fn.lower(*args)
    entry = {
        "topology": topology_name,
        "n_devices": n_dev,
        "mesh_grid_over_scan_axes": list(grid),
        "shape": list(shape),
        "per_shard_shape": [s // w for s, w in zip(shape, shard)],
        "kernel": ("K=2 temporal pairs (axis-0 mesh)" if axis0_pairs
                   else ("K=2 temporal pairs + axis-1 seam repair "
                         "(2D scan grid)" if grid2d_pairs
                         else "K=1 fused (2D scan grid)")),
        "lowered": True,
    }
    try:
        compiled = lowered.compile()
        ma = compiled.memory_analysis()
        per_dev = (ma.argument_size_in_bytes + ma.temp_size_in_bytes
                   + ma.output_size_in_bytes - ma.alias_size_in_bytes)
        entry.update({
            "compiled": True,
            "fits": bool(per_dev < 16e9),
            "per_device_bytes": int(per_dev),
            "per_device_detail": {
                "argument_bytes": int(ma.argument_size_in_bytes),
                "temp_bytes": int(ma.temp_size_in_bytes),
                "output_bytes": int(ma.output_size_in_bytes),
                "alias_bytes": int(ma.alias_size_in_bytes),
            },
        })
    except Exception as e:  # buffer assignment over HBM: record the math
        msg = str(e)
        m = re.search(r"Used ([0-9.]+)G of ([0-9.]+)G hbm", msg)
        entry.update({
            "compiled": False,
            "fits": False,
            "compiler_verdict": (
                f"RESOURCE_EXHAUSTED: needs {m.group(1)} GB of "
                f"{m.group(2)} GB HBM per chip" if m else msg[:200]
            ),
        })
    return entry


def _pair_2d_viability():
    """Measured justification for which 2D-grid shard geometries ride
    pairs: `pair_hbm_viable` math per candidate shard."""
    from cytvdn_tpu.kernels.temporal import pair_hbm_viable, pair_plan

    out = {}
    for label, local in [
        ("512^2x256^2 on v5e-64 (8x8)", (64, 64, 256, 256)),
        ("512^2x256^2 on v5e-256 (16x16)", (32, 32, 256, 256)),
        ("256^2x128^2 on v5e-64 (8x8)", (32, 32, 128, 128)),
        ("256^2x128^2 on v5e-16 (4x4)", (64, 64, 128, 128)),
    ]:
        plan = pair_plan(local, 4, halo0=True)
        out[label] = {
            "per_shard": list(local),
            "pair_b1_strip_cols": None if plan is None else plan[3],
            "pair_hbm_viable": bool(pair_hbm_viable(local)),
        }
    return out


def main() -> int:
    cube_bytes = int(np.prod(SHAPE)) * 4
    report = {
        "config": ("BASELINE.json configs[4]: 512x512x256x256 f32 4D "
                   f"FISTA, {ITERS} iterations"),
        "global_data_bytes": cube_bytes,
        "global_fista_state_bytes_10_arrays": cube_bytes * 10,
        "hbm_math": (
            "640 GiB of FISTA state over 16 chips = ~43 GB/chip vs 16 GB "
            "HBM: no 16-way in-core decomposition exists on any axes. "
            "On v5e-16 the config runs in streaming mode (out-of-core "
            "slabs per host, solver/outofcore.py); fully HBM-resident it "
            "needs a v5e-64."
        ),
        "compiles": [
            _compile_for("v5e:4x4", 16),
            _compile_for("v5e:8x8", 64),
            # the 256^2x128^2 north-star (BASELINE configs[3] — exceeds
            # one chip's HBM) runs fully HBM-resident on a v5e-16 with
            # the K=2 temporal pair kernel over an axis-0 mesh. (The
            # 512^2 config's pod shards force pair strips too small —
            # band state would exceed HBM — so it stays on the K=1
            # program above; pair_hbm_viable gates this automatically.)
            _compile_for("v5e:4x4", 16, axis0_pairs=True,
                         shape=(256, 256, 128, 128)),
            # round 3: the same north-star on a v5e-64's 8x8 2D grid —
            # the pair kernel with axis-0 halo bands plus the axis-1
            # seam-repair strips (parallel/pairfix.py). A 64-way axis-0
            # split would leave 4-row shards (50% band overhead); the
            # 2D grid keeps (32,32,128,128) shards pair-viable. The
            # 512^2 config itself stays K=1 at ANY grid: its 256-square
            # tails force pair strips whose band gathers exceed HBM
            # (pair_hbm_viable((64,64,256,256)) is False — measured
            # VMEM/HBM physics, not a missing feature).
            _compile_for("v5e:8x8", 64, grid2d_pairs=True,
                         shape=(256, 256, 128, 128)),
        ],
        "pair_2d_hbm_note": _pair_2d_viability(),
    }
    out = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "COMPILE_512.json")
    with open(out, "w") as f:
        json.dump(report, f, indent=2)
    print(json.dumps(report, indent=2))
    ok = report["compiles"][1].get("fits", False)
    assert ok, "v5e-64 compile must fit"
    return 0


if __name__ == "__main__":
    sys.exit(main())
