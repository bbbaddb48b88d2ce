#!/usr/bin/env bash
# Production pod-slice launch — the TPU-native analog of the reference's
# cori_MPI_example.sh (12-node SLURM/MPI job, 40 iterations). One command,
# run identically on every host of the slice; JAX's multihost runtime
# brings up the global mesh (no scheduler glue, no MPI).
#
#   gcloud compute tpus tpu-vm ssh "$TPU_NAME" --worker=all \
#     --command="bash cytvdn-tpu/examples/tpu_pod_launch.sh gs://bucket/scan.emd out.emd"
#
# On a v5e-16: 16-chip mesh over the scan axes (the seam-minimizing
# partitioner picks 4x4). Input is read per-host (each host reads only its
# shards' blocks); output is per-host part files stitched into one EMD by
# host 0 (gather-small) or a virtual-dataset master (very large cubes).
set -euo pipefail

INPUT="${1:?usage: tpu_pod_launch.sh INPUT OUTPUT [ITERS]}"
OUTPUT="${2:?usage: tpu_pod_launch.sh INPUT OUTPUT [ITERS]}"
ITERS="${3:-40}"

# jax.distributed.initialize() is automatic on TPU VMs (recent JAX); the
# cytv CLI calls it when it detects a multi-process TPU environment.
exec cytv \
  -i "$INPUT" \
  -o "$OUTPUT" \
  -m 1.0 \
  -n "$ITERS" \
  -f 1 \
  --shard auto \
  --stop 0.05 \
  --checkpoint "${OUTPUT%.emd}.ck.npz" --checkpoint-every 10 \
  -v 1
