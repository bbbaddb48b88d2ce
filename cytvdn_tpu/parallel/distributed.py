"""Multi-host runtime initialization.

The reference's scale-out entry is ``mpirun``/SLURM launching one MPI rank
per node (reference cori_MPI_example.sh, mpi.py:31-33); the TPU-native
equivalent is one Python process per host joined into a global JAX runtime
over DCN, with the device mesh laid out so halo ``ppermute`` traffic rides
ICI within a slice.
"""

from __future__ import annotations

import os
from typing import Optional


def init_distributed(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> bool:
    """Join the multi-host JAX runtime if this looks like a multi-host
    environment; no-op (returns False) on a single host.

    On Cloud TPU VMs recent JAX auto-initializes from the metadata server,
    so calling with no arguments is usually right. Explicit coordinator
    parameters (or the JAX_COORDINATOR_ADDRESS / JAX_NUM_PROCESSES /
    JAX_PROCESS_ID environment variables) cover other clusters.
    """
    import jax

    # NB: must not touch the backend (jax.devices/process_count) before
    # jax.distributed.initialize — it would lock in a single-process
    # runtime and make initialize() raise
    if jax.distributed.is_initialized():
        return jax.process_count() > 1
    coordinator_address = coordinator_address or os.environ.get(
        "JAX_COORDINATOR_ADDRESS")
    env_np = os.environ.get("JAX_NUM_PROCESSES")
    env_pid = os.environ.get("JAX_PROCESS_ID")
    if num_processes is None and env_np:
        num_processes = int(env_np)
    if process_id is None and env_pid:
        process_id = int(env_pid)
    if coordinator_address is None and num_processes is None:
        return False
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )
    return True
