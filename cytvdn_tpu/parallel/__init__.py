from cytvdn_tpu.parallel.partition import choose_grid
from cytvdn_tpu.parallel.halo import MeshComm
from cytvdn_tpu.parallel.sharded import run_sharded, make_mesh
from cytvdn_tpu.parallel.api import denoise_sharded

__all__ = [
    "choose_grid",
    "MeshComm",
    "run_sharded",
    "make_mesh",
    "denoise_sharded",
]
