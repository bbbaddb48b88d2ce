from cytvdn_tpu.parallel.partition import choose_grid
from cytvdn_tpu.parallel.halo import MeshComm
from cytvdn_tpu.parallel.sharded import run_sharded, make_mesh

__all__ = ["choose_grid", "MeshComm", "run_sharded", "make_mesh"]
