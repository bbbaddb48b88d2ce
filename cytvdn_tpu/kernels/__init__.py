from cytvdn_tpu.kernels.fused import (
    fused_iteration,
    fused_supported,
)
from cytvdn_tpu.kernels.temporal import (
    fused_pair_iteration,
    pair_supported,
)

__all__ = [
    "fused_iteration",
    "fused_supported",
    "fused_pair_iteration",
    "pair_supported",
]
