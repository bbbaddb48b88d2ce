from cytvdn_tpu.kernels.fused import (
    fused_iteration,
    fused_supported,
)

__all__ = ["fused_iteration", "fused_supported"]
