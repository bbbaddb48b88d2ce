from cytvdn_tpu.utils.memory import check_memory

__all__ = ["check_memory"]
