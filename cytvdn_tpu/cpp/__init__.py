from cytvdn_tpu.cpp.backend import (
    native_available,
    native_num_threads,
    solve_cpp,
)

__all__ = ["native_available", "native_num_threads", "solve_cpp"]
