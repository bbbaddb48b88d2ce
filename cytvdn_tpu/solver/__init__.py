from cytvdn_tpu.solver.engine import run_solver, NullComm

__all__ = ["run_solver", "NullComm"]
