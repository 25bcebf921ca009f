from .time_integration import ForwardEuler, RungeKutta4, ocn_timestep
from .run_loop import ocn_run_loop, ocn_run_loop_objective

__all__ = [
    "ForwardEuler",
    "RungeKutta4",
    "ocn_timestep",
    "ocn_run_loop",
    "ocn_run_loop_objective",
]
