from .state import IPMState, ProblemArrays, problem_to_device, count_onesided
from .mpc import MPCKernel
from .driver import MPCSolver, solve
from .host import HostMPCSolver, solve_host

__all__ = [
    "IPMState",
    "ProblemArrays",
    "problem_to_device",
    "count_onesided",
    "MPCKernel",
    "MPCSolver",
    "solve",
    "HostMPCSolver",
    "solve_host",
]
