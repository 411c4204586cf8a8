from .status import Status, ExecutionStats, Counters, get_status_output
from .options import (
    IPMOptions,
    load_options,
    Mehrotra,
    ConservativeStep,
    AdaptiveStep,
    MehrotraAdaptiveStep,
    NoRegularization,
    FixedRegularization,
    AdaptiveRegularization,
    KKTSystem,
    LinearSolverBackend,
)
from .logger import MadLogger, TRACE, DEBUG, INFO, NOTICE, WARN, ERROR
from .exceptions import (
    MadQPError,
    InvalidNumberException,
    NotEnoughDegreesOfFreedomException,
    LinearSolverException,
    SolveException,
)

__all__ = [
    "Status",
    "ExecutionStats",
    "Counters",
    "get_status_output",
    "IPMOptions",
    "load_options",
    "Mehrotra",
    "ConservativeStep",
    "AdaptiveStep",
    "MehrotraAdaptiveStep",
    "NoRegularization",
    "FixedRegularization",
    "AdaptiveRegularization",
    "KKTSystem",
    "LinearSolverBackend",
    "MadLogger",
    "MadQPError",
    "InvalidNumberException",
    "NotEnoughDegreesOfFreedomException",
    "LinearSolverException",
    "SolveException",
]
