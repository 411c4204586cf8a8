"""Error taxonomy mapped to statuses.

Equivalent of the MadNLP exception types consumed by the reference's solve
driver (src/solver.jl:364-390): each exception maps to a terminal Status.
"""

from __future__ import annotations

from .status import Status


class MadQPError(Exception):
    status = Status.INTERNAL_ERROR


class InvalidNumberException(MadQPError):
    """NaN/Inf detected in a model callback; tagged by callback name."""

    _STATUS_BY_CALLBACK = {
        "obj": Status.INVALID_NUMBER_OBJECTIVE,
        "grad": Status.INVALID_NUMBER_GRADIENT,
        "cons": Status.INVALID_NUMBER_CONSTRAINTS,
        "jac": Status.INVALID_NUMBER_JACOBIAN,
        "hess": Status.INVALID_NUMBER_HESSIAN_LAGRANGIAN,
    }

    def __init__(self, callback: str = ""):
        super().__init__(f"Invalid number detected in callback '{callback}'")
        self.callback = callback
        self.status = self._STATUS_BY_CALLBACK.get(
            callback, Status.INVALID_NUMBER_DETECTED
        )


class NotEnoughDegreesOfFreedomException(MadQPError):
    status = Status.NOT_ENOUGH_DEGREES_OF_FREEDOM


class LinearSolverException(MadQPError):
    status = Status.ERROR_IN_STEP_COMPUTATION


class SolveException(MadQPError):
    """Linear solve produced NaN or exceeded the residual tolerance
    (reference src/linear_solver.jl:41-43)."""

    status = Status.ERROR_IN_STEP_COMPUTATION
