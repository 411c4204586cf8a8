from .batched import BatchedMPCSolver, solve_batched, pad_standard
from .sparse_batched import solve_sparse_batched
from .structured import (
    TwoStageProblem,
    SchurKKT,
    build_two_stage,
    two_stage_to_flat_qp,
    random_two_stage,
    solve_two_stage,
)

__all__ = [
    "BatchedMPCSolver",
    "solve_batched",
    "solve_sparse_batched",
    "pad_standard",
    "TwoStageProblem",
    "SchurKKT",
    "build_two_stage",
    "two_stage_to_flat_qp",
    "random_two_stage",
    "solve_two_stage",
]
