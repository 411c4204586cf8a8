from .batched import BatchedMPCSolver, solve_batched, pad_standard

__all__ = ["BatchedMPCSolver", "solve_batched", "pad_standard"]
