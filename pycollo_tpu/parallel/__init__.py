from .batch import BatchedSolveResult, solve_batched  # noqa: F401
