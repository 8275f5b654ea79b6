"""Pallas TPU kernels for the hot linear-algebra ops.

Current kernels:

* :mod:`~pycollo_tpu.ops.block_chol` — lane-vectorized batched
  small-block Cholesky factor + triangular inverse, the inner op of the
  block-tridiagonal KKT factorization (``solver/banded.py``).
"""

from .block_chol import batched_chol_inv, chol_inv_reference

__all__ = ["batched_chol_inv", "chol_inv_reference"]
