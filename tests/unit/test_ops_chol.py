"""Pallas batched-Cholesky kernel vs the XLA reference path.

Runs the kernel through the Pallas interpreter on CPU (the same kernel
body compiles for TPU; the TPU timing lives in ``ops/bench_chol.py`` and
the module docstring of ``ops/block_chol.py``).
"""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

from pycollo_tpu.ops import batched_chol_inv, chol_inv_reference  # noqa: E402


def _random_spd(rng, b, n, jitter=0.5):
    M = rng.standard_normal((b, n, n))
    A = M @ np.swapaxes(M, -1, -2) + jitter * np.eye(n)
    return A


@pytest.mark.parametrize("n", [3, 8, 15])
def test_matches_reference(n):
    rng = np.random.default_rng(0)
    A = _random_spd(rng, 37, n)   # deliberately not a multiple of 128
    out = np.asarray(batched_chol_inv(jnp.asarray(A), interpret=True))
    ref = np.asarray(chol_inv_reference(jnp.asarray(A)))
    assert out.shape == (37, n, n)
    assert out.dtype == np.float32
    np.testing.assert_allclose(out, ref, rtol=2e-4, atol=2e-4)


def test_strictly_lower_triangular_inverse():
    rng = np.random.default_rng(1)
    A = _random_spd(rng, 5, 9)
    out = np.asarray(batched_chol_inv(jnp.asarray(A), interpret=True))
    iu = np.triu_indices(9, k=1)
    assert np.all(out[:, iu[0], iu[1]] == 0.0)
    # L^{-1} A L^{-T} == I  (f32 tolerance)
    recon = out @ A.astype(np.float32) @ np.swapaxes(out, -1, -2)
    np.testing.assert_allclose(
        recon, np.broadcast_to(np.eye(9, dtype=np.float32), recon.shape),
        atol=5e-4)


def test_non_pd_flags_nan():
    """An indefinite block must surface NaNs, never a silent answer."""
    rng = np.random.default_rng(2)
    A = _random_spd(rng, 4, 6)
    A[2] -= 10.0 * np.eye(6)      # make one instance indefinite
    out = np.asarray(batched_chol_inv(jnp.asarray(A), interpret=True))
    assert np.isnan(out[2]).any()
    assert np.isfinite(out[[0, 1, 3]]).all()
