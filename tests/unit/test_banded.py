"""Unit tests: block-tridiagonal arrowhead KKT factorization vs dense.

Validates ``pycollo_tpu.solver.banded`` against a dense reference
assembled from the same blocks (the structured solver must agree with
``np.linalg.solve`` to f64 accuracy on well-conditioned SPD systems).
"""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp

from pycollo_tpu.solver.banded import (ArrowBlocks, PhaseBand, arrow_factor,
                                       arrow_solve, btd_factor, btd_solve)


def _random_btd(rng, K, MB, nz, jitter=3.0):
    """Random SPD block-tridiagonal matrix (blocks + dense mirror)."""
    D = rng.standard_normal((K, MB, MB))
    D = 0.5 * (D + np.swapaxes(D, -1, -2))
    U = 0.3 * rng.standard_normal((K, MB, nz))
    U[0] = 0.0
    n = K * MB
    A = np.zeros((n, n))
    for k in range(K):
        A[k * MB:(k + 1) * MB, k * MB:(k + 1) * MB] = D[k]
        if k:
            cols = slice(k * MB - nz, k * MB)
            A[k * MB:(k + 1) * MB, cols] = U[k]
            A[cols, k * MB:(k + 1) * MB] = U[k].T
    # Diagonal dominance -> SPD.
    shift = jitter + np.abs(A).sum(axis=1).max()
    A += shift * np.eye(n)
    D += shift * np.eye(MB)[None]
    return jnp.asarray(D), jnp.asarray(U), A


def test_btd_factor_solve_matches_dense():
    rng = np.random.default_rng(0)
    K, MB, nz = 6, 9, 3
    D, U, A = _random_btd(rng, K, MB, nz)
    rhs = rng.standard_normal((K, MB, 2))
    fac = btd_factor(D, U)
    assert bool(fac.ok)
    x = np.asarray(btd_solve(fac, jnp.asarray(rhs)))
    x_ref = np.linalg.solve(A, rhs.reshape(K * MB, 2))
    np.testing.assert_allclose(x.reshape(K * MB, 2), x_ref, rtol=1e-10,
                               atol=1e-10)


def test_btd_vector_rhs():
    rng = np.random.default_rng(1)
    K, MB, nz = 4, 6, 2
    D, U, A = _random_btd(rng, K, MB, nz)
    rhs = rng.standard_normal((K, MB))
    fac = btd_factor(D, U)
    x = np.asarray(btd_solve(fac, jnp.asarray(rhs)))
    x_ref = np.linalg.solve(A, rhs.reshape(-1)).reshape(K, MB)
    np.testing.assert_allclose(x, x_ref, rtol=1e-10, atol=1e-10)


def test_btd_indefinite_flags_not_ok():
    rng = np.random.default_rng(2)
    K, MB, nz = 3, 4, 2
    D, U, _ = _random_btd(rng, K, MB, nz)
    D = D.at[1, 0, 0].set(-1e3)   # make one block indefinite
    fac = btd_factor(D, U)
    assert not bool(fac.ok)


def _dense_from_arrow(blocks):
    """Assemble the dense K = M + G diag(1/d_ib) G^T for testing."""
    sizes = [pb.Dblk.shape[0] * pb.Dblk.shape[1] for pb in blocks.phases]
    nw = blocks.B.shape[0]
    n = sum(sizes) + nw
    A = np.zeros((n, n))
    off = 0
    G = []
    for pb in blocks.phases:
        K, MB, _ = pb.Dblk.shape
        nz = pb.Ublk.shape[-1]
        for k in range(K):
            sl = slice(off + k * MB, off + (k + 1) * MB)
            A[sl, sl] = pb.Dblk[k]
            if k:
                cols = slice(off + k * MB - nz, off + k * MB)
                A[sl, cols] = pb.Ublk[k]
                A[cols, sl] = pb.Ublk[k].T
        w0 = n - nw
        for k in range(K):
            sl = slice(off + k * MB, off + (k + 1) * MB)
            A[w0:, sl] += pb.Cblk[k]
            A[sl, w0:] += pb.Cblk[k].T
        G.append(np.asarray(pb.Gz).reshape(K * MB, -1))
        off += K * MB
    A[n - nw:, n - nw:] += np.asarray(blocks.B)
    G.append(np.asarray(blocks.Gw))
    G = np.vstack(G)
    A += G @ np.diag(1.0 / np.asarray(blocks.d_ib)) @ G.T
    return A


def _random_arrow(rng, phase_dims, nw, nr, shift=None):
    phases = []
    zmask = []
    for (K, MB, nz) in phase_dims:
        D, U, _ = _random_btd(rng, K, MB, nz, jitter=5.0 + MB)
        C = 0.1 * rng.standard_normal((K, nw, MB))
        Gz = 0.2 * rng.standard_normal((K, MB, nr))
        phases.append(PhaseBand(Dblk=D, Ublk=U, Cblk=jnp.asarray(C),
                                Gz=jnp.asarray(Gz)))
        zmask.append(jnp.ones((K, MB)))
    Bw = rng.standard_normal((nw, nw))
    Bw = Bw @ Bw.T + (5.0 + nw) * np.eye(nw)
    Gw = 0.2 * rng.standard_normal((nw, nr))
    return ArrowBlocks(phases=tuple(phases), B=jnp.asarray(Bw),
                       Gw=jnp.asarray(Gw),
                       d_ib=jnp.asarray(rng.uniform(0.5, 2.0, nr)),
                       zmask=tuple(zmask), wmask=jnp.ones(nw))


@pytest.mark.parametrize("phase_dims,nw,nr", [
    ([(5, 8, 2)], 4, 2),
    ([(3, 6, 3), (4, 4, 2)], 5, 3),   # two phases
    ([(4, 6, 2)], 3, 0),              # no low-rank rows
])
def test_arrow_factor_solve_matches_dense(phase_dims, nw, nr):
    rng = np.random.default_rng(42)
    blocks = _random_arrow(rng, phase_dims, nw, nr)
    A = _dense_from_arrow(blocks)
    n = A.shape[0]
    rhs = rng.standard_normal(n)

    fac = arrow_factor(blocks, jnp.asarray(0.0))
    assert bool(fac.ok)
    rz = []
    off = 0
    for (K, MB, nz) in phase_dims:
        rz.append(jnp.asarray(rhs[off:off + K * MB].reshape(K, MB)))
        off += K * MB
    rw = jnp.asarray(rhs[off:])
    dz, dw = arrow_solve(fac, rz, rw)
    x = np.concatenate([np.asarray(z).reshape(-1) for z in dz]
                       + [np.asarray(dw)])
    x_ref = np.linalg.solve(A, rhs)
    np.testing.assert_allclose(x, x_ref, rtol=1e-8, atol=1e-9)


def test_arrow_regularization_dw():
    """dw must be added to real diagonal entries only (mask-gated)."""
    rng = np.random.default_rng(3)
    blocks = _random_arrow(rng, [(3, 4, 2)], 3, 1)
    dw = 7.5
    A = _dense_from_arrow(blocks) + dw * np.eye(3 * 4 + 3)
    rhs = rng.standard_normal(A.shape[0])
    fac = arrow_factor(blocks, jnp.asarray(dw))
    dz, dwv = arrow_solve(fac, [jnp.asarray(
        rhs[:12].reshape(3, 4))], jnp.asarray(rhs[12:]))
    x = np.concatenate([np.asarray(dz[0]).reshape(-1), np.asarray(dwv)])
    np.testing.assert_allclose(x, np.linalg.solve(A, rhs), rtol=1e-8,
                               atol=1e-9)


def test_arrow_vmap_over_levels():
    """Factorization must vmap over speculative dw levels."""
    rng = np.random.default_rng(4)
    blocks = _random_arrow(rng, [(3, 4, 2)], 3, 1)
    dws = jnp.asarray([0.0, 1.0, 10.0])
    facs = jax.vmap(lambda d: arrow_factor(blocks, d))(dws)
    assert facs.ok.shape == (3,)
    assert bool(jnp.all(facs.ok))
    # Selecting one level via tree_map indexing must reproduce the
    # unbatched factorization.
    f1 = jax.tree_util.tree_map(lambda a: a[1], facs)
    rhs = rng.standard_normal(15)
    dz_a, dw_a = arrow_solve(f1, [jnp.asarray(
        rhs[:12].reshape(3, 4))], jnp.asarray(rhs[12:]))
    f_ref = arrow_factor(blocks, jnp.asarray(1.0))
    dz_b, dw_b = arrow_solve(f_ref, [jnp.asarray(
        rhs[:12].reshape(3, 4))], jnp.asarray(rhs[12:]))
    np.testing.assert_allclose(np.asarray(dz_a[0]), np.asarray(dz_b[0]),
                               rtol=1e-12)
    np.testing.assert_allclose(np.asarray(dw_a), np.asarray(dw_b),
                               rtol=1e-12)
