"""Block-tridiagonal + arrowhead + low-rank KKT factorization.

TPU-native replacement for the sparse symmetric-indefinite factorization
the reference gets from MUMPS inside IPOPT (``pycollo/backend.py:1695-1711``;
the time-banded block pattern is visible in the reference's Hessian
sparsity assembly, ``pycollo/iteration.py:1039-1052``).

The condensed-space KKT matrix of a direct-collocation NLP has the shape

    K_full = M + G D_ib^{-1} G^T,      M = [[T, C^T],
                                            [C, B ]]

where

* ``T`` is block tridiagonal over mesh *sections* (defect constraints
  couple only nodes within a section; adjacent sections overlap in one
  shared boundary node, so the off-diagonal blocks are nonzero only in
  the shared node's ``nz`` columns),
* ``B`` is a small dense *border* (endpoint node variables, integrals
  ``q``, phase times ``t0/tF``, global parameters ``s``) with coupling
  ``C`` to the banded interior, and
* ``G D_ib^{-1} G^T`` is the low-rank contribution of condensed integral
  constraint rows (each integral row touches every mesh node through the
  quadrature weights — dense but rank ``nq``).

Factorization is three nested Schur layers, each a Cholesky with a
positive-definiteness certificate (NaN/non-positive pivots), replacing
MUMPS' inertia detection:

1. block-tridiagonal Cholesky of ``T`` via ``lax.scan`` — O(K) compile
   size, O(K * MB^3) FLOPs instead of O((K*MB)^3) dense;
2. dense Cholesky of the border Schur complement ``B - C T^-1 C^T``;
3. dense Cholesky of the Woodbury capacitance ``D_ib + G^T M^-1 G``.

All inner solves are pure batched matmuls (the per-block inverse factors
are precomputed), so the whole factorization vectorizes cleanly under
``vmap`` over problem instances and over speculative regularization
levels.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp


def _tri_lower_inv(L):
    """Explicit inverse of a (stack of) lower-triangular matrices.

    One triangular solve against the identity; afterwards every banded
    solve is a plain matmul (MXU-friendly, Pallas-ready).
    """
    eye = jnp.eye(L.shape[-1], dtype=L.dtype)
    return jax.scipy.linalg.solve_triangular(L, eye, lower=True)


class BTDFactors(NamedTuple):
    """Cholesky factors of a block-tridiagonal SPD matrix.

    ``Linv[k]`` is the inverse of the k-th diagonal Cholesky block;
    ``F[k]`` is the off-diagonal factor block (rows of group k, last-nz
    columns of group k-1; ``F[0]`` is zero).
    """

    Linv: jnp.ndarray     # (K, MB, MB)
    F: jnp.ndarray        # (K, MB, nz)
    ok: jnp.ndarray       # () bool — positive definite everywhere


def btd_factor(Dblk, Ublk) -> BTDFactors:
    """Factor a block-tridiagonal SPD matrix T = L L^T.

    ``Dblk``: (K, MB, MB) diagonal blocks.
    ``Ublk``: (K, MB, nz) sub-diagonal blocks; ``Ublk[k]`` couples group
    k's rows to the *last nz columns* of group k-1 (the shared mesh node).
    ``Ublk[0]`` is ignored.

    Uses the corner identity ``(L^-T)[a:, a:] = (L[a:, a:])^-T`` so the
    scan carry is only the (nz, nz) corner of the previous block's
    inverse factor.
    """
    K, MB, _ = Dblk.shape
    nz = Ublk.shape[-1]

    def step(corner_inv_T, inp):
        D_k, U_k, first = inp
        F_k = jnp.where(first, 0.0, U_k @ corner_inv_T)
        S_k = D_k - F_k @ F_k.T
        L_k = jnp.linalg.cholesky(S_k)
        Linv_k = _tri_lower_inv(L_k)
        corner_next = Linv_k[MB - nz:, MB - nz:].T    # (L_k^{-T}) corner
        return corner_next, (Linv_k, F_k)

    first_flags = jnp.arange(K) == 0
    init = jnp.zeros((nz, nz), Dblk.dtype)
    _, (Linv, F) = jax.lax.scan(step, init, (Dblk, Ublk, first_flags))
    diag = jnp.diagonal(Linv, axis1=-2, axis2=-1)
    # A healthy (equilibrated) pivot is O(1); Linv diag = 1/L diag, so
    # non-finite or non-positive entries flag an indefinite matrix.
    ok = jnp.all(jnp.isfinite(Linv)) & jnp.all(diag > 0.0)
    return BTDFactors(Linv=Linv, F=F, ok=ok)


def btd_solve(factors: BTDFactors, rhs):
    """Solve T x = rhs with ``rhs`` of shape (K, MB, ncols) (or (K, MB))."""
    vec = rhs.ndim == 2
    if vec:
        rhs = rhs[..., None]
    Linv, F = factors.Linv, factors.F
    MB = Linv.shape[-1]
    nz = F.shape[-1]

    def fwd(y_prev_tail, inp):
        Linv_k, F_k, r_k = inp
        y_k = Linv_k @ (r_k - F_k @ y_prev_tail)
        return y_k[MB - nz:, :], y_k

    init = jnp.zeros((nz, rhs.shape[-1]), rhs.dtype)
    _, y = jax.lax.scan(fwd, init, (Linv, F, rhs))

    def bwd(x_next_contrib, inp):
        # carry in: F_{k+1}^T x_{k+1} (hits the last nz rows of block k);
        # carry out: F_k^T x_k (consumed by block k-1).
        Linv_k, F_k, y_k = inp
        x_k = jnp.swapaxes(Linv_k, -1, -2) @ (
            y_k - jnp.zeros_like(y_k).at[MB - nz:, :].set(x_next_contrib))
        return jnp.swapaxes(F_k, -1, -2) @ x_k, x_k

    init_b = jnp.zeros((nz, rhs.shape[-1]), rhs.dtype)
    _, x = jax.lax.scan(bwd, init_b, (Linv, F, y), reverse=True)
    return x[..., 0] if vec else x


class PhaseBand(NamedTuple):
    """Banded data of one phase: T blocks + border coupling + G columns."""

    Dblk: jnp.ndarray     # (K, MB, MB)
    Ublk: jnp.ndarray     # (K, MB, nz)
    Cblk: jnp.ndarray     # (K, nw, MB)  border rows x group cols
    Gz: jnp.ndarray       # (K, MB, nr)  low-rank z-columns


class ArrowBlocks(NamedTuple):
    """Assembled (unregularized, unequilibrated) KKT blocks."""

    phases: tuple         # tuple[PhaseBand]
    B: jnp.ndarray        # (nw, nw) border diagonal block
    Gw: jnp.ndarray       # (nw, nr) low-rank border rows
    d_ib: jnp.ndarray     # (nr,) dual regularization of the G rows
    #: per-variable free mask in banded layout (1 = real variable,
    #: 0 = structural pad / pinned variable -> identity row)
    zmask: tuple          # tuple[(K, MB)]
    wmask: jnp.ndarray    # (nw,)


class ArrowFactors(NamedTuple):
    btd: tuple            # tuple[BTDFactors]
    X: tuple              # tuple[(K, MB, nw)] = T^-1 C^T per phase
    Lw_inv: jnp.ndarray   # (nw, nw) inverse Cholesky factor of S_ww
    Zz: tuple             # tuple[(K, MB, nr)] banded part of M^-1 G
    Zw: jnp.ndarray       # (nw, nr) border part of M^-1 G
    Lc_inv: jnp.ndarray   # (nr, nr) inverse Cholesky of the capacitance
    dz: tuple             # tuple[(K, MB)] equilibration scales (z)
    dwq: jnp.ndarray      # (nw,) equilibration scales (border)
    ok: jnp.ndarray       # () bool


def _chol_inv_ok(A):
    """(L^-1, ok) of a small dense SPD block (ok certifies PD)."""
    L = jnp.linalg.cholesky(A)
    Linv = _tri_lower_inv(L)
    diag = jnp.diagonal(Linv)
    ok = jnp.all(jnp.isfinite(Linv)) & jnp.all(diag > 0.0)
    return Linv, ok


def arrow_factor(blocks: ArrowBlocks, dw) -> ArrowFactors:
    """Factor K = M + G diag(1/d_ib) G^T with primal regularization dw.

    ``dw`` is added to every *real* (non-pad) diagonal entry, matching
    the dense path's ``K + dw*I``.  Jacobi equilibration is applied to
    the banded and border blocks (the diagonal of K spans many orders of
    magnitude near a solution; scaling bounds the factorization error by
    the scaled condition number — the stability role pivoting plays
    inside MUMPS).
    """
    # Regularized diagonals.
    eps = jnp.asarray(1e-30, blocks.B.dtype)
    phases = []
    dz_scales = []
    for pb, zm in zip(blocks.phases, blocks.zmask):
        K, MB, _ = pb.Dblk.shape
        Dreg = pb.Dblk + (dw * zm)[:, :, None] * jnp.eye(MB, dtype=pb.Dblk.dtype)
        diag = jnp.diagonal(Dreg, axis1=-2, axis2=-1)
        d = 1.0 / jnp.sqrt(jnp.maximum(diag, eps))
        Ds = Dreg * d[:, :, None] * d[:, None, :]
        # U couples group k rows to group k-1's last-nz cols.
        d_prev_tail = jnp.concatenate(
            [jnp.ones((1,) + d.shape[1:], d.dtype), d[:-1]], axis=0)[
                :, MB - pb.Ublk.shape[-1]:]
        Us = pb.Ublk * d[:, :, None] * d_prev_tail[:, None, :]
        phases.append((Ds, Us, d))
        dz_scales.append(d)
    Breg = blocks.B + jnp.diag(dw * blocks.wmask)
    dwq = 1.0 / jnp.sqrt(jnp.maximum(jnp.diagonal(Breg), eps))
    Bs = Breg * dwq[:, None] * dwq[None, :]

    btd_factors = []
    Xs = []
    S_ww = Bs
    Zw_rhs = blocks.Gw * dwq[:, None]
    ok = jnp.asarray(True)
    gz_list = []
    for (Ds, Us, d), pb in zip(phases, blocks.phases):
        fac = btd_factor(Ds, Us)
        ok = ok & fac.ok
        Cs = pb.Cblk * dwq[:, None, None].swapaxes(0, 1) * d[:, None, :]
        # X = T^-1 C^T : (K, MB, nw)
        X = btd_solve(fac, jnp.swapaxes(Cs, -1, -2))
        S_ww = S_ww - jnp.einsum("kwm,kmv->wv", Cs, X)
        btd_factors.append(fac)
        Xs.append(X)
        gz_list.append(pb.Gz * d[:, :, None])
    Lw_inv, okb = _chol_inv_ok(S_ww)
    ok = ok & okb

    # Woodbury: Z = M^-1 G via the arrow factorization just built
    # (multi-RHS: one column per low-rank constraint row).
    def _arrow_solve_mat(rz_list, rw):
        uz0 = [btd_solve(f, rz) for f, rz in zip(btd_factors, rz_list)]
        rw1 = rw
        for (Ds, Us, d), pb, uz in zip(phases, blocks.phases, uz0):
            Cs = pb.Cblk * dwq[:, None, None].swapaxes(0, 1) * d[:, None, :]
            rw1 = rw1 - jnp.einsum("kwm,kmr->wr", Cs, uz)
        uw = jnp.swapaxes(Lw_inv, -1, -2) @ (Lw_inv @ rw1)
        uz = [u0 - X @ uw for u0, X in zip(uz0, Xs)]
        return uz, uw

    Zz, Zw = _arrow_solve_mat(gz_list, Zw_rhs)
    cap = jnp.diag(blocks.d_ib)
    for gz, zz in zip(gz_list, Zz):
        cap = cap + jnp.einsum("kmr,kms->rs", gz, zz)
    cap = cap + Zw_rhs.T @ Zw
    Lc_inv, okc = _chol_inv_ok(cap)
    ok = ok & okc
    nr = blocks.Gw.shape[-1]
    ok = ok if nr else ok  # nr == 0: capacitance is 0x0, trivially ok
    return ArrowFactors(btd=tuple(btd_factors), X=tuple(Xs),
                        Lw_inv=Lw_inv, Zz=tuple(Zz), Zw=Zw, Lc_inv=Lc_inv,
                        dz=tuple(dz_scales), dwq=dwq, ok=ok)


def arrow_solve(blocks: ArrowBlocks, factors: ArrowFactors, rz_list, rw):
    """Solve K dx = r; ``rz_list`` per-phase (K, MB), ``rw`` (nw,)."""
    # Equilibration: K = D^-1 Ks D^-1 with scales d -> x = d * Ks^-1 (d*r).
    rz_s = [rz * d for rz, d in zip(rz_list, factors.dz)]
    rw_s = rw * factors.dwq

    uz0 = [btd_solve(f, rz) for f, rz in zip(factors.btd, rz_s)]
    rw1 = rw_s
    for pb, uz, d in zip(blocks.phases, uz0, factors.dz):
        Cs = pb.Cblk * factors.dwq[:, None, None].swapaxes(0, 1) \
            * d[:, None, :]
        rw1 = rw1 - jnp.einsum("kwm,km->w", Cs, uz)
    uw = factors.Lw_inv.T @ (factors.Lw_inv @ rw1)
    uz = [u0 - X @ uw for u0, X in zip(uz0, factors.X)]

    # Woodbury correction.
    t = jnp.zeros(blocks.Gw.shape[-1], dtype=rw_s.dtype)
    for pb, u, d in zip(blocks.phases, uz, factors.dz):
        gz = pb.Gz * d[:, :, None]
        t = t + jnp.einsum("kmr,km->r", gz, u)
    t = t + (blocks.Gw * factors.dwq[:, None]).T @ uw
    c = factors.Lc_inv.T @ (factors.Lc_inv @ t)
    uz = [u - zz @ c for u, zz in zip(uz, factors.Zz)]
    uw = uw - factors.Zw @ c

    dz = [u * d for u, d in zip(uz, factors.dz)]
    dw_out = uw * factors.dwq
    return dz, dw_out
