"""Structured (banded-arrowhead) KKT operator vs the dense reference.

For several real problems the block-assembled condensed KKT matrix must
agree with the dense one built from the whole-matrix structured
derivatives (``transcription._build_structured_derivatives``):

    K = hess_lag_scaled + diag(sigma) + dw*I + J_scaled^T D^-1 J_scaled

Covers: multi-section banding (cart-pole), path constraints + endpoint
constraints (brachistochrone variants), multiphase + global parameters
(multiphase point move), and non-uniform section node counts.
"""

import sys
from pathlib import Path

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp

sys.path.insert(0, str(Path(__file__).resolve().parents[2] / "examples"))


def _dense_kkt(it, x_full, lam, sig_free, dinv_rows, dw):
    """Dense condensed K over the free variables (reference)."""
    it._build_structured_derivatives()
    n = it.n_free
    xs = ((x_full - it.r_full) / it.V_full)[it.free_idx]
    theta = jnp.asarray(np.where(it.free_mask, 0.0, x_full))
    xs = jnp.asarray(xs)
    J = np.asarray(it.jac_c_scaled(xs, theta))
    H = np.asarray(it.hess_lag_scaled(xs, jnp.asarray(lam), theta))
    K = H + np.diag(sig_free) + dw * np.eye(n)
    K += J.T @ (np.asarray(dinv_rows)[:, None] * J)
    return K, xs, theta


def _build_iteration(problem):
    problem.settings.console_out_progress = False
    problem.initialise()
    return problem.backend.mesh_iterations[0]


def _check_problem(it, seed=0, dw=0.0, rtol=1e-8, atol=1e-10):
    from pycollo_tpu.solver.block_kkt import BlockKKT
    rng = np.random.default_rng(seed)
    lay = it.layout
    m = lay.m_total
    n = it.n_free

    # Random interior-ish point: perturb the guess.
    x_full = np.array(it.x_full_guess)
    x_full[it.free_idx] += 0.01 * rng.standard_normal(n) \
        * np.maximum(1.0, np.abs(x_full[it.free_idx]))
    lam = rng.standard_normal(m)
    sig_free = rng.uniform(0.1, 2.0, n)
    dinv_rows = rng.uniform(0.5, 3.0, m)

    K_dense, xs, theta = _dense_kkt(it, x_full, lam, sig_free,
                                    dinv_rows, 0.0)
    # Choose dw so K is guaranteed SPD (a random multiplier vector makes
    # the exact Lagrangian Hessian indefinite; the IPM's inertia
    # correction would do the same escalation).
    min_eig = float(np.linalg.eigvalsh(K_dense).min())
    dw = max(dw, -min_eig + 1.0)
    K_dense = K_dense + dw * np.eye(n)
    rhs = rng.standard_normal(n)
    dx_ref = np.linalg.solve(K_dense, rhs)

    kkt = BlockKKT(it)
    eta = jnp.asarray(it.W_c * lam)
    blocks, blocks_cvx = kkt.assemble(
        jnp.asarray(x_full), eta, jnp.asarray(sig_free),
        jnp.asarray(dinv_rows))
    # kmul must reproduce the dense matvec.
    v = rng.standard_normal(n)
    kv = np.asarray(kkt.kmul(blocks, jnp.asarray(dw), jnp.asarray(v)))
    np.testing.assert_allclose(kv, K_dense @ v, rtol=1e-7, atol=1e-8)

    factors = kkt.factor(blocks, jnp.asarray(dw))
    assert bool(factors.ok), "structured factorization not PD"
    dx = np.asarray(kkt.solve(blocks, factors, jnp.asarray(rhs)))
    np.testing.assert_allclose(dx, dx_ref, rtol=rtol, atol=atol)

    # The convexified (PSD-clipped Hessian) variant must factor at
    # dw ~ 0 even with the random (indefinite-Hessian) multipliers, and
    # its factor/solve/kmul must be mutually consistent.
    fac_cvx = kkt.factor(blocks_cvx, jnp.asarray(1e-10))
    assert bool(fac_cvx.ok), "convexified factorization not PD at dw~0"
    dx_c = kkt.solve(blocks_cvx, fac_cvx, jnp.asarray(rhs))
    res = np.asarray(kkt.kmul(blocks_cvx, jnp.asarray(1e-10), dx_c)) - rhs
    assert np.abs(res).max() < 1e-6 * max(1.0, np.abs(rhs).max()), \
        f"convexified solve residual {np.abs(res).max():.2e}"


def test_cart_pole_structured_kkt():
    from cart_pole_swing_up import build_problem
    it = _build_iteration(build_problem())
    _check_problem(it, seed=0, dw=0.5)


def test_cart_pole_nonuniform_mesh():
    from cart_pole_swing_up import build_problem
    problem = build_problem()
    phase = problem.phases[0]
    phase.mesh.number_mesh_sections = 4
    phase.mesh.mesh_section_sizes = [0.2, 0.3, 0.3, 0.2]
    phase.mesh.number_mesh_section_nodes = [3, 5, 4, 6]
    it = _build_iteration(problem)
    _check_problem(it, seed=1, dw=0.25)


def test_brachistochrone_structured_kkt():
    from brachistochrone import build_problem
    it = _build_iteration(build_problem())
    _check_problem(it, seed=2, dw=1.0)


def test_multiphase_with_parameters():
    from multiphase_point_move import build_problem
    it = _build_iteration(build_problem())
    _check_problem(it, seed=3, dw=0.5)


def test_space_shuttle_path_constraints():
    from space_shuttle_reentry_trajectory import build_problem
    it = _build_iteration(build_problem())
    _check_problem(it, seed=4, dw=1.0, rtol=1e-6, atol=1e-8)


def test_single_section_phase():
    from cart_pole_swing_up import build_problem
    problem = build_problem()
    phase = problem.phases[0]
    phase.mesh.number_mesh_sections = 1
    phase.mesh.number_mesh_section_nodes = 6
    it = _build_iteration(problem)
    _check_problem(it, seed=5, dw=0.5)


def test_gauss_newton_level():
    from cart_pole_swing_up import build_problem
    problem = build_problem()
    problem.settings.derivative_level = 1
    it = _build_iteration(problem)
    _check_problem(it, seed=6, dw=0.5)
