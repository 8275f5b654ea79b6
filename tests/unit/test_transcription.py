"""Transcription layout / scaling unit tests (coverage parity with the
reference's ``test_iteration.py`` / ``test_scaling.py`` slice and scaling
checks, SURVEY.md section 3.5 invariants)."""

import numpy as np
import pytest


@pytest.fixture
def compiled(brachistochrone_problem):
    brachistochrone_problem.initialise()
    return brachistochrone_problem.backend


def test_layout_counts(compiled):
    it = compiled.mesh_iterations[0]
    lay = it.layout
    pl = lay.phases[0]
    assert pl.ny == 3 and pl.nu == 1 and pl.nq == 0
    assert pl.N == 31 and pl.num_defect == 30
    # Full vector: 3*31 y + 1*31 u + 0 q + 2 t = 126.
    assert lay.n_full == 126
    # Constraints: 3*30 defects + endpoint(0) = 90.
    assert lay.m_total == 90
    # Variable layout ordering (SURVEY.md 3.5): y then u then q then t.
    assert pl.y_off == 0
    assert pl.u_off == 93
    assert pl.t_off == 124


def test_free_mask_eliminates_fixed(compiled):
    """t0 fixed at 0 and the pinned endpoint states leave the NLP
    (``pycollo/bounds.py:901-935`` capability)."""
    it = compiled.mesh_iterations[0]
    lay = it.layout
    pl = lay.phases[0]
    free = it.free_mask
    # t0 fixed, tF free.
    assert not free[pl.t_off]
    assert free[pl.t_off + 1]
    # Initial nodes of x, y, v pinned by initial_state_constraints.
    for j in range(3):
        assert not free[pl.y_off + j * pl.N]
    # Final nodes of x, y pinned; v free.
    assert not free[pl.y_off + 0 * pl.N + pl.N - 1]
    assert not free[pl.y_off + 1 * pl.N + pl.N - 1]
    assert free[pl.y_off + 2 * pl.N + pl.N - 1]
    # 126 total - 6 fixed = 120 free.
    assert it.n_free == 120


def test_variable_scaling_maps_to_unit_box(compiled):
    """Bounds scaling: x in [lb, ub] -> xs in [-0.5, 0.5]
    (``pycollo/scaling.py:87-92``)."""
    it = compiled.mesh_iterations[0]
    np.testing.assert_allclose(it.xs_lb.min(), -0.5)
    np.testing.assert_allclose(it.xs_ub.max(), 0.5)


def test_constraint_scaling_defects(compiled):
    """Defect rows scaled by 1/V_y (``pycollo/scaling.py:421-422``)."""
    it = compiled.mesh_iterations[0]
    pl = it.layout.phases[0]
    # V_y = [10, 10, 100] for x, y, v bounds.
    expected = np.repeat([1 / 10, 1 / 10, 1 / 100], pl.num_defect)
    np.testing.assert_allclose(
        it.W_c[pl.c_defect_off:pl.c_path_off], expected)


def test_guess_interpolated_linearly(compiled):
    it = compiled.mesh_iterations[0]
    pl = it.layout.phases[0]
    t = it.tables[0]
    x_guess = it.x_full_guess
    y0_nodes = x_guess[pl.y_off:pl.y_off + pl.N]
    # Linear guess from 0 to 2 over tau in [-1, 1].
    np.testing.assert_allclose(y0_nodes, (t.tau + 1.0), atol=1e-12)


def test_residuals_zero_for_consistent_trajectory(compiled):
    """Constraint residuals vanish for an exactly-consistent trajectory."""
    import jax.numpy as jnp
    it = compiled.mesh_iterations[0]
    lay = it.layout
    pl = lay.phases[0]
    t = it.tables[0]
    # Constant control u = 0: dynamics y' = (0, v, g) in time.
    # Choose t0=0, tF=2 -> stretch=1, time = tau+1.
    x_full = np.array(it.theta_default)
    time = t.tau + 1.0
    v = 9.81 * time
    yy = 9.81 * time ** 2 / 2.0
    xx = np.zeros_like(time)
    x_full[pl.y_slice] = np.concatenate([xx, yy, v])
    x_full[pl.u_slice] = 0.0
    x_full[pl.t_off] = 0.0
    x_full[pl.t_off + 1] = 2.0
    c = np.asarray(it._constraints_raw(jnp.asarray(x_full)))
    np.testing.assert_allclose(c, 0.0, atol=1e-10)


def test_endpoints_extraction(compiled):
    import jax.numpy as jnp
    it = compiled.mesh_iterations[0]
    ep = it.endpoints_of(jnp.asarray(it.x_full_guess))
    assert len(ep.phase) == 1
    np.testing.assert_allclose(np.asarray(ep.phase[0].y0), [0, 0, 0])
    np.testing.assert_allclose(np.asarray(ep.phase[0].yF), [2, 2, 0])
    assert float(ep.phase[0].tF) == 10.0
