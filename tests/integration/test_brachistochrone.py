"""Brachistochrone integration test.

Parity with the reference (``tests/integration/test_brachistochrone.py``):
build the canonical OCP, solve end-to-end, and compare against the GPOPS-II
objective 0.82434 at rtol 1e-4 with the mesh tolerance met.
"""

import numpy as np
import pytest


def test_brachistochrone_solves(brachistochrone_problem):
    problem = brachistochrone_problem
    problem.settings.console_out_progress = False
    problem.initialise()
    solution = problem.solve()
    assert np.isclose(solution.objective, 0.82434, rtol=1e-4)
    assert problem.mesh_tolerance_met is True


def test_brachistochrone_solution_structure(brachistochrone_problem):
    problem = brachistochrone_problem
    problem.settings.console_out_progress = False
    solution = problem.solve()
    # Solution accessors (reference API parity).
    assert len(solution.state) == 1
    y = solution.state[0]
    assert y.shape[0] == 3
    t = solution.time[0]
    assert t[0] == pytest.approx(0.0)
    assert t[-1] == pytest.approx(solution.objective, rel=1e-10)
    # Endpoint states hit their pinned values.
    np.testing.assert_allclose(y[:, 0], [0.0, 0.0, 0.0], atol=1e-9)
    np.testing.assert_allclose(y[0, -1], 2.0, atol=1e-9)
    np.testing.assert_allclose(y[1, -1], 2.0, atol=1e-9)
    # Physics: v at final time satisfies energy conservation v^2 = 2 g y.
    v_final = y[2, -1]
    np.testing.assert_allclose(v_final, np.sqrt(2 * 9.81 * 2.0), rtol=1e-5)


def test_brachistochrone_radau(brachistochrone_problem):
    """The Radau scheme solves the same problem to the same objective."""
    problem = brachistochrone_problem
    problem.settings.console_out_progress = False
    problem.settings.quadrature_method = "radau"
    solution = problem.solve()
    assert np.isclose(solution.objective, 0.82434, rtol=1e-4)
