"""Free-flying robot integration test.

Parity with the reference
(``tests/integration/test_free_flying_robot.py:176-205``): the
6-state/4-control problem with L1-style thrust objective must solve to the
GPOPS-II objective 7.9101902 (SOS 7.910154646) at rtol 1e-4 with the mesh
tolerance met.  The reference test loosens the mesh tolerance to 1e-5 with
max 15 mesh iterations — this problem's bang-bang controls make the default
1e-7 churn in both frameworks.
"""

import sys
from pathlib import Path

import numpy as np
import pytest

sys.path.insert(0, str(Path(__file__).parent.parent.parent / "examples"))


@pytest.mark.slow
@pytest.mark.heavy
def test_free_flying_robot_solves():
    from free_flying_robot import build_problem
    problem = build_problem()
    problem.settings.console_out_progress = False
    problem.settings.mesh_tolerance = 1e-5
    problem.settings.max_mesh_iterations = 15
    solution = problem.solve()
    assert np.isclose(solution.objective, 7.9101902, rtol=1e-4) \
        or np.isclose(solution.objective, 7.910154646, rtol=1e-4)
    assert problem.mesh_tolerance_met is True


@pytest.mark.slow
def test_free_flying_robot_first_iteration():
    """Fast variant: the first-mesh NLP must converge (the L1-thrust
    reformulation needs several refinement rounds to reach the oracle —
    that full run is the ``heavy``-marked test above)."""
    from free_flying_robot import build_problem
    problem = build_problem()
    problem.settings.console_out_progress = False
    problem.settings.max_mesh_iterations = 1
    solution = problem.solve()
    assert solution.it_result.converged
    assert np.isfinite(solution.objective)
