"""Hypersensitive problem integration test.

Parity with the reference (``tests/integration/test_hypersensitive_problem.py``):
the stiff boundary-layer problem (tF = 10000) must solve through the full
ph-adaptive refinement loop to the GPOPS-II objective 3.36206 at rtol 1e-4
with the mesh tolerance met.  Exercises adaptive-barrier IPM, warm-started
mesh iterations and order-increase/subdivision refinement decisions.
"""

import sys
from pathlib import Path

import numpy as np
import pytest

sys.path.insert(0, str(Path(__file__).parent.parent.parent / "examples"))


@pytest.mark.slow
def test_hypersensitive_solves():
    from hypersensitive_problem import build_problem
    problem = build_problem()
    problem.settings.console_out_progress = False
    solution = problem.solve()
    assert np.isclose(solution.objective, 3.36206, rtol=1e-4)
    assert problem.mesh_tolerance_met is True
