"""Tumour anti-angiogenesis integration test.

Parity with the reference
(``tests/integration/test_tumour_anti_angiogenesis.py:126-137``): the
2-state/1-control free-final-time problem must solve through the full
ph-adaptive refinement loop to the GPOPS-II objective 7.57166986e3
(SOS 7.5716831e3) at rtol 1e-4 with the mesh tolerance met.
"""

import sys
from pathlib import Path

import numpy as np
import pytest

sys.path.insert(0, str(Path(__file__).parent.parent.parent / "examples"))


@pytest.mark.slow
@pytest.mark.heavy
def test_tumour_anti_angiogenesis_solves():
    from tumour_anti_angiogenesis import build_problem
    problem = build_problem()
    problem.settings.console_out_progress = False
    solution = problem.solve()
    assert np.isclose(solution.objective, 7.57166986e3, rtol=1e-4) \
        or np.isclose(solution.objective, 7.5716831e3, rtol=1e-4)
    assert problem.mesh_tolerance_met is True


@pytest.mark.slow
def test_tumour_anti_angiogenesis_two_iterations():
    """Fast variant: two mesh iterations must already reproduce the
    GPOPS-II objective to coarse tolerance."""
    from tumour_anti_angiogenesis import build_problem
    problem = build_problem()
    problem.settings.console_out_progress = False
    problem.settings.max_mesh_iterations = 2
    solution = problem.solve()
    assert np.isclose(solution.objective, 7.57166986e3, rtol=1e-3)
