"""Every example problem must build and initialise (transcribe).

Fast coverage of the whole example suite: symbol preprocessing, aux-data
resolution, bounds/guess normalization, and the first mesh iteration's
transcription construct without error.  Full solves of the expensive
problems are covered selectively elsewhere.
"""

import sys
from pathlib import Path

import pytest

sys.path.insert(0, str(Path(__file__).parent.parent.parent / "examples"))

EXAMPLES = [
    "brachistochrone",
    "hypersensitive_problem",
    "cart_pole_swing_up",
    "cart_pole_swing_up_implicit",
    "double_pendulum",
    "free_flying_robot",
    "multiphase_point_move",
    "path_follow",
    "space_shuttle_reentry_trajectory",
    "space_station_attitude_control",
    "tumour_anti_angiogenesis",
    "delta_iii_launch_vehicle",
]


@pytest.mark.parametrize("module_name", EXAMPLES)
def test_example_initialises(module_name):
    import importlib
    module = importlib.import_module(module_name)
    problem = module.build_problem()
    problem.settings.console_out_progress = False
    problem.initialise()
    it = problem.backend.mesh_iterations[0]
    assert it.n_free > 0
    assert it.layout.m_total > 0


@pytest.mark.parametrize("variant", ["orthogonal", "rate"])
def test_path_follow_variants(variant):
    import path_follow
    problem = path_follow.build_problem(variant)
    problem.settings.console_out_progress = False
    problem.initialise()
    assert problem.backend.mesh_iterations[0].n_free > 0


def test_kinetic_batch_reactor_builds():
    """Parity with the reference: the problem definition constructs but is
    explicitly incomplete (cannot be initialised without bounds/guess)."""
    import kinetic_batch_reactor
    problem = kinetic_batch_reactor.build_problem()
    assert problem.number_phases == 1
    assert problem.number_parameter_variables == 1
