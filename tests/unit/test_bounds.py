"""Bounds-format normalization unit tests (coverage parity with reference
``tests/unit/test_bounds.py`` / ``test_user_bounds.py``:
scalar / pair / list / dict forms, None -> inf handling, clash tolerance,
equal-bounds elimination masks, endpoint overrides)."""

import numpy as np
import pytest

from pycollo_tpu.bounds import process_bounds_value
from pycollo_tpu.settings import Settings


INF = 1e19


def test_scalar_single_variable():
    out = process_bounds_value(5.0, 1, ["x"], INF, True)
    np.testing.assert_array_equal(out, [[5.0, 5.0]])


def test_pair_single_variable():
    out = process_bounds_value([1.0, 2.0], 1, ["x"], INF, True)
    np.testing.assert_array_equal(out, [[1.0, 2.0]])


def test_list_of_pairs():
    out = process_bounds_value([[0, 1], [2, 3]], 2, ["x", "y"], INF, True)
    np.testing.assert_array_equal(out, [[0, 1], [2, 3]])


def test_list_of_scalars():
    out = process_bounds_value([1.5, 2.5], 2, ["x", "y"], INF, True)
    np.testing.assert_array_equal(out, [[1.5, 1.5], [2.5, 2.5]])


def test_dict_by_name():
    out = process_bounds_value({"x": [0, 1], "y": 4}, 2, ["x", "y"], INF,
                               True)
    np.testing.assert_array_equal(out, [[0, 1], [4, 4]])


def test_dict_missing_entry_gets_inf():
    out = process_bounds_value({"x": [0, 1]}, 2, ["x", "y"], INF, True)
    np.testing.assert_array_equal(out[1], [-INF, INF])


def test_dict_unknown_key_raises():
    with pytest.raises(ValueError, match="Unknown variable"):
        process_bounds_value({"z": 1}, 1, ["x"], INF, True)


def test_none_requires_assume_inf():
    with pytest.raises(ValueError, match="assume_inf_bounds"):
        process_bounds_value(None, 1, ["x"], INF, False)
    out = process_bounds_value(None, 1, ["x"], INF, True)
    np.testing.assert_array_equal(out, [[-INF, INF]])


def test_wrong_length_raises():
    with pytest.raises(ValueError):
        process_bounds_value([[0, 1]], 2, ["x", "y"], INF, True)


def test_phase_bounds_processing(brachistochrone_problem):
    """End-to-end phase bounds: needed masks and endpoint overrides."""
    from pycollo_tpu.bounds import process_phase_bounds
    problem = brachistochrone_problem
    phase = problem.phases[0]
    pb = process_phase_bounds(phase, problem.settings)
    # t0 has equal bounds (0.0) -> not needed; tF is needed.
    np.testing.assert_array_equal(pb.t_needed, [False, True])
    # All states/controls needed (bounds are ranges).
    assert pb.y_needed.all() and pb.u_needed.all()
    # Initial state constraints pin all three states at node 0.
    np.testing.assert_array_equal(pb.y_t0_bnd,
                                  [[0, 0], [0, 0], [0, 0]])
    # Final state constraints pin x and y but leave v free (phase bounds).
    np.testing.assert_array_equal(pb.y_tF_bnd[0], [2, 2])
    np.testing.assert_array_equal(pb.y_tF_bnd[1], [2, 2])
    np.testing.assert_array_equal(pb.y_tF_bnd[2], [-50, 50])


def test_clash_tolerance_collapses():
    from pycollo_tpu.bounds import _check_clashes
    bnd = np.array([[1.0 + 1e-8, 1.0]])
    out = _check_clashes(bnd, ["x"], "test", 1e-6, 1e-6)
    assert out[0, 0] == out[0, 1]


def test_clash_error():
    from pycollo_tpu.bounds import _check_clashes
    with pytest.raises(ValueError, match="exceeds upper"):
        _check_clashes(np.array([[2.0, 1.0]]), ["x"], "test", 1e-6, 1e-6)
