"""Settings validation tests (parity with reference
``tests/unit/test_settings.py`` coverage of option validation)."""

import pytest

from pycollo_tpu import Settings


def test_defaults():
    s = Settings()
    assert s.backend == "jax"
    assert s.quadrature_method == "lobatto"
    assert s.collocation_matrix_form == "integral"
    assert s.mesh_tolerance == 1e-7
    assert s.max_mesh_iterations == 10
    assert s.collocation_points_min == 4
    assert s.collocation_points_max == 10
    assert s.scaling_method == "bounds"
    assert s.nlp_solver == "ipm"
    assert s.linear_solver == "condensed-cholesky"
    assert s.derivative_level == 2


def test_quadrature_options():
    s = Settings()
    s.quadrature_method = "radau"
    assert s.quadrature_method == "radau"
    with pytest.raises(ValueError, match="not currently supported"):
        s.quadrature_method = "gauss"
    with pytest.raises(ValueError, match="not a valid option"):
        s.quadrature_method = "simpson"


def test_unsupported_backends():
    s = Settings()
    with pytest.raises(ValueError, match="not currently supported"):
        s.backend = "casadi"


def test_collocation_points_cross_validation():
    s = Settings()
    with pytest.raises(ValueError):
        s.collocation_points_min = 12   # above max (10)
    s.collocation_points_max = 15
    s.collocation_points_min = 12
    assert s.collocation_points_min == 12
    with pytest.raises(ValueError):
        s.collocation_points_max = 11   # below min
    with pytest.raises(ValueError):
        s.collocation_points_max = 21   # above hard bound


def test_tolerance_ranges():
    s = Settings()
    with pytest.raises(ValueError):
        s.mesh_tolerance = 2.0
    with pytest.raises(ValueError):
        s.nlp_tolerance = -1.0
    s.mesh_tolerance = 1e-6
    assert s.mesh_tolerance == 1e-6


def test_derivative_level():
    s = Settings()
    s.derivative_level = 1
    assert s.derivative_level == 1
    with pytest.raises(ValueError):
        s.derivative_level = 3


def test_scaling_none_via_none_literal():
    s = Settings()
    s.scaling_method = None
    assert s.scaling_method == "none"
