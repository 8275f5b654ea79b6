"""Quadrature scheme unit tests.

Parity with the reference's quadrature oracle tests
(``tests/unit/test_quadrature.py:48-55``): known LGL/LGR point/weight
values, plus exactness properties of the integration matrices.
"""

import numpy as np
import pytest

from pycollo_tpu import quadrature as quad


def test_lobatto_points_order_4():
    """LGL-4 points are [-1, -1/sqrt(5), 1/sqrt(5), 1]."""
    s = quad.scheme("lobatto", 4)
    expected = np.array([-1.0, -1.0 / np.sqrt(5), 1.0 / np.sqrt(5), 1.0])
    np.testing.assert_allclose(s.points, expected, atol=1e-14)


def test_lobatto_weights_order_4():
    """LGL-4 weights are [1/6, 5/6, 5/6, 1/6]."""
    s = quad.scheme("lobatto", 4)
    expected = np.array([1.0, 5.0, 5.0, 1.0]) / 6.0
    np.testing.assert_allclose(s.weights, expected, atol=1e-14)


def test_lobatto_points_order_3():
    s = quad.scheme("lobatto", 3)
    np.testing.assert_allclose(s.points, [-1.0, 0.0, 1.0], atol=1e-14)
    np.testing.assert_allclose(s.weights, [1 / 3, 4 / 3, 1 / 3],
                               atol=1e-14)


def test_radau_points_include_left_endpoint():
    for order in range(3, 11):
        s = quad.scheme("radau", order)
        assert s.points[0] == -1.0
        assert s.points[-1] == 1.0
        assert s.weights[-1] == 0.0
        assert s.num_collocation == order - 1


@pytest.mark.parametrize("order", range(2, 21))
def test_lobatto_weights_sum_to_two(order):
    s = quad.scheme("lobatto", order)
    np.testing.assert_allclose(s.weights.sum(), 2.0, rtol=1e-12)


@pytest.mark.parametrize("order", range(2, 21))
def test_radau_weights_sum_to_two(order):
    s = quad.scheme("radau", order)
    np.testing.assert_allclose(s.weights.sum(), 2.0, rtol=1e-10)


@pytest.mark.parametrize("order", range(2, 21))
def test_lobatto_quadrature_exactness(order):
    """Full-interval LGL quadrature is exact to degree 2n-3."""
    s = quad.scheme("lobatto", order)
    deg = 2 * order - 3
    approx = np.dot(s.weights, s.points ** deg)
    exact = (1 - (-1.0) ** (deg + 1)) / (deg + 1)
    np.testing.assert_allclose(approx, exact, atol=1e-9)


@pytest.mark.parametrize("order", range(2, 21))
def test_lobatto_integration_matrix_exactness(order):
    """Partial integrals are exact for polynomials of degree n-1."""
    s = quad.scheme("lobatto", order)
    deg = order - 1
    f = s.points ** deg
    exact = (s.points[1:] ** (deg + 1) - (-1.0) ** (deg + 1)) / (deg + 1)
    np.testing.assert_allclose(s.integration @ f, exact, atol=1e-9)


@pytest.mark.parametrize("order", range(2, 21))
def test_radau_integration_matrix_exactness(order):
    s = quad.scheme("radau", order)
    m = order - 1
    deg = m - 1
    f = s.points ** deg
    exact = (s.points[1:] ** (deg + 1) - (-1.0) ** (deg + 1)) / (deg + 1)
    np.testing.assert_allclose(s.integration @ f, exact, atol=1e-8)


def test_lobatto_integration_last_row_is_weights():
    for order in range(2, 15):
        s = quad.scheme("lobatto", order)
        np.testing.assert_allclose(s.integration[-1], s.weights,
                                   atol=1e-10)


def test_differentiation_matrix():
    """D applied to polynomial values gives derivative values."""
    s = quad.scheme("lobatto", 6)
    f = s.points ** 4
    df = 4 * s.points ** 3
    np.testing.assert_allclose(s.differentiation @ f, df, atol=1e-9)


def test_gauss_unsupported():
    with pytest.raises(ValueError, match="not currently supported"):
        quad.scheme("gauss", 4)


def test_order_out_of_range():
    with pytest.raises(ValueError):
        quad.scheme("lobatto", 21)
    with pytest.raises(ValueError):
        quad.scheme("lobatto", 1)


def test_interpolation_matrix_partition_of_unity():
    xc = quad.lobatto_points(5)
    xq = np.linspace(-1, 1, 17)
    L = quad.interpolation_matrix(xc, xq)
    np.testing.assert_allclose(L.sum(axis=1), np.ones(17), atol=1e-12)
    # Interpolation reproduces values at the nodes.
    Ln = quad.interpolation_matrix(xc, xc)
    np.testing.assert_allclose(Ln, np.eye(5), atol=1e-10)
