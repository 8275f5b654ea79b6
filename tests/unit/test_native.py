"""Native C++ numerics library tests (build, load, accuracy)."""

import numpy as np
import pytest

from pycollo_tpu import native


@pytest.fixture(scope="module")
def lib():
    lib = native.get_lib()
    if lib is None:
        pytest.skip("native library unavailable (no C++ toolchain)")
    return lib


def test_lgl_matches_analytic(lib):
    pts, w = native.lgl_nodes_weights(4)
    np.testing.assert_allclose(
        pts, [-1.0, -1.0 / np.sqrt(5), 1.0 / np.sqrt(5), 1.0], atol=1e-15)
    np.testing.assert_allclose(w, np.array([1, 5, 5, 1]) / 6.0, atol=1e-15)


@pytest.mark.parametrize("n", [2, 5, 10, 15, 20])
def test_lgl_quadrature_exactness_high_order(lib, n):
    """Exactness to degree 2n-3 must hold tightly even at order 20."""
    pts, w = native.lgl_nodes_weights(n)
    for deg in range(0, 2 * n - 2):
        approx = np.dot(w, pts ** deg)
        exact = (1 - (-1.0) ** (deg + 1)) / (deg + 1)
        np.testing.assert_allclose(approx, exact, atol=5e-13)


@pytest.mark.parametrize("m", [1, 3, 8, 15, 19])
def test_lgr_quadrature_exactness(lib, m):
    pts, w = native.lgr_nodes_weights(m)
    assert pts[0] == -1.0
    for deg in range(0, 2 * m - 1):
        approx = np.dot(w, pts ** deg)
        exact = (1 - (-1.0) ** (deg + 1)) / (deg + 1)
        np.testing.assert_allclose(approx, exact, atol=5e-12)


def test_barycentric_interp(lib):
    xc = np.array(native.lgl_nodes_weights(6)[0])
    xq = np.linspace(-1, 1, 23)
    L = native.barycentric_interp_matrix(xc, xq)
    # Reproduces polynomials up to degree 5 exactly.
    for deg in range(6):
        np.testing.assert_allclose(L @ (xc ** deg), xq ** deg, atol=1e-13)
    # Identity at the nodes.
    Ln = native.barycentric_interp_matrix(xc, xc)
    np.testing.assert_allclose(Ln, np.eye(6), atol=0)


def test_quadrature_module_uses_native(lib):
    """quadrature.scheme must produce native-accuracy tables at order 20."""
    from pycollo_tpu import quadrature as quad
    quad.scheme.cache_clear()
    s = quad.scheme("lobatto", 20)
    deg = 2 * 20 - 3
    approx = np.dot(s.weights, s.points ** deg)
    exact = (1 - (-1.0) ** (deg + 1)) / (deg + 1)
    np.testing.assert_allclose(approx, exact, atol=1e-13)
