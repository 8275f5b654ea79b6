"""Mesh / transcription-table unit tests (parity with reference
``tests/unit/test_mesh.py`` coverage of section boundaries, node counts and
operator assembly, ``pycollo/mesh.py:236-356``)."""

import numpy as np
import pytest

from pycollo_tpu.mesh import PhaseMesh, build_phase_tables


def test_phase_mesh_defaults():
    pm = PhaseMesh()
    assert pm.number_mesh_sections == 10
    np.testing.assert_allclose(pm.mesh_section_sizes, np.ones(10) / 10)
    np.testing.assert_array_equal(pm.number_mesh_section_nodes,
                                  np.full(10, 4))


def test_phase_mesh_sizes_normalized():
    pm = PhaseMesh(number_mesh_sections=4, mesh_section_sizes=[1, 2, 3, 4])
    np.testing.assert_allclose(pm.mesh_section_sizes.sum(), 1.0)
    np.testing.assert_allclose(pm.mesh_section_sizes,
                               np.array([1, 2, 3, 4]) / 10)


def test_phase_mesh_size_mismatch():
    pm = PhaseMesh(number_mesh_sections=3)
    with pytest.raises(ValueError):
        pm.mesh_section_sizes = [1, 2]


def test_tables_default_mesh():
    t = build_phase_tables("lobatto", np.ones(10) / 10, [4] * 10)
    assert t.N == 31
    assert t.num_defect == 30
    assert t.K == 10
    assert t.tau[0] == -1.0 and t.tau[-1] == 1.0
    np.testing.assert_allclose(t.W.sum(), 2.0, rtol=1e-12)
    np.testing.assert_array_equal(t.section_starts,
                                  np.arange(0, 30, 3))


def test_defect_operator_exact_on_polynomials():
    """E y + I f vanishes when y' = f exactly (polynomial dynamics)."""
    for method in ("lobatto", "radau"):
        t = build_phase_tables(method, [0.3, 0.2, 0.5], [4, 5, 6])
        y = t.tau ** 3 - 2 * t.tau
        f = 3 * t.tau ** 2 - 2
        np.testing.assert_allclose(t.E @ y + t.I @ f, 0.0, atol=1e-12)


def test_quadrature_vector_integrates():
    """W integrates functions over the tau domain."""
    t = build_phase_tables("lobatto", np.ones(5) / 5, [6] * 5)
    np.testing.assert_allclose(t.W @ (t.tau ** 4), 2.0 / 5, atol=1e-12)


def test_nonuniform_sections():
    sizes = [0.1, 0.4, 0.5]
    t = build_phase_tables("lobatto", sizes, [4, 4, 4])
    np.testing.assert_allclose(t.h_sections, np.array(sizes) * 2.0)
    boundaries = t.tau[t.section_starts]
    np.testing.assert_allclose(boundaries, [-1.0, -0.8, 0.0], atol=1e-14)
