"""Mesh-layer tests: generators, topology, volumes, boundary extraction."""

import numpy as np
import pytest

from oasisx_tpu.meshes import (
    create_box,
    create_interval,
    create_rectangle,
    create_unit_cube,
    create_unit_square,
    locate_entities_boundary,
    meshtags,
)


def test_unit_square_counts():
    m = create_unit_square(4, 3)
    assert m.num_vertices == 5 * 4
    assert m.num_cells == 2 * 4 * 3
    assert abs(m.cell_volumes().sum() - 1.0) < 1e-14


def test_rectangle_volume():
    m = create_rectangle((-1, -1), (1, 1), (8, 8))
    assert abs(m.cell_volumes().sum() - 4.0) < 1e-13
    assert m.cell_volumes().min() > 0


def test_unit_cube_counts():
    m = create_unit_cube(3)
    assert m.num_vertices == 4**3
    assert m.num_cells == 6 * 27
    assert abs(m.cell_volumes().sum() - 1.0) < 1e-13
    assert m.cell_volumes().min() > 1e-8


def test_interval():
    m = create_interval(10)
    assert abs(m.cell_volumes().sum() - 1.0) < 1e-14


@pytest.mark.parametrize("mesh_fn", [lambda: create_unit_square(5), lambda: create_unit_cube(3)])
def test_facet_topology_consistency(mesh_fn):
    m = mesh_fn()
    top = m.topology
    # every interior facet has two cells, every exterior one
    interior = top.facet_cells[:, 1] >= 0
    assert (top.facet_cells[:, 0] >= 0).all()
    # Euler-ish sanity: counts match per-cell facets
    nlf = m.dim + 1
    assert 2 * interior.sum() + (~interior).sum() == m.num_cells * nlf
    # exterior facet area: unit square perimeter 4 / cube area 6
    fverts = m.x[top.facets[top.exterior_facets]]
    if m.dim == 2:
        lengths = np.linalg.norm(fverts[:, 1] - fverts[:, 0], axis=1)
        assert abs(lengths.sum() - 4.0) < 1e-12
    else:
        areas = 0.5 * np.linalg.norm(
            np.cross(fverts[:, 1] - fverts[:, 0], fverts[:, 2] - fverts[:, 0]), axis=1
        )
        assert abs(areas.sum() - 6.0) < 1e-12


def test_local_facet_convention():
    m = create_unit_square(2)
    top = m.topology
    # facet_local says which local facet: verify vertex sets match
    from oasisx_tpu.meshes import CELL_FACETS

    lf = CELL_FACETS["triangle"]
    for f in range(top.facets.shape[0]):
        for slot in range(2):
            c, loc = top.facet_cells[f, slot], top.facet_local[f, slot]
            if c < 0:
                continue
            verts = np.sort(m.cells[c][lf[loc]])
            assert (verts == top.facets[f]).all()


def test_locate_entities_boundary_and_tags():
    m = create_unit_square(10)
    left = locate_entities_boundary(m, 1, lambda x: np.isclose(x[0], 0.0))
    assert len(left) == 10
    ext = m.exterior_facet_indices()
    assert len(ext) == 4 * 10
    tags = meshtags(m, 1, ext, np.full_like(ext, 3))
    assert (tags.find(3) == np.sort(ext)).all()
    assert len(tags.find(7)) == 0


def test_h():
    m = create_unit_square(4)
    h = m.h()
    assert np.allclose(h, np.sqrt(2) / 4)


def test_refine_triangles_conforming_and_curved():
    """Red-green refinement: conforming (every interior edge shared by
    exactly 2 cells), positive volumes, curved-boundary midpoints
    reprojected (circle vertex count doubles per level), and no secant
    artifacts (no non-edge vertex pair closer than half the min edge)."""
    import numpy as np

    from oasisx_tpu.meshes.generation import create_cylinder_channel, refine_triangles

    c = np.array([0.2, 0.2])
    r = 0.05

    def project(p):
        d = np.linalg.norm(p - c, axis=1)
        on = np.abs(d - r) < 0.3 * r
        q = p.copy()
        q[on] = c + (p[on] - c) * (r / d[on])[:, None]
        return q

    m = create_cylinder_channel(20)
    n_circ_prev = int((np.abs(np.linalg.norm(m.x - c, axis=1) - r) < 1e-9).sum())
    for _ in range(2):
        cent = m.x[m.cells].mean(axis=1)
        mark = np.linalg.norm(cent - c, axis=1) < r * 2.5
        m = refine_triangles(m, mark, project=project)
        assert (m.cell_volumes() > 0).all()
        nv = len(m.x)
        cl = m.cells
        e = np.vstack([np.sort(cl[:, [1, 2]], axis=1),
                       np.sort(cl[:, [0, 2]], axis=1),
                       np.sort(cl[:, [0, 1]], axis=1)])
        k = e[:, 0] * nv + e[:, 1]
        _, cnt = np.unique(k, return_counts=True)
        assert cnt.max() == 2  # conforming
        n_circ = int((np.abs(np.linalg.norm(m.x - c, axis=1) - r) < 1e-9).sum())
        # grows per level (only boundary edges with both endpoints exactly
        # on the circle project their midpoints; the polygon is partly
        # off-circle by construction and the quality guard may keep a
        # straight midpoint at isolated spots)
        assert n_circ > n_circ_prev, (n_circ, n_circ_prev)
        n_circ_prev = n_circ
    # crowding guard: nearest non-identical vertex distance is a healthy
    # fraction of the min edge length (secant-projection artifact check)
    from scipy.spatial import cKDTree

    dd, _ = cKDTree(m.x).query(m.x, k=2)
    emin = min(
        np.linalg.norm(m.x[cl[:, a]] - m.x[cl[:, b]], axis=1).min()
        for a, b in [(0, 1), (1, 2), (0, 2)]
    )
    assert dd[:, 1].min() > 0.4 * emin


def test_refine_triangles_interior_only():
    """Refining a block in a rectangle: counts and conformity."""
    import numpy as np

    from oasisx_tpu.meshes import create_rectangle
    from oasisx_tpu.meshes.generation import refine_triangles

    m = create_rectangle((0, 0), (1, 1), (4, 4))
    cent = m.x[m.cells].mean(axis=1)
    mark = (cent[:, 0] < 0.5) & (cent[:, 1] < 0.5)
    m2 = refine_triangles(m, mark)
    assert len(m2.cells) > len(m.cells)
    assert (m2.cell_volumes() > 0).all()
    assert np.isclose(m2.cell_volumes().sum(), 1.0)
