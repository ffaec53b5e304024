"""Cube-path (shared cube-matrix) vs general element path: equivalence test.

(The round-1 ``shape_uniform`` per-shape path was superseded by the
cube-batched operators in assembly/cubes.py; this test now gates the
default cube path against the general element-matrix engine through the
full solver.)
"""

import numpy as np
import pytest

from oasisx_tpu import DirichletBC, FractionalStep_AB_CN, LocatorMethod
from oasisx_tpu.meshes import create_box, meshtags


def _build(cube):
    mesh = create_box((-1, -1, -1), (1, 1, 1), (4, 4, 4))
    facets = mesh.exterior_facet_indices()
    tags = meshtags(mesh, 2, facets, np.full_like(facets, 1))
    bcs = [[DirichletBC(0.0, LocatorMethod.TOPOLOGICAL, (tags, 1))] for _ in range(3)]
    s = FractionalStep_AB_CN(
        mesh, ("Lagrange", 2), ("Lagrange", 1), bcs, [],
        solver_options={k: {"ksp_rtol": 1e-12} for k in ("tentative", "pressure", "scalar")},
        options={"cube": cube},
    )
    for i in range(3):
        s._u1[i].interpolate(lambda x: 0.2 * np.sin(np.pi * x[0]) * np.cos(np.pi * x[1]))
        s._u2[i].interpolate(lambda x: 0.2 * np.sin(np.pi * x[0]) * np.cos(np.pi * x[1]))
    return s


def test_cube_path_matches_elems_path():
    s_cu = _build(True)
    s_el = _build(False)
    assert s_cu._co is not None and s_el._co is None
    for _ in range(2):
        s_cu.solve(0.02, 0.05, max_iter=2)
        s_el.solve(0.02, 0.05, max_iter=2)
    for i in range(3):
        a, b = s_cu._u[i].x.array, s_el._u[i].x.array
        assert np.abs(a - b).max() < 1e-8 * max(1.0, np.abs(b).max())
    assert np.abs(s_cu._p.x.array - s_el._p.x.array).max() < 1e-7
