"""Shape-uniform (shared-matrix) operator path: opt-in equivalence test."""

import numpy as np
import pytest

from oasisx_tpu import DirichletBC, FractionalStep_AB_CN, LocatorMethod
from oasisx_tpu.meshes import create_box, meshtags


def _build(shape_uniform):
    mesh = create_box((-1, -1, -1), (1, 1, 1), (4, 4, 4))
    facets = mesh.exterior_facet_indices()
    tags = meshtags(mesh, 2, facets, np.full_like(facets, 1))
    bcs = [[DirichletBC(0.0, LocatorMethod.TOPOLOGICAL, (tags, 1))] for _ in range(3)]
    s = FractionalStep_AB_CN(
        mesh, ("Lagrange", 2), ("Lagrange", 1), bcs, [],
        solver_options={k: {"ksp_rtol": 1e-12} for k in ("tentative", "pressure", "scalar")},
        options={"shape_uniform": shape_uniform},
    )
    for i in range(3):
        s._u1[i].interpolate(lambda x: 0.2 * np.sin(np.pi * x[0]) * np.cos(np.pi * x[1]))
        s._u2[i].interpolate(lambda x: 0.2 * np.sin(np.pi * x[0]) * np.cos(np.pi * x[1]))
    return s


def test_shape_uniform_matches_elems_path():
    s_su = _build(True)
    s_el = _build(False)
    assert s_su._su is not None and s_el._su is None
    for _ in range(2):
        s_su.solve(0.02, 0.05, max_iter=2)
        s_el.solve(0.02, 0.05, max_iter=2)
    for i in range(3):
        a, b = s_su._u[i].x.array, s_el._u[i].x.array
        assert np.abs(a - b).max() < 1e-8 * max(1.0, np.abs(b).max())
    assert np.abs(s_su._p.x.array - s_el._p.x.array).max() < 1e-7
