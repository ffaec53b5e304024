"""Multi-device sharding tests on the virtual 8-CPU mesh: sharded results
must equal single-device results — the moral equivalent of the reference's
gather_PETScMatrix cross-rank comparison (SURVEY §4)."""

import jax
import numpy as np
import pytest
from jax.sharding import Mesh

from oasisx_tpu import DirichletBC, FractionalStep_AB_CN, LocatorMethod, PressureBC
from oasisx_tpu.meshes import create_unit_square, locate_entities_boundary, meshtags


def _make_mesh(n_dev):
    devs = np.array(jax.devices()[:n_dev])
    return Mesh(devs, axis_names=("cells",))


def _build(device_mesh=None):
    mesh = create_unit_square(10)
    dim = mesh.dim - 1
    left = locate_entities_boundary(mesh, dim, lambda x: np.isclose(x[0], 0))
    tb = locate_entities_boundary(
        mesh, dim, lambda x: np.isclose(x[1], 0) | np.isclose(x[1], 1)
    )
    right = locate_entities_boundary(mesh, dim, lambda x: np.isclose(x[0], 1))
    facets = np.hstack([left, tb, right])
    values = np.hstack(
        [
            np.full_like(left, 1, dtype=np.int32),
            np.full_like(tb, 2, dtype=np.int32),
            np.full_like(right, 3, dtype=np.int32),
        ]
    )
    tags = meshtags(mesh, dim, facets, values)
    inlet = lambda x: np.sin(np.pi * x[1])
    bcs_u = [
        [
            DirichletBC(inlet, LocatorMethod.TOPOLOGICAL, (tags, 1)),
            DirichletBC(0.0, LocatorMethod.TOPOLOGICAL, (tags, 2)),
        ],
        [
            DirichletBC(0.0, LocatorMethod.TOPOLOGICAL, (tags, 1)),
            DirichletBC(0.0, LocatorMethod.TOPOLOGICAL, (tags, 2)),
        ],
    ]
    bcs_p = [PressureBC(lambda x: 1.0 + 0.1 * x[1], (tags, 3))]
    solver = FractionalStep_AB_CN(
        mesh,
        ("Lagrange", 2),
        ("Lagrange", 1),
        bcs_u=bcs_u,
        bcs_p=bcs_p,
        solver_options={
            "tentative": {"ksp_rtol": 1e-12},
            "pressure": {"ksp_rtol": 1e-12},
            "scalar": {"ksp_rtol": 1e-12},
        },
        device_mesh=device_mesh,
    )
    for i in range(2):
        solver._u1[i].interpolate(lambda x: 0.1 * np.sin(np.pi * x[0]) * np.sin(np.pi * x[1]))
        solver._u2[i].interpolate(lambda x: 0.1 * np.sin(np.pi * x[0]) * np.sin(np.pi * x[1]))
    return solver


@pytest.mark.parametrize("n_dev", [4, 8])
def test_sharded_step_matches_single_device(n_dev):
    assert len(jax.devices()) >= n_dev, "conftest must force 8 CPU devices"
    s_ref = _build(device_mesh=None)
    s_sh = _build(device_mesh=_make_mesh(n_dev))
    dt, nu = 0.05, 0.1
    for _ in range(3):
        s_ref.solve(dt, nu, max_iter=2)
        s_sh.solve(dt, nu, max_iter=2)
    for i in range(2):
        scale = np.abs(s_ref._u[i].x.array).max()
        assert np.abs(s_ref._u[i].x.array - s_sh._u[i].x.array).max() < 1e-9 * scale
    pscale = np.abs(s_ref._p.x.array).max()
    assert np.abs(s_ref._p.x.array - s_sh._p.x.array).max() < 1e-9 * pscale


def test_sharded_run_loop():
    s = _build(device_mesh=_make_mesh(8))
    stats = s.run(3, 0.05, 0.1, max_iter=1)
    assert stats["u_converged"].all()
    assert not np.isnan(s._u[0].x.array).any()
