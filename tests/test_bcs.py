"""BC tests mirroring the reference test/test_bcs.py: DirichletBC dof
location/value equivalence across methods and degrees P1..P4, and
PressureBC surface-form correctness vs an independent physical-space
facet-quadrature oracle."""

import numpy as np
import pytest

from oasisx_tpu import DirichletBC, LocatorMethod, PressureBC
from oasisx_tpu.assembly import engine as eng
from oasisx_tpu.assembly.facets import build_facet_context, facet_area, pressure_surface_vecs
from oasisx_tpu.meshes import (
    create_unit_cube,
    create_unit_square,
    locate_entities_boundary,
    meshtags,
)
from oasisx_tpu.spaces import Constant, Function, FunctionSpace


@pytest.mark.parametrize("deg", [1, 2, 3, 4])
@pytest.mark.parametrize("mesh_fn", [lambda: create_unit_square(4), lambda: create_unit_cube(2)])
def test_dirichlet_geometrical_vs_topological(mesh_fn, deg):
    mesh = mesh_fn()
    V = FunctionSpace(mesh, ("Lagrange", deg))
    marker = lambda x: np.isclose(x[0], 0.0)
    facets = locate_entities_boundary(mesh, mesh.dim - 1, marker)
    tags = meshtags(mesh, mesh.dim - 1, facets, np.full_like(facets, 2))

    bc_g = DirichletBC(1.5, LocatorMethod.GEOMETRICAL, marker)
    bc_t = DirichletBC(1.5, LocatorMethod.TOPOLOGICAL, (tags, 2))
    bc_g.create_bc(V)
    bc_t.create_bc(V)
    assert (np.sort(bc_g.dofs) == np.sort(bc_t.dofs)).all()

    # application: both set the same entries
    a = np.zeros(V.num_dofs)
    b = np.zeros(V.num_dofs)
    bc_g.apply(a)
    bc_t.apply(b)
    assert np.allclose(a, b)
    assert np.allclose(a[bc_g.dofs], 1.5)
    assert np.count_nonzero(a) == len(bc_g.dofs)


@pytest.mark.parametrize("deg", [1, 2, 3])
def test_dirichlet_value_kinds(deg):
    """float / Constant / callable values give consistent results; callables
    are re-interpolated by update_bc (time dependence, bcs.py:128-133)."""
    mesh = create_unit_square(4)
    V = FunctionSpace(mesh, ("Lagrange", deg))
    marker = lambda x: np.isclose(x[1], 1.0)

    class Inlet:
        def __init__(self):
            self.t = 0.0

        def eval(self, x):
            return (1 + self.t) * np.sin(np.pi * x[0])

    inlet = Inlet()
    bc_f = DirichletBC(2.0, LocatorMethod.GEOMETRICAL, marker)
    bc_c = DirichletBC(Constant(2.0), LocatorMethod.GEOMETRICAL, marker)
    bc_l = DirichletBC(inlet.eval, LocatorMethod.GEOMETRICAL, marker)
    for bc in (bc_f, bc_c, bc_l):
        bc.create_bc(V)
    assert np.allclose(bc_f.values, bc_c.values)
    x = V.dof_coords[bc_l.dofs]
    assert np.allclose(bc_l.values, np.sin(np.pi * x[:, 0]))
    inlet.t = 1.0
    bc_l.update_bc()
    assert np.allclose(bc_l.values, 2 * np.sin(np.pi * x[:, 0]))


def _facet_oracle(mesh, V, Q, facets, pfun, component):
    """Independent surface-form oracle: physical-edge Gauss quadrature with
    explicit phys->ref inversion per cell."""
    top = mesh.topology
    out = np.zeros(V.num_dofs)
    gp, gw = np.polynomial.legendre.leggauss(6)
    gp = (gp + 1) / 2
    gw = gw / 2
    for f in facets:
        c = top.facet_cells[f, 0]
        verts = mesh.x[top.facets[f]]
        cellv = mesh.x[mesh.cells[c]]
        J = (cellv[1:] - cellv[0]).T
        Jinv = np.linalg.inv(J)
        if mesh.dim == 2:
            t = verts[1] - verts[0]
            scale = np.linalg.norm(t)
            n = np.array([t[1], -t[0]]) / scale
            pts = verts[0][None, :] + gp[:, None] * t[None, :]
            w = gw * scale
        else:
            e1, e2 = verts[1] - verts[0], verts[2] - verts[0]
            cr = np.cross(e1, e2)
            scale = np.linalg.norm(cr)
            n = cr / scale
            from oasisx_tpu.elements.quadrature import quadrature

            q2, w2 = quadrature("triangle", 8)
            pts = verts[0][None, :] + q2 @ np.stack([e1, e2])
            w = w2 * scale
        mid = verts.mean(axis=0)
        if np.dot(n, mid - cellv.mean(axis=0)) < 0:
            n = -n
        X = (pts - cellv[0][None, :]) @ Jinv.T  # ref coords
        _, dphi = V.element.tabulate(X)
        gphys = np.einsum("bg,qbn->qgn", Jinv, dphi)
        pq = pfun(pts)
        contrib = np.einsum("q,q,qn->n", w, pq, gphys[:, component, :]) * n[component]
        np.add.at(out, V.dofmap.cell_dofs[c], contrib)
    return out


@pytest.mark.parametrize("mesh_fn", [lambda: create_unit_square(3), lambda: create_unit_cube(2)])
@pytest.mark.parametrize("du", [1, 2])
def test_pressure_surface_form_vs_oracle(mesh_fn, du):
    mesh = mesh_fn()
    V = FunctionSpace(mesh, ("Lagrange", du))
    Q = FunctionSpace(mesh, ("Lagrange", 1))
    ctx, _ = eng.build_device_context(
        mesh, V.element, V.dofmap.cell_dofs, V.num_dofs, Q.element, Q.dofmap.cell_dofs, Q.num_dofs
    )
    facets = locate_entities_boundary(mesh, mesh.dim - 1, lambda x: np.isclose(x[0], 1.0))
    tags = meshtags(mesh, mesh.dim - 1, facets, np.full_like(facets, 3))

    # function-valued h(x) = 1 + x[1]
    bc = PressureBC(lambda x: 1.0 + x[1], (tags, 3))
    bc.create_bcs(V, Q)
    vecs = np.asarray(bc.assemble_rhs_all(ctx))
    for i in range(mesh.dim):
        oracle = _facet_oracle(mesh, V, Q, facets, lambda p: 1.0 + p[:, 1], i)
        assert np.abs(vecs[i] - oracle).max() < 1e-10, i

    # constant-valued h
    bc2 = PressureBC(4.0, (tags, 3))
    bc2.create_bcs(V, Q)
    vecs2 = np.asarray(bc2.assemble_rhs_all(ctx))
    for i in range(mesh.dim):
        oracle = _facet_oracle(mesh, V, Q, facets, lambda p: np.full(p.shape[0], 4.0), i)
        assert np.abs(vecs2[i] - oracle).max() < 1e-10

    # homogeneous pressure-correction dofs match topological location
    expect = Q.locate_dofs_topological(mesh.dim - 1, facets)
    assert (np.sort(bc.dofs) == np.sort(expect)).all()

    # rhs(i) handle matches the all-component assembly
    r0 = np.asarray(bc.rhs(0)(ctx))
    assert np.allclose(r0, vecs[0])


def test_facet_area():
    mesh = create_unit_square(5)
    V = FunctionSpace(mesh, ("Lagrange", 2))
    Q = FunctionSpace(mesh, ("Lagrange", 1))
    facets = mesh.exterior_facet_indices()
    f = build_facet_context(mesh, V.element, Q.element, facets)
    assert abs(float(facet_area(f)) - 4.0) < 1e-12
    mesh3 = create_unit_cube(2)
    V3 = FunctionSpace(mesh3, ("Lagrange", 1))
    f3 = build_facet_context(mesh3, V3.element, V3.element, mesh3.exterior_facet_indices())
    assert abs(float(facet_area(f3)) - 6.0) < 1e-12


def test_vertex_entity_dof_location():
    """Entity dim 0 (vertices) topological location (reference test_bcs
    covers entity dims 0..2)."""
    mesh = create_unit_square(4)
    V = FunctionSpace(mesh, ("Lagrange", 2))
    # corner vertex at (0,0) is vertex id with coords (0,0)
    vid = np.where((np.abs(mesh.x) < 1e-12).all(axis=1))[0]
    dofs = V.locate_dofs_topological(0, vid)
    assert len(dofs) == 1
    assert np.allclose(V.dof_coords[dofs[0]], [0.0, 0.0])


def test_pressure_bc_time_dependent_update():
    """PressureBC with a time-dependent callable: update_bc re-interpolates
    (reference bcs.py:255-260)."""
    mesh = create_unit_square(4)
    V = FunctionSpace(mesh, ("Lagrange", 2))
    Q = FunctionSpace(mesh, ("Lagrange", 1))
    from oasisx_tpu.assembly import engine as eng

    ctx, _ = eng.build_device_context(
        mesh, V.element, V.dofmap.cell_dofs, V.num_dofs, Q.element, Q.dofmap.cell_dofs, Q.num_dofs
    )
    facets = locate_entities_boundary(mesh, 1, lambda x: np.isclose(x[0], 1.0))
    tags = meshtags(mesh, 1, facets, np.full_like(facets, 3))

    class H:
        def __init__(self):
            self.t = 0.0

        def eval(self, x):
            return self.t * (1.0 + x[1])

    h = H()
    bc = PressureBC(h.eval, (tags, 3))
    bc.create_bcs(V, Q)
    r0 = np.asarray(bc.assemble_rhs_all(ctx))
    assert np.abs(r0).max() < 1e-14  # t=0 -> zero traction
    h.t = 2.0
    bc.update_bc()
    r2 = np.asarray(bc.assemble_rhs_all(ctx))
    oracle = _facet_oracle(mesh, V, Q, facets, lambda p: 2.0 * (1.0 + p[:, 1]), 0)
    assert np.abs(r2[0] - oracle).max() < 1e-10


def test_set_dofs_override():
    """DirichletBC.set_dofs bypasses location (reference bcs.py:103-104)."""
    mesh = create_unit_square(3)
    V = FunctionSpace(mesh, ("Lagrange", 1))
    bc = DirichletBC(7.0, LocatorMethod.GEOMETRICAL, lambda x: np.isclose(x[0], 0))
    bc.set_dofs(np.array([0, 5], dtype=np.int32))
    bc.create_bc(V)
    assert (np.sort(bc.dofs) == [0, 5]).all()
    assert np.allclose(bc.values, 7.0)
