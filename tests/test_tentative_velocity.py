"""Integration test of the tentative-velocity step, ported from the
reference test/test_tentative_velocity.py: the solver's assembled LHS/RHS
must match a from-scratch monolithic assembly of the same scheme (CN
average, AB2 convecting velocity, per-component RHS with p*v.dx(i), body
force, and outlet surface term), over low_memory x body_force."""

import numpy as np
import pytest

from oasisx_tpu import DirichletBC, FractionalStep_AB_CN, LocatorMethod, PressureBC
from oasisx_tpu.meshes import create_unit_square, locate_entities_boundary, meshtags
from oasisx_tpu.spaces import FunctionSpace

from oracle import Oracle


def _setup_bcs(mesh):
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
    return tags, left, tb, right


class Inlet:
    def __init__(self, t):
        self.t = t

    def eval(self, x):
        return (1 + self.t) * np.sin(np.pi * x[1])


@pytest.mark.parametrize("body_force", [True, False])
@pytest.mark.parametrize("low_memory", [True, False])
def test_tentative(low_memory, body_force):
    mesh = create_unit_square(10)
    el_u = ("Lagrange", 1)
    el_p = ("Lagrange", 1)
    solver_options = {"tentative": {"ksp_type": "preonly", "pc_type": "lu"}}
    options = {"low_memory_version": low_memory}
    f = np.array([0.3, -0.1]) if body_force else None

    tags, left, tb, right = _setup_bcs(mesh)
    inlet = Inlet(0)
    bc_tb = DirichletBC(0.0, LocatorMethod.TOPOLOGICAL, (tags, 2))
    bc_inlet_x = DirichletBC(inlet.eval, LocatorMethod.TOPOLOGICAL, (tags, 1))
    bc_inlet_y = DirichletBC(0.0, LocatorMethod.TOPOLOGICAL, (tags, 1))
    bcs_u = [[bc_inlet_x, bc_tb], [bc_inlet_y, bc_tb]]
    p_value = 4.0
    bcs_p = [PressureBC(p_value, (tags, 3))]

    solver = FractionalStep_AB_CN(
        mesh,
        el_u,
        el_p,
        bcs_u=bcs_u,
        bcs_p=bcs_p,
        solver_options=solver_options,
        options=options,
        body_force=f,
    )

    dt, nu = 0.1, 0.5
    inlet.t = -2 * dt
    solver._u2[0].interpolate(inlet.eval)
    solver._u2[1].interpolate(inlet.eval)
    inlet.t = -dt
    solver._u1[0].interpolate(inlet.eval)
    solver._u1[1].interpolate(inlet.eval)
    inlet.t = dt
    bc_inlet_x.update_bc()
    solver._ps.interpolate(lambda x: x[1])
    solver.assemble_first(dt, nu)
    solver.velocity_tentative_assemble()
    diff, errors = solver.velocity_tentative_solve()
    assert (errors > 0).all()

    # ---- reference implementation: monolithic oracle assembly -------------
    V = FunctionSpace(mesh, el_u)
    Q = FunctionSpace(mesh, el_p)
    orc = Oracle(mesh, V.element, V.dofmap, Q.element, Q.dofmap, qdeg=5)
    xd = V.dof_coords
    u_n = (1 + (-dt)) * np.sin(np.pi * xd[:, 1])
    u_n2 = (1 + (-2 * dt)) * np.sin(np.pi * xd[:, 1])
    uab1 = 1.5 * u_n - 0.5 * u_n2
    uab = np.stack([uab1, uab1])
    M = orc.mass()
    K = orc.stiffness()
    C = orc.convection(uab)
    A = M / dt + 0.5 * C + 0.5 * nu * K
    bc0 = np.unique(
        np.concatenate(
            [
                V.locate_dofs_topological(1, left),
                V.locate_dofs_topological(1, tb),
            ]
        )
    )
    A[bc0, :] = 0.0
    A[bc0, bc0] = 1.0
    A_solver = solver.tentative_matrix_dense()
    assert np.abs(A_solver - A).max() < 1e-12

    # RHS: L = (M/dt - C/2 - nu K/2) u_n + p v.dx(i) + f_i v + surface
    ps = Q.dof_coords[:, 1]  # interpolation of x[1]
    L_common = (M / dt - 0.5 * C - 0.5 * nu * K) @ u_n
    from test_bcs import _facet_oracle

    for i in range(2):
        b = L_common + orc.pressure_gradient_vec(i, ps)
        if body_force:
            # constant body force: f_i * \int v dx
            load = np.zeros(V.num_dofs)
            e = np.einsum("q,qj,c->cj", orc.w, orc.phi_v, orc.detJ)
            np.add.at(load, V.dofmap.cell_dofs.reshape(-1), e.reshape(-1))
            b = b + f[i] * load
        b = b + _facet_oracle(mesh, V, Q, right, lambda p: np.full(p.shape[0], p_value), i)
        # set bc values
        if i == 0:
            b[V.locate_dofs_topological(1, left)] = (1 + dt) * np.sin(
                np.pi * xd[V.locate_dofs_topological(1, left), 1]
            )
        else:
            b[V.locate_dofs_topological(1, left)] = 0.0
        b[V.locate_dofs_topological(1, tb)] = 0.0
        assert np.abs(solver._rhs1[i].x.array - b).max() < 1e-12, i


def test_callable_body_force():
    """Spatially varying (callable) body force: assembled b0 must match the
    quadrature oracle (this path previously evaluated f on a mismatched
    quadrature rule)."""
    mesh = create_unit_square(6)
    f0 = lambda x: 0.3 + 0.0 * x[0]
    f1 = lambda x: x[0] * x[1]
    tags, left, tb, right = _setup_bcs(mesh)
    bc = DirichletBC(0.0, LocatorMethod.TOPOLOGICAL, (tags, 2))
    solver = FractionalStep_AB_CN(
        mesh, ("Lagrange", 2), ("Lagrange", 1),
        bcs_u=[[bc], [bc]], bcs_p=[], body_force=(f0, f1),
    )
    V = FunctionSpace(mesh, ("Lagrange", 2))
    Q = FunctionSpace(mesh, ("Lagrange", 1))
    # direct oracle: int f v dx with f at physical qp
    from oasisx_tpu.elements.quadrature import quadrature

    pts, w = quadrature("triangle", 8)
    phi, _ = V.element.tabulate(pts)
    v0 = mesh.x[mesh.cells[:, 0]]
    J = np.stack([mesh.x[mesh.cells[:, i + 1]] - v0 for i in range(2)], axis=2)
    detJ = np.abs(np.linalg.det(J))
    xphys = v0[:, None, :] + np.einsum("cgd,qd->cqg", J, pts)
    for i, f in enumerate((f0, f1)):
        fq = f([xphys[:, :, 0], xphys[:, :, 1]])
        e = np.einsum("q,cq,qj,c->cj", w, fq, phi, detJ)
        ref = np.zeros(V.num_dofs)
        np.add.at(ref, V.dofmap.cell_dofs.reshape(-1), e.reshape(-1))
        assert np.abs(solver._b0[i].x.array - ref).max() < 1e-12, i
