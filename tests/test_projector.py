"""Projector tests mirroring the reference test/test_projector.py:
analytic-exactness of DG gradient recovery (L2 error <= 1e-12) and RHS
re-assembly after coefficient update."""

import numpy as np

from oasisx_tpu import LumpedProject, Projector
from oasisx_tpu.elements import FiniteElement
from oasisx_tpu.forms.expr import as_vector, assemble_scalar, grad, inner
from oasisx_tpu.meshes import create_unit_square
from oasisx_tpu.spaces import Function, FunctionSpace


def test_gradient_projection_exact():
    """Project grad(u) of a P2 polynomial into vector DG1 with a direct-tier
    solver; the gradient is linear, so the projection is exact
    (reference test_projector.py:32-50)."""
    mesh = create_unit_square(10)
    V = FunctionSpace(mesh, ("Lagrange", 2))
    u = Function(V)
    u.interpolate(lambda x: x[0] ** 2 + 2 * x[1] ** 2 + 0.5 * x[0] * x[1])

    W = FunctionSpace(mesh, FiniteElement("DG", "triangle", 1), shape=(2,))
    proj = Projector(
        grad(u), W, petsc_options={"ksp_type": "preonly", "pc_type": "lu"}
    )
    reason = proj.solve()
    assert reason > 0

    x = W.dof_coords
    exact = np.stack([2 * x[:, 0] + 0.5 * x[:, 1], 4 * x[:, 1] + 0.5 * x[:, 0]], axis=1)
    got = proj.x.x.array.reshape(-1, 2)
    assert np.abs(got - exact).max() < 1e-10

    # L2 error via the expression layer
    from oasisx_tpu.forms.expr import as_expr

    pf = as_expr(proj.x)
    diff = grad(u) - as_vector([pf[0], pf[1]])
    err = float(assemble_scalar(mesh, inner(diff, diff), qdegree=6))
    assert err < 1e-12


def test_projector_reassembly_after_update():
    """Changing the coefficient and re-solving with assemble_rhs=True tracks
    the new field (reference test_projector.py re-solve path)."""
    mesh = create_unit_square(6)
    V = FunctionSpace(mesh, ("Lagrange", 2))
    u = Function(V)
    u.interpolate(lambda x: x[0] ** 2)
    W = FunctionSpace(mesh, FiniteElement("DG", "triangle", 1), shape=(2,))
    proj = Projector(grad(u), W, petsc_options={"ksp_type": "preonly", "pc_type": "lu"})
    proj.solve()
    g1 = proj.x.x.array.copy()

    u.interpolate(lambda x: 3 * x[0] ** 2)
    proj.solve(assemble_rhs=True)
    g2 = proj.x.x.array
    assert np.abs(g2 - 3 * g1).max() < 1e-8


def test_projector_callable_and_scalar_space():
    mesh = create_unit_square(8)
    Q = FunctionSpace(mesh, ("Lagrange", 1))
    proj = Projector(lambda x: x[0] + x[1], Q, petsc_options={"ksp_rtol": 1e-13})
    assert proj.solve() > 0
    xc = Q.dof_coords
    assert np.abs(proj.x.x.array - (xc[:, 0] + xc[:, 1])).max() < 1e-8


def test_lumped_project():
    """LumpedProject reproduces constants exactly and approximates smooth
    fields (implements the reference's NotImplementedError stub)."""
    mesh = create_unit_square(8)
    Q = FunctionSpace(mesh, ("Lagrange", 1))
    lp = LumpedProject(lambda x: np.ones_like(x[0]) * 2.5, Q)
    lp.solve()
    assert np.abs(lp.x.x.array - 2.5).max() < 1e-12
