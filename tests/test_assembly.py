"""Assembly engine differential tests vs the NumPy quadrature oracle.

Mirrors the reference's assembly-strategy equivalence gates
(test/test_tentative_velocity.py:229: max abs diff < 1e-14 on small meshes).
"""

import numpy as np
import pytest

from oasisx_tpu.assembly import engine as eng
from oasisx_tpu.elements import FiniteElement
from oasisx_tpu.meshes import create_unit_cube, create_unit_square
from oasisx_tpu.spaces import FunctionSpace

from oracle import Oracle

CASES = [
    ("square-P2P1", lambda: create_unit_square(4), 2, 1),
    ("square-P3P2", lambda: create_unit_square(3), 3, 2),
    ("cube-P2P1", lambda: create_unit_cube(2), 2, 1),
]


def setup(mesh_fn, du, dp):
    mesh = mesh_fn()
    V = FunctionSpace(mesh, ("Lagrange", du))
    Q = FunctionSpace(mesh, ("Lagrange", dp))
    ctx, refs = eng.build_device_context(
        mesh, V.element, V.dofmap.cell_dofs, V.num_dofs, Q.element, Q.dofmap.cell_dofs, Q.num_dofs
    )
    qdeg = max(3 * du - 1, du + dp, 2 * dp, 2)
    orc = Oracle(mesh, V.element, V.dofmap, Q.element, Q.dofmap, qdeg)
    return mesh, V, Q, ctx, orc


def dense_v(ctx, elems, V):
    cd = np.asarray(ctx.cd_v)
    return eng.elems_to_dense(np.asarray(elems), cd, cd, V.num_dofs, V.num_dofs)


@pytest.mark.parametrize("name,mesh_fn,du,dp", CASES, ids=[c[0] for c in CASES])
def test_mass_stiffness_vs_oracle(name, mesh_fn, du, dp):
    mesh, V, Q, ctx, orc = setup(mesh_fn, du, dp)
    M = dense_v(ctx, eng.mass_elems(ctx), V)
    assert np.abs(M - orc.mass()).max() < 1e-13
    assert abs(M.sum() - mesh.cell_volumes().sum()) < 1e-12
    K = dense_v(ctx, eng.stiffness_elems(ctx), V)
    assert np.abs(K - orc.stiffness()).max() < 1e-12
    # stiffness annihilates constants
    assert np.abs(K @ np.ones(V.num_dofs)).max() < 1e-11
    cdq = np.asarray(ctx.cd_q)
    Aq = eng.elems_to_dense(
        np.asarray(eng.stiffness_q_elems(ctx)), cdq, cdq, Q.num_dofs, Q.num_dofs
    )
    assert np.abs(Aq - orc.stiffness_q()).max() < 1e-12


@pytest.mark.parametrize("name,mesh_fn,du,dp", CASES, ids=[c[0] for c in CASES])
def test_convection_vs_oracle(name, mesh_fn, du, dp):
    mesh, V, Q, ctx, orc = setup(mesh_fn, du, dp)
    rng = np.random.RandomState(3)
    uab = rng.randn(mesh.dim, V.num_dofs)
    C = dense_v(ctx, eng.convection_elems(ctx, uab), V)
    assert np.abs(C - orc.convection(uab)).max() < 1e-12


@pytest.mark.parametrize("name,mesh_fn,du,dp", CASES, ids=[c[0] for c in CASES])
def test_mixed_vectors_vs_oracle(name, mesh_fn, du, dp):
    mesh, V, Q, ctx, orc = setup(mesh_fn, du, dp)
    rng = np.random.RandomState(7)
    p = rng.randn(Q.num_dofs)
    u = rng.randn(mesh.dim, V.num_dofs)
    pg = np.asarray(eng.pressure_gradient_vecs(ctx, p))
    gp = np.asarray(eng.grad_p_vecs(ctx, p))
    for i in range(mesh.dim):
        assert np.abs(pg[i] - orc.pressure_gradient_vec(i, p)).max() < 1e-12
        assert np.abs(gp[i] - orc.grad_p_vec(i, p)).max() < 1e-12
    dv = np.asarray(eng.divergence_vec(ctx, u))
    assert np.abs(dv - orc.divergence_vec(u)).max() < 1e-12


def test_divergence_free_field():
    mesh, V, Q, ctx, orc = setup(lambda: create_unit_square(5), 2, 1)
    # u = (y, x) has div = 0 exactly and lies in P2
    x = V.dof_coords
    u = np.stack([x[:, 1], x[:, 0]])
    dv = np.asarray(eng.divergence_vec(ctx, u))
    assert np.abs(dv).max() < 1e-13


def test_matvec_matches_dense():
    mesh, V, Q, ctx, orc = setup(lambda: create_unit_square(4), 2, 1)
    elems = eng.stiffness_elems(ctx)
    K = dense_v(ctx, elems, V)
    rng = np.random.RandomState(0)
    x = rng.randn(V.num_dofs)
    y = np.asarray(eng.matvec_v(ctx, elems, x))
    assert np.abs(y - K @ x).max() < 1e-12
    d = np.asarray(eng.diagonal_v(ctx, elems))
    assert np.abs(d - np.diag(K)).max() < 1e-12


def test_bc_row_masking():
    """zeroRowsLocal semantics: (A x)[bc] = x[bc]."""
    import jax.numpy as jnp

    mesh, V, Q, ctx, orc = setup(lambda: create_unit_square(4), 2, 1)
    elems = eng.stiffness_elems(ctx)
    bc = V.locate_dofs_geometrical(lambda x: np.isclose(x[0], 0.0))
    mask = np.zeros(V.num_dofs, dtype=bool)
    mask[bc] = True
    rng = np.random.RandomState(1)
    x = rng.randn(V.num_dofs)
    y = eng.apply_bc_rows(jnp.asarray(mask), eng.matvec_v(ctx, elems, x), jnp.asarray(x))
    K = dense_v(ctx, elems, V)
    K[bc, :] = 0.0
    K[bc, bc] = 1.0
    assert np.abs(np.asarray(y) - K @ x).max() < 1e-12
    # symmetric variant: zeroRowsColumns
    ys = eng.bc_symmetric_matvec(ctx, elems, jnp.asarray(mask), jnp.asarray(x), eng.matvec_v)
    Ks = dense_v(ctx, elems, V)
    Ks[bc, :] = 0.0
    Ks[:, bc] = 0.0
    Ks[bc, bc] = 1.0
    assert np.abs(np.asarray(ys) - Ks @ x).max() < 1e-12


def test_scalar_integrals():
    mesh, V, Q, ctx, orc = setup(lambda: create_unit_square(6), 2, 1)
    assert abs(float(eng.cell_volume_total(ctx)) - 1.0) < 1e-13
    # \int x^2 y dx over unit square = 1/6; x^2*y is in P3 -> exact at qdeg>=5
    x = V.dof_coords
    f = x[:, 0] ** 2 * x[:, 1]
    # P2 cannot represent x^2 y; instead integrate (x+y) in P1 subset of P2: = 1
    g = x[:, 0] + x[:, 1]
    vals = eng.eval_v_at_qp(ctx, g)
    assert abs(float(eng.integrate(ctx, vals)) - 1.0) < 1e-13
    # gradient evaluation: grad(x+y) = (1,1)
    gq = np.asarray(eng.grad_v_at_qp(ctx, g))
    assert np.abs(gq - 1.0).max() < 1e-12


def test_preassembled_mixed_matrices_match_action():
    """low_memory=False strategy (pressure-gradient matrices) equals the
    direct action — the reference's strategy-equivalence gate
    (demo/assembly_strategies.py:142)."""
    mesh, V, Q, ctx, orc = setup(lambda: create_unit_square(4), 2, 1)
    rng = np.random.RandomState(11)
    p = rng.randn(Q.num_dofs)
    mats = eng.pressure_gradient_mats(ctx)  # (d, nc, ndv, ndq)
    pg_action = np.asarray(eng.pressure_gradient_vecs(ctx, p))
    import jax.numpy as jnp

    for i in range(mesh.dim):
        ye = jnp.einsum("cjm,cm->cj", mats[i], jnp.asarray(p)[ctx.cd_q])
        y = np.asarray(eng.scatter_add(ye, ctx.cd_v, ctx.ndofs_v))
        assert np.abs(y - pg_action[i]).max() < 1e-13
