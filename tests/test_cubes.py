"""Differential tests: cube-batched operators vs the general element engine.

Strategy mirrors the reference's differential pattern (SURVEY §4): the same
operator applied two ways on the real stack must agree to roundoff.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from oasisx_tpu.assembly import cubes as cu
from oasisx_tpu.assembly import engine as eng
from oasisx_tpu.assembly.structured import build_structured_map
from oasisx_tpu.elements.element import FiniteElement
from oasisx_tpu.meshes import create_box, create_rectangle
from oasisx_tpu.spaces.functionspace import FunctionSpace


def setup(dim, N, du, dp):
    if dim == 2:
        mesh = create_rectangle((-1.0, -1.0), (1.0, 1.0), (N, N))
        cell = "triangle"
    else:
        mesh = create_box((-1.0, -1.0, -1.0), (1.0, 1.0, 1.0), (N, N, N))
        cell = "tetrahedron"
    el_u = FiniteElement("Lagrange", cell, du)
    el_p = FiniteElement("Lagrange", cell, dp)
    V = FunctionSpace(mesh, el_u)
    Q = FunctionSpace(mesh, el_p)
    ctx, refs = eng.build_device_context(
        mesh, el_u, V.dofmap.cell_dofs, V.num_dofs, el_p, Q.dofmap.cell_dofs, Q.num_dofs
    )
    rv = build_structured_map(mesh, el_u, V.dofmap)
    rq = build_structured_map(mesh, el_p, Q.dofmap)
    assert rv is not None and rq is not None
    (sm_v, gf_v, valid_v), (sm_q, gf_q, valid_q) = rv, rq
    ops = cu.build_cube_ops(mesh, refs, sm_v, sm_q)
    assert ops is not None
    return mesh, ctx, refs, ops, (sm_v, gf_v, valid_v), (sm_q, gf_q, valid_q)


CASES = [(2, 4, 2, 1), (2, 3, 1, 1), (3, 3, 2, 1), (3, 2, 2, 2), (3, 2, 3, 2), (2, 3, 4, 2)]


@pytest.mark.parametrize("dim,N,du,dp", CASES)
def test_matvec_constant_ops(dim, N, du, dp):
    mesh, ctx, refs, ops, (sm_v, gf_v, _), (sm_q, gf_q, _) = setup(dim, N, du, dp)
    rng = np.random.default_rng(3)
    nv, nq_ = ctx.ndofs_v, ctx.ndofs_q
    x = rng.standard_normal(nv)
    xq = rng.standard_normal(nq_)
    xqg = _grid(xq, gf_q, sm_q)

    M = eng.mass_elems(ctx)
    K = eng.stiffness_elems(ctx)
    Ap = eng.stiffness_q_elems(ctx)
    Mq = eng.mass_q_elems(ctx)

    for C, elems in [(ops.M_c, M), (ops.K_c, K)]:
        ref = np.asarray(eng.matvec_v(ctx, elems, jnp.asarray(x)))
        got = np.asarray(cu.matvec_cube(jnp.asarray(_grid(x, gf_v, sm_v)), C, sm_v))
        assert np.allclose(got[gf_v], ref, atol=1e-11), np.abs(got[gf_v] - ref).max()

    for C, elems in [(ops.Ap_c, Ap), (ops.Mq_c, Mq)]:
        ref = np.asarray(eng.matvec_q(ctx, elems, jnp.asarray(xq)))
        got = np.asarray(cu.matvec_cube(jnp.asarray(xqg), C, sm_q))
        assert np.allclose(got[gf_q], ref, atol=1e-11)

    # diagonals
    dref = np.asarray(eng.diagonal_v(ctx, M))
    dgot = np.asarray(cu.diag_cube(ops.M_c, sm_v))
    assert np.allclose(dgot[gf_v], dref, atol=1e-12)


def _grid(vec, gf, sm):
    out = np.zeros(int(np.prod(sm[0])))
    out[gf] = vec
    return out


@pytest.mark.parametrize("dim,N,du,dp", CASES)
def test_mixed_and_divergence(dim, N, du, dp):
    mesh, ctx, refs, ops, (sm_v, gf_v, _), (sm_q, gf_q, _) = setup(dim, N, du, dp)
    rng = np.random.default_rng(4)
    d = mesh.dim
    xq = rng.standard_normal(ctx.ndofs_q)
    u = rng.standard_normal((d, ctx.ndofs_v))
    xqg = jnp.asarray(_grid(xq, gf_q, sm_q))
    ug = jnp.asarray(np.stack([_grid(u[g], gf_v, sm_v) for g in range(d)]))

    ref = np.asarray(eng.pressure_gradient_vecs(ctx, jnp.asarray(xq)))
    got = np.asarray(cu.mixed_all(xqg, ops.B_c, sm_v, sm_q))
    assert np.allclose(got[:, gf_v], ref, atol=1e-11)

    ref = np.asarray(eng.grad_p_vecs(ctx, jnp.asarray(xq)))
    got = np.asarray(cu.mixed_all(xqg, ops.G_c, sm_v, sm_q))
    assert np.allclose(got[:, gf_v], ref, atol=1e-11)

    ref = np.asarray(eng.divergence_vec(ctx, jnp.asarray(u)))
    got = np.asarray(cu.divergence_cube(ug, ops))
    assert np.allclose(got[gf_q], ref, atol=1e-11)


@pytest.mark.parametrize("dim,N,du,dp", CASES)
def test_convection(dim, N, du, dp):
    mesh, ctx, refs, ops, (sm_v, gf_v, _), (sm_q, gf_q, _) = setup(dim, N, du, dp)
    rng = np.random.default_rng(5)
    d = mesh.dim
    x = rng.standard_normal(ctx.ndofs_v)
    uab = rng.standard_normal((d, ctx.ndofs_v))
    xg = jnp.asarray(_grid(x, gf_v, sm_v))
    ug = jnp.asarray(np.stack([_grid(uab[g], gf_v, sm_v) for g in range(d)]))

    C = eng.convection_elems(ctx, jnp.asarray(uab))
    ref = np.asarray(eng.matvec_v(ctx, C, jnp.asarray(x)))
    uq = cu.conv_uq(ops, ug)
    got = np.asarray(cu.conv_action(ops, uq, xg))
    assert np.allclose(got[gf_v], ref, atol=1e-10), np.abs(got[gf_v] - ref).max()

    dref = np.asarray(eng.diagonal_v(ctx, C))
    dgot = np.asarray(cu.conv_diag(ops, uq))
    assert np.allclose(dgot[gf_v], dref, atol=1e-10)


@pytest.mark.parametrize("dim,N,du,dp", [(2, 4, 2, 1), (3, 3, 2, 1)])
def test_padding_invariant(dim, N, du, dp):
    """Cube ops never read or write the padded (parity>0, base=n) slots."""
    mesh, ctx, refs, ops, (sm_v, gf_v, valid_v), _ = setup(dim, N, du, dp)
    rng = np.random.default_rng(6)
    x = rng.standard_normal(ctx.ndofs_v)
    xg = _grid(x, gf_v, sm_v)
    # poison the padding slots
    poisoned = np.where(valid_v, xg, 1e30)
    y_clean = np.asarray(cu.matvec_cube(jnp.asarray(xg), ops.M_c, sm_v))
    y_poison = np.asarray(cu.matvec_cube(jnp.asarray(poisoned), ops.M_c, sm_v))
    assert np.allclose(y_clean[gf_v], y_poison[gf_v])
    assert np.all(y_clean[~valid_v] == 0.0)
