"""Differential tests: conv-lowered operators vs the cube-batched engine."""

import numpy as np
import pytest

import jax.numpy as jnp

from oasisx_tpu.assembly import convops as cv
from oasisx_tpu.assembly import cubes as cu
from tests.test_cubes import CASES, _grid, setup


@pytest.mark.parametrize("dim,N,du,dp", CASES)
def test_matvec_and_mixed(dim, N, du, dp):
    mesh, ctx, refs, ops, (sm_v, gf_v, _), (sm_q, gf_q, _) = setup(dim, N, du, dp)
    co = cv.build_conv_ops(ops, np.float64)
    rng = np.random.default_rng(7)
    d = mesh.dim
    x = jnp.asarray(_grid(rng.standard_normal(ctx.ndofs_v), gf_v, sm_v))
    xq = jnp.asarray(_grid(rng.standard_normal(ctx.ndofs_q), gf_q, sm_q))

    ref = np.asarray(cu.matvec_cube(x, ops.M_c, sm_v))
    got = np.asarray(cv.matvec(x, co.KM_g, co.KS_v, sm_v))
    assert np.allclose(got, ref, atol=1e-11), np.abs(got - ref).max()

    ref = np.asarray(cu.matvec_cube(x, ops.K_c, sm_v))
    got = np.asarray(cv.matvec(x, co.KK_g, co.KS_v, sm_v))
    assert np.allclose(got, ref, atol=1e-11)

    # batched (components share the op)
    xb = jnp.stack([x, 2.0 * x])
    got = np.asarray(cv.matvec(xb, co.KM_g, co.KS_v, sm_v))
    assert np.allclose(got[1], 2.0 * np.asarray(cv.matvec(x, co.KM_g, co.KS_v, sm_v)))

    for C, KG, KS, sm in [(ops.Ap_c, co.KAp_g, co.KS_q, sm_q), (ops.Mq_c, co.KMq_g, co.KS_q, sm_q)]:
        ref = np.asarray(cu.matvec_cube(xq, C, sm_q))
        got = np.asarray(cv.matvec(xq, KG, KS, sm_q))
        assert np.allclose(got, ref, atol=1e-11)

    # mixed B / G
    ref = np.asarray(cu.mixed_all(xq, ops.B_c, sm_v, sm_q))
    got = np.asarray(cv.mixed_apply(xq, co, co.KB_s))
    assert np.allclose(got, ref, atol=1e-11)
    ref = np.asarray(cu.mixed_all(xq, ops.G_c, sm_v, sm_q))
    got = np.asarray(cv.mixed_apply(xq, co, co.KG_s))
    assert np.allclose(got, ref, atol=1e-11)

    # divergence
    u = jnp.asarray(
        np.stack([_grid(rng.standard_normal(ctx.ndofs_v), gf_v, sm_v) for _ in range(d)])
    )
    ref = np.asarray(cu.divergence_cube(u, ops))
    got = np.asarray(cv.divergence(u, co))
    assert np.allclose(got, ref, atol=1e-11)


@pytest.mark.parametrize("dim,N,du,dp", CASES)
def test_convection(dim, N, du, dp):
    mesh, ctx, refs, ops, (sm_v, gf_v, _), (sm_q, gf_q, _) = setup(dim, N, du, dp)
    co = cv.build_conv_ops(ops, np.float64)
    rng = np.random.default_rng(8)
    d = mesh.dim
    x = jnp.asarray(_grid(rng.standard_normal(ctx.ndofs_v), gf_v, sm_v))
    uab = jnp.asarray(
        np.stack([_grid(rng.standard_normal(ctx.ndofs_v), gf_v, sm_v) for _ in range(d)])
    )
    uq_ref = cu.conv_uq(ops, uab)
    ref = np.asarray(cu.conv_action(ops, uq_ref, x))
    uqg = cv.conv_uqg(co, uab)
    got = np.asarray(cv.conv_term(co, uqg, x))
    assert np.allclose(got, ref, atol=1e-10), np.abs(got - ref).max()

    dref = np.asarray(cu.conv_diag(ops, uq_ref))
    dgot = np.asarray(cv.conv_diag(co, uqg))
    assert np.allclose(dgot, dref, atol=1e-10)

    # fused tentative matvec (batched)
    a, b = 7.0, 0.3
    A0 = a * ops.M_c + b * ops.K_c
    ref = np.asarray(cu.tentative_matvec_local(ops, A0, uq_ref, x))
    got = np.asarray(cv.tentative_matvec(co, a, b, uqg, x))
    assert np.allclose(got, ref, atol=1e-10)
    ref = np.asarray(cu.rhs_matvec_local(ops, A0, uq_ref, x))
    got = np.asarray(cv.rhs_matvec(co, a, b, uqg, x))
    assert np.allclose(got, ref, atol=1e-10)


@pytest.mark.parametrize("dim,N,du,dp", CASES)
def test_exact_ops(dim, N, du, dp):
    """Exact-split indicator-conv path vs the cube engine."""
    mesh, ctx, refs, ops, (sm_v, gf_v, _), (sm_q, gf_q, _) = setup(dim, N, du, dp)
    E = cv.build_exact_ops(ops, np.float64)
    rng = np.random.default_rng(9)
    d = mesh.dim
    x = jnp.asarray(_grid(rng.standard_normal(ctx.ndofs_v), gf_v, sm_v))
    xq = jnp.asarray(_grid(rng.standard_normal(ctx.ndofs_q), gf_q, sm_q))
    u = jnp.asarray(
        np.stack([_grid(rng.standard_normal(ctx.ndofs_v), gf_v, sm_v) for _ in range(d)])
    )

    for C, space, vec, sm in [
        (ops.M_c, "v", x, sm_v),
        (ops.K_c, "v", x, sm_v),
        (ops.Ap_c, "q", xq, sm_q),
        (ops.Mq_c, "q", xq, sm_q),
    ]:
        ref = np.asarray(cu.matvec_cube(vec, C, sm))
        got = np.asarray(cv.matvec_exact(vec, C, E, space))
        assert np.allclose(got, ref, atol=1e-11), np.abs(got - ref).max()

    ref = np.asarray(cu.divergence_cube(u, ops))
    got = np.asarray(cv.divergence_exact(E, ops, u))
    assert np.allclose(got, ref, atol=1e-11)

    for C_all in (ops.B_c, ops.G_c):
        ref = np.asarray(cu.mixed_all(xq, C_all, sm_v, sm_q))
        got = np.asarray(cv.mixed_exact(E, C_all, xq))
        assert np.allclose(got, ref, atol=1e-11)

    uq_ref = cu.conv_uq(ops, u)
    uqg = cv.conv_uqg_exact(E, u)
    a, b = 7.0, 0.3
    A0 = a * ops.M_c + b * ops.K_c
    ref = np.asarray(cu.tentative_matvec_local(ops, A0, uq_ref, x))
    got = np.asarray(cv.tentative_matvec_exact(E, ops, a, b, uqg, x))
    assert np.allclose(got, ref, atol=1e-10), np.abs(got - ref).max()
    ref = np.asarray(cu.rhs_matvec_local(ops, A0, uq_ref, x))
    got = np.asarray(cv.tentative_matvec_exact(E, ops, a, b, uqg, x, sign=-1.0))
    assert np.allclose(got, ref, atol=1e-10)

    dref = np.asarray(cu.conv_diag(ops, uq_ref))
    dgot = np.asarray(cv.conv_diag_exact(E, uqg))
    assert np.allclose(dgot, dref, atol=1e-10)


def test_split3_exact_f32():
    rng = np.random.default_rng(10)
    x = jnp.asarray(rng.standard_normal(1000).astype(np.float32) * 1e3)
    parts = cv.split3(x)
    assert parts.shape[0] == 3
    back = np.asarray(parts[0] + parts[1] + parts[2])
    assert np.array_equal(back, np.asarray(x))
