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
