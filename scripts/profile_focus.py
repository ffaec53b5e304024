"""Focused experiments on the hot pieces found by profile_step."""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_comp_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from bench import build_solver
from scripts.profile_step import timeit

N = int(os.environ.get("PROF_N", 36))


def main():
    solver = build_solver(N, dtype=np.float32)
    P = solver._params()
    ctx = P["ctx"]
    from oasisx_tpu.assembly import engine as eng
    from oasisx_tpu.assembly.structured import structured_scatter

    nv = ctx.ndofs_v
    nq_ = ctx.ndofs_q
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (nv,), dtype=jnp.float32)
    xq = jax.random.normal(key, (nq_,), dtype=jnp.float32)

    # variant A: current (einsum + vmap scatter)
    timeit("pgv current", jax.jit(eng.pressure_gradient_vecs), ctx, xq)

    # variant B: loop over components, scatter each
    def pgv_loop(ctx, p):
        pe = eng.gather_q(ctx, p)
        re = jnp.einsum("c,cbg,bjm,cm->gcj", ctx.detJ, ctx.Kinv, ctx.mixed_ref, pe)
        return jnp.stack([eng.scatter_v(ctx, re[g]) for g in range(3)])

    timeit("pgv loop-scatter", jax.jit(pgv_loop), ctx, xq)

    # variant C: split einsum per component
    def pgv_split(ctx, p):
        pe = eng.gather_q(ctx, p)
        outs = []
        for g in range(3):
            re = jnp.einsum("c,cb,bjm,cm->cj", ctx.detJ, ctx.Kinv[:, :, g], ctx.mixed_ref, pe)
            outs.append(eng.scatter_v(ctx, re))
        return jnp.stack(outs)

    timeit("pgv split-einsum", jax.jit(pgv_split), ctx, xq)

    # variant D: precontract (detJ*Kinv) with mixed_ref per cell? too big. Try
    # contracting pe first: t[c,b] = mixed x pe
    def pgv_order(ctx, p):
        pe = eng.gather_q(ctx, p)
        t = jnp.einsum("bjm,cm->cbj", ctx.mixed_ref, pe)  # (nc, d, ndv)
        sc = ctx.detJ[:, None, None] * ctx.Kinv  # (nc, b, g)
        outs = []
        for g in range(3):
            re = jnp.einsum("cb,cbj->cj", sc[:, :, g], t)
            outs.append(eng.scatter_v(ctx, re))
        return jnp.stack(outs)

    timeit("pgv reordered", jax.jit(pgv_order), ctx, xq)

    # scatter cost alone, vmapped vs looped
    re3 = jax.random.normal(key, (3, ctx.detJ.shape[0], ctx.phi_v.shape[1]), jnp.float32)
    timeit(
        "scatter_v vmap x3",
        jax.jit(lambda c, r: jax.vmap(lambda v: eng.scatter_v(c, v))(r)),
        ctx,
        re3,
    )
    timeit(
        "scatter_v loop x3",
        jax.jit(lambda c, r: jnp.stack([eng.scatter_v(c, r[g]) for g in range(3)])),
        ctx,
        re3,
    )

    # grad_p_vecs variants
    timeit("gpv current", jax.jit(eng.grad_p_vecs), ctx, xq)

    def gpv_order(ctx, p):
        pe = eng.gather_q(ctx, p)
        t = jnp.einsum("bjm,cm->cbj", ctx.gradq_ref, pe)
        sc = ctx.detJ[:, None, None] * ctx.Kinv
        outs = []
        for g in range(3):
            re = jnp.einsum("cb,cbj->cj", sc[:, :, g], t)
            outs.append(eng.scatter_v(ctx, re))
        return jnp.stack(outs)

    timeit("gpv reordered", jax.jit(gpv_order), ctx, xq)

    # matvec_v bandwidth check: what does a pure stream of the stack cost?
    timeit("stream M stack (sum)", jax.jit(lambda m: jnp.sum(m)), P["M"])
    timeit(
        "matvec einsum only (no gather/scatter)",
        jax.jit(lambda m, xe: jnp.einsum("cij,cj->ci", m, xe)),
        P["M"],
        eng.gather_v(ctx, x),
    )

    # MG vcycle pieces
    mg = solver._mg
    if mg is not None:
        timeit("mg vcycle", jax.jit(mg.vcycle), xq)


if __name__ == "__main__":
    main()
