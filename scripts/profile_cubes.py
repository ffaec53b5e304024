"""Benchmark cube-batched operators vs current paths at bench scale."""

import os
import sys

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
    from oasisx_tpu.assembly import cubes as cu
    from oasisx_tpu.assembly import engine as eng

    mesh = solver._mesh
    ops = cu.build_cube_ops(mesh, solver._refs, ctx.sv, ctx.sq, dtype=np.float32)
    assert ops is not None

    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (ctx.ndofs_v,), dtype=jnp.float32)
    xq = jax.random.normal(key, (ctx.ndofs_q,), dtype=jnp.float32)
    u3 = jax.random.normal(key, (3, ctx.ndofs_v), dtype=jnp.float32)

    timeit("cube_gather_v", jax.jit(lambda x: cu.cube_gather(x, ctx.sv)), x)
    timeit(
        "cube matvec M (V)",
        jax.jit(lambda x: cu.matvec_cube(x, ops.M_c, ctx.sv)),
        x,
    )
    timeit(
        "cube matvec Ap (Q)",
        jax.jit(lambda x: cu.matvec_cube(x, ops.Ap_c, ctx.sq)),
        xq,
    )
    timeit("old matvec_v(M)", jax.jit(eng.matvec_v), ctx, P["M"], x)
    timeit("old matvec_q(Ap)", jax.jit(eng.matvec_q), ctx, P["Ap"], xq)

    uq = cu.conv_uq(ops, u3)
    timeit("cube conv_uq (3 comps)", jax.jit(lambda u: cu.conv_uq(ops, u)), u3)
    timeit(
        "cube conv_action",
        jax.jit(lambda uq, x: cu.conv_action(ops, uq, x)),
        uq,
        x,
    )
    A0 = ops.M_c * 500.0 + 0.5 * ops.K_c
    timeit(
        "cube tentative matvec (A0 + conv fused)",
        jax.jit(lambda uq, x: cu.tentative_matvec_local(ops, A0, uq, x)),
        uq,
        x,
    )
    timeit(
        "cube mixed_all B (pgv)",
        jax.jit(lambda p: cu.mixed_all(p, ops.B_c, ctx.sv, ctx.sq)),
        xq,
    )
    timeit(
        "cube divergence",
        jax.jit(lambda u: cu.divergence_cube(u, ops)),
        u3,
    )


if __name__ == "__main__":
    main()
