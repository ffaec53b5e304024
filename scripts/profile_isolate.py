"""Isolate why ops measured through the solver context are ~1.5ms."""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_comp_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from scripts.profile_step import timeit

N = 36


def main():
    key = jax.random.PRNGKey(0)
    x0 = jax.random.normal(key, (405224,), dtype=jnp.float32)
    timeit("trivial x+1 (before solver)", jax.jit(lambda x: x + 1.0), x0)

    from bench import build_solver
    solver = build_solver(N, dtype=np.float32)
    P = solver._params()
    ctx = P["ctx"]
    from oasisx_tpu.assembly import cubes as cu

    ops = cu.build_cube_ops(solver._mesh, solver._refs, ctx.sv, ctx.sq, dtype=np.float32)
    x = jax.random.normal(key, (ctx.ndofs_v,), dtype=jnp.float32)

    timeit("trivial x+1 (after solver)", jax.jit(lambda x: x + 1.0), x)
    sv = ctx.sv
    timeit("cube_gather sv (closure)", jax.jit(lambda x: cu.cube_gather(x, sv)), x)
    # explicit args, constants passed in
    M_c = ops.M_c
    timeit(
        "cube matvec M explicit",
        jax.jit(lambda x, C: cu.cube_scatter(C @ cu.cube_gather(x, sv), sv)),
        x,
        M_c,
    )
    # stack-free gather: sum the slices instead (no stack/concat)
    def gather_sum(x):
        X = x.reshape(sv[0])
        acc = None
        for t in range(cu.num_slots(sv)):
            s = X[cu._slot_index(sv, t)]
            acc = s if acc is None else acc + s
        return acc

    timeit("27 slices + add (no stack)", jax.jit(gather_sum), x)

    # single slice
    def one_slice(x):
        X = x.reshape(sv[0])
        return X[cu._slot_index(sv, 13)] * 2.0

    timeit("1 parity slice", jax.jit(one_slice), x)

    # reshape only
    timeit("reshape pshape + sum axes", jax.jit(lambda x: jnp.sum(x.reshape(sv[0]), axis=(0, 1, 2))), x)


if __name__ == "__main__":
    main()
