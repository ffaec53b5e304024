"""Calibrate harness overhead + test conv/stencil formulations."""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_comp_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from scripts.profile_step import timeit


def main():
    key = jax.random.PRNGKey(0)
    n = 405224
    x = jax.random.normal(key, (n,), dtype=jnp.float32)
    big = jax.random.normal(key, (50653, 216), dtype=jnp.float32)
    W = jax.random.normal(key, (216, 8), dtype=jnp.float32)

    timeit("trivial x+1", jax.jit(lambda x: x + 1.0), x)
    timeit("sum(x)", jax.jit(lambda x: jnp.sum(x)), x)
    timeit("big matmul (50653x216)@(216x8)", jax.jit(lambda a, b: a @ b), big, W)

    # channels-last grid + conv_general_dilated
    g = jax.random.normal(key, (1, 8, 37, 37, 37), dtype=jnp.float32)  # NCDHW
    k3 = jax.random.normal(key, (8, 8, 3, 3, 3), dtype=jnp.float32)  # OIDHW

    def conv3d(g, k):
        return jax.lax.conv_general_dilated(
            g, k, window_strides=(1, 1, 1), padding="SAME",
            dimension_numbers=("NCDHW", "OIDHW", "NCDHW"),
        )

    timeit("conv3d 8ch 37^3 3x3x3", jax.jit(conv3d), g, k3)

    # channels-last variant
    gl = jax.random.normal(key, (1, 37, 37, 37, 8), dtype=jnp.float32)
    k3l = jax.random.normal(key, (3, 3, 3, 8, 8), dtype=jnp.float32)

    def conv3d_l(g, k):
        return jax.lax.conv_general_dilated(
            g, k, window_strides=(1, 1, 1), padding="SAME",
            dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
        )

    timeit("conv3d NDHWC 8ch", jax.jit(conv3d_l), gl, k3l)

    # shift-and-channel-matmul stencil (27 slices of the 8ch grid)
    g8 = jax.random.normal(key, (8, 37, 37, 37), dtype=jnp.float32)
    Wst = jax.random.normal(key, (27, 8, 8), dtype=jnp.float32)

    def stencil27(g8, Wst):
        gp = jnp.pad(g8, ((0, 0), (1, 1), (1, 1), (1, 1)))
        acc = jnp.zeros((8, 37 * 37 * 37), g8.dtype)
        i = 0
        for dz in range(3):
            for dy in range(3):
                for dx in range(3):
                    s = jax.lax.slice(gp, (0, dz, dy, dx), (8, dz + 37, dy + 37, dx + 37))
                    acc = acc + Wst[i] @ s.reshape(8, -1)
                    i += 1
        return acc

    timeit("stencil27 slices+matmul", jax.jit(stencil27), g8, Wst)

    # P1 poisson stencil on 38^3 single channel
    q = jax.random.normal(key, (38, 38, 38), dtype=jnp.float32)
    cst = jax.random.normal(key, (27,), dtype=jnp.float32)

    def poisson27(q, c):
        qp = jnp.pad(q, 1)
        acc = jnp.zeros_like(q)
        i = 0
        for dz in range(3):
            for dy in range(3):
                for dx in range(3):
                    acc = acc + c[i] * jax.lax.slice(
                        qp, (dz, dy, dx), (dz + 38, dy + 38, dx + 38)
                    )
                    i += 1
        return acc

    timeit("P1 poisson 27-pt stencil 38^3", jax.jit(poisson27), q, cst)

    # same reshaped 2D-friendly: (38, 38*38)
    def poisson27_2d(q, c):
        qp = jnp.pad(q, 1)
        acc = jnp.zeros_like(q)
        i = 0
        for dz in range(3):
            sl = jax.lax.slice(qp, (dz, 0, 0), (dz + 38, 40, 40))
            for dy in range(3):
                for dx in range(3):
                    acc = acc + c[i] * jax.lax.slice(
                        sl, (0, dy, dx), (38, dy + 38, dx + 38)
                    )
                    i += 1
        return acc

    timeit("P1 poisson z-major slices", jax.jit(poisson27_2d), q, cst)


if __name__ == "__main__":
    main()
