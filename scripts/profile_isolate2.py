"""What exactly about the live solver slows down later dispatches?"""

import gc
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
    x = jax.random.normal(key, (405224,), dtype=jnp.float32)
    timeit("trivial (fresh)", jax.jit(lambda x: x + 1.0), x)

    # hold ~500MB of live arrays
    blobs = [jax.random.normal(jax.random.PRNGKey(i), (280000, 10, 10), jnp.float32)
             for i in range(4)]
    for b in blobs:
        b.block_until_ready()
    timeit("trivial (500MB live arrays)", jax.jit(lambda x: x + 1.0), x)
    del blobs
    gc.collect()
    timeit("trivial (arrays freed)", jax.jit(lambda x: x + 1.0), x)

    from bench import build_solver
    solver = build_solver(36, dtype=np.float32)
    timeit("trivial (solver live)", jax.jit(lambda x: x + 1.0), x)
    del solver
    gc.collect()
    timeit("trivial (solver deleted)", jax.jit(lambda x: x + 1.0), x)


if __name__ == "__main__":
    main()
