"""Global dtype/config helpers.

Correctness/convergence tests run in float64 (CPU backend); TPU benchmark
runs use float32 state (TPU has no native f64 — SURVEY §7 'hard parts' #3).
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp

# Persistent XLA compilation cache: step programs take minutes to compile
# on remote-compile TPU backends; caching makes every subsequent process
# (tests, demos, benchmarks, the driver) start fast. Opt out with
# OASISX_TPU_NO_COMPILE_CACHE=1.
# FEM operators need f32-accurate contractions: on TPU the default matmul
# precision rounds f32 operands to bfloat16 (~2e-3 relative error per
# matvec — measured on the assembly einsums), which silently degrades
# Krylov convergence and physics. "highest" emulates f32 on the MXU.
# Override with OASISX_TPU_MATMUL_PRECISION=default|high|highest.
try:
    jax.config.update(
        "jax_default_matmul_precision",
        os.environ.get("OASISX_TPU_MATMUL_PRECISION", "highest"),
    )
except Exception:
    pass

if not os.environ.get("OASISX_TPU_NO_COMPILE_CACHE"):
    try:
        jax.config.update(
            "jax_compilation_cache_dir",
            os.environ.get("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_comp_cache"),
        )
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass


def default_dtype():
    """float64 when jax x64 is enabled, else float32."""
    return jnp.asarray(0.0).dtype


def real_dtype(dtype=None):
    return default_dtype() if dtype is None else jnp.dtype(dtype)
