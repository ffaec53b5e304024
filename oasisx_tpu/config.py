"""Global dtype/config helpers.

Correctness/convergence tests run in float64 (CPU backend); TPU benchmark
runs use float32 state (TPU has no native f64 — SURVEY §7 'hard parts' #3).
"""

from __future__ import annotations

import jax.numpy as jnp


def default_dtype():
    """float64 when jax x64 is enabled, else float32."""
    return jnp.asarray(0.0).dtype


def real_dtype(dtype=None):
    return default_dtype() if dtype is None else jnp.dtype(dtype)
