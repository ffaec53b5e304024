"""Bisect which stage of solver construction degrades dispatch."""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from scripts.profile_step import timeit

key = jax.random.PRNGKey(0)
x = jax.random.normal(key, (405224,), dtype=jnp.float32)
triv = jax.jit(lambda x: x + 1.0)
timeit("trivial (fresh)", triv, x)

from oasisx_tpu.meshes import create_box, meshtags

mesh = create_box((-1.0, -1.0, -1.0), (1.0, 1.0, 1.0), (36, 36, 36))
timeit("trivial (mesh built)", triv, x)

from oasisx_tpu.elements.element import make_element
from oasisx_tpu.spaces.functionspace import FunctionSpace
from oasisx_tpu.assembly import engine as eng

el_u = make_element(("Lagrange", 2), mesh.cell_type)
el_p = make_element(("Lagrange", 1), mesh.cell_type)
V = FunctionSpace(mesh, el_u)
Q = FunctionSpace(mesh, el_p)
timeit("trivial (spaces built)", triv, x)

ctx, refs = eng.build_device_context(
    mesh, el_u, V.dofmap.cell_dofs, V.num_dofs, el_p, Q.dofmap.cell_dofs, Q.num_dofs,
    dtype=np.float32,
)
timeit("trivial (device ctx)", triv, x)

consts = jax.jit(eng.setup_constants)(ctx)
jax.block_until_ready(consts)
timeit("trivial (setup_constants ran)", triv, x)

from oasisx_tpu.la.multigrid import StructuredPoissonMG

mg = StructuredPoissonMG(mesh, dtype=np.float32)
timeit("trivial (MG built)", triv, x)
