"""Structured-grid fast path: strided-slice gather/scatter.

Why: XLA:TPU executes unstructured gathers/scatter-adds at ~7 ns/element
(measured; SURVEY §7 hard-part #1 — "scatter-add assembly throughput on
TPU is the anti-pattern XLA punishes"). On meshes from the structured
generators, every Lagrange dof of an equispaced-node space lies on a
regular fine lattice (cells per axis x degree + 1), and each (cell-shape,
local-dof) pair maps to ONE static strided slice of that lattice. Gather
and scatter-add therefore become a few dozen strided slices / slice-adds
— pure VPU/memory ops, no index lists at all.

The element kernels are unchanged (same batched einsums over per-cell
stacks); only the P (global->local) and P^T operators swap implementation.
Cell ordering contract: shape-major blocks, each C-order over the cell
lattice (meshes/generation.py + meshes.mesh.StructuredInfo).

Falls back silently (returns None) when dof coordinates don't land on the
lattice (e.g. GLL-warped nodes for degree >= 3) — the general engine path
remains the correctness backend for arbitrary meshes.
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp

from ..elements.element import FiniteElement
from ..meshes.mesh import Mesh
from ..spaces.dofmap import DofMap

# A structured map is a nested tuple (hashable -> usable as a static jit
# field): (grid_shape, cells_shape, stride, nshapes, offsets) where
# offsets[s][j] is the fine-lattice offset (per axis) of local dof j of
# cell-shape s within its macro-cell.
StructuredMap = tuple


def build_structured_map(
    mesh: Mesh, element: FiniteElement, dofmap: DofMap
) -> tuple[StructuredMap, np.ndarray] | None:
    """Returns ((grid, cells, stride, S, offsets), gridflat) or None.

    ``gridflat[dof]`` is the C-order flat lattice index of each dof — the
    permutation between the canonical dofmap numbering and grid ordering.
    """
    info = mesh.structured
    if info is None or not element.continuous:
        return None
    deg = element.degree
    d = mesh.dim
    cells_shape = tuple(int(n) for n in info.shape)
    grid = tuple(deg * n + 1 for n in cells_shape)
    if int(np.prod(grid)) != dofmap.num_dofs:
        return None
    h_fine = np.asarray(info.spacing) / deg
    t = (dofmap.dof_coords - np.asarray(info.origin)) / h_fine
    ti = np.rint(t).astype(np.int64)
    if np.abs(t - ti).max() > 1e-6:
        return None  # nodes off-lattice (e.g. warped high-order variant)
    if ti.min() < 0 or (ti >= np.array(grid)).any():
        return None
    gridflat = np.ravel_multi_index(tuple(ti.T), grid)
    if np.unique(gridflat).size != dofmap.num_dofs:
        return None

    S = info.nshapes
    ncube = int(np.prod(cells_shape))
    cd = dofmap.cell_dofs
    if cd.shape[0] != S * ncube:
        return None
    # per-shape offsets from the first cell of each shape block
    offsets = []
    for s in range(S):
        o = ti[cd[s * ncube]]
        offsets.append(tuple(tuple(int(v) for v in row) for row in o))
    # validate the full ordering contract (vectorized)
    cell_idx = np.stack(
        np.unravel_index(np.arange(ncube), cells_shape), axis=1
    )  # (ncube, d) C-order
    for s in range(S):
        base = deg * cell_idx  # (ncube, d)
        off = np.asarray(offsets[s])  # (nd, d)
        lat = base[:, None, :] + off[None, :, :]
        expect = np.ravel_multi_index(tuple(np.moveaxis(lat, 2, 0)), grid)
        got = gridflat[cd[s * ncube : (s + 1) * ncube]]
        if not np.array_equal(expect, got):
            return None
    sm: StructuredMap = (grid, cells_shape, deg, S, tuple(offsets))
    return sm, gridflat


def _slices(sm: StructuredMap, s: int, j: int):
    grid, cells, stride, S, offsets = sm
    st = offsets[s][j]
    return tuple(
        slice(st[k], st[k] + stride * (cells[k] - 1) + 1, stride) for k in range(len(cells))
    )


def structured_gather(x: jax.Array, sm: StructuredMap) -> jax.Array:
    """x (ndofs,) in grid order -> per-cell local values (nc, nd)."""
    grid, cells, stride, S, offsets = sm
    X = x.reshape(grid)
    nd = len(offsets[0])
    parts = []
    for s in range(S):
        cols = [X[_slices(sm, s, j)].reshape(-1) for j in range(nd)]
        parts.append(jnp.stack(cols, axis=1))
    return jnp.concatenate(parts, axis=0)


def structured_scatter(vals: jax.Array, sm: StructuredMap, axis=None) -> jax.Array:
    """Per-cell local values (nc, nd) -> assembled dof vector (grid order)."""
    grid, cells, stride, S, offsets = sm
    nd = vals.shape[-1]
    ncube = int(np.prod(cells))
    v = vals.reshape((S,) + cells + (nd,))
    Y = jnp.zeros(grid, vals.dtype)
    for s in range(S):
        for i in range(nd):
            Y = Y.at[_slices(sm, s, i)].add(v[(s,) + (slice(None),) * len(cells) + (i,)])
    out = Y.reshape(-1)
    if axis is not None:
        out = jax.lax.psum(out, axis)
    return out
