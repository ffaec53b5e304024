"""Structured-grid fast path: parity-split contiguous-slice gather/scatter.

Why: XLA:TPU executes unstructured gathers/scatter-adds at ~7 ns/element
(measured; SURVEY §7 hard-part #1), and strided slice *updates* are just as
bad (~0.4 ms per slice-add at 71^3 — minor-dim strides break lane
addressing). On meshes from the structured generators every
equispaced-Lagrange dof lies on a regular fine lattice (degree*cells + 1
per axis), and in a *parity-decomposed* layout every (cell-shape,
local-dof) pair maps to one CONTIGUOUS slice — measured cost: free.

Layout: a dof with fine-lattice index f_k (k-th axis) is stored at
    X[p_0, ..., p_{d-1}, b_0, ..., b_{d-1}],  p_k = f_k % s, b_k = f_k // s
where s is the element degree (the fine-lattice stride of one cell) and
each base axis is padded to n_k + 1 (positions with p_k > 0, b_k = n_k are
padding and provably never touched by any slice). Local dof j of shape
``sh`` at cell (c_0..c_{d-1}) has fine index s*c + o[sh][j], i.e. parity
o % s and base c + o // s: a contiguous length-n_k slice per axis.

Element kernels are unchanged; only P (global->local) and P^T swap
implementation. Cell ordering contract: shape-major blocks, each C-order
over the cell lattice (meshes/generation.py). Falls back (returns None)
when dof coordinates are off-lattice (e.g. GLL-warped nodes, degree >= 3).
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp

from ..elements.element import FiniteElement
from ..meshes.mesh import Mesh
from ..spaces.dofmap import DofMap

# StructuredMap (hashable, static jit field):
#   (pshape, cells_shape, stride, nshapes, poffsets)
# pshape = (s,)*d + (n_0+1, ..., n_{d-1}+1); poffsets[sh][j] = (parity, base)
StructuredMap = tuple


def build_structured_map(
    mesh: Mesh, element: FiniteElement, dofmap: DofMap
) -> tuple[StructuredMap, np.ndarray, np.ndarray] | None:
    """Returns ((pshape, cells, stride, S, poffsets), gridflat, valid) or None.

    ``gridflat[dof]`` is the flat index of each dof in the parity-split
    padded layout (length prod(pshape)); ``valid`` is the boolean mask of
    real (non-padding) positions in that layout.
    """
    info = mesh.structured
    if info is None or not element.continuous:
        return None
    deg = element.degree
    d = mesh.dim
    cells_shape = tuple(int(n) for n in info.shape)
    fine = tuple(deg * n for n in cells_shape)
    if int(np.prod([f + 1 for f in fine])) != dofmap.num_dofs:
        return None
    # TOPOLOGICAL fine-lattice index (VERDICT r1 item 7): node variants
    # (e.g. GLL-warped) move high-order node COORDINATES off the lattice,
    # but the layout only needs each dof's integer position — which is
    # exactly its integer lattice-barycentric combination of its cell's
    # vertex lattice positions (vertices are never warped):
    #   fine(dof n in cell c) = sum_v lam[n, v] * lattice(vertex v of c).
    from ..elements.nodes import lattice_multi_index

    t_vert = (mesh.x - np.asarray(info.origin)) / np.asarray(info.spacing)
    vlat = np.rint(t_vert).astype(np.int64)
    if np.abs(t_vert - vlat).max() > 1e-8:
        return None  # vertices themselves off-lattice (deformed mesh)
    lam = lattice_multi_index(element.cell, max(deg, 1))  # (nd, nverts_cell)
    fine_cell = np.einsum("nv,cvk->cnk", lam, vlat[mesh.cells])  # (nc, nd, d)
    ti = np.zeros((dofmap.num_dofs, d), dtype=np.int64)
    ti[dofmap.cell_dofs] = fine_cell
    # consistency: every cell must agree on each dof's lattice position
    if not np.array_equal(ti[dofmap.cell_dofs], fine_cell):
        return None
    if ti.min() < 0 or (ti > np.array(fine)).any():
        return None

    pshape = (deg,) * d + tuple(n + 1 for n in cells_shape)
    par = tuple((ti[:, k] % deg) for k in range(d))
    base = tuple((ti[:, k] // deg) for k in range(d))
    gridflat = np.ravel_multi_index(par + base, pshape)
    if np.unique(gridflat).size != dofmap.num_dofs:
        return None

    # validity mask of the padded layout
    idx = np.stack(np.unravel_index(np.arange(int(np.prod(pshape))), pshape), axis=1)
    valid = np.ones(int(np.prod(pshape)), dtype=bool)
    for k in range(d):
        p_k = idx[:, k]
        b_k = idx[:, d + k]
        valid &= (p_k == 0) | (b_k <= cells_shape[k] - 1)

    S = info.nshapes
    ncube = int(np.prod(cells_shape))
    cd = dofmap.cell_dofs
    if cd.shape[0] != S * ncube:
        return None
    # per-shape fine offsets from the first cell of each shape block
    poffsets = []
    offsets_fine = []
    for s in range(S):
        o = ti[cd[s * ncube]]  # (nd, d)
        offsets_fine.append(o)
        poffsets.append(
            tuple(
                (tuple(int(v % deg) for v in row), tuple(int(v // deg) for v in row))
                for row in o
            )
        )
    # validate the full ordering contract (vectorized)
    cell_idx = np.stack(np.unravel_index(np.arange(ncube), cells_shape), axis=1)
    for s in range(S):
        off = np.asarray(offsets_fine[s])  # (nd, d)
        lat = deg * cell_idx[:, None, :] + off[None, :, :]
        p = tuple(lat[:, :, k] % deg for k in range(d))
        b = tuple(lat[:, :, k] // deg for k in range(d))
        expect = np.ravel_multi_index(p + b, pshape)
        got = gridflat[cd[s * ncube : (s + 1) * ncube]]
        if not np.array_equal(expect, got):
            return None
    sm: StructuredMap = (pshape, cells_shape, deg, S, tuple(poffsets))
    return sm, gridflat, valid


def num_padded(sm: StructuredMap) -> int:
    return int(np.prod(sm[0]))


def _index(sm: StructuredMap, s: int, j: int):
    pshape, cells, stride, S, poffsets = sm
    par, base = poffsets[s][j]
    return tuple(par) + tuple(
        slice(base[k], base[k] + cells[k]) for k in range(len(cells))
    )


def structured_gather(x: jax.Array, sm: StructuredMap) -> jax.Array:
    """x (npad,) in parity layout -> per-cell local values (nc, nd)."""
    pshape, cells, stride, S, poffsets = sm
    X = x.reshape(pshape)
    nd = len(poffsets[0])
    parts = []
    for s in range(S):
        cols = [X[_index(sm, s, j)].reshape(-1) for j in range(nd)]
        parts.append(jnp.stack(cols, axis=1))
    return jnp.concatenate(parts, axis=0)


def structured_scatter(vals: jax.Array, sm: StructuredMap, axis=None) -> jax.Array:
    """Per-cell local values (nc, nd) -> assembled padded dof vector.

    Contributions are grouped by parity channel and placed with lax.pad
    (shifted reads), then the channels are assembled with ONE stack — no
    dynamic-update-slice (each .at[...].add copies the whole buffer on TPU
    and dominated the round-1 step; see assembly/cubes.py)."""
    pshape, cells, stride, S, poffsets = sm
    nd = vals.shape[-1]
    d = len(cells)
    v = vals.reshape((S,) + cells + (nd,))
    accs: dict = {}
    for s in range(S):
        for i in range(nd):
            par, base = poffsets[s][i]
            block = v[(s,) + (slice(None),) * d + (i,)]
            padded = jax.lax.pad(
                block,
                jnp.zeros((), vals.dtype),
                [(base[k], 1 - base[k], 0) for k in range(d)],
            )
            key = tuple(par)
            accs[key] = padded if key not in accs else accs[key] + padded
    import itertools

    zero = None
    chans = []
    for par in itertools.product(*(range(stride) for _ in range(d))):
        if par in accs:
            chans.append(accs[par])
        else:
            if zero is None:
                zero = jnp.zeros(tuple(c + 1 for c in cells), vals.dtype)
            chans.append(zero)
    out = jnp.stack(chans).reshape(-1)
    if axis is not None:
        out = jax.lax.psum(out, axis)
    return out
