"""Cube-batched operators: the structured-mesh hot path as dense MXU matmuls.

On meshes from the structured generators, every macro-cell (quad/cube) is
split into the same S simplices with identical affine geometry, and every
Lagrange dof of every simplex lies on the macro-cell's local
(deg+1)^d fine sub-lattice.  Summing the S shared element matrices into one
**cube matrix** C of shape (nl, nl) with nl = (deg+1)^d makes every
assembled operator application exactly

    y = sum_cubes  P_c^T  C  P_c  x

where P_c extracts the cube's nl fine-lattice values.  On TPU this is:

    cube_gather  — nl strided slice *reads* from the parity-split grid
                   (assembly/structured.py layout) -> U of shape (nl, ncube)
    one matmul   — C @ U, a (nl x nl) @ (nl x ncube) MXU contraction with
                   cells in the lane dimension
    cube_scatter — nl strided slice reads of the result grouped by output
                   parity channel (each cube slot is read exactly once), so
                   there is **no scatter-add anywhere**

Because only real cells contribute, the result is exact everywhere —
including boundary rows — with no ghost-cell corrections, and the padded
(parity, base=n) slots of the grid layout are never read or written, so the
zero-padding invariant is preserved automatically.

The convecting term (coefficients change per step) keeps its quadrature
factorization: values/gradients at quadrature points are (S*nq x nl)
matmuls against the same cube-local values, the u.grad(x) dot product is
elementwise, and the test contraction returns to cube-local form — all
cells-in-lanes matmuls.

This replaces the per-cell element-matrix stacks (which stream
O(ncells*nd^2) floats per matvec) on the hot path.  Measured at N=36 P2/P1 3D
(1.17M velocity dofs, TPU v5e-lite): velocity matvec 1.5 ms -> 0.2 ms.

Reference semantics provided: PETSc Mat.mult / assemble_vector action
strategy (/root/reference/src/oasisx/fracstep.py:435-442,489-502,538,618).
"""

from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np

import jax
import jax.numpy as jnp

from ..config import real_dtype
from .reference_tensors import ReferenceTensors
from .structured import StructuredMap, _index


def _slot_maps(sm: StructuredMap) -> np.ndarray:
    """slot[s, j]: index of local dof j of shape s in the cube's
    (deg+1)^d fine sub-lattice (C-order)."""
    pshape, cells, deg, S, poffsets = sm
    d = len(cells)
    nl_side = deg + 1
    nd = len(poffsets[0])
    out = np.empty((S, nd), dtype=np.int64)
    for s in range(S):
        for j, (par, base) in enumerate(poffsets[s]):
            t = tuple(base[k] * deg + par[k] for k in range(d))
            assert all(0 <= tk <= deg for tk in t)
            out[s, j] = int(np.ravel_multi_index(t, (nl_side,) * d))
    return out


def _slot_index(sm: StructuredMap, t_flat: int):
    """Grid slice (into the parity-split padded layout) for cube slot t."""
    pshape, cells, deg, S, poffsets = sm
    d = len(cells)
    t = np.unravel_index(t_flat, (deg + 1,) * d)
    par = tuple(int(tk % deg) for tk in t)
    base = tuple(int(tk // deg) for tk in t)
    return tuple(par) + tuple(slice(base[k], base[k] + cells[k]) for k in range(d))


def num_slots(sm: StructuredMap) -> int:
    deg = sm[2]
    d = len(sm[1])
    return (deg + 1) ** d


@jax.tree_util.register_dataclass
@dataclass
class CubeOps:
    """Shared cube-level operator tables for one (V, Q) space pair."""

    # constant operators (cube matrices)
    M_c: jax.Array  # (nl_v, nl_v) component mass
    K_c: jax.Array  # (nl_v, nl_v) component stiffness
    Ap_c: jax.Array  # (nl_q, nl_q) pressure Laplacian
    Mq_c: jax.Array  # (nl_q, nl_q) pressure mass
    B_c: jax.Array  # (d, nl_v, nl_q)  p * v.dx(i)
    G_c: jax.Array  # (d, nl_v, nl_q)  p.dx(i) * v
    # per-shape constants (for dense introspection / element materialization)
    M_s: jax.Array  # (S, ndv, ndv)
    K_s: jax.Array  # (S, ndv, ndv)
    # convection quadrature tables embedded into cube slots; Q = S*nq rows
    Phi: jax.Array  # (Q, nl_v) V basis values at all shape-quadrature points
    Dg: jax.Array  # (Q, d, nl_v) physical V gradients
    PhiW: jax.Array  # (Q, nl_v) test weights detJ_s * w_q * phi
    Ediag: jax.Array  # (Q, d, nl_v) PhiW * Dg (convection-diagonal table)
    # static layout
    sm_v: tuple = field(metadata=dict(static=True))
    sm_q: tuple = field(metadata=dict(static=True))


def build_cube_ops(mesh, refs: ReferenceTensors, sm_v, sm_q, dtype=None) -> CubeOps | None:
    """Host builder. Returns None unless per-shape geometry is uniform
    (all cells of one Kuhn shape share detJ/Kinv — true for the structured
    generators, false for deformed imports)."""
    from .geometry import compute_cell_geometry

    info = mesh.structured
    if info is None or sm_v is None or sm_q is None:
        return None
    dtype = real_dtype(dtype)
    d = mesh.dim
    S = info.nshapes
    ncube = int(np.prod(info.shape))
    geo = compute_cell_geometry(mesh.x, mesh.cells, d)
    detJ_s = np.empty(S)
    Kinv_s = np.empty((S, d, d))
    G_s = np.empty((S, d, d))
    for s in range(S):
        blk = slice(s * ncube, (s + 1) * ncube)
        if (
            np.ptp(geo.detJ[blk]) > 1e-12 * abs(geo.detJ[s * ncube])
            or np.abs(geo.Kinv[blk] - geo.Kinv[s * ncube]).max() > 1e-10
        ):
            return None
        detJ_s[s] = geo.detJ[s * ncube]
        Kinv_s[s] = geo.Kinv[s * ncube]
        G_s[s] = geo.G[s * ncube]

    slots_v = _slot_maps(sm_v)  # (S, ndv)
    slots_q = _slot_maps(sm_q)  # (S, ndq)
    nl_v = num_slots(sm_v)
    nl_q = num_slots(sm_q)

    # per-shape shared element matrices
    M_s = detJ_s[:, None, None] * refs.mass[None]
    K_s = np.einsum("s,sab,abij->sij", detJ_s, G_s, refs.stiffness)
    Ap_s = np.einsum("s,sab,abij->sij", detJ_s, G_s, refs.stiffness_q)
    Mq_s = detJ_s[:, None, None] * refs.mass_q[None]
    B_s = np.einsum("s,sbg,bjm->sgjm", detJ_s, Kinv_s, refs.mixed_grad)
    Gq_s = np.einsum("s,sbg,bjm->sgjm", detJ_s, Kinv_s, refs.grad_q)

    def embed(mats, rows, cols, nr, nc_):
        C = np.zeros((nr, nc_))
        for s in range(mats.shape[0]):
            np.add.at(C, (rows[s][:, None], cols[s][None, :]), mats[s])
        return C

    M_c = embed(M_s, slots_v, slots_v, nl_v, nl_v)
    K_c = embed(K_s, slots_v, slots_v, nl_v, nl_v)
    Ap_c = embed(Ap_s, slots_q, slots_q, nl_q, nl_q)
    Mq_c = embed(Mq_s, slots_q, slots_q, nl_q, nl_q)
    B_c = np.stack([embed(B_s[:, g], slots_v, slots_q, nl_v, nl_q) for g in range(d)])
    G_c = np.stack([embed(Gq_s[:, g], slots_v, slots_q, nl_v, nl_q) for g in range(d)])

    # quadrature tables embedded into cube slots, stacked over shapes
    w = refs.qweights
    phi = refs.phi_v  # (nq, ndv)
    dphi = refs.dphi_v  # (nq, b, ndv)
    nq = phi.shape[0]
    Q = S * nq
    Phi = np.zeros((Q, nl_v))
    Dg = np.zeros((Q, d, nl_v))
    PhiW = np.zeros((Q, nl_v))
    for s in range(S):
        Phi[np.arange(s * nq, (s + 1) * nq)[:, None], slots_v[s][None, :]] = phi
        dg = np.einsum("bg,qbj->qgj", Kinv_s[s], dphi)  # (nq, d, ndv)
        Dg[np.arange(s * nq, (s + 1) * nq)[:, None, None], np.arange(d)[None, :, None],
           slots_v[s][None, None, :]] = dg
        PhiW[np.arange(s * nq, (s + 1) * nq)[:, None], slots_v[s][None, :]] = (
            detJ_s[s] * w[:, None] * phi
        )
    Ediag = PhiW[:, None, :] * Dg  # (Q, d, nl_v)

    a = lambda x: jnp.asarray(x, dtype=dtype)
    return CubeOps(
        M_c=a(M_c),
        K_c=a(K_c),
        Ap_c=a(Ap_c),
        Mq_c=a(Mq_c),
        B_c=a(B_c),
        G_c=a(G_c),
        M_s=a(M_s),
        K_s=a(K_s),
        Phi=a(Phi),
        Dg=a(Dg),
        PhiW=a(PhiW),
        Ediag=a(Ediag),
        sm_v=sm_v,
        sm_q=sm_q,
    )


# ---------------------------------------------------------------------------
# cube-local gather / scatter (pure slice reads in both directions)
# ---------------------------------------------------------------------------


def cube_gather(x: jax.Array, sm: StructuredMap) -> jax.Array:
    """Grid vector (parity-split layout) -> cube-local values (nl, ncube)."""
    pshape, cells, deg, S, _ = sm
    X = x.reshape(pshape)
    nl = num_slots(sm)
    return jnp.stack([X[_slot_index(sm, t)].reshape(-1) for t in range(nl)])


def cube_scatter(Y: jax.Array, sm: StructuredMap, axis: str | None = None) -> jax.Array:
    """Cube-local values (nl, ncube) -> assembled grid vector.

    Each output grid position (parity p, base b) is the sum over the cubes
    containing it: slot t = p + deg*delta of cube b - delta, delta in {0,1}^k
    over the axes with p_k == 0.  Every term is a shifted *read* (lax.pad) of
    one slot plane, and the parity channels are assembled with ONE
    concatenate — there is no scatter-add and, critically, no
    dynamic-update-slice anywhere (DUS was 87% of the round-1 step's device
    time: each .at[...] slice update copies the whole buffer on TPU)."""
    pshape, cells, deg, S, _ = sm
    d = len(cells)
    nl_side = deg + 1
    Yg = Y.reshape((Y.shape[0],) + cells)
    import itertools

    chans = []
    for par in itertools.product(*(range(deg) for _ in range(d))):
        free = [k for k in range(d) if par[k] == 0]
        acc = None
        for delta_bits in itertools.product((0, 1), repeat=len(free)):
            delta = [0] * d
            for k, b in zip(free, delta_bits):
                delta[k] = b
            t = tuple(par[k] + deg * delta[k] for k in range(d))
            t_flat = int(np.ravel_multi_index(t, (nl_side,) * d))
            # place Yg[t_flat] at base offset delta within the (n+1)^d block
            padded = jax.lax.pad(Yg[t_flat], jnp.zeros((), Y.dtype),
                                 [(delta[k], 1 - delta[k], 0) for k in range(d)])
            acc = padded if acc is None else acc + padded
        chans.append(acc)
    # parity channels in C-order == leading axes of the parity-major layout
    res = jnp.stack(chans).reshape(-1)
    if axis is not None:
        res = jax.lax.psum(res, axis)
    return res


# ---------------------------------------------------------------------------
# operator applications
# ---------------------------------------------------------------------------


def matvec_cube(x: jax.Array, C: jax.Array, sm: StructuredMap, axis=None) -> jax.Array:
    """y = A x for an operator with cube matrix C (nl, nl)."""
    U = cube_gather(x, sm)
    return cube_scatter(C @ U, sm, axis)


def matvec_cube_mixed(
    p: jax.Array, C: jax.Array, sm_v: StructuredMap, sm_q: StructuredMap, axis=None
) -> jax.Array:
    """y_V = B p with cube matrix C (nl_v, nl_q)."""
    U = cube_gather(p, sm_q)
    return cube_scatter(C @ U, sm_v, axis)


def mixed_all(
    p: jax.Array, C_all: jax.Array, sm_v: StructuredMap, sm_q: StructuredMap, axis=None
) -> jax.Array:
    """r_i = B_i p for all d components: (d, npad_v)."""
    U = cube_gather(p, sm_q)
    return jnp.stack([cube_scatter(C_all[g] @ U, sm_v, axis) for g in range(C_all.shape[0])])


def divergence_cube(u: jax.Array, ops: CubeOps, axis=None) -> jax.Array:
    """b2 = assemble(div(u) q dx) = sum_i B_i^T u_i."""
    acc = None
    for g in range(u.shape[0]):
        Ug = cube_gather(u[g], ops.sm_v)
        t = ops.B_c[g].T @ Ug
        acc = t if acc is None else acc + t
    return cube_scatter(acc, ops.sm_q, axis)


def diag_cube(C: jax.Array, sm: StructuredMap, axis=None) -> jax.Array:
    """Assembled diagonal of a cube-matrix operator."""
    ncube = int(np.prod(sm[1]))
    D = jnp.broadcast_to(jnp.diagonal(C)[:, None], (C.shape[0], ncube))
    return cube_scatter(D, sm, axis)


# --- convection (quadrature-factored) --------------------------------------


def conv_uq(ops: CubeOps, uab: jax.Array) -> jax.Array:
    """Convecting velocity at all shape-quadrature points: (d, Q, ncube)."""
    return jnp.stack([ops.Phi @ cube_gather(uab[g], ops.sm_v) for g in range(uab.shape[0])])


def conv_local(ops: CubeOps, uq: jax.Array, U: jax.Array) -> jax.Array:
    """Cube-local action of C(uab) on cube-local values U (nl, ncube)."""
    Q, d, nl = ops.Dg.shape
    G = (ops.Dg.reshape(Q * d, nl) @ U).reshape(Q, d, -1)
    dotted = jnp.einsum("gqc,qgc->qc", uq, G)
    return ops.PhiW.T @ dotted


def conv_action(ops: CubeOps, uq: jax.Array, x: jax.Array, axis=None) -> jax.Array:
    """y = C(uab) x."""
    U = cube_gather(x, ops.sm_v)
    return cube_scatter(conv_local(ops, uq, U), ops.sm_v, axis)


def conv_diag(ops: CubeOps, uq: jax.Array, axis=None) -> jax.Array:
    """Assembled diagonal of C(uab)."""
    D = jnp.einsum("gqc,qgt->tc", uq, ops.Ediag)
    return cube_scatter(D, ops.sm_v, axis)


def tentative_matvec_local(
    ops: CubeOps, A0_c: jax.Array, uq: jax.Array, x: jax.Array, axis=None
) -> jax.Array:
    """y = [A0 + 1/2 C(uab)] x fused over one gather/scatter pair."""
    U = cube_gather(x, ops.sm_v)
    Y = A0_c @ U + 0.5 * conv_local(ops, uq, U)
    return cube_scatter(Y, ops.sm_v, axis)


def rhs_matvec_local(
    ops: CubeOps, A0_c: jax.Array, uq: jax.Array, x: jax.Array, axis=None
) -> jax.Array:
    """y = [A0 - 1/2 C(uab)] x (the explicit RHS operator, fracstep.py:438-442)."""
    U = cube_gather(x, ops.sm_v)
    Y = A0_c @ U - 0.5 * conv_local(ops, uq, U)
    return cube_scatter(Y, ops.sm_v, axis)
