"""Shape-uniform operator path: shared per-shape matrices -> real MXU matmuls.

On uniform structured meshes all cells of one Kuhn/diagonal shape have the
SAME affine geometry (detJ, Kinv, G constant per shape block). Element
matrices of constant-coefficient forms are then one (nd x nd) matrix per
shape, and every operator application is a (ncells_per_shape x nd) @
(nd x nd) matmul — huge-M MXU work instead of 280k batched 10x10 products,
and the 100+ MB per-cell element-matrix stacks disappear entirely.

The convecting term (coefficients change every step) is applied in
quadrature-factored form: grad-at-qp and value-at-qp tables are shared per
shape, so it is also a chain of (ncube x small) matmuls plus one
elementwise product.

Used by FractionalStep on the structured fast path; the general per-cell
element-matrix engine remains the fallback for non-uniform meshes.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

import jax
import jax.numpy as jnp

from ..config import real_dtype
from .reference_tensors import ReferenceTensors
from .structured import StructuredMap, _index


@jax.tree_util.register_dataclass
@dataclass
class ShapeUniform:
    """Per-shape shared operator tables (S = shapes per macro-cell)."""

    M_s: jax.Array  # (S, ndv, ndv) component mass
    K_s: jax.Array  # (S, ndv, ndv) component stiffness
    Ap_s: jax.Array  # (S, ndq, ndq) pressure Laplacian
    Mq_s: jax.Array  # (S, ndq, ndq) pressure mass
    Bmix_s: jax.Array  # (S, d, ndv, ndq) p * v.dx(i)
    Gq_s: jax.Array  # (S, d, ndv, ndq) p.dx(i) * v
    Phi: jax.Array  # (ndv, nq) basis values at qp
    PhiW_s: jax.Array  # (S, ndv, nq) detJ_s * w_q * phi (test-side weights)
    Dg_s: jax.Array  # (S, ndv, nq*d) physical-gradient tables
    Ediag_s: jax.Array  # (S, nq*d, ndv) convection-diagonal tables


def build_shape_uniform(mesh, refs: ReferenceTensors, dtype=None) -> ShapeUniform | None:
    """Host builder; returns None unless per-shape geometry is uniform."""
    from .geometry import compute_cell_geometry

    info = mesh.structured
    if info is None:
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

    w = refs.qweights
    phi = refs.phi_v  # (nq, ndv)
    dphi = refs.dphi_v  # (nq, d, ndv)
    phi_q = refs.phi_q
    nq, ndv = phi.shape

    M_s = detJ_s[:, None, None] * refs.mass[None]
    K_s = np.einsum("s,sab,abij->sij", detJ_s, G_s, refs.stiffness)
    Ap_s = np.einsum("s,sab,abij->sij", detJ_s, G_s, refs.stiffness_q)
    Mq_s = detJ_s[:, None, None] * refs.mass_q[None]
    Bmix_s = np.einsum("s,sbg,bjm->sgjm", detJ_s, Kinv_s, refs.mixed_grad)
    Gq_s = np.einsum("s,sbg,bjm->sgjm", detJ_s, Kinv_s, refs.grad_q)
    # physical gradient of V basis at qp: Dg[s, j, q*d+g] = Kinv_s[b,g] dphi[q,b,j]
    Dg = np.einsum("sbg,qbj->sjqg", Kinv_s, dphi)
    PhiW_s = np.einsum("s,q,qj->sjq", detJ_s, w, phi)
    # conv diagonal: E[s, (q,g), i] = PhiW_s[s,i,q] * Dg[s,i,q,g] / detJ-weight note:
    # diag_e[c,i] = sum_qg uq[c,q,g] * PhiW_s[i,q] * Dg[s,i,q,g]
    Ediag = np.einsum("sjq,sjqg->sqgj", PhiW_s, Dg)

    a = lambda x: jnp.asarray(x, dtype=dtype)
    return ShapeUniform(
        M_s=a(M_s),
        K_s=a(K_s),
        Ap_s=a(Ap_s),
        Mq_s=a(Mq_s),
        Bmix_s=a(Bmix_s),
        Gq_s=a(Gq_s),
        Phi=a(phi.T),
        PhiW_s=a(PhiW_s),
        Dg_s=a(Dg.reshape(S, ndv, nq * d)),
        Ediag_s=a(Ediag.reshape(S, nq * d, ndv)),
    )


# ---------------------------------------------------------------------------
# block gather/scatter (per shape, avoiding the concatenated (nc, nd) array)
# ---------------------------------------------------------------------------


def gather_blocks(x: jax.Array, sm: StructuredMap) -> list:
    pshape, cells, stride, S, poffsets = sm
    X = x.reshape(pshape)
    nd = len(poffsets[0])
    return [
        jnp.stack([X[_index(sm, s, j)].reshape(-1) for j in range(nd)], axis=1)
        for s in range(S)
    ]


def scatter_blocks(blocks: list, sm: StructuredMap, axis=None) -> jax.Array:
    """Per-shape block scatter via pad + channel stack (no dynamic-update-
    slice — see assembly/cubes.py for why DUS is TPU-hostile)."""
    import itertools

    pshape, cells, stride, S, poffsets = sm
    nd = blocks[0].shape[-1]
    dd = len(cells)
    accs: dict = {}
    for s in range(S):
        v = blocks[s].reshape(cells + (nd,))
        for i in range(nd):
            par, base = poffsets[s][i]
            block = v[(slice(None),) * dd + (i,)]
            padded = jax.lax.pad(
                block,
                jnp.zeros((), block.dtype),
                [(base[k], 1 - base[k], 0) for k in range(dd)],
            )
            key = tuple(par)
            accs[key] = padded if key not in accs else accs[key] + padded
    zero = None
    chans = []
    for par in itertools.product(*(range(stride) for _ in range(dd))):
        if par in accs:
            chans.append(accs[par])
        else:
            if zero is None:
                zero = jnp.zeros(tuple(c + 1 for c in cells), blocks[0].dtype)
            chans.append(zero)
    out = jnp.stack(chans).reshape(-1)
    if axis is not None:
        out = jax.lax.psum(out, axis)
    return out


# ---------------------------------------------------------------------------
# operators
# ---------------------------------------------------------------------------


def matvec_shared(x: jax.Array, mats_s: jax.Array, sm: StructuredMap, axis=None) -> jax.Array:
    """y = A x with one shared (nd x nd) matrix per shape."""
    blocks = gather_blocks(x, sm)
    out = [b @ mats_s[s].T for s, b in enumerate(blocks)]
    return scatter_blocks(out, sm, axis)


def diag_shared(mats_s: jax.Array, sm: StructuredMap, dtype, axis=None) -> jax.Array:
    """Assembled diagonal of a shared-matrix operator."""
    pshape, cells, stride, S, poffsets = sm
    ncube = int(np.prod(cells))
    d = jnp.einsum("sii->si", mats_s)
    blocks = [jnp.broadcast_to(d[s][None, :], (ncube, d.shape[1])).astype(dtype) for s in range(S)]
    return scatter_blocks(blocks, sm, axis)


def _uq_blocks(su: ShapeUniform, uab_blocks: list, sm: StructuredMap):
    """Convecting velocity at quadrature points: per shape (ncube, nq, d)."""
    S = sm[3]
    d = len(uab_blocks)
    return [
        jnp.stack([uab_blocks[g][s] @ su.Phi for g in range(d)], axis=-1) for s in range(S)
    ]


def conv_action(
    su: ShapeUniform, uq: list, x: jax.Array, sm_v: StructuredMap, axis=None
) -> jax.Array:
    """y = C(uab) x in quadrature-factored form (all big-M matmuls)."""
    pshape, cells, stride, S, poffsets = sm_v
    xb = gather_blocks(x, sm_v)
    nq = su.Phi.shape[1]
    d = uq[0].shape[-1]
    out = []
    for s in range(S):
        Gx = (xb[s] @ su.Dg_s[s]).reshape(-1, nq, d)  # grad x at qp
        dotted = jnp.sum(Gx * uq[s], axis=-1)  # (ncube, nq)
        out.append(dotted @ su.PhiW_s[s].T)  # (ncube, ndv)
    return scatter_blocks(out, sm_v, axis)


def conv_diag(su: ShapeUniform, uq: list, sm_v: StructuredMap, axis=None) -> jax.Array:
    """Assembled diagonal of C(uab)."""
    S = sm_v[3]
    nq = su.Phi.shape[1]
    blocks = [uq[s].reshape(uq[s].shape[0], -1) @ su.Ediag_s[s] for s in range(S)]
    return scatter_blocks(blocks, sm_v, axis)


def mixed_action_vq(
    su_mats: jax.Array, p: jax.Array, sm_v: StructuredMap, sm_q: StructuredMap, axis=None
) -> jax.Array:
    """r_i = B_i p for all components i: (d, ndofs_v). ``su_mats``:
    (S, d, ndv, ndq) — used for p*v.dx(i) and dp.dx(i)*v vectors."""
    pshape, cells, stride, S, poffsets = sm_v
    pb = gather_blocks(p, sm_q)
    d = su_mats.shape[1]
    outs = []
    for i in range(d):
        blocks = [pb[s] @ su_mats[s, i].T for s in range(S)]
        outs.append(scatter_blocks(blocks, sm_v, axis))
    return jnp.stack(outs)


def divergence_action(
    su: ShapeUniform, u: jax.Array, sm_v: StructuredMap, sm_q: StructuredMap, axis=None
) -> jax.Array:
    """b2 = assemble(div(u) q dx): transpose contraction of Bmix."""
    S = sm_v[3]
    d = u.shape[0]
    ub = [gather_blocks(u[g], sm_v) for g in range(d)]
    blocks = []
    for s in range(S):
        acc = None
        for g in range(d):
            t = ub[g][s] @ su.Bmix_s[s, g]  # (ncube, ndq)
            acc = t if acc is None else acc + t
        blocks.append(acc)
    return scatter_blocks(blocks, sm_q, axis)
