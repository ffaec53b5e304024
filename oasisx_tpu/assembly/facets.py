"""Exterior-facet (surface) assembly for natural boundary terms.

Provides the ``ds``-measure capability the reference uses for pressure
outlet conditions: forms ``p * n_i * v.dx(i) * ds(tag)``
(/root/reference/src/oasisx/bcs.py:225-242) and general surface
functionals.

Host setup per tagged facet set: owning cell, local facet index, physical
scale factor, outward unit normal, and per-local-facet tabulations of cell
bases at facet quadrature points. Device assembly is then a batched
contraction + segment-sum over facets, same shape as cell assembly.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import jax
import jax.numpy as jnp
import numpy as np

from ..config import real_dtype
from ..elements.element import FiniteElement
from ..elements.nodes import REFERENCE_VERTICES
from ..elements.quadrature import quadrature
from ..meshes.mesh import CELL_FACETS, Mesh
from .engine import DeviceContext, scatter_add


@jax.tree_util.register_dataclass
@dataclass
class FacetContext:
    """Device arrays for one tagged exterior-facet set."""

    cells: jax.Array  # (nf,) int32 owning cell
    local: jax.Array  # (nf,) int32 local facet id
    scale: jax.Array  # (nf,) surface jacobian scale
    normal: jax.Array  # (nf, d) outward unit normal
    qw: jax.Array  # (nqf,)
    phi_v: jax.Array  # (nlf, nqf, ndv) cell V-basis at facet qp
    dphi_v: jax.Array  # (nlf, nqf, d, ndv)
    phi_q: jax.Array  # (nlf, nqf, ndq)
    nfacets: int = field(metadata=dict(static=True))


def build_facet_context(
    mesh: Mesh,
    el_v: FiniteElement,
    el_q: FiniteElement,
    facet_ids: np.ndarray,
    qdegree: int | None = None,
    dtype=None,
) -> FacetContext:
    dtype = real_dtype(dtype)
    top = mesh.topology
    facet_ids = np.asarray(facet_ids, dtype=np.int64)
    cells = top.facet_cells[facet_ids, 0]
    local = top.facet_local[facet_ids, 0]
    if (top.facet_cells[facet_ids, 1] >= 0).any():
        raise ValueError("surface assembly expects exterior facets")
    d = mesh.dim
    if qdegree is None:
        qdegree = max(el_v.degree + el_q.degree, 2 * el_v.degree, 2)

    # physical scale + outward normal (affine facets)
    fverts = mesh.x[top.facets[facet_ids]]  # (nf, d, gdim)
    if d == 2:
        t = fverts[:, 1] - fverts[:, 0]
        scale = np.linalg.norm(t, axis=1)
        n = np.stack([t[:, 1], -t[:, 0]], axis=1) / scale[:, None]
    elif d == 3:
        cr = np.cross(fverts[:, 1] - fverts[:, 0], fverts[:, 2] - fverts[:, 0])
        scale = np.linalg.norm(cr, axis=1)  # = 2*area; ref-tri weights sum to 1/2
        n = cr / scale[:, None]
    else:
        scale = np.ones(len(facet_ids))
        n = np.ones((len(facet_ids), 1))
    # orient outward: away from cell centroid
    centroids = mesh.x[mesh.cells[cells]].mean(axis=1)
    fmid = fverts.mean(axis=1)
    flip = np.einsum("fg,fg->f", n, fmid - centroids) < 0
    n[flip] *= -1.0

    # reference-facet quadrature mapped into the cell, per local facet
    fcell = "interval" if d == 2 else ("triangle" if d == 3 else None)
    if fcell is None:
        qf, wf = np.zeros((1, 0)), np.ones(1)
    else:
        qf, wf = quadrature(fcell, qdegree)
    ref_verts = REFERENCE_VERTICES[mesh.cell_type]
    lf_tab_v, lf_dtab_v, lf_tab_q = [], [], []
    for lf in range(d + 1):
        FV = ref_verts[CELL_FACETS[mesh.cell_type][lf]]  # (d, d)
        X = FV[0][None, :] + qf @ (FV[1:] - FV[0][None, :])  # (nqf, d)
        pv, dv = el_v.tabulate(X)
        pq, _ = el_q.tabulate(X)
        lf_tab_v.append(pv)
        lf_dtab_v.append(dv)
        lf_tab_q.append(pq)

    a = lambda x: jnp.asarray(x, dtype=dtype)
    return FacetContext(
        cells=jnp.asarray(cells, dtype=jnp.int32),
        local=jnp.asarray(local, dtype=jnp.int32),
        scale=a(scale),
        normal=a(n),
        qw=a(wf),
        phi_v=a(np.stack(lf_tab_v)),
        dphi_v=a(np.stack(lf_dtab_v)),
        phi_q=a(np.stack(lf_tab_q)),
        nfacets=int(len(facet_ids)),
    )


def pressure_surface_vecs(
    ctx: DeviceContext, fctx: FacetContext, p_qvals: jax.Array
) -> jax.Array:
    """Assemble r_i = int_ds p n_i dv/dx_i  for every component i at once.

    ``p_qvals``: pressure values at facet quadrature points, (nf, nqf) —
    produced by :func:`facet_eval_q` (function-valued h) or broadcast from a
    constant. Returns (d, ndofs_v). Reference form: bcs.py:232-239.
    """
    Kc = ctx.Kinv[fctx.cells]  # (nf, b, g)
    dphi = fctx.dphi_v[fctx.local]  # (nf, nqf, b, j)
    # per-facet, per-component integrand:
    # r[g, f, j] = scale_f * n[f,g] * sum_q w_q p_q * Kc[f,b,g] * dphi[f,q,b,j]
    core = jnp.einsum("q,fq,fqbj->fbj", fctx.qw, p_qvals, dphi)
    re = jnp.einsum("f,fg,fbg,fbj->gfj", fctx.scale, fctx.normal, Kc, core)
    cd = ctx.cd_v[fctx.cells]  # (nf, ndv)
    if ctx.halo_v is not None:
        from ..parallel.graph import halo_fold

        y = jax.vmap(lambda v: scatter_add(v, cd, ctx.ndofs_v, None))(re)
        return halo_fold(y, ctx.halo_v, ctx.perms_v, ctx.axis)
    return jax.vmap(lambda v: scatter_add(v, cd, ctx.ndofs_v, ctx.axis))(re)


def facet_eval_q(ctx: DeviceContext, fctx: FacetContext, p: jax.Array) -> jax.Array:
    """Values of a Q-function at facet quadrature points: (nf, nqf)."""
    if ctx.halo_q is not None:
        from ..parallel.graph import halo_refresh

        p = halo_refresh(p, ctx.halo_q, ctx.perms_q, ctx.axis)
    pe = p[ctx.cd_q[fctx.cells]]  # (nf, m)
    phi = fctx.phi_q[fctx.local]  # (nf, nqf, m)
    return jnp.einsum("fqm,fm->fq", phi, pe)


def facet_area(fctx: FacetContext) -> jax.Array:
    return jnp.sum(fctx.scale) * jnp.sum(fctx.qw)


def surface_traction(
    ctx: DeviceContext,
    fctx: FacetContext,
    u: jax.Array,
    p: jax.Array,
    nu,
) -> jax.Array:
    """Traction integral F_i = int_S [nu (du_i/dx_j + du_j/dx_i) n_j
    - p n_i] ds over a tagged facet set, with n the domain-outward normal:
    the force the surroundings exert ON the fluid. The force on an immersed
    body is the negative (drag/lift for the DFG cylinder benchmark,
    BASELINE config #3).

    ``u``: (d, ndofs_v) velocity components; ``p``: (ndofs_q,). Density 1.
    """
    Kc = ctx.Kinv[fctx.cells]  # (nf, b, g)
    dphi = fctx.dphi_v[fctx.local]  # (nf, nqf, b, j)
    ue = u[:, ctx.cd_v[fctx.cells]]  # (i, nf, j)
    # grad u at facet qp: (i, nf, nqf, g)
    gu = jnp.einsum("fbg,fqbj,ifj->ifqg", Kc, dphi, ue)
    pe = p[ctx.cd_q[fctx.cells]]  # (nf, m)
    pq = jnp.einsum("fqm,fm->fq", fctx.phi_q[fctx.local], pe)  # (nf, nqf)
    n = fctx.normal  # (nf, g)
    # sigma_ij n_j = nu (du_i/dx_j + du_j/dx_i) n_j - p n_i
    visc = nu * (
        jnp.einsum("ifqg,fg->ifq", gu, n) + jnp.einsum("gfqi,fg->ifq", gu, n)
    )
    press = pq[None, :, :] * n.T[:, :, None]  # (i, nf, nqf)
    integrand = visc - press
    return jnp.einsum("ifq,q,f->i", integrand, fctx.qw, fctx.scale)
