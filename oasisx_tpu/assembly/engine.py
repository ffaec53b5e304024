"""Device-side assembly engine: batched-einsum element kernels + segment-sum
scatter, the TPU-native replacement for DOLFINx assemblers + FFCx kernels
(SURVEY §2b; call sites /root/reference/src/oasisx/fracstep.py:373-409,
435-442, 487-502, 538, 618).

Everything here is jit-friendly: the ``DeviceContext`` is a registered
dataclass pytree passed into jitted programs as a runtime argument (no
constant-bloat), and all assembly routines are pure functions of it.

Matrix semantics: matrices are carried as *stored element matrices*
(ncells, nd, nd). Linear combinations on a shared sparsity (PETSc
``Mat.axpy`` / ``scale``, fracstep.py:438-442,468-469) are elementwise adds
of element-matrix stacks; SpMV is gather -> batched small matmul ->
segment-sum; Dirichlet ``zeroRowsLocal`` becomes a row mask applied at
matvec time (y[bc] = x[bc]).
"""

from __future__ import annotations

from dataclasses import dataclass, field

import jax
import jax.numpy as jnp
import numpy as np

from ..config import real_dtype
from ..elements.element import FiniteElement
from ..meshes.mesh import Mesh
from .geometry import compute_cell_geometry
from .reference_tensors import ReferenceTensors, build_reference_tensors


@jax.tree_util.register_dataclass
@dataclass
class DeviceContext:
    """Static per-problem device arrays for assembly on one cell batch."""

    # dofmaps
    cd_v: jax.Array  # (nc, ndv) int32, velocity-component cell dofs
    cd_q: jax.Array  # (nc, ndq) int32, pressure cell dofs
    # geometry
    detJ: jax.Array  # (nc,)
    Kinv: jax.Array  # (nc, d, d)
    G: jax.Array  # (nc, d, d)
    # quadrature tables
    qw: jax.Array  # (nq,)
    phi_v: jax.Array  # (nq, ndv)
    dphi_v: jax.Array  # (nq, d, ndv)
    phi_q: jax.Array  # (nq, ndq)
    dphi_q: jax.Array  # (nq, d, ndq)
    # reference tensors
    mass_ref: jax.Array
    massq_ref: jax.Array
    stiff_ref: jax.Array
    stiffq_ref: jax.Array
    conv_ref: jax.Array
    mixed_ref: jax.Array
    gradq_ref: jax.Array
    load_ref: jax.Array
    # transpose-gather scatter maps: for each dof, the positions in the
    # flattened per-cell value array that contribute to it (padded with a
    # sentinel pointing at an appended zero slot). Scatter-add then becomes
    # gather + dense row-sum — the TPU-fast formulation (XLA scatter-add with
    # colliding indices serializes; gathers pipeline).
    pos_v: jax.Array | None  # (ndofs_v, m_v) int32
    pos_q: jax.Array | None  # (ndofs_q, m_q) int32
    # static sizes
    ndofs_v: int = field(metadata=dict(static=True))
    ndofs_q: int = field(metadata=dict(static=True))
    dim: int = field(metadata=dict(static=True))
    # device-mesh axis name when cell arrays are sharded (shard_map SPMD);
    # None on a single device. The TPU analogue of the reference's MPI
    # owner/ghost scatters (SURVEY L0): per-shard segment-sums followed by
    # an ICI psum.
    axis: str | None = field(default=None, metadata=dict(static=True))
    # structured-grid fast-path maps (assembly/structured.py): when set,
    # gather/scatter use static strided slices on the dof lattice and dof
    # vectors are in grid (C-order lattice) ordering.
    sv: tuple | None = field(default=None, metadata=dict(static=True))
    sq: tuple | None = field(default=None, metadata=dict(static=True))
    # owned-dof halo mode (parallel/graph.py): when set, dof vectors are
    # per-shard [owned|halo|sentinel] blocks; gathers refresh halos via
    # ppermute first and scatters fold halo contributions to their owners
    # instead of psumming the full vector (the reference's IndexMap
    # scatter_forward / scatter_reverse(add), SURVEY L0).
    halo_v: tuple | None = None  # (packs, unpacks, ownmask) pytree
    halo_q: tuple | None = None
    perms_v: tuple = field(default=(), metadata=dict(static=True))
    perms_q: tuple = field(default=(), metadata=dict(static=True))


def build_transpose_map(cell_dofs: np.ndarray, num_dofs: int) -> np.ndarray:
    """Invert a (nc, nd) cell-dof map: (num_dofs, m) positions into the
    flattened (nc*nd) per-cell value array, sentinel-padded with nc*nd."""
    cd = np.asarray(cell_dofs).reshape(-1)
    order = np.argsort(cd, kind="stable")
    counts = np.bincount(cd, minlength=num_dofs)
    m = int(counts.max()) if len(cd) else 1
    sentinel = cd.shape[0]
    pos = np.full((num_dofs, m), sentinel, dtype=np.int32)
    starts = np.zeros(num_dofs + 1, dtype=np.int64)
    np.cumsum(counts, out=starts[1:])
    # ragged fill: column index of each sorted entry within its dof row
    col = np.arange(len(cd)) - starts[cd[order]]
    pos[cd[order], col] = order
    return pos


def build_device_context(
    mesh: Mesh,
    el_v: FiniteElement,
    cd_v: np.ndarray,
    ndofs_v: int,
    el_q: FiniteElement,
    cd_q: np.ndarray,
    ndofs_q: int,
    dtype=None,
    qdegree: int | None = None,
) -> tuple[DeviceContext, ReferenceTensors]:
    dtype = real_dtype(dtype)
    geo = compute_cell_geometry(mesh.x, mesh.cells, mesh.dim)
    refs = build_reference_tensors(el_v, el_q, qdegree)
    a = lambda x: jnp.asarray(x, dtype=dtype)
    ctx = DeviceContext(
        cd_v=jnp.asarray(cd_v, dtype=jnp.int32),
        cd_q=jnp.asarray(cd_q, dtype=jnp.int32),
        detJ=a(geo.detJ),
        Kinv=a(geo.Kinv),
        G=a(geo.G),
        qw=a(refs.qweights),
        phi_v=a(refs.phi_v),
        dphi_v=a(refs.dphi_v),
        phi_q=a(refs.phi_q),
        dphi_q=a(refs.dphi_q),
        mass_ref=a(refs.mass),
        massq_ref=a(refs.mass_q),
        stiff_ref=a(refs.stiffness),
        stiffq_ref=a(refs.stiffness_q),
        conv_ref=a(refs.convection),
        mixed_ref=a(refs.mixed_grad),
        gradq_ref=a(refs.grad_q),
        load_ref=a(refs.load),
        pos_v=jnp.asarray(build_transpose_map(cd_v, ndofs_v)),
        pos_q=jnp.asarray(build_transpose_map(cd_q, ndofs_q)),
        ndofs_v=int(ndofs_v),
        ndofs_q=int(ndofs_q),
        dim=mesh.dim,
    )
    return ctx, refs


# ---------------------------------------------------------------------------
# gather / scatter primitives
# ---------------------------------------------------------------------------


def scatter_add(
    vals: jax.Array, cell_dofs: jax.Array, num_dofs: int, axis: str | None = None
) -> jax.Array:
    """Sum per-cell local contributions into a global dof vector.

    The structural equivalent of ghost accumulation + scatter_reverse(add)
    (fracstep.py:390 et al.) collapsed to a single deterministic segment-sum;
    with a sharded cell axis, cross-shard contributions are folded by a psum
    over the device mesh (ICI collective).
    """
    y = jax.ops.segment_sum(vals.reshape(-1), cell_dofs.reshape(-1), num_segments=num_dofs)
    if axis is not None:
        y = jax.lax.psum(y, axis)
    return y


def _transpose_scatter(vals: jax.Array, pos: jax.Array, axis: str | None) -> jax.Array:
    """Gather-based scatter-add: sum the (sentinel-padded) contributing
    positions per dof. Pure gather + dense reduction — fast on TPU."""
    flat = jnp.concatenate([vals.reshape(-1), jnp.zeros((1,), vals.dtype)])
    y = jnp.sum(flat[pos], axis=1)
    if axis is not None:
        y = jax.lax.psum(y, axis)
    return y


def scatter_v(ctx: DeviceContext, vals: jax.Array) -> jax.Array:
    """Scatter per-cell V-local values (nc, ndv) into the global dof vector."""
    if ctx.sv is not None:
        from .structured import structured_scatter

        return structured_scatter(vals, ctx.sv, ctx.axis)
    if ctx.halo_v is not None:
        from ..parallel.graph import halo_fold

        y = _transpose_scatter(vals, ctx.pos_v, None)
        return halo_fold(y, ctx.halo_v, ctx.perms_v, ctx.axis)
    if ctx.pos_v is not None:
        return _transpose_scatter(vals, ctx.pos_v, ctx.axis)
    return scatter_add(vals, ctx.cd_v, ctx.ndofs_v, ctx.axis)


def scatter_q(ctx: DeviceContext, vals: jax.Array) -> jax.Array:
    if ctx.sq is not None:
        from .structured import structured_scatter

        return structured_scatter(vals, ctx.sq, ctx.axis)
    if ctx.halo_q is not None:
        from ..parallel.graph import halo_fold

        y = _transpose_scatter(vals, ctx.pos_q, None)
        return halo_fold(y, ctx.halo_q, ctx.perms_q, ctx.axis)
    if ctx.pos_q is not None:
        return _transpose_scatter(vals, ctx.pos_q, ctx.axis)
    return scatter_add(vals, ctx.cd_q, ctx.ndofs_q, ctx.axis)


def gather_v(ctx: DeviceContext, x: jax.Array) -> jax.Array:
    """Global dof vector -> per-cell local values (nc, ndv)."""
    if ctx.sv is not None:
        from .structured import structured_gather

        return structured_gather(x, ctx.sv)
    if ctx.halo_v is not None:
        from ..parallel.graph import halo_refresh

        x = halo_refresh(x, ctx.halo_v, ctx.perms_v, ctx.axis)
    return x[ctx.cd_v]


def gather_q(ctx: DeviceContext, x: jax.Array) -> jax.Array:
    if ctx.sq is not None:
        from .structured import structured_gather

        return structured_gather(x, ctx.sq)
    if ctx.halo_q is not None:
        from ..parallel.graph import halo_refresh

        x = halo_refresh(x, ctx.halo_q, ctx.perms_q, ctx.axis)
    return x[ctx.cd_q]


# ---------------------------------------------------------------------------
# element-matrix producers (constant ones computed once at setup)
# ---------------------------------------------------------------------------


def mass_elems(ctx: DeviceContext) -> jax.Array:
    """(u, v) dx on V — reference form fracstep.py:292."""
    return ctx.detJ[:, None, None] * ctx.mass_ref[None]


def mass_q_elems(ctx: DeviceContext) -> jax.Array:
    """(p, q) dx on Q — Projector mass matrix (function.py:65)."""
    return ctx.detJ[:, None, None] * ctx.massq_ref[None]


def stiffness_elems(ctx: DeviceContext) -> jax.Array:
    """(grad u, grad v) dx on V — fracstep.py:297-299."""
    return jnp.einsum("c,cab,abij->cij", ctx.detJ, ctx.G, ctx.stiff_ref)


def stiffness_q_elems(ctx: DeviceContext) -> jax.Array:
    """(grad p, grad q) dx on Q (pressure Laplacian) — fracstep.py:321-323."""
    return jnp.einsum("c,cab,abij->cij", ctx.detJ, ctx.G, ctx.stiffq_ref)


def convection_elems(ctx: DeviceContext, uab: jax.Array) -> jax.Array:
    """((uab . grad) u, v) dx with AB2 convecting velocity ``uab`` of shape
    (d, ndofs_v) — the every-step hot assembly (fracstep.py:355-358,435-437)."""
    ue = jnp.stack([gather_v(ctx, uab[g]) for g in range(uab.shape[0])])  # (g, nc, k)
    return jnp.einsum("c,cbg,gck,bijk->cij", ctx.detJ, ctx.Kinv, ue, ctx.conv_ref)


def pressure_gradient_mats(ctx: DeviceContext) -> jax.Array:
    """Element matrices of p * v.dx(i): shape (d, nc, ndv, ndq)
    (non-low-memory strategy, fracstep.py:311-315)."""
    return jnp.einsum("c,cbg,bjm->gcjm", ctx.detJ, ctx.Kinv, ctx.mixed_ref)


def grad_p_mats(ctx: DeviceContext) -> jax.Array:
    """Element matrices of p.dx(i) * v: shape (d, nc, ndv, ndq)
    (fracstep.py:348-352)."""
    return jnp.einsum("c,cbg,bjm->gcjm", ctx.detJ, ctx.Kinv, ctx.gradq_ref)


# ---------------------------------------------------------------------------
# operator application (SpMV via stored element matrices)
# ---------------------------------------------------------------------------


def matvec_v(ctx: DeviceContext, elems: jax.Array, x: jax.Array) -> jax.Array:
    """y = A x for an operator on the velocity-component space."""
    ye = jnp.einsum("cij,cj->ci", elems, gather_v(ctx, x))
    return scatter_v(ctx, ye)


def matvec_q(ctx: DeviceContext, elems: jax.Array, x: jax.Array) -> jax.Array:
    ye = jnp.einsum("cij,cj->ci", elems, gather_q(ctx, x))
    return scatter_q(ctx, ye)


def matvec_vq(ctx: DeviceContext, elems: jax.Array, p: jax.Array) -> jax.Array:
    """y_V = B p for a mixed operator with element matrices (nc, ndv, ndq)
    (preassembled p*v.dx(i) matrices, fracstep.py:311-315,501)."""
    ye = jnp.einsum("cjm,cm->cj", elems, gather_q(ctx, p))
    return scatter_v(ctx, ye)


def matvec_qv(ctx: DeviceContext, elems: jax.Array, u: jax.Array) -> jax.Array:
    """y_Q = D u for a mixed operator with element matrices (nc, ndq, ndv)
    (preassembled u.dx(i) q matrices, fracstep.py:332-336,541)."""
    ye = jnp.einsum("cmj,cj->cm", elems, gather_v(ctx, u))
    return scatter_q(ctx, ye)


def diagonal_v(ctx: DeviceContext, elems: jax.Array) -> jax.Array:
    d = jnp.einsum("cii->ci", elems)
    return scatter_v(ctx, d)


def diagonal_q(ctx: DeviceContext, elems: jax.Array) -> jax.Array:
    d = jnp.einsum("cii->ci", elems)
    return scatter_q(ctx, d)


# ---------------------------------------------------------------------------
# direct vector assembly ("action" / low-memory strategy — the TPU-preferred
# path, mirroring low_memory_version=True, fracstep.py:305-309,327-329,342-345)
# ---------------------------------------------------------------------------


def pressure_gradient_vecs(ctx: DeviceContext, p: jax.Array) -> jax.Array:
    """r_i = assemble(p * v.dx(i) dx) for all components at once: (d, ndofs_v).

    Contraction order matters on TPU: contract the small reference tensor
    against the gathered coefficients first (t has no free g index), then
    apply the per-cell geometry — measured 4.5x faster than the fused
    4-operand einsum, which XLA contracts in a pessimal order."""
    pe = gather_q(ctx, p)  # (nc, m)
    t = jnp.einsum("bjm,cm->cbj", ctx.mixed_ref, pe)
    sc = ctx.detJ[:, None, None] * ctx.Kinv  # (nc, b, g)
    return jnp.stack(
        [
            scatter_v(ctx, jnp.einsum("cb,cbj->cj", sc[:, :, g], t))
            for g in range(ctx.dim)
        ]
    )


def divergence_vec(ctx: DeviceContext, u: jax.Array) -> jax.Array:
    """assemble(div(u) q dx) for u of shape (d, ndofs_v): (ndofs_q,)
    (fracstep.py:327-329)."""
    ue = jnp.stack([gather_v(ctx, u[g]) for g in range(u.shape[0])])  # (g, nc, j)
    be = jnp.einsum("c,cbg,bmj,gcj->cm", ctx.detJ, ctx.Kinv, _mixed_T(ctx), ue)
    return scatter_q(ctx, be)


def _mixed_T(ctx: DeviceContext) -> jax.Array:
    return jnp.swapaxes(ctx.mixed_ref, 1, 2)  # (b, m, j)


def grad_p_vecs(ctx: DeviceContext, dp: jax.Array) -> jax.Array:
    """r_i = assemble(dp.dx(i) * v dx) for all components: (d, ndofs_v)
    (velocity update, fracstep.py:342-345,618). Same contraction-order
    rationale as :func:`pressure_gradient_vecs`."""
    pe = gather_q(ctx, dp)
    t = jnp.einsum("bjm,cm->cbj", ctx.gradq_ref, pe)
    sc = ctx.detJ[:, None, None] * ctx.Kinv
    return jnp.stack(
        [
            scatter_v(ctx, jnp.einsum("cb,cbj->cj", sc[:, :, g], t))
            for g in range(ctx.dim)
        ]
    )


def weighted_nodal_grad_p(
    ctx: DeviceContext, dp: jax.Array, gtab: jax.Array
) -> jax.Array:
    """Mass-weighted nodal gradient of a Q-field at the V nodes: (d, ndofs_v).

    num_i = sum_{cells c ∋ i} detJ_c * Mref_jj * (grad dp)|_c(x_j); dividing
    by diag(M) (= the same sum of weights) gives a convex combination of the
    per-cell gradients evaluated AT each velocity node — the pointwise-
    consistent "weighted gradient" the lumped velocity update needs.  (A
    plain lumped solve diag(M)^{-1} (G dp) is inconsistent for P2: vertex
    row sums of M vanish on triangles / go negative on tets, so vertex dofs
    would receive an O(1)-wrong gradient.)  ``gtab``: reference gradients of
    the Q basis tabulated at the V reference nodes, (ndv, d, ndq).
    """
    pe = gather_q(ctx, dp)  # (nc, m)
    r = jnp.einsum("jbm,cm->cjb", gtab, pe)  # ref-grad of dp at V nodes
    w = ctx.detJ[:, None] * jnp.diagonal(ctx.mass_ref)[None]  # (nc, j)
    return jnp.stack(
        [
            scatter_v(ctx, w * jnp.einsum("cb,cjb->cj", ctx.Kinv[:, :, g], r))
            for g in range(ctx.dim)
        ]
    )


def constant_load_vec(ctx: DeviceContext, f: jax.Array) -> jax.Array:
    """assemble(f * v dx) for constant scalar f: (ndofs_v,) (fracstep.py:289)."""
    ve = f * ctx.detJ[:, None] * ctx.load_ref[None, :]
    return scatter_v(ctx, ve)


def source_load_vec_q(ctx: DeviceContext, vals_qp: jax.Array) -> jax.Array:
    """assemble(g * q dx) from values of g at quadrature points (nc, nq),
    into Q — the Projector RHS path (function.py:74)."""
    ve = jnp.einsum("cq,q,qm,c->cm", vals_qp, ctx.qw, ctx.phi_q, ctx.detJ)
    return scatter_q(ctx, ve)


def source_load_vec_v(ctx: DeviceContext, vals_qp: jax.Array) -> jax.Array:
    ve = jnp.einsum("cq,q,qj,c->cj", vals_qp, ctx.qw, ctx.phi_v, ctx.detJ)
    return scatter_v(ctx, ve)


# ---------------------------------------------------------------------------
# quadrature-point evaluation + scalar functionals (assemble_scalar:
# fracstep.py:582-588, demo/taylor_green.py:204-206)
# ---------------------------------------------------------------------------


def eval_v_at_qp(ctx: DeviceContext, x: jax.Array) -> jax.Array:
    """Values of a V-function at all quadrature points: (nc, nq)."""
    return jnp.einsum("qj,cj->cq", ctx.phi_v, gather_v(ctx, x))


def eval_q_at_qp(ctx: DeviceContext, x: jax.Array) -> jax.Array:
    return jnp.einsum("qm,cm->cq", ctx.phi_q, gather_q(ctx, x))


def grad_v_at_qp(ctx: DeviceContext, x: jax.Array) -> jax.Array:
    """Physical gradient of a V-function at qp: (nc, nq, d)."""
    return jnp.einsum("cbg,qbj,cj->cqg", ctx.Kinv, ctx.dphi_v, gather_v(ctx, x))


def grad_q_at_qp(ctx: DeviceContext, x: jax.Array) -> jax.Array:
    return jnp.einsum("cbg,qbm,cm->cqg", ctx.Kinv, ctx.dphi_q, gather_q(ctx, x))


def integrate(ctx: DeviceContext, vals_qp: jax.Array) -> jax.Array:
    """Integral over the mesh of a quantity given at quadrature points."""
    out = jnp.einsum("cq,q,c->", vals_qp, ctx.qw, ctx.detJ)
    if ctx.axis is not None:
        out = jax.lax.psum(out, ctx.axis)
    return out


def cell_volume_total(ctx: DeviceContext) -> jax.Array:
    """assemble(1 * dx) (fracstep.py:582)."""
    out = jnp.sum(ctx.detJ) * jnp.sum(ctx.qw)
    if ctx.axis is not None:
        out = jax.lax.psum(out, ctx.axis)
    return out


# ---------------------------------------------------------------------------
# Dirichlet row masking (PETSc zeroRowsLocal / zeroRowsColumnsLocal
# equivalents, fracstep.py:407-409,471-472)
# ---------------------------------------------------------------------------


def apply_bc_rows(mask: jax.Array, y: jax.Array, x: jax.Array) -> jax.Array:
    """After y = A x: emulate zeroRows(bc, diag=1): y[bc] = x[bc]."""
    return jnp.where(mask, x, y)


def bc_symmetric_matvec(ctx: DeviceContext, elems, mask, x, matvec) -> jax.Array:
    """Emulate zeroRowsColumns(bc, diag=1): y = A (x off bc) with bc rows
    replaced by identity."""
    y = matvec(ctx, elems, jnp.where(mask, 0.0, x))
    return jnp.where(mask, x, y)


# ---------------------------------------------------------------------------
# dense export (test-only differential checks vs scipy oracles, mirroring
# gather_PETScMatrix in test/test_tentative_velocity.py:19-40)
# ---------------------------------------------------------------------------


def elems_to_dense(elems: np.ndarray, rows: np.ndarray, cols: np.ndarray, nr: int, nc: int):
    A = np.zeros((nr, nc))
    e = np.asarray(elems)
    r = np.asarray(rows)
    c = np.asarray(cols)
    ncell, ni, nj = e.shape
    np.add.at(
        A,
        (
            np.repeat(r, nj, axis=1).reshape(-1),
            np.tile(c, (1, ni)).reshape(-1),
        ),
        e.reshape(-1),
    )
    return A


# ---------------------------------------------------------------------------
# fused setup (one compile): all constant operators at once
# ---------------------------------------------------------------------------


def setup_constants(ctx: DeviceContext) -> dict:
    """All time-independent element matrices/diagonals in one program
    (replaces ~10 separate eager compiles at setup — matters on remote-
    compile backends)."""
    M = mass_elems(ctx)
    K = stiffness_elems(ctx)
    Ap = stiffness_q_elems(ctx)
    Mq = mass_q_elems(ctx)
    return dict(
        M=M,
        K=K,
        Ap=Ap,
        Mq=Mq,
        M_diag=diagonal_v(ctx, M),
        Ap_diag=diagonal_q(ctx, Ap),
        vol=cell_volume_total(ctx),
    )
