"""Cell-batch sharding over a device mesh (SPMD domain decomposition).

The TPU-native equivalent of the reference's entire parallelism story
(SURVEY §2b L0: MPI domain decomposition with owner/ghost scatters): cells
(and tagged boundary facets) are partitioned into per-device blocks; every
assembly / SpMV runs per-shard under ``shard_map`` and folds cross-shard
dof contributions with a ``psum`` over the ICI mesh axis; dof vectors and
Krylov scalars are replicated (dot products need no extra collective).

Two variants:

- ``shard_problem_halo`` (round 3, the DEFAULT for general meshes):
  owned-dof sharding with ``ppermute`` halo exchange (parallel/graph.py) —
  per-matvec ICI traffic is O(halo), config-agnostic (unstructured
  meshes, outlet BCs, rotational), like the reference's IndexMap
  decomposition.
- ``shard_problem`` (round 1, kept as the ``options={"replicated": True}``
  debug path): replicated dof vectors + one full-vector psum per operator
  application — simple and exactly correct but unscalable in memory and
  ICI bandwidth.
"""

from __future__ import annotations

import numpy as np

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..assembly.engine import DeviceContext, build_transpose_map
from ..assembly.facets import FacetContext


def pad_cell_array(arr: np.ndarray, nc_pad: int, fill=0):
    """Pad the leading (cell) axis to ``nc_pad`` with ``fill``."""
    arr = np.asarray(arr)
    nc = arr.shape[0]
    if nc == nc_pad:
        return arr
    pad = np.full((nc_pad - nc,) + arr.shape[1:], fill, dtype=arr.dtype)
    return np.concatenate([arr, pad], axis=0)


def context_specs(ctx: DeviceContext, axis: str) -> DeviceContext:
    """PartitionSpec pytree matching DeviceContext: cell arrays sharded on
    ``axis``, tabulation tables replicated."""
    return DeviceContext(
        cd_v=P(axis, None),
        cd_q=P(axis, None),
        detJ=P(axis),
        Kinv=P(axis, None, None),
        G=P(axis, None, None),
        qw=P(),
        phi_v=P(),
        dphi_v=P(),
        phi_q=P(),
        dphi_q=P(),
        mass_ref=P(),
        massq_ref=P(),
        stiff_ref=P(),
        stiffq_ref=P(),
        conv_ref=P(),
        mixed_ref=P(),
        gradq_ref=P(),
        load_ref=P(),
        pos_v=P(axis, None),
        pos_q=P(axis, None),
        ndofs_v=ctx.ndofs_v,
        ndofs_q=ctx.ndofs_q,
        dim=ctx.dim,
        axis=axis,
    )


def facet_specs(fctx: FacetContext, axis: str) -> FacetContext:
    return FacetContext(
        cells=P(axis),
        local=P(axis),
        scale=P(axis),
        normal=P(axis, None),
        qw=P(),
        phi_v=P(),
        dphi_v=P(),
        phi_q=P(),
        nfacets=fctx.nfacets,
    )


def _put(mesh: Mesh, spec_tree, value_tree):
    return jax.tree_util.tree_map(
        lambda v, s: jax.device_put(v, NamedSharding(mesh, s)), value_tree, spec_tree
    )


def shard_problem(
    mesh: Mesh, ctx: DeviceContext, fctxs: list[FacetContext]
) -> tuple[str, DeviceContext, list[FacetContext], int]:
    """Shard a DeviceContext (+ facet contexts) over a 1-axis device mesh.

    Cells are padded (detJ = 0 => zero contributions) to a multiple of the
    device count and split into contiguous blocks. Tagged facets are
    assigned to the shard owning their cell, padded per shard (scale = 0),
    and their cell indices localized to the shard's block.

    Returns (axis_name, sharded ctx, sharded fctxs, cells_per_shard).
    """
    if len(mesh.axis_names) != 1:
        raise ValueError("expected a 1-axis device mesh for cell sharding")
    axis = mesh.axis_names[0]
    ndev = int(np.prod(mesh.devices.shape))
    nc = ctx.detJ.shape[0]
    B = -(-nc // ndev)  # cells per shard
    nc_pad = B * ndev
    d = ctx.dim

    eye = np.broadcast_to(np.eye(d), (nc_pad - nc, d, d)) if nc_pad > nc else None

    def padded(x, fill=0, identity=False):
        x = np.asarray(x)
        if identity and nc_pad > nc:
            return np.concatenate([x, eye.astype(x.dtype)], axis=0)
        return pad_cell_array(x, nc_pad, fill)

    def shard_transpose_maps(cd_padded: np.ndarray, num_dofs: int) -> np.ndarray:
        """Per-shard transpose-gather maps over local cell blocks, padded to
        a common width and stacked: (ndev*num_dofs, m_max). Padding cells
        (whose dofmap rows are zero-filled) are excluded so they neither
        inflate the map width nor contribute; sentinels are remapped to the
        per-shard flattened length B*nd (identical on every shard)."""
        nd_local = cd_padded.shape[1]
        sent = B * nd_local
        maps = []
        for s in range(ndev):
            lo, hi = s * B, min((s + 1) * B, nc)
            if hi <= lo:
                maps.append(np.full((num_dofs, 1), sent, dtype=np.int32))
                continue
            mp = build_transpose_map(cd_padded[lo:hi], num_dofs)
            # remap the truncated block's sentinel to the common one
            mp = np.where(mp == (hi - lo) * nd_local, sent, mp).astype(np.int32)
            maps.append(mp)
        m = max(mp.shape[1] for mp in maps)
        out = np.full((ndev, num_dofs, m), sent, dtype=np.int32)
        for s, mp in enumerate(maps):
            out[s, :, : mp.shape[1]] = mp
        return out.reshape(ndev * num_dofs, m)

    new_ctx = DeviceContext(
        cd_v=padded(ctx.cd_v),
        cd_q=padded(ctx.cd_q),
        detJ=padded(ctx.detJ),
        Kinv=padded(ctx.Kinv, identity=True),
        G=padded(ctx.G, identity=True),
        qw=np.asarray(ctx.qw),
        phi_v=np.asarray(ctx.phi_v),
        dphi_v=np.asarray(ctx.dphi_v),
        phi_q=np.asarray(ctx.phi_q),
        dphi_q=np.asarray(ctx.dphi_q),
        mass_ref=np.asarray(ctx.mass_ref),
        massq_ref=np.asarray(ctx.massq_ref),
        stiff_ref=np.asarray(ctx.stiff_ref),
        stiffq_ref=np.asarray(ctx.stiffq_ref),
        conv_ref=np.asarray(ctx.conv_ref),
        mixed_ref=np.asarray(ctx.mixed_ref),
        gradq_ref=np.asarray(ctx.gradq_ref),
        load_ref=np.asarray(ctx.load_ref),
        pos_v=shard_transpose_maps(padded(ctx.cd_v), ctx.ndofs_v),
        pos_q=shard_transpose_maps(padded(ctx.cd_q), ctx.ndofs_q),
        ndofs_v=ctx.ndofs_v,
        ndofs_q=ctx.ndofs_q,
        dim=ctx.dim,
        axis=axis,
    )
    new_ctx = _put(mesh, context_specs(new_ctx, axis), new_ctx)

    new_fctxs = []
    for f in fctxs:
        cells = np.asarray(f.cells)
        shard_of = cells // B
        counts = np.bincount(shard_of, minlength=ndev)
        F = int(counts.max()) if len(cells) else 1
        nf_pad = F * ndev

        def grouped(x, fill=0):
            x = np.asarray(x)
            out = np.full((ndev, F) + x.shape[1:], fill, dtype=x.dtype)
            for s in range(ndev):
                sel = x[shard_of == s]
                out[s, : sel.shape[0]] = sel
            return out.reshape((nf_pad,) + x.shape[1:])

        new_f = FacetContext(
            cells=grouped(cells - shard_of * B),  # localized
            local=grouped(f.local),
            scale=grouped(f.scale),  # padding rows have scale 0
            normal=grouped(f.normal),
            qw=np.asarray(f.qw),
            phi_v=np.asarray(f.phi_v),
            dphi_v=np.asarray(f.dphi_v),
            phi_q=np.asarray(f.phi_q),
            nfacets=nf_pad,
        )
        new_fctxs.append(_put(mesh, facet_specs(new_f, axis), new_f))

    return axis, new_ctx, new_fctxs, B


def shard_problem_halo(
    mesh: Mesh,
    ctx: DeviceContext,
    fctxs: list[FacetContext],
    cell_centroids: np.ndarray,
    dtype,
    cells: np.ndarray | None = None,
    partitioner: str = "multilevel",
):
    """Owned-dof halo sharding for the GENERAL path (round 3): RCB cell
    partition + per-space [owned|halo|sentinel] dof blocks + ppermute
    exchange schedules (parallel/graph.py).  Replaces the replicated-vector
    psum fallback for unstructured meshes, outlet BCs and the rotational
    variant — the reference's decomposition serves every config
    (/root/reference/src/oasisx/fracstep.py:390-502).

    Returns (axis, new_ctx, new_fctxs, cells_per_shard, hx_v, hx_q,
    cell_perm).
    """
    from .graph import build_halo_exchange, make_halo_tables, rcb_partition

    if len(mesh.axis_names) != 1:
        raise ValueError("expected a 1-axis device mesh for cell sharding")
    axis = mesh.axis_names[0]
    ndev = int(np.prod(mesh.devices.shape))
    nc = ctx.detJ.shape[0]
    if partitioner == "multilevel" and cells is not None:
        # edge-cut-aware partition choice (VERDICT r4 #3): build RCB and a
        # multilevel dual-graph partition, score both by the EXACT padded
        # ppermute payload they would realize for the v and q dofmaps
        # (best shard relabeling included), keep the cheaper
        from .partition import choose_partition

        shard_of = choose_partition(
            cells, np.asarray(cell_centroids), ndev,
            dofmaps=[np.asarray(ctx.cd_v), np.asarray(ctx.cd_q)],
        )
    else:
        shard_of = rcb_partition(np.asarray(cell_centroids), ndev)
    B = -(-nc // ndev)
    nc_pad = B * ndev
    cell_perm = np.full(nc_pad, -1, dtype=np.int64)
    for s in range(ndev):
        cs = np.where(shard_of == s)[0]
        cell_perm[s * B : s * B + len(cs)] = cs

    hx_v = build_halo_exchange(np.asarray(ctx.cd_v), shard_of, ndev, cell_perm, B)
    hx_q = build_halo_exchange(np.asarray(ctx.cd_q), shard_of, ndev, cell_perm, B)
    tree_v, perms_v = make_halo_tables(hx_v, dtype)
    tree_q, perms_q = make_halo_tables(hx_q, dtype)

    d = ctx.dim

    def permuted(x, fill=0.0, identity=False):
        """Reorder a cell array into shard-blocked order (pad rows zero /
        identity)."""
        x = np.asarray(x)
        out = np.zeros((nc_pad,) + x.shape[1:], dtype=x.dtype)
        if identity:
            out[:] = np.eye(d, dtype=x.dtype)
        elif fill != 0.0:
            out[:] = fill
        sel = cell_perm >= 0
        out[sel] = x[cell_perm[sel]]
        return out

    def local_transpose_maps(cdl: np.ndarray, nloc: int) -> np.ndarray:
        """Per-shard transpose-gather maps over local dof numbering,
        padded to a common width: (ndev*nloc, m)."""
        ndl = cdl.shape[1]
        sent_flat = B * ndl
        maps = []
        for s in range(ndev):
            mp = build_transpose_map(cdl[s * B : (s + 1) * B], nloc)
            maps.append(mp.astype(np.int32))
        m = max(mp.shape[1] for mp in maps)
        out = np.full((ndev, nloc, m), sent_flat, dtype=np.int32)
        for s, mp in enumerate(maps):
            out[s, :, : mp.shape[1]] = mp
        # the local sentinel dof row (nloc-1) collects padded-cell junk;
        # point it at the appended zero slot so it assembles to exactly 0
        out[:, nloc - 1, :] = sent_flat
        return out.reshape(ndev * nloc, m)

    new_ctx = DeviceContext(
        cd_v=hx_v.cell_dofs_local,
        cd_q=hx_q.cell_dofs_local,
        detJ=permuted(ctx.detJ),
        Kinv=permuted(ctx.Kinv, identity=True),
        G=permuted(ctx.G, identity=True),
        qw=np.asarray(ctx.qw),
        phi_v=np.asarray(ctx.phi_v),
        dphi_v=np.asarray(ctx.dphi_v),
        phi_q=np.asarray(ctx.phi_q),
        dphi_q=np.asarray(ctx.dphi_q),
        mass_ref=np.asarray(ctx.mass_ref),
        massq_ref=np.asarray(ctx.massq_ref),
        stiff_ref=np.asarray(ctx.stiff_ref),
        stiffq_ref=np.asarray(ctx.stiffq_ref),
        conv_ref=np.asarray(ctx.conv_ref),
        mixed_ref=np.asarray(ctx.mixed_ref),
        gradq_ref=np.asarray(ctx.gradq_ref),
        load_ref=np.asarray(ctx.load_ref),
        pos_v=local_transpose_maps(hx_v.cell_dofs_local, hx_v.nloc),
        pos_q=local_transpose_maps(hx_q.cell_dofs_local, hx_q.nloc),
        ndofs_v=hx_v.nloc,
        ndofs_q=hx_q.nloc,
        dim=ctx.dim,
        axis=axis,
        halo_v=tree_v,
        halo_q=tree_q,
        perms_v=perms_v,
        perms_q=perms_q,
    )
    new_ctx = _put(mesh, context_specs_halo(new_ctx, axis), new_ctx)

    # facets grouped by the RCB shard of their cell, localized to the
    # shard's cell block
    pos_in_block = np.full(nc, -1, dtype=np.int64)
    sel = cell_perm >= 0
    pos_in_block[cell_perm[sel]] = np.where(sel)[0] - (np.where(sel)[0] // B) * B

    new_fctxs = []
    for f in fctxs:
        cells = np.asarray(f.cells)
        sh = shard_of[cells] if len(cells) else np.zeros(0, np.int32)
        counts = np.bincount(sh, minlength=ndev)
        F = int(counts.max()) if len(cells) else 1
        nf_pad = F * ndev

        def grouped(x, fill=0):
            x = np.asarray(x)
            out = np.full((ndev, F) + x.shape[1:], fill, dtype=x.dtype)
            for s in range(ndev):
                selx = x[sh == s]
                out[s, : selx.shape[0]] = selx
            return out.reshape((nf_pad,) + x.shape[1:])

        new_f = FacetContext(
            cells=grouped(pos_in_block[cells]).astype(np.int32),
            local=grouped(f.local),
            scale=grouped(f.scale),
            normal=grouped(f.normal),
            qw=np.asarray(f.qw),
            phi_v=np.asarray(f.phi_v),
            dphi_v=np.asarray(f.dphi_v),
            phi_q=np.asarray(f.phi_q),
            nfacets=nf_pad,
        )
        new_fctxs.append(_put(mesh, facet_specs(new_f, axis), new_f))

    return axis, new_ctx, new_fctxs, B, hx_v, hx_q, cell_perm


def context_specs_halo(ctx: DeviceContext, axis: str) -> DeviceContext:
    """PartitionSpecs for a halo-mode DeviceContext: cell arrays and local
    dof structures sharded, tabulation tables replicated."""
    from .graph import halo_tree_specs

    base = context_specs(ctx, axis)
    import dataclasses as _dc

    return _dc.replace(
        base,
        pos_v=P(axis, None),
        pos_q=P(axis, None),
        halo_v=halo_tree_specs(ctx.halo_v, axis),
        halo_q=halo_tree_specs(ctx.halo_q, axis),
        # static fields must match the value tree's statics exactly or the
        # shard_map treedefs diverge
        perms_v=ctx.perms_v,
        perms_q=ctx.perms_q,
        sv=ctx.sv,
        sq=ctx.sq,
    )
