"""Band-ELL operator layout: unstructured matvecs as Mosaic-legal
lane gathers.

The fused ELL Krylov kernels (pallas_ops.make_ell_*) express the
unstructured matvec as ``y[r] = sum_k vals[k,r] * x[cols[k,r]]`` with an
arbitrary 1D gather — which this TPU generation's Mosaic lowering
rejects (``Only 2D gather is supported``: lax.gather lowers to
``tpu.dynamic_gather`` only for 2D take_along_axis, i.e. per-row lane
selection within 128 lanes, or per-column sublane selection within 8
sublanes).  Probed on hardware: lane-axis take_along_axis works for any
(R, 128) operand; the sublane direction only for R=8; 1D gathers never.

So: reorder the dofs by reverse Cuthill-McKee (bandwidth ~O(sqrt n) on
2D meshes), lay vectors out as (R, 128) lane tiles, and decompose every
nonzero's column as ``col = (rb + s) * 128 + lane``: a static block
shift ``s`` (|s| <= bandwidth/128 + 1, a handful of values) plus a
within-row lane index.  The matvec becomes, per (shift, k)-slot,

    y2 += vals[slot] * take_along_axis(roll_rows(x2, s), cols[slot], 1)

— all Mosaic-legal ops (static row roll = two static slices + concat).
The values are (re)assembled once per SOLVE from the element stacks by
one segment-sum (the ``slots`` table), exactly like parallel/graph.py's
flat-ELL tables; the kernels live in pallas_ops (make_band_*).

The RCM permutation is applied only INSIDE a solve (gather in, scatter
out, once per solve) so every external layout — dofmaps, bc masks, IO —
keeps the canonical ordering.

Reference semantics: the sparse operator applications inside PETSc KSP
solves, /root/reference/src/oasisx/fracstep.py:508-525,553-658.
"""

from __future__ import annotations

import numpy as np

LANE = 128


def rcm_permutation(rows: np.ndarray, cols: np.ndarray, n: int) -> np.ndarray:
    """Reverse Cuthill-McKee ordering of the symmetrized sparsity graph.

    Returns ``perm`` with ``perm[new] = old`` (so ``x_new = x[perm]``).
    Pure NumPy (CSR by sort + per-component BFS from a minimum-degree
    seed, neighbors visited in increasing-degree order, then reversed).
    """
    rows = np.asarray(rows, np.int64)
    cols = np.asarray(cols, np.int64)
    keep = rows != cols
    r = np.concatenate([rows[keep], cols[keep]])
    c = np.concatenate([cols[keep], rows[keep]])
    # unique edges -> CSR
    key = r * n + c
    key = np.unique(key)
    r = (key // n).astype(np.int64)
    c = (key % n).astype(np.int64)
    indptr = np.zeros(n + 1, np.int64)
    np.add.at(indptr, r + 1, 1)
    np.cumsum(indptr, out=indptr)
    indices = c  # rows are sorted by construction of `key`
    degree = np.diff(indptr)

    order = np.empty(n, np.int64)
    visited = np.zeros(n, bool)
    pos = 0
    # iterate components, cheapest-degree seed first
    seeds = np.argsort(degree, kind="stable")
    si = 0
    while pos < n:
        while visited[seeds[si]]:
            si += 1
        start = seeds[si]
        visited[start] = True
        order[pos] = start
        head, tail = pos, pos + 1
        pos += 1
        while head < tail:
            u = order[head]
            head += 1
            nbr = indices[indptr[u] : indptr[u + 1]]
            nbr = nbr[~visited[nbr]]
            if nbr.size:
                nbr = nbr[np.argsort(degree[nbr], kind="stable")]
                visited[nbr] = True
                order[tail : tail + nbr.size] = nbr
                tail += nbr.size
        pos = tail
    return order[::-1].copy()


def build_band_tables(
    cd_rows: np.ndarray,
    cd_cols: np.ndarray,
    nrows: int,
    ncols: int,
    perm_rows: np.ndarray,
    perm_cols: np.ndarray | None = None,
):
    """Band-ELL sparsity for a (possibly rectangular) operator assembled
    from cell dofmaps, in permuted row/col orderings.

    Parameters: ``cd_rows`` (nc, ndr) / ``cd_cols`` (nc, ndc) cell
    dofmaps (canonical numbering), ``perm_rows``/``perm_cols`` with
    ``perm[new] = old`` (cols default to rows' permutation).

    Returns ``(shifts, slots, cols, Rr, Rc)``:
      - shifts: tuple of per-slot static block shifts (sorted; one entry
        per slot so equal-shift slots share one rolled copy in-kernel),
      - slots: (nc*ndr*ndc,) int32 mapping each flattened element-matrix
        entry to segment ``slot*(Rr*128) + row_p`` (duplicate (row,col)
        pairs map to the SAME slot so the per-solve segment-sum
        accumulates them; unused slots keep value 0 / lane 0),
      - cols: (S, Rr, 128) int32 lane indices into the rolled source,
      - Rr/Rc: padded block counts (rows/cols pad to multiples of 128).

    The matvec is then ``y2[rb, j] = sum_slot vals[slot, rb, j] *
    xr[(rb + shifts[slot]) % Rc, cols[slot, rb, j]]`` for (Rc, 128)
    input tiles — pallas_ops._band_mv_val.
    """
    if perm_cols is None:
        perm_cols = perm_rows
    nc_, ndr = cd_rows.shape
    ndc = cd_cols.shape[1]
    iperm_r = np.empty(nrows, np.int64)
    iperm_r[np.asarray(perm_rows, np.int64)] = np.arange(nrows)
    iperm_c = np.empty(ncols, np.int64)
    iperm_c[np.asarray(perm_cols, np.int64)] = np.arange(ncols)
    Rr = -(-nrows // LANE)
    Rc = -(-ncols // LANE)

    rp = iperm_r[np.asarray(cd_rows, np.int64)]  # (nc, ndr) permuted rows
    cp = iperm_c[np.asarray(cd_cols, np.int64)]  # (nc, ndc) permuted cols
    rr = np.broadcast_to(rp[:, :, None], (nc_, ndr, ndc)).reshape(-1)
    cc = np.broadcast_to(cp[:, None, :], (nc_, ndr, ndc)).reshape(-1)

    key = rr * np.int64(ncols) + cc
    uniq, inv = np.unique(key, return_inverse=True)
    urow = (uniq // ncols).astype(np.int64)
    ucol = (uniq % ncols).astype(np.int64)
    s_of = (ucol // LANE) - (urow // LANE)  # per-unique block shift
    lane = (ucol % LANE).astype(np.int32)

    # per (shift, row) running slot index k; slot id = (s, k)
    shift_vals = np.unique(s_of)
    slot_of_uniq = np.empty(len(uniq), np.int64)
    shifts: list[int] = []
    base = 0
    for s in shift_vals:
        m = np.flatnonzero(s_of == s)
        rows_s = urow[m]
        # entries are row-sorted within the shift group (uniq is sorted)
        row_start = np.searchsorted(rows_s, rows_s)
        kidx = np.arange(len(m)) - row_start
        Ks = int(kidx.max()) + 1 if len(m) else 0
        slot_of_uniq[m] = base + kidx
        shifts.extend([int(s)] * Ks)
        base += Ks
    S = base

    slots = (slot_of_uniq[inv] * (Rr * LANE) + urow[inv]).astype(np.int32)
    cols = np.zeros((S, Rr * LANE), np.int32)
    cols[slot_of_uniq, urow] = lane
    return tuple(shifts), slots, cols.reshape(S, Rr, LANE), Rr, Rc


def band_values(elems, slots, S: int, Rr: int):
    """Assemble band-ELL values (S, Rr, 128) from an element-matrix stack
    (one segment-sum per SOLVE, hoisted out of the Krylov loop)."""
    import jax

    v = jax.ops.segment_sum(
        elems.reshape(-1), slots, num_segments=S * Rr * LANE
    )
    return v.reshape(S, Rr, LANE)


def build_band_tables_coo(
    rows: np.ndarray,
    vals_cols: np.ndarray,
    vals: np.ndarray,
    nrows: int,
    ncols: int,
    perm_rows: np.ndarray,
    perm_cols: np.ndarray | None = None,
):
    """Band-ELL tables for a STATIC operator given in COO form (used for
    the AMG level operators/transfers, which never change during a run).
    Returns ``(shifts, vals_b (S, Rr, 128), cols (S, Rr, 128), Rr, Rc)``
    with duplicate (row, col) pairs pre-summed."""
    if perm_cols is None:
        perm_cols = perm_rows
    rows = np.asarray(rows, np.int64)
    ccols = np.asarray(vals_cols, np.int64)
    vals = np.asarray(vals)
    iperm_r = np.empty(nrows, np.int64)
    iperm_r[np.asarray(perm_rows, np.int64)] = np.arange(nrows)
    iperm_c = np.empty(ncols, np.int64)
    iperm_c[np.asarray(perm_cols, np.int64)] = np.arange(ncols)
    Rr = -(-nrows // LANE)
    Rc = -(-ncols // LANE)
    rr = iperm_r[rows]
    cc = iperm_c[ccols]
    key = rr * np.int64(ncols) + cc
    uniq, inv = np.unique(key, return_inverse=True)
    vsum = np.zeros(len(uniq), vals.dtype)
    np.add.at(vsum, inv, vals)
    urow = (uniq // ncols).astype(np.int64)
    ucol = (uniq % ncols).astype(np.int64)
    s_of = (ucol // LANE) - (urow // LANE)
    lane = (ucol % LANE).astype(np.int32)
    shift_vals = np.unique(s_of)
    slot_of_uniq = np.empty(len(uniq), np.int64)
    shifts: list[int] = []
    base = 0
    for s in shift_vals:
        m = np.flatnonzero(s_of == s)
        rows_s = urow[m]
        row_start = np.searchsorted(rows_s, rows_s)
        kidx = np.arange(len(m)) - row_start
        Ks = int(kidx.max()) + 1 if len(m) else 0
        slot_of_uniq[m] = base + kidx
        shifts.extend([int(s)] * Ks)
        base += Ks
    S = base
    vals_b = np.zeros((S, Rr * LANE), vals.dtype)
    cols = np.zeros((S, Rr * LANE), np.int32)
    vals_b[slot_of_uniq, urow] = vsum
    cols[slot_of_uniq, urow] = lane
    return (
        tuple(shifts),
        vals_b.reshape(S, Rr, LANE),
        cols.reshape(S, Rr, LANE),
        Rr,
        Rc,
    )


def build_band_tables_sharded(cd_local: np.ndarray, nloc: int, ndev: int):
    """Per-shard band-ELL tables with a COMMON static slot layout across
    shards — under ``shard_map`` the SAME traced kernel runs on every
    shard, so the slot count S, the per-slot shifts, and the tile count R
    must agree shard-to-shard (per-shift slot counts are maxed across
    shards; a shard's unused slots keep value 0 / lane 0, which the
    matvec turns into ``+= 0 * x[...]``).

    ``cd_local``: (ndev*cps, nd) shard-blocked LOCAL cell dofmaps as built
    by :func:`oasisx_tpu.parallel.graph.build_halo_exchange` (local layout
    ``[owned | halo | sentinel]``; all-sentinel rows mark padded cells —
    their element-matrix entries map to a dropped segment, mirroring
    ``graph.build_ell_tables``).

    Each shard gets its own RCM permutation of its local dof block (built
    from its real-cell edges; pad/sentinel slots are isolated vertices).
    The permutation is applied only inside a solve — gather in, scatter
    out — so the halo refresh/fold tables keep the canonical local layout.

    Returns ``(shifts, slots (ndev, cps*nd*nd) int32,
    cols (ndev, S, Rr, 128) int32, perm (ndev, nloc) int32,
    iperm (ndev, nloc) int32, Rr)``.  Assemble values per shard with
    :func:`band_values_dropped`.
    """
    ncp, nd = cd_local.shape
    cps = ncp // ndev
    sent = nloc - 1
    Rr = -(-nloc // LANE)

    per_shard = []
    need: dict[int, int] = {}  # shift -> max per-row slot count over shards
    for s in range(ndev):
        cd = cd_local[s * cps : (s + 1) * cps].astype(np.int64)
        pad_cell = (cd == sent).all(axis=1)
        real = cd[~pad_cell]
        er = np.repeat(real, nd, axis=1).reshape(-1)
        ec = np.tile(real, (1, nd)).reshape(-1)
        perm_s = rcm_permutation(er, ec, nloc)
        iperm_s = np.argsort(perm_s)
        rp = iperm_s[cd]  # (cps, nd) permuted local dofs
        key = (rp[:, :, None] * np.int64(nloc) + rp[:, None, :]).reshape(-1)
        valid = np.broadcast_to(
            ~pad_cell[:, None, None], (cps, nd, nd)
        ).reshape(-1)
        uniq, inv = np.unique(key[valid], return_inverse=True)
        urow = (uniq // nloc).astype(np.int64)
        ucol = (uniq % nloc).astype(np.int64)
        s_of = (ucol // LANE) - (urow // LANE)
        lane = (ucol % LANE).astype(np.int32)
        kidx = np.empty(len(uniq), np.int64)
        for sh in np.unique(s_of):
            m = np.flatnonzero(s_of == sh)
            rows_s = urow[m]  # non-decreasing (uniq is row-major sorted)
            row_start = np.searchsorted(rows_s, rows_s)
            ki = np.arange(len(m)) - row_start
            kidx[m] = ki
            Ks = int(ki.max()) + 1 if len(m) else 0
            need[int(sh)] = max(need.get(int(sh), 0), Ks)
        per_shard.append((valid, inv, urow, s_of, lane, kidx, perm_s, iperm_s))

    shifts: list[int] = []
    base: dict[int, int] = {}
    b = 0
    for sh in sorted(need):
        base[sh] = b
        shifts.extend([sh] * need[sh])
        b += need[sh]
    S = max(b, 1)
    drop = S * Rr * LANE

    slots = np.full((ndev, cps * nd * nd), drop, dtype=np.int32)
    cols = np.zeros((ndev, S, Rr * LANE), np.int32)
    perms = np.zeros((ndev, nloc), np.int32)
    iperms = np.zeros((ndev, nloc), np.int32)
    for s, (valid, inv, urow, s_of, lane, kidx, perm_s, iperm_s) in enumerate(
        per_shard
    ):
        slot_u = np.array([base[int(sh)] for sh in s_of], np.int64) + kidx
        slots[s, valid] = (slot_u[inv] * (Rr * LANE) + urow[inv]).astype(
            np.int32
        )
        cols[s, slot_u, urow] = lane
        perms[s] = perm_s.astype(np.int32)
        iperms[s] = iperm_s.astype(np.int32)
    return (
        tuple(shifts),
        slots,
        cols.reshape(ndev, S, Rr, LANE),
        perms,
        iperms,
        Rr,
    )


def band_values_dropped(elems, slots, S: int, Rr: int):
    """Assemble band-ELL values (S, Rr, 128) from a per-shard element
    stack whose padded-cell entries map to the dropped segment
    ``S*Rr*128`` (build_band_tables_sharded).  One segment-sum per SOLVE."""
    import jax

    v = jax.ops.segment_sum(
        elems.reshape(-1), slots, num_segments=S * Rr * LANE + 1
    )
    return v[:-1].reshape(S, Rr, LANE)
