"""Owned-dof halo sharding for GENERAL (unstructured) meshes.

Round-3 item: the round-2 owned-dof path (parallel/slab.py) covers only
structured no-outlet configs; everything else fell back to replicated dof
vectors + a full-vector psum per operator application.  This module is the
config-agnostic equivalent of the reference's MPI domain decomposition —
DOLFINx partitions cells at mesh creation and every rank holds owned+ghost
dofs with IndexMap scatters (/root/reference/src/oasisx/fracstep.py:390,
453,464,496-502,545,551,581-591; SURVEY §2b L0):

- cells are partitioned by recursive coordinate bisection (RCB) of their
  centroids into ``ndev`` equal contiguous blocks (a geometric partitioner
  keeps inter-shard surfaces — and therefore halos — small without an
  external graph partitioner);
- each dof is OWNED by the lowest-index shard whose cells touch it; a
  shard's HALO is the dofs its cells touch but does not own;
- the local dof layout is ``[owned | halo | sentinel]`` padded to common
  sizes across shards (SPMD static shapes); the single sentinel slot
  absorbs padded gather/scatter rows;
- the exchange schedule edge-colors the (shard -> owner) message graph
  into ROUNDS — per round each shard sends to at most one destination and
  receives from at most one source, so the round is ONE ``ppermute`` with
  an arbitrary (src, dst) pair list (NOT a uniform ring shift; XLA
  collective-permute takes any partial permutation).  Messages are placed
  into rounds largest-first, so each round's buffer is sized by similar
  messages and only participating links move bytes — a chain partition
  costs its true halo, and an irregular partition is not punished by
  all-shards ring padding:
  ``halo_fold``   == scatter_reverse(add): halo contributions -> owner
  ``halo_refresh``== scatter_forward: owner values -> halo slots.

Invariant (as in slab.py): halo+pad slots are ZERO in every assembled /
solution vector, so local dots + one scalar psum give global reductions.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

import jax
import jax.numpy as jnp


def rcb_partition(centroids: np.ndarray, ndev: int) -> np.ndarray:
    """Recursive coordinate bisection: split the cell set into ``ndev``
    equal-count parts by recursively cutting at the coordinate median of
    the widest axis.  Returns shard index per cell (exactly balanced up to
    rounding)."""
    nc = centroids.shape[0]
    out = np.zeros(nc, dtype=np.int32)

    def rec(idx: np.ndarray, parts: int, base: int) -> None:
        if parts == 1:
            out[idx] = base
            return
        pts = centroids[idx]
        widths = pts.max(axis=0) - pts.min(axis=0)
        ax = int(np.argmax(widths))
        lo_parts = parts // 2
        k = int(round(len(idx) * lo_parts / parts))
        order = np.argsort(pts[:, ax], kind="stable")
        rec(idx[order[:k]], lo_parts, base)
        rec(idx[order[k:]], parts - lo_parts, base + lo_parts)

    rec(np.arange(nc), ndev, 0)
    return out


def color_messages(sizes: list[tuple[int, int, int]]) -> list[list[int]]:
    """Greedy size-sorted edge coloring of point-to-point messages.

    ``sizes``: [(src, dst, size)].  Returns rounds as lists of message
    indices; within a round all srcs are distinct and all dsts are
    distinct (a partial permutation -> one ``ppermute``).  Processing
    largest-first packs similar sizes together, so the per-round buffer
    (max size in round) wastes little: total cost ~= true halo bytes.
    Also the shared cost model for partition selection
    (partition.schedule_cost)."""
    order = sorted(range(len(sizes)), key=lambda i: -sizes[i][2])
    rounds: list[list[int]] = []
    used: list[tuple[set, set]] = []
    bmax: list[int] = []  # per-round buffer width (max message size)
    for i in order:
        s, o, sz = sizes[i]
        # place where the incremental payload (len(round) grows by one at
        # width max(B, sz), possibly widening existing members) is minimal;
        # opening a fresh round costs sz payload + one more ppermute of
        # latency, so joining is preferred while its padding overhead stays
        # under 25% of the message
        best, best_inc = None, sz + (sz >> 2) + 1
        for ridx, (su, du) in enumerate(used):
            if s in su or o in du:
                continue
            nb = max(bmax[ridx], sz)
            inc = nb * (len(rounds[ridx]) + 1) - bmax[ridx] * len(rounds[ridx])
            if inc < best_inc:
                best, best_inc = ridx, inc
        if best is None:
            rounds.append([i])
            used.append(({s}, {o}))
            bmax.append(sz)
        else:
            rounds[best].append(i)
            used[best][0].add(s)
            used[best][1].add(o)
            bmax[best] = max(bmax[best], sz)
    return rounds


@dataclass
class HaloExchange:
    """Static exchange schedule for one function space (host-built)."""

    ndev: int
    nloc: int  # owned_pad + halo_pad + 1 (sentinel)
    owned_pad: int
    # canonical dof -> global local-flat position shard*nloc + local of the
    # OWNING shard (for host<->device vector conversion)
    perm: np.ndarray
    # per round: (pairs ((src, dst), ...) for the fold direction,
    # pack (ndev, B), unpack (ndev, B)) int32; sentinel-padded rows point
    # at nloc-1; non-participating shards have all-sentinel rows
    sched: list
    # (ndev*nloc,) float mask: 1.0 on owned non-pad slots
    ownmask: np.ndarray
    # per-shard local cell_dofs (ndev*cells_per_shard, ndpc) into [0, nloc)
    cell_dofs_local: np.ndarray


def build_halo_exchange(
    cell_dofs: np.ndarray, shard_of_cell: np.ndarray, ndev: int,
    cell_perm: np.ndarray, cells_per_shard: int,
) -> HaloExchange:
    """Build ownership, local numbering, and the ppermute schedule for one
    dofmap.  ``cell_perm`` is the shard-blocked cell order (padded with -1
    rows up to ndev*cells_per_shard); ``shard_of_cell`` indexes ORIGINAL
    cells."""
    num_dofs = int(cell_dofs.max()) + 1
    ndpc = cell_dofs.shape[1]

    # owner = lowest shard touching the dof
    owner = np.full(num_dofs, ndev, dtype=np.int32)
    for s in range(ndev):
        dofs_s = np.unique(cell_dofs[shard_of_cell == s])
        owner[dofs_s] = np.minimum(owner[dofs_s], s)
    assert (owner < ndev).all(), "dof untouched by any cell"

    # per-shard owned and halo dof lists (sorted for locality)
    owned = [np.where(owner == s)[0] for s in range(ndev)]
    halo = []
    for s in range(ndev):
        touched = np.unique(cell_dofs[shard_of_cell == s])
        halo.append(touched[owner[touched] != s])
    owned_pad = max(len(o) for o in owned)
    halo_pad = max((len(h) for h in halo), default=0)
    nloc = owned_pad + halo_pad + 1  # +1 sentinel
    sent = nloc - 1

    # local index of each (shard, dof)
    loc = np.full((ndev, num_dofs), -1, dtype=np.int64)
    for s in range(ndev):
        loc[s, owned[s]] = np.arange(len(owned[s]))
        loc[s, halo[s]] = owned_pad + np.arange(len(halo[s]))

    perm = np.empty(num_dofs, dtype=np.int64)
    for s in range(ndev):
        perm[owned[s]] = s * nloc + loc[s, owned[s]]

    # exchange schedule: one message per (halo holder s -> owner o) pair,
    # edge-colored into rounds (largest-first greedy; per round every
    # shard sends <=1 and receives <=1, so each round is one ppermute)
    msgs = []  # (s, o, sender halo locs, owner owned locs)
    for s in range(ndev):
        if not len(halo[s]):
            continue
        o_of = owner[halo[s]]
        for o in np.unique(o_of):
            hd = halo[s][o_of == o]
            msgs.append((s, int(o), loc[s, hd], loc[o, hd]))
    rounds = color_messages([(s, o, len(sl)) for s, o, sl, _ in msgs])
    sched = []
    for ridx in rounds:
        B = max(len(msgs[i][2]) for i in ridx)
        pack = np.full((ndev, B), sent, dtype=np.int32)
        unpack = np.full((ndev, B), sent, dtype=np.int32)
        pairs = []
        for i in ridx:
            s, o, sl, ol = msgs[i]
            pack[s, : len(sl)] = sl
            unpack[o, : len(ol)] = ol
            pairs.append((s, o))
        sched.append((tuple(pairs), pack, unpack))

    # ownmask
    ownmask = np.zeros(ndev * nloc)
    for s in range(ndev):
        ownmask[s * nloc : s * nloc + len(owned[s])] = 1.0

    # local cell dofmaps in shard-blocked order
    nc_pad = ndev * cells_per_shard
    cdl = np.full((nc_pad, ndpc), sent, dtype=np.int32)
    for i, c in enumerate(cell_perm):
        if c < 0:
            continue
        s = i // cells_per_shard
        cdl[i] = loc[s, cell_dofs[c]]
    assert (cdl >= 0).all()

    return HaloExchange(
        ndev=ndev,
        nloc=nloc,
        owned_pad=owned_pad,
        perm=perm,
        sched=sched,
        ownmask=ownmask,
        cell_dofs_local=cdl,
    )


def build_ell_tables(
    cd_rows: np.ndarray, cd_cols: np.ndarray, nloc: int, ndev: int
) -> tuple[int, np.ndarray, np.ndarray]:
    """Per-shard ELL sparsity for the local operator (VERDICT r3 #4).

    The per-shard matvec in ELL form is pure take+FMA —
    ``y[r] = sum_k vals[k, r] * x[cols[k, r]]`` — the TPU-friendliest
    unstructured operator application (no per-element scatters; the values
    are (re)assembled once per solve from the element stacks by ONE
    segment-sum, hoisted out of the Krylov loop).

    ``cd_rows``/``cd_cols`` are shard-blocked local cell dofmaps
    (ndev*cps, ndr/ndc) as built by :func:`build_halo_exchange`
    (sentinel-padded rows mark padded cells). Returns
    ``(K, slots (ndev, cps*ndr*ndc) int32, cols (ndev, K, nloc) int32)``
    where ``slots`` maps each flattened per-shard element-matrix entry to
    its segment ``k*nloc + row`` (padded cells -> the dropped sentinel
    segment ``K*nloc``) and unassigned (k, row) slots keep value 0 /
    column 0.
    """
    ncp_total, ndr = cd_rows.shape
    ndc = cd_cols.shape[1]
    cps = ncp_total // ndev
    sent_dof = nloc - 1
    per_shard = []  # (valid mask, inv->unique, urow (sorted), ucol, kidx)
    Ks = []
    for s in range(ndev):
        cr = cd_rows[s * cps : (s + 1) * cps].astype(np.int64)
        cc = cd_cols[s * cps : (s + 1) * cps].astype(np.int64)
        pad_cell = (cr == sent_dof).all(axis=1)
        key = (
            np.broadcast_to(cr[:, :, None], (cps, ndr, ndc)) * nloc
            + np.broadcast_to(cc[:, None, :], (cps, ndr, ndc))
        ).reshape(-1)
        valid = np.broadcast_to(
            ~pad_cell[:, None, None], (cps, ndr, ndc)
        ).reshape(-1)
        uniq, inv = np.unique(key[valid], return_inverse=True)
        urow = uniq // nloc
        ucol = uniq % nloc
        # per-row running slot index (uniq is sorted, so rows are grouped)
        row_start = np.searchsorted(urow, urow)
        kidx = np.arange(len(uniq)) - row_start
        per_shard.append((valid, inv, urow, ucol, kidx))
        Ks.append(int(kidx.max()) + 1 if len(uniq) else 1)
    K = max(Ks)

    slots = np.full((ndev, cps * ndr * ndc), K * nloc, dtype=np.int32)
    cols = np.zeros((ndev, K, nloc), dtype=np.int32)
    for s, (valid, inv, urow, ucol, kidx) in enumerate(per_shard):
        slots[s, valid] = (kidx[inv] * nloc + urow[inv]).astype(np.int32)
        cols[s, kidx, urow] = ucol.astype(np.int32)
    return K, slots, cols


def ell_values(elems: jax.Array, slots: jax.Array, K: int, nloc: int) -> jax.Array:
    """Assemble ELL values (K, nloc) from a per-shard element-matrix stack
    (one segment-sum per SOLVE, not per Krylov iteration)."""
    v = jax.ops.segment_sum(
        elems.reshape(-1), slots, num_segments=K * nloc + 1
    )
    return v[:-1].reshape(K, nloc)


# ---------------------------------------------------------------------------
# device-side collectives (called inside shard_map over `axis`); the tables
# arrive as per-shard blocks of the (ndev, B) arrays (leading dim sharded)
# ---------------------------------------------------------------------------


class HaloTables:
    """Device-side halo-exchange bundle.

    The traced part is a plain pytree ``(packs, unpacks, ownmask)`` —
    tuples of (ndev, B_round) int32 tables (leading dim sharded under
    shard_map) and the (ndev*nloc,) owned-slot mask; the per-round
    ``perms`` are static ((src, dst), ...) pair tuples.  Kept as a thin
    namespace rather than a registered pytree so shard_map specs stay
    explicit."""

    def __init__(self, packs, unpacks, ownmask, perms):
        self.packs = packs
        self.unpacks = unpacks
        self.ownmask = ownmask
        self.perms = perms

    def tree(self):
        return (self.packs, self.unpacks, self.ownmask)

    @staticmethod
    def specs(axis: str):
        from jax.sharding import PartitionSpec as P

        def spec_of(t):
            return tuple(P(axis, None) for _ in t)

        return None  # built by callers per schedule length


def make_halo_tables(hx: HaloExchange, dtype):
    """-> (tree, perms): tree = (packs, unpacks, ownmask) pytree of device
    arrays; perms = static per-round ((src, dst), ...) pair tuples (fold
    direction)."""
    packs = tuple(jnp.asarray(p) for _, p, _ in hx.sched)
    unpacks = tuple(jnp.asarray(u) for _, _, u in hx.sched)
    ownmask = jnp.asarray(hx.ownmask, dtype=dtype)
    perms = tuple(tuple(pairs) for pairs, _, _ in hx.sched)
    return (packs, unpacks, ownmask), perms


def halo_tree_specs(tree, axis: str):
    """shard_map PartitionSpecs matching a (packs, unpacks, ownmask) tree."""
    from jax.sharding import PartitionSpec as P

    packs, unpacks, ownmask = tree
    return (
        tuple(P(axis, None) for _ in packs),
        tuple(P(axis, None) for _ in unpacks),
        P(axis),
    )


def halo_fold(y: jax.Array, tree, perms, axis: str):
    """scatter_reverse(add): push halo contributions to their owners, then
    zero every non-owned slot.  ``y``: (..., nloc) per shard.  Each round
    is ONE ppermute over that round's (halo holder -> owner) pairs;
    non-participating shards receive zeros and add them to the sentinel
    slot."""
    packs, unpacks, ownmask = tree
    for pairs, pack, unpack in zip(perms, packs, unpacks):
        buf = jnp.take(y, pack[0], axis=-1)
        buf = jax.lax.ppermute(buf, axis, pairs)
        y = y.at[..., unpack[0]].add(buf)
    return y * ownmask


def halo_refresh(x: jax.Array, tree, perms, axis: str):
    """scatter_forward: owners push current values into the halo slots
    (the reversed pair list of each fold round; non-participants set their
    sentinel slot to the zero fill)."""
    packs, unpacks, _ = tree
    for pairs, pack, unpack in zip(perms, packs, unpacks):
        buf = jnp.take(x, unpack[0], axis=-1)
        buf = jax.lax.ppermute(buf, axis, [(o, s) for s, o in pairs])
        x = x.at[..., pack[0]].set(buf)
    return x
