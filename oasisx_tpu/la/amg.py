"""Smoothed-aggregation algebraic multigrid for the unstructured pressure
Poisson.

Reference parity: the reference solves its pressure systems with PETSc
``preonly + lu`` (MUMPS) or leaves users ``pc_type: gamg / hypre``
(/root/reference/src/oasisx/fracstep.py:553-605, src/oasisx/ksp.py) — a
scalable O(n) preconditioner the rebuild's unstructured path lacked
(Chebyshev-Jacobi PCG cost ~80 iters/step on the DFG cylinder).  This
module provides the TPU-native equivalent: classic smoothed aggregation
(Vanek-Mandel-Brezina) with

- host-side numpy SETUP (once per operator): strength graph, greedy
  aggregation, Jacobi-smoothed tentative prolongation, Galerkin coarse
  operators, dense pseudo-inverse at the coarsest level (pinv also
  handles the singular pure-Neumann operator);
- device-side APPLY that is jit/scan-composable with STATIC shapes:
  level operators and transfer matrices in ELL form (padded row-major
  gather + row-sum — the TPU-fast sparse matvec; XLA scatter with
  colliding indices serializes), damped-Jacobi smoothing, a symmetric
  V(1,1) cycle usable as a PCG preconditioner.

Setup cost is seconds at ~1e5 dofs and amortizes over the whole run; the
per-iteration apply is a handful of gathers/FMAs per level with
geometrically shrinking sizes.
"""

from __future__ import annotations

import logging

import numpy as np

import jax
import jax.numpy as jnp

logger = logging.getLogger(__name__)

__all__ = ["AlgebraicMG", "coo_from_elems"]


def coo_from_elems(cd: np.ndarray, elems: np.ndarray, n: int):
    """Assemble element stacks (nc, m, m) with dofmap (nc, m) into
    duplicate-summed COO (rows, cols, vals) of the n x n operator."""
    nc, m = cd.shape
    rows = np.repeat(cd, m, axis=1).reshape(-1)
    cols = np.tile(cd, (1, m)).reshape(-1)
    vals = np.asarray(elems, np.float64).reshape(-1)
    return _sum_duplicates(rows.astype(np.int64), cols.astype(np.int64), vals, n)


def _sum_duplicates(rows, cols, vals, n):
    key = rows * n + cols
    order = np.argsort(key, kind="stable")
    key, vals = key[order], vals[order]
    first = np.ones(key.shape[0], bool)
    first[1:] = key[1:] != key[:-1]
    starts = np.flatnonzero(first)
    vals = np.add.reduceat(vals, starts)
    key = key[starts]
    return (key // n).astype(np.int64), (key % n).astype(np.int64), vals


def _csr_pointers(rows, n):
    counts = np.bincount(rows, minlength=n)
    indptr = np.zeros(n + 1, np.int64)
    np.cumsum(counts, out=indptr[1:])
    return indptr


def _aggregate(rows, cols, vals, n, theta=0.25, shard=None):
    """Greedy aggregation on the strength graph
    |a_ij| >= theta*sqrt(a_ii*a_jj) (standard SA passes 1-3).
    Returns (agg ids (n,), nagg).  Rows with no strong neighbours
    (Dirichlet identity rows, isolated dofs) become singletons.

    ``shard`` (n,) optional: strong edges crossing shard boundaries are
    dropped, so every aggregate is SHARD-PURE — the property the
    distributed fine-level apply relies on (each shard owns whole
    aggregates and the smoothed prolongation rows of its owned fine
    dofs)."""
    diag = np.zeros(n)
    dmask = rows == cols
    diag[rows[dmask]] = vals[dmask]
    off = ~dmask
    r, c, v = rows[off], cols[off], vals[off]
    dd = np.sqrt(np.abs(diag[r] * diag[c]))
    strong = np.abs(v) >= theta * np.where(dd > 0, dd, np.inf)
    if shard is not None:
        strong &= shard[r] == shard[c]
    r, c = r[strong], c[strong]
    order = np.argsort(r, kind="stable")
    r, c = r[order], c[order]
    indptr = _csr_pointers(r, n)

    agg = np.full(n, -1, np.int64)
    nagg = 0
    # pass 1: roots whose whole strong neighbourhood is free
    for i in range(n):
        if agg[i] >= 0:
            continue
        nb = c[indptr[i] : indptr[i + 1]]
        if (agg[nb] >= 0).any():
            continue
        agg[i] = nagg
        agg[nb] = nagg
        nagg += 1
    # pass 2: attach leftovers to a strongly-connected aggregate
    for i in range(n):
        if agg[i] >= 0:
            continue
        nb = c[indptr[i] : indptr[i + 1]]
        nb = nb[agg[nb] >= 0]
        if nb.size:
            agg[i] = agg[nb[0]]
    # pass 3: remaining nodes (no strong neighbours at all) -> singletons
    for i in range(n):
        if agg[i] < 0:
            agg[i] = nagg
            nagg += 1
    return agg, nagg


def _smoothed_prolongation(rows, cols, vals, n, agg, nagg, invd, omega):
    """P = (I - omega D^-1 A) T with T the piecewise-constant tentative
    prolongation over aggregates; returned as duplicate-summed COO."""
    pr = np.concatenate([np.arange(n), rows])
    pc = np.concatenate([agg, agg[cols]])
    pv = np.concatenate([np.ones(n), -omega * invd[rows] * vals])
    return _sum_duplicates(pr, pc, pv, nagg)


def _galerkin(prows, pcols, pvals, arows, acols, avals, n_f, n_c):
    """A_c = P^T A P via two COO x CSR-of-P expansions (all-numpy)."""
    order = np.argsort(prows, kind="stable")
    pr, pc, pv = prows[order], pcols[order], pvals[order]
    indptr = _csr_pointers(pr, n_f)
    nnz_row = np.diff(indptr)

    def prow_idx(fine_rows):
        """flat indices into (pc, pv) enumerating P's rows at fine_rows,
        plus the repeat counts (vectorized CSR row expansion)."""
        rep = nnz_row[fine_rows]
        base = np.repeat(indptr[fine_rows], rep)
        offs = np.arange(rep.sum()) - np.repeat(
            np.concatenate(([0], np.cumsum(rep)[:-1])), rep
        )
        return base + offs, rep

    # AP: for A entry (i, j, v) and P entry (j, J, w) -> (i, J, v*w)
    idx, rep = prow_idx(acols)
    apr, apc, apv = _sum_duplicates(
        np.repeat(arows, rep), pc[idx], np.repeat(avals, rep) * pv[idx], n_c
    )
    # P^T(AP): for AP entry (i, J, u) and P entry (i, I, w) -> (I, J, w*u)
    idx, rep = prow_idx(apr)
    return _sum_duplicates(
        pc[idx], np.repeat(apc, rep), pv[idx] * np.repeat(apv, rep), n_c
    )


def _to_ell(rows, cols, vals, n, dtype):
    """COO -> ELL: (cols (n, K) int32, vals (n, K)); padding points at row 0
    with zero weight, so the device matvec is (vals * x[cols]).sum(-1)."""
    indptr = _csr_pointers(rows, n)  # rows must be sorted (sum_duplicates)
    K = max(1, int(np.diff(indptr).max()))
    ecols = np.zeros((n, K), np.int32)
    evals = np.zeros((n, K), np.float64)
    pos = np.arange(rows.shape[0]) - indptr[rows]
    ecols[rows, pos] = cols
    evals[rows, pos] = vals
    return jnp.asarray(ecols), jnp.asarray(evals, dtype)


def _power_lmax(rows, cols, vals, invd, n, iters=30, seed=7):
    """lambda_max(D^-1 A) by host power iteration (numpy)."""
    rng = np.random.default_rng(seed)
    x = rng.standard_normal(n)
    lam = 1.0
    for _ in range(iters):
        y = np.zeros(n)
        np.add.at(y, rows, vals * x[cols])
        y *= invd
        lam = np.linalg.norm(y)
        if lam == 0:
            return 1.0
        x = y / lam
    return float(lam)


class AlgebraicMG:
    """Symmetric V(1,1) smoothed-aggregation AMG preconditioner.

    ``vcycle(r) -> z`` approximates A^-1 r; jit-composable, static shapes.
    """

    def __init__(
        self,
        rows: np.ndarray,
        cols: np.ndarray,
        vals: np.ndarray,
        n: int,
        dtype=jnp.float32,
        theta: float = 0.25,
        coarse_max: int = 400,
        max_levels: int = 10,
        pre: int = 1,
        post: int = 1,
        nullvec: np.ndarray | None = None,
        dof_shard: np.ndarray | None = None,
    ):
        """``nullvec``: operator nullspace vector (the IPCS pure-Neumann
        pressure constant).  The V-cycle then projects it out of both its
        input and output — without this the coarse pseudo-inverse leaks
        nullspace components that stall PCG (the projected preconditioner
        stays symmetric positive definite on the complement).

        ``dof_shard`` (n,) optional: owning shard per fine dof.  Level-0
        aggregation then never crosses shard boundaries, and ``self.dist``
        records the pieces a distributed fine-level apply needs (the
        level-0 smoothed prolongation in COO form plus the owning shard of
        each aggregate); coarser levels stay unconstrained (they are
        applied replicated either way).  The resulting V-cycle is the SAME
        operator whether applied replicated (``vcycle``) or distributed —
        only the data movement differs."""
        self.pre, self.post = pre, post
        self.nullvec = None if nullvec is None else jnp.asarray(nullvec, dtype)
        self.levels = []  # (ell_cols, ell_vals, invd*omega_s, R_ell, P_ell)
        self.dist = None
        # canonicalize (row-major sorted, duplicate-summed) — callers may
        # hand-edit entries (e.g. Dirichlet identity rows)
        lrows, lcols, lvals = _sum_duplicates(
            np.asarray(rows, np.int64), np.asarray(cols, np.int64),
            np.asarray(vals, np.float64), n,
        )
        ln = n
        for li in range(max_levels):
            diag = np.zeros(ln)
            dm = lrows == lcols
            diag[lrows[dm]] = lvals[dm]
            invd = np.where(diag != 0, 1.0 / np.where(diag != 0, diag, 1.0), 1.0)
            if ln <= coarse_max:
                break
            # adaptive strength threshold: Galerkin coarse operators have
            # wide stencils whose off-diagonals are mostly weak vs a fixed
            # theta — greedy aggregation then degenerates to singletons
            # (observed on the DFG cylinder at res=40: stall at n=2904).
            # Retry a stalled level with progressively smaller theta; at
            # theta=0 every connection is strong, so any connected graph
            # coarsens.  Standard SA practice (PyAMG weakens strength on
            # coarse levels for the same reason).
            for th in (theta, theta / 4.0, 0.0):
                agg, nagg = _aggregate(
                    lrows, lcols, lvals, ln, th,
                    shard=dof_shard if li == 0 else None,
                )
                if nagg < 0.5 * ln:
                    break
            if nagg >= 0.9 * ln:  # no meaningful coarsening left
                break
            lmax = _power_lmax(lrows, lcols, lvals, invd, ln)
            omega_p = 4.0 / (3.0 * lmax)
            prw, pcl, pvl = _smoothed_prolongation(
                lrows, lcols, lvals, ln, agg, nagg, invd, omega_p
            )
            if li == 0 and dof_shard is not None:
                self.dist = dict(
                    P0=(prw.copy(), pcl.copy(), pvl.copy()),
                    sm0=invd * (4.0 / (3.0 * lmax)),
                    nagg0=nagg,
                )
            crw, ccl, cvl = _galerkin(prw, pcl, pvl, lrows, lcols, lvals, ln, nagg)
            ell_c, ell_v = _to_ell(lrows, lcols, lvals, ln, dtype)
            # restriction = P^T: swap row/col then duplicate-sort by row
            rrw, rcl, rvl = _sum_duplicates(pcl, prw, pvl, ln)
            self.levels.append(
                dict(
                    n=ln,
                    nc=nagg,
                    A=(ell_c, ell_v),
                    sm=jnp.asarray(invd * (4.0 / (3.0 * lmax)), dtype),
                    P=_to_ell(prw, pcl, pvl, ln, dtype),
                    R=_to_ell(rrw, rcl, rvl, nagg, dtype),
                )
            )
            lrows, lcols, lvals, ln = crw, ccl, cvl, nagg
        # coarsest: dense pseudo-inverse (pinv -> also handles the singular
        # pure-Neumann pressure operator).  Guard the dense materialization:
        # if aggregation stalled (weak connections vs theta, e.g. a strongly
        # graded mesh) ln can still be large — raise so the caller falls
        # back to Chebyshev instead of an O(ln^3) SVD / host OOM here.
        if ln > max(4 * coarse_max, 2000):
            raise ValueError(
                f"AMG coarsening stalled at n={ln} (> {max(4 * coarse_max, 2000)}):"
                " aggregation found too few strong connections"
            )
        Ad = np.zeros((ln, ln))
        Ad[lrows, lcols] = lvals
        self.coarse_inv = jnp.asarray(np.linalg.pinv(Ad), dtype)
        self.num_levels = len(self.levels) + 1
        self.coarse_n = ln

    @staticmethod
    def _ell_mv(ell, x):
        cols, vals = ell
        return jnp.sum(vals * x[cols], axis=-1)

    def _cycle(self, li: int, r: jax.Array) -> jax.Array:
        if li == len(self.levels):
            return self.coarse_inv @ r
        lv = self.levels[li]
        A, sm = lv["A"], lv["sm"]
        z = sm * r
        for _ in range(self.pre - 1):
            z = z + sm * (r - self._ell_mv(A, z))
        rc = self._ell_mv(lv["R"], r - self._ell_mv(A, z))
        z = z + self._ell_mv(lv["P"], self._cycle(li + 1, rc))
        for _ in range(self.post):
            z = z + sm * (r - self._ell_mv(A, z))
        return z

    def _project(self, x: jax.Array) -> jax.Array:
        nv = self.nullvec
        return x - (jnp.vdot(nv, x) / jnp.vdot(nv, nv)) * nv

    def vcycle(self, r: jax.Array) -> jax.Array:
        if self.nullvec is None:
            return self._cycle(0, r)
        return self._project(self._cycle(0, self._project(r)))

    def cycle_coarse(self, rc: jax.Array) -> jax.Array:
        """The V-cycle from level 1 down (the levels a distributed apply
        runs replicated after restricting the fine residual per shard)."""
        return self._cycle(1, rc)
