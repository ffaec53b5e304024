"""Differential tests for the band-ELL kernels (assembly/band.py +
pallas_ops.make_band_*, interpret mode): the unstructured-operator
layout whose gathers are Mosaic-legal on every TPU generation (RCM-
permuted (R, 128) lane tiles, per-slot static block shifts + within-row
lane gathers — probed on hardware: tpu.dynamic_gather only lowers 2D
take_along_axis, so the flat-ELL kernels' 1D gathers are rejected).

Each kernel is compared against the dense/XLA reference on the SAME f32
operator — matvecs exact, Krylov iteration counts identical (mirrored
algebra).  Reference semantics: PETSc KSP solves,
/root/reference/src/oasisx/fracstep.py:508-658."""

import numpy as np

import jax.numpy as jnp

from oasisx_tpu.assembly import band as bd
from oasisx_tpu.assembly import pallas_ops as po
from oasisx_tpu.la.krylov import (
    _effective_rtol,
    bicgstab_batched,
    cg_batched,
    jacobi_preconditioner,
)


def _grid_operator(nx=30, seed=1, scramble=True, dd=6.0):
    """Quad-cell element stacks over an nx*nx vertex grid, with the dof
    numbering scrambled so RCM has real work to do."""
    rng = np.random.default_rng(seed)
    n = nx * nx
    cells = []
    for i in range(nx - 1):
        for j in range(nx - 1):
            v = i * nx + j
            cells.append([v, v + 1, v + nx, v + nx + 1])
    cd = np.asarray(cells)
    nc, nd = cd.shape
    elems = rng.standard_normal((nc, nd, nd)).astype(np.float32)
    for i in range(nd):
        elems[:, i, i] += dd
    if scramble:
        scr = rng.permutation(n)
        cd = scr[cd]
    A = np.zeros((n, n), np.float32)
    for c in range(nc):
        A[np.ix_(cd[c], cd[c])] += elems[c]
    return cd, elems, A, n


def _tables(cd, n):
    nd = cd.shape[1]
    rows = np.repeat(cd, nd, axis=1).reshape(-1)
    cols = np.tile(cd, (1, nd)).reshape(-1)
    perm = bd.rcm_permutation(rows, cols, n)
    shifts, slots, colsb, Rr, Rc = bd.build_band_tables(cd, cd, n, n, perm)
    return perm, np.argsort(perm), shifts, slots, colsb, Rr


def test_rcm_reduces_bandwidth():
    cd, _, A, n = _grid_operator()
    rows, cols = np.nonzero(A)
    perm = bd.rcm_permutation(rows, cols, n)
    iperm = np.argsort(perm)
    bw0 = np.abs(rows - cols).max()
    bw1 = np.abs(iperm[rows] - iperm[cols]).max()
    assert bw1 < bw0 / 4, (bw0, bw1)
    assert sorted(perm.tolist()) == list(range(n))


def test_band_matvec_matches_dense():
    cd, elems, A, n = _grid_operator()
    perm, iperm, shifts, slots, colsb, Rr = _tables(cd, n)
    assert min(shifts) < 0 < max(shifts)  # cross-block shifts exercised
    vals = bd.band_values(jnp.asarray(elems), jnp.asarray(slots),
                          len(shifts), Rr)
    rng = np.random.default_rng(2)
    x = rng.standard_normal((2, n)).astype(np.float32)
    xp = np.zeros((2, Rr * 128), np.float32)
    xp[:, :n] = x[:, perm]
    mv = po.make_band_matvec_batched(shifts, Rr, Rr, 2, interpret=True)
    y = np.asarray(mv(vals, jnp.asarray(colsb), jnp.asarray(xp.reshape(2, Rr, 128))))
    y = y.reshape(2, -1)[:, :n][:, iperm]
    ref = x @ A.T
    assert np.abs(y - ref).max() / np.abs(ref).max() < 1e-5


def test_band_bicgstab_matches_batched():
    cd, elems, A, n = _grid_operator()
    perm, iperm, shifts, slots, colsb, Rr = _tables(cd, n)
    vals = bd.band_values(jnp.asarray(elems), jnp.asarray(slots),
                          len(shifts), Rr)
    rng = np.random.default_rng(3)
    nb = 2
    masks = np.zeros((nb, n), bool)
    masks[0, :17] = True
    masks[1, -9:] = True
    bcv = np.where(masks, 0.7, 0.0).astype(np.float32)
    b = rng.standard_normal((nb, n)).astype(np.float32)
    Aj, masks_j = jnp.asarray(A), jnp.asarray(masks)

    def mvj(X):
        return jnp.where(masks_j, X, jnp.einsum("ij,bj->bi", Aj, X))

    rhs = jnp.where(masks_j, jnp.asarray(bcv), jnp.asarray(b))
    diag = np.diag(A).copy()
    dmask = np.where(masks, 1.0, diag[None]).astype(np.float32)
    rtol = 1e-6
    ref = bicgstab_batched(
        mvj, rhs, x0=jnp.zeros((nb, n), jnp.float32),
        M=jacobi_preconditioner(jnp.asarray(dmask)), rtol=rtol, maxiter=300,
    )

    def to_band(a):
        out = np.zeros((nb, Rr * 128), np.float32)
        out[:, :n] = np.asarray(a)[:, perm]
        return jnp.asarray(out.reshape(nb, Rr, 128))

    zmask = to_band(np.where(masks, 0.0, 1.0))
    x0b = to_band(bcv)
    rhsb = to_band(np.asarray(rhs))
    invd = np.ones(Rr * 128, np.float32)
    invd[:n] = 1.0 / diag[perm]
    invd = jnp.asarray(invd.reshape(Rr, 128))
    mvb = po.make_band_matvec_batched(shifts, Rr, Rr, nb, interpret=True)
    r0 = zmask * (rhsb - mvb(vals, jnp.asarray(colsb), x0b))
    bnorm = jnp.sqrt(jnp.sum(rhsb * rhsb, axis=(1, 2)))
    itf = po.make_band_bicgstab_iter(shifts, Rr, nb, interpret=True)
    xb, itb, rnb, cvb = po.ell_bicgstab_from_r0(
        itf, vals, jnp.asarray(colsb), r0, x0b, zmask, invd, bnorm,
        _effective_rtol(rtol, np.float32), 300,
    )
    assert np.asarray(cvb).all()
    assert np.array_equal(np.asarray(itb), np.asarray(ref.iters))
    xb = np.asarray(xb).reshape(nb, -1)[:, :n][:, iperm]
    err = np.abs(xb - np.asarray(ref.x)).max() / np.abs(np.asarray(ref.x)).max()
    assert err < 5e-4, err


def test_band_cg_matches_batched():
    cd, elems, A, n = _grid_operator(dd=0.0)
    # SPD operator: A A^T + 5 I, as a static COO band table
    spd = (A @ A.T + 5 * np.eye(n)).astype(np.float32)
    rows, cols = np.nonzero(spd)
    perm = bd.rcm_permutation(rows, cols, n)
    iperm = np.argsort(perm)
    shifts, vals2, cols2, Rr, _ = bd.build_band_tables_coo(
        rows, cols, spd[rows, cols], n, n, perm
    )
    rng = np.random.default_rng(4)
    nb = 2
    b = rng.standard_normal((nb, n)).astype(np.float32)
    spd_j = jnp.asarray(spd)
    diag = jnp.asarray(np.diag(spd))
    rtol = 1e-6
    ref = cg_batched(
        lambda X: jnp.einsum("ij,bj->bi", spd_j, X), jnp.asarray(b),
        x0=jnp.zeros_like(b),
        M=jacobi_preconditioner(jnp.broadcast_to(diag[None], (nb, n))),
        rtol=rtol, maxiter=300,
    )
    bp = np.zeros((nb, Rr * 128), np.float32)
    bp[:, :n] = b[:, perm]
    bp = jnp.asarray(bp.reshape(nb, Rr, 128))
    invd = np.ones(Rr * 128, np.float32)
    invd[:n] = 1.0 / np.diag(spd)[perm]
    invd = jnp.asarray(invd.reshape(Rr, 128))
    itf = po.make_band_cg_iter(shifts, Rr, nb, interpret=True)
    bnorm = jnp.sqrt(jnp.sum(bp * bp, axis=(1, 2)))
    xb, itb, rnb, cvb = po.ell_cg_batched_from_r0(
        itf, jnp.asarray(vals2), jnp.asarray(cols2), bp, jnp.zeros_like(bp),
        invd, bnorm, _effective_rtol(rtol, np.float32), 300,
    )
    assert np.asarray(cvb).all()
    assert np.array_equal(np.asarray(itb), np.asarray(ref.iters))
    xb = np.asarray(xb).reshape(nb, -1)[:, :n][:, iperm]
    err = np.abs(xb - np.asarray(ref.x)).max() / np.abs(np.asarray(ref.x)).max()
    assert err < 5e-4, err
