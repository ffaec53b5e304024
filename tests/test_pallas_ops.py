"""Pallas kernel correctness (interpret mode on CPU) vs cube/Krylov refs."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from oasisx_tpu.assembly import cubes as cu
from oasisx_tpu.assembly import pallas_ops as po
from oasisx_tpu.la import cg
from tests.test_cubes import _grid, setup


def test_matvec_kernel_v_and_q():
    mesh, ctx, refs, ops, (sm_v, gf_v, _), (sm_q, gf_q, _) = setup(3, 3, 2, 1)
    rng = np.random.default_rng(11)
    x = jnp.asarray(_grid(rng.standard_normal(ctx.ndofs_v), gf_v, sm_v), jnp.float32)
    xq = jnp.asarray(_grid(rng.standard_normal(ctx.ndofs_q), gf_q, sm_q), jnp.float32)

    mv = po.make_matvec(sm_v, np.asarray(ops.M_c), interpret=True)
    ref = np.asarray(cu.matvec_cube(x, ops.M_c.astype(jnp.float32), sm_v))
    got = np.asarray(mv(x))
    assert np.allclose(got, ref, atol=1e-4), np.abs(got - ref).max()

    mvq = po.make_matvec(sm_q, np.asarray(ops.Ap_c), interpret=True)
    ref = np.asarray(cu.matvec_cube(xq, ops.Ap_c.astype(jnp.float32), sm_q))
    got = np.asarray(mvq(xq))
    assert np.allclose(got, ref, atol=1e-4)

    # batched
    mvb = po.make_matvec(sm_v, np.asarray(ops.M_c), batch=2, interpret=True)
    xb = jnp.stack([x, 2 * x])
    got = np.asarray(mvb(xb))
    assert np.allclose(got[1], 2 * np.asarray(mv(x)), atol=1e-4)


@pytest.mark.parametrize("cheb", [0, 6])
def test_pressure_cg_kernel(cheb):
    mesh, ctx, refs, ops, _, (sm_q, gf_q, _) = setup(3, 4, 2, 1)
    rng = np.random.default_rng(12)
    n = int(np.prod(po._grid_shape(sm_q)))
    Ap = np.asarray(ops.Ap_c)
    diag = np.asarray(cu.diag_cube(ops.Ap_c, sm_q))
    invd = np.where(diag != 0, 1.0 / np.where(diag != 0, diag, 1.0), 1.0)

    mv = po.make_matvec(sm_q, Ap, interpret=True)
    jmv = lambda v: jnp.asarray(invd, jnp.float32) * mv(v)
    lmin, lmax = po.estimate_eig_bounds(jmv, n, jnp.float32)

    solve = po.make_pressure_cg(
        sm_q, Ap, invd, rtol=1e-6, maxiter=500, cheb_degree=cheb,
        lmin=lmin, lmax=lmax, interpret=True,
    )
    b = rng.standard_normal(n).astype(np.float32)
    b -= b.mean()
    x, iters, res, conv = solve(jnp.asarray(b), jnp.zeros(n, jnp.float32))
    assert bool(conv), (int(iters), float(res))
    # compare against the XLA CG solution
    ref = cg(
        lambda v: cu.matvec_cube(v, ops.Ap_c.astype(jnp.float32), sm_q),
        jnp.asarray(b),
        M=lambda r: jnp.asarray(invd, jnp.float32) * r,
        rtol=1e-6,
        maxiter=500,
        project_nullspace=True,
    )
    xr = np.asarray(ref.x)
    xg = np.asarray(x)
    scale = max(1.0, np.abs(xr).max())
    assert np.abs(xg - xr).max() / scale < 5e-4, np.abs(xg - xr).max()


@pytest.mark.parametrize("dim,N", [(2, 16), (3, 8)])
def test_pressure_mg_kernel(dim, N):
    """In-kernel geometric-MG PCG (VERDICT r3 #2): matches the XLA CG
    solution and converges in near-mesh-independent iteration counts
    (factor >=5 below Jacobi-CG on these sizes)."""
    mesh, ctx, refs, ops, _, (sm_q, gf_q, _) = setup(dim, N, 2, 1)
    rng = np.random.default_rng(12)
    n = int(np.prod(po._grid_shape(sm_q)))
    Ap = np.asarray(ops.Ap_c)
    diag = np.asarray(cu.diag_cube(ops.Ap_c, sm_q))
    invd = np.where(diag != 0, 1.0 / np.where(diag != 0, diag, 1.0), 1.0)
    mg = po.build_pressure_mg_data(sm_q, Ap, coarsest=2)
    assert mg is not None and len(mg["levels"]) >= 3
    solve = po.make_pressure_cg(
        sm_q, Ap, invd, rtol=1e-6, maxiter=500, mg=mg, interpret=True
    )
    b = rng.standard_normal(n).astype(np.float32)
    b -= b.mean()
    x, iters, res, conv = solve(jnp.asarray(b), jnp.zeros(n, jnp.float32))
    assert bool(conv), (int(iters), float(res))
    assert int(iters) <= 8, int(iters)
    ref = cg(
        lambda v: cu.matvec_cube(v, ops.Ap_c.astype(jnp.float32), sm_q),
        jnp.asarray(b),
        M=lambda r: jnp.asarray(invd, jnp.float32) * r,
        rtol=1e-6,
        maxiter=500,
        project_nullspace=True,
    )
    assert int(iters) * 5 <= int(ref.iters)
    xr, xg = np.asarray(ref.x), np.asarray(x)
    scale = max(1.0, np.abs(xr).max())
    assert np.abs(xg - xr).max() / scale < 5e-4, np.abs(xg - xr).max()


def test_pressure_mg_data_gating():
    """Odd cell counts / high degree do not build an MG hierarchy."""
    mesh, ctx, refs, ops, (sm_v, _, _), (sm_q, _, _) = setup(2, 5, 2, 1)
    assert po.build_pressure_mg_data(sm_q, np.asarray(ops.Ap_c)) is None
    # velocity map has deg=2: not a P1 grid
    mesh, ctx, refs, ops, (sm_v, _, _), _ = setup(2, 8, 2, 1)
    assert po.build_pressure_mg_data(sm_v, np.asarray(ops.K_c)) is None


def test_gather_scatter_and_staged_matvec():
    """3-stage (gather kernel -> einsum -> scatter kernel) tentative matvec
    vs the cube engine (interpret mode)."""
    mesh, ctx, refs, ops, (sm_v, gf_v, _), _ = setup(3, 3, 2, 1)
    rng = np.random.default_rng(13)
    d = mesh.dim
    nl = ops.M_c.shape[0]
    cells = sm_v[1]
    xs = np.stack(
        [_grid(rng.standard_normal(ctx.ndofs_v), gf_v, sm_v) for _ in range(d)]
    ).astype(np.float32)
    x = jnp.asarray(xs)
    gv = po.make_gather_chunked(sm_v, batch=d, interpret=True)
    sv = po.make_scatter_chunked(sm_v, batch=d, interpret=True)

    # gather matches cube_gather
    U = np.asarray(gv(x)).reshape(d, nl, -1)
    for g in range(d):
        ref = np.asarray(cu.cube_gather(x[g], sm_v))
        assert np.allclose(U[g], ref)

    # scatter is the adjoint used by cube_scatter
    Y = rng.standard_normal((d, nl) + tuple(cells)).astype(np.float32)
    got = np.asarray(sv(jnp.asarray(Y)))
    for g in range(d):
        ref = np.asarray(cu.cube_scatter(jnp.asarray(Y[g].reshape(nl, -1)), sm_v))
        assert np.allclose(got[g], ref, atol=1e-5)

    # staged tentative matvec
    uab = x
    a, b = 5.0, 0.2
    A0 = np.asarray(a * ops.M_c + b * ops.K_c, np.float32)
    T = po.conv_weight_tensor(ops)
    u27f = U.reshape(d * nl, -1)
    Wc = jnp.asarray(T, jnp.float32).T @ jnp.asarray(u27f)
    W = (jnp.asarray(A0.reshape(-1, 1)) + 0.5 * Wc).reshape(nl, nl, -1)
    Uf = jnp.asarray(U)
    Yt = jnp.einsum("tic,bic->btc", W, Uf)
    got = np.asarray(sv(Yt.reshape((d, nl) + tuple(cells))))
    uq = cu.conv_uq(ops, uab)
    for g in range(d):
        ref = np.asarray(
            cu.tentative_matvec_local(ops, jnp.asarray(A0), uq, x[g])
        )
        assert np.allclose(got[g], ref, atol=2e-4), np.abs(got[g] - ref).max()


def test_tent_matvec_hbm():
    """HBM-streamed fused tentative matvec vs the cube engine (interpret)."""
    mesh, ctx, refs, ops, (sm_v, gf_v, _), _ = setup(3, 3, 2, 1)
    rng = np.random.default_rng(14)
    d = mesh.dim
    nl = ops.M_c.shape[0]
    cells = sm_v[1]
    x = jnp.asarray(_grid(rng.standard_normal(ctx.ndofs_v), gf_v, sm_v), jnp.float32)
    uab = jnp.asarray(
        np.stack([
            _grid(rng.standard_normal(ctx.ndofs_v), gf_v, sm_v) for _ in range(d)
        ]),
        jnp.float32,
    )
    a, b = 5.0, 0.2
    A0 = np.asarray(a * ops.M_c + b * ops.K_c, np.float32)
    T = po.conv_weight_tensor(ops)
    u27 = jnp.stack([cu.cube_gather(uab[g], sm_v) for g in range(d)]).reshape(
        d * nl, -1
    )
    Wc = jnp.asarray(T, jnp.float32).T @ u27
    W = po.pad_weights(jnp.asarray(A0.reshape(-1, 1)) + 0.5 * Wc, sm_v)
    mv = po.make_tent_matvec_hbm(sm_v, interpret=True)
    got = np.asarray(mv(W, x))
    uq = cu.conv_uq(ops, uab)
    ref = np.asarray(cu.tentative_matvec_local(ops, jnp.asarray(A0), uq, x))
    assert np.allclose(got, ref, atol=2e-4), np.abs(got - ref).max()


def test_cg_step_kernel():
    """One-iteration CG kernel solves the V mass system (interpret mode)."""
    mesh, ctx, refs, ops, (sm_v, gf_v, _), _ = setup(3, 3, 2, 1)
    rng = np.random.default_rng(15)
    n = int(np.prod(po._grid_shape(sm_v)))
    M_c = np.asarray(ops.M_c)
    diag = np.asarray(cu.diag_cube(ops.M_c, sm_v))
    invd = jnp.asarray(
        np.where(diag != 0, 1.0 / np.where(diag != 0, diag, 1.0), 1.0), jnp.float32
    )
    x_true = jnp.asarray(rng.standard_normal(n).astype(np.float32))
    # restrict to valid dofs: use b = M x_true (consistent rhs)
    mv = po.make_matvec(sm_v, M_c, interpret=True)
    b = mv(x_true)
    step = po.make_cg_step(sm_v, M_c, interpret=True)
    x, k, rn, conv = po.cg_solve_stepped(
        step, mv, b, jnp.zeros_like(b), invd, rtol=1e-6, maxiter=200
    )
    assert bool(conv), (int(k), float(rn))
    # solution matches on valid dofs (padding slots have zero rows)
    err = np.abs(np.asarray(mv(x) - b)).max()
    assert err < 1e-4, err


def test_fused_bicgstab_iteration_kernel():
    """ONE-op-per-iteration batched BiCGStab (plane-flat layout, windowed
    weights) vs la.bicgstab_batched on the same tentative operator with
    Dirichlet rows and a warm start (interpret mode)."""
    from oasisx_tpu.la import bicgstab_batched, jacobi_preconditioner

    mesh, ctx, refs, ops, (sm_v, gf_v, _), _ = setup(3, 4, 2, 1)
    rng = np.random.default_rng(16)
    d = mesh.dim
    nl = ops.M_c.shape[0]
    npad = int(np.prod(po._grid_shape(sm_v)))

    g = lambda: _grid(rng.standard_normal(ctx.ndofs_v), gf_v, sm_v)
    uab = jnp.asarray(np.stack([g() for _ in range(d)]))
    a, bb = 5.0, 0.2
    A0 = np.asarray(a * ops.M_c + bb * ops.K_c)
    u27 = jnp.stack([cu.cube_gather(uab[i], sm_v) for i in range(d)]).reshape(d * nl, -1)
    T = po.conv_weight_tensor(ops)
    Wc = jnp.asarray(T, A0.dtype).T @ u27
    W = (jnp.asarray(A0.reshape(-1, 1)) + 0.5 * Wc).reshape(nl, nl, -1)
    uq = cu.conv_uq(ops, uab)

    # Dirichlet rows: pin the x0=0 grid face (a real boundary dof set)
    pshape = po._grid_shape(sm_v)
    maskg = np.zeros(pshape, bool)
    maskg[:, 0] = True
    mask1 = jnp.asarray(maskg.reshape(-1))
    masks = jnp.stack([mask1] * d)
    bcvals = jnp.asarray(np.stack([g() for _ in range(d)])) * mask1

    diag = a * cu.diag_cube(ops.M_c, sm_v) + bb * cu.diag_cube(ops.K_c, sm_v)
    diag = diag + 0.5 * cu.conv_diag(ops, uq)
    diag_bc = jnp.where(masks, 1.0, diag[None, :])

    def matvec(x):
        y = jnp.stack(
            [cu.tentative_matvec_local(ops, jnp.asarray(A0), uq, x[i]) for i in range(d)]
        )
        return jnp.where(masks, x, y)

    b_raw = jnp.asarray(np.stack([g() for _ in range(d)]))
    rhs = jnp.where(masks, bcvals, b_raw)
    u0 = jnp.asarray(np.stack([g() for _ in range(d)])) * 0.1
    x0 = jnp.where(masks, bcvals, u0)

    rtol = 1e-9
    ref = bicgstab_batched(
        matvec, rhs, x0=x0, M=jacobi_preconditioner(diag_bc), rtol=rtol, maxiter=60
    )

    # fused path
    W_win = po.build_w_win(W, sm_v)
    pf = lambda v: po.to_planeflat(v, sm_v)
    zmask = pf(jnp.where(masks, 0.0, 1.0))
    invd = pf(jnp.where(diag != 0, 1.0 / jnp.where(diag != 0, diag, 1.0), 1.0))
    r0 = pf(jnp.where(masks, 0.0, rhs - matvec(x0)))
    bnorm = jnp.sqrt(jnp.sum(rhs * rhs, axis=-1)).reshape(d, 1, 1, 1)[:, 0, 0, 0]
    it_fn = po.make_bicgstab_iter(sm_v, d, interpret=True)
    x, iters, rnorm, conv = po.bicgstab_fused_from_r0(
        it_fn, W_win, r0, pf(x0), zmask, invd, bnorm, rtol, maxiter=60
    )
    x = po.from_planeflat(x, sm_v)

    assert bool(np.asarray(conv).all()), (np.asarray(iters), np.asarray(rnorm))
    assert bool(np.asarray(ref.converged).all())
    # same solution to solver tolerance; iteration counts comparable
    scale = np.abs(np.asarray(ref.x)).max()
    err = np.abs(np.asarray(x) - np.asarray(ref.x)).max() / scale
    assert err < 1e-7, err
    assert np.abs(np.asarray(iters) - np.asarray(ref.iters)).max() <= 2, (
        np.asarray(iters), np.asarray(ref.iters))
    # true residual of the fused solution is at tolerance
    res = np.asarray(rhs - matvec(x))
    rn = np.sqrt((res**2).sum(axis=-1))
    bn = np.asarray(bnorm)
    assert (rn <= 3 * rtol * bn).all(), rn / bn


def test_pf_const_kernels_cg_mixed_divergence():
    """Plane-flat baked-constant kernels: batched mass-CG iteration, mixed
    gradient, divergence — vs the cube engine (interpret mode)."""
    from oasisx_tpu.la import cg_batched, jacobi_preconditioner

    mesh, ctx, refs, ops, (sm_v, gf_v, _), (sm_q, gf_q, _) = setup(3, 4, 2, 1)
    rng = np.random.default_rng(21)
    d = mesh.dim
    npad_v = int(np.prod(po._grid_shape(sm_v)))
    npad_q = int(np.prod(po._grid_shape(sm_q)))

    gv = lambda: _grid(rng.standard_normal(ctx.ndofs_v), gf_v, sm_v)
    gq = lambda: _grid(rng.standard_normal(ctx.ndofs_q), gf_q, sm_q)

    # --- mixed: r_g = B_g p --------------------------------------------
    pvec = jnp.asarray(gq())
    mixed = po.make_mixed_pf(sm_v, sm_q, np.asarray(ops.B_c), d, interpret=True)
    got = po.from_planeflat(mixed(po.to_planeflat(pvec, sm_q)), sm_v)
    ref = cu.mixed_all(pvec, ops.B_c, sm_v, sm_q)
    assert np.allclose(np.asarray(got), np.asarray(ref), atol=1e-11)

    # --- divergence: b2 = sum_g B_g^T u_g ------------------------------
    u = jnp.asarray(np.stack([gv() for _ in range(d)]))
    div = po.make_divergence_pf(sm_v, sm_q, np.asarray(ops.B_c), d, interpret=True)
    got = po.from_planeflat(div(po.to_planeflat(u, sm_v)), sm_q)
    ref = cu.divergence_cube(u, ops)
    assert np.allclose(np.asarray(got), np.asarray(ref), atol=1e-11)

    # --- batched mass CG ------------------------------------------------
    diag = np.asarray(cu.diag_cube(ops.M_c, sm_v))
    invd = jnp.asarray(np.where(diag != 0, 1.0 / np.where(diag != 0, diag, 1.0), 1.0))
    mv1 = lambda x: cu.matvec_cube(x, ops.M_c, sm_v)
    mvb = lambda x: jnp.stack([mv1(x[b]) for b in range(d)])
    x_true = jnp.asarray(np.stack([gv() for _ in range(d)]))
    b = mvb(x_true)
    ref = cg_batched(mvb, b, x0=jnp.zeros_like(b),
                     M=jacobi_preconditioner(jnp.asarray(diag)),
                     rtol=1e-10, maxiter=100)
    it_fn = po.make_cg_iter_pf(sm_v, np.asarray(ops.M_c), d, interpret=True)
    pf = lambda v: po.to_planeflat(v, sm_v)
    mv_pf = lambda xp: pf(mvb(po.from_planeflat(xp, sm_v)))
    x, iters, rn, conv = po.cg_pf_solve(
        it_fn, mv_pf, pf(b), pf(jnp.zeros_like(b)), pf(invd), 1e-10, 100
    )
    x = po.from_planeflat(x, sm_v)
    assert bool(np.asarray(conv).all()), np.asarray(rn)
    scale = np.abs(np.asarray(ref.x)).max()
    assert np.abs(np.asarray(x) - np.asarray(ref.x)).max() / scale < 1e-8
    assert np.abs(np.asarray(iters) - np.asarray(ref.iters)).max() <= 1


def test_matvec_win_and_pf():
    """Standalone windowed-W matvec and baked-constant matvec kernels vs
    the cube engine (interpret)."""
    mesh, ctx, refs, ops, (sm_v, gf_v, _), _ = setup(3, 4, 2, 1)
    rng = np.random.default_rng(31)
    d = mesh.dim
    nl = ops.M_c.shape[0]
    x = jnp.asarray(np.stack(
        [_grid(rng.standard_normal(ctx.ndofs_v), gf_v, sm_v) for _ in range(d)]
    ))
    pf = lambda v: po.to_planeflat(v, sm_v)

    # constant kernel == mass matvec
    mvc = po.make_matvec_pf(sm_v, np.asarray(ops.M_c), d, interpret=True)
    got = po.from_planeflat(mvc(pf(x)), sm_v)
    ref = jnp.stack([cu.matvec_cube(x[b], ops.M_c, sm_v) for b in range(d)])
    assert np.allclose(np.asarray(got), np.asarray(ref), atol=1e-11)

    # windowed-W kernel == per-cube-weight matvec
    nc = int(np.prod(sm_v[1]))
    Wc = rng.standard_normal((nl * nl, nc))
    W_win = po.build_w_win(jnp.asarray(Wc), sm_v)
    mvw = po.make_matvec_win(sm_v, d, interpret=True)
    got = np.asarray(po.from_planeflat(mvw(W_win, pf(x)), sm_v))
    # oracle: slot-pair slices
    cells = sm_v[1]
    xg = np.asarray(x).reshape((d,) + po._grid_shape(sm_v))
    refw = np.zeros_like(xg)
    si = po._slot_info(sm_v)
    for pair in range(nl * nl):
        to, ti = divmod(pair, nl)
        cho, bo = si[to]
        chi, bi = si[ti]
        slo = tuple(slice(bo[k], bo[k] + cells[k]) for k in range(3))
        sli = tuple(slice(bi[k], bi[k] + cells[k]) for k in range(3))
        refw[(slice(None), cho) + slo] += Wc[pair].reshape(cells) * xg[(slice(None), chi) + sli]
    assert np.allclose(got.reshape(refw.shape), refw, atol=1e-11)


@pytest.mark.parametrize("resident", [False, True])
def test_hbm_state_bicgstab_kernels(resident):
    """3-op-per-iteration HBM-state batched BiCGStab (channel-major state,
    channel-pair W sweep) vs la.bicgstab_batched on the same tentative
    operator with Dirichlet rows and a warm start (interpret mode) —
    VERDICT r3 #3: the large-N path where the whole solver state cannot
    hold VMEM.  resident=True stages the sweep source in one whole-state
    VMEM scratch (nch-linear HBM traffic) — must be bit-compatible with
    the streaming variant's semantics."""
    from oasisx_tpu.la import bicgstab_batched, jacobi_preconditioner

    mesh, ctx, refs, ops, (sm_v, gf_v, _), _ = setup(3, 4, 2, 1)
    rng = np.random.default_rng(17)
    d = mesh.dim
    nl = ops.M_c.shape[0]

    g = lambda: _grid(rng.standard_normal(ctx.ndofs_v), gf_v, sm_v)
    uab = jnp.asarray(np.stack([g() for _ in range(d)]))
    a, bb = 5.0, 0.2
    A0 = np.asarray(a * ops.M_c + bb * ops.K_c)
    u27 = jnp.stack([cu.cube_gather(uab[i], sm_v) for i in range(d)]).reshape(d * nl, -1)
    T = po.conv_weight_tensor(ops)
    Wc = jnp.asarray(T, A0.dtype).T @ u27
    W = (jnp.asarray(A0.reshape(-1, 1)) + 0.5 * Wc).reshape(nl, nl, -1)
    uq = cu.conv_uq(ops, uab)

    pshape = po._grid_shape(sm_v)
    maskg = np.zeros(pshape, bool)
    maskg[:, 0] = True
    mask1 = jnp.asarray(maskg.reshape(-1))
    masks = jnp.stack([mask1] * d)
    bcvals = jnp.asarray(np.stack([g() for _ in range(d)])) * mask1

    diag = a * cu.diag_cube(ops.M_c, sm_v) + bb * cu.diag_cube(ops.K_c, sm_v)
    diag = diag + 0.5 * cu.conv_diag(ops, uq)
    diag_bc = jnp.where(masks, 1.0, diag[None, :])

    def matvec(x):
        y = jnp.stack(
            [cu.tentative_matvec_local(ops, jnp.asarray(A0), uq, x[i]) for i in range(d)]
        )
        return jnp.where(masks, x, y)

    b_raw = jnp.asarray(np.stack([g() for _ in range(d)]))
    rhs = jnp.where(masks, bcvals, b_raw)
    u0 = jnp.asarray(np.stack([g() for _ in range(d)])) * 0.1
    x0 = jnp.where(masks, bcvals, u0)

    rtol = 1e-9
    ref = bicgstab_batched(
        matvec, rhs, x0=x0, M=jacobi_preconditioner(diag_bc), rtol=rtol, maxiter=60
    )

    # HBM-state path: channel-major padded layout end to end
    W_win = po.build_w_win(W, sm_v)
    h = lambda v: po.to_hbm_state(v, sm_v)
    zmask = h(jnp.where(masks, 0.0, 1.0))
    invd = h(jnp.where(diag != 0, 1.0 / jnp.where(diag != 0, diag, 1.0), 1.0)[None]
             * jnp.ones((d, 1)))
    ones = h(jnp.ones((d, mask1.shape[0])))

    # init matvec through the HBM matvec kernel (r0 = zm*(rhs - A x0))
    mv_h = po.make_matvec_hbm_chan(sm_v, d, interpret=True, resident=resident)
    Ax0_h = mv_h(W_win, h(x0), ones, ones)
    Ax0 = po.from_hbm_state(Ax0_h, sm_v)
    ref_Ax0 = jnp.stack(
        [cu.tentative_matvec_local(ops, jnp.asarray(A0), uq, x0[i]) for i in range(d)]
    )
    assert np.allclose(np.asarray(Ax0), np.asarray(ref_Ax0), atol=1e-4), (
        np.abs(np.asarray(Ax0) - np.asarray(ref_Ax0)).max()
    )
    r0 = h(jnp.where(masks, 0.0, rhs - ref_Ax0))
    bnorm = jnp.sqrt(jnp.sum(rhs * rhs, axis=-1))

    kernels = po.make_bicgstab_hbm_kernels(
        sm_v, d, interpret=True, dtype=r0.dtype, resident=resident
    )
    x_h, iters, rnorm, conv = po.bicgstab_hbm_from_r0(
        kernels, W_win, r0, h(x0), zmask, invd, bnorm, rtol, maxiter=60
    )
    x = po.from_hbm_state(x_h, sm_v)

    assert bool(np.asarray(conv).all()), (np.asarray(iters), np.asarray(rnorm))
    scale = np.abs(np.asarray(ref.x)).max()
    err = np.abs(np.asarray(x) - np.asarray(ref.x)).max() / scale
    assert err < 1e-7, err
    assert np.abs(np.asarray(iters) - np.asarray(ref.iters)).max() <= 2, (
        np.asarray(iters), np.asarray(ref.iters))
    res = np.asarray(rhs - matvec(x))
    rn = np.sqrt((res**2).sum(axis=-1))
    bn = np.asarray(bnorm)
    assert (rn <= 3 * rtol * bn).all(), rn / bn


@pytest.mark.parametrize("dim,N", [(2, 5), (3, 3)])
def test_build_w_win_from_u_matches_relayout(dim, N):
    """The direct windowed-layout construction (pad the small per-slot
    source, one contraction, masked A0 epilogue) equals the reference
    einsum -> combine -> build_w_win chain elementwise."""
    mesh, ctx, refs, ops, (sm_v, gf_v, _), _ = setup(dim, N, 2, 1)
    rng = np.random.default_rng(21)
    d = mesh.dim
    nl = ops.M_c.shape[0]

    g = lambda: _grid(rng.standard_normal(ctx.ndofs_v), gf_v, sm_v)
    uab = jnp.asarray(np.stack([g() for _ in range(d)]))
    a, bb = 5.0, 0.2
    A0 = jnp.asarray(a * ops.M_c + bb * ops.K_c)
    u27 = jnp.stack(
        [cu.cube_gather(uab[i], sm_v) for i in range(d)]
    ).reshape(d * nl, -1)
    T = jnp.asarray(po.conv_weight_tensor(ops), A0.dtype)

    Wc = jnp.einsum("tw,tc->wc", T, u27, precision=jax.lax.Precision.HIGHEST)
    W = (A0.reshape(-1, 1) + 0.5 * Wc).reshape(nl, nl, -1)
    ref = np.asarray(po.build_w_win(W, sm_v))

    out = np.asarray(po.build_w_win_from_u(T, A0, u27, sm_v))
    assert out.shape == ref.shape
    scale = np.abs(ref).max()
    assert np.abs(out - ref).max() <= 1e-12 * scale, np.abs(out - ref).max()
