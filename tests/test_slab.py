"""Owned-dof slab sharding: sharded operators == single-device cube ops.

Run on a virtual 8-device CPU mesh (conftest forces the CPU platform; we
request host platform devices via jax.sharding over all available CPU
devices — conftest sets xla_force_host_platform_device_count=8).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from oasisx_tpu.assembly import cubes as cu
from oasisx_tpu.parallel import slab as sl
from tests.test_cubes import _grid, setup


def _mesh():
    devs = np.array(jax.devices())
    if len(devs) < 2:
        pytest.skip("needs >1 virtual device")
    return Mesh(devs, ("x",))


@pytest.mark.parametrize("dim,N,du,dp", [(3, 8, 2, 1), (2, 8, 2, 1), (3, 8, 1, 1)])
def test_slab_matvec_matches_single(dim, N, du, dp):
    mesh_d = _mesh()
    ndev = mesh_d.devices.size
    meshh, ctx, refs, ops, (sm_v, gf_v, _), (sm_q, gf_q, _) = setup(dim, N, du, dp)
    info = sl.build_slab(sm_v, gf_v, sm_q, gf_q, ndev)
    rng = np.random.default_rng(21)
    d = meshh.dim

    x = rng.standard_normal(ctx.ndofs_v)
    xq = rng.standard_normal(ctx.ndofs_q)

    # canonical -> slab layout (halo slots zero)
    xs = np.zeros(ndev * info.npad_v_loc)
    xs[info.perm_v] = x
    xqs = np.zeros(ndev * info.npad_q_loc)
    xqs[info.perm_q] = xq

    # single-device references (grid layout)
    ref_M = np.asarray(cu.matvec_cube(jnp.asarray(_grid(x, gf_v, sm_v)), ops.M_c, sm_v))

    def sharded(fn, vec, spec=P("x")):
        f = jax.jit(
            jax.shard_map(
                fn, mesh=mesh_d, in_specs=(spec,), out_specs=spec,
            )
        )
        return np.asarray(f(jnp.asarray(vec)))

    got = sharded(
        lambda v: sl.matvec_cube_slab(v, ops.M_c, info.sm_v_loc, "x"), xs
    )
    assert np.allclose(got[info.perm_v], ref_M[gf_v], atol=1e-11), np.abs(
        got[info.perm_v] - ref_M[gf_v]
    ).max()
    # halo slots stay zero
    assert np.allclose(got[~info.valid_v], 0.0)

    ref_Ap = np.asarray(
        cu.matvec_cube(jnp.asarray(_grid(xq, gf_q, sm_q)), ops.Ap_c, sm_q)
    )
    got = sharded(lambda v: sl.matvec_cube_slab(v, ops.Ap_c, info.sm_q_loc, "x"), xqs)
    assert np.allclose(got[info.perm_q], ref_Ap[gf_q], atol=1e-11)

    # mixed + divergence
    ref_B = np.asarray(cu.mixed_all(jnp.asarray(_grid(xq, gf_q, sm_q)), ops.B_c, sm_v, sm_q))
    got = sharded(
        lambda v: sl.mixed_all_slab(v, ops.B_c, info.sm_v_loc, info.sm_q_loc, "x"),
        xqs,
    )
    # output (d, nloc*ndev) sharded on axis 1
    f = jax.jit(
        jax.shard_map(
            lambda v: sl.mixed_all_slab(v, ops.B_c, info.sm_v_loc, info.sm_q_loc, "x"),
            mesh=mesh_d, in_specs=(P("x"),), out_specs=P(None, "x"),
        )
    )
    got = np.asarray(f(jnp.asarray(xqs)))
    for g in range(d):
        assert np.allclose(got[g][info.perm_v], ref_B[g][gf_v], atol=1e-11)

    u = rng.standard_normal((d, ctx.ndofs_v))
    us = np.zeros((d, ndev * info.npad_v_loc))
    us[:, info.perm_v] = u
    ug = jnp.asarray(np.stack([_grid(u[g], gf_v, sm_v) for g in range(d)]))
    ref_div = np.asarray(cu.divergence_cube(ug, ops))
    f = jax.jit(
        jax.shard_map(
            lambda v: sl.divergence_slab(v, ops, info.sm_v_loc, info.sm_q_loc, "x"),
            mesh=mesh_d, in_specs=(P(None, "x"),), out_specs=P("x"),
        )
    )
    got = np.asarray(f(jnp.asarray(us)))
    assert np.allclose(got[info.perm_q], ref_div[gf_q], atol=1e-11)


def test_slab_convection_and_cg(dim=3, N=8, du=2, dp=1):
    mesh_d = _mesh()
    ndev = mesh_d.devices.size
    meshh, ctx, refs, ops, (sm_v, gf_v, _), (sm_q, gf_q, _) = setup(dim, N, du, dp)
    info = sl.build_slab(sm_v, gf_v, sm_q, gf_q, ndev)
    rng = np.random.default_rng(22)
    d = meshh.dim
    x = rng.standard_normal(ctx.ndofs_v)
    uab = rng.standard_normal((d, ctx.ndofs_v))
    xs = np.zeros(ndev * info.npad_v_loc)
    xs[info.perm_v] = x
    uabs = np.zeros((d, ndev * info.npad_v_loc))
    uabs[:, info.perm_v] = uab

    A0 = 4.0 * np.asarray(ops.M_c) + 0.1 * np.asarray(ops.K_c)
    ug = jnp.asarray(np.stack([_grid(uab[g], gf_v, sm_v) for g in range(d)]))
    uq_ref = cu.conv_uq(ops, ug)
    ref = np.asarray(
        cu.tentative_matvec_local(ops, jnp.asarray(A0), uq_ref, jnp.asarray(_grid(x, gf_v, sm_v)))
    )

    def fn(uabv, xv):
        uq = sl.conv_uq_slab(ops, uabv, info.sm_v_loc, "x")
        return sl.tentative_matvec_slab(ops, jnp.asarray(A0), uq, xv, info.sm_v_loc, "x")

    f = jax.jit(
        jax.shard_map(fn, mesh=mesh_d, in_specs=(P(None, "x"), P("x")), out_specs=P("x"))
    )
    got = np.asarray(f(jnp.asarray(uabs), jnp.asarray(xs)))
    assert np.allclose(got[info.perm_v], ref[gf_v], atol=1e-10), np.abs(
        got[info.perm_v] - ref[gf_v]
    ).max()

    # sharded CG on the pressure Laplacian (psum dots, halo matvec)
    from oasisx_tpu.la import cg, jacobi_preconditioner

    b = rng.standard_normal(ctx.ndofs_q)
    b -= b.mean()
    bs = np.zeros(ndev * info.npad_q_loc)
    bs[info.perm_q] = b

    diag_ref = np.asarray(cu.diag_cube(ops.Ap_c, sm_q))

    # nullvec: owned-valid mask (padding + halo excluded from the projection)
    validq = jnp.asarray(info.valid_q.astype(np.float64))

    def solve2(bv, nvv):
        res = cg(
            lambda v: sl.matvec_cube_slab(v, ops.Ap_c, info.sm_q_loc, "x"),
            bv,
            M=lambda r: jnp.where(
                (dg := sl.diag_cube_slab(ops.Ap_c, info.sm_q_loc, "x")) != 0,
                r / jnp.where(dg != 0, dg, 1.0),
                0.0,
            ),
            rtol=1e-10,
            maxiter=500,
            project_nullspace=True,
            nullvec=nvv,
            axis="x",
        )
        return res.x, res.iters, res.converged

    f = jax.jit(
        jax.shard_map(
            solve2, mesh=mesh_d, in_specs=(P("x"), P("x")),
            out_specs=(P("x"), P(), P()),
        )
    )
    xsol, iters, conv = f(jnp.asarray(bs), validq)
    assert bool(conv)
    # compare with single-device solve
    from oasisx_tpu.la import cg as cg1

    diag1 = jnp.asarray(diag_ref)
    res1 = cg1(
        lambda v: cu.matvec_cube(v, ops.Ap_c, sm_q),
        jnp.asarray(_grid(b, gf_q, sm_q)),
        M=lambda r: jnp.where(diag1 != 0, r / jnp.where(diag1 != 0, diag1, 1.0), 0.0),
        rtol=1e-10,
        maxiter=500,
        project_nullspace=True,
        nullvec=jnp.asarray((_grid(np.ones(ctx.ndofs_q), gf_q, sm_q) > 0).astype(np.float64)),
    )
    xg = np.asarray(xsol)[info.perm_q]
    xr = np.asarray(res1.x)[gf_q]
    assert np.abs(xg - xr).max() < 1e-8, np.abs(xg - xr).max()


def test_slab_full_step_matches_single_device():
    """FractionalStep with a device mesh (slab mode) == single-device
    solve to 1e-9 (VERDICT r1 item 2 'Done' criterion)."""
    from oasisx_tpu import DirichletBC, FractionalStep_AB_CN, LocatorMethod
    from oasisx_tpu.meshes import create_box, meshtags

    mesh_d = _mesh()

    def build(device_mesh=None):
        m = create_box((-1.0, -1.0, -1.0), (1.0, 1.0, 1.0), (8, 8, 8))
        facets = m.exterior_facet_indices()
        tags = meshtags(m, m.dim - 1, facets, np.full_like(facets, 1))

        def gx(x):
            return 0.3 * np.sin(np.pi * x[0]) * np.cos(np.pi * x[1]) * np.cos(np.pi * x[2])

        def gy(x):
            return -0.3 * np.cos(np.pi * x[0]) * np.sin(np.pi * x[1]) * np.cos(np.pi * x[2])

        def gz(x):
            return np.zeros_like(x[0])

        bcs = [
            [DirichletBC(f, LocatorMethod.TOPOLOGICAL, (tags, 1))] for f in (gx, gy, gz)
        ]
        sol = FractionalStep_AB_CN(
            m, ("Lagrange", 2), ("Lagrange", 1), bcs, [],
            solver_options={k: {"ksp_rtol": 1e-12} for k in ("tentative", "pressure", "scalar")},
            device_mesh=device_mesh,
        )
        for f, u1, u2 in zip((gx, gy, gz), sol._u1, sol._u2):
            u1.interpolate(f)
            u2.interpolate(f)
        return sol

    s_ref = build()
    s_slab = build(device_mesh=mesh_d)
    assert s_slab._slab is not None, "slab mode did not engage"

    for _ in range(2):
        s_ref.solve(0.01, 0.05, max_iter=2)
        s_slab.solve(0.01, 0.05, max_iter=2)

    for i in range(3):
        a, b = s_slab._u[i].x.array, s_ref._u[i].x.array
        assert np.abs(a - b).max() < 1e-9 * max(1.0, np.abs(b).max()), np.abs(a - b).max()
    assert np.abs(s_slab._p.x.array - s_ref._p.x.array).max() < 1e-8


def test_slab_run_loop():
    """run() (lax.scan) works under slab sharding."""
    from oasisx_tpu import DirichletBC, FractionalStep_AB_CN, LocatorMethod
    from oasisx_tpu.meshes import create_box, meshtags

    mesh_d = _mesh()
    m = create_box((-1.0, -1.0, -1.0), (1.0, 1.0, 1.0), (8, 8, 8))
    facets = m.exterior_facet_indices()
    tags = meshtags(m, m.dim - 1, facets, np.full_like(facets, 1))
    bcs = [[DirichletBC(0.0, LocatorMethod.TOPOLOGICAL, (tags, 1))] for _ in range(3)]
    sol = FractionalStep_AB_CN(
        m, ("Lagrange", 2), ("Lagrange", 1), bcs, [],
        solver_options={k: {"ksp_rtol": 1e-10} for k in ("tentative", "pressure", "scalar")},
        device_mesh=mesh_d,
    )
    for i in range(3):
        sol._u1[i].interpolate(lambda x: 0.1 * np.sin(np.pi * x[0]) * np.cos(np.pi * x[1]))
        sol._u2[i].interpolate(lambda x: 0.1 * np.sin(np.pi * x[0]) * np.cos(np.pi * x[1]))
    stats = sol.run(3, 0.01, 0.05, max_iter=1)
    assert np.isfinite(sol._u[0].x.array).all()
    assert np.asarray(stats["p_converged"]).all()


def _tg_solver(N, device_mesh=None, options=None):
    """Tiny 2D Taylor-Green config used by the slab-kernel tests."""
    from oasisx_tpu import DirichletBC, FractionalStep_AB_CN, LocatorMethod
    from oasisx_tpu.meshes import create_rectangle, meshtags

    m = create_rectangle((0.0, 0.0), (np.pi, np.pi), (N, N))
    facets = m.exterior_facet_indices()
    tags = meshtags(m, m.dim - 1, facets, np.full_like(facets, 1))

    def gx(x):
        return 0.2 * np.sin(x[0]) * np.cos(x[1])

    def gy(x):
        return -0.2 * np.cos(x[0]) * np.sin(x[1])

    bcs = [[DirichletBC(f, LocatorMethod.TOPOLOGICAL, (tags, 1))] for f in (gx, gy)]
    sol = FractionalStep_AB_CN(
        m, ("Lagrange", 2), ("Lagrange", 1), bcs, [],
        solver_options={
            k: {"ksp_rtol": 1e-12} for k in ("tentative", "pressure", "scalar")
        },
        device_mesh=device_mesh,
        options=options,
    )
    for f, u1, u2 in zip((gx, gy), sol._u1, sol._u2):
        u1.interpolate(f)
        u2.interpolate(f)
    return sol


def test_slab_kernels_match_plain_slab_and_single_device():
    """Per-shard Pallas kernels composed with the slab halo exchange
    (VERDICT r2 item 2): kernel-slab == plain-slab == single-device on a
    tiny 2D config (interpret mode on the CPU mesh)."""
    import jax
    from jax.sharding import Mesh

    devs = jax.devices()
    if len(devs) < 2:
        pytest.skip("need 2 devices")
    dmesh = Mesh(np.array(devs[:2]), ("cells",))

    def build(device_mesh=None, pallas=None):
        opts = {}
        if pallas is not None:
            opts["pallas"] = pallas
        return _tg_solver(8, device_mesh=device_mesh, options=opts)

    s_one = build()
    s_plain = build(dmesh)
    s_kern = build(dmesh, pallas="interpret")
    assert s_plain._slab is not None and s_kern._slab is not None
    assert s_kern._slab_kernels is not None
    assert s_plain._slab_kernels is None

    dt, nu = 0.02, 0.05
    for _ in range(2):
        s_one.solve(dt, nu, max_iter=2)
        s_plain.solve(dt, nu, max_iter=2)
        s_kern.solve(dt, nu, max_iter=2)
    for i in range(2):
        a = s_one._u[i].x.array
        b = s_plain._u[i].x.array
        c = s_kern._u[i].x.array
        assert np.abs(a - b).max() < 1e-9, np.abs(a - b).max()
        assert np.abs(a - c).max() < 1e-9, np.abs(a - c).max()
    assert np.abs(s_one._p.x.array - s_kern._p.x.array).max() < 1e-8


def test_slab_mg_pressure_matches_and_cuts_iterations():
    """Geometric-MG pressure preconditioning under slab sharding via the
    agglomerated V-cycle (STATUS r4 gap #2): engages by default, matches
    the single-device MG run to 1e-9 with the SAME iteration counts, and
    beats the Chebyshev fallback; explicit pc_type 'cheb' still selects
    Chebyshev."""
    import jax
    from jax.sharding import Mesh
    from oasisx_tpu import DirichletBC, FractionalStep_AB_CN, LocatorMethod
    from oasisx_tpu.meshes import create_rectangle, meshtags

    devs = jax.devices()
    if len(devs) < 2:
        pytest.skip("need 2 devices")
    dmesh = Mesh(np.array(devs[:2]), ("cells",))

    def build(device_mesh=None, pc="mg"):
        m = create_rectangle((0.0, 0.0), (np.pi, np.pi), (16, 16))
        facets = m.exterior_facet_indices()
        tags = meshtags(m, m.dim - 1, facets, np.full_like(facets, 1))
        gx = lambda x: 0.2 * np.sin(x[0]) * np.cos(x[1])
        gy = lambda x: -0.2 * np.cos(x[0]) * np.sin(x[1])
        bcs = [
            [DirichletBC(f, LocatorMethod.TOPOLOGICAL, (tags, 1))] for f in (gx, gy)
        ]
        sol = FractionalStep_AB_CN(
            m, ("Lagrange", 2), ("Lagrange", 1), bcs, [],
            solver_options={
                "tentative": {"ksp_rtol": 1e-12},
                "scalar": {"ksp_rtol": 1e-12},
                "pressure": {"ksp_rtol": 1e-12, "pc_type": pc},
            },
            device_mesh=device_mesh,
        )
        for f, u1, u2 in zip((gx, gy), sol._u1, sol._u2):
            u1.interpolate(f)
            u2.interpolate(f)
        return sol

    s_ref = build()
    s_mg = build(device_mesh=dmesh)
    s_ch = build(device_mesh=dmesh, pc="cheb")
    assert s_ref._mg is not None
    assert s_mg._mg_slab_M is not None and s_mg._slab is not None
    assert s_ch._mg is None and s_ch._cheb is not None

    for s in (s_ref, s_mg, s_ch):
        s.solve(0.01, 0.05, max_iter=2)
    it_mg = int(np.asarray(s_mg.last_stats["p_iters"]))
    it_ch = int(np.asarray(s_ch.last_stats["p_iters"]))
    it_ref = int(np.asarray(s_ref.last_stats["p_iters"]))
    assert it_mg == it_ref, (it_mg, it_ref)
    assert it_mg < it_ch, (it_mg, it_ch)
    for i in range(2):
        a, b = s_mg._u[i].x.array, s_ref._u[i].x.array
        assert np.abs(a - b).max() < 1e-9, np.abs(a - b).max()
    assert np.abs(s_mg._p.x.array - s_ref._p.x.array).max() < 1e-8
