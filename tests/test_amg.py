"""Smoothed-aggregation AMG (la/amg.py): matrix-level convergence +
symmetry, the singular pure-Neumann case, and the fracstep integration on
the unstructured cylinder (the config the reference serves with MUMPS /
pc_type gamg, /root/reference/src/oasisx/fracstep.py:553-605)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from oasisx_tpu.la import cg, jacobi_preconditioner
from oasisx_tpu.la.amg import AlgebraicMG, _sum_duplicates


def _fd_laplacian(m, dirichlet_edge=True):
    """2D 5-point Laplacian COO; optionally identity rows on the i=0 edge
    (otherwise pure Neumann-like: singular with constant nullspace)."""
    n = m * m
    rows, cols, vals = [], [], []
    idx = lambda i, j: i * m + j

    def add(I, J, v):
        rows.append(I)
        cols.append(J)
        vals.append(v)

    for i in range(m):
        for j in range(m):
            I = idx(i, j)
            if dirichlet_edge and i == 0:
                add(I, I, 1.0)
                continue
            deg = 0
            for di, dj in ((1, 0), (-1, 0), (0, 1), (0, -1)):
                ii, jj = i + di, j + dj
                if 0 <= ii < m and 0 <= jj < m:
                    deg += 1
                    if dirichlet_edge and ii == 0:
                        continue  # masked column
                    add(I, idx(ii, jj), -1.0)
            add(I, I, float(deg))
    return _sum_duplicates(
        np.asarray(rows, np.int64), np.asarray(cols, np.int64),
        np.asarray(vals, float), n,
    ) + (n,)


def test_amg_pcg_converges_fast_and_symmetric():
    """AMG-PCG on a 64x64 Dirichlet Laplacian: large speedup over
    Jacobi-PCG, preconditioner symmetric (PCG validity), exact solution."""
    rows, cols, vals, n = _fd_laplacian(64)
    amg = AlgebraicMG(rows, cols, vals, n, dtype=jnp.float64)
    assert amg.num_levels >= 2

    Ad = np.zeros((n, n))
    Ad[rows, cols] = vals
    rng = np.random.default_rng(0)
    b = rng.standard_normal(n)
    b[:64] = 0.0
    xref = np.linalg.solve(Ad, b)

    r1, r2 = rng.standard_normal(n), rng.standard_normal(n)
    z1 = np.asarray(amg.vcycle(jnp.asarray(r1)))
    z2 = np.asarray(amg.vcycle(jnp.asarray(r2)))
    assert abs(z1 @ r2 - r1 @ z2) / abs(z1 @ r2) < 1e-12

    mv = lambda x: jnp.asarray(Ad) @ x
    res = cg(mv, jnp.asarray(b), M=amg.vcycle, rtol=1e-10, maxiter=100)
    assert bool(res.converged)
    assert int(res.iters) <= 20, int(res.iters)
    assert np.abs(np.asarray(res.x) - xref).max() < 1e-7
    res_j = cg(
        mv, jnp.asarray(b),
        M=jacobi_preconditioner(jnp.diag(jnp.asarray(Ad))),
        rtol=1e-10, maxiter=2000,
    )
    assert int(res.iters) * 5 <= int(res_j.iters), (int(res.iters), int(res_j.iters))


def test_amg_singular_neumann():
    """Pure-Neumann operator (constant nullspace, the IPCS pressure case):
    the coarse pinv keeps the V-cycle well-defined and nullspace-projected
    PCG converges to the zero-mean solution."""
    rows, cols, vals, n = _fd_laplacian(32, dirichlet_edge=False)
    amg = AlgebraicMG(
        rows, cols, vals, n, dtype=jnp.float64, coarse_max=100,
        nullvec=np.ones(n),
    )
    Ad = np.zeros((n, n))
    Ad[rows, cols] = vals
    rng = np.random.default_rng(1)
    b = rng.standard_normal(n)
    b -= b.mean()  # compatible rhs
    nv = jnp.ones(n)
    mv = lambda x: jnp.asarray(Ad) @ x
    res = cg(
        mv, jnp.asarray(b), M=amg.vcycle, rtol=1e-10, maxiter=100,
        project_nullspace=True, nullvec=nv,
    )
    assert bool(res.converged)
    assert int(res.iters) <= 25, int(res.iters)
    x = np.asarray(res.x)
    x = x - x.mean()
    r = b - Ad @ x
    assert np.linalg.norm(r) <= 1e-8 * np.linalg.norm(b)


def test_amg_adaptive_theta_rescues_stalled_coarsening():
    """A strength threshold too large for the operator (here: theta so big
    no connection qualifies) must not degrade the hierarchy to singletons —
    the setup retries the level with smaller theta (theta/4, then 0).
    Regression: the DFG cylinder at res=40 stalled at theta=0.25 on a
    Galerkin coarse level and silently fell back to Chebyshev (~95
    p_iters/step instead of ~12)."""
    rows, cols, vals, n = _fd_laplacian(48)
    amg = AlgebraicMG(rows, cols, vals, n, dtype=jnp.float64, theta=10.0)
    assert amg.num_levels >= 2  # did coarsen despite the hopeless theta
    assert amg.coarse_n <= 400

    Ad = np.zeros((n, n))
    Ad[rows, cols] = vals
    rng = np.random.default_rng(2)
    b = rng.standard_normal(n)
    b[:48] = 0.0
    mv = lambda x: jnp.asarray(Ad) @ x
    res = cg(mv, jnp.asarray(b), M=amg.vcycle, rtol=1e-10, maxiter=100)
    assert bool(res.converged)
    assert int(res.iters) <= 25, int(res.iters)


def _cylinder_solver(pc_type, device_mesh=None, popts_extra=None):
    from oasisx_tpu import (
        DirichletBC,
        FractionalStep_AB_CN,
        LocatorMethod,
        PressureBC,
    )
    from oasisx_tpu.meshes import locate_entities_boundary, meshtags
    from oasisx_tpu.meshes.generation import create_cylinder_channel

    mesh = create_cylinder_channel(16)
    L, H = 2.2, 0.41
    inlet = locate_entities_boundary(mesh, 1, lambda x: np.isclose(x[0], 0.0))
    outlet = locate_entities_boundary(mesh, 1, lambda x: np.isclose(x[0], L))
    ext = mesh.exterior_facet_indices()
    others = np.setdiff1d(ext, np.hstack([inlet, outlet]))
    facets = np.hstack([inlet, others, outlet])
    values = np.hstack(
        [np.full_like(inlet, 1), np.full_like(others, 2), np.full_like(outlet, 3)]
    ).astype(np.int32)
    tags = meshtags(mesh, 1, facets, values)
    inflow = lambda x: 4.0 * 0.3 * x[1] * (H - x[1]) / H**2
    bcs_u = [
        [DirichletBC(inflow, LocatorMethod.TOPOLOGICAL, (tags, 1)),
         DirichletBC(0.0, LocatorMethod.TOPOLOGICAL, (tags, 2))],
        [DirichletBC(0.0, LocatorMethod.TOPOLOGICAL, (tags, 1)),
         DirichletBC(0.0, LocatorMethod.TOPOLOGICAL, (tags, 2))],
    ]
    opts = {"ksp_rtol": 1e-10, "ksp_max_it": 4000}
    popts = dict(opts)
    popts["pc_type"] = pc_type
    popts.update(popts_extra or {})
    return FractionalStep_AB_CN(
        mesh,
        ("Lagrange", 2),
        ("Lagrange", 1),
        bcs_u=bcs_u,
        bcs_p=[PressureBC(0.0, (tags, 3))],
        solver_options={
            "tentative": dict(opts), "pressure": popts, "scalar": dict(opts)
        },
        device_mesh=device_mesh,
    )


def test_cylinder_pressure_amg_cuts_iterations():
    """Unstructured cylinder + outlet PressureBC: AMG is the default
    pressure preconditioner, matches the Chebyshev run's solution, and
    cuts the pressure iteration count by >= 2x."""
    dt, nu = 2e-3, 1e-3
    s_amg = _cylinder_solver("amg")
    assert s_amg.config_report()["pressure_pc"] == "amg-pcg"
    s_cheb = _cylinder_solver("cheb")
    assert s_cheb.config_report()["pressure_pc"] == "chebyshev-jacobi-pcg"

    it_amg, it_cheb = [], []
    for _ in range(3):
        s_amg.solve(dt, nu, max_iter=2)
        s_cheb.solve(dt, nu, max_iter=2)
        assert s_amg.last_stats["p_converged"]
        it_amg.append(float(np.max(s_amg.last_stats["p_iters"])))
        it_cheb.append(float(np.max(s_cheb.last_stats["p_iters"])))

    for i in range(2):
        a, b = s_amg._u[i].x.array, s_cheb._u[i].x.array
        assert np.abs(a - b).max() < 1e-7, (i, np.abs(a - b).max())
    assert np.abs(s_amg._p.x.array - s_cheb._p.x.array).max() < 1e-6
    assert np.mean(it_amg) * 2 <= np.mean(it_cheb), (it_amg, it_cheb)


def test_cylinder_amg_sharded_matches_single_device():
    """Graph-halo sharded AMG: the DISTRIBUTED fine-level apply (per-shard
    smoothing + partial restriction + one coarse psum, STATUS r4 gap #3)
    engages by default, solutions == single-device AMG to 1e-9, iteration
    counts close (shard-pure aggregation differs only near boundaries);
    the agglomerated apply (amg_distributed=False) gives the SAME
    preconditioner as the distributed one — identical iteration counts."""
    from jax.sharding import Mesh

    devs = jax.devices()
    if len(devs) < 8:
        pytest.skip("need 8 devices")
    dmesh = Mesh(np.array(devs[:8]), ("s",))

    dt, nu = 2e-3, 1e-3
    ref = _cylinder_solver("amg")
    sol = _cylinder_solver("amg", device_mesh=dmesh)
    agg = _cylinder_solver(
        "amg", device_mesh=dmesh, popts_extra={"amg_distributed": False}
    )
    assert sol._hx_q is not None, "halo sharding did not engage"
    assert sol.config_report()["pressure_pc"] == "amg-pcg-distributed"
    assert sol._amg_dist is not None
    assert agg._amg_dist is None and agg._amg_halo_M is not None

    for _ in range(3):
        ref.solve(dt, nu, max_iter=2)
        sol.solve(dt, nu, max_iter=2)
        agg.solve(dt, nu, max_iter=2)
        assert sol.last_stats["p_converged"]
        # same operator, same (shard-constrained) aggregation: the two
        # sharded applies are the same preconditioner up to fp reordering
        assert (
            np.asarray(sol.last_stats["p_iters"]).tolist()
            == np.asarray(agg.last_stats["p_iters"]).tolist()
        )
    assert abs(
        float(np.max(sol.last_stats["p_iters"]))
        - float(np.max(ref.last_stats["p_iters"]))
    ) <= 3
    for i in range(2):
        a, b = ref._u[i].x.array, sol._u[i].x.array
        assert np.abs(a - b).max() < 1e-9, (i, np.abs(a - b).max())
    assert np.abs(ref._p.x.array - sol._p.x.array).max() < 1e-8
    for i in range(2):
        a, b = agg._u[i].x.array, sol._u[i].x.array
        assert np.abs(a - b).max() < 1e-10, (i, np.abs(a - b).max())
