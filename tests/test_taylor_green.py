"""Taylor-Green integration tests: the reference's CI-enforced quality bar
(demo/taylor_green.py + .github/workflows/tests.yml:59): ~2nd-order
space-time L2 convergence for P2/P1 IPCS, pure-Dirichlet (pressure
nullspace path). Also: fused jitted solve() == split-phase methods."""

import numpy as np
import pytest

from oasisx_tpu import DirichletBC, FractionalStep_AB_CN, LocatorMethod
from oasisx_tpu.forms import expr as E
from oasisx_tpu.meshes import create_rectangle, meshtags
from oasisx_tpu.spaces import Constant

SOLVER_OPTS = {
    "tentative": {"ksp_type": "preonly", "pc_type": "lu"},
    "pressure": {"ksp_type": "preonly", "pc_type": "lu"},
    "scalar": {"ksp_type": "preonly", "pc_type": "lu"},
}


class TG:
    """Manufactured Taylor-Green solution on [-1,1]^2."""

    def __init__(self, t, nu):
        self.t = t  # Constant
        self.nu = nu

    def _decay(self):
        return np.exp(-2.0 * self.nu * np.pi**2 * float(self.t.value))

    def eval_x(self, x):
        return -np.cos(np.pi * x[0]) * np.sin(np.pi * x[1]) * self._decay()

    def eval_y(self, x):
        return np.cos(np.pi * x[1]) * np.sin(np.pi * x[0]) * self._decay()

    def eval_p(self, tval, x):
        return (
            -0.25
            * (np.cos(2 * np.pi * x[0]) + np.cos(2 * np.pi * x[1]))
            * np.exp(-4.0 * np.pi**2 * self.nu * tval)
        )


def _solver_for(N, nu, dt, rotational=False, low_memory=True):
    mesh = create_rectangle((-1, -1), (1, 1), (N, N))
    dim = mesh.dim - 1
    facets = mesh.exterior_facet_indices()
    tags = meshtags(mesh, dim, facets, np.full_like(facets, 3))
    t_u = Constant(0.0)
    u_ex = TG(t_u, nu)
    bcx = DirichletBC(u_ex.eval_x, LocatorMethod.TOPOLOGICAL, (tags, 3))
    bcy = DirichletBC(u_ex.eval_y, LocatorMethod.TOPOLOGICAL, (tags, 3))
    solver = FractionalStep_AB_CN(
        mesh,
        ("Lagrange", 2),
        ("Lagrange", 1),
        bcs_u=[[bcx], [bcy]],
        bcs_p=[],
        rotational=rotational,
        solver_options=SOLVER_OPTS,
        options={"low_memory_version": low_memory},
    )
    return mesh, solver, u_ex, t_u


def _init(solver, u_ex, t_u, T0, dt):
    t_u.value = np.asarray(T0 - dt)
    solver._u2[0].interpolate(u_ex.eval_x)
    solver._u2[1].interpolate(u_ex.eval_y)
    t_u.value = np.asarray(T0)
    solver._u1[0].interpolate(u_ex.eval_x)
    solver._u1[1].interpolate(u_ex.eval_y)
    solver._p.interpolate(lambda x: u_ex.eval_p(T0 - dt / 2.0, x))


def _errors(mesh, solver, u_ex, t_u, tp):
    x = E.SpatialCoordinate(mesh)
    decay_u = float(np.exp(-2 * u_ex.nu * np.pi**2 * float(t_u.value)))
    man_u = E.as_vector(
        [
            -E.cos(E.pi * x[0]) * E.sin(E.pi * x[1]) * decay_u,
            E.cos(E.pi * x[1]) * E.sin(E.pi * x[0]) * decay_u,
        ]
    )
    decay_p = float(np.exp(-4 * np.pi**2 * u_ex.nu * tp))
    man_p = -0.25 * (E.cos(2 * E.pi * x[0]) + E.cos(2 * E.pi * x[1])) * decay_p
    uf = E.as_expr(solver.u)
    du = E.as_vector([uf[0] - man_u.comps[0], uf[1] - man_u.comps[1]])
    err_u = float(E.assemble_scalar(mesh, E.inner(du, du), qdegree=8))
    dp = E.as_expr(solver._p) - man_p
    err_p = float(E.assemble_scalar(mesh, dp * dp, qdegree=8))
    return err_u, err_p


def _run_case(N, dt, T0, T1, nu, **kw):
    mesh, solver, u_ex, t_u = _solver_for(N, nu, dt, **kw)
    _init(solver, u_ex, t_u, T0, dt)
    nsteps = int(round((T1 - T0) / dt))
    errs = np.zeros((2, nsteps))
    tp = T0 - dt / 2
    for i in range(nsteps):
        t_u.value = np.asarray(float(t_u.value) + dt)
        tp += dt
        solver.solve(dt, nu, max_iter=1)
        assert solver.last_stats["u_converged"].all()
        assert solver.last_stats["p_converged"]
        errs[:, i] = _errors(mesh, solver, u_ex, t_u, tp)
    hmax = mesh.h().max()
    return hmax, np.sqrt(dt * errs[0].sum()), np.sqrt(dt * errs[1].sum())


@pytest.mark.parametrize("low_memory", [True, False])
def test_taylor_green_convergence(low_memory):
    """Space-time L2 convergence rates ~2 for u and p (P2/P1 IPCS)."""
    nu, dt = 0.01, 0.005
    results = [
        _run_case(N, dt, 0.0, 0.1, nu, low_memory=low_memory) for N in (8, 16, 32)
    ]
    hs = np.array([r[0] for r in results])
    eu = np.array([r[1] for r in results])
    ep = np.array([r[2] for r in results])
    rate_u = np.log(eu[1:] / eu[:-1]) / np.log(hs[1:] / hs[:-1])
    rate_p = np.log(ep[1:] / ep[:-1]) / np.log(hs[1:] / hs[:-1])
    # P2/P1 IPCS: expect ~2nd order (reference logs, demo/taylor_green.py:238-241)
    assert rate_u.min() > 1.7, (rate_u, eu)
    assert rate_p.min() > 1.5, (rate_p, ep)


def test_rotational_form_runs_and_converges():
    h, eu, ep = _run_case(8, 0.005, 0.0, 0.05, 0.01, rotational=True)
    assert eu < 1e-2 and ep < 1e-1


def test_fused_solve_matches_split_phase():
    """One fused jitted step == the split-phase method sequence."""
    nu, dt = 0.01, 0.01
    mesh, s1, u_ex1, t1 = _solver_for(6, nu, dt)
    _init(s1, u_ex1, t1, 0.0, dt)
    mesh2, s2, u_ex2, t2 = _solver_for(6, nu, dt)
    _init(s2, u_ex2, t2, 0.0, dt)

    t1.value = np.asarray(dt)
    s1.solve(dt, nu, max_iter=1)

    # split-phase replication of one step with max_iter=1
    t2.value = np.asarray(dt)
    for bcs in s2._bcs_u:
        for bc in bcs:
            bc.update_bc()
    s2._ps.x.array[:] = s2._p.x.array
    s2.assemble_first(dt, nu)
    s2.velocity_tentative_assemble()
    s2.velocity_tentative_solve()
    s2.pressure_assemble(dt)
    s2.pressure_solve(nu)
    s2.velocity_update(dt)
    # rotation
    for i in range(2):
        s2._u2[i].x.array[:] = s2._u1[i].x.array
        s2._u1[i].x.array[:] = s2._u[i].x.array
    s2._p.x.array[:] = s2._ps.x.array

    for i in range(2):
        assert np.abs(s1._u[i].x.array - s2._u[i].x.array).max() < 1e-9
    assert np.abs(s1._p.x.array - s2._p.x.array).max() < 1e-9


def test_float32_long_horizon_stability():
    """f32 runs must not diverge when solver tolerances are below the dtype
    floor (preonly+lu maps to rtol 1e-13; the Krylov layer clamps it to a
    float32-reachable tolerance — regression for the TPU blowup)."""
    nu, dt = 0.01, 0.01
    m = create_rectangle((-1, -1), (1, 1), (8, 8))
    facets = m.exterior_facet_indices()
    tags = meshtags(m, 1, facets, np.full_like(facets, 3))
    t_c = Constant(0.0)
    ex = TG(t_c, nu)
    s = FractionalStep_AB_CN(
        m,
        ("Lagrange", 2),
        ("Lagrange", 1),
        bcs_u=[[DirichletBC(ex.eval_x, LocatorMethod.TOPOLOGICAL, (tags, 3))],
               [DirichletBC(ex.eval_y, LocatorMethod.TOPOLOGICAL, (tags, 3))]],
        bcs_p=[],
        solver_options=SOLVER_OPTS,  # preonly+lu -> rtol 1e-13, clamped in f32
        dtype=np.float32,
    )
    _init(s, ex, t_c, 0.0, dt)
    for k in range(30):
        t_c.value = np.asarray((k + 1) * dt)
        s.solve(dt, nu, max_iter=1)
    for i in range(2):
        assert np.isfinite(s._u[i].x.array).all()
        assert np.abs(s._u[i].x.array).max() < 10.0


def test_run_with_time_dependent_bcs_matches_per_step():
    """run(bc_vals_seq=...) must reproduce the per-step solve() loop with
    time-dependent Dirichlet values (VERDICT r1 item 6)."""
    import jax.numpy as jnp

    from oasisx_tpu import DirichletBC, FractionalStep_AB_CN, LocatorMethod
    from oasisx_tpu.meshes import create_rectangle, meshtags

    t_now = {"t": 0.0}

    def make(nsolver=None):
        mesh = create_rectangle((-1.0, -1.0), (1.0, 1.0), (6, 6))
        facets = mesh.exterior_facet_indices()
        tags = meshtags(mesh, mesh.dim - 1, facets, np.full_like(facets, 1))

        def gx(x):
            return np.sin(np.pi * x[0]) * np.cos(np.pi * x[1]) * np.cos(2 * t_now["t"])

        def gy(x):
            return -np.cos(np.pi * x[0]) * np.sin(np.pi * x[1]) * np.cos(2 * t_now["t"])

        bcs = [
            [DirichletBC(gx, LocatorMethod.TOPOLOGICAL, (tags, 1))],
            [DirichletBC(gy, LocatorMethod.TOPOLOGICAL, (tags, 1))],
        ]
        s = FractionalStep_AB_CN(
            mesh, ("Lagrange", 2), ("Lagrange", 1), bcs, [],
            solver_options={k: {"ksp_rtol": 1e-10} for k in ("tentative", "pressure", "scalar")},
        )
        for i, g in enumerate((gx, gy)):
            s._u1[i].interpolate(g)
            s._u2[i].interpolate(g)
        return s

    dt, nu, nsteps = 0.01, 0.05, 4

    # per-step path (reference-style loop: advance t, update bcs, solve)
    t_now["t"] = 0.0
    s1 = make()
    for k in range(nsteps):
        t_now["t"] = (k + 1) * dt
        s1.solve(dt, nu, max_iter=1)

    # on-device path with a bc table
    t_now["t"] = 0.0
    s2 = make()
    times = [(k + 1) * dt for k in range(nsteps)]
    table = s2.bc_value_table(times, update=lambda t: t_now.update(t=t))
    assert table.shape[0] == nsteps
    s2.run(nsteps, dt, nu, max_iter=1, bc_vals_seq=table)

    for i in range(2):
        a, b = s1._u[i].x.array, s2._u[i].x.array
        assert np.abs(a - b).max() < 1e-8, np.abs(a - b).max()
    assert np.abs(s1._p.x.array - s2._p.x.array).max() < 1e-7


def test_demo_use_run_matches_per_step_path():
    """taylor_green --use-run (on-device loop, bc table + traced error
    functionals) reproduces the per-step driver's errors."""
    import importlib.util
    from pathlib import Path

    spec = importlib.util.spec_from_file_location(
        "tg_demo", Path(__file__).resolve().parents[1] / "demo" / "taylor_green.py"
    )
    tg = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(tg)

    argv = ["-N", "4", "-N", "8", "-dt", "0.02", "-T1", "0.1"]
    r1 = tg.main(argv)
    r2 = tg.main(argv + ["--use-run"])
    assert np.allclose(r1[0], r2[0], rtol=1e-4)
    assert np.allclose(r1[1], r2[1], rtol=1e-4)


def test_run_different_callbacks_not_cached_stale():
    """Regression (VERDICT r2 weak #2): a second run() with a DIFFERENT
    step_callback must not silently reuse the first callback's compiled
    trace — the multi-step cache is keyed on callback identity."""
    N, nu, dt = 8, 0.01, 0.01
    mesh, solver, u_ex, t_u = _solver_for(N, nu, dt)
    _init(solver, u_ex, t_u, 0.0, dt)

    cb_energy = lambda st, t: (st["u"] ** 2).sum()
    cb_pmax = lambda st, t: abs(st["p"]).max()
    s1 = solver.run(2, dt, nu, step_callback=cb_energy)
    out1 = np.asarray(s1["callback"])
    s2 = solver.run(2, dt, nu, step_callback=cb_pmax)
    out2 = np.asarray(s2["callback"])
    # the two callbacks measure different quantities: stale-cache reuse
    # would return an energy-shaped result for the pmax callback
    assert not np.allclose(out1, out2)
    assert (out2 < 1.0).all() and (out1 > 1.0).all()
