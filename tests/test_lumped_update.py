"""Lumped (weighted-gradient) velocity update — pc_type "lumped" on the
scalar solve family (the classic Oasis lumped projection; the reference
declares the API via its LumpedProject stub,
/root/reference/src/oasisx/function.py:146-153).

The update is u -= dt * diag(M)^{-1} * G_w dp with G_w the diag(M)-weighted
per-cell gradients of dp evaluated AT the velocity nodes (a convex
combination of nodal gradient samples — pointwise consistent for every
degree).  Dividing the plain Galerkin action G dp by a lumped mass is NOT
consistent for P2 (vertex row sums of M vanish on triangles / go negative
on tets) and diverges within ~50 TGV steps — the long-horizon test below
pins the fix.

Pinned contracts:
- the HRZ lumped vector c*diag(M) is positive for P2/P3 (row-sum lumping
  is not: P2 vertex row sums vanish) and conserves mass (sums to the
  domain volume);
- a lumped-update run stays close to the consistent-mass CG run (the
  lumping error is a discretization-order perturbation) and reports
  c_iters == 0 / converged, and stays bounded over long horizons;
- config_report()["velocity_update"] surfaces the active choice.
"""

import numpy as np
import pytest

from oasisx_tpu.assembly import engine as eng

from tests.test_taylor_green import SOLVER_OPTS, TG, _init
from oasisx_tpu import DirichletBC, FractionalStep_AB_CN, LocatorMethod
from oasisx_tpu.meshes import create_rectangle, meshtags
from oasisx_tpu.spaces import Constant


def _solver(N, nu, dt, scalar_opts):
    mesh = create_rectangle((-1, -1), (1, 1), (N, N))
    facets = mesh.exterior_facet_indices()
    tags = meshtags(mesh, mesh.dim - 1, facets, np.full_like(facets, 3))
    t_u = Constant(0.0)
    u_ex = TG(t_u, nu)
    bcs = [
        [DirichletBC(u_ex.eval_x, LocatorMethod.TOPOLOGICAL, (tags, 3))],
        [DirichletBC(u_ex.eval_y, LocatorMethod.TOPOLOGICAL, (tags, 3))],
    ]
    opts = {k: dict(v) for k, v in SOLVER_OPTS.items()}
    opts["scalar"].update(scalar_opts)
    solver = FractionalStep_AB_CN(
        mesh,
        ("Lagrange", 2),
        ("Lagrange", 1),
        bcs_u=bcs,
        bcs_p=[],
        solver_options=opts,
    )
    _init(solver, u_ex, t_u, 0.0, dt)
    return solver


@pytest.mark.parametrize("degree", [2, 3])
def test_hrz_vector_positive_and_conservative(degree):
    s = _solver(5, 0.05, 0.01, {"pc_type": "lumped"})
    if degree == 3:
        # rebuild at P3/P2 to exercise a higher-order lumping
        mesh = create_rectangle((-1, -1), (1, 1), (4, 4))
        facets = mesh.exterior_facet_indices()
        tags = meshtags(mesh, mesh.dim - 1, facets, np.full_like(facets, 3))
        zero = DirichletBC(0.0, LocatorMethod.TOPOLOGICAL, (tags, 3))
        s = FractionalStep_AB_CN(
            mesh, ("Lagrange", 3), ("Lagrange", 2),
            bcs_u=[[zero], [zero]], bcs_p=[],
        )
    ctx = s._params()["ctx"]
    # assemble diag(M) directly from the element stack
    elems = np.asarray(eng.mass_elems(ctx))
    nd = elems.shape[1]
    cd = np.asarray(ctx.cd_v)
    diag = np.zeros(ctx.ndofs_v)
    np.add.at(diag, cd.reshape(-1), elems[:, np.arange(nd), np.arange(nd)].reshape(-1))
    mref = np.asarray(ctx.mass_ref)
    c = mref.sum() / np.trace(mref)
    ml = c * diag
    used = np.zeros(ctx.ndofs_v, bool)  # ndofs_v includes padding slots
    used[cd.reshape(-1)] = True
    assert (ml[used] > 0).all() and used.any()
    np.testing.assert_allclose(ml.sum(), 4.0, rtol=1e-10)  # domain volume


def test_lumped_update_runs_and_matches_consistent():
    dt, nu, N = 0.01, 0.05, 12
    a = _solver(N, nu, dt, {"pc_type": "lumped"})
    b = _solver(N, nu, dt, {})
    assert a.config_report()["velocity_update"] == "lumped"
    assert b.config_report()["velocity_update"] in ("cg", "bcgs")

    sa = a.run(5, dt, nu, max_iter=1)
    sb = b.run(5, dt, nu, max_iter=1)
    assert (sa["c_iters"] == 0).all()
    assert sa["c_converged"].all()
    assert (sb["c_iters"] > 0).any()

    ua = a._u[0].x.array
    ub = b._u[0].x.array
    scale = np.abs(ub).max()
    # lumping is a discretization-order perturbation, not a solver change:
    # fields agree to ~1% at this resolution, and are NOT identical
    assert np.abs(ua - ub).max() < 2e-2 * scale
    assert np.abs(ua - ub).max() > 0


def test_lumped_update_long_horizon_stable():
    """150 decaying-TGV steps: the lumped run must track the consistent-CG
    run (the inconsistent diag-solve variant diverges to ~1e5 by step 50)."""
    dt, nu, N = 2e-3, 1.0 / 1600.0, 8
    a = _solver(N, nu, dt, {"pc_type": "lumped"})
    b = _solver(N, nu, dt, {})
    sa = a.run(150, dt, nu, max_iter=1)
    b.run(150, dt, nu, max_iter=1)
    assert (sa["c_iters"] == 0).all() and sa["c_converged"].all()
    ua = np.asarray(a._u[0].x.array)
    ub = np.asarray(b._u[0].x.array)
    assert np.isfinite(ua).all()
    scale = np.abs(ub).max()
    assert np.abs(ua).max() < 2 * scale
    assert np.abs(ua - ub).max() < 2e-2 * scale


def test_lumped_alias_key():
    dt, nu = 0.01, 0.05
    s = _solver(8, nu, dt, {"lumped": True})
    assert s.config_report()["velocity_update"] == "lumped"
    s.solve(dt, nu, max_iter=1)
    assert (s.last_stats["c_iters"] == 0).all()
