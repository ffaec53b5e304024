"""End-to-end fracstep wiring of the single-device Pallas kernel paths,
run on CPU in interpret mode (options={"pallas": "interpret"}, the same
opt-in convention as the slab path).

The kernels themselves are differential-tested in test_pallas_ops.py;
these tests cover the *plumbing* in FractionalStep_AB_CN._build_pallas /
_tentative_assemble / _tentative_solve_dev: layout conversions, W_win
threading, bc-row handling, and the HBM-state large-N path (VERDICT r3
#3) — the branches that otherwise only execute on real TPU hardware.
Reference semantics: /root/reference/src/oasisx/fracstep.py:411-658."""

import numpy as np
import pytest

from oasisx_tpu import DirichletBC, FractionalStep_AB_CN, LocatorMethod
from oasisx_tpu.meshes import create_rectangle, meshtags
from oasisx_tpu.spaces import Constant

SOLVER_OPTS = {
    "tentative": {"ksp_type": "bcgs", "rtol": 1e-10, "max_it": 200},
    "pressure": {"ksp_type": "cg", "rtol": 1e-10, "max_it": 200},
    "scalar": {"ksp_type": "cg", "rtol": 1e-10, "max_it": 200},
}

NU, DT, N = 0.01, 0.01, 6


class TG:
    def __init__(self, t, nu):
        self.t, self.nu = t, nu

    def _decay(self):
        return np.exp(-2.0 * self.nu * np.pi**2 * float(self.t.value))

    def eval_x(self, x):
        return -np.cos(np.pi * x[0]) * np.sin(np.pi * x[1]) * self._decay()

    def eval_y(self, x):
        return np.cos(np.pi * x[1]) * np.sin(np.pi * x[0]) * self._decay()


def _run(options, nsteps=3):
    mesh = create_rectangle((-1, -1), (1, 1), (N, N))
    facets = mesh.exterior_facet_indices()
    tags = meshtags(mesh, mesh.dim - 1, facets, np.full_like(facets, 3))
    t_u = Constant(0.0)
    u_ex = TG(t_u, NU)
    bcx = DirichletBC(u_ex.eval_x, LocatorMethod.TOPOLOGICAL, (tags, 3))
    bcy = DirichletBC(u_ex.eval_y, LocatorMethod.TOPOLOGICAL, (tags, 3))
    solver = FractionalStep_AB_CN(
        mesh,
        ("Lagrange", 2),
        ("Lagrange", 1),
        bcs_u=[[bcx], [bcy]],
        bcs_p=[],
        solver_options=SOLVER_OPTS,
        options=options,
        dtype=np.float32,
    )
    t_u.value = np.asarray(-DT)
    solver._u2[0].interpolate(u_ex.eval_x)
    solver._u2[1].interpolate(u_ex.eval_y)
    t_u.value = np.asarray(0.0)
    solver._u1[0].interpolate(u_ex.eval_x)
    solver._u1[1].interpolate(u_ex.eval_y)
    for _ in range(nsteps):
        t_u.value = np.asarray(float(t_u.value) + DT)
        solver.solve(DT, NU, max_iter=2)
        assert bool(np.asarray(solver.last_stats["u_converged"]).all())
        assert bool(np.asarray(solver.last_stats["p_converged"]))
    u = np.stack([np.asarray(f.x.array) for f in solver._u])
    p = np.asarray(solver._p.x.array)
    return solver, u, p


def test_pallas_fused_and_hbm_paths_match_xla():
    """XLA path vs fused-VMEM BiCGStab vs HBM-state BiCGStab: the three
    tentative-solve engines agree after 3 TGV steps at f32."""
    s0, u0, p0 = _run({})
    assert s0.config_report()["pallas"]["bicgstab_iter"] is False

    s1, u1, p1 = _run({"pallas": "interpret"})
    rep1 = s1.config_report()["pallas"]
    assert rep1["bicgstab_iter"] and rep1["pressure_solve"]
    assert not rep1["bicgstab_hbm"]

    s2, u2, p2 = _run({"pallas": "interpret", "pallas_bicgstab_hbm": True})
    rep2 = s2.config_report()["pallas"]
    assert rep2["bicgstab_hbm"] and not rep2["bicgstab_iter"]

    # past-the-resident-budget fallback: fully-streaming HBM kernels
    s3, u3, p3 = _run({"pallas": "interpret", "pallas_bicgstab_hbm": "streaming"})
    assert s3.config_report()["pallas"]["bicgstab_hbm"]

    uscale = np.abs(u0).max()
    pscale = max(np.abs(p0).max(), 1e-3)
    for u, p in ((u1, p1), (u2, p2), (u3, p3)):
        assert np.abs(u - u0).max() / uscale < 5e-4, np.abs(u - u0).max() / uscale
        assert np.abs(p - p0).max() / pscale < 5e-3, np.abs(p - p0).max() / pscale
    # the Pallas engines solve the identical f32 problem
    assert np.abs(u2 - u1).max() / uscale < 5e-4
    assert np.abs(u3 - u2).max() / uscale < 5e-4
