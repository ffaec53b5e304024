"""End-to-end fracstep wiring of the SINGLE-DEVICE unstructured fused
ELL Krylov paths (interpret mode on CPU, options={"pallas": "interpret"}):

- tentative solves through make_ell_bicgstab_iter (one op/iteration,
  all components batched, bc rows via zmask + preseeded x0),
- velocity-update mass CG through make_ell_cg_iter,
- pressure PCG with the whole AMG V-cycle fused into the per-iteration
  kernel (make_ell_pcg_amg_iter), both the outlet-Dirichlet (mask) and
  the pure-Neumann (in-kernel nullspace projection) variants.

The kernels themselves are differential-tested in test_ell_kernels.py;
these tests cover the plumbing in _build_pallas_ell_single /
_build_ell_amg and the solve-path branches.  Reference semantics: the
PETSc KSP solves, /root/reference/src/oasisx/fracstep.py:508-658."""

import numpy as np
import pytest

from oasisx_tpu import (
    DirichletBC,
    FractionalStep_AB_CN,
    LocatorMethod,
    PressureBC,
)
from oasisx_tpu.meshes import (
    create_rectangle,
    locate_entities_boundary,
    meshtags,
)
from oasisx_tpu.meshes.generation import create_cylinder_channel
from oasisx_tpu.meshes.mesh import Mesh
from oasisx_tpu.spaces import Constant

NU, DT = 0.01, 0.01


def _cylinder(options, nsteps=3):
    """DFG-style cylinder channel with outlet PressureBC (mask path)."""
    mesh = create_cylinder_channel(10)
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
    opts = {"ksp_type": "bcgs", "rtol": 1e-8, "max_it": 500}
    popts = {"ksp_type": "cg", "rtol": 1e-8, "max_it": 500}
    solver = FractionalStep_AB_CN(
        mesh,
        ("Lagrange", 2),
        ("Lagrange", 1),
        bcs_u=bcs_u,
        bcs_p=[PressureBC(0.0, (tags, 3))],
        solver_options={"tentative": opts, "pressure": popts, "scalar": popts},
        options=options,
        dtype=np.float32,
    )
    for _ in range(nsteps):
        solver.solve(DT, NU, max_iter=2)
        assert bool(np.asarray(solver.last_stats["u_converged"]).all())
        assert bool(np.asarray(solver.last_stats["p_converged"]))
    u = np.stack([np.asarray(f.x.array) for f in solver._u])
    p = np.asarray(solver._p.x.array)
    return solver, u, p


class TG:
    def __init__(self, t, nu):
        self.t, self.nu = t, nu

    def _decay(self):
        return np.exp(-2.0 * self.nu * np.pi**2 * float(self.t.value))

    def eval_x(self, x):
        return -np.cos(np.pi * x[0]) * np.sin(np.pi * x[1]) * self._decay()

    def eval_y(self, x):
        return np.cos(np.pi * x[1]) * np.sin(np.pi * x[0]) * self._decay()


def _neumann(options, nsteps=3):
    """Taylor-Green decay on an UNSTRUCTURED copy of the rectangle mesh
    (structured=None strips the lattice fast path): pure-Neumann pressure
    Poisson -> the in-kernel nullspace-projection variant."""
    m0 = create_rectangle((-1, -1), (1, 1), (6, 6))
    mesh = Mesh(m0.x, m0.cells, "triangle")
    facets = mesh.exterior_facet_indices()
    tags = meshtags(mesh, mesh.dim - 1, facets, np.full_like(facets, 3))
    t_u = Constant(0.0)
    u_ex = TG(t_u, NU)
    bcx = DirichletBC(u_ex.eval_x, LocatorMethod.TOPOLOGICAL, (tags, 3))
    bcy = DirichletBC(u_ex.eval_y, LocatorMethod.TOPOLOGICAL, (tags, 3))
    opts = {"ksp_type": "bcgs", "rtol": 1e-8, "max_it": 500}
    popts = {"ksp_type": "cg", "rtol": 1e-8, "max_it": 500}
    solver = FractionalStep_AB_CN(
        mesh,
        ("Lagrange", 2),
        ("Lagrange", 1),
        bcs_u=[[bcx], [bcy]],
        bcs_p=[],
        solver_options={"tentative": opts, "pressure": popts, "scalar": popts},
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


def test_ell_wiring_cylinder_outlet_matches_xla():
    s0, u0, p0 = _cylinder({})
    rep0 = s0.config_report()
    assert rep0["pallas"]["ell_single"] is False
    assert rep0["pressure_pc"] == "amg-pcg"

    s1, u1, p1 = _cylinder({"pallas": "interpret"})
    rep1 = s1.config_report()
    assert rep1["pallas"]["ell_single"] == "ell"
    assert rep1["pallas"]["ell_amg_pcg"]
    assert rep1["pressure_pc"] == "pallas-amg-pcg-fused"

    # band layout (the hardware-portable one): same solves through the
    # RCM-permuted lane-tile kernels, XLA AMG apply composed with the
    # band matvec
    s2, u2, p2 = _cylinder({"pallas": "interpret", "ell_layout": "band"})
    rep2 = s2.config_report()
    assert rep2["pallas"]["ell_single"] == "band"
    assert not rep2["pallas"]["ell_amg_pcg"]
    assert rep2["pressure_pc"] == "amg-pcg"

    uscale = np.abs(u0).max()
    pscale = max(np.abs(p0).max(), 1e-3)
    for u, p in ((u1, p1), (u2, p2)):
        assert np.abs(u - u0).max() / uscale < 5e-4, np.abs(u - u0).max() / uscale
        assert np.abs(p - p0).max() / pscale < 5e-3, np.abs(p - p0).max() / pscale
    # identical algebra -> iteration counts match the XLA engines closely
    it0 = np.asarray(s0.last_stats["p_iters"])
    it1 = np.asarray(s1.last_stats["p_iters"])
    assert abs(int(it0) - int(it1)) <= 1, (it0, it1)


def test_ell_wiring_neumann_nullspace_matches_xla():
    s0, u0, p0 = _neumann({})
    assert s0.config_report()["pallas"]["ell_single"] is False

    s1, u1, p1 = _neumann({"pallas": "interpret"})
    rep1 = s1.config_report()
    assert rep1["pallas"]["ell_single"] == "ell"
    assert rep1["pallas"]["ell_amg_pcg"]

    s2, u2, p2 = _neumann({"pallas": "interpret", "ell_layout": "band"})
    assert s2.config_report()["pallas"]["ell_single"] == "band"

    uscale = np.abs(u0).max()
    pscale = max(np.abs(p0).max(), 1e-3)
    for u, p in ((u1, p1), (u2, p2)):
        assert np.abs(u - u0).max() / uscale < 5e-4, np.abs(u - u0).max() / uscale
        assert np.abs(p - p0).max() / pscale < 5e-3, np.abs(p - p0).max() / pscale
