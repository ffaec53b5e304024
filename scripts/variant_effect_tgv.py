"""Measure the effect of the Lagrange node variant on P3/P4 TGV error
norms (VERDICT r3 #6 closure, second branch: 'record the max
node/tabulation deviation and its effect on a P3/P4 TGV error norm').

P1-P3 gll_warped nodes are provably identical to basix's (forced by
vertices + exact GLL edges + symmetry; tests/test_elements.py). The only
possible divergence is the P4 interior trio (warp-and-blend alpha=0 at
barycentric (0.5516, 0.2242, 0.2242) vs basix's choice; both within
0.058 of the equispaced lattice). This script bounds the *solution*
effect of that freedom by running the manufactured Taylor-Green problem
with P3/P2 and P4/P3 elements under BOTH variants — the
equispaced-vs-gll_warped spread measures the sensitivity of the solution
to the full interior-node freedom, of which the gll_warped-vs-basix
difference is a strict subset (both schemes keep vertices, GLL edges and
symmetry, differing only inside that freedom). Results are recorded in
FIDELITY.md.

Usage: JAX_PLATFORMS=cpu python scripts/variant_effect_tgv.py
"""

import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import jax  # noqa: E402

# f64 CPU measurement (the sitecustomize pins the axon TPU platform; this
# script is a discretization study, not a perf run)
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

from oasisx_tpu import DirichletBC, FractionalStep_AB_CN, LocatorMethod  # noqa: E402
from oasisx_tpu.elements.element import FiniteElement  # noqa: E402
from oasisx_tpu.forms import expr as E  # noqa: E402
from oasisx_tpu.meshes import create_rectangle, meshtags  # noqa: E402
from oasisx_tpu.spaces import Constant  # noqa: E402

NU = 0.01
DT = 0.005
T1 = 0.05


class TG:
    def __init__(self, t, nu):
        self.t, self.nu = t, nu

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


def run(N, du, dp, variant):
    mesh = create_rectangle((-1, -1), (1, 1), (N, N))
    facets = mesh.exterior_facet_indices()
    tags = meshtags(mesh, 1, facets, np.full_like(facets, 3))
    t_u = Constant(0.0)
    ex = TG(t_u, NU)
    el_u = FiniteElement("Lagrange", mesh.cell_type, du, variant)
    el_p = FiniteElement("Lagrange", mesh.cell_type, dp, variant)
    s = FractionalStep_AB_CN(
        mesh,
        el_u,
        el_p,
        bcs_u=[[DirichletBC(ex.eval_x, LocatorMethod.TOPOLOGICAL, (tags, 3))],
               [DirichletBC(ex.eval_y, LocatorMethod.TOPOLOGICAL, (tags, 3))]],
        bcs_p=[],
        solver_options={
            "tentative": {"ksp_rtol": 1e-12},
            "pressure": {"ksp_rtol": 1e-12},
            "scalar": {"ksp_rtol": 1e-12},
        },
        options={"structured": False},
    )
    t_u.value = np.asarray(-DT)
    s._u2[0].interpolate(ex.eval_x)
    s._u2[1].interpolate(ex.eval_y)
    t_u.value = np.asarray(0.0)
    s._u1[0].interpolate(ex.eval_x)
    s._u1[1].interpolate(ex.eval_y)
    s._p.interpolate(lambda x: ex.eval_p(-DT / 2.0, x))

    nsteps = int(round(T1 / DT))
    tp = -DT / 2
    for _ in range(nsteps):
        t_u.value = np.asarray(float(t_u.value) + DT)
        tp += DT
        s.solve(DT, NU, max_iter=1)

    x = E.SpatialCoordinate(mesh)
    decay_u = float(np.exp(-2 * NU * np.pi**2 * float(t_u.value)))
    man_u = E.as_vector([
        -E.cos(E.pi * x[0]) * E.sin(E.pi * x[1]) * decay_u,
        E.cos(E.pi * x[1]) * E.sin(E.pi * x[0]) * decay_u,
    ])
    decay_p = float(np.exp(-4 * np.pi**2 * NU * tp))
    man_p = -0.25 * (E.cos(2 * E.pi * x[0]) + E.cos(2 * E.pi * x[1])) * decay_p
    uf = E.as_expr(s.u)
    duv = E.as_vector([uf[0] - man_u.comps[0], uf[1] - man_u.comps[1]])
    err_u = float(E.assemble_scalar(mesh, E.inner(duv, duv), qdegree=2 * du + 4)) ** 0.5
    dpv = E.as_expr(s._p) - man_p
    err_p = float(E.assemble_scalar(mesh, dpv * dpv, qdegree=2 * du + 4)) ** 0.5
    return err_u, err_p


def main():
    print(f"TGV nu={NU} dt={DT} T={T1} (final-time L2 errors)")
    for du, dp, N in ((3, 2, 6), (4, 3, 4), (4, 3, 6)):
        rows = {}
        for variant in ("gll_warped", "equispaced"):
            eu, ep = run(N, du, dp, variant)
            rows[variant] = (eu, ep)
            print(f"P{du}/P{dp} N={N} {variant:11s}: err_u={eu:.6e} err_p={ep:.6e}")
        eu_w, ep_w = rows["gll_warped"]
        eu_e, ep_e = rows["equispaced"]
        print(
            f"P{du}/P{dp} N={N} variant spread: "
            f"u {abs(eu_w - eu_e) / eu_w * 100:.2f}%  "
            f"p {abs(ep_w - ep_e) / ep_w * 100:.2f}%  "
            "(upper bound on the gll_warped-vs-basix effect)"
        )


if __name__ == "__main__":
    main()
