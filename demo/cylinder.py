"""DFG 2D cylinder benchmark (Schaefer-Turek) — BASELINE.md config #3:
channel flow past a cylinder; drag/lift coefficients (and, for the
unsteady 2D-2 case, the Strouhal number from the lift signal).

2D-1 (default): Um=0.3, nu=1e-3 -> Re=20, steady; reference values
Cd ~ 5.58, Cl ~ 0.0106 (fine-mesh literature values).
2D-2 (--Um 1.5): Re=100, vortex shedding; St ~ 0.30.

Exercises the general (unstructured) assembly path, PressureBC outlet,
and the surface-traction evaluator (assembly/facets.py).
"""

import argparse
import json
import logging
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import jax.numpy as jnp

from oasisx_tpu import DirichletBC, FractionalStep_AB_CN, LocatorMethod, PressureBC
from oasisx_tpu.assembly.facets import build_facet_context, surface_traction
from oasisx_tpu.meshes import locate_entities_boundary, meshtags
from oasisx_tpu.meshes.generation import create_cylinder_channel

logging.basicConfig()
logger = logging.getLogger("oasisx_tpu.cylinder")
logger.setLevel(logging.INFO)

L, H, D = 2.2, 0.41, 0.1
CENTER = (0.2, 0.2)


def main(argv=None):
    parser = argparse.ArgumentParser(formatter_class=argparse.ArgumentDefaultsHelpFormatter)
    parser.add_argument("--res", type=int, default=40)
    parser.add_argument("-dt", type=float, default=2e-3)
    parser.add_argument("-T", type=float, default=0.5)
    parser.add_argument("--Um", type=float, default=0.3)
    parser.add_argument("-nu", type=float, default=1e-3)
    args = parser.parse_args(argv)

    mesh = create_cylinder_channel(args.res)
    dim = 1
    inlet_f = locate_entities_boundary(mesh, dim, lambda x: np.isclose(x[0], 0.0))
    outlet_f = locate_entities_boundary(mesh, dim, lambda x: np.isclose(x[0], L))
    walls_f = locate_entities_boundary(
        mesh, dim, lambda x: np.isclose(x[1], 0.0) | np.isclose(x[1], H)
    )
    ext = mesh.exterior_facet_indices()
    mid = mesh.x[mesh.topology.facets[ext]].mean(axis=1)
    cyl_f = ext[np.linalg.norm(mid - np.asarray(CENTER), axis=1) < 0.9 * D]
    facets = np.hstack([inlet_f, walls_f, cyl_f, outlet_f])
    values = np.hstack(
        [
            np.full_like(inlet_f, 1, dtype=np.int32),
            np.full_like(walls_f, 2, dtype=np.int32),
            np.full_like(cyl_f, 4, dtype=np.int32),
            np.full_like(outlet_f, 3, dtype=np.int32),
        ]
    )
    tags = meshtags(mesh, dim, facets, values)

    Um = args.Um

    def inflow(x):
        return 4.0 * Um * x[1] * (H - x[1]) / H**2

    zero_walls = DirichletBC(0.0, LocatorMethod.TOPOLOGICAL, (tags, 2))
    zero_cyl = DirichletBC(0.0, LocatorMethod.TOPOLOGICAL, (tags, 4))
    bcs_u = [
        [DirichletBC(inflow, LocatorMethod.TOPOLOGICAL, (tags, 1)), zero_walls, zero_cyl],
        [
            DirichletBC(0.0, LocatorMethod.TOPOLOGICAL, (tags, 1)),
            DirichletBC(0.0, LocatorMethod.TOPOLOGICAL, (tags, 2)),
            DirichletBC(0.0, LocatorMethod.TOPOLOGICAL, (tags, 4)),
        ],
    ]
    bcs_p = [PressureBC(0.0, (tags, 3))]
    solver = FractionalStep_AB_CN(
        mesh,
        ("Lagrange", 2),
        ("Lagrange", 1),
        bcs_u=bcs_u,
        bcs_p=bcs_p,
        solver_options={
            "tentative": {"ksp_rtol": 1e-8},
            "pressure": {"ksp_rtol": 1e-8},
            "scalar": {"ksp_rtol": 1e-8},
        },
    )

    # cylinder facet context for traction integration
    fctx = build_facet_context(
        mesh, solver._V.element, solver._Q.element, cyl_f, dtype=solver._dtype
    )
    Ubar = 2.0 * Um / 3.0
    scale = 2.0 / (Ubar**2 * D)

    nsteps = int(round(args.T / args.dt))
    lift_series = []
    for step in range(1, nsteps + 1):
        solver.solve(args.dt, args.nu, max_iter=1)
        if step % 10 == 0 or step == nsteps:
            u = jnp.asarray(np.stack([f.x.array for f in solver._u]), solver._dtype)
            p = jnp.asarray(solver._p.x.array, solver._dtype)
            # force on the body = - (force on the fluid through the surface)
            F = -np.asarray(surface_traction(solver._ctx, fctx, u, p, args.nu))
            cd, cl = scale * F[0], scale * F[1]
            lift_series.append((step * args.dt, cd, cl))
            if step % 50 == 0 or step == nsteps:
                logger.info("t=%.3f Cd=%.4f Cl=%.5f", step * args.dt, cd, cl)

    ts, cds, cls = map(np.asarray, zip(*lift_series))
    out = {"t_end": float(ts[-1]), "Cd": float(cds[-1]), "Cl": float(cls[-1])}
    # Strouhal from lift zero crossings (unsteady case)
    sign_changes = np.where(np.diff(np.sign(cls - cls.mean())) != 0)[0]
    if len(sign_changes) >= 4:
        period = 2 * np.mean(np.diff(ts[sign_changes]))
        out["Strouhal"] = float(D / (Ubar * period))
    print(json.dumps(out))
    return out


if __name__ == "__main__":
    main()
