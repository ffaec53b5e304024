"""3D Taylor-Green vortex at Re=1600 — BASELINE.md config #4: the
energy-dissipation fidelity benchmark. Tracks kinetic energy
E(t) = (1/|O|) int |u|^2/2 dx and dissipation -dE/dt over time; at
Re=1600 the dissipation peak near t ~ 8-9 (in convective units) is the
standard reference curve for this flow.

Runs on the structured TPU fast path; domain [-pi,pi]^3 with free-slip
symmetry approximated by Dirichlet of the analytic initial field on the
boundary (the classical problem is periodic; without periodic BCs this
config tracks the early-time dissipation curve).
"""

import argparse
import json
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from oasisx_tpu import DirichletBC, FractionalStep_AB_CN, LocatorMethod
from oasisx_tpu.assembly import engine as eng
from oasisx_tpu.meshes import create_box, meshtags


def main(argv=None):
    parser = argparse.ArgumentParser(formatter_class=argparse.ArgumentDefaultsHelpFormatter)
    parser.add_argument("-N", type=int, default=24, help="cells per axis")
    parser.add_argument("-dt", type=float, default=5e-3)
    parser.add_argument("-T", type=float, default=1.0)
    parser.add_argument("-Re", type=float, default=1600.0)
    parser.add_argument("--chunk", type=int, default=20, help="steps per device chunk")
    args = parser.parse_args(argv)
    nu = 1.0 / args.Re
    L = np.pi

    mesh = create_box((-L, -L, -L), (L, L, L), (args.N,) * 3)
    facets = mesh.exterior_facet_indices()
    tags = meshtags(mesh, 2, facets, np.full_like(facets, 1))

    def ux(x):
        return np.sin(x[0]) * np.cos(x[1]) * np.cos(x[2])

    def uy(x):
        return -np.cos(x[0]) * np.sin(x[1]) * np.cos(x[2])

    def uz(x):
        return np.zeros_like(x[0])

    bcs_u = [[DirichletBC(f, LocatorMethod.TOPOLOGICAL, (tags, 1))] for f in (ux, uy, uz)]
    solver = FractionalStep_AB_CN(
        mesh,
        ("Lagrange", 2),
        ("Lagrange", 1),
        bcs_u=bcs_u,
        bcs_p=[],
        solver_options={
            "tentative": {"ksp_rtol": 1e-6},
            "pressure": {"ksp_rtol": 1e-6},
            "scalar": {"ksp_rtol": 1e-6},
        },
    )
    for f, u1, u2 in zip((ux, uy, uz), solver._u1, solver._u2):
        u1.interpolate(f)
        u2.interpolate(f)
    vol = solver._vol

    def kinetic_energy():
        import jax.numpy as jnp

        ctx = solver._ctx
        e = 0.0
        for i in range(3):
            ui = jnp.asarray(solver._pv(solver._u1[i].x.array), solver._dtype)
            e += float(eng.integrate(ctx, eng.eval_v_at_qp(ctx, ui) ** 2))
        return 0.5 * e / vol

    nchunks = int(round(args.T / args.dt / args.chunk))
    ts, energies = [0.0], [kinetic_energy()]
    t0 = time.perf_counter()
    for c in range(nchunks):
        solver.run(args.chunk, args.dt, nu, max_iter=1)
        ts.append((c + 1) * args.chunk * args.dt)
        energies.append(kinetic_energy())
    wall = time.perf_counter() - t0
    diss = -np.gradient(np.asarray(energies), np.asarray(ts))
    out = {
        "t": ts,
        "kinetic_energy": energies,
        "dissipation": diss.tolist(),
        "steps_per_sec": nchunks * args.chunk / wall,
        "velocity_dofs": 3 * solver._Vi[0][0].num_dofs,
    }
    print(json.dumps(out))
    return out


if __name__ == "__main__":
    main()
