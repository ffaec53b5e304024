"""Isolate the TPU worker crash seen on long band-ELL cylinder runs.

Rebuilds the DFG cylinder config with configurable solver `options` and
runs fixed-size run() windows, printing progress after each window.
Usage: python scripts/isolate_crash.py --res 60 --steps 1500 --window 500 \
           [--pallas off|on] [--layout band|ell]
"""

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_comp_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from oasisx_tpu import DirichletBC, FractionalStep_AB_CN, LocatorMethod, PressureBC
from oasisx_tpu.meshes import locate_entities_boundary, meshtags
from oasisx_tpu.meshes.generation import create_cylinder_channel

L, H, D = 2.2, 0.41, 0.1
CENTER = (0.2, 0.2)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--res", type=int, default=60)
    ap.add_argument("--steps", type=int, default=1500)
    ap.add_argument("--window", type=int, default=500)
    ap.add_argument("--pallas", default="on")
    ap.add_argument("--layout", default=None, choices=[None, "band", "ell"])
    ap.add_argument("-dt", type=float, default=2.5e-4)
    args = ap.parse_args()

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
    values = np.hstack([
        np.full_like(inlet_f, 1, dtype=np.int32),
        np.full_like(walls_f, 2, dtype=np.int32),
        np.full_like(cyl_f, 4, dtype=np.int32),
        np.full_like(outlet_f, 3, dtype=np.int32),
    ])
    tags = meshtags(mesh, dim, facets, values)
    Um = 1.5

    def inflow(x):
        return 4.0 * Um * x[1] * (H - x[1]) / H**2

    bcs_u = [
        [DirichletBC(inflow, LocatorMethod.TOPOLOGICAL, (tags, 1)),
         DirichletBC(0.0, LocatorMethod.TOPOLOGICAL, (tags, 2)),
         DirichletBC(0.0, LocatorMethod.TOPOLOGICAL, (tags, 4))],
        [DirichletBC(0.0, LocatorMethod.TOPOLOGICAL, (tags, 1)),
         DirichletBC(0.0, LocatorMethod.TOPOLOGICAL, (tags, 2)),
         DirichletBC(0.0, LocatorMethod.TOPOLOGICAL, (tags, 4))],
    ]
    options = {"scan_window": 0}  # this script windows manually
    if args.pallas == "off":
        options["pallas"] = False
    if args.layout:
        options["ell_layout"] = args.layout
    solver = FractionalStep_AB_CN(
        mesh, ("Lagrange", 2), ("Lagrange", 1),
        bcs_u=bcs_u, bcs_p=[PressureBC(0.0, (tags, 3))],
        solver_options={"tentative": {"ksp_rtol": 1e-8},
                        "pressure": {"ksp_rtol": 1e-8},
                        "scalar": {"ksp_rtol": 1e-8}},
        options=options,
    )
    print("config:", solver.config_report(), flush=True)
    nu = 1e-3
    done = 0
    while done < args.steps:
        n = min(args.window, args.steps - done)
        t0 = time.perf_counter()
        stats = solver.run(n, args.dt, nu, max_iter=1)
        wall = time.perf_counter() - t0
        done += n
        print(f"window ok: steps={done}/{args.steps} wall={wall:.1f}s "
              f"({wall / n * 1e3:.1f} ms/step) u_it={float(np.mean(stats['u_iters'])):.1f} "
              f"p_it={float(np.mean(stats['p_iters'])):.1f}", flush=True)
    assert np.isfinite(solver._u[0].x.array).all()
    print("ALL WINDOWS OK", flush=True)


if __name__ == "__main__":
    main()
