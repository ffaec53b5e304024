"""Compile the SHARDED per-shard Pallas kernel families natively on the
real TPU chip (VERDICT r4 #4 / weak #4).

The slab and graph-halo kernel families had only ever run in interpret
mode on the virtual CPU mesh (dryrun + tests) — semantics proven,
Mosaic lowerability not.  A 1-device ``jax.sharding.Mesh`` on the TPU
exercises the exact same shard_map + per-shard kernel code (ppermute
schedule empty but the kernels identical), so this is the cheapest
native-lowering proof this environment allows.

Runs each family natively, then compares against the same config run
single-device (no mesh):
  1. slab 2D N=16 structured (slab_kernels: mv_win/mass/grad)
  2. graph-halo cylinder + outlet (band-ELL per-shard kernels)

Usage: python scripts/native_sharded_kernels.py  (needs the TPU)
Prints one JSON line per mode + a final summary.
"""

import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_comp_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from jax.sharding import Mesh

from oasisx_tpu import DirichletBC, FractionalStep_AB_CN, LocatorMethod, PressureBC
from oasisx_tpu.meshes import create_rectangle, locate_entities_boundary, meshtags
from oasisx_tpu.meshes.generation import create_cylinder_channel


def build_tg(device_mesh=None, structured=True):
    mesh = create_rectangle((-1, -1), (1, 1), (16, 16))
    facets = mesh.exterior_facet_indices()
    tags = meshtags(mesh, 1, facets, np.full_like(facets, 3))

    def ux(x):
        return -np.cos(np.pi * x[0]) * np.sin(np.pi * x[1])

    def uy(x):
        return np.cos(np.pi * x[1]) * np.sin(np.pi * x[0])

    s = FractionalStep_AB_CN(
        mesh,
        ("Lagrange", 2),
        ("Lagrange", 1),
        bcs_u=[[DirichletBC(ux, LocatorMethod.TOPOLOGICAL, (tags, 3))],
               [DirichletBC(uy, LocatorMethod.TOPOLOGICAL, (tags, 3))]],
        bcs_p=[],
        options={"structured": structured},
        device_mesh=device_mesh,
    )
    for f, g in ((s._u1[0], ux), (s._u1[1], uy), (s._u2[0], ux), (s._u2[1], uy)):
        f.interpolate(g)
    return s


def build_cyl(device_mesh=None):
    mesh = create_cylinder_channel(12)
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
    Um = 0.3
    inflow = lambda x: 4.0 * Um * x[1] * (H - x[1]) / H**2
    bcs_u = [
        [DirichletBC(inflow, LocatorMethod.TOPOLOGICAL, (tags, 1)),
         DirichletBC(0.0, LocatorMethod.TOPOLOGICAL, (tags, 2))],
        [DirichletBC(0.0, LocatorMethod.TOPOLOGICAL, (tags, 1)),
         DirichletBC(0.0, LocatorMethod.TOPOLOGICAL, (tags, 2))],
    ]
    return FractionalStep_AB_CN(
        mesh,
        ("Lagrange", 2),
        ("Lagrange", 1),
        bcs_u=bcs_u,
        bcs_p=[PressureBC(0.0, (tags, 3))],
        device_mesh=device_mesh,
    )


def main():
    platform = jax.devices()[0].platform
    dmesh = Mesh(np.array(jax.devices()[:1]), ("s",))
    out = {"platform": platform, "modes": {}}

    # --- slab family -------------------------------------------------------
    ref = build_tg()
    s = build_tg(device_mesh=dmesh)
    mode = {
        "slab": s._slab is not None,
        "slab_kernels": s._slab_kernels is not None,
        "interpret": bool(getattr(s, "_pallas_interpret", False)),
    }
    ref.solve(0.01, 0.01, max_iter=1)
    s.solve(0.01, 0.01, max_iter=1)
    err = max(
        float(np.abs(ref._u[i].x.array - s._u[i].x.array).max()) for i in range(2)
    )
    mode["max_abs_diff_vs_single"] = err
    mode["ok"] = bool(np.isfinite(err) and err < 1e-4)
    out["modes"]["slab_2d"] = mode
    print("slab:", json.dumps(mode))

    # --- graph-halo band-ELL family ---------------------------------------
    ref = build_cyl()
    s = build_cyl(device_mesh=dmesh)
    mode = {
        "hx": s._hx_v is not None,
        "halo_kernels": s._halo_kernels is not None
        and getattr(s._halo_kernels, "get", lambda *_: None)("layout"),
    }
    ref.solve(2e-3, 1e-3, max_iter=1)
    s.solve(2e-3, 1e-3, max_iter=1)
    err = max(
        float(np.abs(ref._u[i].x.array - s._u[i].x.array).max()) for i in range(2)
    )
    mode["max_abs_diff_vs_single"] = err
    mode["ok"] = bool(np.isfinite(err) and err < 1e-4)
    out["modes"]["graph_halo_cylinder"] = mode
    print("graph-halo:", json.dumps(mode))

    out["ok"] = all(m["ok"] for m in out["modes"].values())
    print(json.dumps(out))


if __name__ == "__main__":
    main()
