"""AOT compile check for large-N single-chip kernel sets.

Builds the 3D free-slip TGV solver at the requested N, reports which Pallas
kernel families engaged (each is gated on its own VMEM-footprint estimate
against fracstep._VMEM_BUDGET), then lowers + compiles ONE full IPCS step
through the TPU AOT compiler WITHOUT executing it — the remote compile
helper is chipless, so this validates Mosaic/scoped-VMEM feasibility of a
grid size in minutes even while the chip is busy.

Usage: python scripts/aot_check.py [-N 64] [--no-compile]
"""

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def build_solver(N: int):
    from oasisx_tpu import DirichletBC, FractionalStep_AB_CN, LocatorMethod
    from oasisx_tpu.meshes import create_box, meshtags

    L = np.pi
    mesh = create_box((0.0, 0.0, 0.0), (L, L, L), (N, N, N))
    facets = mesh.exterior_facet_indices()
    mids = mesh.midpoints(mesh.dim - 1, facets)
    vals = np.zeros(len(facets), dtype=np.int32)
    tol = 1e-10
    for ax in range(3):
        hit = np.isclose(mids[:, ax], 0.0, atol=tol) | np.isclose(mids[:, ax], L, atol=tol)
        vals[(vals == 0) & hit] = ax + 1
    tags = meshtags(mesh, mesh.dim - 1, facets, vals)
    bcs_u = [
        [DirichletBC(0.0, LocatorMethod.TOPOLOGICAL, (tags, ax + 1))] for ax in range(3)
    ]
    return FractionalStep_AB_CN(
        mesh, ("Lagrange", 2), ("Lagrange", 1), bcs_u, [],
        solver_options={k: {"ksp_rtol": 1e-6, "ksp_max_it": 2000}
                        for k in ("tentative", "pressure", "scalar")},
        dtype=np.float32,
    )


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("-N", type=int, default=64)
    ap.add_argument("--no-compile", action="store_true",
                    help="only report kernel activation, skip the AOT compile")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_comp_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    t0 = time.perf_counter()
    solver = build_solver(args.N)
    print(f"setup: {time.perf_counter() - t0:.1f}s")
    report = {
        "pressure_solve": solver._pallas_p is not None,
        "tent_matvecs": solver._pallas_tent is not None,
        "bicgstab_iter": solver._pallas_bicgstab is not None,
        "cg_mass_iter": solver._pf_cg_mass is not None,
        "cg_step(grid)": solver._pallas_cg_step is not None,
        "pf_div/grad/mass": solver._pf_mass_mv is not None,
        "matvec_win": solver._pf_matvec_win is not None,
        "mg": solver._mg is not None,
    }
    print(f"N={args.N} kernel activation: {report}")
    if args.no_compile:
        return

    P = solver._params()
    state = solver._state_from_functions()
    bc_vals = solver._bc_value_arrays()
    dtype = solver._dtype
    dt = jnp.asarray(0.005, dtype)
    nu = jnp.asarray(1.0 / 1600.0, dtype)
    max_err = jnp.asarray(1e-8, dtype)

    def fn(P, state, dt, nu, bc_vals):
        new_state, stats = solver._step_impl(P, state, dt, nu, bc_vals, [], max_err, 1)
        return new_state["u"], new_state["p"], stats["diff"]

    t0 = time.perf_counter()
    lowered = jax.jit(fn).lower(P, state, dt, nu, bc_vals)
    print(f"lower: {time.perf_counter() - t0:.1f}s")
    t0 = time.perf_counter()
    compiled = lowered.compile()
    print(f"compile: {time.perf_counter() - t0:.1f}s")
    mem = compiled.memory_analysis()
    if mem is not None:
        print(f"device memory: args {mem.argument_size_in_bytes/1e9:.2f} GB, "
              f"temps {mem.temp_size_in_bytes/1e9:.2f} GB")
    print(f"aot_check N={args.N}: step compiled OK")


if __name__ == "__main__":
    main()
