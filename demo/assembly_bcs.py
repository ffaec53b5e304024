"""LHS+RHS assembly-strategy comparison with Dirichlet BCs — port of the
reference demo/assembly_bcs.py: build the full tentative-velocity system
(matrix with BC rows + RHS with BC values) under both assembly strategies
(low_memory action vs preassembled matvec), verify they agree (the
reference raises on mismatch, assembly_bcs.py:224-234), and time them.
"""

import argparse
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from oasisx_tpu import DirichletBC, FractionalStep_AB_CN, LocatorMethod
from oasisx_tpu.meshes import create_unit_cube, create_unit_square, meshtags


def build(mesh, deg, low_memory):
    facets = mesh.exterior_facet_indices()
    tags = meshtags(mesh, mesh.dim - 1, facets, np.full_like(facets, 1))
    bcs_u = [
        [DirichletBC(0.5, LocatorMethod.TOPOLOGICAL, (tags, 1))] for _ in range(mesh.dim)
    ]
    solver = FractionalStep_AB_CN(
        mesh,
        ("Lagrange", deg),
        ("Lagrange", 1),
        bcs_u=bcs_u,
        bcs_p=[],
        options={"low_memory_version": low_memory},
    )
    rng = np.random.RandomState(0)
    for f in solver._u1 + solver._u2:
        f.x.array[:] = rng.randn(f.x.array.shape[0]) * 0.1
    solver._ps.x.array[:] = rng.randn(solver._ps.x.array.shape[0])
    return solver


def run_strategy(solver, dt, nu, repeats):
    ts = []
    for _ in range(repeats):
        t0 = time.perf_counter()
        solver.assemble_first(dt, nu)
        solver.velocity_tentative_assemble()
        ts.append(time.perf_counter() - t0)
    A = solver.tentative_matrix_dense() if solver._Vi[0][0].num_dofs < 20000 else None
    rhs = np.stack([f.x.array for f in solver._rhs1])
    return ts, A, rhs


def main(argv=None):
    parser = argparse.ArgumentParser(formatter_class=argparse.ArgumentDefaultsHelpFormatter)
    parser.add_argument("--dim", type=int, default=3, choices=(2, 3))
    parser.add_argument("-n", type=int, default=10)
    parser.add_argument("--max-degree", type=int, default=3)
    parser.add_argument("--repeats", type=int, default=3)
    parser.add_argument("--outfile", default=None,
                        help="basename for CSV + swarm-plot outputs")
    args = parser.parse_args(argv)
    dt, nu = 0.05, 0.01

    import jax

    mesh = create_unit_cube(args.n) if args.dim == 3 else create_unit_square(3 * args.n)
    ndev = len(jax.devices())
    results, j = {}, 0
    print(f"{'P':>3} {'ndofs':>9} {'action [ms]':>12} {'matvec [ms]':>12} {'max|dRHS|':>10}")
    for deg in range(1, args.max_degree + 1):
        rng_state = np.random.RandomState(0)
        s_lm = build(mesh, deg, low_memory=True)
        s_mv = build(mesh, deg, low_memory=False)
        ts_lm, A_lm, rhs_lm = run_strategy(s_lm, dt, nu, args.repeats)
        ts_mv, A_mv, rhs_mv = run_strategy(s_mv, dt, nu, args.repeats)
        err = np.abs(rhs_lm - rhs_mv).max()
        # tolerance scales with the COMPUTE dtype (Function.x.array is
        # f64 host storage even for f32 device runs): 1e-14-level in f64
        # (the reference's gate), roundoff-level in f32 TPU runs
        rtol = 5e3 * np.finfo(np.dtype(s_lm._dtype)).eps
        if err > rtol * max(1.0, np.abs(rhs_lm).max()):
            raise RuntimeError(f"RHS mismatch between strategies: {err}")
        if A_lm is not None and np.abs(A_lm - A_mv).max() > rtol * np.abs(A_lm).max():
            raise RuntimeError("matrix mismatch between strategies")
        ndofs = s_lm._Vi[0][0].num_dofs
        print(
            f"{deg:>3} {ndofs:>9} {min(ts_lm)*1e3:>12.2f} "
            f"{min(ts_mv)*1e3:>12.2f} {err:>10.2e}"
        )
        for method, ts in (("action", ts_lm), ("matvec", ts_mv)):
            for t in ts:
                results[j] = {
                    "P": deg, "num_dofs": ndofs, "method": method,
                    "time (s)": t, "procs": ndev,
                }
                j += 1
    # statistical reporting at the reference's depth (mean/std over
    # repeats, optional CSV + swarm plot — assembly_strategies.report)
    sys.path.insert(0, str(Path(__file__).resolve().parent))
    from assembly_strategies import report

    report(results, args.outfile)


if __name__ == "__main__":
    main()
