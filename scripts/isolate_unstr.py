"""Bisect the TPU worker crash on the unstructured (vessel-deformed box)
bench config: ascending sizes x kernel-family toggles, short runs.

Usage: python scripts/isolate_unstr.py N [pallas]
  pallas: "on" (default) | "off" | "noamg"
Prints one JSON line with the result; run each probe in its own process
so a worker crash doesn't poison the next probe.
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_comp_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import bench


def main():
    N = int(sys.argv[1]) if len(sys.argv) > 1 else 16
    mode = sys.argv[2] if len(sys.argv) > 2 else "on"
    t0 = time.time()
    if mode == "off":
        os.environ["BENCH_OPTIONS"] = '{"pallas": false}'
    elif mode == "noamg":
        os.environ["BENCH_PRESSURE_PC"] = "cheb"
    solver = bench.build_solver(N, dtype=np.float32, mode="unstructured")
    rep = solver.config_report()
    print("config:", json.dumps(rep), file=sys.stderr)
    stats = solver.run(10, 2e-3, 1.0 / 1600.0, max_iter=1)
    ok = bool(np.isfinite(solver._u[0].x.array).all())
    out = {
        "N": N,
        "mode": mode,
        "ok": ok,
        "u_iters": np.asarray(stats["u_iters"]).mean().item(),
        "p_iters": np.asarray(stats["p_iters"]).mean().item(),
        "wall_s": round(time.time() - t0, 1),
        "config": {k: v for k, v in rep.items() if k in ("pressure_pc", "pallas")},
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
