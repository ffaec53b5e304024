"""Root-cause probe for the run()-window worker crashes (VERDICT r4 #8).

Hypothesis: the relay/worker kills any SINGLE device execution past some
duration (~2 min) regardless of code path — the band-ELL cylinder at
1000-step windows (~150 s) crashed while 500-step windows (~75 s) ran
forever, and the unstructured N=36 XLA warmup (~25 steps x several
seconds) crashed with NO custom kernels in the program.

This probes the STRUCTURED N=36 path (12 ms/step steady state) with
increasing single-scan lengths and reports wall time + survival.

Usage: python scripts/exec_duration_probe.py STEPS
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
    steps = int(sys.argv[1]) if len(sys.argv) > 1 else 4000
    solver = bench.build_solver(36, dtype=np.float32)
    # disable the auto window bound: ONE scan of `steps`
    solver._scan_window_opt = None
    solver.run(25, 2e-3, 1.0 / 1600.0, max_iter=1)  # warmup/compile small
    t0 = time.time()
    solver.run(steps, 2e-3, 1.0 / 1600.0, max_iter=1)
    ok = bool(np.isfinite(solver._u[0].x.array).all())
    wall = time.time() - t0
    print(json.dumps({"steps": steps, "ok": ok, "wall_s": round(wall, 1),
                      "ms_per_step": round(1e3 * wall / steps, 1)}))


if __name__ == "__main__":
    main()
