"""TPU numerical equivalence: the Pallas/structured hot path vs the
general element path on the same 3D Taylor-Green problem (f32, real TPU).
The CPU test suite cannot exercise the kernels (interpret mode only
covers kernel units); this is the end-to-end gate for the fused step.

Usage: python scripts/tpu_equiv.py [N] [steps]
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_comp_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import numpy as np

import bench

N = int(sys.argv[1]) if len(sys.argv) > 1 else 12
steps = int(sys.argv[2]) if len(sys.argv) > 2 else 5
dt, nu = 2e-3, 1.0 / 1600.0

ref = bench.build_solver(N, dtype=np.float32)
ref._build_pallas({"pallas": False})  # force XLA paths
assert ref._pallas_bicgstab is None and ref._pf_div is None
ref._build_step()

sol = bench.build_solver(N, dtype=np.float32)
assert sol._pallas_bicgstab is not None, "fused bicgstab not active"
assert sol._pf_div is not None and sol._pf_cg_mass is not None

for s in (ref, sol):
    s.run(steps, dt, nu, max_iter=1)

for i in range(3):
    a = ref._u[i].x.array
    b = sol._u[i].x.array
    scale = max(1.0, np.abs(a).max())
    print(f"u{i}: max|diff| = {np.abs(a - b).max():.3e} (scale {scale:.3f})")
pa, pb = ref._p.x.array, sol._p.x.array
print(f"p : max|diff| = {np.abs(pa - pb).max():.3e} (scale {np.abs(pa).max():.3f})")
print("ref stats:", {k: np.asarray(v).tolist() for k, v in ref.last_stats.items() if 'iters' in k})
print("sol stats:", {k: np.asarray(v).tolist() for k, v in sol.last_stats.items() if 'iters' in k})
err = max(np.abs(ref._u[i].x.array - sol._u[i].x.array).max() for i in range(3))
ok = err < 5e-4 and np.isfinite(b).all()
print("EQUIV", "PASS" if ok else "FAIL", err)
