"""Per-phase TPU timing of the IPCS step at the bench config via the
eager split-phase API (each phase jitted+timed separately)."""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_comp_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import numpy as np
import jax.numpy as jnp
import bench

N = int(sys.argv[1]) if len(sys.argv) > 1 else 36
solver = bench.build_solver(N, dtype=np.float32)
dt, nu = 2e-3, 1.0/1600.0
print("pallas:", solver._pallas_bicgstab is not None, solver._pf_div is not None)

P = solver._params()
state = solver._state_from_functions()
bc_vals = solver._bc_value_arrays()
dt_ = jnp.float32(dt); nu_ = jnp.float32(nu)

# phase functions jitted separately
f_first = jax.jit(lambda P, u1, u2: solver._assemble_first_dev(P, u1, u2, dt_, nu_, []))
uab, A_lhs, b_first = f_first(P, state["u1"], state["u2"])
jax.block_until_ready(b_first); _ = np.asarray(b_first)  # real mode

f_rhs = jax.jit(lambda P, bf, ps: solver._tentative_assemble_dev(P, bf, ps))
rhs1 = f_rhs(P, b_first, state["p"])

f_solve = jax.jit(lambda P, A, r1, bc, u: solver._tentative_solve_dev(P, A, r1, bc, u))
u_new, diff, it_u, cv, _res = f_solve(P, A_lhs, rhs1, bc_vals, state["u"])

f_b2 = jax.jit(lambda P, u: solver._pressure_assemble_dev(P, u, dt_))
b2 = f_b2(P, u_new)

f_p = jax.jit(lambda P, b2, p, dp, u: solver._pressure_solve_dev(P, b2, p, dp, u, nu_))
dp, ps, it_p, cvp, _pres = f_p(P, b2, state["p"], state["dp"], u_new)

f_vu = jax.jit(lambda P, u, dp: solver._velocity_update_dev(P, u, dp, dt_))
u2_, it_c, cvc, _cres = f_vu(P, u_new, dp)
jax.block_until_ready(u2_)
print("iters: u", np.asarray(it_u), "p", int(it_p), "c", np.asarray(it_c))

def t(name, fn, *args, n=10):
    fn(*args); jax.block_until_ready(fn(*args))
    best = 1e9
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(n):
            out = fn(*args)
        jax.block_until_ready(out)
        best = min(best, (time.perf_counter()-t0)/n)
    print(f"{name:22s} {best*1e3:8.2f} ms")
    return best

tot = 0
tot += t("assemble_first", f_first, P, state["u1"], state["u2"])
tot += t("tentative_rhs", f_rhs, P, b_first, state["p"])
tot += t("tentative_solve", f_solve, P, A_lhs, rhs1, bc_vals, state["u"])
tot += t("pressure_assemble", f_b2, P, u_new)
tot += t("pressure_solve", f_p, P, b2, state["p"], state["dp"], u_new)
tot += t("velocity_update", f_vu, P, u_new, dp)
print(f"{'TOTAL (sum)':22s} {tot*1e3:8.2f} ms")
