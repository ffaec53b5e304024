"""Steady-state marginal cost of each IPCS phase at bench scale.

Unlike profile_phases.py (first-step, cold iteration counts), this reaches
the steady-state regime first (AB2 warm starts -> ~1 tentative iter) via
run(), then times k=1 vs k=3 independent applications of each device-phase
function inside ONE jit and reports the slope — the per-application device
cost with the relay dispatch overhead removed.  The slopes should add up
to ~the measured per-step time of run(); whatever is missing is glue.
"""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_comp_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import numpy as np
import jax.numpy as jnp
import bench

N = int(sys.argv[1]) if len(sys.argv) > 1 else 36
STEPS = int(os.environ.get("PROF_STEPS", 25))
solver = bench.build_solver(N, dtype=np.float32)
dt, nu = 2e-3, 1.0 / 1600.0
dt_, nu_ = jnp.float32(dt), jnp.float32(nu)

# reach steady state (device-resident), and time the full step honestly
solver.run(STEPS, dt, nu, max_iter=1)
t0 = time.perf_counter()
stats = solver.run(STEPS, dt, nu, max_iter=1)
step_ms = (time.perf_counter() - t0) / STEPS * 1e3
print(f"run() steady state: {step_ms:.3f} ms/step  "
      f"u_iters {np.mean(stats['u_iters']):.2f} p {np.mean(stats['p_iters']):.2f} "
      f"c {np.mean(stats['c_iters']):.2f}")

P = solver._params()
state = solver._state_from_functions()
bc_vals = solver._bc_value_arrays()
u1, u2, u, p, dp = (state[k] for k in ("u1", "u2", "u", "p", "dp"))

uab, A_lhs, b_first = jax.jit(
    lambda P, a, b: solver._assemble_first_dev(P, a, b, dt_, nu_, [])
)(P, u1, u2)
rhs1 = jax.jit(lambda P, bf, ps: solver._tentative_assemble_dev(P, bf, ps))(
    P, b_first, p
)
u_new, _, it_u, _ = jax.jit(
    lambda P, A, r1, bc, u: solver._tentative_solve_dev(P, A, r1, bc, u)
)(P, A_lhs, rhs1, bc_vals, u)
b2 = jax.jit(lambda P, u: solver._pressure_assemble_dev(P, u, dt_))(P, u_new)
dp_new, ps, it_p, _ = jax.jit(
    lambda P, b2, p, dp, u: solver._pressure_solve_dev(P, b2, p, dp, u, nu_)
)(P, b2, p, dp, u_new)
_, it_c, _ = jax.jit(
    lambda P, u, dp: solver._velocity_update_dev(P, u, dp, dt_)
)(P, u_new, dp_new)
print("steady-state standalone iters: u", np.asarray(it_u),
      "p", int(it_p), "c", np.asarray(it_c))


def chain(fn, k):
    def run(x):
        acc = None
        for i in range(k):
            y = fn(x * (1.0 + 1e-6 * i))
            acc = y if acc is None else acc + y
        return acc
    return jax.jit(run)


def slope(name, fn, x, n=10):
    f1, f3 = chain(fn, 1), chain(fn, 3)
    for f in (f1, f3):
        jax.block_until_ready(f(x))
    def best(f):
        b = 1e9
        for _ in range(3):
            t0 = time.perf_counter()
            for _ in range(n):
                out = f(x)
            jax.block_until_ready(out)
            b = min(b, (time.perf_counter() - t0) / n)
        return b
    t1, t3 = best(f1), best(f3)
    print(f"{name:20s} marginal {1e3*(t3-t1)/2:7.3f} ms   "
          f"(1x {1e3*t1:7.3f}  3x {1e3*t3:7.3f})")
    return (t3 - t1) / 2


tot = 0.0
tot += slope("assemble_first",
             lambda x: solver._assemble_first_dev(P, x, u2, dt_, nu_, [])[2], u1)
tot += slope("tentative_rhs",
             lambda x: solver._tentative_assemble_dev(P, x, p), b_first)
tot += slope("tentative_solve",
             lambda x: solver._tentative_solve_dev(P, A_lhs, rhs1, bc_vals, x)[0], u)
tot += slope("pressure_assemble",
             lambda x: solver._pressure_assemble_dev(P, x, dt_), u_new)
tot += slope("pressure_solve",
             lambda x: solver._pressure_solve_dev(P, x, p, dp, u_new, nu_)[0], b2)
tot += slope("velocity_update",
             lambda x: solver._velocity_update_dev(P, x, dp_new, dt_)[0], u_new)
print(f"{'sum of marginals':20s} {tot*1e3:8.3f} ms   vs run() {step_ms:.3f} ms/step")
