"""Marginal (dispatch-free) cost of each assemble_first sub-phase:
time k applications chained inside ONE jit for k=1,3 and report the
slope — removes the per-call relay dispatch that pollutes the naive
micro-timings in profile_first.py."""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_comp_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import numpy as np
import jax.numpy as jnp
import bench
from oasisx_tpu.assembly import pallas_ops as po

N = int(sys.argv[1]) if len(sys.argv) > 1 else 36
solver = bench.build_solver(N, dtype=np.float32)
dt, nu = 2e-3, 1.0 / 1600.0

P = solver._params()
state = solver._state_from_functions()
u1, u2 = state["u1"], state["u2"]
cu_ = P["cu"]
nl = cu_.M_c.shape[0]
sm_v = solver._ctx.sv
d = u1.shape[0]
dt_, nu_ = jnp.float32(dt), jnp.float32(nu)
A0_lhs = (1.0 / dt) * np.asarray(cu_.M_c) + 0.5 * nu * np.asarray(cu_.K_c)

U = jax.jit(lambda u: solver._pallas_gather(u).reshape(d, nl, -1))(u1)
Wc = jax.jit(
    lambda U: jnp.einsum("tw,tc->wc", solver._pallas_T, U.reshape(d * nl, -1),
                         precision=jax.lax.Precision.HIGHEST))(U)
W = jax.jit(lambda Wc: (jnp.asarray(A0_lhs).reshape(-1, 1) + 0.5 * Wc).reshape(nl, nl, -1))(Wc)
W_win = jax.jit(lambda W: po.build_w_win(W, sm_v))(W)
u1_pf = po.to_planeflat(u1, sm_v)

def chain(fn, k):
    """Apply fn k times with different scalings (defeats CSE)."""
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
    print(f"{name:18s} marginal {1e3*(t3-t1)/2:7.3f} ms   (1x {1e3*t1:7.3f}  3x {1e3*t3:7.3f})")

slope("gather", lambda u: solver._pallas_gather(u).reshape(d, nl, -1), u1)
slope("Wc einsum", lambda U: jnp.einsum("tw,tc->wc", solver._pallas_T,
      U.reshape(d * nl, -1), precision=jax.lax.Precision.HIGHEST), U)
slope("combine+win", lambda Wc: po.build_w_win(
      (jnp.asarray(A0_lhs).reshape(-1, 1) + 0.5 * Wc).reshape(nl, nl, -1), sm_v), Wc)
slope("win only", lambda W: po.build_w_win(W, sm_v), W)
slope("uq einsum", lambda U: jnp.einsum("qm,gmc->gqc", cu_.Phi, U), U)
slope("mass_mv kernel", lambda x: solver._pf_mass_mv(x), u1_pf)
slope("matvec_win", lambda x: solver._pf_matvec_win(W_win, x), u1_pf)
slope("rhs(W) kernel", lambda u: solver._pallas_rhs(W, u, 2.0 / dt_), u1)
