"""Isolate the sub-phases of _assemble_first_dev on the structured
fastpath (the biggest iteration-independent block of the step): gather,
convection contraction, W combine, windowed relayout, rhs kernels."""
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

f_gather = jax.jit(lambda u: solver._pallas_gather(1.5 * u1 - 0.5 * u2).reshape(d, nl, -1))
U = f_gather(u1)

f_wc = jax.jit(
    lambda U: jnp.einsum(
        "tw,tc->wc", solver._pallas_T, U.reshape(d * nl, -1),
        precision=jax.lax.Precision.HIGHEST,
    )
)
Wc = f_wc(U)

def w_combine(Wc):
    A0_lhs = (1.0 / dt_) * cu_.M_c + 0.5 * nu_ * cu_.K_c
    return (A0_lhs.reshape(-1, 1) + 0.5 * Wc).reshape(nl, nl, -1)

f_comb = jax.jit(w_combine)
W = f_comb(Wc)

f_win = jax.jit(lambda W: po.build_w_win(W, sm_v))
W_win = f_win(W)

f_uq = jax.jit(lambda U: jnp.einsum("qm,gmc->gqc", cu_.Phi, U))
uq = f_uq(U)

f_rhs = jax.jit(lambda W, u: solver._pallas_rhs(W, u, 2.0 / dt_) + P["b0"])
b = f_rhs(W, u1)

# fused from Wc onward (what XLA actually gets to fuse inside the step)
def tail(Wc, u1):
    W = w_combine(Wc)
    W_win = po.build_w_win(W, sm_v)
    b = solver._pallas_rhs(W, u1, 2.0 / dt_) + P["b0"]
    return W_win, b

f_tail = jax.jit(tail)

def t(name, fn, *args, n=20):
    out = fn(*args); jax.block_until_ready(out)
    best = 1e9
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(n):
            out = fn(*args)
        jax.block_until_ready(out)
        best = min(best, (time.perf_counter() - t0) / n)
    print(f"{name:18s} {best*1e3:8.3f} ms")
    return best

print(f"N={N} nl={nl} nc={W.shape[-1]} W bytes={W.size*4/1e6:.0f} MB")
tot = 0.0
tot += t("gather+AB2", f_gather, u1)
tot += t("Wc einsum", f_wc, U)
tot += t("W combine", f_comb, Wc)
tot += t("build_w_win", f_win, W)
tot += t("uq einsum", f_uq, U)
tot += t("rhs kernel", f_rhs, W, u1)
print(f"{'sum':18s} {tot*1e3:8.3f} ms")
t("tail fused", f_tail, Wc, u1)
