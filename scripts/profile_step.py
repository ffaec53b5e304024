"""Microbenchmark the IPCS step's device-side pieces at bench scale (N=36).

Times each jitted piece with block_until_ready, repeated inside one jit via
lax.scan-style repetition where possible to amortize dispatch (~25ms on the
axon relay). Prints a table.
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_comp_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from bench import build_solver

N = int(os.environ.get("PROF_N", 36))
REPS = int(os.environ.get("PROF_REPS", 20))


def timeit(name, fn, *args):
    """fn must be jitted; runs REPS times inside one dispatch via scan.
    The carry is threaded into the inputs (added to one float leaf) so XLA
    cannot hoist the body out of the loop."""

    @jax.jit
    def many(*a):
        def body(c, _):
            # perturb the first float leaf by the carry to defeat LICM
            leaves, treedef = jax.tree_util.tree_flatten(a)
            done = False
            out_leaves = []
            for leaf in leaves:
                if (
                    not done
                    and hasattr(leaf, "dtype")
                    and jnp.issubdtype(leaf.dtype, jnp.floating)
                ):
                    out_leaves.append(leaf + c.astype(leaf.dtype))
                    done = True
                else:
                    out_leaves.append(leaf)
            a2 = jax.tree_util.tree_unflatten(treedef, out_leaves)
            out = fn(*a2)
            leaf = jax.tree_util.tree_leaves(out)[0]
            s = jnp.sum(leaf.astype(jnp.float32))
            # keep carry tiny but data-dependent
            return jnp.where(jnp.isfinite(s), 0.0, 1e-30) * s, None

        c, _ = jax.lax.scan(body, jnp.float32(0), None, length=REPS)
        return c

    r = many(*args)
    r.block_until_ready()
    t0 = time.perf_counter()
    r = many(*args)
    r.block_until_ready()
    t1 = time.perf_counter()
    ms = (t1 - t0) / REPS * 1e3
    print(f"{name:45s} {ms:9.3f} ms")
    return ms


def main():
    solver = build_solver(N, dtype=np.float32)
    P = solver._params()
    ctx = P["ctx"]
    from oasisx_tpu.assembly import engine as eng

    nv = ctx.ndofs_v
    nq_ = ctx.ndofs_q
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (nv,), dtype=jnp.float32)
    xq = jax.random.normal(key, (nq_,), dtype=jnp.float32)
    u3 = jax.random.normal(key, (3, nv), dtype=jnp.float32)
    dt = jnp.float32(2e-3)
    nu = jnp.float32(1.0 / 1600.0)

    print(f"N={N} cells={ctx.detJ.shape[0]} ndofs_v={nv} ndofs_q={nq_}")

    # raw gather/scatter
    timeit("gather_v", jax.jit(eng.gather_v), ctx, x)
    timeit("scatter_v(gather_v)", jax.jit(lambda c, x: eng.scatter_v(c, eng.gather_v(c, x))), ctx, x)
    timeit("gather_q", jax.jit(eng.gather_q), ctx, xq)

    # operator matvecs (element-matrix path)
    timeit("matvec_v(M)", jax.jit(eng.matvec_v), ctx, P["M"], x)
    A = P["M"] + P["K"]
    timeit("matvec_v(M+K precombined)", jax.jit(eng.matvec_v), ctx, A, x)
    timeit("matvec_q(Ap)", jax.jit(eng.matvec_q), ctx, P["Ap"], xq)

    # convection assembly (the per-step element-stack build)
    timeit("convection_elems", jax.jit(eng.convection_elems), ctx, u3)

    # A_rhs combination (3 stacks streamed)
    def combine(Ms, Ks, u3):
        C = eng.convection_elems(ctx, u3)
        return -0.5 * C + (1.0 / dt) * Ms - 0.5 * nu * Ks

    timeit("A_rhs = aC+bM+cK (elems)", jax.jit(combine), P["M"], P["K"], u3)

    # direct vector assembly pieces
    timeit("pressure_gradient_vecs", jax.jit(eng.pressure_gradient_vecs), ctx, xq)
    timeit("divergence_vec", jax.jit(eng.divergence_vec), ctx, u3)
    timeit("grad_p_vecs", jax.jit(eng.grad_p_vecs), ctx, xq)

    # MG vcycle
    if solver._mg is not None:
        timeit("MG vcycle", jax.jit(solver._mg.vcycle), xq)

    # full per-phase pieces
    h_qvals = solver._h_qvals()
    timeit(
        "assemble_first_dev",
        jax.jit(lambda u1, u2: solver._assemble_first_dev(P, u1, u2, dt, nu, h_qvals)),
        u3,
        u3,
    )

    # one full pressure solve
    timeit(
        "pressure_solve_dev",
        jax.jit(lambda b2, p, dp: solver._pressure_solve_dev(P, b2, p, dp, u3, nu)[0]),
        xq,
        xq,
        xq,
    )

    # one tentative solve (3 comps)
    uab, A_lhs, b_first = solver._assemble_first_dev(P, u3, u3, dt, nu, h_qvals)
    bc_vals = solver._bc_value_arrays()
    timeit(
        "tentative_solve_dev (3 comps)",
        jax.jit(lambda A, r, u: solver._tentative_solve_dev(P, A, r, bc_vals, u)[0]),
        A_lhs,
        u3,
        u3,
    )

    timeit(
        "velocity_update_dev (3 comps)",
        jax.jit(lambda u, dp: solver._velocity_update_dev(P, u, dp, dt)[0]),
        u3,
        xq,
    )


if __name__ == "__main__":
    main()
