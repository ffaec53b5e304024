"""Matrix-free Krylov solvers in pure XLA (jit/while_loop).

The TPU-native replacement for PETSc KSP/PC (+MUMPS) — SURVEY §2b. The
reference's test/demo configs use ``preonly + lu`` (exact factorization,
src/oasisx/fracstep.py:564-571); here those map to tight-tolerance Krylov
(SURVEY §4 'implication for the rebuild'): CG for SPD operators (pressure
Poisson, mass), BiCGStab for the nonsymmetric tentative-velocity operator.

Singular pressure-Poisson handling (no outlet BC): the constant nullspace
is projected out of the RHS and the solution mean is removed — mirroring
``NullSpace.remove`` + the explicit mean shift (fracstep.py:573-591).

All solvers return (x, iters, final residual norm); convergence status is
surfaced as a value from jitted code (SURVEY §5 failure-detection note).
"""

from __future__ import annotations

import logging
from typing import Callable, NamedTuple

import numpy as np

import jax
import jax.numpy as jnp

logger = logging.getLogger("oasisx_tpu")


class KrylovResult(NamedTuple):
    x: jax.Array
    iters: jax.Array  # int32
    resnorm: jax.Array  # final residual 2-norm
    converged: jax.Array  # bool
    # PETSc-style converged reason: 2 = CONVERGED_RTOL, -3 = DIVERGED_MAX_IT,
    # -5 = DIVERGED_BREAKDOWN (zero pAp / rho / omega encountered)
    reason: jax.Array = None  # int32


def _reason(converged, breakdown):
    return jnp.where(
        converged, jnp.int32(2), jnp.where(breakdown, jnp.int32(-5), jnp.int32(-3))
    )


def _identity(x):
    return x


def _make_reducers(axis):
    """(vdot, norm) that psum across a shard_map axis when given — the
    owned-dof sharded path keeps halo slots zeroed, so local dots over the
    full local arrays + a scalar psum give the global reductions
    (SURVEY L0: the Krylov-internal allreduces of the reference)."""
    if axis is None:
        return jnp.vdot, jnp.linalg.norm
    def vdot(a, b):
        return jax.lax.psum(jnp.vdot(a, b), axis)
    def norm(v):
        return jnp.sqrt(jax.lax.psum(jnp.sum(v * v), axis))
    return vdot, norm


_warned_rtol_clamps: set = set()


def _effective_rtol(rtol: float, dtype) -> float:
    """Clamp the relative tolerance to what the dtype can reach. Asking
    float32 for 1e-13 (the 'preonly+lu' mapping) otherwise drives the
    iteration to maxiter and lets BiCGStab break down. Logs once per
    (rtol, dtype) when the user's tolerance is raised by the floor so the
    change is visible (ADVICE r1)."""
    import logging

    import numpy as _np

    floor = 50.0 * float(_np.finfo(_np.dtype(dtype)).eps)
    if float(rtol) < floor:
        key = (float(rtol), _np.dtype(dtype).name)
        if key not in _warned_rtol_clamps:
            _warned_rtol_clamps.add(key)
            logging.getLogger("oasisx_tpu").info(
                "ksp_rtol %.3g below the %s accuracy floor; using %.3g "
                "(run in float64 for tighter tolerances)",
                float(rtol),
                _np.dtype(dtype).name,
                floor,
            )
        return floor
    return float(rtol)


def cg(
    A: Callable,
    b: jax.Array,
    x0: jax.Array | None = None,
    M: Callable | None = None,
    rtol: float = 1e-10,
    atol: float = 1e-50,
    maxiter: int = 1000,
    project_nullspace: bool = False,
    nullvec: jax.Array | None = None,
    axis: str | None = None,
) -> KrylovResult:
    """Preconditioned conjugate gradients for SPD operators.

    If ``project_nullspace`` the constant vector is removed from b, every
    iterate update, and the final solution (singular Neumann Poisson).
    ``nullvec`` overrides the nullspace basis vector (default: the constant
    vector) — used e.g. when the dof layout carries padding entries that
    must stay outside the projection (assembly/structured.py).
    """
    M = M or _identity
    x0 = jnp.zeros_like(b) if x0 is None else x0
    rtol = _effective_rtol(rtol, b.dtype)
    _vdot, _norm = _make_reducers(axis)

    if nullvec is not None:
        _ee = _vdot(nullvec, nullvec)

    def demean(v):
        if not project_nullspace:
            return v
        if nullvec is not None:
            return v - (_vdot(nullvec, v) / _ee) * nullvec
        if axis is None:
            return v - jnp.mean(v)
        tot = jax.lax.psum(jnp.sum(v), axis)
        cnt = jax.lax.psum(jnp.asarray(v.size, v.dtype), axis)
        return v - tot / cnt

    b = demean(b)
    bnorm = _norm(b)
    tol = jnp.maximum(rtol * bnorm, atol)

    r = demean(b - A(x0))
    z = M(r)
    p = z
    rz = _vdot(r, z)
    rnorm = _norm(r)

    def cond(state):
        x, r, z, p, rz, k, rnorm, brk = state
        return (rnorm > tol) & (k < maxiter) & jnp.logical_not(brk)

    def body(state):
        x, r, z, p, rz, k, rnorm, brk = state
        Ap = demean(A(p))
        pAp = _vdot(p, Ap)
        brk = brk | (pAp == 0)
        alpha = rz / jnp.where(pAp != 0, pAp, 1.0)
        x = x + alpha * p
        r = r - alpha * Ap
        z = M(r)
        rz_new = _vdot(r, z)
        brk = brk | (rz == 0)
        beta = rz_new / jnp.where(rz != 0, rz, 1.0)
        p = z + beta * p
        return (x, r, z, p, rz_new, k + 1, _norm(r), brk)

    x, r, z, p, rz, k, rnorm, brk = jax.lax.while_loop(
        cond, body, (x0, r, z, p, rz, jnp.int32(0), rnorm, jnp.asarray(False))
    )
    x = demean(x) if project_nullspace else x
    conv = rnorm <= tol
    return KrylovResult(x, k, rnorm, conv, _reason(conv, brk))


def bicgstab(
    A: Callable,
    b: jax.Array,
    x0: jax.Array | None = None,
    M: Callable | None = None,
    rtol: float = 1e-10,
    atol: float = 1e-50,
    maxiter: int = 1000,
    axis: str | None = None,
) -> KrylovResult:
    """Preconditioned BiCGStab for nonsymmetric operators (tentative
    velocity: convection makes A nonsymmetric, fracstep.py:435-442)."""
    M = M or _identity
    x0 = jnp.zeros_like(b) if x0 is None else x0
    rtol = _effective_rtol(rtol, b.dtype)
    _vdot, _norm = _make_reducers(axis)
    bnorm = _norm(b)
    tol = jnp.maximum(rtol * bnorm, atol)

    r = b - A(x0)
    rhat0 = r
    rho0 = _vdot(rhat0, r)
    p0 = r
    rnorm = _norm(r)

    def cond(state):
        x, r, p, rho, rhat, restarted, k, rnorm, brk = state
        return (rnorm > tol) & (k < maxiter) & jnp.logical_not(brk)

    def body(state):
        x, r, p, rho, rhat, restarted, k, rnorm, brk = state
        # Lanczos breakdown (rho = <rhat, r> = 0 with r != 0): restart with
        # rhat = r (standard BiCGStab restart); flag DIVERGED_BREAKDOWN only
        # if the restart does not help either
        need_restart = rho == 0
        brk = brk | (need_restart & restarted)
        rhat = jnp.where(need_restart, r, rhat)
        rho = jnp.where(need_restart, _vdot(r, r), rho)
        p = jnp.where(need_restart, r, p)
        restarted = need_restart
        phat = M(p)
        v = A(phat)
        rv = _vdot(rhat, v)
        brk = brk | (rv == 0) | (rho == 0)
        alpha = rho / jnp.where(rv != 0, rv, 1.0)
        s = r - alpha * v
        # half-step convergence: if ||s|| is already below tol, finish with
        # the alpha update only (tt would legitimately be ~0 here — that is
        # convergence, not breakdown)
        half = _norm(s) <= tol
        shat = M(s)
        t = A(shat)
        tt = _vdot(t, t)
        brk = brk | (jnp.logical_not(half) & (tt == 0))
        omega = jnp.where(half, 0.0, _vdot(t, s) / jnp.where(tt != 0, tt, 1.0))
        x = x + alpha * phat + omega * shat
        r = jnp.where(half, s, s - omega * t)
        rho_new = _vdot(rhat, r)
        brk = brk | (jnp.logical_not(half) & (omega == 0))
        beta = (rho_new / jnp.where(rho != 0, rho, 1.0)) * (
            alpha / jnp.where(omega != 0, omega, 1.0)
        )
        p = r + beta * (p - omega * v)
        return (x, r, p, rho_new, rhat, restarted, k + 1, _norm(r), brk)

    x, r, p, rho, rhat, restarted, k, rnorm, brk = jax.lax.while_loop(
        cond,
        body,
        (x0, r, p0, rho0, rhat0, jnp.asarray(False), jnp.int32(0), rnorm,
         jnp.asarray(False)),
    )
    conv = rnorm <= tol
    return KrylovResult(x, k, rnorm, conv, _reason(conv, brk))


def jacobi_preconditioner(diag: jax.Array) -> Callable:
    inv = jnp.where(diag != 0, 1.0 / jnp.where(diag != 0, diag, 1.0), 1.0)
    return lambda r: inv * r


# ---------------------------------------------------------------------------
# batched variants: solve k independent systems sharing one operator, with
# per-row convergence. On the TPU relay backend every XLA op pays a fixed
# dispatch cost, so folding the d velocity-component solves into one batched
# iteration (matvecs/dots on (k, n) arrays) cuts the per-step op count ~d-x;
# converged rows are frozen by masking so extra iterations cannot corrupt
# them (BiCGStab breakdown on a fully-converged row would otherwise NaN).
# ---------------------------------------------------------------------------


def _row_norm(v, axis=None):
    s2 = jnp.sum(v * v, axis=-1, keepdims=True)
    if axis is not None:
        s2 = jax.lax.psum(s2, axis)
    return jnp.sqrt(s2)


def _row_dot(a, b, axis=None):
    s2 = jnp.sum(a * b, axis=-1, keepdims=True)
    if axis is not None:
        s2 = jax.lax.psum(s2, axis)
    return s2


def cg_batched(
    A: Callable,
    b: jax.Array,
    x0: jax.Array | None = None,
    M: Callable | None = None,
    rtol: float = 1e-10,
    atol: float = 1e-50,
    maxiter: int = 1000,
    axis: str | None = None,
) -> KrylovResult:
    """Preconditioned CG on k systems at once: b, x0 of shape (k, n)."""
    M = M or _identity
    x0 = jnp.zeros_like(b) if x0 is None else x0
    rtol = _effective_rtol(rtol, b.dtype)
    tol = jnp.maximum(rtol * _row_norm(b, axis), atol)

    r = b - A(x0)
    z = M(r)
    p = z
    rz = _row_dot(r, z, axis)
    rnorm = _row_norm(r, axis)

    def cond(state):
        x, r, z, p, rz, k, rnorm, iters = state
        return jnp.any(rnorm > tol) & (k < maxiter)

    def body(state):
        x, r, z, p, rz, k, rnorm, iters = state
        active = rnorm > tol
        Ap = A(p)
        pAp = _row_dot(p, Ap, axis)
        alpha = jnp.where(active, rz / jnp.where(pAp != 0, pAp, 1.0), 0.0)
        x = x + alpha * p
        r = r - alpha * Ap
        z = M(r)
        rz_new = jnp.where(active, _row_dot(r, z, axis), rz)
        beta = jnp.where(active, rz_new / jnp.where(rz != 0, rz, 1.0), 0.0)
        p = jnp.where(active, z + beta * p, p)
        iters = iters + active[..., 0].astype(jnp.int32)
        return (x, r, z, p, rz_new, k + 1, _row_norm(r, axis), iters)

    iters0 = jnp.zeros(b.shape[0], jnp.int32)
    x, r, z, p, rz, k, rnorm, iters = jax.lax.while_loop(
        cond, body, (x0, r, z, p, rz, jnp.int32(0), rnorm, iters0)
    )
    return KrylovResult(x, iters, rnorm[..., 0], rnorm[..., 0] <= tol[..., 0])


def bicgstab_batched(
    A: Callable,
    b: jax.Array,
    x0: jax.Array | None = None,
    M: Callable | None = None,
    rtol: float = 1e-10,
    atol: float = 1e-50,
    maxiter: int = 1000,
    axis: str | None = None,
) -> KrylovResult:
    """Preconditioned BiCGStab on k systems at once: b, x0 of shape (k, n)."""
    M = M or _identity
    x0 = jnp.zeros_like(b) if x0 is None else x0
    rtol = _effective_rtol(rtol, b.dtype)
    tol = jnp.maximum(rtol * _row_norm(b, axis), atol)

    r = b - A(x0)
    rhat = r
    rho = _row_dot(rhat, r, axis)
    p = r
    rnorm = _row_norm(r, axis)

    def cond(state):
        x, r, p, rho, k, rnorm, iters = state
        return jnp.any(rnorm > tol) & (k < maxiter)

    def body(state):
        x, r, p, rho, k, rnorm, iters = state
        active = rnorm > tol
        phat = M(p)
        v = A(phat)
        rv = _row_dot(rhat, v, axis)
        alpha = rho / jnp.where(rv != 0, rv, 1.0)
        s = r - alpha * v
        shat = M(s)
        t = A(shat)
        tt = _row_dot(t, t, axis)
        omega = _row_dot(t, s, axis) / jnp.where(tt != 0, tt, 1.0)
        dx = alpha * phat + omega * shat
        x = x + jnp.where(active, dx, 0.0)
        r_new = s - omega * t
        r = jnp.where(active, r_new, r)
        rho_new = jnp.where(active, _row_dot(rhat, r, axis), rho)
        beta = (rho_new / jnp.where(rho != 0, rho, 1.0)) * (
            alpha / jnp.where(omega != 0, omega, 1.0)
        )
        p = jnp.where(active, r + beta * (p - omega * v), p)
        iters = iters + active[..., 0].astype(jnp.int32)
        return (x, r, p, rho_new, k + 1, _row_norm(r, axis), iters)

    iters0 = jnp.zeros(b.shape[0], jnp.int32)
    x, r, p, rho, k, rnorm, iters = jax.lax.while_loop(
        cond, body, (x0, r, p, rho, jnp.int32(0), rnorm, iters0)
    )
    return KrylovResult(x, iters, rnorm[..., 0], rnorm[..., 0] <= tol[..., 0])


def chebyshev_preconditioner(
    matvec: Callable,
    inv_diag: jax.Array,
    lmin: float,
    lmax: float,
    degree: int = 8,
) -> Callable:
    """Chebyshev acceleration of Jacobi as an SPD preconditioner.

    Standard three-term recurrence (Saad, Iterative Methods, alg. 12.1)
    on the Jacobi-preconditioned operator with eigenvalue bounds
    [lmin, lmax] (estimate lmax by power iteration; lmin = lmax/30 is the
    usual smoother convention). Fixed degree => a fixed linear SPD
    operator, valid inside CG. The TPU-native substitute for the
    reference's MUMPS LU on unstructured / outlet-BC pressure systems
    (/root/reference/src/oasisx/fracstep.py:564-571, VERDICT r1 item 5).
    """
    theta = 0.5 * (lmax + lmin)
    delta = 0.5 * (lmax - lmin)
    sigma1 = theta / delta

    def M(r):
        rho = 1.0 / sigma1
        d = (inv_diag * r) / theta
        z = d
        for _ in range(degree - 1):
            rho_new = 1.0 / (2.0 * sigma1 - rho)
            resid = r - matvec(z)
            d = rho_new * rho * d + (2.0 * rho_new / delta) * (inv_diag * resid)
            z = z + d
            rho = rho_new
        return z

    return M


def estimate_lmax(
    matvec: Callable,
    inv_diag: jax.Array,
    iters: int = 60,
    seed: int = 0,
    tol: float = 1e-3,
):
    """Residual-guarded power iteration for the largest eigenvalue of
    D^-1 A (host-driven, setup-time).

    An UNDERestimated lmax makes the Chebyshev recurrence diverge
    (VERDICT r3 #8), so instead of a fixed iteration count with a blind
    1.05 margin this (a) iterates until the Rayleigh quotient stabilizes
    to ``tol`` (capped at ``iters``) and (b) pads the estimate by the
    measured Rayleigh residual ||D^-1 A v - lam v||, which covers the
    remaining eigenvector error."""
    key = jax.random.PRNGKey(seed)
    v = jax.random.normal(key, inv_diag.shape, dtype=inv_diag.dtype)
    v = v / jnp.linalg.norm(v)
    mv = jax.jit(lambda x: inv_diag * matvec(x))
    lam_prev = 0.0
    for k in range(iters):
        w = mv(v)
        nw = float(jnp.linalg.norm(w))
        if nw == 0:
            return 1.05
        lam = float(jnp.vdot(v, w))
        v = w / nw
        if k >= 4 and abs(lam - lam_prev) <= tol * abs(lam):
            break
        lam_prev = lam
    w = mv(v)
    lam = float(jnp.vdot(v, w))
    resid = float(jnp.linalg.norm(w - lam * v))
    return (abs(lam) + resid) * 1.02


def validated_cheb_bounds(
    matvec: Callable,
    inv_diag: jax.Array,
    lmax: float,
    degree: int,
    tries: int = 5,
    seed: int = 1,
):
    """Divergence backstop for Chebyshev-Jacobi (VERDICT r3 #8): a
    polynomial built on an underestimated lmax AMPLIFIES the top of the
    spectrum exponentially instead of damping it. Apply the candidate
    preconditioner's error operator E = I - A M three times to a random
    (demeaned — the singular Neumann null component passes through E
    unchanged) vector; if ||E^3 r|| exceeds ||r||, double lmax and retry.
    Returns validated (lmin, lmax)."""
    key = jax.random.PRNGKey(seed)
    r0 = jax.random.normal(key, inv_diag.shape, dtype=inv_diag.dtype)
    r0 = r0 - jnp.mean(r0)
    rn = float(jnp.linalg.norm(r0))
    for _ in range(tries):
        M = chebyshev_preconditioner(matvec, inv_diag, lmax / 30.0, lmax, degree)
        E = jax.jit(lambda r: r - matvec(M(r)))
        r = r0
        for _ in range(3):
            r = E(r)
        en = float(jnp.linalg.norm(r))
        if np.isfinite(en) and en <= rn:
            return lmax / 30.0, lmax
        logger.warning(
            "chebyshev bounds rejected (||E^3 r||/||r|| = %.3g); doubling "
            "lmax %.3g -> %.3g", en / rn if rn else float("inf"), lmax, 2 * lmax
        )
        lmax *= 2.0
    return lmax / 30.0, lmax


def gmres(
    A: Callable,
    b: jax.Array,
    x0: jax.Array | None = None,
    M: Callable | None = None,
    rtol: float = 1e-10,
    atol: float = 1e-50,
    maxiter: int = 1000,
    restart: int = 30,
    axis: str | None = None,
) -> KrylovResult:
    """Restarted GMRES(m) for nonsymmetric operators (VERDICT r2 item 7;
    reference accepts any PETSc ksp_type, /root/reference/src/oasisx/ksp.py:55-61).

    Left-preconditioned (PETSc's GMRES default): the Arnoldi process runs
    on M A and the convergence test uses the preconditioned residual norm
    relative to ||M b|| — matching PETSc's default ``ksp_norm_type
    preconditioned``.  Modified Gram-Schmidt with Givens rotations; each
    cycle runs the full ``restart`` Arnoldi steps (converged/broken-down
    steps are masked no-ops) so the program is a fixed-shape lax loop nest.
    """
    M = M or _identity
    x0 = jnp.zeros_like(b) if x0 is None else x0
    rtol = _effective_rtol(rtol, b.dtype)
    _vdot, _norm = _make_reducers(axis)
    m = int(restart)
    n = b.shape[0]

    Mb = M(b)
    bnorm = _norm(Mb)
    tol = jnp.maximum(rtol * bnorm, atol)

    def cycle(x, it, nmv):
        r = M(b - A(x))
        beta = _norm(r)
        V0 = jnp.zeros((m + 1, n), b.dtype)
        V0 = V0.at[0].set(jnp.where(beta > 0, r / jnp.where(beta > 0, beta, 1.0), r))
        H0 = jnp.zeros((m + 1, m), b.dtype)
        cs0 = jnp.ones(m, b.dtype)
        sn0 = jnp.zeros(m, b.dtype)
        g0 = jnp.zeros(m + 1, b.dtype).at[0].set(beta)

        def arnoldi(j, carry):
            V, H, cs, sn, g, it, nmv, live = carry
            # live: this step still advances the solution (not converged,
            # no breakdown). Converged/broken steps leave state unchanged.
            w = M(A(V[j]))
            # modified Gram-Schmidt against rows 0..j (mask the rest)
            mask = (jnp.arange(m + 1) <= j)[:, None].astype(b.dtype)
            h = (V * mask) @ w if axis is None else jax.lax.psum((V * mask) @ w, axis)
            w = w - V.T @ (h * mask[:, 0])
            hj1 = _norm(w)
            ok = hj1 > 0
            V = V.at[j + 1].set(jnp.where(ok & live, w / jnp.where(ok, hj1, 1.0), 0.0))
            h = h.at[j + 1].set(jnp.where(ok, hj1, 0.0))
            # apply stored Givens rotations to the new column
            def rot(i, hcol):
                hi, hi1 = hcol[i], hcol[i + 1]
                return hcol.at[i].set(cs[i] * hi + sn[i] * hi1).at[i + 1].set(
                    -sn[i] * hi + cs[i] * hi1
                )
            h = jax.lax.fori_loop(0, j, rot, h)
            # new rotation annihilating h[j+1]
            denom = jnp.sqrt(h[j] ** 2 + h[j + 1] ** 2)
            c = jnp.where(denom > 0, h[j] / jnp.where(denom > 0, denom, 1.0), 1.0)
            s = jnp.where(denom > 0, h[j + 1] / jnp.where(denom > 0, denom, 1.0), 0.0)
            h = h.at[j].set(denom).at[j + 1].set(0.0)
            live_step = live & ok
            cs = cs.at[j].set(jnp.where(live_step, c, 1.0))
            sn = sn.at[j].set(jnp.where(live_step, s, 0.0))
            H = H.at[:, j].set(jnp.where(live_step, h, H[:, j].at[j].set(1.0)))
            gj = g[j]
            g = jnp.where(
                live_step, g.at[j].set(c * gj).at[j + 1].set(-s * gj), g
            )
            res = jnp.abs(g[j + 1])
            it = it + live.astype(jnp.int32)
            nmv = nmv + 1
            live = live_step & (res > tol) & (it < maxiter)
            return (V, H, cs, sn, g, it, nmv, live)

        V, H, cs, sn, g, it, nmv, live = jax.lax.fori_loop(
            0, m, arnoldi, (V0, H0, cs0, sn0, g0, it, nmv, beta > tol)
        )
        # back-substitution on the m x m upper-triangular H (dead columns
        # carry a unit diagonal and zero g, so they contribute nothing)
        def back(i_rev, y):
            i = m - 1 - i_rev
            hii = H[i, i]
            num = g[i] - H[i] @ y
            return y.at[i].set(num / jnp.where(hii != 0, hii, 1.0))
        y = jax.lax.fori_loop(0, m, back, jnp.zeros(m, b.dtype))
        x = x + V[:m].T @ y
        return x, it, nmv

    def cond(carry):
        x, it, nmv, rnorm = carry
        return (rnorm > tol) & (it < maxiter)

    def body(carry):
        x, it, nmv, _ = carry
        x, it, nmv = cycle(x, it, nmv)
        rnorm = _norm(M(b - A(x)))
        return (x, it, nmv, rnorm)

    r0n = _norm(M(b - A(x0)))
    x, it, nmv, rnorm = jax.lax.while_loop(
        cond, body, (x0, jnp.int32(0), jnp.int32(0), r0n)
    )
    conv = rnorm <= tol
    return KrylovResult(x, it, rnorm, conv, _reason(conv, jnp.asarray(False)))
