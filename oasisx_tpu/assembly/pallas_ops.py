"""Pallas TPU mega-kernels for the structured hot path.

Why kernels: on the TPU relay backend every XLA op in an executed program
pays a fixed dispatch/scheduling cost (~35-70 us measured), and the
structured slice formulation costs ~60-120 ops per operator application —
the round-2 traces show the device busy <15% of the wall clock.  A Pallas
kernel collapses an entire operator application (or an entire Krylov
solve) into ONE op with all state resident in VMEM.

Kernels:
- cube matvec: y = A x with a shared (nl x nl) cube matrix, the
  slice-accumulate form of assembly/cubes.py (exact f32: VPU multiplies,
  f32 accumulation; no bf16 rounding anywhere).
- pressure solve: the ENTIRE preconditioned-CG pressure Poisson solve
  (Chebyshev-Jacobi preconditioner, nullspace demeaning, convergence
  test) in one kernel — one op per solve instead of ~1500.

All kernels have interpret-mode paths so correctness tests run on CPU.
Reference semantics: PETSc KSP pressure solve
(/root/reference/src/oasisx/fracstep.py:553-605, ksp.py:71-78).
"""

from __future__ import annotations

import functools
from typing import Callable

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .structured import StructuredMap

# Mosaic's default scoped-VMEM budget is 16 MB; the chip has ~100+ MB of
# kernel-addressable VMEM (probed round 3).  Inside large programs XLA may
# place kernel operands in HBM, forcing VMEM staging copies onto the scoped
# stack — raise the ceiling for the big plane-flat kernels.
_BIG_VMEM = pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024)


def _slot_info(sm: StructuredMap):
    """Per cube-slot t: (channel index, base offset tuple). Channels are the
    parity-major leading axes of the grid layout."""
    _, cells, deg, _, _ = sm
    d = len(cells)
    nl_side = deg + 1
    out = []
    for t_flat in range(nl_side**d):
        t = np.unravel_index(t_flat, (nl_side,) * d)
        par = tuple(int(tk % deg) for tk in t)
        base = tuple(int(tk // deg) for tk in t)
        ch = int(np.ravel_multi_index(par, (deg,) * d))
        out.append((ch, base))
    return out


def _grid_shape(sm: StructuredMap):
    _, cells, deg, _, _ = sm
    d = len(cells)
    return (deg**d,) + tuple(c + 1 for c in cells)


def _matvec_body(x_ref, acc_ref, C, sm, batch_idx=None):
    """acc += A x in slice-accumulate form. ``C`` is a host numpy (nl, nl)
    matrix baked into the kernel; x_ref/acc_ref are grid-shaped VMEM refs
    (optionally with a leading batch axis indexed by ``batch_idx``)."""
    slots = _slot_info(sm)
    _, cells, _, _, _ = sm
    d = len(cells)
    nl = len(slots)

    def sl(base):
        return tuple(slice(base[k], base[k] + cells[k]) for k in range(d))

    for to in range(nl):
        cho, bo = slots[to]
        tmp = None
        for ti in range(nl):
            c = float(C[to, ti])
            if c == 0.0:
                continue
            chi, bi = slots[ti]
            idx = (chi,) + sl(bi) if batch_idx is None else (batch_idx, chi) + sl(bi)
            v = c * x_ref[idx]
            tmp = v if tmp is None else tmp + v
        if tmp is not None:
            odx = (cho,) + sl(bo) if batch_idx is None else (batch_idx, cho) + sl(bo)
            acc_ref[odx] += tmp


def make_matvec(
    sm: StructuredMap, C: np.ndarray, batch: int = 1, interpret: bool = False
) -> Callable:
    """One-op cube matvec: flat (B?, npad) -> same. C baked as constants."""
    gshape = _grid_shape(sm)
    npad = int(np.prod(gshape))
    C = np.asarray(C, dtype=np.float64)

    def kernel(x_ref, y_ref):
        y_ref[:] = jnp.zeros_like(y_ref)
        if batch == 1:
            _matvec_body(x_ref, y_ref, C, sm)
        else:
            for b in range(batch):
                _matvec_body(x_ref, y_ref, C, sm, batch_idx=b)

    shape = gshape if batch == 1 else (batch,) + gshape

    @jax.jit
    def mv(x):
        flat_in = x.reshape(shape)
        y = pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct(shape, x.dtype),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            compiler_params=_BIG_VMEM,
            interpret=interpret,
        )(flat_in)
        return y.reshape(x.shape)

    return mv


def make_pressure_cg(
    sm_q: StructuredMap,
    Ap_c: np.ndarray,
    inv_diag_flat: np.ndarray,
    rtol: float,
    maxiter: int,
    cheb_degree: int = 0,
    lmin: float = 0.0,
    lmax: float = 0.0,
    project_nullspace: bool = True,
    mg: dict | None = None,
    interpret: bool = False,
) -> Callable:
    """Whole-solve kernel: preconditioned CG for the pressure Poisson.

    Preconditioner: a geometric multigrid V-cycle when ``mg`` (from
    :func:`build_pressure_mg_data`) is given — damped-Jacobi smoothing,
    axis-separable trilinear transfers (minor axes as MXU matmuls, leading
    axis as baked slice-accumulate), Chebyshev-Jacobi coarsest solve;
    symmetric (R = P^T, equal pre/post sweeps), so valid inside CG.
    Otherwise Jacobi (cheb_degree == 0) or a degree-``cheb_degree``
    Chebyshev acceleration of Jacobi with eigenvalue bounds [lmin, lmax] of
    D^-1 A (Saad, Iterative Methods, alg. 12.1 adapted as a preconditioner).
    The singular Neumann operator is handled by demeaning b and the final
    iterate (reference fracstep.py:573-591).

    Returns fn(b_flat, x0_flat) -> (x_flat, iters, resnorm, converged).
    """
    gshape = _grid_shape(sm_q)
    npad = int(np.prod(gshape))
    Ap = np.asarray(Ap_c, dtype=np.float64)
    invd = np.asarray(inv_diag_flat, dtype=np.float32).reshape(gshape)
    rtol = float(rtol)
    nmean = float(npad)
    d = len(sm_q[1])
    L = len(mg["levels"]) if mg is not None else 1
    n_tr = L - 1  # level transitions
    # kernel ref layout: inputs [b, x0, invd0, invd_1..L-1, 4 mats x n_tr],
    # outputs [x, it, res, conv], scratch [r, z, p, Ap, (r,z,t) x (L-1)]
    n_in = 3 + n_tr + 4 * n_tr

    def kernel(*refs):
        """Ref-mutation PCG: vectors live in the output / scratch refs and
        the while carry holds only scalars — keeps the scoped-VMEM stack
        under the 16 MB limit (loop-carried vector values each cost a full
        buffer)."""
        b_ref, x0_ref, invd_ref = refs[:3]
        mg_invd = refs[3 : 3 + n_tr]
        mg_mats = [refs[3 + n_tr + 4 * t : 3 + n_tr + 4 * (t + 1)] for t in range(n_tr)]
        x_out, it_out, res_out, conv_out, r_s, z_s, p_s, Ap_s = refs[n_in : n_in + 8]
        mg_scr = refs[n_in + 8 :]
        invd_refs = [invd_ref] + list(mg_invd)
        r_refs = [r_s] + [mg_scr[3 * t] for t in range(n_tr)]
        z_refs = [z_s] + [mg_scr[3 * t + 1] for t in range(n_tr)]
        t_refs = [Ap_s] + [mg_scr[3 * t + 2] for t in range(n_tr)]

        def matvec_from(src_ref):
            Ap_s[:] = jnp.zeros_like(Ap_s)
            _matvec_body(src_ref, Ap_s, Ap, sm_q)

        def demean(v):
            if not project_nullspace:
                return v
            return v - jnp.sum(v) / nmean

        def matvec_level(li, src_ref, dst_ref):
            lvl = mg["levels"][li]
            dst_ref[:] = jnp.zeros_like(dst_ref)
            sml = (None, lvl["cells"], 1, None, None)
            _matvec_body(src_ref, dst_ref, Ap * lvl["scale"], sml)

        def dotf(a, b):
            return jax.lax.dot(a, b, preferred_element_type=jnp.float32)

        def smooth(li, sweeps, from_zero):
            om = mg["omega"]
            iv = invd_refs[li][:]
            if from_zero:
                z_refs[li][:] = om * iv * r_refs[li][:]
                sweeps -= 1
            for _ in range(sweeps):
                matvec_level(li, z_refs[li], t_refs[li])
                z_refs[li][:] = z_refs[li][:] + om * iv * (
                    r_refs[li][:] - t_refs[li][:]
                )

        def restrict_into(li, v, out_ref):
            # v: fine residual value WITHOUT the channel axis
            AT, A_, B, BT = (m[:] for m in mg_mats[li])
            gf = mg["levels"][li]["grid"]
            gc = mg["levels"][li + 1]["grid"]
            if d == 2:
                out_ref[0] = dotf(AT, dotf(v, B))
                return
            rows = [dotf(AT, dotf(v[i], B)) for i in range(gf[0])]
            for I in range(gc[0]):
                acc = rows[2 * I]
                if 2 * I - 1 >= 0:
                    acc = acc + 0.5 * rows[2 * I - 1]
                if 2 * I + 1 < gf[0]:
                    acc = acc + 0.5 * rows[2 * I + 1]
                out_ref[0, I] = acc

        def prolong_add(li, zc_ref, zf_ref):
            AT, A_, B, BT = (m[:] for m in mg_mats[li])
            gf = mg["levels"][li]["grid"]
            gc = mg["levels"][li + 1]["grid"]
            Zc = zc_ref[:][0]
            if d == 2:
                zf_ref[0] = zf_ref[0] + dotf(A_, dotf(Zc, BT))
                return
            ups = [dotf(A_, dotf(Zc[I], BT)) for I in range(gc[0])]
            for i in range(gf[0]):
                if i % 2 == 0:
                    add = ups[i // 2]
                else:
                    add = 0.5 * (ups[(i - 1) // 2] + ups[(i + 1) // 2])
                zf_ref[0, i] = zf_ref[0, i] + add

        def cheb_into(li, deg_, lmin_, lmax_, r_ref, z_ref, t_ref, mv):
            """z <- p(D^-1 A) D^-1 r, the Chebyshev-Jacobi application."""
            iv = invd_refs[li][:]
            theta = 0.5 * (lmax_ + lmin_)
            delta = 0.5 * (lmax_ - lmin_)
            sigma1 = theta / delta
            rho = 1.0 / sigma1
            dk = (iv * r_ref[:]) / theta
            z_ref[:] = dk
            for _ in range(deg_ - 1):
                rho_new = 1.0 / (2.0 * sigma1 - rho)
                mv(z_ref, t_ref)
                dk = rho_new * rho * dk + (2.0 * rho_new / delta) * (
                    iv * (r_ref[:] - t_ref[:])
                )
                z_ref[:] = z_ref[:] + dk
                rho = rho_new

        def vcycle():
            ns = mg["nsmooth"]
            for li in range(L - 1):
                smooth(li, ns, from_zero=True)
                matvec_level(li, z_refs[li], t_refs[li])
                resid = r_refs[li][:] - t_refs[li][:]
                restrict_into(li, resid[0], r_refs[li + 1])
            lmin_c, lmax_c, cdeg = mg["coarse"]
            lc = L - 1
            cheb_into(
                lc, cdeg, lmin_c, lmax_c, r_refs[lc], z_refs[lc], t_refs[lc],
                lambda s, t: matvec_level(lc, s, t),
            )
            for li in reversed(range(L - 1)):
                prolong_add(li, z_refs[li + 1], z_refs[li])
                smooth(li, ns, from_zero=False)

        def precond_r_into_z():
            """z_s <- M^-1 r_s (V-cycle, Chebyshev-Jacobi, or Jacobi)."""
            if mg is not None:
                vcycle()
                if project_nullspace:
                    z_s[:] = demean(z_s[:])
                return
            if cheb_degree == 0:
                z_s[:] = invd_ref[:] * r_s[:]
                return
            cheb_into(
                0, cheb_degree, lmin, lmax, r_s, z_s, Ap_s,
                lambda s, t: matvec_from(s),
            )

        b = demean(b_ref[:])
        bnorm = jnp.sqrt(jnp.sum(b * b))
        tol = rtol * bnorm

        x_out[:] = x0_ref[:]
        matvec_from(x0_ref)
        r_s[:] = demean(b - Ap_s[:])
        precond_r_into_z()
        p_s[:] = z_s[:]
        rz0 = jnp.sum(r_s[:] * z_s[:])
        rn0 = jnp.sqrt(jnp.sum(r_s[:] * r_s[:]))

        def cond(carry):
            rz, k, rnorm = carry
            return (rnorm > tol) & (k < maxiter)

        def body(carry):
            rz, k, rnorm = carry
            matvec_from(p_s)
            Apv = demean(Ap_s[:])
            pAp = jnp.sum(p_s[:] * Apv)
            alpha = rz / jnp.where(pAp != 0, pAp, 1.0)
            x_out[:] = x_out[:] + alpha * p_s[:]
            r_s[:] = r_s[:] - alpha * Apv
            precond_r_into_z()
            rz_new = jnp.sum(r_s[:] * z_s[:])
            beta = rz_new / jnp.where(rz != 0, rz, 1.0)
            p_s[:] = z_s[:] + beta * p_s[:]
            return (rz_new, k + 1, jnp.sqrt(jnp.sum(r_s[:] * r_s[:])))

        rz, k, rnorm = jax.lax.while_loop(cond, body, (rz0, jnp.int32(0), rn0))
        if project_nullspace:
            x_out[:] = demean(x_out[:])
        it_out[0] = k
        res_out[0] = rnorm
        conv_out[0] = (rnorm <= tol).astype(jnp.int32)

    mg_inputs = []
    mg_scratch_shapes = []
    if mg is not None:
        for lvl in mg["levels"][1:]:
            mg_inputs.append(jnp.asarray(lvl["invd"][None], dtype=jnp.float32))
        for mats in mg["transfers"]:
            mg_inputs.extend(jnp.asarray(m, dtype=jnp.float32) for m in mats)
        for lvl in mg["levels"][1:]:
            shp = (1,) + tuple(lvl["grid"])
            mg_scratch_shapes.extend(pltpu.VMEM(shp, jnp.float32) for _ in range(3))

    @jax.jit
    def solve(b, x0):
        x, it, res, conv = pl.pallas_call(
            kernel,
            out_shape=(
                jax.ShapeDtypeStruct(gshape, b.dtype),
                jax.ShapeDtypeStruct((1,), jnp.int32),
                jax.ShapeDtypeStruct((1,), b.dtype),
                jax.ShapeDtypeStruct((1,), jnp.int32),
            ),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.VMEM)
                for _ in range(3 + len(mg_inputs))
            ],
            out_specs=(
                pl.BlockSpec(memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.SMEM),
                pl.BlockSpec(memory_space=pltpu.SMEM),
                pl.BlockSpec(memory_space=pltpu.SMEM),
            ),
            scratch_shapes=[
                pltpu.VMEM(gshape, b.dtype),
                pltpu.VMEM(gshape, b.dtype),
                pltpu.VMEM(gshape, b.dtype),
                pltpu.VMEM(gshape, b.dtype),
            ]
            + mg_scratch_shapes,
            compiler_params=_BIG_VMEM,
            interpret=interpret,
        )(
            b.reshape(gshape),
            x0.reshape(gshape),
            jnp.asarray(invd, dtype=b.dtype),
            *mg_inputs,
        )
        return x.reshape(-1), it[0], res[0], conv[0].astype(bool)

    return solve


def estimate_eig_bounds(matvec, n, dtype, iters: int = 15, seed: int = 0):
    """Power iteration for the largest eigenvalue of the (preconditioned)
    operator; returns (lmin_est, lmax_est) with the standard lmin = lmax/30
    Chebyshev-smoother convention."""
    key = jax.random.PRNGKey(seed)
    v = jax.random.normal(key, (n,), dtype=dtype)
    v = v / jnp.linalg.norm(v)
    lam = 1.0
    for _ in range(iters):
        w = matvec(v)
        lam = float(jnp.vdot(v, w))
        nw = float(jnp.linalg.norm(w))
        if nw == 0:
            break
        v = w / nw
    lmax = abs(lam) * 1.05
    return lmax / 30.0, lmax


def build_pressure_mg_data(
    sm_q: StructuredMap,
    Ap_c: np.ndarray,
    coarsest: int = 3,
    nsmooth: int = 2,
    omega: float = 0.8,
    coarse_degree: int = 14,
) -> dict | None:
    """Host-side setup for the in-kernel geometric V-cycle preconditioner
    (VERDICT r3 #2): level hierarchy, per-level Jacobi diagonals, 1-D
    transfer matrices, and exact coarsest-level Chebyshev eigenvalue bounds.

    The P1 pressure grid on a structured generator mesh coarsens by cell
    halving; uniform refinement scales ALL spacings together, so the coarse
    cube element matrix is exactly ``Ap_c * 2**(l*(d-2))`` (stiffness scales
    as h^(d-2)) — the per-level matvec reuses the fine slice-accumulate
    kernel body with rescaled baked constants. Transfers are trilinear
    interpolation P (restriction = P^T): axis-separable — minor (sublane/
    lane) axes apply tiny dense 1-D matrices on the MXU, the leading axis
    is slice-accumulate with baked 1.0/0.5 weights. The coarsest level is
    solved by a degree-``coarse_degree`` Chebyshev-Jacobi iteration with
    eigenvalue bounds computed exactly (dense eigvalsh, <= ~1.3k dofs) —
    no reshape/retile-hostile dense-pinv matmul inside the kernel.

    Returns None when the grid does not coarsen (odd cells / too coarse /
    degree != 1), in which case the Chebyshev-Jacobi kernel path applies.
    Replaces the reference's MUMPS LU pressure solve
    (/root/reference/src/oasisx/fracstep.py:553-605) at scale.
    """
    _, cells, deg, _, _ = sm_q
    d = len(cells)
    if deg != 1 or d not in (2, 3):
        return None
    res = [tuple(int(c) for c in cells)]
    while all(c % 2 == 0 and c // 2 >= coarsest for c in res[-1]):
        res.append(tuple(c // 2 for c in res[-1]))
    if len(res) < 2:
        return None
    Ap = np.asarray(Ap_c, np.float64)
    levels = []
    for li, cl in enumerate(res):
        scale = 2.0 ** (li * (d - 2))
        grid = tuple(c + 1 for c in cl)
        D = np.zeros(grid)
        for t in range(2**d):
            base = np.unravel_index(t, (2,) * d)
            slc = tuple(slice(int(b), int(b) + c) for b, c in zip(base, cl))
            D[slc] += Ap[t, t] * scale
        invd = (1.0 / np.where(D != 0, D, 1.0)).astype(np.float32)
        levels.append(dict(cells=cl, grid=grid, scale=scale, invd=invd))

    def interp1d(nf: int, nc: int) -> np.ndarray:
        P = np.zeros((nf, nc), np.float32)
        for i in range(nf):
            if i % 2 == 0:
                P[i, i // 2] = 1.0
            else:
                P[i, (i - 1) // 2] = 0.5
                P[i, (i + 1) // 2] = 0.5
        return P

    # per transition: (A^T, A, B, B^T) — A interpolates the sublane axis
    # (grid axis d-2), B the lane axis (d-1); leading axes use baked weights
    transfers = []
    for li in range(len(levels) - 1):
        gf, gc = levels[li]["grid"], levels[li + 1]["grid"]
        A = interp1d(gf[d - 2], gc[d - 2])
        B = interp1d(gf[d - 1], gc[d - 1])
        transfers.append(
            (
                np.ascontiguousarray(A.T),
                A,
                B,
                np.ascontiguousarray(B.T),
            )
        )

    # exact Chebyshev bounds for the coarsest operator D^{-1}A (singular
    # Neumann: lmin = smallest NONZERO eigenvalue; the null component is
    # handled by demeaning at the fine level)
    Lc = levels[-1]
    grid_c, cl = Lc["grid"], Lc["cells"]
    n = int(np.prod(grid_c))
    idx = np.arange(n).reshape(grid_c)
    A_dense = np.zeros((n, n))
    for tO in range(2**d):
        bO = np.unravel_index(tO, (2,) * d)
        rows = idx[tuple(slice(int(b), int(b) + c) for b, c in zip(bO, cl))].ravel()
        for tI in range(2**d):
            bI = np.unravel_index(tI, (2,) * d)
            cols = idx[
                tuple(slice(int(b), int(b) + c) for b, c in zip(bI, cl))
            ].ravel()
            np.add.at(A_dense, (rows, cols), Ap[tO, tI] * Lc["scale"])
    dsqrt = 1.0 / np.sqrt(np.diag(A_dense))
    w = np.linalg.eigvalsh(A_dense * dsqrt[:, None] * dsqrt[None, :])
    lmax = float(w[-1]) * 1.02
    nonzero = w[w > 1e-8 * max(w[-1], 1.0)]
    lmin = float(nonzero[0]) * 0.95 if len(nonzero) else lmax / 30.0
    return dict(
        levels=levels,
        transfers=transfers,
        coarse=(lmin, lmax, int(coarse_degree)),
        nsmooth=int(nsmooth),
        omega=float(omega),
    )


def conv_weight_tensor(cu) -> np.ndarray:
    """T[(g,m),(i,j)] with C_cube(u)[i,j] = sum_{g,m} u27[g,m] T[(g,m),(i,j)]:
    the cube-level convection matrix is linear in the convecting velocity's
    cube-local values. Host-side, tiny ((d*nl) x (nl*nl))."""
    PhiW = np.asarray(cu.PhiW, np.float64)  # (Q, nl)
    Phi = np.asarray(cu.Phi, np.float64)  # (Q, nl)
    Dg = np.asarray(cu.Dg, np.float64)  # (Q, d, nl)
    T = np.einsum("qi,qm,qgj->gmij", PhiW, Phi, Dg)
    d, nl = Dg.shape[1], Dg.shape[2]
    return T.reshape(d * nl, nl * nl)


def make_gather(
    sm: StructuredMap,
    batch: int = 1,
    interpret: bool = False,
    slot_range: tuple | None = None,
):
    """One-op cube gather of a SLOT SUBSET: flat (B?, npad) ->
    (B?, len(slots), *cells). Static slice copies only (remote-compile-safe);
    chunk slots so (input grid + output block) stays under the ~16 MB
    scoped-VMEM limit (the (.., n, n) minor dims pad ~3.5x on TPU tiles)."""
    gshape = _grid_shape(sm)
    slots = _slot_info(sm)
    if slot_range is not None:
        slots = slots[slot_range[0] : slot_range[1]]
    nl = len(slots)
    _, cells, _, _, _ = sm
    d = len(cells)
    in_shape = gshape if batch == 1 else (batch,) + gshape
    out_shape = (nl,) + tuple(cells) if batch == 1 else (batch, nl) + tuple(cells)

    def sl(base):
        return tuple(slice(base[k], base[k] + cells[k]) for k in range(d))

    def kernel(x_ref, u_ref):
        for t, (ch, base) in enumerate(slots):
            if batch == 1:
                u_ref[t] = x_ref[(ch,) + sl(base)]
            else:
                for b in range(batch):
                    u_ref[b, t] = x_ref[(b, ch) + sl(base)]

    @jax.jit
    def gather(x):
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct(out_shape, x.dtype),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            compiler_params=_BIG_VMEM,
            interpret=interpret,
        )(x.reshape(in_shape))

    return gather


def make_gather_chunked(sm, batch=1, interpret=False, max_slots=9):
    """Cube gather as a few slot-chunked kernels; returns fn(x) -> (B?, nl,
    *cells)."""
    nl = len(_slot_info(sm))
    ranges = [(a, min(a + max_slots, nl)) for a in range(0, nl, max_slots)]
    fns = [make_gather(sm, batch, interpret, r) for r in ranges]

    def gather(x):
        parts = [f(x) for f in fns]
        return jnp.concatenate(parts, axis=0 if batch == 1 else 1)

    return gather


def make_scatter(
    sm: StructuredMap,
    batch: int = 1,
    interpret: bool = False,
    slot_range: tuple | None = None,
):
    """One-op cube scatter of a SLOT SUBSET: (B?, nslots, *cells) -> flat
    (B?, npad) partial sum. Static slice accumulates only."""
    gshape = _grid_shape(sm)
    slots = _slot_info(sm)
    if slot_range is not None:
        slots = slots[slot_range[0] : slot_range[1]]
    nl = len(slots)
    _, cells, _, _, _ = sm
    d = len(cells)
    in_shape = (nl,) + tuple(cells) if batch == 1 else (batch, nl) + tuple(cells)
    out_shape = gshape if batch == 1 else (batch,) + gshape
    npad = int(np.prod(gshape))

    def sl(base):
        return tuple(slice(base[k], base[k] + cells[k]) for k in range(d))

    def kernel(u_ref, y_ref):
        y_ref[:] = jnp.zeros_like(y_ref)
        for t, (ch, base) in enumerate(slots):
            if batch == 1:
                y_ref[(ch,) + sl(base)] += u_ref[t]
            else:
                for b in range(batch):
                    y_ref[(b, ch) + sl(base)] += u_ref[b, t]

    @jax.jit
    def scatter(U):
        y = pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct(out_shape, U.dtype),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            compiler_params=_BIG_VMEM,
            interpret=interpret,
        )(U.reshape(in_shape))
        return y.reshape((npad,) if batch == 1 else (batch, npad))

    return scatter


def make_scatter_chunked(sm, batch=1, interpret=False, max_slots=9):
    """Cube scatter as slot-chunked kernels summed: fn(U) -> (B?, npad)."""
    nl = len(_slot_info(sm))
    ranges = [(a, min(a + max_slots, nl)) for a in range(0, nl, max_slots)]
    fns = [make_scatter(sm, batch, interpret, r) for r in ranges]

    def scatter(U):
        ax = 0 if batch == 1 else 1
        acc = None
        for f, (a, b) in zip(fns, ranges):
            part = f(jax.lax.slice_in_dim(U, a, b, axis=ax))
            acc = part if acc is None else acc + part
        return acc

    return scatter


def make_ell_matvec(K: int, nrows: int, nin: int, interpret: bool = False):
    """Per-shard unstructured ELL matvec as ONE kernel (VERDICT r3 #4):

        y[r] = sum_k vals[k, r] * x[cols[k, r]]

    take + FMA only — no per-element scatters, no reshapes.  ``vals`` is
    (re)assembled once per solve from the element stacks (graph.ell_values,
    one segment-sum hoisted out of the Krylov loop); ``cols`` is a static
    per-shard table passed as a kernel input.  The rows include halo dofs,
    so the caller wraps halo_refresh / halo_fold around the application —
    the graph-halo analogue of the slab path's per-shard kernels
    (fracstep._slab_apply).  fn(vals (K, nrows), cols (K, nrows) i32,
    x (nin,)) -> y (nrows,)."""

    def kernel(vals_ref, cols_ref, x_ref, y_ref):
        xv = x_ref[:]
        acc = None
        for k in range(K):
            t = vals_ref[k] * jnp.take(xv, cols_ref[k], axis=0)
            acc = t if acc is None else acc + t
        y_ref[:] = acc

    @jax.jit
    def mv(vals, cols, x):
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((nrows,), x.dtype),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 3,
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            compiler_params=_BIG_VMEM,
            interpret=interpret,
        )(vals, cols, x)

    return mv


def make_ell_matvec_batched(
    K: int, nrows: int, nin: int, nb: int, interpret: bool = False
):
    """Batched ELL matvec (all ``nb`` components in ONE kernel):

        y[b, r] = sum_k vals[k, r] * x[b, cols[k, r]]

    Same scheme as :func:`make_ell_matvec`; the operator (vals/cols) is
    shared across components — the graph-halo analogue of the batched
    plane-flat matvecs.  fn(vals (K, nrows), cols (K, nrows) i32,
    x (nb, nin)) -> y (nb, nrows)."""

    def kernel(vals_ref, cols_ref, x_ref, y_ref):
        for b in range(nb):
            xv = x_ref[b]
            acc = None
            for k in range(K):
                t = vals_ref[k] * jnp.take(xv, cols_ref[k], axis=0)
                acc = t if acc is None else acc + t
            y_ref[b] = acc

    @jax.jit
    def mv(vals, cols, x):
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((nb, nrows), x.dtype),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 3,
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            compiler_params=_BIG_VMEM,
            interpret=interpret,
        )(vals, cols, x)

    return mv


def make_tent_matvec_hbm(sm: StructuredMap, interpret: bool = False):
    """Fully-fused per-component tentative matvec:

        y = sum_cubes P_c^T ( W[:, :, c] ) P_c x

    with the per-cube element matrices W STREAMED from HBM by
    double-buffered in-kernel DMA while x and the accumulator stay
    VMEM-resident.  One op per application; the (to, ti) loop is unrolled so
    every slice is static, and W's minor spatial dims are PADDED to full
    (8, 128) tiles host-side — Mosaic requires DMA slices tile-aligned.
    W folds a*M + b*K + 1/2 C(uab), built per step in XLA (see
    ``pad_weights``)."""
    gshape = _grid_shape(sm)
    slots = _slot_info(sm)
    nl = len(slots)
    _, cells, _, _, _ = sm
    d = len(cells)
    npad = int(np.prod(gshape))
    pcells = _padded_cells(cells)

    def sl(base):
        return tuple(slice(base[k], base[k] + cells[k]) for k in range(d))

    wsl = (slice(None),) * max(0, d - 2) + tuple(slice(0, cells[k]) for k in range(max(0, d - 2), d))

    def kernel(w_hbm, x_ref, y_ref):
        def body(wbuf, sem):
            y_ref[:] = jnp.zeros_like(y_ref)

            def dma(idx, slot):
                return pltpu.make_async_copy(
                    w_hbm.at[idx // nl, idx % nl], wbuf.at[slot], sem.at[slot]
                )

            dma(0, 0).start()
            for idx in range(nl * nl):
                slot = idx % 2
                if idx + 1 < nl * nl:
                    dma(idx + 1, (idx + 1) % 2).start()
                dma(idx, slot).wait()
                to, ti = divmod(idx, nl)
                cho, bo = slots[to]
                chi, bi = slots[ti]
                w = wbuf[(slot,) + wsl]
                y_ref[(cho,) + sl(bo)] += w * x_ref[(chi,) + sl(bi)]

        pl.run_scoped(
            body,
            wbuf=pltpu.VMEM((2,) + pcells, jnp.float32),
            sem=pltpu.SemaphoreType.DMA((2,)),
        )

    @jax.jit
    def mv(Wp, x):
        """Wp: (nl, nl, *padded_cells) from ``pad_weights``; x flat."""
        y = pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct(gshape, x.dtype),
            in_specs=[
                pl.BlockSpec(memory_space=pl.ANY),
                pl.BlockSpec(memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            compiler_params=_BIG_VMEM,
            interpret=interpret,
        )(Wp, x.reshape(gshape))
        return y.reshape(-1)

    return mv


def _padded_cells(cells):
    """Pad the last two spatial dims to full (8, 128) f32 tiles."""
    cells = tuple(cells)
    if len(cells) == 1:
        return (-(-cells[0] // 128) * 128,)
    out = list(cells)
    out[-2] = -(-out[-2] // 8) * 8
    out[-1] = -(-out[-1] // 128) * 128
    return tuple(out)


def pad_weights(W_flat: jax.Array, sm: StructuredMap) -> jax.Array:
    """(nl*nl, ncube) or (nl, nl, ncube) -> (nl, nl, *padded_cells)."""
    _, cells, deg, _, _ = sm
    d = len(cells)
    nl = (deg + 1) ** d
    pcells = _padded_cells(cells)
    W = W_flat.reshape((nl, nl) + tuple(cells))
    pads = [(0, 0), (0, 0)] + [(0, pcells[k] - cells[k]) for k in range(d)]
    return jnp.pad(W, pads)


def make_cg_step(sm: StructuredMap, C: np.ndarray, interpret: bool = False):
    """ONE preconditioned-CG iteration as a single kernel (Jacobi precond,
    cube-matrix operator baked as constants). State rides input/output refs
    (which do not count against the scoped-VMEM stack — only scratch does),
    so this works on the large velocity grid where a whole-solve kernel
    cannot hold its state.

    fn(x, r, p, invd, rz) -> (x', r', p', rz', rnorm')  [flat vectors]."""
    gshape = _grid_shape(sm)
    npad = int(np.prod(gshape))
    C = np.asarray(C, dtype=np.float64)

    def kernel(x_ref, r_ref, p_ref, invd_ref, rz_ref,
               xo_ref, ro_ref, po_ref, rzo_ref, rn_ref, Ap_s):
        Ap_s[:] = jnp.zeros_like(Ap_s)
        _matvec_body(p_ref, Ap_s, C, sm)
        p = p_ref[:]
        Apv = Ap_s[:]
        rz = rz_ref[0]
        pAp = jnp.sum(p * Apv)
        alpha = rz / jnp.where(pAp != 0, pAp, 1.0)
        xo_ref[:] = x_ref[:] + alpha * p
        r_new = r_ref[:] - alpha * Apv
        ro_ref[:] = r_new
        z = invd_ref[:] * r_new
        rz_new = jnp.sum(r_new * z)
        beta = rz_new / jnp.where(rz != 0, rz, 1.0)
        po_ref[:] = z + beta * p
        rzo_ref[0] = rz_new
        rn_ref[0] = jnp.sqrt(jnp.sum(r_new * r_new))

    @jax.jit
    def step(x, r, p, invd, rz):
        xo, ro, po, rzo, rn = pl.pallas_call(
            kernel,
            out_shape=(
                jax.ShapeDtypeStruct(gshape, x.dtype),
                jax.ShapeDtypeStruct(gshape, x.dtype),
                jax.ShapeDtypeStruct(gshape, x.dtype),
                jax.ShapeDtypeStruct((1,), x.dtype),
                jax.ShapeDtypeStruct((1,), x.dtype),
            ),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 4
            + [pl.BlockSpec(memory_space=pltpu.SMEM)],
            out_specs=(
                pl.BlockSpec(memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.SMEM),
                pl.BlockSpec(memory_space=pltpu.SMEM),
            ),
            scratch_shapes=[pltpu.VMEM(gshape, x.dtype)],
            compiler_params=_BIG_VMEM,
            interpret=interpret,
        )(x.reshape(gshape), r.reshape(gshape), p.reshape(gshape),
          invd.reshape(gshape), rz.reshape(1))
        return xo.reshape(-1), ro.reshape(-1), po.reshape(-1), rzo, rn

    return step


def cg_solve_stepped(step_fn, matvec, b, x0, invd_flat, rtol, maxiter):
    """Preconditioned CG driven by the one-iteration kernel: the XLA
    while_loop carries (x, r, p, rz, k, rnorm) and the body is ONE op."""
    bnorm = jnp.sqrt(jnp.sum(b * b))
    tol = jnp.maximum(rtol * bnorm, 1e-50)
    r0 = b - matvec(x0)
    z0 = invd_flat * r0
    rz0 = jnp.sum(r0 * z0).reshape(1)
    rn0 = jnp.sqrt(jnp.sum(r0 * r0))

    def cond(c):
        x, r, p, rz, k, rn = c
        return (rn > tol) & (k < maxiter)

    def body(c):
        x, r, p, rz, k, rn = c
        xo, ro, po, rzo, rno = step_fn(x, r, p, invd_flat, rz)
        return (xo, ro, po, rzo, k + 1, rno[0])

    x, r, p, rz, k, rn = jax.lax.while_loop(
        cond, body, (x0, r0, z0, rz0, jnp.int32(0), rn0)
    )
    return x, k, rn, rn <= tol


# ===========================================================================
# Fused BiCGStab: ONE Pallas op per Krylov iteration (round 3)
#
# The round-2 trace/census showed the batched-XLA BiCGStab body costs ~316
# dispatched ops per iteration (~60% of all per-step ops) on the relay
# backend.  This kernel runs the ENTIRE iteration of the batched
# preconditioned BiCGStab (la/krylov.py:bicgstab_batched semantics,
# replacing PETSc KSP bcgs, /root/reference/src/oasisx/ksp.py:71-78) as a
# single op: both W-streamed matvecs, the Jacobi preconditioner, all six
# reductions, and the vector updates, for all d velocity components at
# once.
#
# Layouts:
# - "plane-flat" state: the parity grid (nch, n0+1, n1+1, n2+1) with the
#   last two axes flattened to L = (n1+1)(n2+1) lanes.  A (nch, 37, 1369)
#   f32 buffer tiles to (nch, 40, 1408) = 1.8 MB instead of the 6.06 MB of
#   the 4-D grid (whose (37, 37) minor dims pad 3.46x) — the whole solver
#   state fits VMEM simultaneously.
# - "windowed" weights W_win (nl^2, c0, WL): slot-pair (to, ti)'s per-cube
#   weights for base-plane c0, flattened over (c1, c2) with one zero
#   column inserted at the plane seam (j % (n2+1) == n2), so each
#   (to, ti) contribution is ONE offset-slice FMA over a contiguous
#   length-WL lane window:  y[cho, bo0+*, offo:offo+WL] +=
#   W_win[pair] * x[chi, bi0+*, offi:offi+WL],  off = (n2+1)*b1 + b2.
#   The seam zeros kill the row-wrap cross terms exactly.
# ===========================================================================


def pf_shape(sm: StructuredMap):
    """Plane-flat shape (nch, n0+1, L)."""
    g = _grid_shape(sm)
    if len(sm[1]) == 2:
        return g
    return (g[0], g[1], g[2] * g[3])


def win_len(sm: StructuredMap) -> int:
    cells = sm[1]
    if len(cells) == 2:
        return cells[1]
    return (cells[2] + 1) * (cells[1] - 1) + cells[2]


def _seam_mask(sm: StructuredMap) -> np.ndarray:
    """(WL,) f64 mask zeroing the plane-seam wrap positions of a window
    (j %% (c2+1) == c2): the windowed-FMA layout covers the (c1, c2) block
    as one flat lane range, and the wrap columns carry values from the
    neighbouring row that must not contribute.  The streamed-W kernels
    embed these zeros in W_win; baked-constant kernels multiply the summed
    window by this mask instead."""
    cells = sm[1]
    WL = win_len(sm)
    if len(cells) == 2:
        return np.ones(WL)
    c2 = cells[2]
    j = np.arange(WL)
    return (j % (c2 + 1) != c2).astype(np.float64)


def _pf_slots(sm: StructuredMap):
    """Per slot: (channel, row offset b0, lane offset off)."""
    cells = sm[1]
    out = []
    for ch, base in _slot_info(sm):
        if len(cells) == 2:
            out.append((ch, base[0], base[1]))
        else:
            out.append((ch, base[0], (cells[2] + 1) * base[1] + base[2]))
    return out


def to_planeflat(x: jax.Array, sm: StructuredMap) -> jax.Array:
    """(..., npad) flat -> (..., nch, n0+1, L)."""
    return x.reshape(x.shape[:-1] + pf_shape(sm))


def from_planeflat(X: jax.Array, sm: StructuredMap) -> jax.Array:
    npad = int(np.prod(_grid_shape(sm)))
    return X.reshape(X.shape[:-3] + (npad,))


def _c0_padded(sm: StructuredMap) -> int:
    """W-window row count padded to the f32 sublane tile (8): Mosaic
    requires DMA slice extents tile-aligned in the second-minor dim."""
    return -(-sm[1][0] // 8) * 8


def _wl_padded(sm: StructuredMap) -> int:
    """W-window lane count padded to the f32 lane tile (128) — DMA slice
    extents must be tile-aligned in the minor dim too."""
    return -(-win_len(sm) // 128) * 128


def build_w_win(W: jax.Array, sm: StructuredMap) -> jax.Array:
    """(nl, nl, nc) or (nl*nl, nc) per-cube weights -> windowed
    (nl*nl, c0_padded, WL) with seam zeros (XLA, a pad+reshape+slice)."""
    cells = sm[1]
    nl2 = int(np.prod(W.shape[:-1])) if W.ndim > 2 else W.shape[0]
    c0p = _c0_padded(sm)
    if len(cells) == 2:
        return jnp.pad(
            W.reshape(nl2, cells[0], cells[1]),
            ((0, 0), (0, c0p - cells[0]), (0, _wl_padded(sm) - cells[1])),
        )
    c0, c1, c2 = cells
    W4 = W.reshape(nl2, c0, c1, c2)
    W4 = jnp.pad(W4, ((0, 0), (0, 0), (0, 0), (0, 1)))  # seam zero column
    Ww = W4.reshape(nl2, c0, c1 * (c2 + 1))[:, :, : win_len(sm)]
    return jnp.pad(
        Ww, ((0, 0), (0, c0p - c0), (0, _wl_padded(sm) - win_len(sm)))
    )


def w_win_mask(sm: StructuredMap) -> np.ndarray:
    """(c0p, WLp) 0/1 mask of the valid (non-seam, non-pad) positions of a
    windowed weight array — the positions ``build_w_win`` fills with real
    per-cube values."""
    cells = sm[1]
    c0p, WLp, WL = _c0_padded(sm), _wl_padded(sm), win_len(sm)
    m = np.zeros((c0p, WLp))
    if len(cells) == 2:
        m[: cells[0], :WL] = 1.0
    else:
        m[: cells[0], :WL] = _seam_mask(sm)[None, :]
    return m


def build_w_win_from_u(T, A0, U, sm: StructuredMap):
    """W_win built DIRECTLY in the windowed (nl², c0p, WLp) layout:

        W_win = valid_mask ⊙ (A0 ⊕ 0.5 · T·U)

    Equivalent to ``build_w_win((A0.reshape(-1, 1) + 0.5 * Wc).reshape(
    nl, nl, -1), sm)`` with ``Wc = T·U``, but the seam/pad relayout is
    applied to the small per-slot source ``U`` (d·nl rows — nl× smaller
    than W), so the big nl²-row array is written exactly ONCE by the MXU
    contraction with the A0 broadcast-add fused as its epilogue.  The
    chain it replaces (einsum → combine → pad/reshape/slice) materializes
    the nl²-sized array three times with strided minor-dim writes —
    measured ~5-6 ms/step at N=36 vs <1 ms for this form.  Seam and pad
    positions are exact zeros: the padded source columns are zero and
    T·0 = 0, and the A0 term is masked."""
    cells = sm[1]
    tnl = U.shape[0]
    c0p, WLp, WL = _c0_padded(sm), _wl_padded(sm), win_len(sm)
    if len(cells) == 2:
        Uw = U.reshape(tnl, cells[0], cells[1])
    else:
        c0, c1, c2 = cells
        U4 = U.reshape(tnl, c0, c1, c2)
        U4 = jnp.pad(U4, ((0, 0), (0, 0), (0, 0), (0, 1)))  # seam zero col
        Uw = U4.reshape(tnl, c0, c1 * (c2 + 1))[:, :, :WL]
    Uw = jnp.pad(
        Uw, ((0, 0), (0, c0p - Uw.shape[1]), (0, WLp - Uw.shape[2]))
    )
    Wc = jnp.einsum(
        "tw,tRL->wRL", T, Uw, precision=jax.lax.Precision.HIGHEST
    )
    mask = jnp.asarray(w_win_mask(sm), dtype=U.dtype)
    return 0.5 * Wc + A0.reshape(-1)[:, None, None] * mask


def make_bicgstab_iter(
    sm: StructuredMap, d: int, pair_block: int = 8, interpret: bool = False
):
    """ONE batched-BiCGStab iteration as a single kernel.

    fn(W_win, x, r, p, rhat, zmask, invd, rho, rnorm, iters, tol)
      -> (x', r', p', v, t, rho', rnorm', iters')

    State arrays are plane-flat (d, nch, n0+1, L); scalars are (d,).
    ``zmask`` is 0.0 on Dirichlet rows, 1.0 elsewhere (the matvec output is
    zeroed there: bc rows carry the identity operator and all Krylov
    vectors are 0 on them — callers pre-set x0's bc rows to the bc values).
    ``invd`` is the Jacobi inverse diagonal.  v and t are exposed (not
    scratch) only because Mosaic's scoped-VMEM stack cannot hold them; the
    caller discards them.  Semantics == la/krylov.py:bicgstab_batched
    (active-row freezing included).
    """
    pfs = pf_shape(sm)
    nch, nrow, L = pfs
    cells = sm[1]
    c0 = cells[0]
    c0p = _c0_padded(sm)
    WL = win_len(sm)
    WLp = _wl_padded(sm)
    slots = _pf_slots(sm)
    nl = len(slots)
    npairs = nl * nl
    nblocks = -(-npairs // pair_block)
    shape = (d,) + pfs

    def matvec_phase(src_ref, acc_ref, w_hbm, wbuf, sem):
        """acc (zeroed by caller) += A_W src, streaming W_win pair blocks.

        Pairs are visited output-slot-major (pair = to*nl + ti), so the
        accumulation over ti happens in a register value with ONE
        read-modify-write of acc per output slot — 729 RMWs into the ref
        measured ~12x off the HBM bound and exploded Mosaic's dependence
        analysis."""

        def dma(blk, slot):
            a = blk * pair_block
            b = min(a + pair_block, npairs)
            return pltpu.make_async_copy(
                w_hbm.at[pl.ds(a, b - a)], wbuf.at[slot, pl.ds(0, b - a)], sem.at[slot]
            )

        dma(0, 0).start()
        tmp = None
        to_cur = 0
        for blk in range(nblocks):
            slot = blk % 2
            if blk + 1 < nblocks:
                dma(blk + 1, (blk + 1) % 2).start()
            dma(blk, slot).wait()
            for k in range(pair_block):
                pair = blk * pair_block + k
                if pair >= npairs:
                    break
                to, ti = divmod(pair, nl)
                if to != to_cur:
                    cho, bo0, offo = slots[to_cur]
                    acc_ref[:, cho, bo0 : bo0 + c0, offo : offo + WL] += tmp
                    tmp = None
                    to_cur = to
                chi, bi0, offi = slots[ti]
                w = wbuf[slot, k, :c0, :WL]  # rows/lanes beyond are pad
                contrib = w * src_ref[:, chi, bi0 : bi0 + c0, offi : offi + WL]
                tmp = contrib if tmp is None else tmp + contrib
        cho, bo0, offo = slots[to_cur]
        acc_ref[:, cho, bo0 : bo0 + c0, offo : offo + WL] += tmp

    def kernel(
        w_hbm, x_ref, r_ref, p_ref, rhat_ref, zm_ref, invd_ref,
        rho_ref, rn_ref, it_ref, tol_ref,
        xo_ref, ro_ref, po_ref, v_ref, t_ref, rhoo_ref, rno_ref, ito_ref,
        acc_ref, wbuf, sem,
    ):
        invd = invd_ref[:]

        # --- phase A: v = zmask * A (invd * p) ---------------------------
        for b in range(d):
            t_ref[b] = invd * p_ref[b]  # phat
        acc_ref[:] = jnp.zeros_like(acc_ref)
        matvec_phase(t_ref, acc_ref, w_hbm, wbuf, sem)
        for b in range(d):
            v_ref[b] = zm_ref[b] * acc_ref[b]

        # --- phase B: alpha, s (into ro), shat (into t) ------------------
        # inputs are read-only: s is written through the aliased OUTPUT ref
        # ro and read back from it (same underlying buffer as r)
        alphas, actives, rhos = [], [], []
        for b in range(d):
            active = rn_ref[b] > tol_ref[b]
            rho = rho_ref[b]
            rv = jnp.sum(rhat_ref[b] * v_ref[b])
            alpha = rho / jnp.where(rv != 0, rv, 1.0)
            s = r_ref[b] - alpha * v_ref[b]
            ro_ref[b] = s  # ro holds s
            t_ref[b] = invd * s  # shat
            alphas.append(alpha)
            actives.append(active)
            rhos.append(rho)

        # --- phase C: t = zmask * A shat ---------------------------------
        acc_ref[:] = jnp.zeros_like(acc_ref)
        matvec_phase(t_ref, acc_ref, w_hbm, wbuf, sem)
        for b in range(d):
            t_ref[b] = zm_ref[b] * acc_ref[b]

        # --- phase D: omega, x, r_new, rho_new, beta, p ------------------
        for b in range(d):
            active, alpha, rho = actives[b], alphas[b], rhos[b]
            s = ro_ref[b]
            tv = t_ref[b]
            tt = jnp.sum(tv * tv)
            ts = jnp.sum(tv * s)
            omega = ts / jnp.where(tt != 0, tt, 1.0)
            dx = alpha * (invd * p_ref[b]) + omega * (invd * s)
            xo_ref[b] = x_ref[b] + jnp.where(active, 1.0, 0.0) * dx
            r_new = s - omega * tv
            r_new = jnp.where(active, r_new, s + alpha * v_ref[b])  # restore r
            ro_ref[b] = r_new
            rho_new = jnp.where(active, jnp.sum(rhat_ref[b] * r_new), rho)
            beta = (rho_new / jnp.where(rho != 0, rho, 1.0)) * (
                alpha / jnp.where(omega != 0, omega, 1.0)
            )
            p_new = r_new + beta * (p_ref[b] - omega * v_ref[b])
            po_ref[b] = jnp.where(active, p_new, p_ref[b])
            rhoo_ref[b] = rho_new
            rno_ref[b] = jnp.where(
                active, jnp.sqrt(jnp.sum(r_new * r_new)), rn_ref[b]
            )
            ito_ref[b] = it_ref[b] + active.astype(jnp.int32)

    smem = lambda: pl.BlockSpec(memory_space=pltpu.SMEM)
    vmem = lambda: pl.BlockSpec(memory_space=pltpu.VMEM)

    @jax.jit
    def step(W_win, x, r, p, rhat, zmask, invd, rho, rnorm, iters, tol):
        return pl.pallas_call(
            kernel,
            out_shape=(
                jax.ShapeDtypeStruct(shape, x.dtype),      # x'
                jax.ShapeDtypeStruct(shape, x.dtype),      # r'
                jax.ShapeDtypeStruct(shape, x.dtype),      # p'
                jax.ShapeDtypeStruct(shape, x.dtype),      # v (discard)
                jax.ShapeDtypeStruct(shape, x.dtype),      # t (discard)
                jax.ShapeDtypeStruct((d,), x.dtype),       # rho'
                jax.ShapeDtypeStruct((d,), x.dtype),       # rnorm'
                jax.ShapeDtypeStruct((d,), jnp.int32),     # iters'
            ),
            in_specs=[pl.BlockSpec(memory_space=pl.ANY)]
            + [vmem()] * 6
            + [smem()] * 4,
            out_specs=(vmem(),) * 5 + (smem(),) * 3,
            scratch_shapes=[
                pltpu.VMEM(shape, x.dtype),
                pltpu.VMEM((2, pair_block, c0p, WLp), x.dtype),
                pltpu.SemaphoreType.DMA((2,)),
            ],
            input_output_aliases={1: 0, 2: 1, 3: 2},  # x, r, p in-place
            compiler_params=_BIG_VMEM,
            interpret=interpret,
        )(W_win, x, r, p, rhat, zmask, invd, rho, rnorm, iters, tol)

    return step


def bicgstab_fused_from_r0(
    iter_fn, W_win, r0_pf, x0_pf, zmask_pf, invd_pf, bnorm, rtol, maxiter,
    atol=1e-50,
):
    """Run the fused iteration from a precomputed initial residual
    r0 = zmask * (b - A x0) (the caller does the init matvec in XLA; bc
    rows of x0 hold the bc values so r0 is 0 there).  ``bnorm`` is the
    per-row ||b|| used for the relative tolerance (matching
    bicgstab_batched, which includes bc rows in ||b||)."""
    d = r0_pf.shape[0]
    dt_ = r0_pf.dtype
    tol = jnp.maximum(rtol * bnorm, atol).astype(dt_)
    rho0 = jnp.sum(r0_pf * r0_pf, axis=(1, 2, 3))
    rnorm0 = jnp.sqrt(rho0)
    rhat = r0_pf

    def cond(c):
        x, r, p, rho, rnorm, iters, k = c
        return jnp.any(rnorm > tol) & (k < maxiter)

    def body(c):
        x, r, p, rho, rnorm, iters, k = c
        x, r, p, _v, _t, rho, rnorm, iters = iter_fn(
            W_win, x, r, p, rhat, zmask_pf, invd_pf, rho, rnorm, iters, tol
        )
        return (x, r, p, rho, rnorm, iters, k + 1)

    x, r, p, rho, rnorm, iters, k = jax.lax.while_loop(
        cond,
        body,
        (x0_pf, r0_pf, r0_pf, rho0.astype(dt_), rnorm0.astype(dt_),
         jnp.zeros(d, jnp.int32), jnp.int32(0)),
    )
    return x, iters, rnorm, rnorm <= tol


# ===========================================================================
# HBM-state kernels for grids past the VMEM budget (round 4, VERDICT r3 #3)
#
# At N=64 one (d, nch, n0+1, L) f32 state array is ~30 MB, so the
# whole-state iteration kernels (8.5 arrays) cannot hold VMEM.  These
# kernels keep the state in HBM in CHANNEL-MAJOR layout (nch, d, nrowp, Lp)
# and sweep (output channel x input channel): one ~(d, nrow, L) channel
# buffer (~3.4 MB at N=64) is DMAed per channel visit while the windowed
# weights stream per slot pair exactly as in the VMEM kernels.  Per matvec
# the x re-read is nch * |x| (~216 MB at N=64) against the 765 MB W stream
# — the weights stay the bandwidth floor.  A full BiCGStab iteration is
# THREE ops (matvec+dot, matvec+dots, update sweeps) instead of the staged
# matvec + ~50-op XLA glue body.  All slices are static; DMAs follow the
# proven double-buffered make_async_copy pattern (the relay's Mosaic
# rejects dynamic-index bodies).
# ===========================================================================


def _hbm_row_pad(sm: StructuredMap) -> int:
    return -(-pf_shape(sm)[1] // 8) * 8


def _hbm_lane_pad(sm: StructuredMap) -> int:
    return -(-pf_shape(sm)[2] // 128) * 128


def hbm_state_shape(sm: StructuredMap, d: int):
    """(nch, d, nrowp, Lp): channel-major so one channel's (d, nrow, L)
    block is a single contiguous tile-aligned DMA."""
    nch, nrow, L = pf_shape(sm)
    return (nch, d, _hbm_row_pad(sm), _hbm_lane_pad(sm))


def to_hbm_state(x: jax.Array, sm: StructuredMap) -> jax.Array:
    """(d, npad) flat -> channel-major padded (nch, d, nrowp, Lp)."""
    nch, nrow, L = pf_shape(sm)
    X = jnp.swapaxes(to_planeflat(x, sm), 0, 1)  # (nch, d, nrow, L)
    return jnp.pad(
        X, ((0, 0), (0, 0), (0, _hbm_row_pad(sm) - nrow), (0, _hbm_lane_pad(sm) - L))
    )


def from_hbm_state(X: jax.Array, sm: StructuredMap) -> jax.Array:
    nch, nrow, L = pf_shape(sm)
    return from_planeflat(jnp.swapaxes(X[:, :, :nrow, :L], 0, 1), sm)


def _chan_slot_groups(sm: StructuredMap):
    """slots grouped by channel: [(ch, [(slot_idx, b0, off), ...]), ...]."""
    groups: dict = {}
    for t, (ch, b0, off) in enumerate(_pf_slots(sm)):
        groups.setdefault(ch, []).append((t, b0, off))
    return sorted(groups.items())


def _hbm_matvec_sweep(
    sm, d, w_hbm, wbuf, wsem, ybuf,
    src_for, finish_out,
):
    """Shared channel-pair matvec sweep (kernel-body helper).

    For each output channel cho: zero ybuf; for each input channel chi:
    call ``src_for(chi)`` — returns a reader ``read(sl)`` over the matvec
    SOURCE channel (e.g. invd*p); streaming variants DMA a channel buffer
    here, resident variants just slice a VMEM-resident state — then FMA
    every (to in cho-slots, ti in chi-slots) pair with W streamed per
    pair (double buffered).  After the chi sweep, ``finish_out(cho,
    ybuf)`` post-processes and writes the output channel.  All
    loops/slices static."""
    nl = len(_pf_slots(sm))
    cells = sm[1]
    c0 = cells[0]
    WL = win_len(sm)
    groups = _chan_slot_groups(sm)

    # flat pair order for W prefetching (matches the loop nest below)
    pair_list = [
        to * nl + ti
        for cho, oslots in groups
        for chi, islots in groups
        for to, _, _ in oslots
        for ti, _, _ in islots
    ]

    def wdma(k, slot):
        return pltpu.make_async_copy(
            w_hbm.at[pair_list[k]], wbuf.at[slot], wsem.at[slot]
        )

    wdma(0, 0).start()
    k = 0
    for cho, oslots in groups:
        ybuf[:] = jnp.zeros_like(ybuf)
        for chi, islots in groups:
            read = src_for(chi)
            for to, bo0, offo in oslots:
                tmp = None
                for ti, bi0, offi in islots:
                    slot = k % 2
                    if k + 1 < len(pair_list):
                        wdma(k + 1, (k + 1) % 2).start()
                    wdma(k, slot).wait()
                    contrib = wbuf[slot, :c0, :WL] * read(
                        (slice(None), slice(bi0, bi0 + c0), slice(offi, offi + WL))
                    )
                    tmp = contrib if tmp is None else tmp + contrib
                    k += 1
                ybuf[:, bo0 : bo0 + c0, offo : offo + WL] += tmp
        finish_out(cho, ybuf)


def _sync_load(any_ref, idx, buf, sem):
    cp = pltpu.make_async_copy(any_ref.at[idx], buf, sem)
    cp.start()
    cp.wait()


def _sync_store(buf, any_ref, idx, sem):
    cp = pltpu.make_async_copy(buf, any_ref.at[idx], sem)
    cp.start()
    cp.wait()


def _stage_premul_src(resident, nch, src_any, pm_any, xbuf, zbuf, sem):
    """Build the sweep's ``src_for`` for a premultiplied source
    (``pm * src`` — the matvec and K1 staging).  resident: stage the whole
    state into the (nch,)+cbuf scratch up front (nch-linear HBM traffic);
    streaming: DMA one channel buffer per visit."""
    if resident:
        for ch in range(nch):
            _sync_load(src_any, ch, xbuf.at[ch], sem)
            _sync_load(pm_any, ch, zbuf, sem)
            xbuf[ch] = xbuf[ch] * zbuf[:]

        def src_for(chi):
            return lambda sl: xbuf[(chi,) + sl]
    else:

        def src_for(chi):
            _sync_load(src_any, chi, xbuf, sem)
            _sync_load(pm_any, chi, zbuf, sem)
            xbuf[:] = xbuf[:] * zbuf[:]
            return lambda sl: xbuf[sl]

    return src_for


def make_matvec_hbm_chan(
    sm: StructuredMap, d: int, interpret: bool = False, resident: bool = False
):
    """One-op W-streamed matvec with x AND y in HBM (channel-major
    hbm_state layout): y = zmask * A_W (premul * x).  ``premul``/``zmask``
    are channel-major multipliers (pass ones to disable).  Serves the init
    matvecs (r0, b_first) on grids past the VMEM budget.

    ``resident=True``: the premultiplied source is staged ONCE into a
    whole-state VMEM scratch, so the sweep reads it nch times from VMEM
    instead of DMAing nch^2 channel buffers — use whenever ONE state
    array (+3 channel buffers) fits the VMEM budget; the streaming
    variant remains for grids past even that.

    fn(W_win, x (nch, d, nrowp, Lp), premul, zmask) -> y (same shape)."""
    nch = pf_shape(sm)[0]
    shape = hbm_state_shape(sm, d)
    cbuf = shape[1:]  # (d, nrowp, Lp)
    c0p, WLp = _c0_padded(sm), _wl_padded(sm)

    def kernel(w_hbm, x_any, pm_any, zm_any, y_any, *scr):
        xbuf, ybuf, zbuf, wbuf, xsem, osem, wsem = scr
        src_for = _stage_premul_src(resident, nch, x_any, pm_any, xbuf, zbuf, xsem)

        def finish_out(cho, yb):
            _sync_load(zm_any, cho, zbuf, xsem)
            yb[:] = yb[:] * zbuf[:]
            _sync_store(yb, y_any, cho, osem)

        _hbm_matvec_sweep(sm, d, w_hbm, wbuf, wsem, ybuf, src_for, finish_out)

    @jax.jit
    def mv(W_win, x, premul, zmask):
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct(shape, x.dtype),
            in_specs=[pl.BlockSpec(memory_space=pl.ANY)] * 4,
            out_specs=pl.BlockSpec(memory_space=pl.ANY),
            scratch_shapes=[
                pltpu.VMEM(((nch,) + cbuf) if resident else cbuf, x.dtype),
                pltpu.VMEM(cbuf, x.dtype),
                pltpu.VMEM(cbuf, x.dtype),
                pltpu.VMEM((2, c0p, WLp), x.dtype),
                pltpu.SemaphoreType.DMA,
                pltpu.SemaphoreType.DMA,
                pltpu.SemaphoreType.DMA((2,)),
            ],
            compiler_params=_BIG_VMEM,
            interpret=interpret,
        )(W_win, x, premul, zmask)

    return mv


def make_bicgstab_hbm_kernels(
    sm: StructuredMap, d: int, interpret: bool = False, dtype=jnp.float32,
    resident: bool = False,
):
    """HBM-state batched BiCGStab: THREE ops per iteration for grids whose
    whole solver state cannot hold VMEM (VERDICT r3 #3).  State arrays are
    channel-major ``hbm_state`` layout; semantics == bicgstab_batched /
    make_bicgstab_iter (Jacobi preconditioning, zmask bc rows, active-row
    freezing).

    ``resident=True``: k1/k2 stage their premultiplied matvec source into
    ONE whole-state VMEM scratch in an nch-linear prep pass, so the
    channel-pair sweep reads VMEM instead of DMAing nch^2 channel buffers
    (~6x less non-W HBM traffic).  Requires one state array + ~3 channel
    buffers under the VMEM budget; the streaming variant (default) works
    at any size.

    Returns (k1, k2, k3):
      k1(W, p, invd, zm, rhat)                    -> (v, rv (d,))
      k2(W, r, v, invd, zm, rho, rv)              -> (t, s, tt (d,), ts (d,))
      k3(x, p, v, t, s, rhat, invd,
         rho, rv, tt, ts, rn, tol, iters)         -> (x', r', p', rho', rn', it')
    """
    nch, nrow, L = pf_shape(sm)
    shape = hbm_state_shape(sm, d)
    cbuf = shape[1:]
    c0p, WLp = _c0_padded(sm), _wl_padded(sm)
    f32 = dtype
    ANY = pl.BlockSpec(memory_space=pl.ANY)
    SMEM = pl.BlockSpec(memory_space=pltpu.SMEM)

    def scratch(nbuf):
        # first buffer is the sweep source: whole-state in resident mode
        src = pltpu.VMEM(((nch,) + cbuf) if resident else cbuf, f32)
        return [src] + [pltpu.VMEM(cbuf, f32) for _ in range(nbuf - 1)] + [
            pltpu.VMEM((2, c0p, WLp), f32),
            pltpu.SemaphoreType.DMA,
            pltpu.SemaphoreType.DMA,
            pltpu.SemaphoreType.DMA((2,)),
        ]

    # --- K1: v = zm * A (invd * p);  rv = <rhat, v> -------------------------
    def k1_kernel(w_hbm, p_any, invd_any, zm_any, rhat_any,
                  v_any, rv_ref, xbuf, ybuf, zbuf, wbuf, xsem, osem, wsem):
        for b in range(d):
            rv_ref[b] = 0.0

        src_for = _stage_premul_src(
            resident, nch, p_any, invd_any, xbuf, zbuf, xsem
        )

        def finish_out(cho, yb):
            _sync_load(zm_any, cho, zbuf, xsem)
            yb[:] = yb[:] * zbuf[:]
            _sync_load(rhat_any, cho, zbuf, xsem)
            for b in range(d):
                rv_ref[b] += jnp.sum(zbuf[b] * yb[b])
            _sync_store(yb, v_any, cho, osem)

        _hbm_matvec_sweep(sm, d, w_hbm, wbuf, wsem, ybuf, src_for, finish_out)

    @jax.jit
    def k1(W_win, p, invd, zm, rhat):
        return pl.pallas_call(
            k1_kernel,
            out_shape=(
                jax.ShapeDtypeStruct(shape, f32),
                jax.ShapeDtypeStruct((d,), f32),
            ),
            in_specs=[ANY] * 5,
            out_specs=(ANY, SMEM),
            scratch_shapes=scratch(3),
            compiler_params=_BIG_VMEM,
            interpret=interpret,
        )(W_win, p, invd, zm, rhat)

    # --- K2: s = r - alpha v; t = zm * A (invd * s); tt, ts ----------------
    def k2_kernel(w_hbm, r_any, v_any, invd_any, zm_any,
                  rho_ref, rv_ref,
                  t_any, s_any, tt_ref, ts_ref,
                  xbuf, ybuf, zbuf, sbuf, wbuf, xsem, osem, wsem):
        alphas = []
        for b in range(d):
            rv = rv_ref[b]
            alphas.append(rho_ref[b] / jnp.where(rv != 0, rv, 1.0))
            tt_ref[b] = 0.0
            ts_ref[b] = 0.0

        def make_s(ch, sem):
            """sbuf = r[ch] - alpha * v[ch]."""
            _sync_load(r_any, ch, sbuf, sem)
            _sync_load(v_any, ch, zbuf, sem)
            for b in range(d):
                sbuf[b] = sbuf[b] - alphas[b] * zbuf[b]

        if resident:
            # prep pass: s computed once per channel, persisted to HBM AND
            # staged (premultiplied) into the whole-state source scratch
            for ch in range(nch):
                make_s(ch, xsem)
                _sync_store(sbuf, s_any, ch, osem)
                _sync_load(invd_any, ch, zbuf, xsem)
                xbuf[ch] = sbuf[:] * zbuf[:]

            def src_for(chi):
                return lambda sl: xbuf[(chi,) + sl]
        else:

            def src_for(chi):
                make_s(chi, xsem)
                _sync_load(invd_any, chi, zbuf, xsem)
                xbuf[:] = sbuf[:] * zbuf[:]
                # persist s (first visit; identical on the later re-visits)
                _sync_store(sbuf, s_any, chi, osem)
                return lambda sl: xbuf[sl]

        def finish_out(cho, yb):
            _sync_load(zm_any, cho, zbuf, xsem)
            yb[:] = yb[:] * zbuf[:]
            if resident:
                _sync_load(s_any, cho, sbuf, xsem)  # persisted in the prep
            else:
                make_s(cho, xsem)  # recompute s[cho] for the dots
            for b in range(d):
                tt_ref[b] += jnp.sum(yb[b] * yb[b])
                ts_ref[b] += jnp.sum(yb[b] * sbuf[b])
            _sync_store(yb, t_any, cho, osem)

        _hbm_matvec_sweep(sm, d, w_hbm, wbuf, wsem, ybuf, src_for, finish_out)

    @jax.jit
    def k2(W_win, r, v, invd, zm, rho, rv):
        return pl.pallas_call(
            k2_kernel,
            out_shape=(
                jax.ShapeDtypeStruct(shape, f32),
                jax.ShapeDtypeStruct(shape, f32),
                jax.ShapeDtypeStruct((d,), f32),
                jax.ShapeDtypeStruct((d,), f32),
            ),
            in_specs=[ANY] * 5 + [SMEM] * 2,
            out_specs=(ANY, ANY, SMEM, SMEM),
            scratch_shapes=scratch(4),
            compiler_params=_BIG_VMEM,
            interpret=interpret,
        )(W_win, r, v, invd, zm, rho, rv)

    # --- K3: x, r, p updates + rho', rnorm', iters' (two channel sweeps) ---
    def k3_kernel(x_any, p_any, v_any, t_any, s_any, rhat_any, invd_any,
                  rho_ref, rv_ref, tt_ref, ts_ref, rn_ref, tol_ref, it_ref,
                  xo_any, ro_any, po_any, rhoo_ref, rno_ref, ito_ref,
                  abuf, bbuf, cxbuf, dbuf, xsem, osem):
        alphas, omegas, actives = [], [], []
        for b in range(d):
            rv = rv_ref[b]
            tt = tt_ref[b]
            alphas.append(rho_ref[b] / jnp.where(rv != 0, rv, 1.0))
            omegas.append(ts_ref[b] / jnp.where(tt != 0, tt, 1.0))
            actives.append(rn_ref[b] > tol_ref[b])
            rhoo_ref[b] = 0.0
            rno_ref[b] = 0.0

        # sweep 1: x' = x + act*(alpha*invd*p + omega*invd*s);
        #          r' = act ? s - omega t : s + alpha v (restores r);
        #          partials <rhat, r'>, <r', r'>
        for ch in range(nch):
            _sync_load(s_any, ch, abuf, xsem)
            _sync_load(t_any, ch, bbuf, xsem)
            _sync_load(v_any, ch, cxbuf, xsem)
            for b in range(d):
                r_new = jnp.where(
                    actives[b],
                    abuf[b] - omegas[b] * bbuf[b],
                    abuf[b] + alphas[b] * cxbuf[b],
                )
                bbuf[b] = r_new  # bbuf now holds r'
            _sync_load(rhat_any, ch, cxbuf, xsem)
            for b in range(d):
                rhoo_ref[b] += jnp.sum(cxbuf[b] * bbuf[b])
                rno_ref[b] += jnp.sum(bbuf[b] * bbuf[b])
            _sync_store(bbuf, ro_any, ch, osem)
            _sync_load(p_any, ch, cxbuf, xsem)
            _sync_load(invd_any, ch, dbuf, xsem)
            for b in range(d):
                act = jnp.where(actives[b], 1.0, 0.0)
                dx = alphas[b] * dbuf[b] * cxbuf[b] + omegas[b] * dbuf[b] * abuf[b]
                cxbuf[b] = act * dx  # reuse as masked dx
            _sync_load(x_any, ch, dbuf, xsem)
            dbuf[:] = dbuf[:] + cxbuf[:]
            _sync_store(dbuf, xo_any, ch, osem)

        # finalize scalars (frozen rows keep rho, rnorm, iters)
        betas = []
        for b in range(d):
            rho_new = jnp.where(actives[b], rhoo_ref[b], rho_ref[b])
            rhoo_ref[b] = rho_new
            rno_ref[b] = jnp.where(actives[b], jnp.sqrt(rno_ref[b]), rn_ref[b])
            ito_ref[b] = it_ref[b] + actives[b].astype(jnp.int32)
            om = omegas[b]
            betas.append(
                (rho_new / jnp.where(rho_ref[b] != 0, rho_ref[b], 1.0))
                * (alphas[b] / jnp.where(om != 0, om, 1.0))
            )

        # sweep 2: p' = act ? r' + beta (p - omega v) : p
        for ch in range(nch):
            _sync_load(ro_any, ch, abuf, xsem)
            _sync_load(p_any, ch, bbuf, xsem)
            _sync_load(v_any, ch, cxbuf, xsem)
            for b in range(d):
                p_new = abuf[b] + betas[b] * (bbuf[b] - omegas[b] * cxbuf[b])
                bbuf[b] = jnp.where(actives[b], p_new, bbuf[b])
            _sync_store(bbuf, po_any, ch, osem)

    @jax.jit
    def k3(x, p, v, t, s, rhat, invd, rho, rv, tt, ts, rn, tol, iters):
        return pl.pallas_call(
            k3_kernel,
            out_shape=(
                jax.ShapeDtypeStruct(shape, f32),
                jax.ShapeDtypeStruct(shape, f32),
                jax.ShapeDtypeStruct(shape, f32),
                jax.ShapeDtypeStruct((d,), f32),
                jax.ShapeDtypeStruct((d,), f32),
                jax.ShapeDtypeStruct((d,), jnp.int32),
            ),
            in_specs=[ANY] * 7 + [SMEM] * 7,
            out_specs=(ANY, ANY, ANY, SMEM, SMEM, SMEM),
            scratch_shapes=[
                pltpu.VMEM(cbuf, f32),
                pltpu.VMEM(cbuf, f32),
                pltpu.VMEM(cbuf, f32),
                pltpu.VMEM(cbuf, f32),
                pltpu.SemaphoreType.DMA,
                pltpu.SemaphoreType.DMA,
            ],
            compiler_params=_BIG_VMEM,
            interpret=interpret,
        )(x, p, v, t, s, rhat, invd, rho, rv, tt, ts, rn, tol, iters)

    return k1, k2, k3


def bicgstab_hbm_from_r0(
    kernels, W_win, r0_h, x0_h, zm_h, invd_h, bnorm, rtol, maxiter, atol=1e-50
):
    """Drive the 3-op HBM-state BiCGStab from a precomputed channel-major
    initial residual r0 = zm*(b - A x0) (cf. bicgstab_fused_from_r0).
    Returns (x (hbm layout), iters, rnorm, converged)."""
    k1, k2, k3 = kernels
    d = r0_h.shape[1]
    f32 = r0_h.dtype
    tol = jnp.maximum(rtol * bnorm, atol).astype(f32)
    rho0 = jnp.sum(r0_h * r0_h, axis=(0, 2, 3))
    rn0 = jnp.sqrt(rho0)
    rhat = r0_h

    def cond(c):
        x, r, p, rho, rn, iters, k = c
        return jnp.any(rn > tol) & (k < maxiter)

    def body(c):
        x, r, p, rho, rn, iters, k = c
        v, rv = k1(W_win, p, invd_h, zm_h, rhat)
        t, s, tt, ts = k2(W_win, r, v, invd_h, zm_h, rho, rv)
        x, r, p, rho, rn, iters = k3(
            x, p, v, t, s, rhat, invd_h, rho, rv, tt, ts, rn, tol, iters
        )
        return (x, r, p, rho, rn, iters, k + 1)

    x, r, p, rho, rn, iters, k = jax.lax.while_loop(
        cond, body,
        (x0_h, r0_h, r0_h, rho0.astype(f32), rn0.astype(f32),
         jnp.zeros(d, jnp.int32), jnp.int32(0)),
    )
    return x, iters, rn, rn <= tol


def pf_const_matvec_body(dst_ref, src_ref, C, sm_out, sm_in, mask, accumulate=False):
    """dst (+)= A src with a BAKED (nl_out, nl_in) cube matrix; refs are
    batched plane-flat (d, nch, n0+1, L).  Output-slot-major register
    accumulation; zero entries skipped.  ``mask`` is the (WL,) seam-mask
    VALUE (pallas kernels may not capture array constants)."""
    cells = sm_out[1]
    assert tuple(cells) == tuple(sm_in[1])
    c0 = cells[0]
    WL = win_len(sm_out)
    so = _pf_slots(sm_out)
    si = _pf_slots(sm_in)
    C = np.asarray(C, np.float64)
    for to, (cho, bo0, offo) in enumerate(so):
        tmp = None
        for ti, (chi, bi0, offi) in enumerate(si):
            c = float(C[to, ti])
            if c == 0.0:
                continue
            contrib = c * src_ref[:, chi, bi0 : bi0 + c0, offi : offi + WL]
            tmp = contrib if tmp is None else tmp + contrib
        if tmp is None:
            continue
        odx = (slice(None), cho, slice(bo0, bo0 + c0), slice(offo, offo + WL))
        if accumulate:
            dst_ref[odx] += mask * tmp
        else:
            dst_ref[odx] = mask * tmp


def make_cg_iter_pf(sm, C, d, interpret: bool = False):
    """ONE batched preconditioned-CG iteration as a single kernel (baked
    constant operator C, Jacobi preconditioner, active-row freezing) —
    the velocity-update mass solves (cg_batched semantics,
    la/krylov.py:268-313).

    fn(x, r, z?, p, invd, rz, rnorm, iters, tol) — state plane-flat
    (d, nch, n0+1, L); scalars (d,).
    Returns (x', r', p', rz', rnorm', iters')."""
    pfs = pf_shape(sm)
    shape = (d,) + pfs

    mask_h = _seam_mask(sm)

    def kernel(
        x_ref, r_ref, p_ref, invd_ref, mask_ref, rz_ref, rn_ref, it_ref, tol_ref,
        xo_ref, ro_ref, po_ref, rzo_ref, rno_ref, ito_ref, acc_ref,
    ):
        invd = invd_ref[:]
        acc_ref[:] = jnp.zeros_like(acc_ref)
        pf_const_matvec_body(acc_ref, p_ref, C, sm, sm, mask_ref[:], accumulate=True)
        for b in range(d):
            active = rn_ref[b] > tol_ref[b]
            rz = rz_ref[b]
            Ap = acc_ref[b]
            p = p_ref[b]
            pAp = jnp.sum(p * Ap)
            alpha = jnp.where(active, rz / jnp.where(pAp != 0, pAp, 1.0), 0.0)
            xo_ref[b] = x_ref[b] + alpha * p
            r_new = r_ref[b] - alpha * Ap
            ro_ref[b] = r_new
            z = invd * r_new
            rz_new = jnp.where(active, jnp.sum(r_new * z), rz)
            beta = jnp.where(active, rz_new / jnp.where(rz != 0, rz, 1.0), 0.0)
            po_ref[b] = jnp.where(active, z + beta * p, p)
            rzo_ref[b] = rz_new
            rno_ref[b] = jnp.where(active, jnp.sqrt(jnp.sum(r_new * r_new)), rn_ref[b])
            ito_ref[b] = it_ref[b] + active.astype(jnp.int32)

    smem = lambda: pl.BlockSpec(memory_space=pltpu.SMEM)
    vmem = lambda: pl.BlockSpec(memory_space=pltpu.VMEM)

    @jax.jit
    def step(x, r, p, invd, rz, rnorm, iters, tol):
        return pl.pallas_call(
            kernel,
            out_shape=(
                jax.ShapeDtypeStruct(shape, x.dtype),
                jax.ShapeDtypeStruct(shape, x.dtype),
                jax.ShapeDtypeStruct(shape, x.dtype),
                jax.ShapeDtypeStruct((d,), x.dtype),
                jax.ShapeDtypeStruct((d,), x.dtype),
                jax.ShapeDtypeStruct((d,), jnp.int32),
            ),
            in_specs=[vmem()] * 5 + [smem()] * 4,
            out_specs=(vmem(),) * 3 + (smem(),) * 3,
            scratch_shapes=[pltpu.VMEM(shape, x.dtype)],
            input_output_aliases={0: 0, 1: 1, 2: 2},
            compiler_params=_BIG_VMEM,
            interpret=interpret,
        )(x, r, p, invd, jnp.asarray(mask_h, x.dtype), rz, rnorm, iters, tol)

    return step


def cg_pf_solve(iter_fn, matvec, b_pf, x0_pf, invd_pf, rtol, maxiter, atol=1e-50):
    """Batched CG driven by the one-iteration kernel; ``matvec`` does the
    XLA init residual (shares semantics with cg_batched)."""
    d = b_pf.shape[0]
    dt_ = b_pf.dtype
    bnorm = jnp.sqrt(jnp.sum(b_pf * b_pf, axis=(1, 2, 3)))
    tol = jnp.maximum(rtol * bnorm, atol).astype(dt_)
    r0 = b_pf - matvec(x0_pf)
    z0 = invd_pf[None] * r0
    rz0 = jnp.sum(r0 * z0, axis=(1, 2, 3)).astype(dt_)
    rn0 = jnp.sqrt(jnp.sum(r0 * r0, axis=(1, 2, 3))).astype(dt_)

    def cond(c):
        x, r, p, rz, rn, it, k = c
        return jnp.any(rn > tol) & (k < maxiter)

    def body(c):
        x, r, p, rz, rn, it, k = c
        x, r, p, rz, rn, it = iter_fn(x, r, p, invd_pf, rz, rn, it, tol)
        return (x, r, p, rz, rn, it, k + 1)

    x, r, p, rz, rn, it, k = jax.lax.while_loop(
        cond, body, (x0_pf, r0, z0, rz0, rn0, jnp.zeros(d, jnp.int32), jnp.int32(0))
    )
    return x, it, rn, rn <= tol


def make_mixed_pf(sm_v, sm_q, C_all, d, interpret: bool = False):
    """One-op mixed operator r_g = C_g p for all d components (baked
    (d, nl_v, nl_q) cube matrices — the p*v.dx(i) / dp.dx(i)*v assembly,
    reference fracstep.py:489-502, 618).  p: (nch_q, n0+1, L) -> (d,
    nch_v, n0+1, L)."""
    pfs_v, pfs_q = pf_shape(sm_v), pf_shape(sm_q)
    C_all = np.asarray(C_all, np.float64)

    mask_h = _seam_mask(sm_v)

    def kernel(p_ref, mask_ref, out_ref):
        out_ref[:] = jnp.zeros_like(out_ref)
        cells = sm_v[1]
        c0 = cells[0]
        WL = win_len(sm_v)
        so = _pf_slots(sm_v)
        si = _pf_slots(sm_q)
        mask = mask_ref[:]
        for g in range(d):
            for to, (cho, bo0, offo) in enumerate(so):
                tmp = None
                for ti, (chi, bi0, offi) in enumerate(si):
                    c = float(C_all[g][to, ti])
                    if c == 0.0:
                        continue
                    contrib = c * p_ref[chi, bi0 : bi0 + c0, offi : offi + WL]
                    tmp = contrib if tmp is None else tmp + contrib
                if tmp is not None:
                    out_ref[g, cho, bo0 : bo0 + c0, offo : offo + WL] += mask * tmp

    @jax.jit
    def apply(p):
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((d,) + pfs_v, p.dtype),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            compiler_params=_BIG_VMEM,
            interpret=interpret,
        )(p, jnp.asarray(mask_h, p.dtype))

    return apply


def make_divergence_pf(sm_v, sm_q, B_all, d, interpret: bool = False):
    """One-op divergence assembly b2 = sum_g B_g^T u_g (baked (d, nl_v,
    nl_q) cube matrices; reference fracstep.py:527-541).  u: (d, nch_v,
    n0+1, L) -> (nch_q, n0+1, L)."""
    pfs_q = pf_shape(sm_q)
    B_all = np.asarray(B_all, np.float64)

    mask_h = _seam_mask(sm_q)

    def kernel(u_ref, mask_ref, out_ref):
        out_ref[:] = jnp.zeros_like(out_ref)
        cells = sm_v[1]
        c0 = cells[0]
        WL = win_len(sm_v)
        sv = _pf_slots(sm_v)
        sq = _pf_slots(sm_q)
        mask = mask_ref[:]
        for to, (cho, bo0, offo) in enumerate(sq):
            tmp = None
            for g in range(d):
                for ti, (chi, bi0, offi) in enumerate(sv):
                    c = float(B_all[g][ti, to])  # transpose: (nl_v, nl_q)
                    if c == 0.0:
                        continue
                    contrib = c * u_ref[g, chi, bi0 : bi0 + c0, offi : offi + WL]
                    tmp = contrib if tmp is None else tmp + contrib
            if tmp is not None:
                out_ref[cho, bo0 : bo0 + c0, offo : offo + WL] += mask * tmp

    @jax.jit
    def apply(u):
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct(pfs_q, u.dtype),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            compiler_params=_BIG_VMEM,
            interpret=interpret,
        )(u, jnp.asarray(mask_h, u.dtype))

    return apply


def make_matvec_win(sm: StructuredMap, d: int, pair_block: int = 8,
                    interpret: bool = False):
    """One-op batched matvec with streamed windowed weights:
    y = A_W x, x/y plane-flat (d, nch, n0+1, L).  The standalone phase of
    :func:`make_bicgstab_iter` — serves b_first assembly and the BiCGStab
    init residual."""
    pfs = pf_shape(sm)
    shape = (d,) + pfs
    c0 = sm[1][0]
    c0p = _c0_padded(sm)
    WL = win_len(sm)
    WLp = _wl_padded(sm)
    slots = _pf_slots(sm)
    nl = len(slots)
    npairs = nl * nl
    nblocks = -(-npairs // pair_block)

    def kernel(w_hbm, x_ref, y_ref, wbuf, sem):
        def dma(blk, slot):
            a = blk * pair_block
            b = min(a + pair_block, npairs)
            return pltpu.make_async_copy(
                w_hbm.at[pl.ds(a, b - a)], wbuf.at[slot, pl.ds(0, b - a)], sem.at[slot]
            )

        y_ref[:] = jnp.zeros_like(y_ref)
        dma(0, 0).start()
        tmp = None
        to_cur = 0
        for blk in range(nblocks):
            slot = blk % 2
            if blk + 1 < nblocks:
                dma(blk + 1, (blk + 1) % 2).start()
            dma(blk, slot).wait()
            for k in range(pair_block):
                pair = blk * pair_block + k
                if pair >= npairs:
                    break
                to, ti = divmod(pair, nl)
                if to != to_cur:
                    cho, bo0, offo = slots[to_cur]
                    y_ref[:, cho, bo0 : bo0 + c0, offo : offo + WL] += tmp
                    tmp = None
                    to_cur = to
                chi, bi0, offi = slots[ti]
                w = wbuf[slot, k, :c0, :WL]
                contrib = w * x_ref[:, chi, bi0 : bi0 + c0, offi : offi + WL]
                tmp = contrib if tmp is None else tmp + contrib
        cho, bo0, offo = slots[to_cur]
        y_ref[:, cho, bo0 : bo0 + c0, offo : offo + WL] += tmp

    @jax.jit
    def mv(W_win, x):
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct(shape, x.dtype),
            in_specs=[pl.BlockSpec(memory_space=pl.ANY),
                      pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            scratch_shapes=[
                pltpu.VMEM((2, pair_block, c0p, WLp), x.dtype),
                pltpu.SemaphoreType.DMA((2,)),
            ],
            compiler_params=_BIG_VMEM,
            interpret=interpret,
        )(W_win, x)

    return mv


def make_matvec_pf(sm: StructuredMap, C, d: int, interpret: bool = False):
    """One-op batched matvec with a BAKED constant cube matrix (mass /
    stiffness applications), plane-flat layout."""
    pfs = pf_shape(sm)
    shape = (d,) + pfs
    C = np.asarray(C, np.float64)
    mask_h = _seam_mask(sm)

    def kernel(x_ref, mask_ref, y_ref):
        # accumulate straight into the output ref (outputs do not count
        # against the 16 MB scoped-VMEM stack; a scratch accumulator blew
        # it at N=36)
        y_ref[:] = jnp.zeros_like(y_ref)
        pf_const_matvec_body(y_ref, x_ref, C, sm, sm, mask_ref[:], accumulate=True)

    @jax.jit
    def mv(x):
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct(shape, x.dtype),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            compiler_params=_BIG_VMEM,
            interpret=interpret,
        )(x, jnp.asarray(mask_h, x.dtype))

    return mv


# ===========================================================================
# Fused ELL Krylov kernels for the GENERAL (unstructured) path (round 4)
#
# The single-device unstructured configs — DFG cylinder, gmsh imports, any
# mesh without the structured lattice — previously ran ZERO Pallas kernels:
# every Krylov iteration was an XLA gather/einsum body (~40-90 dispatched
# ops) and the AMG-preconditioned pressure CG body alone cost ~90 ops per
# iteration, so a res=40 cylinder step dispatched ~1000 ops and the relay
# cost model (see module docstring) made the TPU no faster than a CPU core.
#
# These kernels collapse each Krylov iteration of the general path into
# ONE op, reusing the ELL take+FMA matvec of the graph-halo shards
# (make_ell_matvec): the operator lives in VMEM as (K, n) vals/cols tables
# (assembled once per solve by ell_values' hoisted segment-sum), and the
# full iteration algebra — matvecs, Jacobi or AMG-V-cycle preconditioning,
# reductions, vector updates, bc-row masking — runs in-kernel.  Semantics
# mirror la/krylov.py bicgstab_batched / cg_batched / cg exactly so the
# XLA and kernel engines converge in the same iterations.
#
# Reference semantics: PETSc KSP solves at
# /root/reference/src/oasisx/fracstep.py:508-525,553-605,607-658 and
# ksp.py:71-78; the AMG V-cycle is la/amg.py:AlgebraicMG (the rebuild's
# stand-in for MUMPS / pc_type gamg|hypre).
# ===========================================================================


def _ell_mv_val(vals_ref, cols_ref, src, K):
    """ELL matvec over a loaded (n,) value: y = sum_k vals[k]*src[cols[k]]."""
    acc = None
    for k in range(K):
        t = vals_ref[k] * jnp.take(src, cols_ref[k], axis=0)
        acc = t if acc is None else acc + t
    return acc


def make_ell_bicgstab_iter(K: int, n: int, nb: int, interpret: bool = False):
    """ONE batched-BiCGStab iteration for an ELL-form operator as a single
    kernel — the unstructured counterpart of :func:`make_bicgstab_iter`.

    fn(vals, cols, x, r, p, rhat, zmask, invd, rho, rnorm, iters, tol)
      -> (x', r', p', rho', rnorm', iters')

    vals/cols (K, n); state (nb, n); scalars (nb,) in SMEM.  ``zmask`` is
    0.0 on Dirichlet rows (bc rows carry the identity; all Krylov vectors
    vanish there when the caller seeds x0's bc rows with the bc values and
    zero-masks r0).  ``invd`` (n,) is the shared Jacobi inverse diagonal.
    Semantics == la/krylov.py:bicgstab_batched (active-row freezing
    included), M = Jacobi."""

    def kernel(vals_ref, cols_ref, x_ref, r_ref, p_ref, rhat_ref, zm_ref,
               invd_ref, rho_ref, rn_ref, it_ref, tol_ref,
               xo_ref, ro_ref, po_ref, rhoo_ref, rno_ref, ito_ref):
        invd = invd_ref[:]
        for b in range(nb):
            active = rn_ref[b] > tol_ref[b]
            act = jnp.where(active, 1.0, 0.0).astype(x_ref.dtype)
            rho = rho_ref[b]
            r = r_ref[b]
            p = p_ref[b]
            rhat = rhat_ref[b]
            zm = zm_ref[b]
            phat = invd * p
            v = zm * _ell_mv_val(vals_ref, cols_ref, phat, K)
            rv = jnp.sum(rhat * v)
            alpha = rho / jnp.where(rv != 0, rv, 1.0)
            s = r - alpha * v
            shat = invd * s
            t = zm * _ell_mv_val(vals_ref, cols_ref, shat, K)
            tt = jnp.sum(t * t)
            omega = jnp.sum(t * s) / jnp.where(tt != 0, tt, 1.0)
            xo_ref[b] = x_ref[b] + act * (alpha * phat + omega * shat)
            r_new = jnp.where(active, s - omega * t, r)
            ro_ref[b] = r_new
            rho_new = jnp.where(active, jnp.sum(rhat * r_new), rho)
            beta = (rho_new / jnp.where(rho != 0, rho, 1.0)) * (
                alpha / jnp.where(omega != 0, omega, 1.0)
            )
            po_ref[b] = jnp.where(active, r_new + beta * (p - omega * v), p)
            rhoo_ref[b] = rho_new
            rno_ref[b] = jnp.where(
                active, jnp.sqrt(jnp.sum(r_new * r_new)), rn_ref[b]
            )
            ito_ref[b] = it_ref[b] + active.astype(jnp.int32)

    smem = lambda: pl.BlockSpec(memory_space=pltpu.SMEM)
    vmem = lambda: pl.BlockSpec(memory_space=pltpu.VMEM)
    shape = (nb, n)

    @jax.jit
    def step(vals, cols, x, r, p, rhat, zmask, invd, rho, rnorm, iters, tol):
        return pl.pallas_call(
            kernel,
            out_shape=(
                jax.ShapeDtypeStruct(shape, x.dtype),   # x'
                jax.ShapeDtypeStruct(shape, x.dtype),   # r'
                jax.ShapeDtypeStruct(shape, x.dtype),   # p'
                jax.ShapeDtypeStruct((nb,), x.dtype),   # rho'
                jax.ShapeDtypeStruct((nb,), x.dtype),   # rnorm'
                jax.ShapeDtypeStruct((nb,), jnp.int32),  # iters'
            ),
            in_specs=[vmem()] * 8 + [smem()] * 4,
            out_specs=(vmem(),) * 3 + (smem(),) * 3,
            input_output_aliases={2: 0, 3: 1, 4: 2},  # x, r, p in-place
            compiler_params=_BIG_VMEM,
            interpret=interpret,
        )(vals, cols, x, r, p, rhat, zmask, invd, rho, rnorm, iters, tol)

    return step


def ell_bicgstab_from_r0(
    iter_fn, vals, cols, r0, x0, zmask, invd, bnorm, rtol, maxiter,
    atol=1e-50,
):
    """Drive the fused ELL BiCGStab iteration from a precomputed
    r0 = zmask * (b - A x0) (caller does the init matvec; x0's bc rows hold
    the bc values so r0 vanishes there).  ``bnorm`` is the per-row ||b||
    INCLUDING bc rows, matching bicgstab_batched."""
    nb = r0.shape[0]
    dt_ = r0.dtype
    red = tuple(range(1, r0.ndim))  # state may be (nb, n) or (nb, R, 128)
    tol = jnp.maximum(rtol * bnorm, atol).astype(dt_)
    rho0 = jnp.sum(r0 * r0, axis=red)
    rnorm0 = jnp.sqrt(rho0)
    rhat = r0

    def cond(c):
        x, r, p, rho, rn, it, k = c
        return jnp.any(rn > tol) & (k < maxiter)

    def body(c):
        x, r, p, rho, rn, it, k = c
        x, r, p, rho, rn, it = iter_fn(
            vals, cols, x, r, p, rhat, zmask, invd, rho, rn, it, tol
        )
        return (x, r, p, rho, rn, it, k + 1)

    x, r, p, rho, rn, it, k = jax.lax.while_loop(
        cond,
        body,
        (x0, r0, r0, rho0.astype(dt_), rnorm0.astype(dt_),
         jnp.zeros(nb, jnp.int32), jnp.int32(0)),
    )
    return x, it, rn, rn <= tol


def make_ell_cg_iter(K: int, n: int, nb: int, interpret: bool = False):
    """ONE batched Jacobi-PCG iteration for an ELL-form operator (the mass
    solves of the velocity update, reference fracstep.py:607-658).

    fn(vals, cols, x, r, p, invd, rz, rnorm, iters, tol)
      -> (x', r', p', rz', rnorm', iters')

    Semantics == la/krylov.py:cg_batched with M = Jacobi(invd)."""

    def kernel(vals_ref, cols_ref, x_ref, r_ref, p_ref, invd_ref,
               rz_ref, rn_ref, it_ref, tol_ref,
               xo_ref, ro_ref, po_ref, rzo_ref, rno_ref, ito_ref):
        invd = invd_ref[:]
        for b in range(nb):
            active = rn_ref[b] > tol_ref[b]
            rz = rz_ref[b]
            p = p_ref[b]
            Ap = _ell_mv_val(vals_ref, cols_ref, p, K)
            pAp = jnp.sum(p * Ap)
            alpha = jnp.where(
                active, rz / jnp.where(pAp != 0, pAp, 1.0), 0.0
            ).astype(x_ref.dtype)
            xo_ref[b] = x_ref[b] + alpha * p
            r_new = r_ref[b] - alpha * Ap
            ro_ref[b] = r_new
            z = invd * r_new
            rz_new = jnp.where(active, jnp.sum(r_new * z), rz)
            beta = jnp.where(
                active, rz_new / jnp.where(rz != 0, rz, 1.0), 0.0
            ).astype(x_ref.dtype)
            po_ref[b] = jnp.where(active, z + beta * p, p)
            rzo_ref[b] = rz_new
            rno_ref[b] = jnp.sqrt(jnp.sum(r_new * r_new))
            ito_ref[b] = it_ref[b] + active.astype(jnp.int32)

    smem = lambda: pl.BlockSpec(memory_space=pltpu.SMEM)
    vmem = lambda: pl.BlockSpec(memory_space=pltpu.VMEM)
    shape = (nb, n)

    @jax.jit
    def step(vals, cols, x, r, p, invd, rz, rnorm, iters, tol):
        return pl.pallas_call(
            kernel,
            out_shape=(
                jax.ShapeDtypeStruct(shape, x.dtype),
                jax.ShapeDtypeStruct(shape, x.dtype),
                jax.ShapeDtypeStruct(shape, x.dtype),
                jax.ShapeDtypeStruct((nb,), x.dtype),
                jax.ShapeDtypeStruct((nb,), x.dtype),
                jax.ShapeDtypeStruct((nb,), jnp.int32),
            ),
            in_specs=[vmem()] * 6 + [smem()] * 4,
            out_specs=(vmem(),) * 3 + (smem(),) * 3,
            input_output_aliases={2: 0, 3: 1, 4: 2},
            compiler_params=_BIG_VMEM,
            interpret=interpret,
        )(vals, cols, x, r, p, invd, rz, rnorm, iters, tol)

    return step


def ell_cg_batched_from_r0(
    iter_fn, vals, cols, r0, x0, invd, bnorm, rtol, maxiter, atol=1e-50
):
    """Drive the fused batched CG from r0 = b - A x0 (caller's matvec)."""
    nb = r0.shape[0]
    dt_ = r0.dtype
    red = tuple(range(1, r0.ndim))  # state may be (nb, n) or (nb, R, 128)
    tol = jnp.maximum(rtol * bnorm, atol).astype(dt_)
    z0 = invd[None] * r0
    rz0 = jnp.sum(r0 * z0, axis=red).astype(dt_)
    rn0 = jnp.sqrt(jnp.sum(r0 * r0, axis=red)).astype(dt_)

    def cond(c):
        x, r, p, rz, rn, it, k = c
        return jnp.any(rn > tol) & (k < maxiter)

    def body(c):
        x, r, p, rz, rn, it, k = c
        x, r, p, rz, rn, it = iter_fn(
            vals, cols, x, r, p, invd, rz, rn, it, tol
        )
        return (x, r, p, rz, rn, it, k + 1)

    x, r, p, rz, rn, it, k = jax.lax.while_loop(
        cond, body,
        (x0, r0, z0, rz0, rn0, jnp.zeros(nb, jnp.int32), jnp.int32(0)),
    )
    return x, it, rn, rn <= tol


def amg_kernel_data(amg):
    """Flatten an ``la.amg.AlgebraicMG`` into (meta, device arrays) for the
    in-kernel V-cycle: per level [Avals, Acols, sm, Pvals, Pcols, Rvals,
    Rcols] in the (K, n) kernel layout, then coarse_inv TRANSPOSED (the
    in-kernel coarse solve is a broadcast-multiply + sublane reduction,
    z_c[j] = sum_i CinvT[i, j] r[i]), then the nullspace vector if any."""
    meta_levels, arrays = [], []
    for lv in amg.levels:
        Ac, Av = lv["A"]
        Pc, Pv = lv["P"]
        Rc, Rv = lv["R"]
        meta_levels.append(
            dict(
                n=int(lv["n"]), nc=int(lv["nc"]),
                K_A=int(Ac.shape[1]), K_P=int(Pc.shape[1]),
                K_R=int(Rc.shape[1]),
            )
        )
        arrays += [
            jnp.asarray(Av).T, jnp.asarray(Ac, jnp.int32).T,
            jnp.asarray(lv["sm"]),
            jnp.asarray(Pv).T, jnp.asarray(Pc, jnp.int32).T,
            jnp.asarray(Rv).T, jnp.asarray(Rc, jnp.int32).T,
        ]
    arrays.append(jnp.asarray(amg.coarse_inv).T)
    meta = dict(
        levels=meta_levels,
        coarse_n=int(amg.coarse_n),
        pre=int(amg.pre),
        post=int(amg.post),
        has_null=amg.nullvec is not None,
    )
    if amg.nullvec is not None:
        arrays.append(jnp.asarray(amg.nullvec))
    return meta, arrays


def amg_data_bytes(meta, arrays):
    return int(sum(a.size * a.dtype.itemsize for a in arrays))


def _unpack_amg_refs(meta, refs):
    """refs -> (per-level dicts, coarse_inv_T ref, nullvec ref or None,
    leftover refs)."""
    lrefs, i = [], 0
    for _ in meta["levels"]:
        lrefs.append(
            dict(
                Av=refs[i], Ac=refs[i + 1], sm=refs[i + 2],
                Pv=refs[i + 3], Pc=refs[i + 4],
                Rv=refs[i + 5], Rc=refs[i + 6],
            )
        )
        i += 7
    cinvT = refs[i]
    i += 1
    nullv = None
    if meta["has_null"]:
        nullv = refs[i]
        i += 1
    return lrefs, cinvT, nullv, refs[i:]


def _emit_vcycle(meta, lrefs, cinvT_ref, nullvec_ref, r):
    """Unrolled symmetric V(pre,post) cycle over the ELL level tables —
    the in-kernel mirror of la/amg.py:AlgebraicMG.vcycle (identical
    operation order so PCG converges in the same iterations)."""

    def project(v):
        nv = nullvec_ref[:]
        return v - (jnp.sum(nv * v) / jnp.sum(nv * nv)) * nv

    if meta["has_null"]:
        r = project(r)
    rs, zs = [r], []
    for l, m in enumerate(meta["levels"]):
        lr = lrefs[l]
        sm = lr["sm"][:]
        z = sm * rs[l]
        for _ in range(meta["pre"] - 1):
            z = z + sm * (rs[l] - _ell_mv_val(lr["Av"], lr["Ac"], z, m["K_A"]))
        resid = rs[l] - _ell_mv_val(lr["Av"], lr["Ac"], z, m["K_A"])
        rc = _ell_mv_val(lr["Rv"], lr["Rc"], resid, m["K_R"])
        zs.append(z)
        rs.append(rc)
    # coarsest: dense pseudo-inverse, z_c = pinv @ r  (CinvT stored)
    rL = rs[-1]
    z = jnp.sum(cinvT_ref[:] * rL[:, None], axis=0)
    for l in reversed(range(len(meta["levels"]))):
        m, lr = meta["levels"][l], lrefs[l]
        sm = lr["sm"][:]
        zl = zs[l] + _ell_mv_val(lr["Pv"], lr["Pc"], z, m["K_P"])
        for _ in range(meta["post"]):
            zl = zl + sm * (rs[l] - _ell_mv_val(lr["Av"], lr["Ac"], zl, m["K_A"]))
        z = zl
    if meta["has_null"]:
        z = project(z)
    return z


def make_ell_vcycle(meta, n0: int, interpret: bool = False):
    """The whole AMG V-cycle as ONE kernel: fn(*amg_arrays, r) -> z.
    Used for the PCG init z0 = M(r0); the per-iteration application is
    fused into :func:`make_ell_pcg_amg_iter`."""
    nref = len(meta["levels"]) * 7 + 1 + (1 if meta["has_null"] else 0)

    def kernel(*refs):
        lrefs, cinvT, nullv, rest = _unpack_amg_refs(meta, list(refs))
        r_ref, z_ref = rest
        z_ref[:] = _emit_vcycle(meta, lrefs, cinvT, nullv, r_ref[:])

    vmem = lambda: pl.BlockSpec(memory_space=pltpu.VMEM)

    @jax.jit
    def vcycle(*args):
        r = args[-1]
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((n0,), r.dtype),
            in_specs=[vmem()] * (nref + 1),
            out_specs=vmem(),
            compiler_params=_BIG_VMEM,
            interpret=interpret,
        )(*args)

    return vcycle


def make_ell_pcg_amg_iter(
    meta, K0: int, n0: int, has_mask: bool, interpret: bool = False
):
    """ONE AMG-preconditioned CG iteration for the unstructured pressure
    Poisson as a single kernel: the fine ELL matvec, the full in-kernel
    V-cycle, and the CG vector updates/reductions.

    fn(vals0, cols0, *amg_arrays, [mask], x, r, p, rz, rnorm, brk)
      -> (x', r', p', rz', rnorm', brk')

    ``mask`` (present iff has_mask) is 1.0 on outlet-Dirichlet rows: the
    matvec is then  where(mask, p, A (1-mask) p)  — identical to
    engine.bc_symmetric_matvec.  When meta['has_null'], A p is projected
    against the nullspace vector (cg's demean) and the V-cycle projects
    input/output.  Semantics == la/krylov.py:cg (incl. the pAp/rz
    breakdown flags)."""
    namg = len(meta["levels"]) * 7 + 1 + (1 if meta["has_null"] else 0)

    def kernel(*refs):
        vals0, cols0 = refs[0], refs[1]
        lrefs, cinvT, nullv, rest = _unpack_amg_refs(meta, list(refs[2:]))
        if has_mask:
            mask_ref = rest[0]
            rest = rest[1:]
        (x_ref, r_ref, p_ref, rz_ref, rn_ref, brk_ref,
         xo_ref, ro_ref, po_ref, rzo_ref, rno_ref, brko_ref) = rest

        p = p_ref[:]
        if has_mask:
            mask = mask_ref[:]
            Ap = _ell_mv_val(vals0, cols0, (1.0 - mask) * p, K0)
            Ap = mask * p + (1.0 - mask) * Ap
        else:
            Ap = _ell_mv_val(vals0, cols0, p, K0)
        if meta["has_null"]:
            nv = nullv[:]
            Ap = Ap - (jnp.sum(nv * Ap) / jnp.sum(nv * nv)) * nv
        rz = rz_ref[0]
        pAp = jnp.sum(p * Ap)
        brk = brk_ref[0] | (pAp == 0).astype(jnp.int32)
        alpha = rz / jnp.where(pAp != 0, pAp, 1.0)
        xo_ref[:] = x_ref[:] + alpha * p
        r_new = r_ref[:] - alpha * Ap
        ro_ref[:] = r_new
        z = _emit_vcycle(meta, lrefs, cinvT, nullv, r_new)
        rz_new = jnp.sum(r_new * z)
        brk = brk | (rz == 0).astype(jnp.int32)
        beta = rz_new / jnp.where(rz != 0, rz, 1.0)
        po_ref[:] = z + beta * p
        rzo_ref[0] = rz_new
        rno_ref[0] = jnp.sqrt(jnp.sum(r_new * r_new))
        brko_ref[0] = brk

    smem = lambda: pl.BlockSpec(memory_space=pltpu.SMEM)
    vmem = lambda: pl.BlockSpec(memory_space=pltpu.VMEM)
    n_in = 2 + namg + (1 if has_mask else 0) + 3

    @jax.jit
    def step(*args):
        x = args[-6]
        return pl.pallas_call(
            kernel,
            out_shape=(
                jax.ShapeDtypeStruct((n0,), x.dtype),
                jax.ShapeDtypeStruct((n0,), x.dtype),
                jax.ShapeDtypeStruct((n0,), x.dtype),
                jax.ShapeDtypeStruct((1,), x.dtype),
                jax.ShapeDtypeStruct((1,), x.dtype),
                jax.ShapeDtypeStruct((1,), jnp.int32),
            ),
            in_specs=[vmem()] * n_in + [smem()] * 3,
            out_specs=(vmem(),) * 3 + (smem(),) * 3,
            input_output_aliases={n_in - 3: 0, n_in - 2: 1, n_in - 1: 2},
            compiler_params=_BIG_VMEM,
            interpret=interpret,
        )(*args)

    return step


def ell_pcg_amg_solve(
    iter_fn, vcycle_fn, matvec_fn, amg_arrays, vals0, cols0, b, x0,
    rtol, maxiter, atol=1e-50, mask=None, nullvec=None,
):
    """AMG-preconditioned CG driven by the one-iteration kernel — the XLA
    while_loop carries (x, r, p, rz, rnorm, brk, k) and the body is ONE op.
    Mirrors la/krylov.py:cg with project_nullspace=(nullvec is not None):
    b and r0 demeaned, A p demeaned in-kernel, x demeaned on exit.
    ``matvec_fn`` is the caller's one-op fine matvec (mask wrap included)
    used once for r0."""
    dt_ = b.dtype

    if nullvec is not None:
        ee = jnp.vdot(nullvec, nullvec)
        demean = lambda v: v - (jnp.vdot(nullvec, v) / ee) * nullvec
    else:
        demean = lambda v: v

    b = demean(b)
    bnorm = jnp.sqrt(jnp.sum(b * b))
    tol = jnp.maximum(rtol * bnorm, atol).astype(dt_)
    r0 = demean(b - matvec_fn(x0))
    z0 = vcycle_fn(*amg_arrays, r0)
    rz0 = jnp.sum(r0 * z0).reshape(1).astype(dt_)
    rn0 = jnp.sqrt(jnp.sum(r0 * r0)).reshape(1).astype(dt_)
    extra = (mask,) if mask is not None else ()

    def cond(c):
        x, r, p, rz, rn, brk, k = c
        return (rn[0] > tol) & (k < maxiter) & (brk[0] == 0)

    def body(c):
        x, r, p, rz, rn, brk, k = c
        x, r, p, rz, rn, brk = iter_fn(
            vals0, cols0, *amg_arrays, *extra, x, r, p, rz, rn, brk
        )
        return (x, r, p, rz, rn, brk, k + 1)

    x, r, p, rz, rn, brk, k = jax.lax.while_loop(
        cond, body,
        (x0, r0, z0, rz0, rn0, jnp.zeros(1, jnp.int32), jnp.int32(0)),
    )
    if nullvec is not None:
        x = demean(x)
    conv = rn[0] <= tol
    return x, k, rn[0], conv


# ---------------------------------------------------------------------------
# band-ELL kernels: unstructured operators on hardware whose Mosaic only
# lowers 2D take_along_axis (assembly/band.py builds the tables; vectors
# live as RCM-permuted (R, 128) lane tiles inside the solve)
# ---------------------------------------------------------------------------


def _band_shift_frame(x2, s: int, Rr: int):
    """O_s[rb] = x2[rb + s] where in range, else 0 — the static
    shift-into-frame of the source tiles (two static slices + zero fill;
    also reframes an (Rc, 128) source into Rr output rows for
    rectangular operators)."""
    Rc, lane = x2.shape
    a = max(0, -s)
    b = min(Rr, Rc - s)
    if b <= a:
        return jnp.zeros((Rr, lane), x2.dtype)
    parts = []
    if a > 0:
        parts.append(jnp.zeros((a, lane), x2.dtype))
    parts.append(x2[a + s : b + s])
    if Rr - b > 0:
        parts.append(jnp.zeros((Rr - b, lane), x2.dtype))
    return parts[0] if len(parts) == 1 else jnp.concatenate(parts, axis=0)


def _band_mv_val(vals_ref, cols_ref, shifts, x2, Rr: int):
    """y2 = A x2 with A in band-ELL form (assembly/band.py):

        y2[rb, j] = sum_slot vals[slot, rb, j]
                    * frame(x2, shifts[slot])[rb, cols[slot, rb, j]]

    Lane gathers + static shifts only — Mosaic-legal on every TPU
    generation (slots are sorted by shift so each frame is built once)."""
    acc = None
    cur, xs = None, None
    for i, s in enumerate(shifts):
        if s != cur:
            xs = _band_shift_frame(x2, s, Rr)
            cur = s
        t = vals_ref[i] * jnp.take_along_axis(xs, cols_ref[i], axis=1)
        acc = t if acc is None else acc + t
    if acc is None:
        acc = jnp.zeros((Rr, x2.shape[1]), x2.dtype)
    return acc


def make_band_matvec_batched(
    shifts: tuple, Rr: int, Rc: int, nb: int, interpret: bool = False
):
    """Batched band-ELL matvec: fn(vals (S,Rr,128), cols (S,Rr,128) i32,
    x (nb,Rc,128)) -> (nb,Rr,128)."""
    S = len(shifts)

    def kernel(vals_ref, cols_ref, x_ref, y_ref):
        for b in range(nb):
            y_ref[b] = _band_mv_val(vals_ref, cols_ref, shifts, x_ref[b], Rr)

    @jax.jit
    def mv(vals, cols, x):
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((nb, Rr, 128), x.dtype),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 3,
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            compiler_params=_BIG_VMEM,
            interpret=interpret,
        )(vals, cols, x)

    return mv


def make_band_bicgstab_iter(
    shifts: tuple, R: int, nb: int, interpret: bool = False
):
    """ONE batched-BiCGStab iteration for a band-ELL operator as a single
    kernel — semantics identical to make_ell_bicgstab_iter (== la/krylov
    bicgstab_batched, M = Jacobi, bc rows via zmask + preseeded x0), with
    state in RCM-permuted (nb, R, 128) lane tiles.  Driven by
    ell_bicgstab_from_r0 (rank-agnostic reductions)."""

    def kernel(vals_ref, cols_ref, x_ref, r_ref, p_ref, rhat_ref, zm_ref,
               invd_ref, rho_ref, rn_ref, it_ref, tol_ref,
               xo_ref, ro_ref, po_ref, rhoo_ref, rno_ref, ito_ref):
        invd = invd_ref[:]
        for b in range(nb):
            active = rn_ref[b] > tol_ref[b]
            act = jnp.where(active, 1.0, 0.0).astype(x_ref.dtype)
            rho = rho_ref[b]
            r = r_ref[b]
            p = p_ref[b]
            rhat = rhat_ref[b]
            zm = zm_ref[b]
            phat = invd * p
            v = zm * _band_mv_val(vals_ref, cols_ref, shifts, phat, R)
            rv = jnp.sum(rhat * v)
            alpha = rho / jnp.where(rv != 0, rv, 1.0)
            s = r - alpha * v
            shat = invd * s
            t = zm * _band_mv_val(vals_ref, cols_ref, shifts, shat, R)
            tt = jnp.sum(t * t)
            omega = jnp.sum(t * s) / jnp.where(tt != 0, tt, 1.0)
            xo_ref[b] = x_ref[b] + act * (alpha * phat + omega * shat)
            r_new = jnp.where(active, s - omega * t, r)
            ro_ref[b] = r_new
            rho_new = jnp.where(active, jnp.sum(rhat * r_new), rho)
            beta = (rho_new / jnp.where(rho != 0, rho, 1.0)) * (
                alpha / jnp.where(omega != 0, omega, 1.0)
            )
            po_ref[b] = jnp.where(active, r_new + beta * (p - omega * v), p)
            rhoo_ref[b] = rho_new
            rno_ref[b] = jnp.where(
                active, jnp.sqrt(jnp.sum(r_new * r_new)), rn_ref[b]
            )
            ito_ref[b] = it_ref[b] + active.astype(jnp.int32)

    smem = lambda: pl.BlockSpec(memory_space=pltpu.SMEM)
    vmem = lambda: pl.BlockSpec(memory_space=pltpu.VMEM)
    shape = (nb, R, 128)

    @jax.jit
    def step(vals, cols, x, r, p, rhat, zmask, invd, rho, rnorm, iters, tol):
        return pl.pallas_call(
            kernel,
            out_shape=(
                jax.ShapeDtypeStruct(shape, x.dtype),   # x'
                jax.ShapeDtypeStruct(shape, x.dtype),   # r'
                jax.ShapeDtypeStruct(shape, x.dtype),   # p'
                jax.ShapeDtypeStruct((nb,), x.dtype),   # rho'
                jax.ShapeDtypeStruct((nb,), x.dtype),   # rnorm'
                jax.ShapeDtypeStruct((nb,), jnp.int32),  # iters'
            ),
            in_specs=[vmem()] * 8 + [smem()] * 4,
            out_specs=(vmem(),) * 3 + (smem(),) * 3,
            input_output_aliases={2: 0, 3: 1, 4: 2},
            compiler_params=_BIG_VMEM,
            interpret=interpret,
        )(vals, cols, x, r, p, rhat, zmask, invd, rho, rnorm, iters, tol)

    return step


def make_band_cg_iter(shifts: tuple, R: int, nb: int, interpret: bool = False):
    """ONE batched Jacobi-PCG iteration for a band-ELL operator (the mass
    solves of the velocity update) — semantics == make_ell_cg_iter with
    (nb, R, 128) state.  Driven by ell_cg_batched_from_r0."""

    def kernel(vals_ref, cols_ref, x_ref, r_ref, p_ref, invd_ref,
               rz_ref, rn_ref, it_ref, tol_ref,
               xo_ref, ro_ref, po_ref, rzo_ref, rno_ref, ito_ref):
        invd = invd_ref[:]
        for b in range(nb):
            active = rn_ref[b] > tol_ref[b]
            rz = rz_ref[b]
            p = p_ref[b]
            Ap = _band_mv_val(vals_ref, cols_ref, shifts, p, R)
            pAp = jnp.sum(p * Ap)
            alpha = jnp.where(
                active, rz / jnp.where(pAp != 0, pAp, 1.0), 0.0
            ).astype(x_ref.dtype)
            xo_ref[b] = x_ref[b] + alpha * p
            r_new = r_ref[b] - alpha * Ap
            ro_ref[b] = r_new
            z = invd * r_new
            rz_new = jnp.where(active, jnp.sum(r_new * z), rz)
            beta = jnp.where(
                active, rz_new / jnp.where(rz != 0, rz, 1.0), 0.0
            ).astype(x_ref.dtype)
            po_ref[b] = jnp.where(active, z + beta * p, p)
            rzo_ref[b] = rz_new
            rno_ref[b] = jnp.sqrt(jnp.sum(r_new * r_new))
            ito_ref[b] = it_ref[b] + active.astype(jnp.int32)

    smem = lambda: pl.BlockSpec(memory_space=pltpu.SMEM)
    vmem = lambda: pl.BlockSpec(memory_space=pltpu.VMEM)
    shape = (nb, R, 128)

    @jax.jit
    def step(vals, cols, x, r, p, invd, rz, rnorm, iters, tol):
        return pl.pallas_call(
            kernel,
            out_shape=(
                jax.ShapeDtypeStruct(shape, x.dtype),
                jax.ShapeDtypeStruct(shape, x.dtype),
                jax.ShapeDtypeStruct(shape, x.dtype),
                jax.ShapeDtypeStruct((nb,), x.dtype),
                jax.ShapeDtypeStruct((nb,), x.dtype),
                jax.ShapeDtypeStruct((nb,), jnp.int32),
            ),
            in_specs=[vmem()] * 6 + [smem()] * 4,
            out_specs=(vmem(),) * 3 + (smem(),) * 3,
            input_output_aliases={2: 0, 3: 1, 4: 2},
            compiler_params=_BIG_VMEM,
            interpret=interpret,
        )(vals, cols, x, r, p, invd, rz, rnorm, iters, tol)

    return step
