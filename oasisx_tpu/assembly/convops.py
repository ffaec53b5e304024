"""Conv-lowered cube operators: each operator application is TWO XLA convs.

Lowering of the cube-batched formulation (assembly/cubes.py) onto the TPU
convolution engine.  With the parity-split grid viewed as an s^d-channel
image over the (n_0+1, ..., n_{d-1}+1) macro-cell lattice:

  gather + matmul:  U' = C @ U  becomes ONE `conv_general_dilated` with a
      (2,)*d kernel whose taps fold the cube matrix:
          K_G[delta, p, j] = C[j, t(p, delta)],  t(p, delta) = p + s*delta
      VALID padding — output lives on cube centers, only real cells
      contribute, so the result is exact everywhere (no ghost corrections).
  scatter:  y[p, b] = sum_delta U'[t(p, delta), b - delta]  becomes ONE
      `conv_transpose` with the indicator kernel
          K_S[delta, j, p] = 1[j == t(p, delta)].

Why this beats both the per-cell element stacks and the slice-based cube
path on this backend: the executor pays a fixed per-op cost (~35-70 us
through the remote relay) and the slice formulation is ~60 ops per matvec;
this is 2.  The convolution itself is MXU work.

Velocity components ride the conv BATCH dimension (or the channel
dimension where a per-component matrix must be folded), so all d tentative
/ update solves share each op.

Everything here is differentially tested against assembly/cubes.py
(tests/test_convops.py), which is itself tested against the general
engine — the chain grounds out at the NumPy oracle (SURVEY §4 strategy).
"""

from __future__ import annotations

import itertools
from dataclasses import dataclass, field

import numpy as np

import jax
import jax.numpy as jnp

from .cubes import CubeOps
from .structured import StructuredMap

# dimension_numbers: lhs (N, C, *spatial), kernel (*spatial, I, O)
def _dn(d: int):
    sp = "DHW"[-d:] if d <= 3 else None
    return ("NC" + sp, sp + "IO", "NC" + sp)


def _slots(sm: StructuredMap):
    """All (delta, parity) -> slot mappings for one space.

    Returns (deg, d, list of (delta tuple, parity index, slot index))."""
    _, cells, deg, _, _ = sm
    d = len(cells)
    out = []
    for delta in itertools.product((0, 1), repeat=d):
        for p in itertools.product(*(range(deg) for _ in range(d))):
            t = tuple(p[k] + deg * delta[k] for k in range(d))
            if any(tk > deg for tk in t):
                continue
            p_idx = int(np.ravel_multi_index(p, (deg,) * d))
            t_idx = int(np.ravel_multi_index(t, (deg + 1,) * d))
            out.append((delta, p_idx, t_idx))
    return deg, d, out


def gather_kernel(C: np.ndarray, sm_in: StructuredMap) -> np.ndarray:
    """K_G (2,..,2, s^d_in, nrows(C)) folding C into the gather conv:
    conv(x, K_G) == C @ cube_gather(x)."""
    deg, d, maps = _slots(sm_in)
    C = np.asarray(C)
    nrows = C.shape[0]
    K = np.zeros((2,) * d + (deg**d, nrows))
    for delta, p_idx, t_idx in maps:
        K[delta + (p_idx,)] += C[:, t_idx]
    return K


def _flip(K: np.ndarray, d: int) -> np.ndarray:
    """jax.lax.conv_transpose applies the spatially-flipped kernel
    (measured: y[b] = sum_delta u[b - delta] * K[1 - delta] for size-2
    kernels), so scatter kernels are stored pre-flipped."""
    return K[(slice(None, None, -1),) * d]


def scatter_kernel(C: np.ndarray | None, sm_out: StructuredMap, nl_in: int | None = None) -> np.ndarray:
    """K_S (2,..,2, ncols, s^d_out) such that
    conv_transpose(U, K_S, 'VALID') == cube_scatter(C @ U)
    (C=None: identity — plain indicator scatter)."""
    deg, d, maps = _slots(sm_out)
    nl = (deg + 1) ** d
    if C is None:
        C = np.eye(nl) if nl_in is None else np.eye(nl)[:, :nl_in]
    C = np.asarray(C)
    ncols = C.shape[1]
    K = np.zeros((2,) * d + (ncols, deg**d))
    for delta, p_idx, t_idx in maps:
        K[delta + (slice(None), p_idx)] += C[t_idx, :]
    return _flip(K, d)


@jax.tree_util.register_dataclass
@dataclass
class ConvOps:
    """Conv kernels for the full operator set of one (V, Q) pair."""

    # square V operators: gather kernels (matrix folded) + shared V scatter
    KM_g: jax.Array  # mass
    KK_g: jax.Array  # stiffness
    KS_v: jax.Array  # indicator scatter (nl_v -> s^d parities)
    # square Q operators
    KAp_g: jax.Array
    KMq_g: jax.Array
    KS_q: jax.Array
    # divergence: V channels (d*s^d) -> nl_q, then scatter to Q
    KDiv_g: jax.Array
    # mixed (Q -> per-component V): plain Q gather + scatter with B folded
    KQid_g: jax.Array  # identity gather on Q: (2..., s^d_q, nl_q)
    KB_s: jax.Array  # (2..., nl_q, d*s^d_v)
    KG_s: jax.Array  # same for p.dx(i) v
    # convection tables
    KPhi_g: jax.Array  # (2..., s^d_v, Q)   values at qp
    KDg_g: jax.Array  # (2..., s^d_v, Q*d)  gradients at qp
    KPw_s: jax.Array  # (2..., Q*d, s^d_v)  test contraction, repeated over g
    KEd_s: jax.Array  # (2..., Q*d, s^d_v)  convection diagonal
    # static metadata
    sm_v: tuple = field(metadata=dict(static=True))
    sm_q: tuple = field(metadata=dict(static=True))

    @property
    def dim(self) -> int:
        return len(self.sm_v[1])


def build_conv_ops(cu: CubeOps, dtype) -> ConvOps:
    sm_v, sm_q = cu.sm_v, cu.sm_q
    d = len(sm_v[1])
    f = lambda x: jnp.asarray(x, dtype=dtype)
    n = lambda x: np.asarray(x, dtype=np.float64)

    M_c, K_c = n(cu.M_c), n(cu.K_c)
    Ap_c, Mq_c = n(cu.Ap_c), n(cu.Mq_c)
    B_c, G_c = n(cu.B_c), n(cu.G_c)
    Phi, Dg, PhiW, Ediag = n(cu.Phi), n(cu.Dg), n(cu.PhiW), n(cu.Ediag)
    Q, _, nl_v = Dg.shape
    nl_q = Ap_c.shape[0]
    sd_v = sm_v[2] ** d  # parity channels of V

    # divergence: sum_g B_g^T applied to component g. Input channels (g, p):
    # K[delta, (g,p), tq'] = B_g[t_v(p,delta), tq']
    deg_v, _, maps_v = _slots(sm_v)
    KDiv = np.zeros((2,) * d + (d * sd_v, nl_q))
    for delta, p_idx, t_idx in maps_v:
        for g in range(d):
            KDiv[delta + (g * sd_v + p_idx,)] += B_c[g][t_idx, :]

    # mixed scatter with per-component fold: K[delta, tq', (g,p)] = B_g[t_v(p,delta), tq']
    def mixed_scatter(C_all):
        K = np.zeros((2,) * d + (nl_q, d * sd_v))
        for delta, p_idx, t_idx in maps_v:
            for g in range(d):
                K[delta + (slice(None), g * sd_v + p_idx)] += C_all[g][t_idx, :]
        return _flip(K, d)

    # convection scatter kernels: y27[t] = sum_{q,g} PhiW[q,t] dotted[(q,g)]
    # K[delta, (q,g), p] = PhiW[q, t(p,delta)]  (repeated over g)
    KPw = np.zeros((2,) * d + (Q, d, sd_v))
    KEd = np.zeros((2,) * d + (Q, d, sd_v))
    for delta, p_idx, t_idx in maps_v:
        for g in range(d):
            KPw[delta + (slice(None), g, p_idx)] += PhiW[:, t_idx]
            KEd[delta + (slice(None), g, p_idx)] += Ediag[:, g, t_idx]
    KPw = _flip(KPw.reshape((2,) * d + (Q * d, sd_v)), d)
    KEd = _flip(KEd.reshape((2,) * d + (Q * d, sd_v)), d)

    return ConvOps(
        KM_g=f(gather_kernel(M_c, sm_v)),
        KK_g=f(gather_kernel(K_c, sm_v)),
        KS_v=f(scatter_kernel(None, sm_v)),
        KAp_g=f(gather_kernel(Ap_c, sm_q)),
        KMq_g=f(gather_kernel(Mq_c, sm_q)),
        KS_q=f(scatter_kernel(None, sm_q)),
        KDiv_g=f(KDiv),
        KQid_g=f(gather_kernel(np.eye(nl_q), sm_q)),
        KB_s=f(mixed_scatter(B_c)),
        KG_s=f(mixed_scatter(G_c)),
        KPhi_g=f(gather_kernel(Phi, sm_v)),
        KDg_g=f(gather_kernel(Dg.reshape(Q * d, nl_v), sm_v)),
        KPw_s=f(KPw),
        KEd_s=f(KEd),
        sm_v=sm_v,
        sm_q=sm_q,
    )


# ---------------------------------------------------------------------------
# application
# ---------------------------------------------------------------------------


def _grid(x: jax.Array, sm: StructuredMap) -> jax.Array:
    """(B, npad) or (npad,) -> (B, s^d, *spatial)."""
    _, cells, deg, _, _ = sm
    d = len(cells)
    sp = tuple(c + 1 for c in cells)
    if x.ndim == 1:
        x = x[None]
    return x.reshape((x.shape[0], deg**d) + sp)


def _flat(g: jax.Array, batched: bool) -> jax.Array:
    out = g.reshape(g.shape[0], -1)
    return out if batched else out[0]


def _conv(x, K, d):
    return jax.lax.conv_general_dilated(
        x, K, (1,) * d, "VALID", dimension_numbers=_dn(d),
        precision=jax.lax.Precision.HIGHEST,
    )


def _convT(u, K, d):
    return jax.lax.conv_transpose(
        u, K, (1,) * d, "VALID", dimension_numbers=_dn(d),
        precision=jax.lax.Precision.HIGHEST,
    )


def _psum(y, axis):
    return y if axis is None else jax.lax.psum(y, axis)


def matvec(x: jax.Array, KG: jax.Array, KS: jax.Array, sm: StructuredMap, axis=None):
    """y = A x (batched over leading dim if 2-D input)."""
    batched = x.ndim == 2
    d = len(sm[1])
    u = _conv(_grid(x, sm), KG, d)
    return _psum(_flat(_convT(u, KS, d), batched), axis)


def mixed_apply(p: jax.Array, ops: ConvOps, KS_mixed: jax.Array, axis=None) -> jax.Array:
    """r_g = B_g p for all components: (d, npad_v) from Q-vector p."""
    d = ops.dim
    u = _conv(_grid(p, ops.sm_q), ops.KQid_g, d)
    y = _convT(u, KS_mixed, d)  # (1, d*s^d_v, *spatial_v)
    return _psum(y.reshape(d, -1), axis)


def divergence(u3: jax.Array, ops: ConvOps, axis=None) -> jax.Array:
    """b2 = sum_g B_g^T u_g from (d, npad_v)."""
    d = ops.dim
    g = _grid(u3, ops.sm_v)  # (d, s^d, *sp)
    x = g.reshape((1, -1) + g.shape[2:])  # channels (g, p)
    t = _conv(x, ops.KDiv_g, d)
    return _psum(_flat(_convT(t, ops.KS_q, d), False), axis)


def conv_uqg(ops: ConvOps, uab: jax.Array) -> jax.Array:
    """Convecting velocity at qp arranged for the matvec fold:
    (1, Q*d, *cube_spatial) with channel (q, g)."""
    d = ops.dim
    vals = _conv(_grid(uab, ops.sm_v), ops.KPhi_g, d)  # (d, Q, *cube)
    # -> (1, Q*d, *cube) with channel-major (q, g)
    perm = jnp.moveaxis(vals, 0, 1)  # (Q, d, *cube)
    return perm.reshape((1, -1) + perm.shape[2:])


def conv_term(ops: ConvOps, uqg: jax.Array, x: jax.Array, scatter_K=None, axis=None):
    """y = C(uab) x via the quadrature factorization: one gradient conv, an
    elementwise product with uqg, one test-contraction transpose conv."""
    d = ops.dim
    g = _conv(_grid(x, ops.sm_v), ops.KDg_g, d)  # (B, Q*d, *cube)
    dotted = g * uqg
    K = ops.KPw_s if scatter_K is None else scatter_K
    y = _convT(dotted, K, d)
    return _psum(_flat(y, x.ndim == 2), axis)


def conv_diag(ops: ConvOps, uqg: jax.Array, axis=None) -> jax.Array:
    """Assembled diagonal of C(uab): one transpose conv of uqg."""
    d = ops.dim
    y = _convT(uqg, ops.KEd_s, d)
    return _psum(_flat(y, False), axis)


def tentative_matvec(ops: ConvOps, a, b, uqg, x, axis=None):
    """y = [a*M + b*K + 1/2 C(uab)] x, batched over components.

    a, b are traced scalars; the M/K gather convs share the input grid."""
    d = ops.dim
    xg = _grid(x, ops.sm_v)
    u = a * _conv(xg, ops.KM_g, d) + b * _conv(xg, ops.KK_g, d)
    y0 = _convT(u, ops.KS_v, d)
    g = _conv(xg, ops.KDg_g, d)
    y1 = _convT(g * uqg, ops.KPw_s, d)
    return _psum(_flat(y0 + 0.5 * y1, x.ndim == 2), axis)


def rhs_matvec(ops: ConvOps, a, b, uqg, x, axis=None):
    """y = [a*M + b*K - 1/2 C(uab)] x (the explicit RHS operator)."""
    d = ops.dim
    xg = _grid(x, ops.sm_v)
    u = a * _conv(xg, ops.KM_g, d) + b * _conv(xg, ops.KK_g, d)
    y0 = _convT(u, ops.KS_v, d)
    g = _conv(xg, ops.KDg_g, d)
    y1 = _convT(g * uqg, ops.KPw_s, d)
    return _psum(_flat(y0 - 0.5 * y1, x.ndim == 2), axis)


# ---------------------------------------------------------------------------
# exact-movement variant: indicator convs on a 3-way bfloat16 split
#
# The folded kernels above need precision=HIGHEST on TPU (f32 conv operands
# are rounded to bfloat16 at DEFAULT), which is a 6-pass emulation.  Data
# MOVEMENT, however, can be exact at DEFAULT: split x into three bf16-exact
# parts (hi = bf16(x), mid = bf16(x - hi), lo = bf16(x - hi - mid) — an
# f32 mantissa is 24 = 3x8 bits, so hi+mid+lo == x), run ONE indicator-
# kernel conv over the stacked parts (products with 0/1 taps are exact,
# accumulation is f32), and sum the parts back.  The cube matrices are then
# applied as separate small channel contractions at full precision.  Per
# matvec: ~10 ops instead of ~60 slice ops — on the relay backend, where
# every op pays a fixed dispatch cost, that is the difference that matters.
# ---------------------------------------------------------------------------


def split3(x: jax.Array) -> jax.Array:
    """f32 -> (3, ...) bf16-exact parts summing exactly to x (24 = 3x8
    mantissa bits).  For other dtypes (f64 on CPU, where convs are computed
    exactly at operand precision) no split is needed: (1, ...)."""
    if x.dtype != jnp.float32:
        return x[None]
    hi = x.astype(jnp.bfloat16).astype(x.dtype)
    r = x - hi
    mid = r.astype(jnp.bfloat16).astype(x.dtype)
    lo = r - mid
    return jnp.stack([hi, mid, lo])


def indicator_kernels(sm: StructuredMap):
    """(KI_gather (2..,s^d,nl), KI_scatter (2..,nl,s^d)) 0/1 kernels."""
    deg, d, maps = _slots(sm)
    nl = (deg + 1) ** d
    KG = np.zeros((2,) * d + (deg**d, nl))
    KS = np.zeros((2,) * d + (nl, deg**d))
    for delta, p_idx, t_idx in maps:
        KG[delta + (p_idx, t_idx)] = 1.0
        KS[delta + (t_idx, p_idx)] = 1.0
    return KG, _flip(KS, d)


def gather_exact(x: jax.Array, KI: jax.Array, sm: StructuredMap) -> jax.Array:
    """(B?, npad) -> (B, nl, *cube_spatial), exact in f32."""
    d = len(sm[1])
    g = _grid(x, sm)  # (B, C, *sp)
    B = g.shape[0]
    sp = split3(g)
    nparts = sp.shape[0]
    parts = sp.reshape((nparts * B,) + g.shape[1:])
    u = jax.lax.conv_general_dilated(
        parts, KI, (1,) * d, "VALID", dimension_numbers=_dn(d)
    )
    return u.reshape((nparts, B) + u.shape[1:]).sum(axis=0)


def scatter_exact(U: jax.Array, KI_s: jax.Array, sm: StructuredMap, axis=None) -> jax.Array:
    """(B, nl, *cube_spatial) -> (B, npad) (squeezed if B==1 input was 1-D
    is NOT inferred here — caller reshapes), exact in f32."""
    d = len(sm[1])
    B = U.shape[0]
    sp = split3(U)
    nparts = sp.shape[0]
    parts = sp.reshape((nparts * B,) + U.shape[1:])
    y = jax.lax.conv_transpose(
        parts, KI_s, (1,) * d, "VALID", dimension_numbers=_dn(d)
    )
    y = y.reshape((nparts, B) + y.shape[1:]).sum(axis=0)
    out = y.reshape(B, -1)
    return _psum(out, axis)


_HI = jax.lax.Precision.HIGHEST


def _chan(C: jax.Array, U: jax.Array, precision=_HI) -> jax.Array:
    """Channel contraction: (o, c) x (B, c, *sp) -> (B, o, *sp)."""
    return jnp.einsum("oc,bc...->bo...", C, U, precision=precision)


def matvec_exact(x: jax.Array, C: jax.Array, E: "ExactOps", space: str, axis=None):
    """y = A x for a square operator with cube matrix C ('v' or 'q' space)."""
    KI_g, KI_s, sm = E.pick(space)
    batched = x.ndim == 2
    U = gather_exact(x, KI_g, sm)
    y = scatter_exact(_chan(C, U), KI_s, sm, axis)
    return y if batched else y[0]


@jax.tree_util.register_dataclass
@dataclass
class ExactOps:
    """Indicator kernels + flat quadrature tables for the exact conv path."""

    KIv_g: jax.Array
    KIv_s: jax.Array
    KIq_g: jax.Array
    KIq_s: jax.Array
    Phi: jax.Array  # (Q, nl_v)
    DgF: jax.Array  # (Q*d, nl_v)
    PhiWg: jax.Array  # (Q*d, nl_v) PhiW repeated over g
    EdF: jax.Array  # (Q*d, nl_v)
    sm_v: tuple = field(metadata=dict(static=True))
    sm_q: tuple = field(metadata=dict(static=True))

    def pick(self, space: str):
        if space == "v":
            return self.KIv_g, self.KIv_s, self.sm_v
        return self.KIq_g, self.KIq_s, self.sm_q

    @property
    def dim(self) -> int:
        return len(self.sm_v[1])


def build_exact_ops(cu: CubeOps, dtype) -> ExactOps:
    f = lambda x: jnp.asarray(x, dtype=dtype)
    KIv_g, KIv_s = indicator_kernels(cu.sm_v)
    KIq_g, KIq_s = indicator_kernels(cu.sm_q)
    Phi = np.asarray(cu.Phi)
    Dg = np.asarray(cu.Dg)  # (Q, d, nl)
    PhiW = np.asarray(cu.PhiW)
    Ed = np.asarray(cu.Ediag)  # (Q, d, nl)
    Q, d, nl = Dg.shape
    return ExactOps(
        KIv_g=f(KIv_g),
        KIv_s=f(KIv_s),
        KIq_g=f(KIq_g),
        KIq_s=f(KIq_s),
        Phi=f(Phi),
        DgF=f(Dg.reshape(Q * d, nl)),
        PhiWg=f(np.repeat(PhiW, d, axis=0)),
        EdF=f(Ed.reshape(Q * d, nl)),
        sm_v=cu.sm_v,
        sm_q=cu.sm_q,
    )


def conv_uqg_exact(E: ExactOps, uab: jax.Array) -> jax.Array:
    """uab (d, npad) -> (1, Q*d, *cube_spatial), channels (q, g)-major."""
    U = gather_exact(uab, E.KIv_g, E.sm_v)  # (d, nl, sp)
    vals = _chan(E.Phi, U, precision=jax.lax.Precision.HIGHEST)  # (d, Q, sp)
    perm = jnp.moveaxis(vals, 0, 1)  # (Q, d, *sp)
    return perm.reshape((1,) + (perm.shape[0] * perm.shape[1],) + perm.shape[2:])


def tentative_matvec_exact(E: ExactOps, cu: CubeOps, a, b, uqg, x, sign=1.0, axis=None):
    """y = [a*M + b*K + sign/2 * C(uab)] x, batched over components, with one
    shared gather/scatter pair and exact f32 data movement."""
    batched = x.ndim == 2
    U = gather_exact(x, E.KIv_g, E.sm_v)  # (B, nl, sp)
    A0 = a * cu.M_c + b * cu.K_c
    Y = _chan(A0, U)
    G = _chan(E.DgF, U)  # (B, Q*d, sp)
    Y = Y + (0.5 * sign) * _chan(E.PhiWg.T, G * uqg)
    y = scatter_exact(Y, E.KIv_s, E.sm_v, axis)
    return y if batched else y[0]


def conv_diag_exact(E: ExactOps, uqg, axis=None) -> jax.Array:
    """Assembled diagonal of C(uab)."""
    D = _chan(E.EdF.T, uqg)  # (1, nl, sp)
    return scatter_exact(D, E.KIv_s, E.sm_v, axis)[0]


def divergence_exact(E: ExactOps, cu: CubeOps, u3: jax.Array, axis=None) -> jax.Array:
    """b2 = sum_g B_g^T u_g."""
    U = gather_exact(u3, E.KIv_g, E.sm_v)  # (d, nl_v, sp)
    t = jnp.einsum("gvq,gv...->q...", cu.B_c, U, precision=_HI)[None]
    return scatter_exact(t, E.KIq_s, E.sm_q, axis)[0]


def mixed_exact(E: ExactOps, C_all: jax.Array, p: jax.Array, axis=None) -> jax.Array:
    """r_g = C_g p for all components: (d, npad_v)."""
    Uq = gather_exact(p, E.KIq_g, E.sm_q)  # (1, nl_q, sp)
    Y = jnp.einsum("gvq,bq...->gv...", C_all, Uq, precision=_HI)
    return scatter_exact(Y, E.KIv_s, E.sm_v, axis)
