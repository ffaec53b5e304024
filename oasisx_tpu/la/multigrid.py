"""Geometric multigrid V-cycle preconditioner for the pressure Poisson.

The perf-critical solve (SURVEY §7 step 5: "then geometric multigrid for
the pressure Poisson"). On structured generator meshes the P1 pressure
grids form a nested hierarchy (the Kuhn/red-diagonal simplex splits are
self-similar under uniform refinement), so linear interpolation is exact
nesting, restriction is its transpose, and the rediscretized coarse
operator equals the Galerkin one. Transfers are axis-separable
interleave/stencil ops — no strided *writes* (TPU-hostile); only cheap
strided reads and bulk reshapes.

Smoother: damped Jacobi (omega=0.8), symmetric pre/post sweeps, so the
V-cycle is SPD and valid as a CG preconditioner. Coarse solve: dense
pseudo-inverse (handles the singular pure-Neumann operator).
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp

from ..config import real_dtype


def _parity_block(Xc: jax.Array, p_axes: tuple) -> jax.Array:
    """Fine values at points odd in ``p_axes``: on Kuhn/right-diagonal
    simplex meshes every such point lies on the *main diagonal* of its
    (sub-)cube, so P1 interpolation averages exactly the two diagonal
    corners — NOT the 2^k-corner tensor average."""
    if not p_axes:
        return Xc
    lo, hi = Xc, Xc
    for ax in p_axes:
        lo = jax.lax.slice_in_dim(lo, 0, lo.shape[ax] - 1, axis=ax)
        hi = jax.lax.slice_in_dim(hi, 1, hi.shape[ax], axis=ax)
    return 0.5 * (lo + hi)


def _interleave_blocks(E: jax.Array, O: jax.Array, ax: int) -> jax.Array:
    """Merge even (m) / odd (m-1) blocks along ax -> 2m-1."""
    E0 = jnp.moveaxis(E, ax, 0)
    O0 = jnp.moveaxis(O, ax, 0)
    m = E0.shape[0]
    body = jnp.stack([E0[:-1], O0], axis=1).reshape((2 * (m - 1),) + E0.shape[1:])
    out = jnp.concatenate([body, E0[-1:]], axis=0)
    return jnp.moveaxis(out, 0, ax)


def prolong(xc: jax.Array, shape_c: tuple) -> jax.Array:
    """Exact P1 interpolation, coarse -> fine (nested simplicial spaces)."""
    Xc = xc.reshape(shape_c)
    d = len(shape_c)

    def build(bits: tuple, ax: int) -> jax.Array:
        if ax == d:
            return _parity_block(Xc, tuple(i for i, b in enumerate(bits) if b))
        E = build(bits + (0,), ax + 1)
        O = build(bits + (1,), ax + 1)
        return _interleave_blocks(E, O, ax)

    return build((), 0).reshape(-1)


def restrict(rf: jax.Array, shape_f: tuple) -> jax.Array:
    """Transpose of :func:`prolong` (residual restriction).

    The two half-weight contributions of each odd-parity component are
    placed with lax.pad (shifted reads) instead of .at[...].add — a
    dynamic-update-slice copies the whole buffer on TPU (see
    assembly/cubes.py)."""
    import itertools

    Xf = rf.reshape(shape_f)
    d = len(shape_f)
    shape_c = tuple((s - 1) // 2 + 1 for s in shape_f)
    out = jnp.zeros(shape_c, rf.dtype)
    for bits in itertools.product((0, 1), repeat=d):
        comp = Xf[tuple(slice(b, None, 2) for b in bits)]  # strided reads: cheap
        p_axes = tuple(i for i, b in enumerate(bits) if b)
        if not p_axes:
            out = out + comp
            continue
        zero = jnp.zeros((), rf.dtype)
        lo = jax.lax.pad(
            0.5 * comp, zero, [(0, 1, 0) if i in p_axes else (0, 0, 0) for i in range(d)]
        )
        hi = jax.lax.pad(
            0.5 * comp, zero, [(1, 0, 0) if i in p_axes else (0, 0, 0) for i in range(d)]
        )
        out = out + lo + hi
    return out.reshape(-1)


class StructuredPoissonMG:
    """V-cycle preconditioner for the P1 Poisson operator on a structured
    generator mesh. Built host-side once; ``vcycle`` is jit-friendly."""

    def __init__(
        self,
        mesh,
        nsmooth: int = 2,
        omega: float = 0.8,
        coarsest: int = 4,
        dtype=None,
    ):
        from ..assembly import engine as eng
        from ..elements.element import FiniteElement
        from ..meshes.generation import create_box, create_interval, create_rectangle
        from ..spaces.functionspace import FunctionSpace

        info = mesh.structured
        if info is None:
            raise ValueError("StructuredPoissonMG requires a structured mesh")
        dtype = real_dtype(dtype)
        self.omega = omega
        self.nsmooth = nsmooth
        d = mesh.dim
        shape = tuple(info.shape)
        origin = np.asarray(info.origin)
        extent = origin + np.asarray(info.spacing) * np.asarray(shape)

        # level resolutions: halve while even and above the coarsest size
        res = [shape]
        while all(n % 2 == 0 and n // 2 >= max(2, coarsest // 2) for n in res[-1]):
            res.append(tuple(n // 2 for n in res[-1]))
        if len(res) < 2:
            raise ValueError("mesh resolution does not coarsen (need even cell counts)")
        ncoarse = int(np.prod([n + 1 for n in res[-1]]))
        if ncoarse > 20000:
            raise ValueError(f"coarsest level too large for a dense solve ({ncoarse} dofs)")

        self.levels = []
        for li, n in enumerate(res):
            if d == 1:
                m = create_interval(n[0], origin[0], extent[0])
            elif d == 2:
                m = create_rectangle(tuple(origin), tuple(extent), n)
            else:
                m = create_box(tuple(origin), tuple(extent), n)
            el = FiniteElement("Lagrange", mesh.cell_type, 1)
            Q = FunctionSpace(m, el)
            ctx, _ = eng.build_device_context(
                m, el, Q.dofmap.cell_dofs, Q.num_dofs, el, Q.dofmap.cell_dofs, Q.num_dofs,
                dtype=dtype,
            )
            from ..assembly.structured import build_structured_map

            r = build_structured_map(m, el, Q.dofmap)
            if r is None:
                raise ValueError("level mesh is not lattice-compatible")
            sm, gridflat, _valid = r
            from dataclasses import replace as dc_replace

            ctx = dc_replace(ctx, sv=sm, sq=sm)
            elems = eng.stiffness_q_elems(ctx)
            # cube-batched operator: the level matvec becomes slice reads +
            # one shared (nl x nl) matmul (assembly/cubes.py)
            from ..assembly.cubes import build_cube_ops

            _, refs_l = eng.build_device_context(
                m, el, Q.dofmap.cell_dofs, Q.num_dofs, el, Q.dofmap.cell_dofs,
                Q.num_dofs, dtype=dtype,
            )
            cu_l = build_cube_ops(m, refs_l, sm, sm, dtype)
            # grid-ordered diagonal
            diag_canon = np.zeros(Q.num_dofs)
            e_np = np.asarray(elems)
            np.add.at(
                diag_canon,
                Q.dofmap.cell_dofs.reshape(-1),
                np.einsum("cii->ci", e_np).reshape(-1),
            )
            diag = np.zeros(int(np.prod(sm[0])))
            diag[gridflat] = diag_canon
            grid_shape = tuple(n_k + 1 for n_k in n)
            level = dict(
                ctx=ctx,
                cu=cu_l,
                elems=jnp.asarray(e_np, dtype=dtype),
                inv_diag=jnp.asarray(
                    np.where(diag != 0, 1.0 / np.where(diag != 0, diag, 1.0), 0.0),
                    dtype=dtype,
                ),
                grid_shape=grid_shape,
                gridflat=gridflat,
            )
            self.levels.append(level)

        # coarse pseudo-inverse (grid ordering), handles the singular operator
        L = self.levels[-1]
        Qc = int(np.prod(L["grid_shape"]))
        lastQ = res[-1]
        # dense assembly in grid order
        sm = L["ctx"].sv
        gf = L["gridflat"]
        # rebuild canonical dense then permute
        nlast = len(gf)
        A = np.zeros((nlast, nlast))
        # reuse the level mesh cell dofs via ctx.cd_q (canonical ids)
        cd = np.asarray(L["ctx"].cd_q)
        e_np = np.asarray(L["elems"])
        for c in range(cd.shape[0]):
            A[np.ix_(cd[c], cd[c])] += e_np[c]
        Agrid = np.zeros((Qc, Qc))
        Agrid[np.ix_(gf, gf)] = A
        self._coarse_pinv = jnp.asarray(np.linalg.pinv(Agrid), dtype=dtype)

    # --- jit-friendly application ------------------------------------------
    def _matvec(self, li: int, x: jax.Array) -> jax.Array:
        L = self.levels[li]
        if L["cu"] is not None:
            from ..assembly.cubes import matvec_cube

            return matvec_cube(x, L["cu"].Ap_c, L["ctx"].sq)
        from ..assembly import engine as eng

        return eng.matvec_q(L["ctx"], L["elems"], x)

    def _smooth(self, li: int, z: jax.Array, r: jax.Array) -> jax.Array:
        L = self.levels[li]
        for _ in range(self.nsmooth):
            z = z + self.omega * L["inv_diag"] * (r - self._matvec(li, z))
        return z

    def _cycle(self, li: int, r: jax.Array) -> jax.Array:
        if li == len(self.levels) - 1:
            return self._coarse_pinv @ r
        z = jnp.zeros_like(r)
        z = self._smooth(li, z, r)
        res = r - self._matvec(li, z)
        rc = restrict(res, self.levels[li]["grid_shape"])
        zc = self._cycle(li + 1, rc)
        z = z + prolong(zc, self.levels[li + 1]["grid_shape"])
        z = self._smooth(li, z, r)
        return z

    def vcycle(self, r: jax.Array) -> jax.Array:
        """One symmetric V-cycle: usable as a CG preconditioner M^{-1} r."""
        return self._cycle(0, r)

    @property
    def num_levels(self) -> int:
        return len(self.levels)
