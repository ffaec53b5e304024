"""L2 projection utilities.

Re-provides the reference's ``Projector`` (/root/reference/src/oasisx/
function.py:13-144): solves (u, v) dx = (expr, v) dx on a target space with
an independently configured Krylov solver, supporting re-assembly after
coefficient updates, and Dirichlet BCs with symmetric lifting. Also
implements ``LumpedProject`` (a stub raising NotImplementedError in the
reference, function.py:146-153) via row-sum mass lumping.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from .assembly import engine as eng
from .bcs import DirichletBC, bc_mask_and_values
from .forms.expr import Expr, QPEvaluator, as_expr, _components
from .la import KSPSolver
from .spaces.functionspace import Function, FunctionSpace


class Projector:
    """Project an expression into a (possibly vector) Lagrange/DG space.

    Args:
        function: Expr tree / Function / callable f(x_phys)-> values.
        space: target FunctionSpace.
        bcs: optional list of DirichletBC on the target space.
        petsc_options: solver options (PETSc names, see la.solver).
        metadata: {'quadrature_degree': int} override.
    """

    def __init__(
        self,
        function,
        space: FunctionSpace,
        bcs: list[DirichletBC] | None = None,
        petsc_options: dict | None = None,
        jit_options: dict | None = None,
        form_compiler_options: dict | None = None,
        metadata: dict | None = None,
    ):
        self.space = space
        scalar = space.scalar_space()
        mesh = space.mesh
        deg = space.element.degree
        qdeg = (metadata or {}).get("quadrature_degree", 2 * deg + 2)
        self._ctx, _ = eng.build_device_context(
            mesh,
            scalar.element,
            scalar.dofmap.cell_dofs,
            scalar.num_dofs,
            scalar.element,
            scalar.dofmap.cell_dofs,
            scalar.num_dofs,
            qdegree=qdeg,
        )
        self._elems = eng.mass_elems(self._ctx)
        self._diag = eng.diagonal_v(self._ctx, self._elems)
        self._bcs = bcs or []
        for bc in self._bcs:
            bc.create_bc(scalar)
        mask, vals = bc_mask_and_values(self._bcs, scalar.num_dofs)
        self._mask = jnp.asarray(mask)
        self._bc_vals = jnp.asarray(vals)
        self._have_bcs = bool(mask.any())

        self._function = function
        self._evaluator = QPEvaluator(mesh, qdeg)
        self._x = Function(space, name="projection")
        self._b = np.zeros(space.num_dofs)

        self._solver = KSPSolver(petsc_options or {}, prefix="oasis_projector", symmetric=True)
        diag = jnp.where(self._mask, 1.0, self._diag) if self._have_bcs else self._diag
        self._solver.setOperators(self._matvec, diag=diag)

    def _matvec(self, x):
        if self._have_bcs:
            return eng.bc_symmetric_matvec(self._ctx, self._elems, self._mask, x, eng.matvec_v)
        return eng.matvec_v(self._ctx, self._elems, x)

    def _rhs_qp_values(self) -> list:
        """Per-component expression values at quadrature points."""
        f = self._function
        bs = self.space.bs
        if callable(f) and not isinstance(f, (Expr, Function)):
            xq = self._evaluator.xq  # (nc, nq, gdim)
            pad = jnp.zeros((3,) + xq.shape[:2])
            pad = pad.at[: xq.shape[2]].set(jnp.moveaxis(xq, 2, 0))
            vals = jnp.asarray(f(pad))
            return [vals] if bs == 1 else [vals[i] for i in range(bs)]
        e = as_expr(f)
        if bs == 1:
            return [self._evaluator.eval(e)]
        comps = _components(e)
        if len(comps) != bs:
            raise ValueError(f"expression has {len(comps)} components, space has {bs}")
        return [self._evaluator.eval(c) for c in comps]

    def assemble_rhs(self) -> None:
        """Re-assemble the RHS (reference function.py:108-119), including
        symmetric BC lifting."""
        bs = self.space.bs
        qvals = self._rhs_qp_values()
        b = self._b.reshape(-1, bs)
        for i in range(bs):
            bi = eng.source_load_vec_v(self._ctx, qvals[i])
            if self._have_bcs:
                # apply_lifting: b -= A g_bc ; then set bc rows to g
                lift = eng.matvec_v(
                    self._ctx, self._elems, jnp.where(self._mask, self._bc_vals, 0.0)
                )
                bi = bi - lift
                bi = jnp.where(self._mask, self._bc_vals, bi)
            b[:, i] = np.asarray(bi)

    def solve(self, assemble_rhs: bool = True):
        """Returns a PETSc-style converged reason (>0 on success)."""
        if assemble_rhs:
            self.assemble_rhs()
        bs = self.space.bs
        b = self._b.reshape(-1, bs)
        x = self._x.x.array.reshape(-1, bs)
        reason = 2
        for i in range(bs):
            res = self._solver.solve(jnp.asarray(b[:, i]), x0=jnp.asarray(x[:, i]))
            x[:, i] = np.asarray(res.x)
            reason = min(reason, int(KSPSolver.converged_reason(res)))
        return reason

    @property
    def x(self) -> Function:
        return self._x


class LumpedProject:
    """Projection with a lumped (row-sum) mass matrix: diagonal solve, no
    Krylov iteration. Implements the reference's declared-but-unimplemented
    API (function.py:146-153)."""

    def __init__(
        self,
        function,
        space: FunctionSpace,
        bcs: list[DirichletBC] | None = None,
        metadata: dict | None = None,
    ):
        self._inner = Projector(function, space, bcs=bcs, metadata=metadata)
        # lumped mass = M @ 1 (row sums)
        ones = jnp.ones(space.num_scalar_dofs)
        self._lumped = eng.matvec_v(self._inner._ctx, self._inner._elems, ones)

    def solve(self) -> None:
        self._inner.assemble_rhs()
        bs = self._inner.space.bs
        b = self._inner._b.reshape(-1, bs)
        x = self._inner._x.x.array.reshape(-1, bs)
        lumped = np.asarray(self._lumped)
        for i in range(bs):
            x[:, i] = b[:, i] / lumped

    @property
    def x(self) -> Function:
        return self._inner._x
