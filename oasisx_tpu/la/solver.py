"""PETSc-options-shaped solver configuration wrapper.

The equivalent of the reference's ``KSPSolver`` (src/oasisx/ksp.py:14-91)
and its options-prefix discipline: plain nested dicts, no global mutable
options database (SURVEY §5 config note). PETSc option names are accepted
and translated:

    ksp_type: cg | bcgs/bicgstab | gmres/fgmres | preonly
              (preonly -> tight Krylov; any other PETSc ksp_type is
              accepted and mapped to the family default with a logged
              note, matching the reference's accept-anything options DB)
    pc_type:  jacobi | none | lu                (lu -> tight Krylov, SURVEY §4)
              | lumped (velocity-update family only: weighted-gradient
                lumped update instead of CG — a mass-weighted average of
                per-cell gradients at each velocity node; the classic
                Oasis lumped projection the reference declares via its
                LumpedProject stub, function.py:146-153)
    ksp_rtol / ksp_atol / ksp_max_it
    ksp_error_if_not_converged

``solve`` is jit-friendly: method/tolerances are static Python values;
the returned converged reason is a traced value (>0 converged, <0 not),
matching the reference's use of ``ConvergedReason`` ints
(fracstep.py:681-684).
"""

from __future__ import annotations

from typing import Callable

import jax.numpy as jnp

from .krylov import KrylovResult, bicgstab, cg, gmres, jacobi_preconditioner


class KSPSolver:
    """Config container + dispatcher for one linear solve family."""

    def __init__(
        self,
        options: dict | None = None,
        prefix: str = "",
        symmetric: bool = True,
    ):
        self.prefix = prefix
        self.symmetric = symmetric
        self.options: dict = {}
        self._matvec: Callable | None = None
        self._pc: Callable | None = None
        self.updateOptions(options or {})

    # --- reference-API surface (ksp.py:38-61) ------------------------------
    def updateOptions(self, options: dict) -> None:
        self.options.update(options or {})

    def setOptions(self, *_args) -> None:
        """Compatibility no-op: options take effect at solve time."""

    def setOperators(self, matvec: Callable, diag=None) -> None:
        self._matvec = matvec
        self._pc = None if diag is None else jacobi_preconditioner(diag)

    # --- resolved solve parameters -----------------------------------------
    @property
    def method(self) -> str:
        default = "cg" if self.symmetric else "bcgs"
        kt = str(self.options.get("ksp_type", default)).lower()
        pc = str(self.options.get("pc_type", "jacobi")).lower()
        if kt == "preonly" or pc == "lu":
            return default
        if kt in ("bcgs", "bicgstab"):
            return "bcgs"
        if kt == "cg":
            return "cg"
        if kt in ("gmres", "fgmres", "lgmres", "dgmres", "pgmres"):
            return "gmres"
        # pass-through acceptance: the reference hands any ksp_type string
        # to PETSc (src/oasisx/ksp.py:55-61); unknown types map to the
        # family default with a logged note instead of raising
        import logging

        logging.getLogger("oasisx_tpu").info(
            "ksp_type %r has no native TPU implementation; using %s for "
            "the %s solves", kt, default, self.prefix or "unnamed",
        )
        return default

    @property
    def lumped(self) -> bool:
        """Lumped (weighted-gradient) update instead of a Krylov iteration
        — only meaningful for consistent-mass solves (velocity update)."""
        return (
            str(self.options.get("pc_type", "")).lower() == "lumped"
            or bool(self.options.get("lumped", False))
        )

    @property
    def gmres_restart(self) -> int:
        return int(self.options.get("ksp_gmres_restart", 30))

    @property
    def rtol(self) -> float:
        if "ksp_rtol" in self.options:
            return float(self.options["ksp_rtol"])
        kt = str(self.options.get("ksp_type", "")).lower()
        pc = str(self.options.get("pc_type", "")).lower()
        # 'preonly + lu' reference configs demand near-exact solves
        if kt == "preonly" or pc == "lu":
            return 1e-13
        return 1e-8

    @property
    def atol(self) -> float:
        return float(self.options.get("ksp_atol", 1e-50))

    @property
    def maxiter(self) -> int:
        return int(self.options.get("ksp_max_it", 5000))

    def use_jacobi(self) -> bool:
        return str(self.options.get("pc_type", "jacobi")).lower() not in ("none",)

    # --- solve --------------------------------------------------------------
    def solve(
        self,
        b,
        x0=None,
        nullspace: bool = False,
    ) -> KrylovResult:
        if self._matvec is None:
            raise RuntimeError("setOperators must be called before solve")
        M = self._pc if (self._pc is not None and self.use_jacobi()) else None
        if self.method == "cg":
            return cg(
                self._matvec,
                b,
                x0=x0,
                M=M,
                rtol=self.rtol,
                atol=self.atol,
                maxiter=self.maxiter,
                project_nullspace=nullspace,
            )
        if self.method == "gmres":
            return gmres(
                self._matvec, b, x0=x0, M=M, rtol=self.rtol, atol=self.atol,
                maxiter=self.maxiter, restart=self.gmres_restart,
            )
        return bicgstab(
            self._matvec, b, x0=x0, M=M, rtol=self.rtol, atol=self.atol, maxiter=self.maxiter
        )

    @staticmethod
    def converged_reason(result: KrylovResult):
        """PETSc-style reason: 2 (rtol) if converged else -3 (max_it)."""
        return jnp.where(result.converged, jnp.int32(2), jnp.int32(-3))
