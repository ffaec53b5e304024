"""Matrix-free linear algebra: Krylov solvers + solver config wrapper."""

from .krylov import (KrylovResult, bicgstab, bicgstab_batched, cg, cg_batched, chebyshev_preconditioner, estimate_lmax, gmres, jacobi_preconditioner, validated_cheb_bounds)
from .solver import KSPSolver

__all__ = ["KrylovResult", "bicgstab", "cg", "gmres", "jacobi_preconditioner", "KSPSolver"]
