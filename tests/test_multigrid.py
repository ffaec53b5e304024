"""Multigrid tests: transfer adjointness, Galerkin property (nested Kuhn
refinement), and V-cycle-preconditioned CG iteration counts."""

import jax.numpy as jnp
import numpy as np
import pytest

from oasisx_tpu.assembly import engine as eng
from oasisx_tpu.la import cg, jacobi_preconditioner
from oasisx_tpu.la.multigrid import StructuredPoissonMG, prolong, restrict
from oasisx_tpu.meshes import create_box, create_rectangle


@pytest.mark.parametrize("shape", [(9, 9), (5, 5, 5)])
def test_restrict_is_prolong_transpose(shape):
    rng = np.random.RandomState(0)
    shape_c = tuple((s - 1) // 2 + 1 for s in shape)
    xc = rng.randn(int(np.prod(shape_c)))
    rf = rng.randn(int(np.prod(shape)))
    lhs = np.vdot(np.asarray(prolong(jnp.asarray(xc), shape_c)), rf)
    rhs = np.vdot(xc, np.asarray(restrict(jnp.asarray(rf), shape)))
    assert abs(lhs - rhs) < 1e-10 * max(1, abs(lhs))


@pytest.mark.parametrize("dim", [2, 3])
def test_galerkin_property(dim):
    """Rediscretized coarse operator == P^T A_f P (nested refinement)."""
    mesh = create_rectangle((0, 0), (1, 1), (8, 8)) if dim == 2 else create_box(
        (0, 0, 0), (1, 1, 1), (4, 4, 4)
    )
    mg = StructuredPoissonMG(mesh, coarsest=2)
    assert mg.num_levels >= 2
    L0, L1 = mg.levels[0], mg.levels[1]
    n_c = int(np.prod(L1["grid_shape"]))
    rng = np.random.RandomState(1)
    for _ in range(3):
        xc = jnp.asarray(rng.randn(n_c))
        ref = restrict(mg._matvec(0, prolong(xc, L1["grid_shape"])), L0["grid_shape"])
        direct = mg._matvec(1, xc)
        assert np.abs(np.asarray(ref) - np.asarray(direct)).max() < 1e-10


def test_mg_pcg_beats_jacobi():
    mesh = create_box((0, 0, 0), (1, 1, 1), (8, 8, 8))
    mg = StructuredPoissonMG(mesh)
    L0 = mg.levels[0]
    rng = np.random.RandomState(2)
    b = rng.randn(int(np.prod(L0["grid_shape"])))
    b -= b.mean()
    bj = jnp.asarray(b)
    matvec = lambda x: mg._matvec(0, x)
    res_mg = cg(matvec, bj, M=mg.vcycle, rtol=1e-10, project_nullspace=True, maxiter=500)
    diag_inv = L0["inv_diag"]
    res_j = cg(
        matvec,
        bj,
        M=lambda r: diag_inv * r,
        rtol=1e-10,
        project_nullspace=True,
        maxiter=2000,
    )
    assert bool(res_mg.converged)
    assert int(res_mg.iters) < int(res_j.iters) / 3
    # same solution up to constants
    x1 = np.asarray(res_mg.x)
    x2 = np.asarray(res_j.x)
    d = (x1 - x1.mean()) - (x2 - x2.mean())
    assert np.abs(d).max() < 1e-6 * max(1.0, np.abs(x1).max())
