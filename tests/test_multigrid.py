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


def test_chebyshev_pressure_unstructured_and_outlet():
    """Chebyshev-Jacobi engages where MG cannot (unstructured mesh / outlet
    BC) and cuts pressure iterations vs plain Jacobi (VERDICT r1 item 5)."""
    import numpy as np

    from oasisx_tpu import (
        DirichletBC, FractionalStep_AB_CN, LocatorMethod, PressureBC,
    )
    from oasisx_tpu.meshes import create_cylinder_channel, create_rectangle, meshtags

    # unstructured: the DFG cylinder-channel mesh, zero velocity everywhere
    mesh = create_cylinder_channel(res=24)
    assert mesh.structured is None

    facets = mesh.exterior_facet_indices()
    tags = meshtags(mesh, mesh.dim - 1, facets, np.full_like(facets, 1))
    bcs = [[DirichletBC(0.0, LocatorMethod.TOPOLOGICAL, (tags, 1))] for _ in range(2)]

    def build(pc):
        s = FractionalStep_AB_CN(
            mesh, ("Lagrange", 2), ("Lagrange", 1), bcs, [],
            solver_options={
                "tentative": {"ksp_rtol": 1e-10},
                "pressure": {"ksp_rtol": 1e-10, "pc_type": pc},
                "scalar": {"ksp_rtol": 1e-10},
            },
        )
        for i in range(2):
            s._u1[i].interpolate(lambda x: 0.2 * np.sin(np.pi * x[0]) * np.cos(np.pi * x[1]))
            s._u2[i].interpolate(lambda x: 0.2 * np.sin(np.pi * x[0]) * np.cos(np.pi * x[1]))
        return s

    s_cheb = build("cheb")
    assert s_cheb._cheb is not None and s_cheb._mg is None
    s_jac = build("jacobi")
    assert s_jac._cheb is None
    s_cheb.solve(0.01, 0.05, max_iter=1)
    s_jac.solve(0.01, 0.05, max_iter=1)
    it_c = int(np.asarray(s_cheb.last_stats["p_iters"]))
    it_j = int(np.asarray(s_jac.last_stats["p_iters"]))
    assert it_c < it_j / 2, (it_c, it_j)
    for i in range(2):
        a, b = s_cheb._u[i].x.array, s_jac._u[i].x.array
        assert np.abs(a - b).max() < 1e-6

    # outlet (PressureBC): Dirichlet pressure system
    m2 = create_rectangle((0.0, 0.0), (2.0, 1.0), (10, 6))
    f2 = m2.exterior_facet_indices()
    mids = m2.midpoints(m2.dim - 1, f2)
    vals = np.where(np.isclose(mids[:, 0], 2.0), 2, 1).astype(np.int32)
    t2 = meshtags(m2, m2.dim - 1, f2, vals)
    bcs2 = [
        [DirichletBC(0.0, LocatorMethod.TOPOLOGICAL, (t2, 1))],
        [DirichletBC(0.0, LocatorMethod.TOPOLOGICAL, (t2, 1))],
    ]
    pbc = [PressureBC(0.0, (t2, 2))]
    s_out = FractionalStep_AB_CN(
        m2, ("Lagrange", 2), ("Lagrange", 1), bcs2, pbc,
        solver_options={
            "tentative": {"ksp_rtol": 1e-10},
            "pressure": {"ksp_rtol": 1e-10},
            "scalar": {"ksp_rtol": 1e-10},
        },
    )
    # round 4: AMG supersedes Chebyshev as the default on outlet-Dirichlet
    # pressure systems (tests/test_amg.py covers it); explicit pc_type
    # "cheb" still selects Chebyshev
    assert s_out._amg is not None and s_out._cheb is None
    for i in range(2):
        s_out._u1[i].interpolate(lambda x: 0.1 * x[1] * (1 - x[1]))
        s_out._u2[i].interpolate(lambda x: 0.1 * x[1] * (1 - x[1]))
    s_out.solve(0.01, 0.05, max_iter=1)
    assert np.isfinite(s_out._u[0].x.array).all()
