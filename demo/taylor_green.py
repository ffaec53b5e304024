"""Taylor-Green convergence demo — the port of the reference application
driver (/root/reference/demo/taylor_green.py, run by its CI as the quality
gate): P2/P1 IPCS on [-1,1]^2 with a manufactured solution, space-time L2
errors per refinement, and log-log convergence rates.

Usage (matches the reference's flags):
    python demo/taylor_green.py -N 8 -N 16 -N 32 -dt 0.005 [-nu 0.01]
        [-T0 0] [-T1 1] [-u 2] [-p 1] [--low-memory] [--rotational]
"""

import argparse
import logging
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from oasisx_tpu import DirichletBC, FractionalStep_AB_CN, LocatorMethod
from oasisx_tpu.forms import expr as E
from oasisx_tpu.io import VTXWriter
from oasisx_tpu.meshes import create_rectangle, meshtags
from oasisx_tpu.spaces import Constant

logging.basicConfig()
logger = logging.getLogger("oasisx_tpu.taylor_green")
logger.setLevel(logging.INFO)


class U:
    """Manufactured Taylor-Green velocity (reference demo class U)."""

    def __init__(self, t, nu):
        self.t = t
        self.nu = nu

    def eval_x(self, x):
        return (
            -np.cos(np.pi * x[0])
            * np.sin(np.pi * x[1])
            * np.exp(-2.0 * self.nu * np.pi**2 * float(self.t))
        )

    def eval_y(self, x):
        return (
            np.cos(np.pi * x[1])
            * np.sin(np.pi * x[0])
            * np.exp(-2.0 * self.nu * np.pi**2 * float(self.t))
        )


def parse_args(argv=None):
    parser = argparse.ArgumentParser(
        description="Taylor-Green convergence demo",
        formatter_class=argparse.ArgumentDefaultsHelpFormatter,
    )
    parser.add_argument("-N", "--refinement", type=int, dest="Ns", action="append", required=True)
    parser.add_argument("-T0", "--T-start", dest="T_start", type=float, default=0)
    parser.add_argument("-T1", "--T-end", dest="T_end", type=float, default=1)
    parser.add_argument("-dt", dest="dt", type=float, default=0.1)
    parser.add_argument("-nu", dest="nu", type=float, default=0.01)
    parser.add_argument("-u", dest="u_deg", type=int, default=2)
    parser.add_argument("-p", dest="p_deg", type=int, default=1)
    parser.add_argument("-lm", "--low-memory", dest="lm", action="store_true", default=False)
    parser.add_argument("-r", "--rotational", dest="rot", action="store_true", default=False)
    parser.add_argument("--write-output", action="store_true", default=False)
    parser.add_argument(
        "--use-run", action="store_true", default=False,
        help="advance the whole window on device via solver.run() with a "
        "per-step BC table and in-scan error functionals (no host "
        "round-trip per step)",
    )
    return parser.parse_args(argv)


def _run_window_errors(solver, mesh, inputs, u_time, num_steps, dt, nu):
    """On-device time loop: per-step Dirichlet table + traced per-step
    space-time error functionals (VERDICT r1 item 6). Returns errs (2, n)."""
    import jax.numpy as jnp

    from oasisx_tpu.assembly.geometry import compute_cell_geometry
    from oasisx_tpu.elements.quadrature import quadrature

    T0 = inputs.T_start
    times = [T0 + (i + 1) * dt for i in range(num_steps)]

    def upd(t):
        u_time.value = np.asarray(t)

    table = solver.bc_value_table(times, update=upd)

    # static qdegree-8 tables matching E.assemble_scalar's rule
    pts, w = quadrature(mesh.cell_type, 8)
    el_u, el_q = solver._Vi[0][0].element, solver._Q.element
    phi_u = jnp.asarray(el_u.tabulate(pts)[0], solver._dtype)  # (nq, ndv)
    phi_q = jnp.asarray(el_q.tabulate(pts)[0], solver._dtype)
    geo = compute_cell_geometry(mesh.x, mesh.cells, mesh.dim)
    detJ = jnp.asarray(geo.detJ, solver._dtype)
    wq = jnp.asarray(w, solver._dtype)
    # physical qp coordinates (nc, nq, dim)
    v0 = mesh.x[mesh.cells[:, 0]]
    J = np.stack([mesh.x[mesh.cells[:, k + 1]] - v0 for k in range(mesh.dim)], axis=2)
    xq = jnp.asarray(
        v0[:, None, :] + np.einsum("cgd,qd->cqg", J, pts), solver._dtype
    )
    cd_u = jnp.asarray(solver._Vi[0][0].dofmap.cell_dofs)
    cd_q = jnp.asarray(solver._Q.dofmap.cell_dofs)
    gf_v = None if solver._gridflat_v is None else jnp.asarray(solver._gridflat_v)
    gf_q = None if solver._gridflat_q is None else jnp.asarray(solver._gridflat_q)

    def err_cb(state, t):
        u = state["u"]
        p = state["p"]
        if gf_v is not None:
            u = u[:, gf_v]
            p = p[gf_q]
        decay_u = jnp.exp(-2 * jnp.pi**2 * nu * t)
        uex = jnp.stack(
            [
                -jnp.cos(jnp.pi * xq[..., 0]) * jnp.sin(jnp.pi * xq[..., 1]),
                jnp.sin(jnp.pi * xq[..., 0]) * jnp.cos(jnp.pi * xq[..., 1]),
            ]
        ) * decay_u
        u_qp = jnp.einsum("qj,gcj->gcq", phi_u, u[:, cd_u])
        du = u_qp - uex
        err_u = jnp.einsum("gcq,q,c->", du * du, wq, detJ)
        decay_p = jnp.exp(-4 * jnp.pi**2 * nu * (t - dt / 2.0))
        pex = (
            -0.25
            * (jnp.cos(2 * jnp.pi * xq[..., 0]) + jnp.cos(2 * jnp.pi * xq[..., 1]))
            * decay_p
        )
        p_qp = jnp.einsum("qj,cj->cq", phi_q, p[cd_q])
        dp_ = p_qp - pex
        err_p = jnp.einsum("cq,q,c->", dp_ * dp_, wq, detJ)
        return jnp.stack([err_u, err_p])

    stats = solver.run(
        num_steps, dt, nu, max_iter=1, bc_vals_seq=table,
        step_callback=err_cb, t0=T0,
    )
    return np.asarray(stats["callback"]).T  # (2, num_steps)


def main(argv=None):
    inputs = parse_args(argv)
    dt, nu = inputs.dt, inputs.nu
    assert inputs.T_start < inputs.T_end
    num_steps = int((inputs.T_end - inputs.T_start) // dt)
    assert inputs.u_deg > inputs.p_deg
    solver_options = {
        "tentative": {"ksp_type": "preonly", "pc_type": "lu"},
        "pressure": {"ksp_type": "preonly", "pc_type": "lu"},
        "scalar": {"ksp_type": "preonly", "pc_type": "lu"},
    }

    space_errors = np.zeros((2, len(inputs.Ns)))
    hs = np.zeros(len(inputs.Ns))
    for n, N in enumerate(inputs.Ns):
        mesh = create_rectangle((-1, -1), (1, 1), (N, N))
        facets = mesh.exterior_facet_indices()
        value = np.int32(3)
        facet_tags = meshtags(mesh, mesh.dim - 1, facets, np.full_like(facets, value))

        u_time = Constant(inputs.T_start)
        p_time = inputs.T_start - dt / 2.0
        u_ex = U(t=u_time, nu=nu)
        bcx = DirichletBC(u_ex.eval_x, LocatorMethod.TOPOLOGICAL, (facet_tags, value))
        bcy = DirichletBC(u_ex.eval_y, LocatorMethod.TOPOLOGICAL, (facet_tags, value))

        solver = FractionalStep_AB_CN(
            mesh,
            ("Lagrange", inputs.u_deg),
            ("Lagrange", inputs.p_deg),
            bcs_u=[[bcx], [bcy]],
            bcs_p=[],
            rotational=inputs.rot,
            solver_options=solver_options,
            options={"low_memory_version": inputs.lm},
        )

        # initial conditions
        u_time.value = np.asarray(inputs.T_start - dt)
        solver._u2[0].interpolate(u_ex.eval_x)
        solver._u2[1].interpolate(u_ex.eval_y)
        u_time.value = np.asarray(inputs.T_start)
        solver._u1[0].interpolate(u_ex.eval_x)
        solver._u1[1].interpolate(u_ex.eval_y)
        solver._p.interpolate(
            lambda x: -0.25
            * (np.cos(2 * np.pi * x[0]) + np.cos(2 * np.pi * x[1]))
            * np.exp(-4 * np.pi**2 * nu * p_time)
        )

        writers = []
        if inputs.write_output:
            writers = [
                VTXWriter("u.bp", [solver.u]),
                VTXWriter("p.bp", [solver._p]),
            ]

        x = E.SpatialCoordinate(mesh)
        errs = np.zeros((2, num_steps))
        if inputs.use_run and not writers:
            errs = _run_window_errors(solver, mesh, inputs, u_time, num_steps, dt, nu)
            hmax = mesh.h().max()
            hs[n] = hmax
            space_errors[:, n] = [np.sqrt(dt * errs[0].sum()), np.sqrt(dt * errs[1].sum())]
            logger.info(
                "hmax=%.4e space_time_u_L2=%.6e space_time_p_L2=%.6e (run path)",
                hmax, space_errors[0, n], space_errors[1, n],
            )
            continue
        for i in range(num_steps):
            u_time.value = np.asarray(float(u_time.value) + dt)
            p_time += dt
            solver.solve(dt, nu, max_iter=1)

            decay_u = float(np.exp(-2 * np.pi**2 * nu * float(u_time.value)))
            man_u = E.as_vector(
                [
                    -E.sin(E.pi * x[1]) * E.cos(E.pi * x[0]) * decay_u,
                    E.sin(E.pi * x[0]) * E.cos(E.pi * x[1]) * decay_u,
                ]
            )
            decay_p = float(np.exp(-4 * np.pi**2 * nu * p_time))
            man_p = -0.25 * (E.cos(2 * E.pi * x[0]) + E.cos(2 * E.pi * x[1])) * decay_p
            uf = E.as_expr(solver.u)
            du = E.as_vector([uf[0] - man_u.comps[0], uf[1] - man_u.comps[1]])
            err_u = float(E.assemble_scalar(mesh, E.inner(du, du), qdegree=8))
            err_p = float(
                E.assemble_scalar(
                    mesh, (E.as_expr(solver._p) - man_p) * (E.as_expr(solver._p) - man_p), qdegree=8
                )
            )
            logger.debug("t=%.4f error_u=%.3e error_p=%.3e", float(u_time.value), err_u, err_p)
            errs[:, i] = [err_u, err_p]
            for w in writers:
                w.write(float(u_time.value))
        for w in writers:
            w.close()

        hmax = mesh.h().max()
        hs[n] = hmax
        space_errors[:, n] = [np.sqrt(dt * errs[0].sum()), np.sqrt(dt * errs[1].sum())]
        logger.info(
            "hmax=%.4e space_time_u_L2=%.6e space_time_p_L2=%.6e",
            hmax, space_errors[0, n], space_errors[1, n],
        )

    order = np.argsort(hs)[::-1]
    hs = hs[order]
    space_errors = space_errors[:, order]
    rate_u = np.log(space_errors[0, 1:] / space_errors[0, :-1]) / np.log(hs[1:] / hs[:-1])
    rate_p = np.log(space_errors[1, 1:] / space_errors[1, :-1]) / np.log(hs[1:] / hs[:-1])
    logger.info("Convergence rates u: %s", rate_u)
    logger.info("Convergence rates p: %s", rate_p)
    return rate_u, rate_p


if __name__ == "__main__":
    main()
