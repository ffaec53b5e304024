"""Owned-dof halo exchange for unstructured meshes (parallel/graph.py):
RCB partition, fold/refresh collectives vs a dense oracle on the virtual
8-device CPU mesh."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from oasisx_tpu.parallel import graph as G


def _mesh(n=8):
    devs = jax.devices()
    if len(devs) < n:
        pytest.skip(f"need {n} devices")
    return Mesh(np.array(devs[:n]), ("s",))


def _setup(ndev=8):
    from oasisx_tpu.elements.element import make_element
    from oasisx_tpu.meshes.generation import create_cylinder_channel
    from oasisx_tpu.spaces.functionspace import FunctionSpace

    mesh = create_cylinder_channel(12)
    el = make_element(("Lagrange", 2), mesh.cell_type)
    V = FunctionSpace(mesh, el)
    cd = V.dofmap.cell_dofs
    cent = mesh.x[mesh.cells].mean(axis=1)
    shard_of = G.rcb_partition(cent, ndev)
    B = -(-len(shard_of) // ndev)
    cell_perm = np.full(ndev * B, -1, dtype=np.int64)
    for s in range(ndev):
        cs = np.where(shard_of == s)[0]
        cell_perm[s * B : s * B + len(cs)] = cs
    hx = G.build_halo_exchange(cd, shard_of, ndev, cell_perm, B)
    return mesh, V, cd, shard_of, cell_perm, B, hx


def test_rcb_partition_balance():
    rng = np.random.default_rng(0)
    pts = rng.standard_normal((1000, 3))
    for ndev in (4, 8, 6):
        part = G.rcb_partition(pts, ndev)
        counts = np.bincount(part, minlength=ndev)
        assert counts.min() >= 1000 // ndev - 1
        assert counts.max() <= -(-1000 // ndev) + 1


def test_halo_fold_matches_global_scatter_add():
    """Per-shard assembly + halo_fold == global scatter-add (the
    scatter_reverse(add) semantics of the reference's IndexMap)."""
    ndev = 8
    dmesh = _mesh(ndev)
    mesh, V, cd, shard_of, cell_perm, B, hx = _setup(ndev)
    rng = np.random.default_rng(1)
    nd = V.num_dofs
    ndpc = cd.shape[1]
    vals = rng.standard_normal((len(cd), ndpc))

    # oracle: plain global scatter-add
    ref = np.zeros(nd)
    np.add.at(ref, cd.reshape(-1), vals.reshape(-1))

    # per-shard local scatter-add into [owned|halo] slots, then fold
    nloc = hx.nloc
    y_loc = np.zeros(ndev * nloc)
    for i, c in enumerate(cell_perm):
        if c < 0:
            continue
        s = i // B
        np.add.at(y_loc, s * nloc + hx.cell_dofs_local[i], vals[c])
    y_loc[np.arange(ndev) * nloc + nloc - 1] = 0.0  # sentinel absorbed junk

    tree, deltas = G.make_halo_tables(hx, jnp.float64)
    specs = G.halo_tree_specs(tree, "s")

    def fold(y, tree):
        return G.halo_fold(y, tree, deltas, "s")

    y = jax.jit(
        jax.shard_map(
            fold, mesh=dmesh, in_specs=(P("s"), specs), out_specs=P("s")
        )
    )(jnp.asarray(y_loc), tree)
    got = np.asarray(y)

    # owned positions carry the fully assembled values
    assert np.allclose(got[hx.perm], ref, atol=1e-12)
    # every non-owned slot is zero (the invariant reductions rely on)
    mask = np.zeros(ndev * nloc, bool)
    mask[hx.perm] = True
    assert np.abs(got[~mask]).max() == 0.0


def test_halo_refresh_matches_gather():
    """halo_refresh fills halo slots with the owners' values
    (scatter_forward semantics)."""
    ndev = 8
    dmesh = _mesh(ndev)
    mesh, V, cd, shard_of, cell_perm, B, hx = _setup(ndev)
    rng = np.random.default_rng(2)
    nd = V.num_dofs
    xg = rng.standard_normal(nd)
    x_loc = np.zeros(ndev * hx.nloc)
    x_loc[hx.perm] = xg

    tree, deltas = G.make_halo_tables(hx, jnp.float64)
    specs = G.halo_tree_specs(tree, "s")

    def refresh(x, tree):
        return G.halo_refresh(x, tree, deltas, "s")

    x = jax.jit(
        jax.shard_map(
            refresh, mesh=dmesh, in_specs=(P("s"), specs), out_specs=P("s")
        )
    )(jnp.asarray(x_loc), tree)
    got = np.asarray(x)

    # every local cell-dof reference (owned or halo) now sees the value
    nloc = hx.nloc
    for i, c in enumerate(cell_perm):
        if c < 0:
            continue
        s = i // B
        local = got[s * nloc + hx.cell_dofs_local[i]]
        assert np.allclose(local, xg[cd[c]], atol=1e-14)


def test_halo_matvec_matches_dense():
    """refresh -> local element matvec -> fold == global element matvec."""
    ndev = 8
    dmesh = _mesh(ndev)
    mesh, V, cd, shard_of, cell_perm, B, hx = _setup(ndev)
    rng = np.random.default_rng(3)
    nd = V.num_dofs
    ndpc = cd.shape[1]
    elems = rng.standard_normal((len(cd), ndpc, ndpc))
    xg = rng.standard_normal(nd)

    ref = np.zeros(nd)
    for c in range(len(cd)):
        ref[cd[c]] += elems[c] @ xg[cd[c]]

    # shard-blocked element stacks and local dofmaps
    nloc = hx.nloc
    elems_b = np.zeros((ndev * B, ndpc, ndpc))
    for i, c in enumerate(cell_perm):
        if c >= 0:
            elems_b[i] = elems[c]
    cdl = hx.cell_dofs_local.reshape(ndev, B, ndpc)
    x_loc = np.zeros(ndev * nloc)
    x_loc[hx.perm] = xg
    tree, deltas = G.make_halo_tables(hx, jnp.float64)
    specs = G.halo_tree_specs(tree, "s")

    def mv(x, E, cdl_s, tree):
        x = G.halo_refresh(x, tree, deltas, "s")
        u = x[cdl_s.reshape(-1)].reshape(B, ndpc)
        y_cells = jnp.einsum("cij,cj->ci", E, u)
        y = jnp.zeros_like(x).at[cdl_s.reshape(-1)].add(y_cells.reshape(-1))
        return G.halo_fold(y, tree, deltas, "s")

    y = jax.jit(
        jax.shard_map(
            mv,
            mesh=dmesh,
            in_specs=(P("s"), P("s", None, None), P("s", None, None), specs),
            out_specs=P("s"),
        )
    )(jnp.asarray(x_loc), jnp.asarray(elems_b), jnp.asarray(cdl), tree)
    got = np.asarray(y)
    assert np.allclose(got[hx.perm], ref, atol=1e-11), np.abs(got[hx.perm] - ref).max()


def _cylinder_solver(device_mesh=None, rotational=False, res=10, options=None):
    from oasisx_tpu import DirichletBC, FractionalStep_AB_CN, LocatorMethod, PressureBC
    from oasisx_tpu.meshes import locate_entities_boundary, meshtags
    from oasisx_tpu.meshes.generation import create_cylinder_channel

    mesh = create_cylinder_channel(res)
    L, H = 2.2, 0.41
    inlet = locate_entities_boundary(mesh, 1, lambda x: np.isclose(x[0], 0.0))
    outlet = locate_entities_boundary(mesh, 1, lambda x: np.isclose(x[0], L))
    ext = mesh.exterior_facet_indices()
    others = np.setdiff1d(ext, np.hstack([inlet, outlet]))
    facets = np.hstack([inlet, others, outlet])
    values = np.hstack(
        [np.full_like(inlet, 1), np.full_like(others, 2), np.full_like(outlet, 3)]
    ).astype(np.int32)
    tags = meshtags(mesh, 1, facets, values)
    Um = 0.3
    inflow = lambda x: 4.0 * Um * x[1] * (H - x[1]) / H**2
    bcs_u = [
        [DirichletBC(inflow, LocatorMethod.TOPOLOGICAL, (tags, 1)),
         DirichletBC(0.0, LocatorMethod.TOPOLOGICAL, (tags, 2))],
        [DirichletBC(0.0, LocatorMethod.TOPOLOGICAL, (tags, 1)),
         DirichletBC(0.0, LocatorMethod.TOPOLOGICAL, (tags, 2))],
    ]
    opts = {"ksp_rtol": 1e-12, "ksp_max_it": 4000}
    return FractionalStep_AB_CN(
        mesh,
        ("Lagrange", 2),
        ("Lagrange", 1),
        bcs_u=bcs_u,
        bcs_p=[PressureBC(0.0, (tags, 3))],
        rotational=rotational,
        solver_options={"tentative": dict(opts), "pressure": dict(opts), "scalar": dict(opts)},
    ) if device_mesh is None else FractionalStep_AB_CN(
        mesh,
        ("Lagrange", 2),
        ("Lagrange", 1),
        bcs_u=bcs_u,
        bcs_p=[PressureBC(0.0, (tags, 3))],
        rotational=rotational,
        solver_options={"tentative": dict(opts), "pressure": dict(opts), "scalar": dict(opts)},
        device_mesh=device_mesh,
        options=options,
    )


@pytest.mark.parametrize("rotational", [False, True])
def test_halo_sharded_cylinder_step_matches_single_device(rotational):
    """FULL sharded IPCS steps on the unstructured cylinder-channel with an
    outlet PressureBC (BASELINE configs 3-5 class) == single device to 1e-9
    (VERDICT r2 item 3 'done' criterion), incl. the rotational variant."""
    dmesh = _mesh(8)
    ref = _cylinder_solver(rotational=rotational)
    sol = _cylinder_solver(device_mesh=dmesh, rotational=rotational)
    assert sol._hx_v is not None, "halo sharding did not engage"

    dt, nu = 2e-3, 1e-3
    for _ in range(3):
        ref.solve(dt, nu, max_iter=2)
        sol.solve(dt, nu, max_iter=2)
        assert sol.last_stats["u_converged"].all()
        assert sol.last_stats["p_converged"]

    for i in range(2):
        a, b = ref._u[i].x.array, sol._u[i].x.array
        assert np.abs(a - b).max() < 1e-9, (i, np.abs(a - b).max())
    assert np.abs(ref._p.x.array - sol._p.x.array).max() < 1e-8


def test_sharded_pressure_chebyshev_cuts_iterations():
    """Sharded pressure solves are Chebyshev-Jacobi preconditioned (VERDICT
    r2 weak #5 / item 4): iteration count well under plain Jacobi and
    within 2x of the single-device preconditioned count."""
    from oasisx_tpu import DirichletBC, FractionalStep_AB_CN, LocatorMethod
    from oasisx_tpu.meshes import create_unit_square, locate_entities_boundary, meshtags

    def build(device_mesh=None, pc="cheb"):
        mesh = create_unit_square(16)
        f = mesh.exterior_facet_indices()
        tags = meshtags(mesh, 1, f, np.full_like(f, 1))
        bcs = [
            [DirichletBC(0.0, LocatorMethod.TOPOLOGICAL, (tags, 1))],
            [DirichletBC(0.0, LocatorMethod.TOPOLOGICAL, (tags, 1))],
        ]
        s = FractionalStep_AB_CN(
            mesh, ("Lagrange", 2), ("Lagrange", 1), bcs_u=bcs, bcs_p=[],
            solver_options={
                "tentative": {"ksp_rtol": 1e-10},
                "pressure": {"ksp_rtol": 1e-10, "pc_type": pc},
                "scalar": {"ksp_rtol": 1e-10},
            },
            options={"structured": False},  # force the general path
            device_mesh=device_mesh,
        )
        for i in range(2):
            s._u1[i].interpolate(lambda x: np.sin(np.pi * x[0]) * np.sin(np.pi * x[1]))
            s._u2[i].interpolate(lambda x: np.sin(np.pi * x[0]) * np.sin(np.pi * x[1]))
        return s

    dmesh = _mesh(8)
    sj = build(dmesh, pc="jacobi")
    sc = build(dmesh, pc="cheb")
    s1 = build(None, pc="cheb")
    assert sc._cheb is not None and sc._hx_q is not None
    dt, nu = 0.02, 0.05
    sj.solve(dt, nu, max_iter=1)
    sc.solve(dt, nu, max_iter=1)
    s1.solve(dt, nu, max_iter=1)
    itj = int(sj.last_stats["p_iters"])
    itc = int(sc.last_stats["p_iters"])
    it1 = int(s1.last_stats["p_iters"])
    assert itc < itj / 2, (itc, itj)
    assert itc <= 2 * max(it1, 1), (itc, it1)
    # and the solutions agree
    assert np.abs(sc._p.x.array - s1._p.x.array).max() < 1e-8


def test_ell_matvec_matches_dense():
    """Per-shard ELL operator (build_ell_tables + ell_values +
    make_ell_matvec in interpret mode) composed with refresh/fold ==
    global element matvec (VERDICT r3 #4)."""
    from oasisx_tpu.assembly import pallas_ops as po

    ndev = 8
    dmesh = _mesh(ndev)
    mesh, V, cd, shard_of, cell_perm, B, hx = _setup(ndev)
    rng = np.random.default_rng(4)
    nd = V.num_dofs
    ndpc = cd.shape[1]
    elems = rng.standard_normal((len(cd), ndpc, ndpc))
    xg = rng.standard_normal(nd)

    ref = np.zeros(nd)
    for c in range(len(cd)):
        ref[cd[c]] += elems[c] @ xg[cd[c]]

    nloc = hx.nloc
    K, slots, cols = G.build_ell_tables(
        hx.cell_dofs_local, hx.cell_dofs_local, nloc, ndev
    )
    elems_b = np.zeros((ndev * B, ndpc, ndpc))
    for i, c in enumerate(cell_perm):
        if c >= 0:
            elems_b[i] = elems[c]
    x_loc = np.zeros(ndev * nloc)
    x_loc[hx.perm] = xg
    tree, deltas = G.make_halo_tables(hx, jnp.float64)
    specs = G.halo_tree_specs(tree, "s")
    kern = po.make_ell_matvec(K, nloc, nloc, interpret=True)

    def mv(x, E, slots_s, cols_s, tree):
        vals = G.ell_values(E, slots_s[0], K, nloc)
        x = G.halo_refresh(x, tree, deltas, "s")
        y = kern(vals, cols_s[0], x)
        return G.halo_fold(y, tree, deltas, "s")

    y = jax.jit(
        jax.shard_map(
            mv,
            mesh=dmesh,
            in_specs=(P("s"), P("s", None, None), P("s", None),
                      P("s", None, None), specs),
            out_specs=P("s"),
            check_vma=False,
        )
    )(
        jnp.asarray(x_loc), jnp.asarray(elems_b.reshape(ndev * B, ndpc, ndpc)),
        jnp.asarray(slots), jnp.asarray(cols), tree,
    )
    got = np.asarray(y)
    assert np.allclose(got[hx.perm], ref, atol=1e-11), np.abs(got[hx.perm] - ref).max()


def test_band_matvec_sharded_matches_dense():
    """Per-shard band-ELL operator (build_band_tables_sharded +
    band_values_dropped + make_band_matvec_batched in interpret mode, RCM
    permutation applied around the kernel) composed with refresh/fold ==
    global element matvec — the layout that engages on hardware whose
    Mosaic rejects the flat-ELL 1D gather."""
    from oasisx_tpu.assembly import band as bd
    from oasisx_tpu.assembly import pallas_ops as po

    ndev = 8
    dmesh = _mesh(ndev)
    mesh, V, cd, shard_of, cell_perm, B, hx = _setup(ndev)
    rng = np.random.default_rng(11)
    nd = V.num_dofs
    ndpc = cd.shape[1]
    elems = rng.standard_normal((len(cd), ndpc, ndpc))
    xg = rng.standard_normal(nd)

    ref = np.zeros(nd)
    for c in range(len(cd)):
        ref[cd[c]] += elems[c] @ xg[cd[c]]

    nloc = hx.nloc
    sh, slots, cols, perm, iperm, R = bd.build_band_tables_sharded(
        hx.cell_dofs_local, nloc, ndev
    )
    S = len(sh)
    elems_b = np.zeros((ndev * B, ndpc, ndpc))
    for i, c in enumerate(cell_perm):
        if c >= 0:
            elems_b[i] = elems[c]
    x_loc = np.zeros(ndev * nloc)
    x_loc[hx.perm] = xg
    tree, deltas = G.make_halo_tables(hx, jnp.float64)
    specs = G.halo_tree_specs(tree, "s")
    kern = po.make_band_matvec_batched(sh, R, R, 1, interpret=True)

    def mv(x, E, slots_s, cols_s, perm_s, iperm_s, tree):
        vals = bd.band_values_dropped(E, slots_s[0], S, R)
        x = G.halo_refresh(x, tree, deltas, "s")
        xb = jnp.pad(jnp.take(x, perm_s[0]), (0, R * 128 - nloc))
        yb = kern(vals, cols_s[0], xb.reshape(1, R, 128))
        y = jnp.take(yb.reshape(-1)[:nloc], iperm_s[0])
        return G.halo_fold(y, tree, deltas, "s")

    y = jax.jit(
        jax.shard_map(
            mv,
            mesh=dmesh,
            in_specs=(P("s"), P("s", None, None), P("s", None),
                      P("s", None, None, None), P("s", None), P("s", None),
                      specs),
            out_specs=P("s"),
            check_vma=False,
        )
    )(
        jnp.asarray(x_loc), jnp.asarray(elems_b.reshape(ndev * B, ndpc, ndpc)),
        jnp.asarray(slots), jnp.asarray(cols), jnp.asarray(perm),
        jnp.asarray(iperm), tree,
    )
    got = np.asarray(y)
    assert np.allclose(got[hx.perm], ref, atol=1e-11), np.abs(got[hx.perm] - ref).max()


@pytest.mark.parametrize("rotational", [False, True])
@pytest.mark.parametrize("layout", ["ell", "band"])
def test_halo_ell_kernel_cylinder_matches_single_device(rotational, layout):
    """Graph-halo sharded cylinder with the per-shard ELL Pallas kernels
    (interpret mode) == single device to 1e-9 — the VERDICT r3 #4 'done'
    criterion: the kernel path runs in tests and engages on TPU.  The
    band layout is the one that engages on hardware whose Mosaic only
    lowers 2D take_along_axis."""
    dmesh = _mesh(8)
    ref = _cylinder_solver(rotational=rotational)
    sol = _cylinder_solver(
        device_mesh=dmesh, rotational=rotational,
        options={"pallas": "interpret", "ell_layout": layout},
    )
    assert sol._hx_v is not None, "halo sharding did not engage"
    assert sol._halo_kernels is not None, "ELL kernels did not engage"
    assert sol._halo_kernels["layout"] == layout

    dt, nu = 2e-3, 1e-3
    for _ in range(2):
        ref.solve(dt, nu, max_iter=2)
        sol.solve(dt, nu, max_iter=2)
        assert sol.last_stats["u_converged"].all()
        assert sol.last_stats["p_converged"]

    for i in range(2):
        a, b = ref._u[i].x.array, sol._u[i].x.array
        assert np.abs(a - b).max() < 1e-9, (i, np.abs(a - b).max())
    assert np.abs(ref._p.x.array - sol._p.x.array).max() < 1e-8


@pytest.mark.parametrize("mode", ["slab", "graph"])
def test_split_phase_api_under_sharding(mode):
    """VERDICT r3 #10: the split-phase API (assemble_first /
    velocity_tentative_* / pressure_* / velocity_update) works under
    device_mesh — each phase runs in its own shard_map; the sharded
    split-phase step == the single-device fused step to 1e-9."""
    from oasisx_tpu import DirichletBC, FractionalStep_AB_CN, LocatorMethod
    from oasisx_tpu.meshes import create_rectangle, meshtags

    dmesh = _mesh(8)
    nu, dt = 0.01, 0.01

    def ux(x):
        return -np.cos(np.pi * x[0]) * np.sin(np.pi * x[1])

    def uy(x):
        return np.cos(np.pi * x[1]) * np.sin(np.pi * x[0])

    def build(device_mesh=None):
        mesh = create_rectangle((-1, -1), (1, 1), (8, 8))
        facets = mesh.exterior_facet_indices()
        tags = meshtags(mesh, 1, facets, np.full_like(facets, 3))
        s = FractionalStep_AB_CN(
            mesh,
            ("Lagrange", 2),
            ("Lagrange", 1),
            bcs_u=[[DirichletBC(ux, LocatorMethod.TOPOLOGICAL, (tags, 3))],
                   [DirichletBC(uy, LocatorMethod.TOPOLOGICAL, (tags, 3))]],
            bcs_p=[],
            solver_options={
                "tentative": {"ksp_rtol": 1e-13},
                "pressure": {"ksp_rtol": 1e-13},
                "scalar": {"ksp_rtol": 1e-13},
            },
            options={"structured": mode == "slab"},
            device_mesh=device_mesh,
        )
        for f, g in ((s._u1[0], ux), (s._u1[1], uy), (s._u2[0], ux), (s._u2[1], uy)):
            f.interpolate(g)
        return s

    s1 = build()
    s2 = build(dmesh)
    if mode == "slab":
        assert s2._slab is not None
    else:
        assert s2._hx_v is not None

    s1.solve(dt, nu, max_iter=1)

    # split-phase replication of one step with max_iter=1
    s2._ps.x.array[:] = s2._p.x.array
    s2.assemble_first(dt, nu)
    s2.velocity_tentative_assemble()
    s2.velocity_tentative_solve()
    s2.pressure_assemble(dt)
    s2.pressure_solve(nu)
    s2.velocity_update(dt)

    for i in range(2):
        a, b = s1._u[i].x.array, s2._u[i].x.array
        assert np.abs(a - b).max() < 1e-9, (mode, i, np.abs(a - b).max())
    assert np.abs(s1._ps.x.array - s2._ps.x.array).max() < 1e-8


@pytest.mark.parametrize("mode", ["graph", "slab"])
def test_sharded_tentative_matrix_gather_matches_single_device(mode):
    """VERDICT r4 missing #1: operator-level differential test of the
    DISTRIBUTED tentative matrix.  The reference gathers per-rank CSR
    blocks onto root and compares one global scipy matrix
    (test/test_tentative_velocity.py:19-40); here the sharded solver's own
    tentative operator (halo exchange included) is applied to identity
    columns and the gathered dense matrix must equal the single-device
    dense export to 1e-12."""
    from oasisx_tpu import DirichletBC, FractionalStep_AB_CN, LocatorMethod
    from oasisx_tpu.meshes import create_rectangle, meshtags

    dmesh = _mesh(8)
    nu, dt = 0.01, 0.01

    def ux(x):
        return -np.cos(np.pi * x[0]) * np.sin(np.pi * x[1])

    def uy(x):
        return np.cos(np.pi * x[1]) * np.sin(np.pi * x[0])

    def build(device_mesh=None):
        mesh = create_rectangle((-1, -1), (1, 1), (8, 8))
        facets = mesh.exterior_facet_indices()
        tags = meshtags(mesh, 1, facets, np.full_like(facets, 3))
        s = FractionalStep_AB_CN(
            mesh,
            ("Lagrange", 2),
            ("Lagrange", 1),
            bcs_u=[[DirichletBC(ux, LocatorMethod.TOPOLOGICAL, (tags, 3))],
                   [DirichletBC(uy, LocatorMethod.TOPOLOGICAL, (tags, 3))]],
            bcs_p=[],
            options={"structured": mode == "slab"},
            device_mesh=device_mesh,
        )
        for f, g in ((s._u1[0], ux), (s._u1[1], uy), (s._u2[0], ux), (s._u2[1], uy)):
            f.interpolate(g)
        return s

    s1 = build()
    s2 = build(dmesh)
    if mode == "slab":
        assert s2._slab is not None
    else:
        assert s2._hx_v is not None

    s1.assemble_first(dt, nu)
    s2.assemble_first(dt, nu)
    A1 = s1.tentative_matrix_dense()
    A2 = s2.tentative_matrix_dense()
    assert A1.shape == A2.shape
    assert np.abs(A1 - A2).max() < 1e-12, np.abs(A1 - A2).max()
