"""Dofmap tests: counts, cross-cell consistency, dof location, interpolation."""

import numpy as np
import pytest

from oasisx_tpu.elements import FiniteElement
from oasisx_tpu.meshes import create_unit_cube, create_unit_square, locate_entities_boundary
from oasisx_tpu.spaces import Function, FunctionSpace


def expected_cg_dofs(mesh, deg):
    """Euler-formula dof count for CG_p on simplices."""
    nv = mesh.num_vertices
    ncells = mesh.num_cells
    # count unique edges
    from oasisx_tpu.elements.nodes import CELL_EDGES

    le = np.array(CELL_EDGES[mesh.cell_type])
    edges = np.sort(mesh.cells[:, le], axis=2).reshape(-1, 2)
    ne = np.unique(edges, axis=0).shape[0]
    if mesh.dim == 2:
        return nv + ne * (deg - 1) + ncells * (deg - 1) * (deg - 2) // 2
    nf = mesh.topology.facets.shape[0]
    return (
        nv
        + ne * (deg - 1)
        + nf * (deg - 1) * (deg - 2) // 2
        + ncells * (deg - 1) * (deg - 2) * (deg - 3) // 6
    )


@pytest.mark.parametrize("deg", [1, 2, 3, 4])
@pytest.mark.parametrize("mesh_fn", [lambda: create_unit_square(4), lambda: create_unit_cube(2)])
def test_cg_dof_counts(mesh_fn, deg):
    mesh = mesh_fn()
    V = FunctionSpace(mesh, ("Lagrange", deg))
    assert V.num_dofs == expected_cg_dofs(mesh, deg)


@pytest.mark.parametrize("deg", [1, 2, 3, 4])
@pytest.mark.parametrize("mesh_fn", [lambda: create_unit_square(3), lambda: create_unit_cube(2)])
def test_shared_dof_coordinates_agree(mesh_fn, deg):
    """The same global dof seen from two cells must map to the same physical
    node coordinate — validates edge/face orientation canonicalization."""
    mesh = mesh_fn()
    V = FunctionSpace(mesh, ("Lagrange", deg))
    dm = V.dofmap
    el = V.element
    ref = el.nodes
    v0 = mesh.x[mesh.cells[:, 0]]
    J = np.stack([mesh.x[mesh.cells[:, i + 1]] - v0 for i in range(mesh.dim)], axis=2)
    phys = v0[:, None, :] + np.einsum("cgd,nd->cng", J, ref)
    # for every cell/local node, coords must equal the global dof coord table
    diff = np.abs(phys - dm.dof_coords[dm.cell_dofs])
    assert diff.max() < 1e-12


@pytest.mark.parametrize("deg", [1, 2, 3])
def test_interpolation_continuity(deg):
    """Interpolating a continuous function then evaluating per-cell at shared
    nodes gives a single-valued field (no dof mismatches)."""
    mesh = create_unit_cube(2)
    V = FunctionSpace(mesh, ("Lagrange", deg))
    f = Function(V)
    f.interpolate(lambda x: x[0] + 2 * x[1] - x[2] ** deg if deg > 1 else x[0] + 2 * x[1] - x[2])
    # exact at nodes
    x = V.dof_coords
    expected = x[:, 0] + 2 * x[:, 1] - x[:, 2] ** deg if deg > 1 else x[:, 0] + 2 * x[:, 1] - x[:, 2]
    assert np.allclose(f.x.array, expected, atol=1e-12)


def test_dg_dofmap():
    mesh = create_unit_square(3)
    V = FunctionSpace(mesh, FiniteElement("DG", "triangle", 1))
    assert V.num_dofs == mesh.num_cells * 3


@pytest.mark.parametrize("deg", [1, 2, 3, 4])
@pytest.mark.parametrize("mesh_fn", [lambda: create_unit_square(4), lambda: create_unit_cube(2)])
def test_locate_dofs_topological_vs_geometrical(mesh_fn, deg):
    """Differential test in the style of the reference test_bcs.py: dofs on
    the x=0 face located topologically must equal geometrical location."""
    mesh = mesh_fn()
    V = FunctionSpace(mesh, ("Lagrange", deg))
    facets = locate_entities_boundary(mesh, mesh.dim - 1, lambda x: np.isclose(x[0], 0.0))
    topo = V.locate_dofs_topological(mesh.dim - 1, facets)
    geo = V.locate_dofs_geometrical(lambda x: np.isclose(x[0], 0.0))
    assert (np.sort(topo) == np.sort(geo)).all()
    assert len(topo) > 0


def test_vector_space_collapse():
    mesh = create_unit_square(3)
    V = FunctionSpace(mesh, ("Lagrange", 2), shape=(2,))
    assert V.num_sub_spaces == 2
    Vs, cmap = V.sub(1).collapse()
    assert Vs.num_dofs * 2 == V.num_dofs
    assert (cmap == np.arange(Vs.num_dofs) * 2 + 1).all()
    # vector interpolate: components land in the right slots
    f = Function(V)
    f.interpolate(lambda x: np.stack([x[0], -x[1]]))
    assert np.allclose(f.x.array[cmap], -Vs.dof_coords[:, 1])
