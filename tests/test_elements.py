"""Element-layer tests: tabulation exactness, quadrature exactness, node sets.

Differential-testing style mirrors the reference test suite
(/root/reference/test/test_bcs.py uses P1..P4): everything is checked
against analytically-known values.
"""

import numpy as np
import pytest

from oasisx_tpu.elements import FiniteElement, quadrature
from oasisx_tpu.elements.jacobi import gauss_lobatto_points, jacobi_p
from oasisx_tpu.elements.nodes import lagrange_nodes

CELLS = ["interval", "triangle", "tetrahedron"]
VOLUMES = {"interval": 1.0, "triangle": 0.5, "tetrahedron": 1.0 / 6.0}


def test_jacobi_orthonormal():
    x, w = np.polynomial.legendre.leggauss(30)
    for a, b in [(0.0, 0.0), (1.0, 0.0), (3.0, 0.0)]:
        wt = w * (1 - x) ** a * (1 + x) ** b
        for n in range(5):
            for m in range(5):
                ip = np.sum(wt * jacobi_p(x, a, b, n) * jacobi_p(x, a, b, m))
                assert abs(ip - (1.0 if n == m else 0.0)) < 1e-12


def test_gll_points():
    # degree 4 GLL on [-1,1]: known interior roots +-sqrt(3/7)
    x = gauss_lobatto_points(4)
    expected = np.array([-1.0, -np.sqrt(3.0 / 7.0), 0.0, np.sqrt(3.0 / 7.0), 1.0])
    assert np.allclose(x, expected, atol=1e-12)


@pytest.mark.parametrize("cell", CELLS)
@pytest.mark.parametrize("deg", range(1, 9))
def test_quadrature_exactness(cell, deg):
    pts, w = quadrature(cell, deg)
    dim = pts.shape[1]
    rng = np.random.RandomState(0)
    # integrate random monomials of total degree <= deg exactly
    for _ in range(5):
        powers = rng.multinomial(deg, np.ones(dim + 1) / (dim + 1))[:dim]
        integrand = np.prod(pts**powers, axis=1)
        approx = np.sum(w * integrand)
        # exact integral of x^a y^b z^c over unit simplex:
        # a! b! c! / (a+b+c+dim)!
        from math import factorial

        num = np.prod([factorial(int(p)) for p in powers])
        exact = num / factorial(int(sum(powers)) + dim)
        assert abs(approx - exact) < 1e-13, (powers, approx, exact)
    assert abs(np.sum(w) - VOLUMES[cell]) < 1e-14


@pytest.mark.parametrize("cell", CELLS)
@pytest.mark.parametrize("deg", range(1, 5))
@pytest.mark.parametrize("variant", ["equispaced", "gll_warped"])
def test_lagrange_delta_property(cell, deg, variant):
    el = FiniteElement("Lagrange", cell, deg, variant)
    phi, _ = el.tabulate(el.nodes)
    assert np.allclose(phi, np.eye(el.ndofs), atol=1e-10)


@pytest.mark.parametrize("cell", CELLS)
@pytest.mark.parametrize("deg", range(1, 5))
def test_partition_of_unity_and_grad(cell, deg):
    el = FiniteElement("Lagrange", cell, deg)
    pts, _ = quadrature(cell, 2 * deg)
    phi, dphi = el.tabulate(pts)
    assert np.allclose(phi.sum(axis=1), 1.0, atol=1e-12)
    assert np.allclose(dphi.sum(axis=2), 0.0, atol=1e-10)


@pytest.mark.parametrize("cell", CELLS)
@pytest.mark.parametrize("deg", range(1, 5))
def test_polynomial_reproduction(cell, deg):
    """Interpolating a degree-p polynomial at the nodes reproduces it exactly,
    including gradients."""
    el = FiniteElement("Lagrange", cell, deg)
    dim = el.dim
    rng = np.random.RandomState(deg)
    coef = rng.randn(dim)

    def f(x):
        return (x @ coef + 0.3) ** deg

    def grad_f(x):
        return deg * ((x @ coef + 0.3) ** (deg - 1))[:, None] * coef[None, :]

    node_vals = f(el.nodes)
    pts, _ = quadrature(cell, 2 * deg)
    phi, dphi = el.tabulate(pts)
    assert np.allclose(phi @ node_vals, f(pts), atol=1e-10)
    assert np.allclose(np.einsum("qdn,n->qd", dphi, node_vals), grad_f(pts), atol=1e-9)


@pytest.mark.parametrize("deg", range(2, 5))
def test_warped_edges_are_gll(deg):
    """Edge nodes of the gll_warped variant are exact GLL points."""
    nodes = lagrange_nodes("triangle", deg, "gll_warped")
    gll01 = np.sort((gauss_lobatto_points(deg) + 1.0) / 2.0)
    # bottom edge: nodes with y == 0
    edge = np.sort(nodes[np.abs(nodes[:, 1]) < 1e-12][:, 0])
    assert np.allclose(edge, gll01, atol=1e-10)
    # tet edges too
    nodes3 = lagrange_nodes("tetrahedron", deg, "gll_warped")
    mask = (np.abs(nodes3[:, 1]) < 1e-12) & (np.abs(nodes3[:, 2]) < 1e-12)
    edge3 = np.sort(nodes3[mask][:, 0])
    assert np.allclose(edge3, gll01, atol=1e-10)


def test_reference_mass_matrix_p1_triangle():
    """P1 triangle mass matrix on the reference cell: (1/24)[[2,1,1],[1,2,1],[1,1,2]]."""
    el = FiniteElement("Lagrange", "triangle", 1)
    pts, w = quadrature("triangle", 2)
    phi, _ = el.tabulate(pts)
    M = np.einsum("q,qi,qj->ij", w, phi, phi)
    expected = np.array([[2, 1, 1], [1, 2, 1], [1, 1, 2]]) / 24.0
    assert np.allclose(M, expected, atol=1e-14)
