"""Generate the Lagrange node/tabulation snapshot fixture (VERDICT r3 #6).

Freezes the gll_warped (and equispaced) node coordinates for P1-P4 on
interval/triangle/tetrahedron plus basis tabulations at fixed probe points
into tests/fixtures/lagrange_nodes.npz. tests/test_elements.py asserts
exact agreement, locking the discretization: any change to the node
construction (elements/nodes.py) or the tabulation pipeline
(elements/tabulation.py) that moves a node or a basis value fails loudly.

Determinacy context (why this pins down parity with basix gll_warped,
/root/reference/src/oasisx/fracstep.py:165-184, without basix available):
vertices are fixed; edge nodes are exact 1D Gauss-Lobatto-Legendre points
(closed forms asserted in tests); P3 triangle / P4 tetrahedron interior
nodes sit at the (face/cell) centroid by symmetry. Every P<=3 node — and
every P4 node except the three per-(triangle/tet-face) interior nodes —
is therefore FORCED by (vertices, GLL edges, symmetry) and coincides with
basix's gll_warped exactly. The only free choice is the P4 interior trio,
a symmetric orbit at barycentric (0.5516, 0.2242, 0.2242) here
(warp-and-blend alpha=0), vs equispaced (0.5, 0.25, 0.25): any symmetric
GLL-edge variant (incl. basix's) differs from ours by at most the warp
magnitude 0.058 at those nodes only. The effect on solution error norms
is measured by scripts/variant_effect_tgv.py (FIDELITY.md).
"""

import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from oasisx_tpu.elements.element import FiniteElement  # noqa: E402
from oasisx_tpu.elements.nodes import lagrange_nodes  # noqa: E402

OUT = Path(__file__).resolve().parents[1] / "tests" / "fixtures" / "lagrange_nodes.npz"

CELLS = {"interval": 1, "triangle": 2, "tetrahedron": 3}


def probe_points(dim: int, n: int = 7) -> np.ndarray:
    """Fixed deterministic interior probe points on the unit simplex."""
    rng = np.random.default_rng(20260818 + dim)
    # Dirichlet-like: normalize exponentials -> strictly interior barycentric
    e = -np.log(rng.uniform(0.1, 0.9, size=(n, dim + 1)))
    lam = e / e.sum(axis=1, keepdims=True)
    return lam[:, 1:]


def main() -> None:
    out = {}
    for cell, dim in CELLS.items():
        pts = probe_points(dim)
        out[f"probe_{cell}"] = pts
        for deg in (1, 2, 3, 4):
            for variant in ("gll_warped", "equispaced"):
                nodes = lagrange_nodes(cell, deg, variant)
                out[f"nodes_{cell}_p{deg}_{variant}"] = nodes
            el = FiniteElement("Lagrange", cell, deg, "gll_warped")
            phi, dphi = el.tabulate(pts)
            out[f"phi_{cell}_p{deg}"] = np.asarray(phi)
            out[f"dphi_{cell}_p{deg}"] = np.asarray(dphi)
    OUT.parent.mkdir(parents=True, exist_ok=True)
    np.savez_compressed(OUT, **out)
    print(f"wrote {OUT} ({len(out)} arrays)")


if __name__ == "__main__":
    main()
