"""Quadrature rules on unit simplices.

Collapsed (Duffy) Gauss-Legendre product rules: setup-time host code, exact
for any requested polynomial degree. Slightly more points than optimal
symmetric rules — irrelevant, since tables are baked once and the per-cell
contraction cost is dominated by tensor shapes that XLA tiles onto the MXU.
"""

from __future__ import annotations

import numpy as np


def _gauss_01(n: int) -> tuple[np.ndarray, np.ndarray]:
    x, w = np.polynomial.legendre.leggauss(n)
    return (x + 1.0) / 2.0, w / 2.0


def quadrature(cell: str, degree: int) -> tuple[np.ndarray, np.ndarray]:
    """Return (points, weights) exact for polynomials of total degree ``degree``.

    Points have shape (nq, dim); weights sum to the reference-cell volume
    (1, 1/2, 1/6 for interval/triangle/tetrahedron).
    """
    if cell == "interval":
        n = max(1, (degree + 2) // 2)
        x, w = _gauss_01(n)
        return x[:, None], w
    if cell == "triangle":
        # x = u*(1-v), y = v ; jacobian (1-v): v-direction integrand degree
        # rises by 1, so use degree+1 exactness there.
        nu = max(1, (degree + 2) // 2)
        nv = max(1, (degree + 3) // 2)
        u, wu = _gauss_01(nu)
        v, wv = _gauss_01(nv)
        U, V = np.meshgrid(u, v, indexing="ij")
        WU, WV = np.meshgrid(wu, wv, indexing="ij")
        x = U * (1.0 - V)
        y = V
        w = WU * WV * (1.0 - V)
        return np.stack([x.ravel(), y.ravel()], axis=1), w.ravel()
    if cell == "tetrahedron":
        # x = u*(1-v)*(1-w), y = v*(1-w), z = w; jacobian (1-v)(1-w)^2
        nu = max(1, (degree + 2) // 2)
        nv = max(1, (degree + 3) // 2)
        nw = max(1, (degree + 4) // 2)
        u, wu = _gauss_01(nu)
        v, wv = _gauss_01(nv)
        t, wt = _gauss_01(nw)
        U, V, T = np.meshgrid(u, v, t, indexing="ij")
        WU, WV, WT = np.meshgrid(wu, wv, wt, indexing="ij")
        x = U * (1.0 - V) * (1.0 - T)
        y = V * (1.0 - T)
        z = T
        w = WU * WV * WT * (1.0 - V) * (1.0 - T) ** 2
        return np.stack([x.ravel(), y.ravel(), z.ravel()], axis=1), w.ravel()
    raise ValueError(f"unknown cell {cell}")
