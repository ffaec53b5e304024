"""Structured simplex mesh generators.

TPU-native equivalents of the DOLFINx generators the reference exercises:
create_unit_square / create_rectangle / create_unit_cube / create_box
(/root/reference/demo/taylor_green.py:126, test/* throughout).
"""

from __future__ import annotations

import numpy as np

from .mesh import Mesh, StructuredInfo


def create_interval(n: int, a: float = 0.0, b: float = 1.0) -> Mesh:
    x = np.linspace(a, b, n + 1)[:, None]
    cells = np.stack([np.arange(n), np.arange(1, n + 1)], axis=1)
    info = StructuredInfo(
        origin=np.array([a]), spacing=np.array([(b - a) / n]), shape=(n,), nshapes=1
    )
    return Mesh(x, cells, "interval", structured=info)


def create_rectangle(
    p0: tuple[float, float],
    p1: tuple[float, float],
    n: tuple[int, int],
    diagonal: str = "right",
) -> Mesh:
    """Triangulated rectangle [p0, p1] with n[0] x n[1] quads, 2 triangles each."""
    nx, ny = n
    xs = np.linspace(p0[0], p1[0], nx + 1)
    ys = np.linspace(p0[1], p1[1], ny + 1)
    X, Y = np.meshgrid(xs, ys, indexing="ij")
    pts = np.stack([X.ravel(), Y.ravel()], axis=1)

    def vid(i, j):
        return i * (ny + 1) + j

    I, J = np.meshgrid(np.arange(nx), np.arange(ny), indexing="ij")
    v00 = vid(I, J).ravel()
    v10 = vid(I + 1, J).ravel()
    v01 = vid(I, J + 1).ravel()
    v11 = vid(I + 1, J + 1).ravel()
    if diagonal == "right":
        t1 = np.stack([v00, v10, v11], axis=1)
        t2 = np.stack([v00, v11, v01], axis=1)
    elif diagonal == "left":
        t1 = np.stack([v00, v10, v01], axis=1)
        t2 = np.stack([v10, v11, v01], axis=1)
    else:
        raise ValueError(f"unknown diagonal {diagonal!r}")
    cells = np.concatenate([t1, t2], axis=0)
    info = StructuredInfo(
        origin=np.array([p0[0], p0[1]], dtype=float),
        spacing=np.array([(p1[0] - p0[0]) / nx, (p1[1] - p0[1]) / ny]),
        shape=(nx, ny),
        nshapes=2,
    )
    return Mesh(pts, cells, "triangle", structured=info)


def create_unit_square(nx: int, ny: int | None = None) -> Mesh:
    ny = nx if ny is None else ny
    return create_rectangle((0.0, 0.0), (1.0, 1.0), (nx, ny))


def create_box(
    p0: tuple[float, float, float],
    p1: tuple[float, float, float],
    n: tuple[int, int, int],
) -> Mesh:
    """Tetrahedralized box: each hex cell split into 6 tets (Kuhn split).

    The Kuhn split triangulates every cube identically along the main
    diagonal, so facet triangulations agree between adjacent cubes.
    """
    nx, ny, nz = n
    xs = np.linspace(p0[0], p1[0], nx + 1)
    ys = np.linspace(p0[1], p1[1], ny + 1)
    zs = np.linspace(p0[2], p1[2], nz + 1)
    X, Y, Z = np.meshgrid(xs, ys, zs, indexing="ij")
    pts = np.stack([X.ravel(), Y.ravel(), Z.ravel()], axis=1)

    def vid(i, j, k):
        return (i * (ny + 1) + j) * (nz + 1) + k

    I, J, K = np.meshgrid(np.arange(nx), np.arange(ny), np.arange(nz), indexing="ij")
    I, J, K = I.ravel(), J.ravel(), K.ravel()
    c = {}
    for dx in (0, 1):
        for dy in (0, 1):
            for dz in (0, 1):
                c[(dx, dy, dz)] = vid(I + dx, J + dy, K + dz)
    # Kuhn: for each permutation (e1,e2,e3) of unit steps, the tet
    # [000, e1, e1+e2, 111]
    import itertools

    tets = []
    for perm in itertools.permutations([(1, 0, 0), (0, 1, 0), (0, 0, 1)]):
        a = (0, 0, 0)
        b = perm[0]
        cc = tuple(np.add(perm[0], perm[1]))
        d = (1, 1, 1)
        tets.append(np.stack([c[a], c[b], c[cc], c[d]], axis=1))
    cells = np.concatenate(tets, axis=0)
    info = StructuredInfo(
        origin=np.array(p0, dtype=float),
        spacing=np.array(
            [(p1[0] - p0[0]) / nx, (p1[1] - p0[1]) / ny, (p1[2] - p0[2]) / nz]
        ),
        shape=(nx, ny, nz),
        nshapes=6,
    )
    return Mesh(pts, cells, "tetrahedron", structured=info)


def create_unit_cube(nx: int, ny: int | None = None, nz: int | None = None) -> Mesh:
    ny = nx if ny is None else ny
    nz = nx if nz is None else nz
    return create_box((0.0, 0.0, 0.0), (1.0, 1.0, 1.0), (nx, ny, nz))


def create_cylinder_channel(
    res: int = 40,
    length: float = 2.2,
    height: float = 0.41,
    center: tuple[float, float] = (0.2, 0.2),
    radius: float = 0.05,
) -> Mesh:
    """Channel with a circular obstacle (DFG 2D cylinder benchmark geometry).

    Construction: uniform triangulated rectangle, remove cells whose
    centroid falls inside the circle, then project the ring of vertices
    inside/near the circle onto it. Produces an unstructured mesh (no
    ``structured`` fast path) exercising the general assembly engine.
    """
    ny = res
    nx = int(round(res * length / height))
    base = create_rectangle((0.0, 0.0), (length, height), (nx, ny))
    c = np.asarray(center)
    pts = base.x.copy()
    d_v = np.linalg.norm(pts - c, axis=1)

    centroid = pts[base.cells].mean(axis=1)
    d_c = np.linalg.norm(centroid - c, axis=1)
    keep = d_c > radius
    cells = base.cells[keep]

    # project interior/near-circle vertices used by remaining cells onto it
    used = np.unique(cells)
    h = height / ny
    snap = np.zeros(len(pts), dtype=bool)
    snap[used] = d_v[used] < radius + 0.35 * h
    r_safe = np.where(d_v > 1e-12, d_v, 1.0)
    proj = c + (pts - c) * (radius / r_safe)[:, None]
    pts[snap] = proj[snap]

    # compact vertex numbering
    remap = -np.ones(len(pts), dtype=np.int64)
    remap[used] = np.arange(len(used))
    mesh = Mesh(pts[used], remap[cells], "triangle")
    vols = mesh.cell_volumes()
    if vols.min() <= 1e-12 * vols.max():
        raise ValueError(
            "degenerate cells after cylinder projection; increase resolution"
        )
    return mesh
