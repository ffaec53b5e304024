"""I/O: mesh import, time-series field output, checkpoint/resume.

Re-provides (TPU-natively, host-side; none of this is hot-path):
- ``import_mesh`` — the reference stub (src/oasisx/mesh.py:14-16) made real:
  .npz (points+cells), Gmsh ASCII .msh (v2.2), with the reference's
  fallback of a unit square for unknown/missing files.
- ``VTXWriter`` — time-series field writer (reference uses ADIOS2 BP4,
  demo/taylor_green.py:183-215); here: VTU (XML unstructured, P1 vertex
  data) series + .npz per step, viewable in ParaView.
- ``Checkpoint`` — state pytree save/restore (absent in the reference,
  SURVEY §5 'checkpoint/resume: none').
"""

from __future__ import annotations

import os
from pathlib import Path

import numpy as np

from .meshes.generation import create_unit_square
from .meshes.mesh import Mesh

_VTK_CELL = {"interval": 3, "triangle": 5, "tetrahedron": 10}


def import_mesh(path: str | os.PathLike) -> Mesh:
    """Import a mesh from .npz (points, cells, cell_type) or Gmsh .msh v2.2.

    Falls back to a 10x10 unit square when the file is missing — matching
    the reference stub's behavior (mesh.py:14-16) instead of crashing."""
    p = Path(path) if path is not None else None
    if p is None or not p.exists():
        if p is not None:
            import logging

            logging.getLogger("oasisx_tpu").warning(
                "mesh file %s not found; falling back to a 10x10 unit square "
                "(reference stub behavior)", p
            )
        return create_unit_square(10, 10)
    if p.suffix == ".npz":
        data = np.load(p, allow_pickle=False)
        cell_type = str(data["cell_type"]) if "cell_type" in data else None
        cells = data["cells"]
        if cell_type is None:
            cell_type = {2: "interval", 3: "triangle", 4: "tetrahedron"}[cells.shape[1]]
        return Mesh(data["points"], cells, cell_type)
    if p.suffix == ".msh":
        return _read_gmsh22(p)
    raise ValueError(f"unsupported mesh format: {p.suffix}")


def _read_gmsh22(path: Path) -> Mesh:
    """Minimal Gmsh ASCII v2.2 reader: nodes + highest-dim elements."""
    lines = path.read_text().splitlines()
    i = 0
    nodes = {}
    elems = {4: [], 2: [], 1: []}  # gmsh type -> vertex lists (tet, tri, line)
    while i < len(lines):
        line = lines[i].strip()
        if line == "$Nodes":
            n = int(lines[i + 1])
            for k in range(n):
                parts = lines[i + 2 + k].split()
                nodes[int(parts[0])] = [float(x) for x in parts[1:4]]
            i += n + 2
        elif line == "$Elements":
            n = int(lines[i + 1])
            for k in range(n):
                parts = lines[i + 2 + k].split()
                etype = int(parts[1])
                ntags = int(parts[2])
                verts = [int(v) for v in parts[3 + ntags :]]
                if etype in elems:
                    elems[etype].append(verts)
            i += n + 2
        else:
            i += 1
    ids = sorted(nodes)
    remap = {nid: j for j, nid in enumerate(ids)}
    pts = np.array([nodes[nid] for nid in ids])
    if elems[4]:
        cells = np.array([[remap[v] for v in e] for e in elems[4]], dtype=np.int32)
        return Mesh(pts, cells, "tetrahedron")
    if elems[2]:
        cells = np.array([[remap[v] for v in e] for e in elems[2]], dtype=np.int32)
        return Mesh(pts[:, :2], cells, "triangle")
    raise ValueError(f"no triangles or tetrahedra found in {path}")


def write_vtu(path: str | os.PathLike, mesh: Mesh, point_data: dict | None = None) -> None:
    """Write a VTU (XML unstructured grid, ASCII) file with vertex data.

    Fields are sampled at mesh vertices (for P>=1 Lagrange the vertex dofs
    are the leading block of the dof vector — spaces/dofmap.py layout)."""
    nv = mesh.num_vertices
    nc = mesh.num_cells
    pts3 = np.zeros((nv, 3))
    pts3[:, : mesh.gdim] = mesh.x
    nverts = mesh.cells.shape[1]
    with open(path, "w") as f:
        f.write('<?xml version="1.0"?>\n')
        f.write('<VTKFile type="UnstructuredGrid" version="0.1" byte_order="LittleEndian">\n')
        f.write(f'<UnstructuredGrid><Piece NumberOfPoints="{nv}" NumberOfCells="{nc}">\n')
        f.write('<Points><DataArray type="Float64" NumberOfComponents="3" format="ascii">\n')
        np.savetxt(f, pts3, fmt="%.10g")
        f.write("</DataArray></Points>\n<Cells>\n")
        f.write('<DataArray type="Int32" Name="connectivity" format="ascii">\n')
        np.savetxt(f, mesh.cells, fmt="%d")
        f.write('</DataArray>\n<DataArray type="Int32" Name="offsets" format="ascii">\n')
        np.savetxt(f, np.arange(1, nc + 1) * nverts, fmt="%d")
        f.write('</DataArray>\n<DataArray type="UInt8" Name="types" format="ascii">\n')
        np.savetxt(f, np.full(nc, _VTK_CELL[mesh.cell_type]), fmt="%d")
        f.write("</DataArray>\n</Cells>\n<PointData>\n")
        for name, arr in (point_data or {}).items():
            arr = np.asarray(arr)
            ncomp = 1 if arr.ndim == 1 else arr.shape[1]
            if ncomp == 2:  # pad 2D vectors for ParaView
                arr = np.column_stack([arr, np.zeros(len(arr))])
                ncomp = 3
            f.write(
                f'<DataArray type="Float64" Name="{name}" '
                f'NumberOfComponents="{ncomp}" format="ascii">\n'
            )
            np.savetxt(f, arr, fmt="%.10g")
            f.write("</DataArray>\n")
        f.write("</PointData>\n</Piece></UnstructuredGrid></VTKFile>\n")


class VTXWriter:
    """Time-series writer with the reference's API shape
    (``VTXWriter(comm?, filename, [functions]); write(t); close()``,
    demo/taylor_green.py:183-215). Produces ``<stem>_NNNN.vtu`` files plus a
    ParaView ``.pvd`` collection and an ``.npz`` per step with full dof
    vectors (lossless)."""

    def __init__(self, filename: str | os.PathLike, functions: list, engine: str = "vtu"):
        self._stem = Path(filename).with_suffix("")
        self._stem.parent.mkdir(parents=True, exist_ok=True)
        self._functions = functions
        self._steps: list[tuple[float, str]] = []

    def write(self, t: float) -> None:
        idx = len(self._steps)
        mesh = self._functions[0].function_space.mesh
        nv = mesh.num_vertices
        point_data = {}
        raw = {}
        for f in self._functions:
            V = f.function_space
            arr = f.x.array
            raw[f.name] = arr
            if V.bs == 1:
                point_data[f.name] = arr[:nv]
            else:
                point_data[f.name] = arr.reshape(-1, V.bs)[:nv]
        fname = f"{self._stem.name}_{idx:05d}.vtu"
        write_vtu(self._stem.parent / fname, mesh, point_data)
        np.savez(self._stem.parent / f"{self._stem.name}_{idx:05d}.npz", t=t, **raw)
        self._steps.append((t, fname))

    def close(self) -> None:
        pvd = ['<?xml version="1.0"?>', '<VTKFile type="Collection" version="0.1">', "<Collection>"]
        for t, fname in self._steps:
            pvd.append(f'<DataSet timestep="{t}" part="0" file="{fname}"/>')
        pvd += ["</Collection>", "</VTKFile>"]
        (self._stem.parent / f"{self._stem.name}.pvd").write_text("\n".join(pvd))

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()


class Checkpoint:
    """Solver state checkpoint/resume (u, u1, u2, p, dp, t, step)."""

    def __init__(self, path: str | os.PathLike):
        self.path = Path(path)
        self.path.parent.mkdir(parents=True, exist_ok=True)

    def save(self, solver, t: float, step: int) -> None:
        data = dict(t=t, step=step, p=solver._p.x.array, dp=solver._dp.x.array)
        for i in range(solver._mesh.dim):
            data[f"u{i}"] = solver._u[i].x.array
            data[f"u1_{i}"] = solver._u1[i].x.array
            data[f"u2_{i}"] = solver._u2[i].x.array
        np.savez(self.path, **data)

    def load(self, solver) -> tuple[float, int]:
        data = np.load(self.path)
        solver._p.x.array[:] = data["p"]
        solver._dp.x.array[:] = data["dp"]
        for i in range(solver._mesh.dim):
            solver._u[i].x.array[:] = data[f"u{i}"]
            solver._u1[i].x.array[:] = data[f"u1_{i}"]
            solver._u2[i].x.array[:] = data[f"u2_{i}"]
        return float(data["t"]), int(data["step"])
