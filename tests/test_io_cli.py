"""I/O, checkpoint, CLI, and demo smoke tests (reference CI runs the demos
as smoke tests, .github/workflows/tests.yml:59)."""

import sys
from pathlib import Path

import numpy as np
import pytest

sys.path.insert(0, str(Path(__file__).resolve().parents[1] / "demo"))

from oasisx_tpu.io import Checkpoint, VTXWriter, import_mesh, write_vtu
from oasisx_tpu.meshes import create_unit_square
from oasisx_tpu.spaces import Function, FunctionSpace


def test_import_mesh_npz(tmp_path):
    m = create_unit_square(4)
    f = tmp_path / "mesh.npz"
    np.savez(f, points=m.x, cells=m.cells, cell_type="triangle")
    m2 = import_mesh(f)
    assert m2.num_cells == m.num_cells
    assert np.allclose(m2.x, m.x)


def test_import_mesh_fallback():
    m = import_mesh(None)
    assert m.num_cells == 200  # 10x10 unit square, reference stub behavior


def test_import_gmsh22(tmp_path):
    msh = tmp_path / "tri.msh"
    msh.write_text(
        "$MeshFormat\n2.2 0 8\n$EndMeshFormat\n"
        "$Nodes\n4\n1 0 0 0\n2 1 0 0\n3 1 1 0\n4 0 1 0\n$EndNodes\n"
        "$Elements\n2\n1 2 2 0 1 1 2 3\n2 2 2 0 1 1 3 4\n$EndElements\n"
    )
    m = import_mesh(msh)
    assert m.cell_type == "triangle"
    assert m.num_cells == 2
    assert abs(m.cell_volumes().sum() - 1.0) < 1e-12


def test_vtx_writer_and_vtu(tmp_path):
    mesh = create_unit_square(3)
    V = FunctionSpace(mesh, ("Lagrange", 1))
    f = Function(V, name="f")
    f.interpolate(lambda x: x[0])
    w = VTXWriter(tmp_path / "out.bp", [f])
    w.write(0.0)
    f.interpolate(lambda x: 2 * x[0])
    w.write(0.1)
    w.close()
    assert (tmp_path / "out_00000.vtu").exists()
    assert (tmp_path / "out.pvd").exists()
    assert (tmp_path / "out_00001.npz").exists()
    data = np.load(tmp_path / "out_00001.npz")
    assert np.allclose(data["f"], 2 * V.dof_coords[:, 0])


def test_checkpoint_roundtrip(tmp_path):
    from oasisx_tpu import DirichletBC, FractionalStep_AB_CN, LocatorMethod
    from oasisx_tpu.meshes import meshtags

    mesh = create_unit_square(4)
    facets = mesh.exterior_facet_indices()
    tags = meshtags(mesh, 1, facets, np.full_like(facets, 1))
    bcs = [[DirichletBC(0.0, LocatorMethod.TOPOLOGICAL, (tags, 1))] for _ in range(2)]
    s1 = FractionalStep_AB_CN(mesh, ("Lagrange", 2), ("Lagrange", 1), bcs, [])
    s1._u1[0].interpolate(lambda x: np.sin(np.pi * x[0]) * np.sin(np.pi * x[1]))
    s1.solve(0.01, 0.1, max_iter=1)
    ck = Checkpoint(tmp_path / "state.npz")
    ck.save(s1, t=0.01, step=1)

    s2 = FractionalStep_AB_CN(mesh, ("Lagrange", 2), ("Lagrange", 1), bcs, [])
    t, step = ck.load(s2)
    assert (t, step) == (0.01, 1)
    # both advance identically from the checkpoint
    s1.solve(0.01, 0.1, max_iter=1)
    s2.solve(0.01, 0.1, max_iter=1)
    assert np.allclose(s1._u[0].x.array, s2._u[0].x.array, atol=1e-12)


def test_cli_smoke(tmp_path):
    from oasisx_tpu.main import main

    main(
        [
            "-dt", "0.05", "-T", "0.1", "-nu", "0.1",
            "--output", str(tmp_path / "run.bp"),
            "--checkpoint", str(tmp_path / "ck.npz"),
        ]
    )
    assert (tmp_path / "run.pvd").exists()
    assert (tmp_path / "ck.npz").exists()


def test_taylor_green_demo_smoke():
    import taylor_green as tg

    rate_u, rate_p = tg.main(["-N", "4", "-N", "8", "-dt", "0.02", "-T1", "0.1"])
    assert np.isfinite(rate_u).all() and np.isfinite(rate_p).all()


def test_assembly_strategies_demo_smoke(capsys):
    import assembly_strategies as ast

    ast.main(["--dim", "2", "--max-degree", "2", "-n", "4", "--repeats", "1"])
    out = capsys.readouterr().out
    assert "action" in out


def test_assembly_bcs_demo_smoke(capsys):
    import assembly_bcs as abc_demo

    abc_demo.main(["--dim", "2", "-n", "3", "--max-degree", "2", "--repeats", "1"])
    out = capsys.readouterr().out
    assert "matvec" in out


def test_channel_demo_poiseuille():
    """Channel flow converges toward the exact parabolic profile
    (BASELINE config #2: BC lifting + outlet)."""
    import channel

    err_x, err_y = channel.main(["-N", "6", "-T", "0.5", "-dt", "0.025"])
    assert err_x < 0.02 and err_y < 0.02


def test_taylor_green3d_demo_smoke():
    """3D TG energy-dissipation demo (BASELINE config #4) runs and decays."""
    import taylor_green3d as tg3

    out = tg3.main(["-N", "6", "-dt", "0.02", "-T", "0.2", "--chunk", "5"])
    e = out["kinetic_energy"]
    assert e[0] > 0 and np.isfinite(e).all()
    assert e[-1] <= e[0] * 1.001  # energy does not grow


def test_vessel_demo_smoke():
    import vessel

    out = vessel.main(["--n-axial", "8", "--n-cross", "3", "-T", "0.06", "-dt", "0.02"])
    assert np.isfinite(out["max_velocity"]).all()
