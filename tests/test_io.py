"""IO tests: checkpoint/restore (incl. AMR-history replay) and VTK.

Mirrors the reference's `d4est_test_checkpoint.c` and `d4est_test_vtk.c`.
"""

import os

import numpy as np
import jax.numpy as jnp

from disco4est_tpu.geometry.brick import BrickGeometry
from disco4est_tpu.mesh.tree import Forest
from disco4est_tpu.mesh.builder import build_mesh
from disco4est_tpu.amr.amr import refine_and_balance, transfer_field
from disco4est_tpu.io import checkpoint as ckpt
from disco4est_tpu.io.vtk import write_vtu


def test_checkpoint_roundtrip(tmp_path):
    geom = BrickGeometry(dim=3)
    forest = Forest.uniform(geom.conn, 1)
    flags = np.zeros(forest.n_elements, bool)
    flags[0] = True
    forest2 = refine_and_balance(forest, flags)
    mesh = build_mesh(geom, forest2, deg=2)
    u = mesh.init_field(lambda x, y, z: x * y + z)

    path = str(tmp_path / "chk")
    history = [np.where(flags, -2, 2)]
    ckpt.save(path, forest2, {"u": np.asarray(u)}, deg=2,
              amr_history=history, extra={"amr_step": 1})

    f2, fields, deg, hist, extra = ckpt.load(path, geom.conn)
    assert f2.n_elements == forest2.n_elements
    assert f2.checksum() == forest2.checksum()
    assert deg == 2
    assert np.allclose(fields["u"], np.asarray(u))
    assert extra["amr_step"] == 1

    # history replay reproduces the same forest (size-independent restore)
    replayed = ckpt.replay_amr_history(forest, hist)
    assert replayed.checksum() == forest2.checksum()


def test_checkpoint_detects_corruption(tmp_path):
    geom = BrickGeometry(dim=2)
    forest = Forest.uniform(geom.conn, 1)
    path = str(tmp_path / "chk")
    ckpt.save(path, forest, {}, deg=1)
    data = dict(np.load(path + ".npz"))
    data["level"] = data["level"].copy()
    data["level"][0] += 1
    np.savez(path + ".npz", **data)
    try:
        ckpt.load(path, geom.conn)
        assert False, "should have raised"
    except ValueError:
        pass


def test_vtk_writer(tmp_path):
    geom = BrickGeometry(dim=3)
    forest = Forest.uniform(geom.conn, 1)
    mesh = build_mesh(geom, forest, deg=2)
    u = mesh.init_field(lambda x, y, z: x + y + z)
    path = str(tmp_path / "out.vtu")
    write_vtu(path, mesh, point_fields={"u": u},
              cell_fields={"eta2": np.arange(mesh.n_elements)})
    text = open(path).read()
    assert "UnstructuredGrid" in text
    assert 'Name="u"' in text
    assert 'Name="eta2"' in text
    assert text.count("VTKFile") == 2
    # voxel cells: E * (deg)^dim
    assert f'NumberOfCells="{mesh.n_elements * 8}"' in text
