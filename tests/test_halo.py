"""Halo-exchange shard_map apply: equality with the reference apply and
communication pattern (all-to-all, no all-gathers).
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from disco4est_tpu.geometry.brick import BrickGeometry
from disco4est_tpu.mesh.tree import Forest
from disco4est_tpu.mesh.builder import build_mesh
from disco4est_tpu.laplacian.sipg import apply_sipg, apply_sipg_jit
from disco4est_tpu.parallel.sharding import (
    element_mesh,
    shard_mesh_data,
    shard_field,
)
from disco4est_tpu.parallel.halo import build_halo_program, apply_sipg_halo


def test_halo_apply_matches_reference():
    geom = BrickGeometry(dim=3)
    forest = Forest.uniform(geom.conn, 2)  # 64 elements / 8 devices
    mesh = build_mesh(geom, forest, deg=2)
    rng = np.random.default_rng(3)
    u = jnp.asarray(rng.standard_normal((64, 3, 3, 3)))

    ref = apply_sipg_jit(mesh, u)

    dev_mesh = element_mesh(jax.devices()[:8])
    halo = build_halo_program(mesh, 8)
    mesh_s = shard_mesh_data(mesh, dev_mesh)
    u_s = shard_field(u, dev_mesh)

    halo_jit = jax.jit(
        lambda m, h, v: apply_sipg_halo(m, h, v, dev_mesh)
    )
    out = halo_jit(mesh_s, halo, u_s)
    err = float(jnp.max(jnp.abs(out - ref)))
    assert err < 1e-11, err


def test_halo_apply_communication_pattern():
    """The compiled halo apply must use all-to-all (O(halo) bytes), not
    the GSPMD all-gathers (O(global) bytes)."""
    geom = BrickGeometry(dim=3)
    forest = Forest.uniform(geom.conn, 2)
    mesh = build_mesh(geom, forest, deg=2)
    dev_mesh = element_mesh(jax.devices()[:8])
    halo = build_halo_program(mesh, 8)
    mesh_s = shard_mesh_data(mesh, dev_mesh)
    u = shard_field(jnp.zeros((64, 3, 3, 3)), dev_mesh)

    txt = (
        jax.jit(lambda m, h, v: apply_sipg_halo(m, h, v, dev_mesh))
        .lower(mesh_s, halo, u)
        .compile()
        .as_text()
    )
    assert "all-to-all" in txt
    assert txt.count("all-gather") == 0, txt.count("all-gather")
