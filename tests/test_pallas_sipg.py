"""Fused Pallas SIPG apply == XLA fast apply (orthogonal meshes).

Runs the TPU kernel in interpreter mode on CPU; the discrete operator
must agree with `fast.apply_sipg_fast` (itself f64-verified against the
general path) to f32 accumulation tolerance.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from disco4est_tpu.geometry.brick import BrickGeometry
from disco4est_tpu.mesh.tree import Forest
from disco4est_tpu.mesh.builder import build_mesh
from disco4est_tpu.laplacian.fast import apply_sipg_fast
from disco4est_tpu.laplacian.pallas_sipg import (
    apply_sipg_pallas,
    pallas_path_available,
)


@pytest.mark.parametrize("deg,level", [(2, 1), (3, 1), (7, 1)])
def test_pallas_matches_fast_iso(deg, level):
    geom = BrickGeometry(dim=3)
    forest = Forest.uniform(geom.conn, level)
    mesh = build_mesh(geom, forest, deg=deg)
    assert pallas_path_available(mesh, None)

    E = mesh.n_elements
    rng = np.random.default_rng(deg)
    u = jnp.asarray(
        rng.standard_normal((E,) + (deg + 1,) * 3), jnp.float32
    )
    ref = apply_sipg_fast(mesh, u.astype(jnp.float64))
    out = apply_sipg_pallas(mesh, u, precision="f32", interpret=True)
    scale = float(jnp.max(jnp.abs(ref)))
    err = float(jnp.max(jnp.abs(out.astype(jnp.float64) - ref))) / scale
    assert err < 5e-6, err


def test_pallas_matches_fast_orth_anisotropic():
    # non-cubic brick => orthogonal (3-block) but not isotropic
    geom = BrickGeometry(x1=(2.0, 1.0, 0.5), dim=3)
    forest = Forest.uniform(geom.conn, 1)
    mesh = build_mesh(geom, forest, deg=3)
    assert mesh.orth and not mesh.iso
    E = mesh.n_elements
    rng = np.random.default_rng(0)
    u = jnp.asarray(rng.standard_normal((E,) + (4,) * 3), jnp.float32)
    ref = apply_sipg_fast(mesh, u.astype(jnp.float64))
    out = apply_sipg_pallas(mesh, u, precision="f32", interpret=True)
    scale = float(jnp.max(jnp.abs(ref)))
    err = float(jnp.max(jnp.abs(out.astype(jnp.float64) - ref))) / scale
    assert err < 5e-6, err
