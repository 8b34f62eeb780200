"""GEMM-form fast SIPG apply (laplacian/fast.py) vs the general path.

The fast path is an algebraic reordering of the exact same discrete
operator (same quadrature rule folded into Lobatto-space matrices), so in
f64 the two must agree to roundoff on every affine conforming mesh.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from disco4est_tpu.geometry.brick import BrickGeometry
from disco4est_tpu.laplacian.fast import apply_sipg_fast, fast_path_available
from disco4est_tpu.laplacian.sipg import apply_sipg
from disco4est_tpu.mesh.builder import build_mesh
from disco4est_tpu.mesh.tree import Forest


def _mesh(dim, level, deg, nt=(1, 1, 1), quad=None, deg_quad=None):
    geom = BrickGeometry(
        x0=(0.0,) * dim, x1=(1.0, 2.0, 0.5)[:dim],
        n_trees_per_dim=nt[:dim], dim=dim,
    )
    forest = Forest.uniform(geom.conn, level)
    return build_mesh(geom, forest, deg=deg, quad=quad, deg_quad=deg_quad)


def _general(mesh, u, g=None):
    return apply_sipg(mesh, u, g, volume_mode="tensor")


@pytest.mark.parametrize(
    "dim,level,deg",
    [(2, 2, 3), (3, 1, 2), (3, 1, 4), (3, 2, 3)],
)
def test_fast_matches_general(dim, level, deg):
    mesh = _mesh(dim, level, deg)
    assert fast_path_available(mesh, "full", None)
    rng = np.random.default_rng(0)
    u = jnp.asarray(
        rng.standard_normal((mesh.n_elements,) + (deg + 1,) * dim)
    )
    a = _general(mesh, u)
    b = apply_sipg_fast(mesh, u)
    scale = float(jnp.max(jnp.abs(a))) + 1e-300
    assert float(jnp.max(jnp.abs(a - b))) / scale < 1e-12


def test_fast_matches_general_multitree_anisotropic():
    mesh = _mesh(3, 1, 3, nt=(2, 1, 3))
    rng = np.random.default_rng(1)
    u = jnp.asarray(rng.standard_normal((mesh.n_elements, 4, 4, 4)))
    a = _general(mesh, u)
    b = apply_sipg_fast(mesh, u)
    scale = float(jnp.max(jnp.abs(a)))
    assert float(jnp.max(jnp.abs(a - b))) / scale < 1e-12


def test_fast_with_dirichlet_data():
    mesh = _mesh(3, 1, 3)
    rng = np.random.default_rng(2)
    E, nl = mesh.n_elements, mesh.nl
    u = jnp.asarray(rng.standard_normal((E, nl, nl, nl)))
    g = jnp.asarray(rng.standard_normal((E, 6, nl, nl)))
    a = _general(mesh, u, g)
    b = apply_sipg_fast(mesh, u, g)
    scale = float(jnp.max(jnp.abs(a)))
    assert float(jnp.max(jnp.abs(a - b))) / scale < 1e-12


def test_fast_general_affine_blocks():
    """Force the non-orthogonal (6-block) path on a brick: off-diagonal
    coefficients are zero but the full code path runs."""
    import dataclasses

    mesh = _mesh(3, 1, 3)
    mesh_gen = dataclasses.replace(mesh, orth=False)
    rng = np.random.default_rng(3)
    u = jnp.asarray(rng.standard_normal((mesh.n_elements, 4, 4, 4)))
    a = apply_sipg_fast(mesh, u)
    b = apply_sipg_fast(mesh_gen, u)
    scale = float(jnp.max(jnp.abs(a)))
    assert float(jnp.max(jnp.abs(a - b))) / scale < 1e-12


def test_fast_lobatto_quadrature():
    from disco4est_tpu.quadrature.quadrature import Quadrature

    mesh = _mesh(3, 1, 3, quad=Quadrature("lobatto"), deg_quad=3)
    rng = np.random.default_rng(4)
    u = jnp.asarray(rng.standard_normal((mesh.n_elements, 4, 4, 4)))
    a = _general(mesh, u)
    b = apply_sipg_fast(mesh, u)
    scale = float(jnp.max(jnp.abs(a)))
    assert float(jnp.max(jnp.abs(a - b))) / scale < 1e-12


def test_dispatch_uses_fast_path():
    """apply_sipg(auto) on an affine conforming mesh routes to the fast
    path and still matches the forced general path."""
    mesh = _mesh(3, 1, 2)
    rng = np.random.default_rng(5)
    u = jnp.asarray(rng.standard_normal((mesh.n_elements, 3, 3, 3)))
    a = apply_sipg(mesh, u)  # auto -> fast
    b = _general(mesh, u)
    scale = float(jnp.max(jnp.abs(a)))
    assert float(jnp.max(jnp.abs(a - b))) / scale < 1e-12
