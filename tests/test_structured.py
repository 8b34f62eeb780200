"""Structured (lex-order) SIPG apply == generic fast apply.

The uniform-brick structured path permutes elements once per solve and
replaces the neighbor gather by constant row shifts; the operator must
be the SAME discrete operator under the permutation.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from disco4est_tpu.geometry.brick import BrickGeometry
from disco4est_tpu.mesh.tree import Forest
from disco4est_tpu.mesh.builder import build_mesh
from disco4est_tpu.laplacian.fast import apply_sipg_fast
from disco4est_tpu.laplacian.structured import (
    build_structured,
    apply_structured,
    to_lex,
    from_lex,
)


@pytest.mark.parametrize("deg,level", [(2, 1), (7, 1), (3, 2)])
def test_structured_matches_fast(deg, level):
    geom = BrickGeometry(dim=3)
    forest = Forest.uniform(geom.conn, level)
    mesh = build_mesh(geom, forest, deg=deg)
    sb = build_structured(mesh)
    assert sb is not None

    E = mesh.n_elements
    rng = np.random.default_rng(deg + level)
    u = jnp.asarray(
        rng.standard_normal((E,) + (deg + 1,) * 3), jnp.float32
    )
    ref = apply_sipg_fast(mesh, u.astype(jnp.float64))

    u_lex = to_lex(sb, u.reshape(E, -1))
    au_lex = apply_structured(sb, u_lex, precision="f32", interpret=True)
    out = from_lex(sb, au_lex).reshape(ref.shape)

    scale = float(jnp.max(jnp.abs(ref)))
    err = float(jnp.max(jnp.abs(out.astype(jnp.float64) - ref))) / scale
    assert err < 5e-6, err


def test_structured_unavailable_on_adapted_mesh():
    from disco4est_tpu.amr.amr import refine_and_balance

    geom = BrickGeometry(dim=3)
    forest = Forest.uniform(geom.conn, 1)
    mark = np.zeros(forest.n_elements, bool)
    mark[0] = True
    forest2 = refine_and_balance(forest, mark)
    mesh = build_mesh(geom, forest2, deg=2)
    assert build_structured(mesh) is None


def test_mixed_solve_with_structured_inner():
    """f64 Poisson solve where the inner f32 CG runs the structured
    Pallas apply in lex order — the production TPU configuration."""
    import jax.numpy as jnp
    from disco4est_tpu.laplacian.sipg import (
        apply_sipg,
        build_rhs_with_strong_bc,
    )
    from disco4est_tpu.laplacian.structured import make_inner_solve
    from disco4est_tpu.solvers.cg import cg_solve
    from disco4est_tpu.solvers.mixed import mixed_refine_solve

    geom = BrickGeometry(dim=3)
    forest = Forest.uniform(geom.conn, 1)
    mesh = build_mesh(geom, forest, deg=3)
    sb = build_structured(mesh)

    def u_exact(x, y, z):
        return jnp.sin(jnp.pi * x) * jnp.sin(jnp.pi * y) * jnp.sin(jnp.pi * z)

    f = mesh.init_field(
        lambda x, y, z: 3 * jnp.pi**2 * u_exact(x, y, z)
    )
    g = mesh.boundary_values(u_exact)
    rhs = build_rhs_with_strong_bc(mesh, f, g)

    x64 = cg_solve(
        lambda v: apply_sipg(mesh, v), rhs, atol=5e-15, rtol=1e-13,
        max_iter=20000,
    ).x

    res = mixed_refine_solve(
        lambda v: apply_sipg(mesh, v),
        rhs,
        inner_solve=make_inner_solve(sb, rtol=1e-4, precision="f32"),
        atol=5e-15,
        rtol=1e-12,
    )
    assert float(res.residual_norm) < 1e-11
    rel = float(
        jnp.linalg.norm((res.x - x64).ravel())
        / jnp.linalg.norm(x64.ravel())
    )
    assert rel < 1e-10, rel
