"""Hanging-node (2:1 nonconforming) mesh tests.

Mirrors the reference's hanging-face coverage (`d4est_test_pbalance.c`,
Schwarz hanging tests, and the mortar machinery of
`Mesh/d4est_mortars.c:601-806`): operator symmetry, SPD, polynomial
consistency through the hp-mortar projections, AMR field transfer, and
convergence on an adaptively refined mesh.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from disco4est_tpu.geometry.brick import BrickGeometry
from disco4est_tpu.mesh.tree import Forest
from disco4est_tpu.mesh.builder import build_mesh
from disco4est_tpu.laplacian.sipg import (
    apply_sipg,
    apply_sipg_jit,
    build_rhs_with_strong_bc,
)
from disco4est_tpu.solvers.cg import cg_solve
from disco4est_tpu.amr.amr import refine_and_balance, transfer_field


def _hanging_forest(dim, base_level=1, n_refine=1):
    geom = BrickGeometry(dim=dim)
    forest = Forest.uniform(geom.conn, base_level)
    for _ in range(n_refine):
        flags = np.zeros(forest.n_elements, bool)
        flags[0] = True
        forest = refine_and_balance(forest, flags)
    return geom, forest


def _dense(mesh):
    n = mesh.local_nodes
    shape = (mesh.n_elements,) + (mesh.nl,) * mesh.dim
    cols = []
    for i in range(n):
        e = np.zeros(n)
        e[i] = 1.0
        cols.append(
            np.asarray(apply_sipg_jit(mesh, jnp.asarray(e.reshape(shape)))).reshape(-1)
        )
    return np.stack(cols, 1)


@pytest.mark.parametrize("dim,deg", [(2, 2), (3, 1)])
def test_hanging_symmetry_spd(dim, deg):
    geom, forest = _hanging_forest(dim)
    assert len(set(forest.level.tolist())) == 2  # truly nonconforming
    mesh = build_mesh(geom, forest, deg=deg)
    assert mesh.hc_elem.shape[0] > 0
    A = _dense(mesh)
    assert np.max(np.abs(A - A.T)) < 1e-11 * np.max(np.abs(A))
    w = np.linalg.eigvalsh(0.5 * (A + A.T))
    assert w.min() > 0


@pytest.mark.parametrize("dim", [2, 3])
def test_hanging_polynomial_consistency(dim):
    deg = 2
    geom, forest = _hanging_forest(dim)
    mesh = build_mesh(geom, forest, deg=deg)
    if dim == 2:
        u_fcn = lambda x, y: x * x - 2 * y * y + x * y + 1.0
        f = mesh.init_field(lambda x, y: 0 * x + 2.0)
    else:
        # Δu = 2 - 4 + 2 + 0 = 0
        u_fcn = lambda x, y, z: x * x - 2 * y * y + z * z + x * y
        f = mesh.init_field(lambda x, y, z: 0 * x)
    u = mesh.init_field(u_fcn)
    g = mesh.boundary_values(u_fcn)
    rhs = build_rhs_with_strong_bc(mesh, f, g)
    Au = apply_sipg_jit(mesh, u)
    scale = float(jnp.max(jnp.abs(rhs)))
    assert float(jnp.max(jnp.abs(Au - rhs))) < 1e-10 * max(scale, 1.0)


def test_transfer_field_exact_for_polynomials():
    dim, deg = 2, 3
    geom, forest = _hanging_forest(dim, base_level=1, n_refine=2)
    mesh0 = build_mesh(geom, Forest.uniform(geom.conn, 1), deg=deg)
    u_fcn = lambda x, y: x**3 - y * x + 2.0 * y * y
    u0 = mesh0.init_field(u_fcn)
    u1 = transfer_field(mesh0.forest, forest, u0, deg)
    mesh1 = build_mesh(geom, forest, deg=deg)
    u1_exact = mesh1.init_field(u_fcn)
    assert float(jnp.max(jnp.abs(u1 - u1_exact))) < 1e-11


@jax.jit
def _cg(mesh, rhs):
    return cg_solve(
        lambda v: apply_sipg(mesh, v), rhs, atol=1e-14, rtol=1e-30,
        max_iter=5000,
    )


def test_hanging_solve_2d():
    """Solve Poisson on a nonconforming mesh; error must be comparable to
    (or better than) the uniform coarse mesh."""
    dim, deg = 2, 2
    geom, forest = _hanging_forest(dim, base_level=2, n_refine=1)
    mesh = build_mesh(geom, forest, deg=deg)

    def u_fcn(x, y):
        return jnp.sin(jnp.pi * x) * jnp.sin(jnp.pi * y)

    g = mesh.boundary_values(u_fcn)
    f = mesh.init_field(lambda *c: 2 * jnp.pi**2 * u_fcn(*c))
    rhs = build_rhs_with_strong_bc(mesh, f, g)
    res = _cg(mesh, rhs)
    u_a = mesh.init_field(u_fcn)
    err = float(jnp.sqrt(jnp.sum(mesh.l2_norm_sqr(res.x - u_a))))

    mesh_c = build_mesh(geom, Forest.uniform(geom.conn, 2), deg=deg)
    g_c = mesh_c.boundary_values(u_fcn)
    f_c = mesh_c.init_field(lambda *c: 2 * jnp.pi**2 * u_fcn(*c))
    res_c = _cg(mesh_c, build_rhs_with_strong_bc(mesh_c, f_c, g_c))
    u_a_c = mesh_c.init_field(u_fcn)
    err_c = float(jnp.sqrt(jnp.sum(mesh_c.l2_norm_sqr(res_c.x - u_a_c))))

    assert res.iterations > 0
    assert err < 2.0 * err_c, (err, err_c)


def test_dense_hanging_matches_legacy():
    """The dense [E, 2d] mortar pass of `fast._apply_orth` (hang_code
    tables) is the same operator as the legacy [M, K] row kernels, to
    roundoff, in 2D and 3D."""
    import dataclasses

    from disco4est_tpu.laplacian import fast

    rng = np.random.default_rng(3)
    for dim, lvl, deg in ((2, 2, 4), (3, 2, 3)):
        geom = BrickGeometry(dim=dim)
        forest = Forest.uniform(geom.conn, lvl)
        forest = forest.refine(np.arange(forest.n_elements) < 5).balance()
        mesh = build_mesh(geom, forest, deg=deg)
        assert mesh.hang_code is not None and mesh.hc_elem.shape[0] > 0
        u = jnp.asarray(
            rng.standard_normal((mesh.n_elements,) + (mesh.nl,) * dim)
        )
        a_dense = fast.apply_sipg_fast(mesh, u)
        legacy = dataclasses.replace(mesh, hang_code=None, hang_sigma=None)
        a_legacy = fast.apply_sipg_fast(legacy, u)
        rel = float(
            jnp.max(jnp.abs(a_dense - a_legacy)) / jnp.max(jnp.abs(a_legacy))
        )
        assert rel < 1e-13, (dim, rel)
