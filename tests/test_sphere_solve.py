"""Poisson solves on cubed-sphere geometry: cross-tree orientation and
curved-element machinery end-to-end.

The reference's sphere-geometry solves (Poisson sphere options, the
TwoPunctures domains) exercise mortar orientation between rotated trees
and curved geometric factors; here we check operator symmetry on the
7-tree sphere and h-convergence of a manufactured solution.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from disco4est_tpu.geometry.cubed_sphere import CubedSphereGeometry
from disco4est_tpu.mesh.tree import Forest
from disco4est_tpu.mesh.builder import build_mesh
from disco4est_tpu.laplacian.sipg import (
    apply_sipg,
    apply_sipg_jit,
    build_rhs_with_strong_bc,
)
from disco4est_tpu.solvers.cg import cg_solve


def u_fcn(x, y, z):
    return x * x - 2.0 * y * y + z * z + x * y


def f_fcn(x, y, z):
    return 0.0 * x  # -lap(u) = -(2-4+2) = 0


@jax.jit
def _cg(mesh, rhs):
    return cg_solve(
        lambda v: apply_sipg(mesh, v), rhs, atol=1e-13, rtol=1e-30,
        max_iter=20000,
    )


def _solve(geom, level, deg, dq_inc=1):
    forest = Forest.uniform(geom.conn, level)
    mesh = build_mesh(geom, forest, deg=deg, deg_quad=deg + dq_inc,
                      penalty_prefactor=10.0)
    g = mesh.boundary_values(u_fcn)
    f = mesh.init_field(f_fcn)
    rhs = build_rhs_with_strong_bc(mesh, f, g)
    res = _cg(mesh, rhs)
    u_a = mesh.init_field(u_fcn)
    err = float(jnp.sqrt(jnp.sum(mesh.l2_norm_sqr(res.x - u_a))))
    return err, mesh, res


def test_sphere7_symmetry():
    geom = CubedSphereGeometry("7tree", R0=1.0, R1=2.0)
    forest = Forest.uniform(geom.conn, 0)  # 7 elements, all orientations
    mesh = build_mesh(geom, forest, deg=2, deg_quad=3, penalty_prefactor=10.0)
    n = mesh.local_nodes
    shape = (mesh.n_elements,) + (mesh.nl,) * 3
    cols = []
    for i in range(n):
        e = np.zeros(n)
        e[i] = 1.0
        cols.append(
            np.asarray(
                apply_sipg_jit(mesh, jnp.asarray(e.reshape(shape)))
            ).reshape(-1)
        )
    A = np.stack(cols, 1)
    asym = np.max(np.abs(A - A.T)) / np.max(np.abs(A))
    assert asym < 1e-11, asym
    # NOTE: with the default prefactor 2.0 this coarse curved mesh is
    # under-penalized (one negative eigenvalue, a property of SIPG on
    # strongly curved elements, not a bug); prefactor 10 restores SPD.
    w = np.linalg.eigvalsh(0.5 * (A + A.T))
    assert w.min() > 0, w.min()


def test_sphere7_convergence():
    geom = CubedSphereGeometry("7tree", R0=1.0, R1=2.0)
    # level 0 (7 elements) barely resolves the geometry; asymptotic rate
    # sets in from level 1 (measured: 0.279 / 8.12e-2 / 7.38e-3).
    errs = [_solve(geom, lv, deg=2)[0] for lv in (1, 2)]
    rate = np.log2(errs[0] / errs[1])
    # deg-2 SIPG on curved elements: expect ~h^3
    assert rate > 2.5, (errs, rate)


def test_sphere13_solve():
    geom = CubedSphereGeometry("13tree", R0=1.0, R1=1.5, R2=2.5)
    err, mesh, res = _solve(geom, 1, deg=2)
    assert mesh.n_elements == 13 * 8
    assert np.isfinite(err)
    assert err < 0.2, err
