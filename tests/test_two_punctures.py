"""TwoPunctures end-to-end: Bowen-York binary-puncture initial data on
the compactified 7-tree cubed sphere with Robin far-field BCs.

Mirrors the reference's regression configuration
(`Tests/Regression/d4est_test_twopunctures.sh` + `options_test.input`:
cubed_sphere_7tree, R0=10, R1=1000, compactify_inner_shell).
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from disco4est_tpu.geometry.cubed_sphere import CubedSphereGeometry
from disco4est_tpu.mesh.tree import Forest
from disco4est_tpu.mesh.builder import build_mesh
from disco4est_tpu.problems.two_punctures import (
    TwoPuncturesParams,
    residual,
    jacobian_apply,
)
from disco4est_tpu.solvers.cg import cg_solve
from disco4est_tpu.solvers.newton import NewtonParams, newton_solve

PARAMS = TwoPuncturesParams()


@jax.jit
def _res(mesh, u, rc):
    return residual(mesh, u, PARAMS, rc)


@jax.jit
def _jac_solve(mesh, u0, rhs, rc, rtol):
    return cg_solve(
        lambda v: jacobian_apply(mesh, u0, v, PARAMS, rc),
        rhs,
        atol=1e-12,
        rtol=rtol,
        max_iter=20000,
    ).x


def test_two_punctures_newton():
    geom = CubedSphereGeometry(
        "7tree", R0=10.0, R1=1000.0, compactify_inner_shell=True
    )
    forest = Forest.uniform(geom.conn, 1)  # 56 elements
    mesh = build_mesh(geom, forest, deg=2, deg_quad=3)
    assert mesh.n_elements == 56

    rc = mesh.boundary_values_quad(PARAMS.robin_coeff)
    u0 = mesh.init_field(PARAMS.initial_guess)
    result = newton_solve(
        residual=lambda u: _res(mesh, u, rc),
        jacobian_solve=lambda u, rhs, rtol: _jac_solve(mesh, u, rhs, rc, rtol),
        u0=u0,
        params=NewtonParams(atol=1e-10, max_iter=20, inner_rtol=1e-8),
    )
    assert result.residual_norm < 1e-9, result.history
    assert result.iterations <= 12, result.history

    u = np.asarray(result.u)
    # u must be positive (strengthens psi) and decay outward:
    assert u.max() > 0
    # interior (core tree) values exceed far-field values
    core = mesh.forest.tree == 6
    assert np.abs(u[core]).max() > np.abs(u[~core]).min()
    # u at the outer boundary ~ ADM-like 1/r falloff: small at r=1000
    r = np.linalg.norm(np.asarray(mesh.xyz_lobatto), axis=1)
    far = r > 500.0
    if far.any():
        assert np.abs(u[far]).max() < 5e-3

    print("TwoPunctures newton history:", result.history)
    print("u max:", u.max(), "u min:", u.min())
