"""Standalone diagnostics + IP energy norm (VERDICT r3 rows 44/49)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from disco4est_tpu.geometry.brick import BrickGeometry
from disco4est_tpu.mesh.tree import Forest
from disco4est_tpu.mesh.builder import build_mesh
from disco4est_tpu.laplacian.sipg import apply_sipg
from disco4est_tpu.solvers.diagnostics import (
    full_matrix,
    jacobian_test,
    matrix_symmetry,
)
from disco4est_tpu.io.ip_energy_norm import ip_energy_norm_sqr


def _hanging_mesh(deg=2):
    geom = BrickGeometry(dim=3)
    forest = Forest.uniform(geom.conn, 1)
    flags = np.zeros(8, bool)
    flags[0] = True
    forest = forest.refine(flags).balance()
    return build_mesh(geom, forest, deg=deg)


def test_matrix_symmetry_tool():
    mesh = _hanging_mesh()
    ok, max_asym, _ = matrix_symmetry(
        lambda v: apply_sipg(mesh, v), (mesh.n_elements, 3, 3, 3)
    )
    assert ok, max_asym


def test_full_matrix_matches_apply():
    mesh = _hanging_mesh()
    M = full_matrix(
        lambda v: apply_sipg(mesh, v), (mesh.n_elements, 3, 3, 3)
    )
    rng = np.random.default_rng(0)
    v = rng.standard_normal(M.shape[1])
    direct = np.asarray(
        apply_sipg(mesh, jnp.asarray(v.reshape(mesh.n_elements, 3, 3, 3)))
    ).reshape(-1)
    assert np.max(np.abs(M @ v - direct)) < 1e-11


def test_jacobian_tester():
    from disco4est_tpu.problems.constant_density_star import (
        CDSParams,
        jacobian_apply,
        residual,
    )

    params = CDSParams.create()
    geom = BrickGeometry(dim=3)
    forest = Forest.uniform(geom.conn, 1)
    mesh = build_mesh(geom, forest, deg=2)
    g = mesh.boundary_values(params.psi)
    u0 = mesh.init_field(params.initial_guess)
    err = jacobian_test(
        lambda u: residual(mesh, u, g, params),
        lambda u, v: jacobian_apply(mesh, u, v, params),
        u0,
    )
    assert err < 1e-7, err


def test_ip_energy_norm():
    """The face-sweep IP norm: volume term equals ∫|∇u|² for a smooth
    continuous field (jumps vanish to interpolation error), all terms
    positive, hanging mortar jumps included."""
    mesh = _hanging_mesh(deg=3)
    pi = np.pi
    u = mesh.init_field(
        lambda x, y, z: jnp.sin(pi * x) * jnp.sin(pi * y) * jnp.sin(pi * z)
    )
    r = ip_energy_norm_sqr(mesh, u)
    # ∫|∇u|² over [0,1]³ of sin³ product = 3π²/8
    exact = 3 * pi**2 / 8
    assert abs(float(r["volume"]) - exact) < 2e-3 * exact
    # continuous field: jump terms at interpolation-error level
    assert float(r["interface"]) < 1e-3 * float(r["volume"])
    assert float(r["total"]) >= float(r["volume"])

    # a DISCONTINUOUS field must produce a nonzero hanging-mortar
    # contribution
    rng = np.random.default_rng(1)
    w = jnp.asarray(rng.standard_normal(u.shape))
    r2 = ip_energy_norm_sqr(mesh, w)
    assert float(r2["interface"]) > 1e-2
    assert float(r2["boundary"]) > 1e-2


def test_okendon_jacobian_near_zero():
    """The Okendon Jacobian's u0**2 + 1e-300 regularization near u -> 0
    (VERDICT r2/r3 weak: untested).  With p = 0.5 the Jacobian term
    p·(u0²)^{(p-1)/2} ~ |u0|^{-1/2} blows up as u0 -> 0; the
    regularization must keep J finite and consistent with the FD
    derivative of F wherever u0 is not essentially zero, and produce
    finite (huge but not NaN/inf) values at u0 = 0 exactly."""
    import jax.numpy as jnp
    from disco4est_tpu.problems.okendon import (
        OkendonParams,
        jacobian_apply,
        residual,
    )

    params = OkendonParams(p=0.5)
    geom = BrickGeometry(dim=3)
    forest = Forest.uniform(geom.conn, 1)
    mesh = build_mesh(geom, forest, deg=2)
    g = mesh.boundary_values(params.boundary)

    # small-but-nonzero solution region: FD consistency must hold
    u0 = mesh.init_field(lambda x, y, z: 1e-6 * (1.0 + x + y + z))
    err = jacobian_test(
        lambda u: residual(mesh, u, g, params),
        lambda u, v: jacobian_apply(mesh, u, v, params),
        u0,
        eps=1e-9,
    )
    assert err < 1e-4, err

    # exactly-zero region: regularized Jacobian must be finite
    u0z = jnp.zeros_like(u0)
    v = jnp.ones_like(u0)
    Jv = jacobian_apply(mesh, u0z, v, params)
    assert bool(jnp.all(jnp.isfinite(Jv)))
    Fz = residual(mesh, u0z, g, params)
    assert bool(jnp.all(jnp.isfinite(Fz)))
