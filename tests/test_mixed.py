"""Mixed-precision iterative refinement reaches the f64 digit contract.

Defends bench.py's dtype contract: the f32 SIPG apply is the inner kernel
of the production solver; the user-facing result matches pure f64.
Reference contract: all regression digits are C doubles
(`Tests/Regression/d4est_test_mpi.sh:5-10` CDS digit 9.6078e-6).
"""

import jax
import jax.numpy as jnp
import numpy as np

from disco4est_tpu.geometry.brick import BrickGeometry
from disco4est_tpu.mesh.tree import Forest
from disco4est_tpu.mesh.builder import build_mesh
from disco4est_tpu.laplacian.sipg import apply_sipg, build_rhs_with_strong_bc
from disco4est_tpu.solvers.cg import cg_solve
from disco4est_tpu.solvers.mixed import mixed_refine_solve, mesh_astype
from disco4est_tpu.solvers.newton import NewtonParams, newton_solve
from disco4est_tpu.problems.constant_density_star import (
    CDSParams,
    residual,
    jacobian_apply,
)


def _sinx_problem(level=1, deg=3):
    geom = BrickGeometry(dim=3)
    forest = Forest.uniform(geom.conn, level)
    mesh = build_mesh(geom, forest, deg=deg)

    def u_exact(x, y, z):
        return jnp.sin(jnp.pi * x) * jnp.sin(jnp.pi * y) * jnp.sin(jnp.pi * z)

    def f(x, y, z):
        return 3 * jnp.pi**2 * u_exact(x, y, z)

    f_arr = mesh.init_field(f)
    g_arr = mesh.boundary_values(u_exact)
    rhs = build_rhs_with_strong_bc(mesh, f_arr, g_arr)
    return mesh, rhs


def test_mixed_matches_f64_poisson():
    mesh, rhs = _sinx_problem()
    mesh32 = mesh_astype(mesh, jnp.float32)

    x64 = cg_solve(
        lambda v: apply_sipg(mesh, v), rhs, atol=5e-15, rtol=1e-14,
        max_iter=20000,
    ).x

    res = mixed_refine_solve(
        lambda v: apply_sipg(mesh, v),
        rhs,
        A32=lambda v: apply_sipg(mesh32, v),
        inner_rtol=1e-5,
        atol=5e-15,
        rtol=1e-13,
    )
    assert float(res.residual_norm) < 1e-12
    # same solution to f64 solver tolerance
    rel = float(
        jnp.linalg.norm((res.x - x64).ravel()) / jnp.linalg.norm(x64.ravel())
    )
    assert rel < 1e-11, rel
    # and the work was genuinely mixed: few outer f64 steps, inner f32 CG
    assert int(res.outer_iterations) <= 10
    assert int(res.inner_iterations) > int(res.outer_iterations)


def test_mixed_cds_digit():
    """The CDS L2-error digit (9.6078e-6, d4est_test_mpi.sh) survives when
    every Newton inner solve runs through mixed f32/f64 refinement."""
    params = CDSParams.create()
    geom = BrickGeometry(dim=3)
    forest = Forest.uniform(geom.conn, 2)
    mesh = build_mesh(geom, forest, deg=2)
    mesh32 = mesh_astype(mesh, jnp.float32)
    g = mesh.boundary_values(params.psi)

    @jax.jit
    def _res(u):
        return residual(mesh, u, g, params)

    @jax.jit
    def _jac_solve(u0, rhs, rtol):
        u0_32 = u0.astype(jnp.float32)
        return mixed_refine_solve(
            lambda v: jacobian_apply(mesh, u0, v, params),
            rhs,
            A32=lambda v: jacobian_apply(mesh32, u0_32, v, params),
            inner_rtol=1e-5,
            atol=1e-14,
            rtol=rtol,
        ).x

    u0 = mesh.init_field(params.initial_guess)
    result = newton_solve(
        residual=_res,
        jacobian_solve=lambda u, rhs, rtol: _jac_solve(u, rhs, rtol),
        u0=u0,
        params=NewtonParams(atol=1e-11, max_iter=20, inner_rtol=1e-10),
    )
    assert result.residual_norm < 1e-10, result.history

    psi_a = mesh.init_field(params.psi)
    err = float(jnp.sqrt(jnp.sum(mesh.l2_norm_sqr(result.u - psi_a))))
    # the reference's grep digits — identical to the pure-f64 path
    assert 9.6078e-6 <= err < 9.6079e-6, err
    # pinned full-precision value from test_cds.py (pure f64): agree to
    # the discretization-error scale
    assert abs(err - 9.607862111733e-06) < 1e-14, err
