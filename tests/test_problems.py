"""Stamm & Okendon problem tests.

Mirrors the reference's Stamm regression (4 AMR-trajectory norms,
`d4est_test_stamm.sh`) in behavior: smooth_pred AMR refines at the
singularity and the error decreases; and Okendon's Newton convergence.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from disco4est_tpu.driver import run_poisson
from disco4est_tpu.problems.stamm import StammProblem, neg_laplacian
from disco4est_tpu.problems.okendon import (
    OkendonParams,
    residual,
    jacobian_apply,
)
from disco4est_tpu.util.config import Options
from disco4est_tpu.geometry.brick import BrickGeometry
from disco4est_tpu.mesh.tree import Forest
from disco4est_tpu.mesh.builder import build_mesh
from disco4est_tpu.solvers.cg import cg_solve
from disco4est_tpu.solvers.newton import NewtonParams, newton_solve


def test_autodiff_laplacian():
    f = neg_laplacian(lambda x, y, z: x**3 * y + z * z, 3)
    x = jnp.asarray([0.3])
    y = jnp.asarray([0.7])
    z = jnp.asarray([0.1])
    # -Δ(x³y + z²) = -(6xy + 2)
    assert np.allclose(np.asarray(f(x, y, z)), -(6 * 0.3 * 0.7 + 2.0))


STAMM_OPTIONS = """
[initial_mesh]
min_level = 1
region0_deg = 2

[flux]
sipg_penalty_prefactor = 2.0
sipg_penalty_fcn = maxp_sqr_over_minh

[amr]
scheme = smooth_pred
num_of_amr_steps = 3
gamma_h = 10.0
gamma_p = 0.1
gamma_n = 1.
percentile = 25

[geometry]
name = brick

[quadrature]
name = legendre
"""


def test_stamm_amr_trajectory():
    opts = Options.load(STAMM_OPTIONS)
    problem = StammProblem(dim=3)
    result = run_poisson(opts, problem)
    errs = [r["L_2"] for r in result.norms.rows]
    assert len(errs) == 4
    assert errs[-1] < errs[0] * 0.5, errs
    # smooth_pred must actually ADAPT (non-uniform refinement), and every
    # AMR step must improve the error.  (NOTE: u = poly·|x−c|³ has bounded
    # third derivatives, so at deg 2 the interpolation error does NOT
    # concentrate at c — concentration only emerges for p ≥ 3.  The
    # round-1 "estimator concentrates at the singularity" assertion was
    # both vacuous as written and wrong for this config.)
    forest = result.mesh.forest
    lv = forest.level
    assert lv.max() > lv.min(), "smooth_pred produced uniform refinement"
    assert all(e2 < e1 for e1, e2 in zip(errs, errs[1:])), errs
    print("Stamm L2 trajectory:", errs)


def test_okendon_newton():
    params = OkendonParams(p=0.5)
    geom = BrickGeometry(x0=(0.2, 0.2, 0.2), x1=(1.0, 1.0, 1.0), dim=3)
    forest = Forest.uniform(geom.conn, 1)
    mesh = build_mesh(geom, forest, deg=2)
    g = mesh.boundary_values(params.boundary)

    @jax.jit
    def res(mesh, u, g):
        return residual(mesh, u, g, params)

    @jax.jit
    def jac_solve(mesh, u0, rhs, rtol):
        return cg_solve(
            lambda v: jacobian_apply(mesh, u0, v, params), rhs,
            atol=1e-13, rtol=rtol, max_iter=5000,
        ).x

    u0 = mesh.init_field(params.analytic)  # start near the solution
    result = newton_solve(
        residual=lambda u: res(mesh, u, g),
        jacobian_solve=lambda u, rhs, rtol: jac_solve(mesh, u, rhs, rtol),
        u0=u0,
        params=NewtonParams(atol=1e-10, max_iter=20, inner_rtol=1e-8),
    )
    assert result.residual_norm < 1e-9, result.history
    u_a = mesh.init_field(params.analytic)
    err = float(jnp.sqrt(jnp.sum(mesh.l2_norm_sqr(result.u - u_a))))
    assert err < 0.05, err
