"""ConstantDensityStar end-to-end: Newton–Krylov + smooth_pred hp-AMR.

Mirrors the reference's regression `d4est_test_cds.sh` (1 AMR step,
unpreconditioned CG inner solves, L2 error ~3.18e-5 at deg 2 / level 2 on
the reference's discretization) and the README quickstart.  We assert the
full nonlinear pipeline: Newton converges quadratically-ish, the AMR step
refines near the star surface, and the error decreases.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from disco4est_tpu.geometry.brick import BrickGeometry
from disco4est_tpu.mesh.tree import Forest
from disco4est_tpu.mesh.builder import build_mesh
from disco4est_tpu.problems.constant_density_star import (
    CDSParams,
    residual,
    jacobian_apply,
)
from disco4est_tpu.solvers.cg import cg_solve
from disco4est_tpu.solvers.newton import NewtonParams, newton_solve
from disco4est_tpu.estimators.bi import estimate_bi
from disco4est_tpu.amr.amr import refine_and_balance, transfer_field
from disco4est_tpu.amr.smooth_pred import (
    SmoothPredParams,
    SmoothPredState,
    smooth_pred_mark,
)

PARAMS = CDSParams.create()


@jax.jit
def _res(mesh, u, g):
    return residual(mesh, u, g, PARAMS)


@jax.jit
def _jac_solve(mesh, u0, rhs, rtol):
    return cg_solve(
        lambda v: jacobian_apply(mesh, u0, v, PARAMS),
        rhs,
        atol=1e-15,
        rtol=rtol,
        max_iter=20000,
    ).x


def _solve_on(mesh):
    g = mesh.boundary_values(PARAMS.psi)
    u0 = mesh.init_field(PARAMS.initial_guess)
    result = newton_solve(
        residual=lambda u: _res(mesh, u, g),
        jacobian_solve=lambda u, rhs, rtol: _jac_solve(mesh, u, rhs, rtol),
        u0=u0,
        params=NewtonParams(atol=1e-13, max_iter=30, inner_rtol=1e-12),
    )
    return result, g


def test_cds_newton_and_amr():
    geom = BrickGeometry(dim=3)
    forest = Forest.uniform(geom.conn, 2)
    deg = 2
    mesh = build_mesh(geom, forest, deg=deg, face_h_type="tree_h")

    result, g = _solve_on(mesh)
    assert result.residual_norm < 1e-12, result.history
    assert result.iterations <= 10

    u = result.u
    psi_a = mesh.init_field(PARAMS.psi)
    err0 = float(jnp.sqrt(jnp.sum(mesh.l2_norm_sqr(u - psi_a))))

    # REFERENCE PARITY: the reference's MPI-invariance regression
    # (`Tests/Regression/d4est_test_mpi.sh:5-10`) runs exactly this
    # configuration (CDS, brick level 2, deg 2) and greps the L2 error
    # digits "0.0000096078" at np=1 and np=8.  Our value matches the
    # reference digits exactly — validating the full discretization chain
    # (SIPG + penalty + Gauss quadrature + Newton + nonlinear mass terms).
    assert 9.6078e-6 <= err0 < 9.6079e-6, err0
    # pin our full-precision value against drift
    assert abs(err0 - 9.607862111733e-06) < 1e-15, err0

    # ---- one smooth_pred AMR step (the reference CDS regression config:
    # [amr] percentile=10 but 64 elems < inflation_size=128 so the marker
    # uses percentile 25, gamma_h=.25, FACE_H_EQ_TREE_H) -----------------
    F = _res(mesh, u, g)
    eta2 = np.asarray(estimate_bi(mesh, u, F, g=g, penalty_prefactor=2.0))
    sp_params = SmoothPredParams(
        gamma_h=0.25, gamma_p=0.1, gamma_n=1.0, percentile=25.0,
        max_degree=deg,  # uniform-degree round: force h-refinement
    )
    state = SmoothPredState.fresh(mesh.n_elements, sp_params)
    log, pred = smooth_pred_mark(eta2, deg, state, sp_params, dim=3)
    assert (log < 0).sum() == 32  # top-25% marking incl. the tie rule

    new_forest = refine_and_balance(mesh.forest, log < 0)
    u_new = transfer_field(mesh.forest, new_forest, u, deg)
    mesh2 = build_mesh(geom, new_forest, deg=deg, face_h_type="tree_h")

    result2, g2 = _solve_on(mesh2)
    psi_a2 = mesh2.init_field(PARAMS.psi)
    err1 = float(jnp.sqrt(jnp.sum(mesh2.l2_norm_sqr(result2.u - psi_a2))))

    # CONVERGED CDS-AMR GROUND TRUTH (refcheck/GROUND_TRUTH.md): the
    # reference's own driver, solved to machine precision, gives
    #   288 7776 7776  L2 = 3.7944365819784e-6
    #   energy_estimator = sqrt(total eta2) = 3.18356715487649e-5
    # (the published regression digit 3.183566511e-5 deviates by 2e-6 rel
    # because it encodes the recording run's PETSc stopping state).  Our
    # smooth_pred marks the SAME elements (288 after 2:1 balance) and the
    # estimator matches to ~9 digits.
    assert mesh2.n_elements == 288, mesh2.n_elements
    assert mesh2.local_nodes == 7776
    assert abs(err1 - 3.7944365819784e-6) < 2e-15, err1

    F2 = _res(mesh2, result2.u, g2)
    eta2_2 = np.asarray(
        estimate_bi(mesh2, result2.u, F2, g=g2, penalty_prefactor=2.0)
    )
    est = float(np.sqrt(eta2_2.sum()))
    assert abs(est - 3.18356715487649e-5) < 1e-12, est
    print(f"CDS L2 errors: uniform={err0:.12e} after-amr={err1:.12e} "
          f"energy_est={est:.12e}")
