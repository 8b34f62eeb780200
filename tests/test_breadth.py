"""Breadth problems: BoyenYorkModel + multi-puncture + holed sphere
(VERDICT r3 #9)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from disco4est_tpu.geometry.cubed_sphere import CubedSphereGeometry
from disco4est_tpu.mesh.tree import Forest
from disco4est_tpu.mesh.builder import build_mesh
from disco4est_tpu.solvers.cg import cg_solve
from disco4est_tpu.solvers.newton import NewtonParams, newton_solve


def test_sphere_hole_geometry():
    """12-tree holed sphere: spherical excision surface at r=R0, outer
    boundary at r=R2, no core tree."""
    geom = CubedSphereGeometry("12tree_hole", R0=1.5, R1=2.0, R2=4.0)
    forest = Forest.uniform(geom.conn, 0)
    mesh = build_mesh(geom, forest, deg=3, face_h_type="j_div_sj_quad")
    assert mesh.n_elements == 12
    # each tree has exactly one boundary face (hole or outer sphere)
    assert int(np.asarray(mesh.bnd_mask).sum()) == 12
    # boundary nodes sit on r = R0 or r = R2
    fx = np.asarray(mesh.face_xyz_lobatto)  # [E, 2d, 3, nfl...]
    bnd = np.asarray(mesh.bnd_mask)
    r = np.sqrt((fx**2).sum(axis=2))
    for e in range(12):
        for f in range(6):
            if bnd[e, f]:
                rr = r[e, f]
                tgt = 4.0 if e < 6 else 1.5
                assert np.max(np.abs(rr - tgt)) < 1e-10, (e, f, rr)


def _solve_by(deg):
    from disco4est_tpu.problems.boyen_york import (
        BoyenYorkParams,
        jacobian_apply,
        residual,
    )

    params = BoyenYorkParams(a=1.0, P=1.0)
    geom = CubedSphereGeometry("12tree_hole", R0=1.5, R1=2.0, R2=4.0)
    forest = Forest.uniform(geom.conn, 0)
    mesh = build_mesh(
        geom, forest, deg=deg, face_h_type="j_div_sj_quad",
        penalty_fcn="meanp_sqr_over_meanh", penalty_prefactor=2.0,
    )
    g = mesh.boundary_values(params.boundary)
    u0 = mesh.init_field(params.initial_guess)

    res = newton_solve(
        residual=lambda u: residual(mesh, u, g, params),
        jacobian_solve=lambda u, rhs, rtol: cg_solve(
            lambda v: jacobian_apply(mesh, u, v, params), rhs,
            atol=1e-14, rtol=rtol, max_iter=20000,
        ).x,
        u0=u0,
        params=NewtonParams(atol=1e-11, max_iter=20, inner_rtol=1e-10),
    )
    ua = mesh.init_field(params.analytic)
    err = float(jnp.sqrt(jnp.sum(mesh.l2_norm_sqr(res.u - ua))))
    return res, err


def test_boyen_york_newton():
    """BoyenYorkModel (`Problems/BoyenYorkModel/`): the exact Bowen-York
    conformal factor solves −∇²ψ + hψ⁻⁷ = 0 on the excised sphere; Newton
    converges and the p-refined error drops by orders of magnitude."""
    res2, err2 = _solve_by(2)
    assert res2.residual_norm < 1e-10
    res3, err3 = _solve_by(3)
    assert err3 < 0.2 * err2, (err2, err3)
    assert err2 < 0.2  # absolute sanity at deg 2, level 0


def test_multi_puncture_reduces_to_two_punctures():
    """N=2 spinless punctures at (±b,0,0) must reproduce the flagship
    TwoPunctures residual/Jacobian exactly."""
    from disco4est_tpu.problems import multi_puncture as mp
    from disco4est_tpu.problems import two_punctures as tp

    geom = CubedSphereGeometry("7tree", R0=1.0, R1=4.0, R2=6.0)
    forest = Forest.uniform(geom.conn, 0)
    mesh = build_mesh(geom, forest, deg=2, face_h_type="j_div_sj_quad")

    tp_params = tp.TwoPuncturesParams(
        par_b=3.0, m_plus=0.5, m_minus=0.5,
        P_plus=(0.0, 0.2, 0.0), P_minus=(0.0, -0.2, 0.0),
    )
    mp_params = mp.MultiPunctureParams(
        punctures=(
            mp.Puncture(xyz=(3.0, 0.0, 0.0), M=0.5, P=(0.0, 0.2, 0.0)),
            mp.Puncture(xyz=(-3.0, 0.0, 0.0), M=0.5, P=(0.0, -0.2, 0.0)),
        )
    )
    bc = mesh.boundary_values_quad(tp_params.robin_coeff)
    rng = np.random.default_rng(0)
    u = jnp.asarray(rng.standard_normal((mesh.n_elements,) + (mesh.nl,) * 3))
    v = jnp.asarray(rng.standard_normal(u.shape)) * 0.1

    F_tp = tp.residual(mesh, u * 0.01, tp_params, bc)
    F_mp = mp.residual(mesh, u * 0.01, mp_params, bc)
    assert float(jnp.max(jnp.abs(F_tp - F_mp))) < 1e-12

    J_tp = tp.jacobian_apply(mesh, u * 0.01, v, tp_params, bc)
    J_mp = mp.jacobian_apply(mesh, u * 0.01, v, mp_params, bc)
    assert float(jnp.max(jnp.abs(J_tp - J_mp))) < 1e-12


def test_multi_puncture_three_spinning():
    """Three punctures with spins: Newton-Krylov converges on the
    7-tree sphere with Robin outer boundary (`multi_puncture.c` role)."""
    from disco4est_tpu.problems import multi_puncture as mp

    params = mp.MultiPunctureParams(
        punctures=(
            mp.Puncture(xyz=(2.0, 0.0, 0.0), M=0.4, P=(0.0, 0.1, 0.0),
                        S=(0.0, 0.0, 0.1)),
            mp.Puncture(xyz=(-1.0, 1.7, 0.0), M=0.3,
                        P=(-0.08, -0.05, 0.0), S=(0.0, 0.05, 0.0)),
            mp.Puncture(xyz=(-1.0, -1.7, 0.0), M=0.3,
                        P=(0.08, -0.05, 0.0), S=(0.05, 0.0, 0.0)),
        )
    )
    geom = CubedSphereGeometry("7tree", R0=1.0, R1=4.0, R2=8.0)
    forest = Forest.uniform(geom.conn, 0)
    mesh = build_mesh(geom, forest, deg=3, face_h_type="j_div_sj_quad")
    bc = mesh.boundary_values_quad(params.robin_coeff)
    u0 = mesh.init_field(params.initial_guess)

    res = newton_solve(
        residual=lambda u: mp.residual(mesh, u, params, bc),
        jacobian_solve=lambda u, rhs, rtol: cg_solve(
            lambda v: mp.jacobian_apply(mesh, u, v, params, bc), rhs,
            atol=1e-14, rtol=rtol, max_iter=20000,
        ).x,
        u0=u0,
        params=NewtonParams(atol=1e-10, max_iter=25, inner_rtol=1e-9),
    )
    assert float(res.residual_norm) < 1e-9
    # u decays like 1/r: nontrivial and positive-ish correction
    assert float(jnp.max(jnp.abs(res.u))) > 1e-3
