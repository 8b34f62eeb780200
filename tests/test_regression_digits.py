"""Reference regression-digit parity (ground truth via refcheck/).

Each value below was reproduced from the reference C code compiled on
this machine (refcheck/ harnesses against the vendored p4est/libsc, in-
house CG at atol 1e-15 — solver-independent digits).  Sources:

- Lorentzian `104 832 832 2706.02899845`:
  `Tests/Regression/d4est_test_poisson_lorentzian.sh:6`; full-precision
  harness value 2706.0289984500154787 (refcheck/poisson_lorentzian_cg.c).
  Config: 13-tree cubed sphere R0=10 R1=20 R2=1000 compactified outer,
  deg 1, legendre quadrature, FACE_H_EQ_J_DIV_SJ_QUAD pointwise penalty,
  maxp_sqr_over_minh prefactor 2, Dirichlet BC on Lobatto.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from disco4est_tpu.geometry.cubed_sphere import CubedSphereGeometry
from disco4est_tpu.mesh.tree import Forest
from disco4est_tpu.mesh.builder import build_mesh
from disco4est_tpu.laplacian.sipg import apply_sipg, build_rhs_with_strong_bc
from disco4est_tpu.solvers.cg import cg_solve
from disco4est_tpu.problems.poisson import LorentzianProblem


def test_lorentzian_level0_digit():
    """`104 832 832 2706.02899845` (d4est_test_poisson_lorentzian.sh:6)."""
    geom = CubedSphereGeometry(
        "13tree", R0=10.0, R1=20.0, R2=1000.0,
        compactify_outer_shell=True,
    )
    forest = Forest.uniform(geom.conn, 1)
    deg = 1
    mesh = build_mesh(
        geom, forest, deg=deg, face_h_type="j_div_sj_quad",
        penalty_prefactor=2.0, penalty_fcn="maxp_sqr_over_minh",
    )
    assert mesh.n_elements == 104
    assert mesh.n_elements * (deg + 1) ** 3 == 832

    f = mesh.init_field(LorentzianProblem.rhs)
    g = mesh.boundary_values(LorentzianProblem.boundary)
    rhs = build_rhs_with_strong_bc(mesh, f, g)
    res = cg_solve(
        lambda v: apply_sipg(mesh, v), rhs, atol=1e-15, rtol=0.0,
        max_iter=5000,
    )
    u = res.x
    ua = mesh.init_field(LorentzianProblem.analytic)
    # NB the reference takes the NODAL ABSOLUTE error first
    # (`d4est_linalg_vec_fabsdiff`) and then L2-interpolates |e| to the
    # quadrature points — for sign-changing DG errors that differs from
    # ||e||_L2 (here by 1.7e-4 relative).  Verified root cause: with the
    # element-matched reference solution, A·u_ref = b to 2e-12 in OUR
    # operator (discretizations identical) and our L2(|e|) reproduces the
    # reference digits to 14 digits.
    L2 = float(jnp.sqrt(jnp.sum(mesh.l2_norm_sqr(jnp.abs(u - ua)))))
    # reference harness full-precision value (refcheck, CG to stagnation):
    # 2706.0289984500159334857016802
    assert abs(L2 - 2706.02899845001593) / 2706.0 < 1e-12, L2


def test_two_punctures_7tree_digit():
    """`56.0000000000000000 0.00042501315` (d4est_test_twopunctures.sh:5).

    The grep digits are [global_nodes, u(10,0,0)] from the regression
    driver's point monitor (two_punctures_cactus_diff_geom_estimator_
    global.c:845, DEBUG_PRINT_4ARR_DBL row for "point10").  Ground truth
    regenerated with refcheck/two_punctures_probe.c (the ACTUAL problem
    driver compiled against the PETSc-free core, dense-direct damped
    Newton to residual 3e-16): u(10,0,0) = 0.0004250131568938.

    Config (options_test.input): 7-tree cubed sphere R0=10 R1=1000
    compactified inner shell, deg 1 (56 nodes), legendre quadrature,
    FACE_H_EQ_J_DIV_SJ_MIN_LOBATTO penalty h, Robin BC coeff 1/r.
    """
    import numpy as np
    from disco4est_tpu.geometry.cubed_sphere import CubedSphereGeometry
    from disco4est_tpu.mesh.probe import interpolate_at_point
    from disco4est_tpu.problems.two_punctures import (
        TwoPuncturesParams,
        residual,
        jacobian_apply,
    )
    from disco4est_tpu.solvers.newton import NewtonParams, newton_solve

    geom = CubedSphereGeometry(
        "7tree", R0=10.0, R1=1000.0, compactify_inner_shell=True
    )
    forest = Forest.uniform(geom.conn, 0)
    mesh = build_mesh(
        geom, forest, deg=1, face_h_type="j_div_sj_min_lobatto",
        penalty_prefactor=2.0, penalty_fcn="maxp_sqr_over_minh",
    )
    assert mesh.n_elements == 7
    assert mesh.local_nodes == 56
    params = TwoPuncturesParams()
    rc = mesh.boundary_values_quad(params.robin_coeff)

    n = mesh.local_nodes
    shape = (mesh.n_elements,) + (2,) * 3

    def jac_solve(u0, rhs, rtol):
        # 56-dof system: dense direct solve (the early Jacobian is
        # indefinite — unpreconditioned CG diverges, as it does for the
        # reference's own in-house FCG on this config)
        I = jnp.eye(n).reshape((n,) + shape)
        cols = [
            jacobian_apply(mesh, u0, I[i], params, rc).reshape(-1)
            for i in range(n)
        ]
        A = jnp.stack(cols, axis=1)
        return jnp.linalg.solve(A, rhs.reshape(-1)).reshape(shape)

    u0 = mesh.init_field(params.initial_guess)
    result = newton_solve(
        residual=lambda u: residual(mesh, u, params, rc),
        jacobian_solve=jac_solve,
        u0=u0,
        params=NewtonParams(atol=1e-14, max_iter=50, inner_rtol=1e-12),
    )
    assert result.residual_norm < 1e-13, result.history

    val, elem = interpolate_at_point(mesh, result.u, (10.0, 0.0, 0.0))
    # reference ground truth (refcheck): 0.0004250131568938
    assert abs(val - 0.0004250131568938) < 1e-12, val


def test_two_punctures_13tree_digit():
    """`832.0000000000000000 0.000169047` (d4est_test_twopunctures_2.sh:5).

    [global_nodes, u(100,0,0)] from the 13-tree regression driver's point
    monitor.  Ground truth (refcheck/two_punctures_probe_13tree.c, dense
    Newton to 1.3e-16): u(100,0,0) = 0.0001690472493169.

    Config (options_13tree.input): 13-tree cubed sphere R0=10 R1=20
    R2=1000 compactified OUTER shell, level 1 deg 1 (104 elems, 832
    nodes), legendre quadrature, FACE_H_EQ_J_DIV_SJ_QUAD pointwise
    penalty, Robin BC coeff 1/r.
    """
    from disco4est_tpu.geometry.cubed_sphere import CubedSphereGeometry
    from disco4est_tpu.mesh.probe import interpolate_at_point
    from disco4est_tpu.problems.two_punctures import (
        TwoPuncturesParams,
        residual,
        jacobian_apply,
    )
    from disco4est_tpu.solvers.newton import NewtonParams, newton_solve

    geom = CubedSphereGeometry(
        "13tree", R0=10.0, R1=20.0, R2=1000.0,
        compactify_outer_shell=True,
    )
    forest = Forest.uniform(geom.conn, 1)
    mesh = build_mesh(
        geom, forest, deg=1, face_h_type="j_div_sj_quad",
        penalty_prefactor=2.0, penalty_fcn="maxp_sqr_over_minh",
    )
    assert mesh.n_elements == 104
    assert mesh.local_nodes == 832
    params = TwoPuncturesParams()
    rc = mesh.boundary_values_quad(params.robin_coeff)

    n = mesh.local_nodes
    shape = (mesh.n_elements,) + (2,) * 3
    I = jnp.eye(n).reshape((n,) + shape)
    jac_cols = jax.jit(
        jax.vmap(
            lambda u0, v: jacobian_apply(mesh, u0, v, params, rc).reshape(-1),
            in_axes=(None, 0),
        )
    )

    def jac_solve(u0, rhs, rtol):
        A = jac_cols(u0, I).T
        return jnp.linalg.solve(A, rhs.reshape(-1)).reshape(shape)

    u0 = mesh.init_field(params.initial_guess)
    result = newton_solve(
        residual=lambda u: residual(mesh, u, params, rc),
        jacobian_solve=jac_solve,
        u0=u0,
        params=NewtonParams(atol=1e-14, max_iter=50, inner_rtol=1e-12),
    )
    assert result.residual_norm < 1e-13, result.history

    val, elem = interpolate_at_point(mesh, result.u, (100.0, 0.0, 0.0))
    assert abs(val - 0.0001690472493169) < 1e-12, val


def test_schwarz_cubed_sphere_trajectory():
    """Schwarz regression digit `0.15228638`
    (`Tests/Regression/d4est_test_schwarz.sh:5`) and the full 10-iterate
    trajectory of the reference's own unit test
    (`Tests/Unit/d4est_test_schwarz_cubed_sphere_new.c`, rerun at full
    precision via refcheck/schwarz_sphere_test.c →
    refbuild/harness/run/schwarz.out).

    Config: 13-tree cubed sphere R0=1/3 R1=2/3 R2=1 (no compactify),
    level 0 (13 elements), deg 4, legendre, FACE_H_EQ_J_DIV_SJ_QUAD,
    maxp_sqr_over_minh prefactor 2; Schwarz num_nodes_overlap=4 with
    converged subdomain CG; u₀=0; error norm = ∫(interp|e|)²J (the
    reference's nodal-absolute quirk, `d4est_util_compute_error_array`).

    One matching trajectory certifies the whole Schwarz subsystem —
    membership, per-axis restriction, quintic-hat weights
    (`_schwarz_operators.c:7-39`), restricted SIPG subdomain operator,
    weighted correction — against the reference's 5.5 kLoC.
    """
    from disco4est_tpu.solvers.schwarz_overlap import (
        build_overlapping_schwarz,
    )

    geom = CubedSphereGeometry(
        "13tree", R0=1.0 / 3.0, R1=2.0 / 3.0, R2=1.0,
        compactify_outer_shell=False, compactify_inner_shell=False,
    )
    forest = Forest.uniform(geom.conn, 0)
    mesh = build_mesh(
        geom, forest, deg=4, deg_quad=4, penalty_prefactor=2.0,
        penalty_fcn="maxp_sqr_over_minh", face_h_type="j_div_sj_quad",
    )
    assert mesh.n_elements == 13

    poly = lambda x, y, z: jnp.exp(x + y + z) * (x * x + y * y + z * z - 1.0)
    neglap = lambda x, y, z: -jnp.exp(x + y + z) * (
        3.0 + x * (4.0 + 3.0 * x) + y * (4.0 + 3.0 * y) + z * (4.0 + 3.0 * z)
    )
    g = mesh.boundary_values(poly)
    f = mesh.init_field(neglap)
    rhs = build_rhs_with_strong_bc(mesh, f, g)
    sol = mesh.init_field(poly)

    M = build_overlapping_schwarz(mesh, num_nodes_overlap=4, iterations=400)
    apply = jax.jit(lambda m, v: apply_sipg(m, v))

    # reference full-precision trajectory (refbuild/harness/run/schwarz.out)
    ref = [
        (11.029811440762897, 0.152286388792538),
        (8.478311301990601, 0.030824293450190),
        (2.004390543675700, 0.006973281993397),
        (0.389316550646736, 0.001661047758643),
        (0.076353915252118, 0.000406316495572),
        (0.015850377445150, 0.000101033279923),
        (0.003495337566975, 0.000025513862237),
        (0.000810831051224, 0.000006726003428),
        (0.000195525821702, 0.000002099298702),
        (0.000048528414143, 0.000000952418865),
    ]

    u = jnp.zeros_like(rhs)
    for i, (r2_ref, l2_ref) in enumerate(ref):
        r = rhs - apply(mesh, u)
        r2 = float(jnp.vdot(r.reshape(-1), r.reshape(-1)))
        u = u + M(r)
        l2 = float(jnp.sum(mesh.l2_norm_sqr(jnp.abs(sol - u))))
        # reference values are %.15f prints: 1e-15 ABSOLUTE truncation
        assert abs(r2 - r2_ref) < max(1e-11 * r2_ref, 2e-15), (i, r2, r2_ref)
        assert abs(l2 - l2_ref) < max(1e-9 * l2_ref, 2e-15), (i, l2, l2_ref)
    # the published grep digit: d4est_test_schwarz.sh greps the %.15f
    # print for the substring "0.15228638"
    first_l2 = ref[0][1]
    assert "0.15228638" in f"{first_l2:.15f}"


def test_stamm_hp_amr_trajectory():
    """Stamm hp-AMR trajectory vs the compiled-reference oracle
    (refcheck/stamm_probe.c = the reference's own stamm_multigrid_pc.c
    driver, solved to 1e-15; `Tests/Regression/d4est_test_stamm.sh`).

    Loop structure mirrors the reference driver exactly
    (`stamm_multigrid_pc.c:237-560`): per level, norms + estimator of
    the CURRENT solution are recorded BEFORE the AMR step; levels 0-1
    refine uniformly, level >= 2 uses smooth_pred with Stamm's
    mean-marker (eta2 >= 0.25*mean) and gamma = (10, 0.1, 1).

    Oracle rows (d4est_region_all_norms_u.log, levels 0-3):
        1    27    L2 = 0.4999999999999999   est = 8.411163231756122
        8    216   L2 = 1.0275938426558613e-4  est = 3.4281941578298671e-3
        64   1728  L2 = 8.0763868619692208e-6  est = 8.7418772785858201e-4
        456  12312 L2 = 3.8789115402296782e-6  est = 2.8744364809238571e-4
    We reproduce every row to >= 10 digits and the MARKING exactly
    (456 elements after the first smooth_pred step).  The published
    4-digit greps of d4est_test_stamm.sh do not appear in the converged
    trajectory — like CDS-AMR they encode the recording run's solver
    state; the converged values above are the discretization's.
    """
    from disco4est_tpu.geometry.brick import BrickGeometry
    from disco4est_tpu.laplacian.sipg import (
        apply_sipg as _apply,
        build_rhs_with_strong_bc as _rhs,
    )
    from disco4est_tpu.estimators.bi import estimate_bi
    from disco4est_tpu.amr.amr import amr_step_hp
    from disco4est_tpu.amr.smooth_pred import (
        SmoothPredParams,
        SmoothPredState,
        smooth_pred_mark,
        transfer_predictor,
    )
    from disco4est_tpu.problems.stamm import StammProblem

    prob = StammProblem(c=(0.5, 0.5, 0.5), dim=3)
    geom = BrickGeometry(dim=3)
    sp = SmoothPredParams(
        gamma_h=10.0, gamma_p=0.1, gamma_n=1.0, marker="mean",
        sigma=0.25, max_degree=7, initial_pred=0.0,
    )
    # (E, true_nodes, L2_ref, est_ref, l2_tol, est_tol).  Mixed-degree
    # levels use the reference's OWN-degree conventions (laplacian/hp.py:
    # f sampled at per-element Lobatto nodes = INIT_FIELD_ON_LOBATTO, L2
    # of interp|e| at own degree, estimator residual in the own basis) —
    # with them EVERY recorded oracle row reproduces to >= 10 digits
    # through level 5 and the smooth_pred marking matches element-exactly
    # through level 7 (1520 elements at level 6, where the old
    # storage-degree convention diverged to 1688; see
    # test_stamm_deep_trajectory for levels 6-7).
    oracle = [
        (1, 27, 4.999999999999999e-01, 8.411163231756122e00, 1e-10, 1e-10),
        (8, 216, 1.0275938426558613e-04, 3.4281941578298671e-03, 1e-10, 1e-10),
        (64, 1728, 8.0763868619692208e-06, 8.7418772785858201e-04, 1e-10, 1e-10),
        (456, 12312, 3.8789115402296782e-06, 2.8744364809238571e-04, 1e-10, 1e-10),
        (512, 27440, 6.042615297480418e-07, 8.516776762948383e-05, 1e-10, 1e-10),
        (1352, 95504, 9.43171338940422e-08, 1.773498989361e-05, 5e-10, 5e-10),
    ]
    # Levels 6-7 (the deepest recorded oracle rows) add ~20 min of plain
    # CG solving; enable with DISCO4EST_DEEP_TESTS=1.  Verified in round
    # 5: marking element-exact (1520 elems both levels), est to 9-12
    # digits, L2 to 8-9 digits — the L2 values are ~1e-9 where both
    # sides' 1e-15 solver floors already contribute at that scale.
    import os

    if os.environ.get("DISCO4EST_DEEP_TESTS"):
        oracle += [
            (1520, 141872, 2.9678033363170958e-09,
             2.1615679616413724e-06, 5e-9, 1e-10),
            (1520, 224864, 5.9433721417322740e-10,
             2.6015502608406779e-07, 5e-8, 1e-9),
        ]

    forest = Forest.uniform(geom.conn, 0)
    deg_e = np.full(1, 2, np.int32)
    storage = 2
    u = None
    sp_state = None
    for level, (E_ref, nodes_ref, l2_ref, est_ref, l2_tol, est_tol) in (
        enumerate(oracle)
    ):
        mesh = build_mesh(
            geom, forest, deg=storage, deg_quad=storage,
            penalty_prefactor=10.0, penalty_fcn="maxp_sqr_over_minh",
            face_h_type="tree_h", deg_e=deg_e,
        )
        g = mesh.boundary_values(prob.boundary)
        if u is None:
            u = mesh.init_field(lambda x, y, z: 0.5 * jnp.ones_like(x))
        from disco4est_tpu.laplacian.hp import (
            adjoint_to_own,
            apply_mass_hp,
            init_field_own,
            norm_L2_interp_abs_own,
            to_max,
        )

        # reference conventions on hp meshes: f sampled at OWN Lobatto
        # nodes (INIT_FIELD_ON_LOBATTO), norms/estimator residual in the
        # own basis (g = 0 for Stamm, so rhs = M_own f_own exactly)
        f_own = init_field_own(mesh, prob.rhs)
        rhs_own = apply_mass_hp(mesh, f_own)
        l2 = float(norm_L2_interp_abs_own(mesh, u, prob.analytic))
        R_own = adjoint_to_own(mesh, _apply(mesh, u)) - rhs_own
        F = to_max(mesh, R_own)
        eta2 = np.asarray(
            estimate_bi(mesh, u, F, g=g, penalty_prefactor=10.0)
        )
        est = float(np.sqrt(eta2.sum()))
        assert mesh.n_elements == E_ref
        assert int(((deg_e + 1) ** 3).sum()) == nodes_ref
        assert abs(l2 - l2_ref) < l2_tol * l2_ref, (level, l2, l2_ref)
        assert abs(est - est_ref) < est_tol * est_ref, (level, est, est_ref)
        if level == len(oracle) - 1:
            break
        if level < 2:
            log = -deg_e.astype(np.int64)
            pred = None
        else:
            if sp_state is None:
                sp_state = SmoothPredState.fresh(mesh.n_elements, sp)
            log, pred = smooth_pred_mark(eta2, deg_e, sp_state, sp, dim=3)
            sp_state = SmoothPredState(pred)
        new_forest, new_deg_e, fields, new_storage = amr_step_hp(
            forest, deg_e, log, {"u": u}, storage, 7
        )
        if sp_state is not None and pred is not None:
            sp_state = SmoothPredState(
                transfer_predictor(forest, new_forest, pred, deg_e, sp, log)
            )
        forest, deg_e, storage = new_forest, new_deg_e, new_storage
        mesh2 = build_mesh(
            geom, forest, deg=storage, deg_quad=storage,
            penalty_prefactor=10.0, penalty_fcn="maxp_sqr_over_minh",
            face_h_type="tree_h", deg_e=deg_e,
        )
        mixed2 = bool((deg_e != storage).any())
        from disco4est_tpu.laplacian.hp import apply_sipg_hp

        f2_own = init_field_own(mesh2, prob.rhs)
        rhs2 = apply_mass_hp(mesh2, f2_own)  # g = 0
        if mixed2:
            res = cg_solve(
                lambda v: apply_sipg_hp(mesh2, v), rhs2, atol=1e-15,
                rtol=0.0, max_iter=200000,
            )
            u = to_max(mesh2, res.x)
        else:
            res = cg_solve(
                lambda v: apply_sipg(mesh2, v), rhs2, atol=1e-15, rtol=0.0,
                max_iter=200000,
            )
            u = res.x
