"""Full-depth TwoPunctures smooth_pred trajectory vs the compiled
reference (VERDICT r4 #9: 'one full-depth flagship trajectory').

Oracle: refcheck/tp_puncture_traj_probe.c = the reference's own flagship
driver (`two_punctures_cactus_diff_geom_estimator_global.c`) run with
`num_of_amr_steps = 4` and the estimator on the physical grid
(refbuild/harness/run/tp_traj_phys.input; per-element η² dumped as
REFETA2 rows).  Config: 7-tree cubed sphere R0=10 R1=1000 compactified
inner shell, deg 1, J_DIV_SJ_MIN_LOBATTO h, Robin BC, smooth_pred with
percentile=5, γ=(1, 0.1, 1), initial_pred=1e4, VOL_H_EQ_DIAM.

Contract proven here:
- the per-element estimator matches the reference to ~10 digits on the
  uniform level (Ση² = 4.340079487232e-5, every printed digit);
- the smooth_pred MARKING matches element-exactly through all four
  levels: 56 → 75 → 113 → 302 nodes (7 → 7 → 7 → 14 elements),
  including the level-3 h-refinement;
- on MIXED-degree levels Ση² agrees to 5%/0.5%/0.2% (levels 1/2/3): the
  residual deviation is the storage-degree quadrature vs the reference's
  per-element/mortar-degree quadrature on CURVED elements (non-polynomial
  J·∂r/∂x integrands — exact on affine meshes, where the Stamm
  trajectory pins to 10+ digits; closing it needs the degree-bucketed
  apply, the known round-6 item).
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from disco4est_tpu.mesh.tree import Forest
from disco4est_tpu.mesh.builder import build_mesh
from disco4est_tpu.geometry.cubed_sphere import CubedSphereGeometry
from disco4est_tpu.problems.two_punctures import (
    TwoPuncturesParams,
    residual as tp_residual,
    jacobian_apply as tp_jac,
)
from disco4est_tpu.solvers.newton import NewtonParams, newton_solve
from disco4est_tpu.estimators.bi import estimate_bi
from disco4est_tpu.amr.amr import amr_step_hp
from disco4est_tpu.amr.smooth_pred import (
    SmoothPredParams,
    SmoothPredState,
    smooth_pred_mark,
    transfer_predictor,
)
from disco4est_tpu.laplacian.hp import (
    adjoint_to_own,
    own_mask,
    restrict_to_own,
    to_max,
)

# (E, true_nodes, sum_eta2_ref, rel_tol) per level, post-solve
ORACLE = [
    (7, 56, 4.340079487232e-05, 1e-9),
    (7, 75, 5.828146748239e-04, 6e-2),
    (7, 113, 3.926499117213e-04, 1e-2),
    (14, 302, 4.765855e-03, 5e-3),
]


def test_two_punctures_trajectory():
    geom = CubedSphereGeometry(
        "7tree", R0=10.0, R1=1000.0, compactify_inner_shell=True
    )
    forest = Forest.uniform(geom.conn, 0)
    params = TwoPuncturesParams()
    sp = SmoothPredParams(
        gamma_h=1.0, gamma_p=0.1, gamma_n=1.0, percentile=5.0,
        max_degree=7, initial_pred=10000.0,
    )
    deg_e = np.full(7, 1, np.int32)
    storage = 1
    u_own = None
    sp_state = None

    for level, (E_ref, nodes_ref, sum_ref, tol) in enumerate(ORACLE):
        mesh = build_mesh(
            geom, forest, deg=storage,
            face_h_type="j_div_sj_min_lobatto",
            penalty_prefactor=2.0, penalty_fcn="maxp_sqr_over_minh",
            deg_e=deg_e,
        )
        rc = mesh.boundary_values_quad(params.robin_coeff)
        E = mesh.n_elements
        nl = storage + 1
        shape = (E,) + (nl,) * 3
        mask = np.asarray(own_mask(mesh, jnp.float64)) > 0.5
        idx = np.where(mask.reshape(-1))[0]
        nt = len(idx)

        def res_hp(uo, _m=mesh, _rc=rc):
            return adjoint_to_own(
                _m, tp_residual(_m, to_max(_m, uo), params, _rc)
            )

        jac_cols = jax.jit(
            jax.vmap(
                lambda u0o, v, _m=mesh, _rc=rc: adjoint_to_own(
                    _m, tp_jac(_m, to_max(_m, u0o), to_max(_m, v),
                               params, _rc)
                ).reshape(-1),
                in_axes=(None, 0),
            )
        )
        I = jnp.eye(int(np.prod(shape)))[jnp.asarray(idx)].reshape(
            (nt,) + shape
        )

        def jac_solve(u0o, rhs, rtol, _I=I, _idx=idx, _shape=shape):
            A = jac_cols(u0o, _I)[:, _idx].T  # [nt, nt]
            d = jnp.linalg.solve(A, rhs.reshape(-1)[_idx])
            out = jnp.zeros(int(np.prod(_shape)))
            out = out.at[jnp.asarray(_idx)].set(d)
            return out.reshape(_shape)

        if u_own is None:
            u_own = restrict_to_own(
                mesh, mesh.init_field(params.initial_guess)
            )
        res = newton_solve(
            res_hp, jac_solve, u_own,
            NewtonParams(atol=1e-13, max_iter=50, inner_rtol=1e-12),
        )
        assert res.residual_norm < 1e-12, res.history
        u_own = res.u
        u_max = to_max(mesh, u_own)
        F = to_max(mesh, res_hp(u_own))
        eta2 = np.asarray(
            estimate_bi(mesh, u_max, F, g=None, penalty_prefactor=2.0,
                        vol_h="diam")
        )
        nodes = int(((deg_e + 1) ** 3).sum())
        assert E == E_ref, (level, E, E_ref)
        assert nodes == nodes_ref, (level, nodes, nodes_ref)
        s = float(eta2.sum())
        assert abs(s - sum_ref) <= tol * sum_ref, (level, s, sum_ref)

        if level == len(ORACLE) - 1:
            break
        if sp_state is None or len(sp_state.predictor) != E:
            sp_state = SmoothPredState.fresh(E, sp)
        log, pred = smooth_pred_mark(eta2, deg_e, sp_state, sp, dim=3)
        forest2, deg_e2, fields, storage2 = amr_step_hp(
            forest, deg_e, log, {"u": u_own}, storage, 7
        )
        sp_state = SmoothPredState(
            transfer_predictor(forest, forest2, pred, deg_e, sp, log)
        )
        forest, deg_e, storage = forest2, deg_e2, storage2
        u_own = fields["u"]
