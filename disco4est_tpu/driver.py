"""Universal driver: config → geometry → mesh → AMR solve loop.

Role of the reference's `src/driver.c:13-313` (PETSc init → geometry →
initial-extents parse → p4est_new/checkpoint-load → operators →
quadrature → mesh_update → problem_init) plus the per-problem AMR loop
(`Problems/Poisson/poisson_sinx_uniform.c:142`):

    for level in 0..num_of_amr_steps:
        ghost/rhs build → solve → norms/vtk → estimate → mark →
        refine+balance → transfer fields → mesh rebuild

All option names follow the reference's `options.input` vocabulary
(`[initial_mesh] [mesh_parameters] [flux] [amr] [geometry] [quadrature]`).
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from disco4est_tpu.geometry.brick import BrickGeometry
from disco4est_tpu.geometry.cubed_sphere import CubedSphereGeometry
from disco4est_tpu.mesh.tree import Forest
from disco4est_tpu.mesh.builder import build_mesh, MeshData
from disco4est_tpu.laplacian.sipg import apply_sipg, build_rhs_with_strong_bc
from disco4est_tpu.laplacian.hp import (
    apply_sipg_hp,
    build_rhs_with_strong_bc_hp,
    restrict_to_own,
    to_max,
)
from disco4est_tpu.solvers.cg import cg_solve
from disco4est_tpu.solvers.fcg import fcg_solve
from disco4est_tpu.estimators.bi import estimate_bi
from disco4est_tpu.amr.amr import (
    amr_step_hp,
    refine_and_balance,
    transfer_field,
)
from disco4est_tpu.amr.smooth_pred import (
    SmoothPredParams,
    SmoothPredState,
    smooth_pred_mark,
    transfer_predictor,
)
from disco4est_tpu.io.norms import NormLog, norm_L2, norm_Linfty
from disco4est_tpu.util.config import Options


def geometry_from_options(opts: Options):
    """[geometry] section → Geometry (reference `d4est_geometry_new`,
    `Geometry/d4est_geometry.c:127`)."""
    name = opts.get("geometry", "name", required=True)
    if name == "brick":
        g = lambda k, d: opts.get_float("geometry", k, d)
        return BrickGeometry(
            x0=(g("x0", 0.0), g("y0", 0.0), g("z0", 0.0)),
            x1=(g("x1", 1.0), g("y1", 1.0), g("z1", 1.0)),
            dim=3,
        )
    if name in ("cubed_sphere", "cubed_sphere_7tree"):
        kind = "13tree" if name == "cubed_sphere" else "7tree"
        return CubedSphereGeometry(
            kind,
            R0=opts.get_float("geometry", "r0", 1.0),
            R1=opts.get_float("geometry", "r1", 2.0),
            R2=opts.get_float("geometry", "r2", 3.0),
            compactify_outer_shell=opts.get(
                "geometry", "compactify_outer_shell", False, cast=bool
            ),
            compactify_inner_shell=opts.get(
                "geometry", "compactify_inner_shell", False, cast=bool
            ),
        )
    raise ValueError(f"unknown geometry {name}")


@dataclasses.dataclass
class DriverResult:
    mesh: MeshData
    u: jnp.ndarray
    norms: NormLog
    eta2_history: list


@jax.jit
def _linear_solve_cg(mesh, rhs, x0):
    return cg_solve(
        lambda v: apply_sipg(mesh, v), rhs, x0=x0,
        atol=5e-15, rtol=1e-20, max_iter=100000,
    )


@jax.jit
def _linear_solve_fcg(mesh, rhs, x0):
    return fcg_solve(
        lambda v: apply_sipg(mesh, v), rhs, x0=x0,
        atol=5e-15, rtol=1e-20, max_iter=10000,
    )


@jax.jit
def _linear_solve_cg_hp(mesh, rhs, x0):
    return cg_solve(
        lambda v: apply_sipg_hp(mesh, v), rhs, x0=x0,
        atol=5e-15, rtol=1e-20, max_iter=100000,
    )


@jax.jit
def _linear_solve_fcg_schwarz(mesh, rhs, x0, M):
    return fcg_solve(
        lambda v: apply_sipg(mesh, v), rhs, x0=x0, M=M,
        atol=5e-15, rtol=1e-20, max_iter=10000,
    )


@jax.jit
def _linear_solve_fcg_schwarz_hp(mesh, rhs, x0, M):
    return fcg_solve(
        lambda v: apply_sipg_hp(mesh, v), rhs, x0=x0, M=M,
        atol=5e-15, rtol=1e-20, max_iter=10000,
    )


def run_poisson(opts: Options, problem) -> DriverResult:
    """Linear Poisson AMR-solve loop on the configured geometry."""
    from disco4est_tpu.quadrature.quadrature import Quadrature

    geom = geometry_from_options(opts)
    level = opts.get_int("initial_mesh", "min_level", required=True)
    deg = opts.get_int("initial_mesh", "region0_deg", 1)
    dq_inc = opts.get_int("initial_mesh", "region0_deg_quad_inc", 0)
    quad_name = opts.get("quadrature", "name", "legendre")
    quad = Quadrature("legendre" if quad_name == "legendre" else "lobatto")
    penalty_fcn = opts.get("flux", "sipg_penalty_fcn", "maxp_sqr_over_minh")
    prefactor = opts.get_float("flux", "sipg_penalty_prefactor", 2.0)
    scheme = opts.get("amr", "scheme", "uniform_p")
    n_amr = opts.get_int("amr", "num_of_amr_steps", 0)
    ksp = opts.get("d4est_solver_krylov_petsc", "ksp_type", "cg")
    pc_type = opts.get("d4est_solver_krylov_petsc", "pc_type", "none")
    schwarz_overlap_n = opts.get_int(
        "d4est_solver_schwarz", "num_nodes_overlap", 1
    )
    schwarz_iters = opts.get_int(
        "d4est_solver_schwarz", "subdomain_iter", 15
    )
    if scheme not in ("uniform_h", "uniform_p", "smooth_pred"):
        raise ValueError(f"unknown [amr] scheme: {scheme!r}")
    if pc_type not in ("none", "schwarz"):
        raise ValueError(f"unknown pc_type: {pc_type!r}")

    forest = Forest.uniform(geom.conn, level)
    norms = NormLog()
    eta2_hist = []
    u = None
    sp_state = None
    max_degree = opts.get_int("mesh_parameters", "max_degree", deg)
    sp_params = SmoothPredParams(
        gamma_h=opts.get_float("amr", "gamma_h", 10.0),
        gamma_p=opts.get_float("amr", "gamma_p", 0.1),
        gamma_n=opts.get_float("amr", "gamma_n", 1.0),
        percentile=opts.get_float("amr", "percentile", 25.0),
        max_degree=max_degree,
        initial_pred=opts.get_float("amr", "initial_pred", 0.0),
    )

    solve = _linear_solve_fcg if ksp == "fcg" else _linear_solve_cg

    # hp state: per-element degrees + storage degree (grows as smooth_pred
    # p-refines; uniform schemes keep deg_e ≡ deg and use the plain path).
    deg_e = np.full(forest.n_elements, deg, np.int32)
    storage = deg

    for it in range(n_amr + 1):
        mixed = bool((deg_e != storage).any())
        mesh = build_mesh(
            geom, forest, deg=storage, quad=quad, deg_quad=storage + dq_inc,
            penalty_prefactor=prefactor, penalty_fcn=penalty_fcn,
            deg_e=deg_e,
        )
        g = mesh.boundary_values(problem.boundary)
        f = mesh.init_field(problem.rhs)
        rhs_max = build_rhs_with_strong_bc(mesh, f, g)
        if mixed:
            rhs = build_rhs_with_strong_bc_hp(mesh, f, g)
        else:
            rhs = rhs_max
        x0 = (
            jnp.zeros_like(f)
            if u is None or u.shape != f.shape
            else u
        )
        if pc_type == "schwarz":
            from disco4est_tpu.solvers.schwarz_overlap import (
                build_overlapping_schwarz,
            )

            M = build_overlapping_schwarz(
                mesh,
                num_nodes_overlap=schwarz_overlap_n,
                iterations=schwarz_iters,
                hp=mixed,
            )
            res = (
                _linear_solve_fcg_schwarz_hp if mixed else _linear_solve_fcg_schwarz
            )(mesh, rhs, x0, M)
        else:
            res = (_linear_solve_cg_hp if mixed else solve)(mesh, rhs, x0)
        u = res.x
        u_max = to_max(mesh, u) if mixed else u

        u_a = mesh.init_field(problem.analytic)
        norms.add(
            mesh,
            L_2=norm_L2(mesh, u_max - u_a),
            L_infty=norm_Linfty(u_max - u_a),
        )

        if it == n_amr:
            break
        if scheme == "uniform_h":
            log = -deg_e.astype(np.int64)
            pred = None
        elif scheme == "uniform_p":
            # uniform p: raise every element's degree by one per step
            log = np.minimum(deg_e + 1, max_degree).astype(np.int64)
            pred = None
        elif scheme == "smooth_pred":
            F = apply_sipg(mesh, u_max, None) - rhs_max
            eta2 = np.asarray(estimate_bi(mesh, u_max, F, g=g,
                                          penalty_prefactor=prefactor))
            eta2_hist.append(eta2)
            if sp_state is None or len(sp_state.predictor) != mesh.n_elements:
                sp_state = SmoothPredState.fresh(mesh.n_elements, sp_params)
            log, pred = smooth_pred_mark(
                eta2, deg_e, sp_state, sp_params, dim=mesh.dim
            )
            sp_state = SmoothPredState(pred)
        new_forest, new_deg_e, fields, new_storage = amr_step_hp(
            forest, deg_e, log, {"u": u}, storage, max_degree
        )
        u = fields["u"]
        if sp_state is not None and pred is not None:
            sp_state = SmoothPredState(
                transfer_predictor(
                    forest, new_forest, pred, deg_e, sp_params, log
                )
            )
        forest, deg_e, storage = new_forest, new_deg_e, new_storage

    return DriverResult(mesh=mesh, u=u, norms=norms, eta2_history=eta2_hist)
