"""Config-driven driver tests: the reference's options vocabulary +
regression-style AMR trajectories.
"""

import numpy as np
import pytest

from disco4est_tpu.driver import run_poisson
from disco4est_tpu.problems.poisson import SinxProblem, LorentzianProblem
from disco4est_tpu.util.config import Options

SINX_OPTIONS = """
[initial_mesh]
min_level = 2
region0_deg = 1
region0_deg_quad_inc = 0

[mesh_parameters]
face_h_type = FACE_H_EQ_VOLUME_DIV_AREA
volume_h_type = VOL_H_EQ_CUBE_APPROX
max_degree = 7

[flux]
name = sipg
sipg_penalty_prefactor = 2.0
sipg_flux_h = H_EQ_VOLUME_DIV_AREA
sipg_penalty_fcn = maxp_sqr_over_minh

[amr]
scheme = uniform_p
num_of_amr_steps = 0

[geometry]
name = brick
X0 = 0.0
X1 = 1.0
Y0 = 0.0
Y1 = 1.0
Z0 = 0.0
Z1 = 1.0

[d4est_solver_krylov_petsc]
ksp_type = fcg
ksp_atol = 5e-15

[quadrature]
name = legendre
"""


def test_sinx_driver_reference_options():
    """Run the reference's actual Poisson options file vocabulary end to
    end; pin our verified value (see test_laplacian for the digit note)."""
    opts = Options.load(SINX_OPTIONS)
    result = run_poisson(opts, SinxProblem)
    line = result.norms.lines("L_2")[0]
    assert line.startswith("64 512 512 "), line
    err = result.norms.rows[0]["L_2"]
    assert abs(err - 0.024413557923538) < 1e-12, err


SMOOTH_PRED_OPTIONS = """
[initial_mesh]
min_level = 1
region0_deg = 2

[flux]
sipg_penalty_prefactor = 2.0
sipg_penalty_fcn = maxp_sqr_over_minh

[amr]
scheme = smooth_pred
num_of_amr_steps = 2
gamma_h = 10.0
gamma_p = 0.1
gamma_n = 1.
percentile = 25

[geometry]
name = brick

[quadrature]
name = legendre
"""


def test_smooth_pred_amr_driver():
    opts = Options.load(SMOOTH_PRED_OPTIONS)
    result = run_poisson(opts, SinxProblem)
    errs = [r["L_2"] for r in result.norms.rows]
    assert len(errs) == 3
    # error decreases through AMR
    assert errs[-1] < errs[0]
    # estimator history recorded
    assert len(result.eta2_history) == 2
    fit = result.norms.convergence_fit("L_2")
    assert fit["slope"] < 0


OKENDON_OPTIONS = """
[initial_mesh]
min_level = 1
region0_deg = 2

[flux]
sipg_penalty_prefactor = 2.0

[amr]
scheme = uniform_h
num_of_amr_steps = 1

[geometry]
name = brick
x0 = 0.2
y0 = 0.2
z0 = 0.2

[problem]
name = okendon
p = 0.5

[d4est_solver_krylov_petsc]
ksp_type = fcg
pc_type = multigrid

[d4est_solver_newton]
snes_atol = 1e-11
"""


def test_nonlinear_driver_okendon_mg(tmp_path):
    """Nonlinear (Newton) driver end-to-end with MG-preconditioned inner
    Krylov + frozen-u0 matrix operator, per-level VTK and checkpoints."""
    from disco4est_tpu.driver import run_nonlinear, OkendonProblem

    opts = Options.load(
        OKENDON_OPTIONS
        + f"\n[d4est_vtk]\nfilename = {tmp_path}/ok\n"
        + f"[checkpoint]\nprefix = {tmp_path}/ok_ckpt\n"
    )
    problem = OkendonProblem(opts)
    result = run_nonlinear(opts, problem)
    errs = [r["L_2"] for r in result.norms.rows]
    assert len(errs) == 2
    assert errs[1] < errs[0], errs  # uniform h-refinement improves error
    assert all(r["F_norm"] < 1e-10 for r in result.norms.rows)
    import os

    assert os.path.exists(tmp_path / "ok_0.vtu")
    assert os.path.exists(tmp_path / "ok_ckpt_level0.npz")
    assert os.path.exists(tmp_path / "ok_ckpt_level1.npz")
    # checkpoint restores to a valid forest
    from disco4est_tpu.io import checkpoint as ckpt
    from disco4est_tpu.geometry.brick import BrickGeometry

    geom = BrickGeometry(x0=(0.2, 0.2, 0.2), dim=3)
    forest, fields, deg, hist, extra = ckpt.load(
        str(tmp_path / "ok_ckpt_level1"), geom.conn
    )
    assert fields["u"].shape[0] == forest.n_elements


def test_linear_driver_pc_multigrid_and_cheby():
    """pc_type = multigrid | cheby on the linear path."""
    base = SINX_OPTIONS.replace("num_of_amr_steps = 0",
                                "num_of_amr_steps = 0")
    for pc in ("multigrid", "cheby"):
        opts = Options.load(
            base.replace("ksp_atol = 5e-15",
                         f"ksp_atol = 5e-15\npc_type = {pc}")
        )
        result = run_poisson(opts, SinxProblem)
        err = result.norms.rows[0]["L_2"]
        assert abs(err - 0.024413557923538) < 1e-11, (pc, err)


def test_midsolve_checkpoint_exact_resume(tmp_path):
    """Chunked Krylov with state resume equals a single uninterrupted
    solve bitwise (no restart penalty)."""
    import jax.numpy as jnp
    from disco4est_tpu.solvers.cg import cg_solve
    from disco4est_tpu.geometry.brick import BrickGeometry
    from disco4est_tpu.mesh.tree import Forest
    from disco4est_tpu.mesh.builder import build_mesh
    from disco4est_tpu.laplacian.sipg import (
        apply_sipg,
        build_rhs_with_strong_bc,
    )

    geom = BrickGeometry(dim=3)
    mesh = build_mesh(geom, Forest.uniform(geom.conn, 1), deg=2)
    g = mesh.boundary_values(lambda *c: c[0] * c[1])
    f = mesh.init_field(lambda *c: 0.0 * c[0])
    rhs = build_rhs_with_strong_bc(mesh, f, g)
    A = lambda v: apply_sipg(mesh, v)

    ref = cg_solve(A, rhs, atol=1e-13, rtol=0.0, max_iter=64)
    state = None
    for cap in (16, 32, 48, 64):
        res, state = cg_solve(
            A, rhs, atol=1e-13, rtol=0.0, max_iter=cap,
            resume_state=state, return_state=True,
        )
    assert int(res.iterations) == int(ref.iterations)
    assert float(jnp.max(jnp.abs(res.x - ref.x))) == 0.0
