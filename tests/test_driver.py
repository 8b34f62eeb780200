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
