"""Driver restart-from-checkpoint (`driver.c:156-227` role).

Kill-and-resume contract: a driver restarted from a per-level checkpoint
must finish with EXACTLY the state of the uninterrupted run — same
forest, same marks, same final iterate — through both restore formats
(structure-load and AMR-history replay), on a preconditioned nonlinear
solve (VERDICT r3 #7's done-criterion).
"""

import numpy as np
import jax.numpy as jnp
import pytest

from disco4est_tpu.driver import run_poisson, run_nonlinear, CDSProblem
from disco4est_tpu.problems.poisson import SinxProblem
from disco4est_tpu.util.config import Options


BASE_LINEAR = """
[initial_mesh]
min_level = 1
region0_deg = 2

[mesh_parameters]
max_degree = 3

[flux]
sipg_penalty_prefactor = 2.0

[amr]
scheme = smooth_pred
num_of_amr_steps = 2
percentile = 25.0

[geometry]
name = brick

[checkpoint]
prefix = {prefix}
"""

RESTART_EXTRA = """
[initial_mesh]
min_level = 1
region0_deg = 2
load_from_checkpoint = 1
checkpoint_prefix = {ck}
checkpoint_type = {ctype}

[mesh_parameters]
max_degree = 3

[flux]
sipg_penalty_prefactor = 2.0

[amr]
scheme = smooth_pred
num_of_amr_steps = 2
percentile = 25.0

[geometry]
name = brick
"""


@pytest.mark.parametrize("ctype", ["structure", "history"])
def test_linear_restart_bitwise(tmp_path, ctype):
    ck = str(tmp_path / "ck")
    full = run_poisson(
        Options.load(BASE_LINEAR.format(prefix=ck)), SinxProblem
    )

    opts2 = Options.load(
        RESTART_EXTRA.format(ck=f"{ck}_level1", ctype=ctype)
    )
    resumed = run_poisson(opts2, SinxProblem)

    assert resumed.mesh.n_elements == full.mesh.n_elements
    assert np.array_equal(
        np.asarray(resumed.mesh.forest.tree),
        np.asarray(full.mesh.forest.tree),
    )
    assert float(jnp.max(jnp.abs(resumed.u - full.u))) == 0.0
    # last-level norms identical
    assert resumed.norms.rows[-1]["L_2"] == full.norms.rows[-1]["L_2"]


BASE_NONLINEAR = """
[initial_mesh]
min_level = 1
region0_deg = 2

[flux]
sipg_penalty_prefactor = 2.0

[amr]
scheme = smooth_pred
num_of_amr_steps = 2
percentile = 25.0
gamma_h = 0.25

[geometry]
name = brick

[d4est_solver_newton]
snes_atol = 1e-12

[d4est_solver_krylov_petsc]
ksp_type = fcg
pc_type = cheby

[checkpoint]
prefix = {prefix}
"""

NONLINEAR_RESTART = """
[initial_mesh]
min_level = 1
region0_deg = 2
load_from_checkpoint = 1
checkpoint_prefix = {ck}
checkpoint_type = history

[flux]
sipg_penalty_prefactor = 2.0

[amr]
scheme = smooth_pred
num_of_amr_steps = 2
percentile = 25.0
gamma_h = 0.25

[geometry]
name = brick

[d4est_solver_newton]
snes_atol = 1e-12

[d4est_solver_krylov_petsc]
ksp_type = fcg
pc_type = cheby
"""


def test_nonlinear_preconditioned_restart_bitwise(tmp_path):
    """Kill-and-resume on a PRECONDITIONED Newton-Krylov CDS solve."""
    ck = str(tmp_path / "cds")
    opts = Options.load(BASE_NONLINEAR.format(prefix=ck))
    full = run_nonlinear(opts, CDSProblem(opts))

    opts2 = Options.load(NONLINEAR_RESTART.format(ck=f"{ck}_level1"))
    resumed = run_nonlinear(opts2, CDSProblem(opts2))

    assert resumed.mesh.n_elements == full.mesh.n_elements
    assert float(jnp.max(jnp.abs(resumed.u - full.u))) == 0.0
    assert (
        resumed.norms.rows[-1]["F_norm"] == full.norms.rows[-1]["F_norm"]
    )
