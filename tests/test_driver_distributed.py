"""The distributed PRODUCTION driver ([parallelism] section).

The reference's driver IS the MPI program (`driver.c:13-313`): every
problem runs under `mpirun -np N` and `d4est_test_mpi.sh:4-10` requires
np=1 and np=8 to grep the SAME norm.  Contract here: `run_poisson` /
`run_nonlinear` with `[parallelism] n_devices = 8` reproduce the
single-device digit runs, with every Krylov apply going through the
shard_map halo program (node-weighted SFC layout + one all_to_all per
apply + psum dots).
"""

import numpy as np
import pytest

from disco4est_tpu.driver import run_poisson, run_nonlinear, CDSProblem
from disco4est_tpu.problems.poisson import SinxProblem
from disco4est_tpu.util.config import Options

_COMMON = """
[initial_mesh]
min_level = 1
region0_deg = 2

[mesh_parameters]
max_degree = {maxdeg}

[flux]
sipg_penalty_prefactor = 2.0

[amr]
scheme = {scheme}
num_of_amr_steps = {steps}
percentile = 25.0

[geometry]
name = brick

[d4est_solver_krylov_petsc]
ksp_type = cg
use_mixed_precision = {mixed}

[parallelism]
enable = {par}
n_devices = 8
"""


def _run_sinx(par, scheme="smooth_pred", steps=2, mixed=0, maxdeg=4):
    opts = Options.load(
        _COMMON.format(
            par=par, scheme=scheme, steps=steps, mixed=mixed, maxdeg=maxdeg
        )
    )
    res = run_poisson(opts, SinxProblem)
    return [row["L_2"] for row in res.norms.rows]


def test_distributed_sinx_matches_single_device():
    """hp smooth_pred sinx trajectory: 8-device halo solve ==
    single-device digits (the d4est_test_mpi.sh contract)."""
    ref = _run_sinx(par=0)
    par = _run_sinx(par="auto")
    assert len(ref) == len(par) == 3
    for a, b in zip(ref, par):
        assert abs(a - b) <= 1e-11 * max(1.0, abs(a)), (a, b)


def test_distributed_sinx_mixed_precision():
    """Distributed mixed-precision refinement (f32 inner halo CG, f64
    outer halo correction) reproduces the f64 digits."""
    ref = _run_sinx(par=0, scheme="uniform_h", steps=1, mixed=0, maxdeg=2)
    par = _run_sinx(par=1, scheme="uniform_h", steps=1, mixed=1, maxdeg=2)
    for a, b in zip(ref, par):
        assert abs(a - b) <= 1e-10 * max(1.0, abs(a)), (a, b)


CDS_OPTIONS = """
[initial_mesh]
min_level = 1
region0_deg = 2

[mesh_parameters]
max_degree = 2

[flux]
sipg_penalty_prefactor = 2.0

[problem]
R = 0.0625
cx = 0.5
cy = 0.5
cz = 0.5
rho0_div_rhoc = 0.001

[amr]
scheme = uniform_h
num_of_amr_steps = 0

[geometry]
name = brick

[d4est_solver_newton]
snes_atol = 1e-12
snes_max_it = 20

[d4est_solver_krylov_petsc]
ksp_type = cg

[parallelism]
enable = {par}
n_devices = 8
"""


def test_distributed_cds_matches_single_device():
    """Nonlinear Newton-Krylov (ConstantDensityStar) distributed: the
    Jacobian solves ride the halo program + local frozen-u0 mass term;
    digits match the single-device run."""
    ref = run_nonlinear(
        Options.load(CDS_OPTIONS.format(par=0)),
        CDSProblem(Options.load(CDS_OPTIONS.format(par=0))),
    )
    par = run_nonlinear(
        Options.load(CDS_OPTIONS.format(par="auto")),
        CDSProblem(Options.load(CDS_OPTIONS.format(par="auto"))),
    )
    a = ref.norms.rows[-1]["L_2"]
    b = par.norms.rows[-1]["L_2"]
    assert abs(a - b) <= 1e-11 * max(1.0, abs(a)), (a, b)
    assert abs(ref.norms.rows[-1]["F_norm"] - par.norms.rows[-1]["F_norm"]) < 1e-10


def test_driver_mixed_structured_path():
    """The production mixed-precision solve dispatches to the structured
    Pallas kernel on uniform bricks (use_structured=1 forces it on CPU
    via the interpreter) and reproduces the f64 digits (VERDICT r4 #6:
    the fast kernels must be what the CLI executes)."""
    from disco4est_tpu.laplacian import structured

    base = _COMMON.format(
        par=0, scheme="uniform_h", steps=0, mixed=0, maxdeg=2
    )
    ref = run_poisson(Options.load(base), SinxProblem)

    forced = base.replace(
        "use_mixed_precision = 0",
        "use_mixed_precision = 1\nuse_structured = 1",
    )
    before = structured.TRACE_COUNT
    got = run_poisson(Options.load(forced), SinxProblem)
    assert structured.TRACE_COUNT > before, "structured path not traced"
    a = ref.norms.rows[-1]["L_2"]
    b = got.norms.rows[-1]["L_2"]
    assert abs(a - b) <= 1e-10 * max(1.0, abs(a)), (a, b)


def test_distributed_mg_pc_matches_single_device():
    """pc_type=multigrid under [parallelism]: the shard-resident V-cycle
    PC (per-level halos, all_to_all transfers) reproduces the
    single-device MG-FCG digits."""
    base = _COMMON.format(
        par=0, scheme="uniform_h", steps=1, mixed=0, maxdeg=2
    ).replace("ksp_type = cg", "ksp_type = fcg\npc_type = multigrid")
    ref = run_poisson(Options.load(base), SinxProblem)
    par = run_poisson(
        Options.load(base.replace("enable = 0", "enable = auto")),
        SinxProblem,
    )
    for a, b in zip(
        [r["L_2"] for r in ref.norms.rows],
        [r["L_2"] for r in par.norms.rows],
    ):
        assert abs(a - b) <= 1e-10 * max(1.0, abs(a)), (a, b)
