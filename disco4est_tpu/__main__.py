"""CLI: `python -m disco4est_tpu options.input [--problem=sinx]`.

Role of the reference's per-problem executables
(`add_d4est_problem_2d/3d` in CMakeLists + `driver.c` main): one entry
point, problem selected by flag or `[problem] name` in the options file.
Linear problems run the AMR-Krylov loop; nonlinear problems
(constant_density_star, two_punctures, okendon) run the Newton-Krylov
loop, both with configurable preconditioning
(`[d4est_solver_krylov_petsc] pc_type = none|schwarz|multigrid|cheby`),
optional per-level VTK (`[d4est_vtk] filename`) and checkpointing
(`[checkpoint] prefix`, `checkpoint_every_n_krylov_its`).
"""

import sys

from disco4est_tpu.driver import (
    run_poisson,
    run_nonlinear,
    CDSProblem,
    OkendonProblem,
    TwoPuncturesProblem,
)
from disco4est_tpu.problems.poisson import SinxProblem, LorentzianProblem
from disco4est_tpu.util.config import Options

LINEAR_PROBLEMS = {
    "sinx": lambda opts: SinxProblem,
    "lorentzian": lambda opts: LorentzianProblem,
    "stamm": None,  # resolved lazily below (heavier import)
}

NONLINEAR_PROBLEMS = {
    "constant_density_star": CDSProblem,
    "cds": CDSProblem,
    "okendon": OkendonProblem,
    "two_punctures": TwoPuncturesProblem,
}


def _stamm(opts):
    from disco4est_tpu.problems.stamm import StammProblem

    return StammProblem(
        c=(
            opts.get_float("problem", "c2x", 0.5),
            opts.get_float("problem", "c2y", 0.5),
            opts.get_float("problem", "c2z", 0.5),
        ),
        dim=3,
    )


LINEAR_PROBLEMS["stamm"] = _stamm


def main(argv):
    if not argv:
        print("usage: python -m disco4est_tpu options.input [--problem=sinx]")
        return 1
    opts = Options.load(argv[0])
    name = opts.get("problem", "name", "sinx")
    for a in argv[1:]:
        if a.startswith("--problem="):
            name = a.split("=", 1)[1]

    if name in NONLINEAR_PROBLEMS:
        problem = NONLINEAR_PROBLEMS[name](opts)
        result = run_nonlinear(opts, problem)
        key = "L_2" if "L_2" in result.norms.rows[-1] else "F_norm"
    elif name in LINEAR_PROBLEMS:
        problem = LINEAR_PROBLEMS[name](opts)
        result = run_poisson(opts, problem)
        key = "L_2"
    else:
        known = sorted(set(LINEAR_PROBLEMS) | set(NONLINEAR_PROBLEMS))
        print(f"unknown problem {name!r}; known: {known}")
        return 1

    for line in result.norms.lines(key):
        print(line)
    fit = result.norms.convergence_fit(key)
    if fit:
        print(f"C1 = {fit['intercept']:.6f}, C2 = {fit['slope']:.15f}")
    return 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1:]))
