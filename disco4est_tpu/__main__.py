"""CLI: `python -m disco4est_tpu options.input [--problem=sinx]`.

Role of the reference's per-problem executables
(`add_d4est_problem_2d/3d` in CMakeLists + `driver.c` main): one entry
point, problem selected by flag or `[problem] name` in the options file.
"""

import sys

from disco4est_tpu.driver import run_poisson
from disco4est_tpu.problems.poisson import SinxProblem, LorentzianProblem
from disco4est_tpu.util.config import Options

PROBLEMS = {
    "sinx": SinxProblem,
    "lorentzian": LorentzianProblem,
}


def main(argv):
    if not argv:
        print("usage: python -m disco4est_tpu options.input [--problem=sinx]")
        return 1
    opts = Options.load(argv[0])
    name = opts.get("problem", "name", "sinx")
    for a in argv[1:]:
        if a.startswith("--problem="):
            name = a.split("=", 1)[1]
    problem = PROBLEMS[name]
    result = run_poisson(opts, problem)
    for line in result.norms.lines("L_2"):
        print(line)
    fit = result.norms.convergence_fit("L_2")
    if fit:
        print(f"C1 = {fit['intercept']:.6f}, C2 = {fit['slope']:.15f}")
    return 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1:]))
