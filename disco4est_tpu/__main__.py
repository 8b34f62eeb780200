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

import os
import sys

# honor JAX_PLATFORMS strictly: some environments pre-register extra
# backends (e.g. the axon TPU tunnel) that would otherwise win over the
# env var; the config update is authoritative.
if os.environ.get("JAX_PLATFORMS"):
    import jax as _jax

    _jax.config.update(
        "jax_platforms", os.environ["JAX_PLATFORMS"].split(",")[0]
    )

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


def plot_checkpoint(opts: Options, ck_path: str, out_path: str) -> int:
    """Checkpoint-to-VTK plotter (the reference's CheckpointAMRPlotter
    problem family: rebuild the mesh from a checkpoint and write every
    stored nodal field to a .vtu, no solve)."""
    import numpy as np

    from disco4est_tpu.driver import geometry_from_options
    from disco4est_tpu.io import checkpoint as ckpt
    from disco4est_tpu.io.vtk import write_vtu
    from disco4est_tpu.mesh.builder import build_mesh

    geom = geometry_from_options(opts)
    forest, fields, deg, history, extra = ckpt.load(ck_path, geom.conn)
    mesh = build_mesh(geom, forest, deg=deg)
    cells = {"level": forest.level.astype(np.int32)}
    de = (extra or {}).get("deg_e")
    if de is not None:
        cells["deg"] = np.asarray(de, np.int32)
    write_vtu(out_path, mesh, point_fields=fields, cell_fields=cells)
    print(
        f"wrote {out_path}: {forest.n_elements} elements, "
        f"fields {sorted(fields)}"
    )
    return 0


def main(argv):
    if not argv:
        print(
            "usage: python -m disco4est_tpu options.input [--problem=sinx]"
            " [--plot-checkpoint=ck.npz [--output=out.vtu]]"
        )
        return 1
    opts = Options.load(argv[0])
    # [logging] log_dir = <dir> routes per-category logs to files
    # (zlog role, reference IO/logging.conf:20-31); console stays stdout.
    log_dir = opts.get("logging", "log_dir", None)
    if log_dir:
        from disco4est_tpu.util.logging import init_logging
        init_logging(log_dir, console=False)
    name = opts.get("problem", "name", "sinx")
    ck = None
    out = "checkpoint.vtu"
    for a in argv[1:]:
        if a.startswith("--problem="):
            name = a.split("=", 1)[1]
        elif a.startswith("--plot-checkpoint="):
            ck = a.split("=", 1)[1]
        elif a.startswith("--output="):
            out = a.split("=", 1)[1]
    if ck is not None:
        return plot_checkpoint(opts, ck, out)

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

    if log_dir:
        from disco4est_tpu.util.logging import get_category
        nlog = get_category("d4est_norms")
        for line in result.norms.lines(key):
            nlog.info(line)
    for line in result.norms.lines(key):
        print(line)
    fit = result.norms.convergence_fit(key)
    if fit:
        print(f"C1 = {fit['intercept']:.6f}, C2 = {fit['slope']:.15f}")
    return 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1:]))
