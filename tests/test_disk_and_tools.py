"""2D disk geometry, penalty debugger, checkpoint-to-VTK plotter
(VERDICT r3 #9 breadth)."""

import os
import subprocess
import sys

import numpy as np
import jax.numpy as jnp
import pytest

from disco4est_tpu.geometry.disk import DiskGeometry
from disco4est_tpu.mesh.tree import Forest
from disco4est_tpu.mesh.builder import build_mesh
from disco4est_tpu.laplacian.sipg import apply_sipg, build_rhs_with_strong_bc
from disco4est_tpu.solvers.cg import cg_solve


def test_disk_poisson_p_convergence():
    """5-tree disk (`d4est_geometry_disk.c:144-325`): boundary exactly on
    the circle r = R1, Poisson p-converges."""
    geom = DiskGeometry(R0=0.5, R1=1.0)
    forest = Forest.uniform(geom.conn, 1)
    pi = np.pi
    u_fcn = lambda x, y: jnp.sin(pi * x) * jnp.sin(pi * y)
    f_fcn = lambda x, y: 2 * pi**2 * u_fcn(x, y)

    errs = {}
    for deg in (2, 3):
        mesh = build_mesh(
            geom, forest, deg=deg, deg_quad=deg + 1,
            face_h_type="j_div_sj_quad",
        )
        assert mesh.n_elements == 20
        fx = np.asarray(mesh.face_xyz_lobatto)
        bnd = np.asarray(mesh.bnd_mask)
        r = np.sqrt((fx**2).sum(axis=2))
        assert np.max(np.abs(r[bnd] - 1.0)) < 1e-12
        g = mesh.boundary_values(u_fcn)
        f = mesh.init_field(f_fcn)
        rhs = build_rhs_with_strong_bc(mesh, f, g)
        res = cg_solve(
            lambda v: apply_sipg(mesh, v), rhs, atol=1e-14, rtol=0.0,
            max_iter=20000,
        )
        ua = mesh.init_field(u_fcn)
        errs[deg] = float(
            jnp.sqrt(jnp.sum(mesh.l2_norm_sqr(res.x - ua)))
        )
    assert errs[3] < 0.25 * errs[2], errs


def test_penalty_debugger():
    """`d4est_laplacian_flux_sipg_penalty_debugger.c` role: per-class
    penalty min/max/mean, scalar and pointwise modes, incl. mortars."""
    from disco4est_tpu.geometry.brick import BrickGeometry
    from disco4est_tpu.laplacian.penalty_debug import (
        penalty_report,
        print_penalty_report,
    )

    geom = BrickGeometry(dim=3)
    forest = Forest.uniform(geom.conn, 1)
    flags = np.zeros(8, bool)
    flags[0] = True
    forest = forest.refine(flags).balance()
    mesh = build_mesh(geom, forest, deg=2, penalty_prefactor=2.0)
    rep = print_penalty_report(mesh)
    assert not rep["pointwise"]
    assert rep["interior"]["count"] > 0
    assert rep["boundary"]["count"] > 0
    assert rep["mortar"]["count"] > 0
    # maxp_sqr_over_minh on the refined half: sigma = 2*4/h with
    # h in {0.5, 0.25} -> penalties in [16, 32]
    assert 15.9 < rep["interior"]["min"] < rep["mortar"]["max"] < 32.1

    mesh_q = build_mesh(
        geom, forest, deg=2, penalty_prefactor=2.0,
        face_h_type="j_div_sj_quad",
    )
    rep_q = penalty_report(mesh_q)
    assert rep_q["pointwise"]
    assert rep_q["mortar"]["count"] > 0


def test_checkpoint_plotter_cli(tmp_path):
    """CheckpointAMRPlotter role: run a driver with checkpoints, then
    plot the checkpoint to VTU via the CLI without solving."""
    opts_path = tmp_path / "opts.input"
    ck = tmp_path / "ck"
    opts_path.write_text(
        "[geometry]\nname = brick\n"
        "[initial_mesh]\nmin_level = 1\nregion0_deg = 2\n"
        "[amr]\nscheme = smooth_pred\nnum_of_amr_steps = 1\n"
        "[mesh_parameters]\nmax_degree = 3\n"
        f"[checkpoint]\nprefix = {ck}\n"
    )
    env = dict(os.environ, JAX_PLATFORMS="cpu")
    r = subprocess.run(
        [sys.executable, "-m", "disco4est_tpu", str(opts_path),
         "--problem=sinx"],
        capture_output=True, text=True, env=env, timeout=500,
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    )
    assert r.returncode == 0, r.stdout + r.stderr
    out = tmp_path / "plot.vtu"
    r2 = subprocess.run(
        [sys.executable, "-m", "disco4est_tpu", str(opts_path),
         f"--plot-checkpoint={ck}_level1", f"--output={out}"],
        capture_output=True, text=True, env=env, timeout=300,
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    )
    assert r2.returncode == 0, r2.stdout + r2.stderr
    assert out.exists()
    txt = out.read_text()
    assert "<VTKFile" in txt and "u" in txt


def test_category_logging(tmp_path):
    """Per-category log routing (zlog role, reference IO/logging.conf)."""
    import logging as _pylog
    from disco4est_tpu.util.logging import init_logging, get_category

    init_logging(log_dir=str(tmp_path), console=False)
    get_category("d4est_solver_cg").info("iter %d r2 %.3e", 3, 1.5e-9)
    get_category("d4est_amr").warning("marked %d elements", 42)
    get_category("custom_cat").info("on-demand category")
    for h in _pylog.getLogger("disco4est").handlers:
        h.flush()

    combined = (tmp_path / "run.log").read_text()
    assert "iter 3 r2 1.500e-09" in combined and "marked 42 elements" in combined
    assert "iter 3" in (tmp_path / "d4est_solver_cg.log").read_text()
    assert "marked 42" in (tmp_path / "d4est_amr.log").read_text()
    assert "on-demand" in (tmp_path / "custom_cat.log").read_text()
    # reconfigure without a log_dir: console-only, no crash
    init_logging(None, console=False)
    get_category("d4est_norms").info("no file handlers now")


def test_trap_and_pizza_poisson_p_convergence():
    """Trapezoid (bilinear, non-affine) and pizza-half (curved outer
    arc): single-tree 2D Poisson p-converges through the general path
    (`d4est_geometry_trap.c`, `d4est_geometry_pizza_half.c`)."""
    from disco4est_tpu.geometry.misc import PizzaHalfGeometry, TrapGeometry

    pi = np.pi
    u_fcn = lambda x, y: jnp.sin(pi * x) * jnp.sin(pi * y)
    f_fcn = lambda x, y: 2 * pi**2 * u_fcn(x, y)

    for geom, lvl in ((TrapGeometry(), 1), (PizzaHalfGeometry(0.5, 1.0), 1)):
        forest = Forest.uniform(geom.conn, lvl)
        errs = {}
        for deg in (2, 4):
            mesh = build_mesh(
                geom, forest, deg=deg, deg_quad=deg + 1,
                face_h_type="j_div_sj_quad",
            )
            g = mesh.boundary_values(u_fcn)
            f = mesh.init_field(f_fcn)
            rhs = build_rhs_with_strong_bc(mesh, f, g)
            res = cg_solve(
                lambda v: apply_sipg(mesh, v), rhs, atol=1e-14, rtol=0.0,
                max_iter=20000,
            )
            ua = mesh.init_field(u_fcn)
            errs[deg] = float(
                jnp.sqrt(jnp.sum(mesh.l2_norm_sqr(res.x - ua)))
            )
        assert errs[4] < 0.1 * errs[2], (type(geom).__name__, errs)
