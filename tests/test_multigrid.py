"""hp-multigrid tests.

Mirrors the reference's `Tests/Unit/d4est_test_multigrid_cubic.c`: build a
mesh, set up the precomputed hierarchy, and check that V-cycles contract
the residual at a mesh-independent rate and that MG-preconditioned CG
converges in few iterations.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from disco4est_tpu.geometry.brick import BrickGeometry
from disco4est_tpu.mesh.tree import Forest
from disco4est_tpu.mesh.builder import build_mesh
from disco4est_tpu.laplacian.sipg import apply_sipg, build_rhs_with_strong_bc
from disco4est_tpu.solvers.multigrid import (
    MGParams,
    build_hierarchy,
    estimate_bounds,
    mg_solve,
    mg_preconditioner,
    v_cycle,
)
from disco4est_tpu.solvers.cg import cg_solve


def _setup(dim=2, deg=2, level=3):
    geom = BrickGeometry(dim=dim)
    forest = Forest.uniform(geom.conn, level)
    mesh = build_mesh(geom, forest, deg=deg)

    def u_fcn(*c):
        out = 1.0
        for x in c:
            out = out * jnp.sin(jnp.pi * x)
        return out

    g = mesh.boundary_values(u_fcn)
    f = mesh.init_field(lambda *c: dim * jnp.pi**2 * u_fcn(*c))
    rhs = build_rhs_with_strong_bc(mesh, f, g)
    return mesh, rhs


def test_hierarchy_depth():
    mesh, _ = _setup(dim=2, level=3)
    hier = build_hierarchy(mesh)
    assert hier.n_levels == 4  # 64 -> 16 -> 4 -> 1 elements
    assert hier.meshes[-1].n_elements == 1


def test_vcycle_contraction():
    mesh, rhs = _setup(dim=2, deg=2, level=3)
    hier = build_hierarchy(mesh, MGParams(vcycle_imax=8, vcycle_rtol=1e-30))
    estimate_bounds(hier, apply_sipg, lambda m: m.init_field(
        lambda *c: sum(jnp.sin(3 * x) for x in c)))
    x, hist = mg_solve(hier, apply_sipg, rhs)
    rates = [hist[i + 1] / hist[i] for i in range(len(hist) - 1)]
    # Chebyshev-smoothed V-cycle should contract well below 0.2/cycle.
    assert rates[1] < 0.2, (hist, rates)


def test_mg_preconditioned_cg():
    mesh, rhs = _setup(dim=2, deg=2, level=3)
    hier = build_hierarchy(mesh)
    estimate_bounds(hier, apply_sipg, lambda m: m.init_field(
        lambda *c: sum(jnp.sin(3 * x) for x in c)))
    M = mg_preconditioner(hier, apply_sipg)

    @jax.jit
    def solve(h, b):
        from disco4est_tpu.solvers.multigrid import v_cycle as vc

        def Mfn(r):
            return vc(h, apply_sipg, r, jnp.zeros_like(r))

        return cg_solve(
            lambda v: apply_sipg(h.meshes[0], v), b, M=Mfn,
            atol=1e-12, rtol=1e-30, max_iter=100,
        )

    res = solve(hier, rhs)
    res_plain = jax.jit(
        lambda m, b: cg_solve(
            lambda v: apply_sipg(m, v), b, atol=1e-12, rtol=1e-30,
            max_iter=2000,
        )
    )(mesh, rhs)
    assert int(res.iterations) < 25, int(res.iterations)
    assert int(res.iterations) * 3 < int(res_plain.iterations)
    err = float(jnp.max(jnp.abs(res.x - res_plain.x)))
    assert err < 1e-8, err
