"""True hp (mixed per-element degree) mesh tests.

The reference carries per-element `deg` everywhere
(`Mesh/d4est_element_data.h:13-46`) and projects both sides of a face
onto the max-degree mortar (`Mesh/d4est_mortars.h:77-79`).  These tests
validate the padding+conjugation design of `laplacian/hp.py`:

- subspace exactness: on a uniform-degree mesh stored at a HIGHER storage
  degree, A_hp equals the plain operator assembled at the true degree;
- symmetry/SPD on genuinely mixed meshes (incl. hanging nodes);
- polynomial consistency and solves on mixed meshes;
- hp-AMR field transfer exactness;
- the driver's smooth_pred hp trajectory improves on pure h-AMR.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from disco4est_tpu.geometry.brick import BrickGeometry
from disco4est_tpu.mesh.tree import Forest
from disco4est_tpu.mesh.builder import build_mesh
from disco4est_tpu.laplacian.sipg import apply_sipg_jit, build_rhs_with_strong_bc
from disco4est_tpu.laplacian.hp import (
    apply_sipg_hp_jit,
    build_rhs_with_strong_bc_hp,
    own_mask,
    prolong_padded,
    restrict_padded,
    to_max,
)
from disco4est_tpu.solvers.cg import cg_solve
from disco4est_tpu.amr.amr import amr_step_hp


def _dense(mesh, apply_fn, **kw):
    n = mesh.local_nodes
    shape = (mesh.n_elements,) + (mesh.nl,) * mesh.dim
    cols = []
    for i in range(n):
        e = np.zeros(n)
        e[i] = 1.0
        cols.append(
            np.asarray(apply_fn(mesh, jnp.asarray(e.reshape(shape)), **kw)).reshape(-1)
        )
    return np.stack(cols, axis=1)


def _own_slot_indices(mesh):
    """Flat indices (in the padded layout) of true coefficient slots."""
    mask = np.asarray(own_mask(mesh)).reshape(-1)
    return np.where(mask > 0.5)[0]


def test_uniform_subspace_exactness_2d():
    """Storage degree 3, true degree 2 everywhere == plain degree-2 mesh."""
    geom = BrickGeometry(dim=2)
    forest = Forest.uniform(geom.conn, 1)
    d_true = 2
    mesh_ref = build_mesh(geom, forest, deg=d_true)
    mesh_hp = build_mesh(
        geom, forest, deg=3, deg_e=np.full(forest.n_elements, d_true)
    )
    A_ref = _dense(mesh_ref, apply_sipg_jit)
    A_hp = _dense(mesh_hp, apply_sipg_hp_jit)
    # Map hp's padded slots onto the reference layout: both index the true
    # coefficient block in (z, y, x) node order, elements in SFC order.
    slots = _own_slot_indices(mesh_hp)
    A_sub = A_hp[np.ix_(slots, slots)]
    # padding rows/cols of A_hp must be structurally zero
    full = np.arange(A_hp.shape[0])
    pad = np.setdiff1d(full, slots)
    assert np.max(np.abs(A_hp[pad][:, :])) < 1e-13
    assert np.max(np.abs(A_hp[:, pad])) < 1e-13
    scale = np.max(np.abs(A_ref))
    assert np.max(np.abs(A_sub - A_ref)) < 1e-11 * scale


@pytest.mark.parametrize("dim", [2, 3])
def test_mixed_symmetry_spd(dim):
    """Mixed degrees on a hanging-node mesh: A_hp = A_hpᵀ ≻ 0 on the true
    slots (the hp analog of `d4est_test_laplacian_symmetry.c`)."""
    geom = BrickGeometry(dim=dim)
    forest = Forest.uniform(geom.conn, 1)
    flags = np.zeros(forest.n_elements, bool)
    flags[0] = True
    forest = forest.refine(flags).balance()
    rng = np.random.default_rng(3)
    deg_e = rng.integers(1, 4, forest.n_elements)
    mesh = build_mesh(geom, forest, deg=3, deg_e=deg_e)
    A = _dense(mesh, apply_sipg_hp_jit)
    slots = _own_slot_indices(mesh)
    A = A[np.ix_(slots, slots)]
    assert np.max(np.abs(A - A.T)) < 1e-11 * np.max(np.abs(A))
    w = np.linalg.eigvalsh(0.5 * (A + A.T))
    assert w.min() > 0


def test_mixed_polynomial_consistency_2d():
    """On a mixed {2,3}-degree mesh, a global quadratic is in every
    element's space: A_hp u == rhs_hp exactly."""
    geom = BrickGeometry(dim=2)
    forest = Forest.uniform(geom.conn, 1)
    deg_e = np.array([2, 3, 3, 2])
    mesh = build_mesh(geom, forest, deg=3, deg_e=deg_e)

    u_fcn = lambda x, y: x**2 - 2 * y**2 + x * y + 1.0
    lap = lambda x, y: 0.0 * x + (2.0 - 4.0)
    u_max = mesh.init_field(u_fcn)
    u_own = restrict_padded(u_max, mesh.deg_e, mesh.deg, 2)
    # the quadratic is exactly representable: P(R(u)) == u
    assert (
        np.max(np.abs(np.asarray(to_max(mesh, u_own) - u_max))) < 1e-11
    )
    g = mesh.boundary_values(u_fcn)
    f = mesh.init_field(lambda x, y: -lap(x, y))
    rhs = build_rhs_with_strong_bc_hp(mesh, f, g)
    Au = apply_sipg_hp_jit(mesh, u_own)
    scale = max(float(jnp.max(jnp.abs(rhs))), 1.0)
    assert float(jnp.max(jnp.abs(Au - rhs))) < 1e-10 * scale


def test_mixed_solve_sinx_2d():
    """CG on the hp operator converges and the error sits between the
    uniform-low and uniform-high degree errors."""
    geom = BrickGeometry(dim=2)
    forest = Forest.uniform(geom.conn, 2)
    E = forest.n_elements
    pi = np.pi
    u_fcn = lambda x, y: jnp.sin(pi * x) * jnp.sin(pi * y)
    f_fcn = lambda x, y: 2 * pi**2 * u_fcn(x, y)

    def solve(deg_e, deg):
        mesh = build_mesh(geom, forest, deg=deg, deg_e=deg_e)
        g = mesh.boundary_values(u_fcn)
        f = mesh.init_field(f_fcn)
        rhs = build_rhs_with_strong_bc_hp(mesh, f, g)
        res = cg_solve(
            lambda v: apply_sipg_hp_jit(mesh, v),
            rhs,
            atol=1e-14,
            rtol=1e-16,
            max_iter=4000,
        )
        u_max = to_max(mesh, res.x)
        err2 = mesh.l2_norm_sqr(u_max - mesh.init_field(u_fcn))
        return float(jnp.sqrt(jnp.sum(err2)))

    err_lo = solve(np.full(E, 2), 2)
    err_hi = solve(np.full(E, 3), 3)
    rng = np.random.default_rng(0)
    deg_e = rng.integers(2, 4, E)
    err_mix = solve(deg_e, 3)
    assert err_hi < err_mix < err_lo


def test_amr_step_hp_transfer_exact():
    """h-refine + p-refine + balance: a quadratic transfers exactly
    (every new element's degree ≥ 2)."""
    geom = BrickGeometry(dim=2)
    forest = Forest.uniform(geom.conn, 1)
    E = forest.n_elements
    deg_e = np.array([2, 3, 2, 3])
    storage = 3
    mesh = build_mesh(geom, forest, deg=storage, deg_e=deg_e)
    u_fcn = lambda x, y: x**2 + 0.5 * y**2 - x * y
    u_own = restrict_padded(mesh.init_field(u_fcn), mesh.deg_e, storage, 2)

    # log: elem0 h-refine (children deg 2), elem1 p-refine to 4, rest no-op
    log = np.array([-2, 4, 2, 3], np.int64)
    nf, nde, fields, nstor = amr_step_hp(
        forest, deg_e, log, {"u": u_own}, storage
    )
    assert nstor == 4
    assert nf.n_elements > E
    mesh2 = build_mesh(geom, nf, deg=nstor, deg_e=nde)
    u2_max = prolong_padded(fields["u"], nde, nstor, 2)
    u_exact = mesh2.init_field(u_fcn)
    assert float(jnp.max(jnp.abs(u2_max - u_exact))) < 1e-11


def test_driver_smooth_pred_hp():
    """smooth_pred with max_degree > initial degree exercises genuine
    p-refinement and beats the same number of steps at fixed degree."""
    from disco4est_tpu.driver import run_poisson
    from disco4est_tpu.util.config import Options
    from disco4est_tpu.problems.poisson import SinxProblem

    ini = """
[geometry]
name = brick
[initial_mesh]
min_level = 1
region0_deg = 2
[mesh_parameters]
max_degree = 4
[amr]
scheme = smooth_pred
num_of_amr_steps = 3
percentile = 25.0
gamma_h = 10.0
gamma_p = 0.1
gamma_n = 1.0
[flux]
sipg_penalty_prefactor = 2.0
"""
    opts = Options.load(ini)
    problem = SinxProblem()
    res = run_poisson(opts, problem)
    l2 = [rec["L_2"] for rec in res.norms.rows]
    # the trajectory must improve substantially and end with mixed degrees
    assert l2[-1] < 0.02 * l2[0]
    deg_e = np.asarray(res.mesh.deg_e)
    assert deg_e.max() > 2, "no p-refinement happened"
