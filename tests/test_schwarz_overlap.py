"""Overlapping Schwarz tests (reference `Solver/d4est_solver_schwarz*`).

The decisive check: the replicated-subdomain machinery must reproduce the
mathematical definition M = Σ_s R_sᵀ W_s A_s⁻¹ R_s computed independently
with dense numpy linear algebra from the global operator — on conforming
AND hanging meshes (the reference's schwarz cubic/hanging test family).
"""

import numpy as np
import jax.numpy as jnp
import pytest

from disco4est_tpu.geometry.brick import BrickGeometry
from disco4est_tpu.mesh.tree import Forest
from disco4est_tpu.mesh.builder import build_mesh
from disco4est_tpu.laplacian.sipg import apply_sipg_jit, apply_sipg
from disco4est_tpu.solvers.schwarz_overlap import (
    build_overlapping_schwarz,
    overlap_schwarz_smooth,
    subdomain_members,
)
from disco4est_tpu.solvers.fcg import fcg_solve


def _dense_A(mesh):
    n = mesh.local_nodes
    shape = (mesh.n_elements,) + (mesh.nl,) * mesh.dim
    cols = []
    for i in range(n):
        e = np.zeros(n)
        e[i] = 1.0
        cols.append(
            np.asarray(apply_sipg_jit(mesh, jnp.asarray(e.reshape(shape)))).reshape(-1)
        )
    return np.stack(cols, axis=1)


def _expected_apply(mesh, schwarz, A, r):
    """Numpy ground truth: Σ_s R_sᵀ W_s A_s⁻¹ R_s r with dense solves."""
    E = mesh.n_elements
    n = (mesh.nl) ** mesh.dim
    member = np.asarray(schwarz.member)
    valid = np.asarray(schwarz.valid)
    mask = np.asarray(schwarz.mask).reshape(member.shape + (n,))
    weight = np.asarray(schwarz.weight).reshape(member.shape + (n,))
    r_flat = np.asarray(r).reshape(E, n)
    out = np.zeros((E, n))
    S, K = member.shape
    for s in range(S):
        dofs = []  # global flat dof list of this subdomain
        for k in range(K):
            if not valid[s, k]:
                continue
            e = member[s, k]
            for j in np.where(mask[s, k] > 0.5)[0]:
                dofs.append((k, e, j))
        gidx = np.array([e * n + j for (_, e, j) in dofs])
        A_s = A[np.ix_(gidx, gidx)]
        r_s = np.array([r_flat[e, j] for (_, e, j) in dofs])
        e_s = np.linalg.solve(A_s, r_s)
        for (k, e, j), val in zip(dofs, e_s):
            out[e, j] += weight[s, k, j] * val
    return out.reshape(np.asarray(r).shape)


@pytest.mark.parametrize("hanging", [False, True])
@pytest.mark.parametrize("ov", [1, 2])
def test_schwarz_matches_dense_definition(hanging, ov):
    geom = BrickGeometry(dim=2)
    forest = Forest.uniform(geom.conn, 1)
    if hanging:
        flags = np.zeros(forest.n_elements, bool)
        flags[0] = True
        forest = forest.refine(flags).balance()
    mesh = build_mesh(geom, forest, deg=2)
    A = _dense_A(mesh)
    # exact subdomain solves: enough CG iterations for the largest block
    schwarz = build_overlapping_schwarz(
        mesh, num_nodes_overlap=ov, iterations=400
    )
    rng = np.random.default_rng(0)
    r = jnp.asarray(
        rng.standard_normal((mesh.n_elements,) + (mesh.nl,) * 2)
    )
    got = np.asarray(schwarz(r))
    want = _expected_apply(mesh, schwarz, A, r)
    assert np.max(np.abs(got - want)) < 1e-8 * max(np.max(np.abs(want)), 1.0)


def test_members_conforming_2d():
    geom = BrickGeometry(dim=2)
    forest = Forest.uniform(geom.conn, 2)  # 4x4
    mem = subdomain_members(forest)
    sizes = np.array([len(m) for m in mem])
    # corner elements: 4 members; edge: 6; interior: 9
    assert sizes.min() == 4 and sizes.max() == 9
    assert (sizes == 9).sum() == 4  # 2x2 interior block


def test_schwarz_preconditions_fcg_3d():
    geom = BrickGeometry(dim=3)
    forest = Forest.uniform(geom.conn, 2)
    mesh = build_mesh(geom, forest, deg=2)
    pi = np.pi
    u_fcn = lambda x, y, z: jnp.sin(pi * x) * jnp.sin(pi * y) * jnp.sin(pi * z)
    from disco4est_tpu.laplacian.sipg import build_rhs_with_strong_bc

    g = mesh.boundary_values(u_fcn)
    f = mesh.init_field(lambda x, y, z: 3 * pi**2 * u_fcn(x, y, z))
    rhs = build_rhs_with_strong_bc(mesh, f, g)
    A = lambda v: apply_sipg(mesh, v)

    res_plain = fcg_solve(A, rhs, atol=1e-11, rtol=0.0, max_iter=400)
    M = build_overlapping_schwarz(mesh, num_nodes_overlap=2, iterations=20)
    res_pc = fcg_solve(A, rhs, M=M, atol=1e-11, rtol=0.0, max_iter=400)
    assert int(res_pc.iterations) < 0.5 * int(res_plain.iterations)
    err = res_pc.x - mesh.init_field(u_fcn)
    assert float(jnp.max(jnp.abs(apply_sipg(mesh, res_pc.x) - rhs))) < 1e-9


def test_schwarz_smoother_contracts():
    geom = BrickGeometry(dim=2)
    forest = Forest.uniform(geom.conn, 2)
    mesh = build_mesh(geom, forest, deg=2)
    M = build_overlapping_schwarz(mesh, num_nodes_overlap=1, iterations=10)
    A = lambda v: apply_sipg(mesh, v)
    rng = np.random.default_rng(1)
    x_true = jnp.asarray(
        rng.standard_normal((mesh.n_elements,) + (mesh.nl,) * 2)
    )
    b = A(x_true)
    x = jnp.zeros_like(b)
    r0 = float(jnp.linalg.norm((b - A(x)).reshape(-1)))
    x = overlap_schwarz_smooth(A, M, b, x, iterations=3)
    r1 = float(jnp.linalg.norm((b - A(x)).reshape(-1)))
    assert r1 < 0.2 * r0


# ---------------------------------------------------------------------------
# K-slot gather variant (VERDICT r4 #4: memory-scalable Schwarz)
# ---------------------------------------------------------------------------


def test_kslot_matches_materialized_conforming():
    """Chunked K-slot apply == materialized replicated apply (brick)."""
    from disco4est_tpu.solvers.schwarz_overlap import (
        build_overlapping_schwarz,
        build_overlapping_schwarz_kslot,
    )

    geom = BrickGeometry(dim=3)
    forest = Forest.uniform(geom.conn, 1)
    mesh = build_mesh(geom, forest, deg=3)
    rng = np.random.default_rng(0)
    r = jnp.asarray(rng.standard_normal((8, 4, 4, 4)))
    M1 = build_overlapping_schwarz(mesh, num_nodes_overlap=2, iterations=5)
    M2 = build_overlapping_schwarz_kslot(
        mesh, num_nodes_overlap=2, iterations=5, chunk=3
    )
    assert float(jnp.max(jnp.abs(M1(r) - M2(r)))) < 1e-12


def test_kslot_matches_materialized_hanging_and_sphere():
    """K-slot on hanging meshes (mortar rows cross chunk-local slots) and
    on the curved 13-tree sphere with pointwise sigma."""
    from disco4est_tpu.solvers.schwarz_overlap import (
        build_overlapping_schwarz,
        build_overlapping_schwarz_kslot,
    )
    from disco4est_tpu.geometry.cubed_sphere import CubedSphereGeometry

    geom = BrickGeometry(dim=3)
    forest = Forest.uniform(geom.conn, 1)
    flags = np.zeros(8, bool)
    flags[0] = True
    forest = forest.refine(flags).balance()
    mesh = build_mesh(geom, forest, deg=2)
    rng = np.random.default_rng(1)
    r = jnp.asarray(rng.standard_normal((mesh.n_elements, 3, 3, 3)))
    M1 = build_overlapping_schwarz(mesh, num_nodes_overlap=1, iterations=4)
    M2 = build_overlapping_schwarz_kslot(
        mesh, num_nodes_overlap=1, iterations=4, chunk=4
    )
    assert float(jnp.max(jnp.abs(M1(r) - M2(r)))) < 1e-12

    geom_s = CubedSphereGeometry("13tree", R0=1.0, R1=2.0, R2=3.0)
    forest_s = Forest.uniform(geom_s.conn, 0)
    mesh_s = build_mesh(geom_s, forest_s, deg=2,
                        face_h_type="j_div_sj_quad")
    r_s = jnp.asarray(
        rng.standard_normal((mesh_s.n_elements, 3, 3, 3))
    )
    M1s = build_overlapping_schwarz(mesh_s, num_nodes_overlap=2,
                                    iterations=6)
    M2s = build_overlapping_schwarz_kslot(
        mesh_s, num_nodes_overlap=2, iterations=6, chunk=5
    )
    assert float(jnp.max(jnp.abs(M1s(r_s) - M2s(r_s)))) < 1e-12


def test_kslot_memory_footprint():
    """Resident K-slot state is a small fraction of the base mesh
    (the materialized variant is ~27x it)."""
    import jax as _jax
    from disco4est_tpu.solvers.schwarz_overlap import (
        build_overlapping_schwarz_kslot,
    )

    geom = BrickGeometry(dim=3)
    forest = Forest.uniform(geom.conn, 2)
    mesh = build_mesh(geom, forest, deg=2)
    ks = build_overlapping_schwarz_kslot(
        mesh, num_nodes_overlap=2, iterations=1, chunk=16
    )
    own = [ks.member, ks.valid, ks.codes, ks.mask_table, ks.weight_table,
           ks.nbr_slot, ks.bnd, ks.conf]
    own += list(_jax.tree_util.tree_leaves(ks.hc))
    ks_bytes = sum(l.size * l.dtype.itemsize for l in own)
    mesh_bytes = sum(
        l.size * l.dtype.itemsize
        for l in _jax.tree_util.tree_leaves(mesh)
        if hasattr(l, "size")
    )
    assert ks_bytes < 0.5 * mesh_bytes, (ks_bytes, mesh_bytes)
