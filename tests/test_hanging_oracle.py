"""Entry-by-entry parity of the hanging-mesh SIPG operator against the
reference's own dense-assembled matrix.

Oracle: `refcheck/hanging_matrix_probe.c` compiled the reference C core
(d4est_laplacian_apply_aij through d4est_solver_full_matrix,
`Solver/d4est_solver_full_matrix.c`) on a brick at level 1 with quadrant 0
refined + 2:1 balanced (15 elements, deg 2, legendre quadrature, penalty
maxp_sqr_over_minh, prefactor 10) and dumped the full 405x405 matrix for
each [mesh_parameters] face_h_type.  Matrices stored gzipped under
tests/data/.

This pins EVERY hanging-face convention in one shot: the mortar
projection scheme, the reference's x0.5 term2 scaling on the coarse side
(`d4est_laplacian_flux_sipg.c:789` — equivalent to our Galerkin-consistent
mortar form, verified here to 5e-16), and the penalty-h mortar rules:
TREE_H (`d4est_mesh.c:668`), J_DIV_SJ_QUAD with the mortar-sized-quadrant
(1/2)J/sj halving (`d4est_mortars.c:255`), J_DIV_SJ_MIN_LOBATTO
(`d4est_mesh.c:730`), VOLUME_DIV_AREA.
"""

import gzip
import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from disco4est_tpu.geometry.brick import BrickGeometry
from disco4est_tpu.mesh.tree import Forest, ROOT
from disco4est_tpu.mesh.builder import build_mesh
from disco4est_tpu.laplacian.sipg import apply_sipg

DATA = os.path.join(os.path.dirname(__file__), "data")
P4EST_ROOT = 1 << 30

VARIANTS = {
    "TREE_H": "tree_h",
    "VOLUME_DIV_AREA": "volume_div_area",
    "J_DIV_SJ_QUAD": "j_div_sj_quad",
    "J_DIV_SJ_MIN_LOBATTO": "j_div_sj_min_lobatto",
}


def load_oracle(variant):
    path = os.path.join(DATA, f"hm_{variant}.txt.gz")
    if not os.path.exists(path):
        pytest.skip(f"oracle file {path} missing")
    with gzip.open(path, "rt") as f:
        tok = f.readline().split()
        assert tok[0] == "ELEMENTS"
        E = int(tok[1])
        elems = [[int(x) for x in f.readline().split()] for _ in range(E)]
        tok = f.readline().split()
        N = int(tok[1])
        assert f.readline().strip() == "MATRIX"
        data = np.fromstring(f.read(), sep="\n")
    return np.array(elems), data.reshape(N, N)


def build_hanging_mesh(face_h_type):
    geom = BrickGeometry(x0=(0, 0, 0), x1=(1, 1, 1), dim=3)
    forest = Forest.uniform(geom.conn, 1)
    flags = np.zeros(forest.n_elements, bool)
    flags[0] = True
    forest = forest.refine(flags).balance()
    mesh = build_mesh(
        geom, forest, deg=2, deg_quad=2,
        penalty_prefactor=10.0, penalty_fcn="maxp_sqr_over_minh",
        face_h_type=face_h_type,
    )
    return forest, mesh


@pytest.mark.parametrize("variant", sorted(VARIANTS))
def test_hanging_matrix_matches_reference(variant):
    elems, A_ref = load_oracle(variant)
    forest, mesh = build_hanging_mesh(VARIANTS[variant])

    # element correspondence by (tree, anchor); oracle anchors in
    # P4EST_ROOT units, ours in tree.ROOT units
    scale = P4EST_ROOT // ROOT
    ours_key = {
        (int(forest.tree[e]),)
        + tuple(int(a) * scale for a in forest.anchor[e]): e
        for e in range(forest.n_elements)
    }
    perm = [
        ours_key[(int(r[1]), int(r[2]), int(r[3]), int(r[4]))]
        for r in elems
    ]

    E = mesh.n_elements
    nl = mesh.deg + 1
    n = nl**mesh.dim
    N = E * n
    apply = jax.jit(lambda m, v: apply_sipg(m, v))
    cols = []
    v = np.zeros(N)
    for j in range(N):
        v[j] = 1.0
        cols.append(
            np.asarray(
                apply(mesh, jnp.asarray(v.reshape(E, nl, nl, nl)))
            ).reshape(-1)
        )
        v[j] = 0.0
    A = np.stack(cols, axis=1)
    idx = np.concatenate([np.arange(p * n, (p + 1) * n) for p in perm])
    A = A[np.ix_(idx, idx)]

    scale_m = np.abs(A_ref).max()
    assert np.abs(A - A_ref).max() < 1e-13 * scale_m
    # both operators are symmetric (the reference's hanging x0.5 term2
    # scaling is the symmetric Galerkin-consistent convention)
    assert np.abs(A - A.T).max() < 1e-13 * scale_m
