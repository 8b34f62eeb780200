"""Compare our SIPG operator on a hanging mesh against the reference's
dense-assembled matrix (refcheck/hanging_matrix_probe.c oracle).

Oracle files: refbuild/harness/run/hm_<FACE_H>.txt — brick level 1,
quadrant 0 refined + balanced (15 elements), deg 2, legendre quadrature,
penalty maxp_sqr_over_minh, prefactor 10.

Usage: python tools/exp_hanging_compare.py [FACE_H ...]
"""
import os
import sys

import jax

jax.config.update("jax_platforms", "cpu")  # force CPU even under axon
jax.config.update("jax_enable_x64", True)

import numpy as np
import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from disco4est_tpu.geometry.brick import BrickGeometry
from disco4est_tpu.mesh.tree import Forest, ROOT
from disco4est_tpu.mesh.builder import build_mesh
from disco4est_tpu.laplacian.sipg import apply_sipg

RUN = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "refbuild", "harness", "run",
)
P4EST_ROOT = 1 << 30


def load_oracle(path):
    with open(path) as f:
        tok = f.readline().split()
        assert tok[0] == "ELEMENTS"
        E = int(tok[1])
        elems = []
        for _ in range(E):
            elems.append([int(x) for x in f.readline().split()])
        tok = f.readline().split()
        assert tok[0] == "NODES"
        N = int(tok[1])
        assert f.readline().strip() == "MATRIX"
        data = np.fromstring(f.read(), sep="\n")
    assert data.size == N * N, (data.size, N)
    return np.array(elems), data.reshape(N, N)


def build_ours(face_h_type):
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


def dense(mesh):
    E = mesh.n_elements
    n = (mesh.deg + 1) ** mesh.dim
    N = E * n
    apply = jax.jit(lambda m, v: apply_sipg(m, v))
    cols = []
    v = np.zeros(N)
    for j in range(N):
        v[j] = 1.0
        u = jnp.asarray(v.reshape(E, mesh.deg + 1, mesh.deg + 1,
                                  mesh.deg + 1))
        cols.append(np.asarray(apply(mesh, u)).reshape(-1))
        v[j] = 0.0
    return np.stack(cols, axis=1)  # A[:, j] = A e_j


def main():
    variants = sys.argv[1:] or ["VOLUME_DIV_AREA", "TREE_H",
                                "J_DIV_SJ_QUAD", "J_DIV_SJ_MIN_LOBATTO"]
    name_map = {
        "VOLUME_DIV_AREA": "volume_div_area",
        "TREE_H": "tree_h",
        "J_DIV_SJ_QUAD": "j_div_sj_quad",
        "J_DIV_SJ_MIN_LOBATTO": "j_div_sj_min_lobatto",
    }
    for v in variants:
        path = os.path.join(RUN, f"hm_{v}.txt")
        elems, A_ref = load_oracle(path)
        try:
            forest, mesh = build_ours(name_map[v])
        except Exception as e:
            print(f"{v}: OUR BUILD FAILED: {e}")
            continue
        # element correspondence by (tree, anchor) — oracle anchors are in
        # P4EST_ROOT units, ours in tree.ROOT units
        scale = P4EST_ROOT // ROOT
        ours_key = [
            (int(forest.tree[e]),) + tuple(
                int(a) * scale for a in forest.anchor[e]
            )
            for e in range(forest.n_elements)
        ]
        ref_key = [
            (int(r[1]), int(r[2]), int(r[3]), int(r[4])) for r in elems
        ]
        assert set(ours_key) == set(ref_key), "element sets differ"
        perm = [ours_key.index(k) for k in ref_key]  # ref idx -> our idx
        print(f"{v}: element order match: {perm == list(range(len(perm)))}")
        A = dense(mesh)
        n = (mesh.deg + 1) ** mesh.dim
        # reorder our matrix into ref element order
        idx = np.concatenate([np.arange(p * n, (p + 1) * n) for p in perm])
        A = A[np.ix_(idx, idx)]
        d = np.abs(A - A_ref)
        scale_m = np.abs(A_ref).max()
        print(f"  max|A_ref| = {scale_m:.3e}  max|diff| = {d.max():.3e}  "
              f"rel = {d.max()/scale_m:.3e}")
        # where do they differ? per element-block report
        E = mesh.n_elements
        blk = d.reshape(E, n, E, n).max(axis=(1, 3))
        bad = np.argwhere(blk > 1e-10 * scale_m)
        print(f"  mismatched blocks: {len(bad)}")
        for i, j in bad[:12]:
            print(f"    block ({i},{j}): maxdiff {blk[i,j]:.3e}")
        # symmetry of both
        print(f"  sym(A_ref) = {np.abs(A_ref - A_ref.T).max():.3e}   "
              f"sym(A_ours) = {np.abs(A - A.T).max():.3e}")


if __name__ == "__main__":
    main()
