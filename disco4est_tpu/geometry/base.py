"""Geometry protocol: multi-block analytic maps + tree connectivity.

Role of the reference's `Geometry/d4est_geometry.c` (`d4est_geometry_t`
with X/DX/JAC/D2X callbacks and analytic-vs-numerical switches,
`d4est_geometry.h:101-123`): here a `Geometry` provides one jax-traceable
map `x(tree, rst)` from per-tree unit coordinates to physical space, and
every derived quantity (Jacobian matrix, its determinant and inverse,
surface jacobians, normals) is obtained by *forward-mode autodiff* at trace
time — the TPU-native replacement for both the reference's hand-written
analytic derivative callbacks and its finite-difference fallbacks
(`compute_dxyz_drst_numerically`).  Subclasses may override `dx` with an
analytic Jacobian when it is cheaper.

The `Connectivity` plays the role of p4est's `p4est_connectivity_t`: which
tree touches which through each face, and with what coordinate transform.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np


@dataclasses.dataclass(frozen=True)
class Connectivity:
    """Tree-to-tree adjacency through faces.

    nbr_tree[t, f]   = neighboring tree id, or -1 at a physical boundary.
    nbr_face[t, f]   = which face of the neighbor touches.
    axis_map[t, f]   = [dim] permutation: my axis a maps to neighbor axis
                       axis_map[a].
    axis_flip[t, f]  = [dim] sign flags: 1 if my axis a is reversed in the
                       neighbor's frame.

    This (permutation, flip) encoding covers every p4est/p8est face
    orientation code for the geometries the reference ships (brick, disk,
    cubed spheres); it is the array-program analog of
    `p4est_connectivity_t.tree_to_tree/tree_to_face`.
    """

    dim: int
    nbr_tree: np.ndarray  # [T, 2*dim] int32
    nbr_face: np.ndarray  # [T, 2*dim] int32
    axis_map: np.ndarray  # [T, 2*dim, dim] int8
    axis_flip: np.ndarray  # [T, 2*dim, dim] int8

    @property
    def n_trees(self) -> int:
        return self.nbr_tree.shape[0]

    @staticmethod
    def single_tree(dim: int) -> "Connectivity":
        """One tree, all faces physical boundary."""
        return Connectivity(
            dim=dim,
            nbr_tree=-np.ones((1, 2 * dim), np.int32),
            nbr_face=np.zeros((1, 2 * dim), np.int32),
            axis_map=np.tile(np.arange(dim, dtype=np.int8), (1, 2 * dim, 1)),
            axis_flip=np.zeros((1, 2 * dim, dim), np.int8),
        )


class Geometry:
    """Base geometry: subclasses define `x(tree, rst)`.

    `rst` are tree-local coordinates in [0, 1]^dim; `tree` is a (traced or
    static) integer array broadcastable against rst's leading dims.

    `is_affine`: True when every tree map is affine (constant Jacobian).
    Affine geometries get compact per-element factor storage (one Jacobian
    per element instead of one per quadrature point) — the TPU analog of
    the reference's analytic-vs-numerical geometry switches
    (`Geometry/d4est_geometry.h:101-123`), driven by HBM bandwidth instead
    of FLOP counts.
    """

    dim: int
    conn: Connectivity
    is_affine: bool = False
    # True when every tree map is axis-aligned (diagonal Jacobian): the
    # volume factor matrix wjgg is diagonal and the fast GEMM-form apply
    # (laplacian/fast.py) uses 3 volume blocks instead of 6.
    is_orthogonal: bool = False
    # geometry regions (`d4est_geometry.h:117-118` get_region API): tree →
    # region id, used by per-region estimator stats and per-region degree
    # assignment.  Default: one region.
    n_regions: int = 1

    def tree_region(self, tree):
        """Region id per tree: array-in, array-out (default all 0)."""
        import numpy as _np

        return _np.zeros_like(_np.asarray(tree), dtype=_np.int32)

    def x(self, tree, rst):
        """Physical coordinates; rst [..., dim] -> [..., dim]."""
        raise NotImplementedError

    def dx(self, tree, rst):
        """Jacobian ∂x_i/∂rst_j, shape [..., dim, dim]; default autodiff."""
        flat_tree = jnp.broadcast_to(
            jnp.asarray(tree), jnp.shape(rst)[:-1]
        ).reshape(-1)
        flat_rst = jnp.reshape(rst, (-1, self.dim))
        jac = jax.vmap(
            lambda t, r: jax.jacfwd(lambda rr: self.x(t, rr))(r)
        )(flat_tree, flat_rst)
        return jac.reshape((*jnp.shape(rst)[:-1], self.dim, self.dim))
