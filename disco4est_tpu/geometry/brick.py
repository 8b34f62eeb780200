"""Brick (rectangular box) geometry, possibly multi-tree.

Role of the reference's `Geometry/d4est_geometry_brick.c`: an axis-aligned
box [X0,X1]×[Y0,Y1](×[Z0,Z1]) covered by an (nx, ny, nz) grid of trees.
The map is affine per tree, so autodiff gives exact constant Jacobians.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from disco4est_tpu.geometry.base import Connectivity, Geometry


class BrickGeometry(Geometry):
    is_affine = True
    is_orthogonal = True

    def __init__(
        self,
        x0=(0.0, 0.0, 0.0),
        x1=(1.0, 1.0, 1.0),
        n_trees_per_dim=(1, 1, 1),
        dim: int = 3,
    ):
        self.dim = dim
        self.x0 = np.asarray(x0[:dim], np.float64)
        self.x1 = np.asarray(x1[:dim], np.float64)
        self.nt = tuple(int(n) for n in n_trees_per_dim[:dim])
        self.conn = _brick_connectivity(dim, self.nt)
        # Tree origin (in units of one tree cell) for each tree id.
        grid = np.stack(
            np.meshgrid(*[np.arange(n) for n in self.nt], indexing="ij"),
            axis=-1,
        ).reshape(-1, dim)
        # Tree id ordering: x fastest (matches p4est brick).
        order = np.lexsort([grid[:, d] for d in range(dim)][::-1][::-1])
        # grid rows generated with meshgrid(indexing='ij') over (x,y,z)
        # produce x-slowest; re-sort so tree t has coords with x fastest.
        keys = sum(
            grid[:, d] * int(np.prod(self.nt[:d])) for d in range(dim)
        )
        order = np.argsort(keys)
        self.tree_origin = grid[order].astype(np.float64)
        del order
        self.cell = (self.x1 - self.x0) / np.asarray(self.nt, np.float64)
        # cubic cells => every element (any refinement level) is a cube and
        # the wjgg factor is a multiple of the identity (MeshData.iso).
        self.is_isotropic = bool(
            np.allclose(self.cell, self.cell[0], rtol=1e-14)
        )

    def _key(self):
        return (
            self.dim,
            tuple(self.x0),
            tuple(self.x1),
            self.nt,
        )

    def __eq__(self, other):
        return (
            isinstance(other, BrickGeometry) and self._key() == other._key()
        )

    def __hash__(self):
        return hash(self._key())

    def x(self, tree, rst):
        origin = jnp.asarray(self.tree_origin)[tree]
        return jnp.asarray(self.x0) + (origin + rst) * jnp.asarray(self.cell)

    def dx(self, tree, rst):
        d = jnp.diag(jnp.asarray(self.cell))
        return jnp.broadcast_to(d, (*jnp.shape(rst)[:-1], self.dim, self.dim))


def _brick_connectivity(dim: int, nt: tuple) -> Connectivity:
    T = int(np.prod(nt))
    nbr_tree = -np.ones((T, 2 * dim), np.int32)
    nbr_face = np.zeros((T, 2 * dim), np.int32)
    axis_map = np.tile(np.arange(dim, dtype=np.int8), (T, 2 * dim, 1))
    axis_flip = np.zeros((T, 2 * dim, dim), np.int8)
    strides = [int(np.prod(nt[:d])) for d in range(dim)]

    def tid(coords):
        return sum(coords[d] * strides[d] for d in range(dim))

    for t in range(T):
        coords = [(t // strides[d]) % nt[d] for d in range(dim)]
        for d in range(dim):
            for side in (0, 1):
                f = 2 * d + side
                nc = list(coords)
                nc[d] += 1 if side else -1
                if 0 <= nc[d] < nt[d]:
                    nbr_tree[t, f] = tid(nc)
                    nbr_face[t, f] = 2 * d + (1 - side)
    return Connectivity(
        dim=dim,
        nbr_tree=nbr_tree,
        nbr_face=nbr_face,
        axis_map=axis_map,
        axis_flip=axis_flip,
    )
