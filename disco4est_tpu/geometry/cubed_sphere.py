"""Cubed-sphere geometries (7-tree and 13-tree), with compactified
infinite outer shells.

Role of the reference's `Geometry/d4est_geometry_cubed_sphere.c`:
- 13-tree sphere (`d4est_geometry_cubed_sphere_X` :316): 6 outer shells
  (R1→R2, pure angular tan map, optionally compactified so the outer
  boundary sits at r→∞), 6 inner shells (R0→R1, cube-to-sphere blend),
  1 core cube of half-width Clength = R0/√3;
- 7-tree sphere (`..._7tree_X` :499): 6 inner shells + core.

All trees share vertex-space boxes; the per-tree orientation is the
`switch (which_tree % 6)` sign permutation, implemented here as a [6,3,3]
constant matrix gather so one traced expression serves all trees.
Jacobians come from autodiff (Geometry.dx default).
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from disco4est_tpu.geometry.base import Geometry
from disco4est_tpu.geometry.p8est_conn import (
    connectivity_from_p8est,
    sphere12_hole_data,
    sphere13_data,
    sphere7_data,
)

# switch(tree % 6) of the reference: xyz as signed permutation of
# (qx, qy, q).  Case k: xyz = ORIENT[k] @ [q·x, q·y, q].
_ORIENT = np.zeros((6, 3, 3))
# case 0 (front): ( +qx, -q, +qy )
_ORIENT[0] = [[1, 0, 0], [0, 0, -1], [0, 1, 0]]
# case 1 (top): ( +qx, +qy, +q )
_ORIENT[1] = [[1, 0, 0], [0, 1, 0], [0, 0, 1]]
# case 2 (back): ( +qx, +q, -qy )
_ORIENT[2] = [[1, 0, 0], [0, 0, 1], [0, -1, 0]]
# case 3 (right): ( +q, -qx, -qy )
_ORIENT[3] = [[0, 0, 1], [-1, 0, 0], [0, -1, 0]]
# case 4 (bottom): ( -qy, -qx, -q )
_ORIENT[4] = [[0, -1, 0], [-1, 0, 0], [0, 0, -1]]
# case 5 (left): ( -q, -qx, +qy )
_ORIENT[5] = [[0, 0, -1], [-1, 0, 0], [0, 1, 0]]


class CubedSphereGeometry(Geometry):
    """kind: '13tree' (outer+inner+core) or '7tree' (inner+core)."""

    dim = 3

    def __init__(
        self,
        kind: str = "13tree",
        R0: float = 1.0,
        R1: float = 2.0,
        R2: float = 3.0,
        compactify_outer_shell: bool = False,
        compactify_inner_shell: bool = False,
    ):
        self.kind = kind
        self.R0, self.R1, self.R2 = float(R0), float(R1), float(R2)
        self.compactify_outer = bool(compactify_outer_shell)
        self.compactify_inner = bool(compactify_inner_shell)
        self.Clength = self.R0 / np.sqrt(3.0)
        # regions follow `d4est_geometry_cubed_sphere_get_region`
        # (reference :42-67): 13tree {outer=0, inner=1, core=2},
        # 7tree {inner=0, core=1}; 12tree_hole {outer=0, inner=1}
        self.n_regions = {"13tree": 3, "7tree": 2, "12tree_hole": 2}.get(
            kind, 1
        )
        if kind == "13tree":
            t2t, t2f, verts = sphere13_data()
            self.n_outer = 6
        elif kind == "7tree":
            t2t, t2f, verts = sphere7_data()
            self.n_outer = 0
        elif kind == "12tree_hole":
            # sphere with a spherical excision hole at r = R0: 6 outer
            # (R1→R2, compactifiable) + 6 inner (R0→R1) pure-angular
            # shells, no core (BoyenYorkModel's domain,
            # `cubed_sphere_with_sphere_hole`)
            t2t, t2f, verts = sphere12_hole_data()
            self.n_outer = 6
        else:
            raise ValueError(kind)
        self.conn = connectivity_from_p8est(t2t, t2f)
        self.verts = verts  # [T, 8, 3] vertex-space boxes
        self.n_trees_total = verts.shape[0]
        # no core tree on the holed sphere (tree == core_tree never true)
        self.core_tree = -1 if kind == "12tree_hole" else self.n_trees_total - 1

    def _key(self):
        return (
            self.kind, self.R0, self.R1, self.R2,
            self.compactify_outer, self.compactify_inner,
        )

    def __eq__(self, other):
        return (
            isinstance(other, CubedSphereGeometry)
            and self._key() == other._key()
        )

    def __hash__(self):
        return hash(self._key())

    # ------------------------------------------------------------------

    def tree_region(self, tree):
        t = np.asarray(tree)
        if self.kind == "13tree":
            return np.where(t < 6, 0, np.where(t < 12, 1, 2)).astype(
                np.int32
            )
        if self.kind == "7tree":
            return np.where(t < 6, 0, 1).astype(np.int32)
        if self.kind == "12tree_hole":
            return np.where(t < 6, 0, 1).astype(np.int32)
        return np.zeros_like(t, dtype=np.int32)

    def x(self, tree, rst):
        """rst in [0,1]^3 tree coords -> physical xyz.

        `tree` broadcastable against rst[..., 0].
        """
        tree = jnp.broadcast_to(jnp.asarray(tree), jnp.shape(rst)[:-1])
        verts = jnp.asarray(self.verts)[tree]  # [..., 8, 3]
        # trilinear octree_to_vertex (vertex bits: x fastest)
        r, s, t = rst[..., 0], rst[..., 1], rst[..., 2]
        w = jnp.stack(
            [
                (1 - r) * (1 - s) * (1 - t),
                r * (1 - s) * (1 - t),
                (1 - r) * s * (1 - t),
                r * s * (1 - t),
                (1 - r) * (1 - s) * t,
                r * (1 - s) * t,
                (1 - r) * s * t,
                r * s * t,
            ],
            axis=-1,
        )
        abc = jnp.einsum("...v,...vc->...c", w, verts)
        a, b, c = abc[..., 0], abc[..., 1], abc[..., 2]

        # --- outer shell (13-tree trees 0..5): pure angular map ---------
        tanx = jnp.tan(a * (np.pi / 4.0))
        tany = jnp.tan(b * (np.pi / 4.0))
        if self.compactify_outer:
            m = (2.0 - 1.0) / ((1.0 / self.R2) - (1.0 / self.R1))
            tt = (1.0 * self.R1 - 2.0 * self.R2) / (self.R1 - self.R2)
            R_out = m / (c - tt)
        else:
            R_out = self.R1 * (2.0 - c) + self.R2 * (c - 1.0)
        q_out = R_out / jnp.sqrt(tanx**2 + tany**2 + 1.0)
        x_out, y_out = tanx, tany

        # --- inner shell: cube-to-sphere blend --------------------------
        p = 2.0 - c
        if self.compactify_inner:
            m = (2.0 - 1.0) / ((1.0 / self.R1) - (1.0 / self.R0))
            tt = (1.0 * self.R0 - 2.0 * self.R1) / (self.R0 - self.R1)
            R_in = m / (c - tt)
        else:
            R_in = self.R0 * (2.0 - c) + self.R1 * (c - 1.0)
        x_in = p * a + (1.0 - p) * tanx
        y_in = p * b + (1.0 - p) * tany
        q_in = R_in / jnp.sqrt(
            1.0 + (1.0 - p) * (tanx**2 + tany**2) + 2.0 * p
        )

        if self.kind == "12tree_hole":
            # holed sphere: the INNER shells are pure angular too (the
            # excision surface r = R0 is a sphere, not a cube)
            R_in2 = self.R0 * (2.0 - c) + self.R1 * (c - 1.0)
            x_in, y_in = tanx, tany
            q_in = R_in2 / jnp.sqrt(tanx**2 + tany**2 + 1.0)

        if self.n_outer:
            is_outer = tree < 6
            xs = jnp.where(is_outer, x_out, x_in)
            ys = jnp.where(is_outer, y_out, y_in)
            qs = jnp.where(is_outer, q_out, q_in)
        else:
            xs, ys, qs = x_in, y_in, q_in

        vec = jnp.stack([qs * xs, qs * ys, qs], axis=-1)
        Q = jnp.asarray(_ORIENT)[tree % 6]  # [..., 3, 3]
        xyz_shell = jnp.einsum("...ij,...j->...i", Q, vec)

        xyz_core = abc * self.Clength
        is_core = (tree == self.core_tree)[..., None]
        return jnp.where(is_core, xyz_core, xyz_shell)
