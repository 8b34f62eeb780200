"""Geometry and connectivity validation.

The strongest check available without p4est: for every connected tree-face
pair, points on the shared face transformed through our connectivity
encoding must land on the SAME physical points through both trees' maps.
Run for multi-tree brick, 7-tree and 13-tree cubed spheres (the reference
geometries of `d4est_geometry_cubed_sphere.c`), including compactified
shells.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from disco4est_tpu.geometry.brick import BrickGeometry
from disco4est_tpu.geometry.cubed_sphere import CubedSphereGeometry


def _face_points(face, n=5, rng=None):
    """Points on tree face `face` in [0,1]^3 coords."""
    rng = rng or np.random.default_rng(0)
    a0, side = divmod(face, 2)
    pts = rng.uniform(0.05, 0.95, size=(n, 3))
    pts[:, a0] = float(side)
    return pts


def _transform(conn, t, f, pts):
    """Continuous version of the face transform in mesh.tree
    `_canonicalize_points`: wrap the normal coord, then per-axis
    flip+permute."""
    a0, side = divmod(f, 2)
    amap = conn.axis_map[t, f]
    aflip = conn.axis_flip[t, f]
    p = pts.copy()
    p[:, a0] += -1.0 if side == 1 else 1.0
    out = np.empty_like(p)
    for a in range(3):
        v = p[:, a]
        out[:, int(amap[a])] = np.where(aflip[a] == 1, 1.0 - v, v)
    return out


def _check_geometry(geom, atol=1e-11):
    conn = geom.conn
    n_bad = 0
    for t in range(conn.n_trees):
        for f in range(6):
            nt = int(conn.nbr_tree[t, f])
            if nt < 0:
                continue
            pts = _face_points(f)
            pts_nbr = _transform(conn, t, f, pts)
            assert pts_nbr.min() > -1e-12 and pts_nbr.max() < 1 + 1e-12, (
                t, f, pts_nbr,
            )
            xa = np.asarray(geom.x(jnp.full(len(pts), t), jnp.asarray(pts)))
            xb = np.asarray(
                geom.x(jnp.full(len(pts), nt), jnp.asarray(pts_nbr))
            )
            err = np.max(np.abs(xa - xb))
            assert err < atol, (t, f, nt, err)


def test_brick_connectivity():
    _check_geometry(BrickGeometry(dim=3, n_trees_per_dim=(2, 2, 2)))


def test_sphere7_connectivity():
    _check_geometry(CubedSphereGeometry("7tree", R0=1.0, R1=2.0))


def test_sphere13_connectivity():
    _check_geometry(CubedSphereGeometry("13tree", R0=1.0, R1=2.0, R2=3.0))


def test_sphere13_compactified_connectivity():
    _check_geometry(
        CubedSphereGeometry(
            "13tree", R0=1.0, R1=2.0, R2=3.0, compactify_outer_shell=True
        )
    )


def test_sphere_radii():
    geom = CubedSphereGeometry("13tree", R0=1.0, R1=2.0, R2=3.0)
    # outer surface of outer shell (tree 0, c=2 i.e. rst z=1) has |x| = R2
    pts = _face_points(5)  # z+ face
    x = np.asarray(geom.x(jnp.zeros(len(pts), int), jnp.asarray(pts)))
    r = np.linalg.norm(x, axis=1)
    assert np.allclose(r, 3.0, atol=1e-12)
    # core cube has half-width R0/sqrt(3)
    core = geom.core_tree
    corner = np.asarray(
        geom.x(jnp.asarray([core]), jnp.asarray([[1.0, 1.0, 1.0]]))
    )
    assert np.allclose(corner, geom.Clength, atol=1e-12)
    # inner shell: outer boundary (c=2) is the sphere of radius R1; inner
    # boundary (c=1) is the CUBE face at distance Clength (the blend runs
    # cube -> sphere).
    t_in = 6
    x1 = np.asarray(geom.x(jnp.full(5, t_in), jnp.asarray(_face_points(5))))
    assert np.allclose(np.linalg.norm(x1, axis=1), 2.0, atol=1e-12)
    x0 = np.asarray(geom.x(jnp.full(5, t_in), jnp.asarray(_face_points(4))))
    # tree 6 is case 0 (front): the flat cube face is y = -Clength
    assert np.allclose(x0[:, 1], -geom.Clength, atol=1e-12)


def test_jacobian_positive():
    """Autodiff Jacobian determinant must be positive everywhere (valid
    orientation) for all trees of both spheres."""
    import jax

    for geom in (
        CubedSphereGeometry("7tree"),
        CubedSphereGeometry("13tree"),
    ):
        rng = np.random.default_rng(1)
        for t in range(geom.conn.n_trees):
            pts = jnp.asarray(rng.uniform(0.05, 0.95, (10, 3)))
            J = geom.dx(jnp.full(10, t), pts)
            det = np.asarray(jnp.linalg.det(J))
            assert (det > 0).all(), (t, det)


def test_trap_and_pizza_maps():
    """Trapezoid corner map + pizza-half boundary surfaces
    (`d4est_geometry_trap.c:10-15`, `d4est_geometry_pizza_half.c:104-125`)."""
    from disco4est_tpu.geometry.misc import PizzaHalfGeometry, TrapGeometry

    trap = TrapGeometry()
    corners = jnp.asarray(
        [[0.0, 0.0], [1.0, 0.0], [0.0, 1.0], [1.0, 1.0]]
    )
    x = np.asarray(trap.x(0, corners))
    assert np.allclose(x, trap.VERTS, atol=1e-14)
    # interior bilinear: y(r,s) = -r/2 + s + r*s
    mid = np.asarray(trap.x(0, jnp.asarray([[0.5, 0.5]])))[0]
    assert np.allclose(mid, [0.5, -0.25 + 0.5 + 0.25], atol=1e-14)

    R0, R1 = 0.5, 1.3
    pz = PizzaHalfGeometry(R0=R0, R1=R1)
    ys = np.linspace(0.0, 1.0, 7)
    inner = np.asarray(pz.x(0, jnp.stack([0 * ys, ys], axis=-1)))
    assert np.allclose(inner[:, 0], 0.0, atol=1e-14)  # vertical chord x=0
    outer = np.asarray(pz.x(0, jnp.stack([0 * ys + 1, ys], axis=-1)))
    r = np.hypot(outer[:, 0] + R0 / np.sqrt(2.0), outer[:, 1])
    assert np.allclose(r, R1, atol=1e-12)  # arc centred at (-R0/√2, 0)


def test_hole_in_a_box():
    """12-tree box-with-spherical-hole: face continuity, surfaces,
    orientation (`d4est_geometry_hole_in_a_box.c:128-199`)."""
    from disco4est_tpu.geometry.misc import HoleInABoxGeometry

    geom = HoleInABoxGeometry(inner_radius=1.0, box_length=10.0)
    _check_geometry(geom)
    # inner boundary (trees 6-11, c=1): sphere of radius inner_radius/√3
    pts = _face_points(4)
    x = np.asarray(geom.x(jnp.full(len(pts), 7), jnp.asarray(pts)))
    assert np.allclose(np.linalg.norm(x, axis=1), 1.0 / np.sqrt(3.0),
                       atol=1e-12)
    # outer boundary (trees 0-5, c=2): box face at box_length/2
    x = np.asarray(geom.x(jnp.full(len(pts), 3), jnp.asarray(_face_points(5))))
    assert np.allclose(np.abs(x).max(axis=1), 5.0, atol=1e-12)
    # positive orientation everywhere
    rng = np.random.default_rng(2)
    for t in range(12):
        p = jnp.asarray(rng.uniform(0.05, 0.95, (8, 3)))
        det = np.asarray(jnp.linalg.det(geom.dx(jnp.full(8, t), p)))
        assert (det > 0).all(), (t, det)
