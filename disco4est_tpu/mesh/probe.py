"""Point interpolation probe.

Role of the reference's `d4est_mesh_interpolate_at_tree_coord`
(`Mesh/d4est_mesh.h:208`, used by the TwoPunctures drivers' point
monitors): evaluate a nodal DG field at an arbitrary physical point by
locating the containing element, inverting its geometry map (Newton with
autodiff Jacobians), and evaluating the Lagrange tensor basis there.
Host-side (probes run a handful of times per AMR level).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from disco4est_tpu.mesh.builder import MeshData, ROOT
from disco4est_tpu.ops.operators import DB


def _tree_coords_of(mesh: MeshData, e: int):
    forest = mesh.forest
    a = np.asarray(forest.anchor[e], np.float64) / ROOT
    h = float(2.0 ** -float(forest.level[e]))
    return int(forest.tree[e]), a, h


def _xmap(mesh: MeshData, e: int):
    geom = mesh.geom
    tree, a, h = _tree_coords_of(mesh, e)

    def X(r):  # r in [0,1]^dim (element-local)
        return geom.x(tree, jnp.asarray(a) + h * jnp.asarray(r))

    return X


def locate_point(mesh: MeshData, xyz, tol: float = 1e-10):
    """Find (element, local coords r in [0,1]^dim) containing `xyz`.

    Scans elements by nodal bounding box, then Newton-inverts the
    geometry map.  Returns the first element whose inversion lands in
    [0,1]^dim (boundary-inclusive within `tol`)."""
    xyz = np.asarray(xyz, np.float64)
    dim = mesh.dim
    E = mesh.n_elements
    nodes = np.asarray(mesh.xyz_lobatto).reshape(E, dim, -1)
    lo = nodes.min(-1) - 1e-9
    hi = nodes.max(-1) + 1e-9
    # curved elements can bulge past the nodal hull: inflate by 10%
    mid, half = 0.5 * (lo + hi), 0.5 * (hi - lo)
    cand = np.nonzero(
        np.all((xyz >= mid - 1.3 * half) & (xyz <= mid + 1.3 * half), axis=1)
    )[0]
    best = None
    for e in cand:
        X = _xmap(mesh, int(e))
        Xj = jax.jacobian(lambda r: X(r))
        r = np.full(dim, 0.5)
        ok = False
        for _ in range(60):
            F = np.asarray(X(jnp.asarray(r))) - xyz
            if np.abs(F).max() < 1e-12 * max(1.0, np.abs(xyz).max()):
                ok = True
                break
            J = np.asarray(Xj(jnp.asarray(r)))
            try:
                dr = np.linalg.solve(J, F)
            except np.linalg.LinAlgError:
                break
            r = np.clip(r - dr, -0.5, 1.5)
        if not ok:
            continue
        inside = np.all(r >= -tol) and np.all(r <= 1 + tol)
        dist = float(np.maximum(r - 1, 0).max() + np.maximum(-r, 0).max())
        if inside:
            return int(e), np.clip(r, 0.0, 1.0)
        if best is None or dist < best[2]:
            best = (int(e), np.clip(r, 0.0, 1.0), dist)
    if best is not None and best[2] < 1e-6:
        return best[0], best[1]
    raise ValueError(f"point {xyz} not found in mesh")


def interpolate_at_point(mesh: MeshData, u, xyz, element: int | None = None):
    """Evaluate nodal field `u` [E, nl...] at physical point `xyz`.
    Pass `element` to force evaluation from a specific element's side
    (DG fields jump across faces)."""
    if element is None:
        e, r = locate_point(mesh, xyz)
    else:
        e = element
        X = _xmap(mesh, e)
        Xj = jax.jacobian(lambda rr: X(rr))
        r = np.full(mesh.dim, 0.5)
        for _ in range(60):
            F = np.asarray(X(jnp.asarray(r))) - np.asarray(xyz)
            if np.abs(F).max() < 1e-12 * max(1.0, np.abs(xyz).max()):
                break
            r = r - np.linalg.solve(np.asarray(Xj(jnp.asarray(r))), F)
    # Lagrange basis at local coords (map [0,1] -> [-1,1])
    xi = 2.0 * np.asarray(r) - 1.0
    nodes = np.asarray(DB.ops(mesh.deg).lobatto_nodes)
    nl = mesh.deg + 1

    def lag(x):
        vals = np.empty(nl)
        for i in range(nl):
            p = 1.0
            for j in range(nl):
                if j != i:
                    p *= (x - nodes[j]) / (nodes[i] - nodes[j])
            vals[i] = p
        return vals

    basis = [lag(xi[d]) for d in range(mesh.dim)]
    w = basis[mesh.dim - 1]
    for d in range(mesh.dim - 2, -1, -1):
        w = np.kron(w, basis[d])  # x fastest
    ue = np.asarray(u).reshape(mesh.n_elements, -1)[e]
    return float(ue @ w), e
