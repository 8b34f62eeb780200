"""Physical-space derivatives of nodal fields: gradient and Hessian.

Role of the reference's `dGMath/d4est_gradient.c` and
`dGMath/d4est_hessian.c` (∇u and Hessian/trace on quadrature points, with
analytic-or-numerical D2X).  Here second-geometry terms come from
autodiff of the geometry map (d²x/dr² via `jax.jacfwd` of `geom.dx`), so
curved geometries need no hand-written D2X.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from disco4est_tpu.mesh.builder import MeshData, ROOT
from disco4est_tpu.ops import tensor
from disco4est_tpu.ops.operators import DB


def gradient(mesh: MeshData, u, on_quad: bool = True):
    """∇u in physical coords: [E, dim, (nq|nl)...]
    (`d4est_gradient.h:12-14`)."""
    dim, deg = mesh.dim, mesh.deg
    dtype = u.dtype
    D = jnp.asarray(DB.ops(deg).diff, dtype)
    dudr = tensor.grad(D, u, dim)  # [dim(l), E, nl...]
    if on_quad:
        Vq = jnp.asarray(mesh.quad.interp(deg, mesh.deg_quad), dtype)
        dudr_q = jnp.stack(
            [tensor.apply_iso(Vq, dudr[l], dim) for l in range(dim)]
        )
        # drdx at volume quad points comes fused inside wjgg; recompute
        # the raw drdx from the stored face-independent quantities is not
        # stored — use the geometry directly:
        drdx = _volume_drdx(mesh)  # [E, l, d, nq...]
        return jnp.einsum("eld...,le...->ed...", drdx.astype(dtype), dudr_q)
    raise NotImplementedError("gradient on Lobatto nodes: use on_quad=True")


def hessian_trace(mesh: MeshData, u):
    """Δu at volume quadrature points [E, nq...]
    (`d4est_hessian.c` HESSIAN_ANALYTICAL role via autodiff geometry):

    Δu = Σ_d [ Σ_l ∂r_l/∂x_d · ∂/∂r_l ( Σ_m ∂r_m/∂x_d · ∂u/∂r_m ) ]
    computed as nested reference-space derivative applies with the
    (autodiff) inverse-Jacobian fields.
    """
    dim, deg = mesh.dim, mesh.deg
    dtype = u.dtype
    D = jnp.asarray(DB.ops(deg).diff, dtype)
    Vq = jnp.asarray(mesh.quad.interp(deg, mesh.deg_quad), dtype)
    drdx_l = _volume_drdx_lobatto(mesh).astype(dtype)  # [E, l, d, nl...]

    dudr = tensor.grad(D, u, dim)  # [l, E, nl...]
    out = None
    for d in range(dim):
        # v_d = Σ_m drdx[m,d] du/dr_m  (on Lobatto nodes)
        v = sum(drdx_l[:, m, d] * dudr[m] for m in range(dim))
        # w_d = Σ_l drdx[l,d] dv/dr_l
        dvdr = tensor.grad(D, v, dim)
        w = sum(drdx_l[:, l, d] * dvdr[l] for l in range(dim))
        out = w if out is None else out + w
    return tensor.apply_iso(Vq, out, dim)


def _volume_drdx(mesh: MeshData):
    """∂r/∂x at volume quadrature points [E, l, d, nq...] (recomputed from
    geometry; factor arrays store only the fused wjgg)."""
    from disco4est_tpu.mesh.builder import (
        _factors,
        _tensor_points,
    )

    forest = mesh.forest
    import numpy as np

    xq, _ = mesh.quad.nodes_weights(mesh.deg_quad)
    pts = _tensor_points(xq, mesh.dim)
    fac = _factors(
        mesh.geom,
        jnp.asarray(forest.tree, jnp.int32),
        jnp.asarray(forest.anchor, jnp.float64) / ROOT,
        jnp.asarray(2.0 ** -forest.level.astype(np.float64)),
        pts,
    )
    return jnp.moveaxis(jnp.moveaxis(fac["drdx"], -1, 1), -1, 1)


def _volume_drdx_lobatto(mesh: MeshData):
    from disco4est_tpu.mesh.builder import _factors, _tensor_points
    import numpy as np

    forest = mesh.forest
    xl = DB.ops(mesh.deg).lobatto_nodes
    pts = _tensor_points(xl, mesh.dim)
    fac = _factors(
        mesh.geom,
        jnp.asarray(forest.tree, jnp.int32),
        jnp.asarray(forest.anchor, jnp.float64) / ROOT,
        jnp.asarray(2.0 ** -forest.level.astype(np.float64)),
        pts,
    )
    return jnp.moveaxis(jnp.moveaxis(fac["drdx"], -1, 1), -1, 1)
