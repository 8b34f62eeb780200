"""Per-stage timing of the SIPG apply hot path on the current device.

Times each pipeline stage in isolation (jitted, block_until_ready) so we
know where the wall-clock goes before optimizing.  Not a test; a tool.
"""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

import disco4est_tpu  # noqa: F401
from disco4est_tpu.geometry.brick import BrickGeometry
from disco4est_tpu.mesh.tree import Forest
from disco4est_tpu.mesh.builder import build_mesh
from disco4est_tpu.laplacian import sipg
from disco4est_tpu.ops import tensor
from disco4est_tpu.ops.operators import DB


def timeit(fn, *args, iters=20):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters


def main():
    deg = 3
    level = 4
    dtype = jnp.float32
    for a in sys.argv:
        if a.startswith("--deg="):
            deg = int(a.split("=")[1])
        if a.startswith("--level="):
            level = int(a.split("=")[1])
        if a == "--f64":
            dtype = jnp.float64
    geom = BrickGeometry(dim=3)
    forest = Forest.uniform(geom.conn, level)
    mesh = build_mesh(geom, forest, deg=deg)
    leaves, treedef = jax.tree_util.tree_flatten(mesh)
    leaves = [
        l.astype(dtype) if hasattr(l, "dtype") and l.dtype == jnp.float64 else l
        for l in leaves
    ]
    mesh = jax.tree_util.tree_unflatten(treedef, leaves)
    E = mesh.n_elements
    dim, nl, nq = 3, mesh.nl, mesh.nq
    rng = np.random.default_rng(0)
    u = jnp.asarray(rng.standard_normal((E, nl, nl, nl)), dtype)
    print(f"E={E} deg={deg} dtype={dtype.__name__} device={jax.devices()[0]}")

    # full applies
    for mode in ("dense", "tensor"):
        f = jax.jit(lambda m, v, mode=mode: sipg.apply_sipg(m, v, volume_mode=mode))
        print(f"full apply [{mode:6s}]: {timeit(f, mesh, u)*1e6:9.1f} us")

    # volume only
    def vol_dense(m, v):
        Gs = sipg._dense_grad_ops(m.deg, m.deg_quad, m.quad, dim, v.dtype)
        u_flat = v.reshape(E, -1)
        t = [(u_flat @ Gs[l]).reshape(m.j_quad.shape) for l in range(dim)]
        Au = jnp.zeros_like(v)
        wjgg_flat = m.wjgg.astype(v.dtype).reshape(E, dim, dim, -1)
        t_flat = jnp.stack([x.reshape(E, -1) for x in t], 1)
        for lp in range(dim):
            s_flat = jnp.einsum("elq,elq->eq", wjgg_flat[:, lp], t_flat)
            Au = Au + (s_flat @ Gs[lp].T).reshape(v.shape)
        return Au

    print(f"volume dense       : {timeit(jax.jit(vol_dense), mesh, u)*1e6:9.1f} us")

    # face slices + interp only (no gathers)
    def faces_nogather(m, v):
        D = jnp.asarray(DB.ops(m.deg).diff, v.dtype)
        Vq = jnp.asarray(m.quad.interp(m.deg, m.deg_quad), v.dtype)
        dudr = [tensor.apply_axis(D, v, l) for l in range(dim)]
        u_f = sipg._face_slices(v, dim)
        dudr_f = jnp.stack([sipg._face_slices(dudr[l], dim) for l in range(dim)], 2)
        u_m_q = sipg._face_apply(Vq, u_f, dim)
        dudr_m_q = sipg._face_apply(Vq, dudr_f, dim)
        return u_m_q.sum() + dudr_m_q.sum()

    print(f"faces no-gather    : {timeit(jax.jit(faces_nogather), mesh, u)*1e6:9.1f} us")

    # row gather only (no perm)
    nfl_flat = nl ** (dim - 1)

    def row_gather(m, v):
        u_f = sipg._face_slices(v, dim).reshape(E, 2 * dim, nfl_flat)
        flat = u_f.reshape(E * 2 * dim, nfl_flat)
        rows = m.nbr_elem * (2 * dim) + m.nbr_face
        return flat[rows].sum()

    print(f"row gather u only  : {timeit(jax.jit(row_gather), mesh, u)*1e6:9.1f} us")

    # row gather + take_along_axis perm (the round-1 path)
    def row_gather_perm(m, v):
        u_f = sipg._face_slices(v, dim).reshape(E, 2 * dim, nfl_flat)
        up = sipg._gather_nd(u_f[:, :, None], m.nbr_elem, m.nbr_face, m.perm_l)
        return up.sum()

    print(f"row gather + perm  : {timeit(jax.jit(row_gather_perm), mesh, u)*1e6:9.1f} us")

    # the big one: drst gather + perm (dim*dim components)
    nfq_flat = nq ** (dim - 1)

    def drst_gather_perm(m, v):
        drst_p = sipg._gather_nd(
            m.face_drst.astype(v.dtype).reshape(E, 2 * dim, dim, dim, nfq_flat),
            m.nbr_elem,
            m.nbr_face,
            m.perm_q,
        )
        return drst_p.sum() + v.sum()

    print(f"drst gather + perm : {timeit(jax.jit(drst_gather_perm), mesh, u)*1e6:9.1f} us")

    def drst_gather_noperm(m, v):
        flat = m.face_drst.astype(v.dtype).reshape(E * 2 * dim, dim, dim, nfq_flat)
        rows = m.nbr_elem * (2 * dim) + m.nbr_face
        return flat[rows].sum() + v.sum()

    print(f"drst gather no-perm: {timeit(jax.jit(drst_gather_noperm), mesh, u)*1e6:9.1f} us")

    # scatter stage
    def scatter_only(m, v):
        vt = sipg._face_slices(v, dim)
        Au = jnp.zeros_like(v)
        D = jnp.asarray(DB.ops(m.deg).diff, v.dtype)
        for f in range(2 * dim):
            Au = Au + tensor.face_scatter(vt[:, f], f, dim, nl)
            for l in range(dim):
                lifted = tensor.face_scatter(vt[:, f], f, dim, nl)
                Au = Au + tensor.apply_axis(D.T, lifted, l)
        return Au

    print(f"scatter stage      : {timeit(jax.jit(scatter_only), mesh, u)*1e6:9.1f} us")


if __name__ == "__main__":
    main()
