"""Ablation timing: volume-only vs faces-no-gather vs full apply."""

import time

import jax
import jax.numpy as jnp
import numpy as np

import disco4est_tpu  # noqa: F401
from disco4est_tpu.geometry.brick import BrickGeometry
from disco4est_tpu.mesh.tree import Forest
from disco4est_tpu.mesh.builder import build_mesh
from disco4est_tpu.laplacian.sipg import apply_sipg
from disco4est_tpu.ops import tensor
from disco4est_tpu.ops.operators import DB


def to_dtype(mesh, dtype):
    leaves, treedef = jax.tree_util.tree_flatten(mesh)
    leaves = [
        l.astype(dtype) if hasattr(l, "dtype") and l.dtype == jnp.float64 else l
        for l in leaves
    ]
    return jax.tree_util.tree_unflatten(treedef, leaves)


def volume_only(mesh, u, mode):
    dim = mesh.dim
    dtype = u.dtype
    D = jnp.asarray(DB.ops(mesh.deg).diff, dtype)
    Vq = jnp.asarray(mesh.quad.interp(mesh.deg, mesh.deg_quad), dtype)
    _, wq1 = mesh.quad.nodes_weights(mesh.deg_quad)
    w3 = tensor.tensor_weights([wq1] * dim, dtype=dtype)
    dudr = [tensor.apply_axis(D, u, l) for l in range(dim)]
    t = [tensor.apply_iso(Vq, dudr[l], dim) for l in range(dim)]
    Au = jnp.zeros_like(u)
    E = u.shape[0]
    cshape = (E,) + (1,) * dim
    for lp in range(dim):
        s = jnp.zeros_like(t[0])
        for l in range(dim):
            c = mesh.wjgg_c[:, lp, l].astype(dtype).reshape(cshape)
            s = s + c * (w3 * t[l])
        s = tensor.apply_iso(Vq.T, s, dim)
        Au = Au + tensor.apply_axis(D.T, s, lp)
    return Au


def timeit_chain(fn, mesh, u, inner=30, outer=5):
    @jax.jit
    def chain(m, v):
        return jax.lax.fori_loop(0, inner, lambda i, w: fn(m, w), v)

    chain(mesh, u).block_until_ready()
    t0 = time.perf_counter()
    v = u
    for _ in range(outer):
        v = chain(mesh, v)
    v.block_until_ready()
    return (time.perf_counter() - t0) / (outer * inner)


def main():
    for level, deg in ((4, 3), (4, 7)):
        geom = BrickGeometry(dim=3)
        forest = Forest.uniform(geom.conn, level)
        mesh = to_dtype(
            build_mesh(geom, forest, deg=deg, store_full=False), jnp.float32
        )
        E = mesh.n_elements
        rng = np.random.default_rng(0)
        u = jnp.asarray(rng.standard_normal((E,) + (mesh.nl,) * 3), jnp.float32)
        t_vol = timeit_chain(lambda m, v: volume_only(m, v, "tensor"), mesh, u)
        t_zero = timeit_chain(
            lambda m, v: apply_sipg(m, v, neighbors="zero", volume_mode="tensor"),
            mesh, u,
        )
        t_full = timeit_chain(
            lambda m, v: apply_sipg(m, v, volume_mode="tensor"), mesh, u
        )
        print(
            f"L{level} deg={deg} E={E}: volume {t_vol*1e6:8.1f} us | "
            f"no-gather {t_zero*1e6:8.1f} us | full {t_full*1e6:8.1f} us"
        )


if __name__ == "__main__":
    main()
