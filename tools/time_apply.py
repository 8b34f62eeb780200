"""Quick wall-clock of the SIPG apply on the current device.

Times both single-dispatch and fori_loop-amortized applies (the tunnel to
the TPU adds ~1.3 ms per dispatch; production solvers run many applies per
compiled program, so the amortized number is the honest one).
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
from disco4est_tpu.laplacian.sipg import apply_sipg


def to_dtype(mesh, dtype):
    leaves, treedef = jax.tree_util.tree_flatten(mesh)
    leaves = [
        l.astype(dtype) if hasattr(l, "dtype") and l.dtype == jnp.float64 else l
        for l in leaves
    ]
    return jax.tree_util.tree_unflatten(treedef, leaves)


def run(level, deg, dtype, store_full, mode, inner=30, outer=5):
    geom = BrickGeometry(dim=3)
    forest = Forest.uniform(geom.conn, level)
    mesh = to_dtype(
        build_mesh(geom, forest, deg=deg, store_full=store_full), dtype
    )
    E = mesh.n_elements
    rng = np.random.default_rng(0)
    u = jnp.asarray(rng.standard_normal((E,) + (mesh.nl,) * 3), dtype)

    @jax.jit
    def chain(m, v):
        return jax.lax.fori_loop(
            0, inner, lambda i, w: apply_sipg(m, w, volume_mode=mode), v
        )

    chain(mesh, u).block_until_ready()
    t0 = time.perf_counter()
    for _ in range(outer):
        u = chain(mesh, u)
    u.block_until_ready()
    dt = (time.perf_counter() - t0) / (outer * inner)

    single = jax.jit(lambda m, v: apply_sipg(m, v, volume_mode=mode))
    single(mesh, u).block_until_ready()
    t0 = time.perf_counter()
    for _ in range(10):
        u = single(mesh, u)
    u.block_until_ready()
    dt1 = (time.perf_counter() - t0) / 10

    dof = E * mesh.nl**3
    print(
        f"L{level} deg={deg} E={E:6d} {np.dtype(dtype).name:8s} "
        f"full={str(store_full):5s} {mode:6s}: "
        f"amortized {dt*1e6:9.1f} us ({dof/dt/1e6:9.1f} MDOF/s)  "
        f"single {dt1*1e6:9.1f} us"
    )


if __name__ == "__main__":
    f32 = jnp.float32
    run(4, 3, f32, True, "dense")
    run(4, 3, f32, False, "dense")
    run(4, 3, f32, False, "tensor")
    run(3, 7, f32, False, "tensor")
    run(4, 7, f32, False, "tensor")
    run(4, 7, f32, False, "dense")
