"""Time the fused Pallas SIPG apply vs the XLA fast path on TPU."""

import os, sys, time

os.environ.setdefault(
    "DISCO4EST_JAX_CACHE", os.path.expanduser("~/.cache/disco4est_jax")
)

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import disco4est_tpu  # noqa: F401
from disco4est_tpu.geometry.brick import BrickGeometry
from disco4est_tpu.mesh.tree import Forest
from disco4est_tpu.mesh.builder import build_mesh
from disco4est_tpu.laplacian.fast import apply_sipg_fast
from disco4est_tpu.laplacian.pallas_sipg import apply_sipg_pallas

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from bench import to_dtype, timeit_calibrated, round_trip


def main():
    level = int(os.environ.get("LEVEL", "4"))
    deg = int(os.environ.get("DEG", "7"))
    inner = int(os.environ.get("INNER", "256"))
    geom = BrickGeometry(dim=3)
    forest = Forest.uniform(geom.conn, level)
    mesh = to_dtype(
        build_mesh(geom, forest, deg=deg, store_full=False), jnp.float32
    )
    E = mesh.n_elements
    rng = np.random.default_rng(0)
    u = jnp.asarray(rng.standard_normal((E,) + (deg + 1,) * 3), jnp.float32)

    # correctness on-device (bf16 matmuls vs XLA default = also bf16)
    ref = apply_sipg_fast(mesh, u)
    out = apply_sipg_pallas(mesh, u)
    err = float(jnp.max(jnp.abs(out - ref)) / jnp.max(jnp.abs(ref)))
    print(f"rel err pallas(bf16) vs xla(default): {err:.3e}")

    def chain(fn):
        @jax.jit
        def c(m, v):
            return jax.lax.fori_loop(0, inner, lambda i, w: fn(m, w), v)
        return c

    for name, fn in [
        ("xla_fast", lambda m, v: apply_sipg_fast(m, v)),
        ("pallas_bf16", lambda m, v: apply_sipg_pallas(m, v, precision="bf16")),
        ("pallas_f32", lambda m, v: apply_sipg_pallas(m, v, precision="f32")),
    ]:
        dt = timeit_calibrated(chain(fn), mesh, u) / inner
        dof = E * (deg + 1) ** 3
        print(f"{name:12s}: {dt*1e6:8.1f} us/apply   {dof/dt/1e9:7.2f} GDOF/s")


if __name__ == "__main__":
    main()


def phases():
    level = int(os.environ.get("LEVEL", "4"))
    deg = int(os.environ.get("DEG", "7"))
    inner = int(os.environ.get("INNER", "256"))
    geom = BrickGeometry(dim=3)
    forest = Forest.uniform(geom.conn, level)
    mesh = to_dtype(
        build_mesh(geom, forest, deg=deg, store_full=False), jnp.float32
    )
    E = mesh.n_elements
    rng = np.random.default_rng(0)
    u = jnp.asarray(rng.standard_normal((E,) + (deg + 1,) * 3), jnp.float32)
    from disco4est_tpu.laplacian import pallas_sipg as P

    nfaces = 6
    nfl = (deg + 1) ** 2

    def phase_a(m, v):
        tr = P.compute_traces(m, v).astype(jnp.bfloat16)
        rows = (m.nbr_elem * nfaces + m.nbr_face).reshape(-1)
        return tr[rows]

    @jax.jit
    def chain_a(m, v):
        def body(i, w):
            g = phase_a(m, w)
            return w * (1.0 + 1e-30 * jnp.sum(g.astype(jnp.float32)))
        return jax.lax.fori_loop(0, inner, body, v)

    dt = timeit_calibrated(chain_a, mesh, u) / inner
    print(f"phaseA+gather: {dt*1e6:8.1f} us")

    def phase_a_only(m, v):
        return P.compute_traces(m, v).astype(jnp.bfloat16)

    @jax.jit
    def chain_a0(m, v):
        def body(i, w):
            g = phase_a_only(m, w)
            return w * (1.0 + 1e-30 * jnp.sum(g.astype(jnp.float32)))
        return jax.lax.fori_loop(0, inner, body, v)

    dt = timeit_calibrated(chain_a0, mesh, u) / inner
    print(f"phaseA only  : {dt*1e6:8.1f} us")


if __name__ == "__main__" and os.environ.get("PHASES"):
    phases()


def structured():
    from disco4est_tpu.laplacian.structured import (
        build_structured, apply_structured, to_lex,
    )

    level = int(os.environ.get("LEVEL", "4"))
    deg = int(os.environ.get("DEG", "7"))
    inner = int(os.environ.get("INNER", "256"))
    geom = BrickGeometry(dim=3)
    forest = Forest.uniform(geom.conn, level)
    mesh = to_dtype(
        build_mesh(geom, forest, deg=deg, store_full=False), jnp.float32
    )
    sb = build_structured(mesh)
    assert sb is not None, "structured path unavailable"
    E = mesh.n_elements
    rng = np.random.default_rng(0)
    u = jnp.asarray(rng.standard_normal((E, (deg + 1) ** 3)), jnp.float32)
    u_lex = to_lex(sb, u)

    ref = apply_sipg_fast(mesh, u.reshape((E,) + (deg + 1,) * 3))
    from disco4est_tpu.laplacian.structured import from_lex
    out = from_lex(sb, apply_structured(sb, u_lex))
    err = float(
        jnp.max(jnp.abs(out - ref.reshape(E, -1)))
        / jnp.max(jnp.abs(ref))
    )
    print(f"structured rel err vs xla: {err:.3e}")

    @jax.jit
    def chain(s, v):
        return jax.lax.fori_loop(
            0, inner, lambda i, w: apply_structured(s, w), v
        )

    dt = timeit_calibrated(chain, sb, u_lex) / inner
    dof = E * (deg + 1) ** 3
    print(f"structured  : {dt*1e6:8.1f} us/apply   {dof/dt/1e9:7.2f} GDOF/s")


if __name__ == "__main__" and os.environ.get("STRUCT"):
    structured()
