"""Benchmark: matrix-free SIPG operator apply throughput (DOF/s per chip).

The north-star metric from BASELINE.json: "DOF/s per chip for matrix-free
SIPG operator apply", target ≥60% of per-chip roofline.  The reference
repo records no absolute numbers (its timing harness
`Tests/Unit/d4est_test_laplacian_speedup.c` prints but never persists), so
`vs_baseline` reports achieved/target-roofline-fraction: ≥1.0 means the
60%-of-roofline goal is met.

Prints ONE JSON line:
  {"metric": "...", "value": N, "unit": "DOF/s", "vs_baseline": N}
"""

import json
import os
import sys
import time

os.environ.setdefault("DISCO4EST_JAX_CACHE", os.path.expanduser("~/.cache/disco4est_jax"))

import jax
import jax.numpy as jnp
import numpy as np

import disco4est_tpu  # noqa: F401  (enables x64 + compile cache)
from disco4est_tpu.geometry.brick import BrickGeometry
from disco4est_tpu.mesh.tree import Forest
from disco4est_tpu.mesh.builder import build_mesh
from disco4est_tpu.laplacian.sipg import apply_sipg


def flops_per_apply(E, dim, nl, nq):
    """Model FLOP count of one SIPG apply (volume path dominates).

    Volume: dim interps of dudr to quad (each dim axes × 2·nq·nl per
    line), dim gradient applies, dim² pointwise triples, dim back-interps,
    dim Dᵀ applies.  Face terms are O(surface) and ignored (<10% at p≥3).
    """
    vol_l = nl**dim
    vol_q = nq**dim
    # 1D tensor apply along one axis of an n^dim block: 2·n_out·n_in·n^(dim-1)
    interp = dim * 2 * nq * nl * max(nl, nq) ** (dim - 1)
    deriv = dim * 2 * nl * nl * nl ** (dim - 1)
    pointwise = (dim * dim + dim) * vol_q * 2
    per_elem = deriv + dim * interp + pointwise + dim * interp + deriv
    return E * per_elem


def main():
    dtype = jnp.float32 if "--f32" in sys.argv or _on_tpu() else jnp.float64
    deg = 3
    level = 4  # 16^3 = 4096 elements
    for a in sys.argv:
        if a.startswith("--level="):
            level = int(a.split("=")[1])
        if a.startswith("--deg="):
            deg = int(a.split("=")[1])
    geom = BrickGeometry(dim=3)
    forest = Forest.uniform(geom.conn, level)
    mesh = build_mesh(geom, forest, deg=deg)
    E = mesh.n_elements
    dof = mesh.local_nodes

    mode = "dense" if "--dense" in sys.argv or (deg <= 4 and _on_tpu()) else "tensor"
    apply_jit = jax.jit(
        lambda m, v: apply_sipg(m, v, volume_mode=mode)
    )
    rng = np.random.default_rng(0)
    u = jnp.asarray(
        rng.standard_normal((E,) + (mesh.nl,) * 3), dtype
    )
    if dtype == jnp.float32:
        import dataclasses

        leaves, treedef = jax.tree_util.tree_flatten(mesh)
        leaves = [
            l.astype(dtype)
            if hasattr(l, "dtype") and l.dtype == jnp.float64
            else l
            for l in leaves
        ]
        mesh = jax.tree_util.tree_unflatten(treedef, leaves)

    # warmup / compile
    apply_jit(mesh, u).block_until_ready()

    iters = 30
    t0 = time.perf_counter()
    v = u
    for _ in range(iters):
        v = apply_jit(mesh, v)
    v.block_until_ready()
    dt = (time.perf_counter() - t0) / iters

    dof_per_s = dof / dt
    flops = flops_per_apply(E, 3, mesh.nl, mesh.nq)
    achieved_tflops = flops / dt / 1e12
    peak = _peak_tflops(dtype)
    frac = achieved_tflops / peak
    vs_baseline = frac / 0.60  # ≥1.0 ⇔ ≥60% of roofline target met

    print(
        json.dumps(
            {
                "metric": "sipg_apply_dof_per_s",
                "value": dof_per_s,
                "unit": "DOF/s",
                "vs_baseline": vs_baseline,
                "detail": {
                    "elements": E,
                    "deg": deg,
                    "dof": dof,
                    "seconds_per_apply": dt,
                    "model_tflops_per_s": achieved_tflops,
                    "assumed_peak_tflops": peak,
                    "dtype": str(dtype.__name__ if hasattr(dtype, "__name__") else dtype),
                    "volume_mode": mode,
                    "device": str(jax.devices()[0]),
                },
            }
        )
    )


def _on_tpu():
    try:
        return jax.devices()[0].platform not in ("cpu",)
    except Exception:
        return False


def _peak_tflops(dtype):
    d = jax.devices()[0]
    if d.platform == "cpu":
        return 0.1  # rough per-core-ish CPU estimate; CI smoke only
    # TPU v5e: ~197 TFLOP/s bf16, ~98 fp32-ish via MXU passes
    return 98.0 if dtype == jnp.float32 else 10.0


if __name__ == "__main__":
    main()
