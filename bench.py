"""Benchmark: matrix-free SIPG operator apply throughput (DOF/s per chip).

North-star metric from BASELINE.json: "DOF/s per chip for matrix-free SIPG
operator apply", target >=60% of per-chip ROOFLINE.  The SIPG apply is a
low-arithmetic-intensity operator (even with compact affine factors its
useful-FLOP intensity is ~10-20 FLOP/byte at deg 7, far below the ~120
FLOP/byte MXU ridge of a TPU v5e), so the correct roofline is
min(peak_flops, HBM_BW * intensity) — judging a bandwidth-bound kernel
against the raw FLOP peak would make 60% unreachable by physics, not by
engineering.  Both fractions are reported in `detail`.

Methodology:
- `model_flops` counts USEFUL flops (the separable tensor-product apply,
  same count the reference's Kron kernels would execute), independent of
  the implementation's actual flops.
- `min_bytes` is the information-theoretic floor per apply: read u, write
  Au, read compact factors, write + gather-read the inter-element traces
  (u and normal derivative per face point).  Intermediates that a
  perfectly fused implementation would keep on-chip are NOT counted.
- peak FLOP/s is MEASURED on-device with a large GEMM in the bench dtype
  (honest for the tunnel/chip actually in use); HBM bandwidth is measured
  with a large copy.
- timing is dispatch-amortized: many chained applies inside one jitted
  fori_loop (production Krylov/MG loops run many applies per dispatch),
  and synchronization is a scalar DEVICE-TO-HOST TRANSFER of the result:
  on the tunneled TPU runtime used here, block_until_ready() returns
  before remote execution completes and naive timings read 100x too
  fast — only materializing a value is a true barrier.

Prints ONE JSON line:
  {"metric": "...", "value": N, "unit": "DOF/s", "vs_baseline": N}
where vs_baseline = model_flop_rate / (0.60 * roofline)   (>=1 == target).
"""

import json
import os
import sys
import time

os.environ.setdefault(
    "DISCO4EST_JAX_CACHE", os.path.expanduser("~/.cache/disco4est_jax")
)

import jax
import jax.numpy as jnp
import numpy as np

import disco4est_tpu  # noqa: F401  (enables x64 + compile cache)
from disco4est_tpu.geometry.brick import BrickGeometry
from disco4est_tpu.mesh.tree import Forest
from disco4est_tpu.mesh.builder import build_mesh
from disco4est_tpu.laplacian.sipg import apply_sipg


def model_flops_per_apply(E, dim, nl, nq):
    """Useful FLOPs of one SIPG apply (separable tensor-product count)."""
    vol_q = nq**dim
    interp = dim * 2 * nq * nl * max(nl, nq) ** (dim - 1)
    deriv = dim * 2 * nl * nl * nl ** (dim - 1)
    pointwise = (dim * dim + dim) * vol_q * 2
    per_elem = deriv + dim * interp + pointwise + dim * interp + deriv
    # face sweep: interp traces to quad + terms + lift (2d faces)
    nf = 2 * dim
    face_interp = nf * (dim - 1) * 2 * nq * nl * max(nl, nq) ** (dim - 2) * 4
    face_terms = nf * (nq ** (dim - 1)) * 2 * (2 * dim + 6)
    per_elem += face_interp + face_terms
    return E * per_elem


def min_bytes_per_apply(E, dim, nl, nq, itemsize):
    """Minimal HBM traffic of one apply with perfect on-chip fusion."""
    nf = 2 * dim
    vol = nl**dim
    trace = nf * (nl ** (dim - 1) + nq ** (dim - 1))  # u_f + dn per face
    factors = dim * dim + nf * (dim + 2) + nf  # wjgg_c, n/sj/sigma, misc
    per_elem = 2 * vol + 2 * trace + factors  # u r, Au w, T w, T_p r
    return E * per_elem * itemsize


def to_dtype(tree_, dtype):
    leaves, treedef = jax.tree_util.tree_flatten(tree_)
    leaves = [
        l.astype(dtype)
        if hasattr(l, "dtype") and l.dtype in (jnp.float64, jnp.float32)
        else l
        for l in leaves
    ]
    return jax.tree_util.tree_unflatten(treedef, leaves)


def sync(x):
    """TRUE device barrier: materialize a scalar on the host.  On the
    tunneled runtime block_until_ready() is not a reliable barrier."""
    return float(jnp.sum(x).astype(jnp.float32))


def measure_gemm_peak(dtype, n=4096, iters=64):
    """Measured dense-GEMM FLOP/s on this device in `dtype`.

    The timed input EVOLVES between calls (x = chain(x, b)) so no layer
    can serve a cached result, and timing brackets a scalar transfer."""
    rng = np.random.default_rng(0)
    # spectral norm ~1 so iterated products neither overflow nor denorm
    a = jnp.asarray(rng.standard_normal((n, n)) / np.sqrt(n), dtype)
    b = jnp.asarray(rng.standard_normal((n, n)) / np.sqrt(n), dtype)

    @jax.jit
    def chain(x, b):
        return jax.lax.fori_loop(
            0, iters, lambda i, v: jax.lax.dot(v, b), x
        )

    x = chain(a, b)
    sync(x)
    t0 = time.perf_counter()
    x = chain(x, b)
    sync(x)
    dt = (time.perf_counter() - t0) / iters
    return 2 * n**3 / dt


def measure_hbm_bw(mbytes=256, iters=64):
    """Measured HBM streaming bandwidth (read+write counted)."""
    n = mbytes * 1024 * 1024 // 4
    x = jnp.ones((n,), jnp.float32)

    @jax.jit
    def chain(x):
        return jax.lax.fori_loop(0, iters, lambda i, v: v * 1.0000001, x)

    x = chain(x)
    sync(x)
    t0 = time.perf_counter()
    x = chain(x)
    sync(x)
    dt = (time.perf_counter() - t0) / iters
    return 2 * n * 4 / dt


def time_apply(mesh, u, mode, inner=128):
    @jax.jit
    def chain(m, v):
        return jax.lax.fori_loop(
            0, inner, lambda i, w: apply_sipg(m, w, volume_mode=mode), v
        )

    v = chain(mesh, u)
    sync(v)
    t0 = time.perf_counter()
    v = chain(mesh, v)
    sync(v)
    return (time.perf_counter() - t0) / inner


def bench_config(level, deg, dtype, mode, peak, bw):
    geom = BrickGeometry(dim=3)
    forest = Forest.uniform(geom.conn, level)
    mesh = to_dtype(
        build_mesh(geom, forest, deg=deg, store_full=False), dtype
    )
    E = mesh.n_elements
    rng = np.random.default_rng(0)
    u = jnp.asarray(rng.standard_normal((E,) + (mesh.nl,) * 3), dtype)
    dt = time_apply(mesh, u, mode)
    dof = E * mesh.nl**3
    flops = model_flops_per_apply(E, 3, mesh.nl, mesh.nq)
    nbytes = min_bytes_per_apply(E, 3, mesh.nl, mesh.nq, u.dtype.itemsize)
    intensity = flops / nbytes
    roofline = min(peak, bw * intensity)
    rate = flops / dt
    return {
        "elements": E,
        "deg": deg,
        "dof": dof,
        "dtype": np.dtype(dtype).name,
        "volume_mode": mode,
        "seconds_per_apply": dt,
        "dof_per_s": dof / dt,
        "model_tflops_per_s": rate / 1e12,
        "intensity_flop_per_byte": intensity,
        "roofline_tflops": roofline / 1e12,
        "frac_of_roofline": rate / roofline,
        "frac_of_peak_flops": rate / peak,
    }


def main():
    dev = jax.devices()[0]
    on_tpu = dev.platform != "cpu"
    dtype = jnp.float32
    if "--bf16" in sys.argv:
        dtype = jnp.bfloat16
    if "--f64" in sys.argv:
        dtype = jnp.float64

    peak = measure_gemm_peak(dtype, n=4096 if on_tpu else 1024)
    bw = measure_hbm_bw(256 if on_tpu else 32)

    # headline: deg 7 (the hp ceiling the reference runs at, max MXU use);
    # secondary: deg 3 (typical running degree) and f64 (contract dtype).
    head = bench_config(4 if on_tpu else 2, 7, dtype, "tensor", peak, bw)
    secondary = [bench_config(4 if on_tpu else 2, 3, dtype, "dense", peak, bw)]
    if on_tpu:
        peak64 = measure_gemm_peak(jnp.float64, n=2048)
        secondary.append(
            bench_config(3, 7, jnp.float64, "tensor", peak64, bw)
        )

    vs_baseline = head["frac_of_roofline"] / 0.60
    print(
        json.dumps(
            {
                "metric": "sipg_apply_dof_per_s",
                "value": head["dof_per_s"],
                "unit": "DOF/s",
                "vs_baseline": vs_baseline,
                "detail": {
                    "headline": head,
                    "secondary": secondary,
                    "measured_gemm_peak_tflops": peak / 1e12,
                    "measured_hbm_bw_gbs": bw / 1e9,
                    "device": str(dev),
                    "timing": "fori_loop-amortized (30 applies/dispatch)",
                },
            }
        )
    )


if __name__ == "__main__":
    main()
