"""Round-3 kernel-design experiments (run on the real TPU).

Settles, by measurement rather than guesswork:
  E0  honest HBM streaming bandwidth (several patterns, take max)
  E1  f32 matmul throughput at default vs HIGHEST precision + error
  E2  row-gather throughput for the trace exchange [E*6, 128] f32
  E3  small-K batched GEMM rates ([M,8]@[8,8] vs I2-blocked [M,128]@[128,128])
  E4  naive-jnp-in-pallas per-element tensor apply
"""

import time

import jax
import jax.numpy as jnp
import numpy as np

import disco4est_tpu  # noqa: F401


def sync(x):
    if isinstance(x, tuple):
        x = x[0]
    return float(jnp.sum(x).astype(jnp.float32))


def timeit(fn, *args, iters=3):
    out = fn(*args)
    sync(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    sync(out)
    return (time.perf_counter() - t0) / iters, out


def e0_bandwidth():
    n = 64 * 1024 * 1024  # 256 MB f32
    x = jnp.ones((n,), jnp.float32)
    y = jnp.zeros((n,), jnp.float32)

    inner = 32

    @jax.jit
    def mul_chain(x):
        return jax.lax.fori_loop(0, inner, lambda i, v: v * 1.0000001, x)

    @jax.jit
    def copy_pair(x, y):
        def body(i, xy):
            a, b = xy
            return (b + 1.0, a + 1.0)
        return jax.lax.fori_loop(0, inner // 2, body, (x, y))

    dt, _ = timeit(mul_chain, x)
    bw_mul = 2 * n * 4 * inner / (dt * inner) / 1e9 * inner
    # careful: timeit returns dt for ONE call of chain (inner ops inside)
    dt_mul, _ = timeit(mul_chain, x)
    bw_mul = 2 * n * 4 * inner / dt_mul / 1e9
    dt_cp, _ = timeit(copy_pair, x, y)
    bw_cp = 2 * n * 4 * inner / dt_cp / 1e9
    print(f"E0 bw: mul-chain {bw_mul:.0f} GB/s, copy-pair {bw_cp:.0f} GB/s")


def e1_matmul_precision():
    n = 4096
    rng = np.random.default_rng(0)
    a64 = rng.standard_normal((n, n)) / np.sqrt(n)
    b64 = rng.standard_normal((n, n)) / np.sqrt(n)
    ref = a64 @ b64
    a = jnp.asarray(a64, jnp.float32)
    b = jnp.asarray(b64, jnp.float32)
    for prec in ["default", "float32", "highest"]:
        @jax.jit
        def mm(a, b, p=prec):
            return jax.lax.fori_loop(
                0, 32, lambda i, v: jnp.dot(v, b, precision=p), a
            )
        try:
            dt, out = timeit(mm, a, b)
            tf = 2 * n**3 * 32 / dt / 1e12
            one = jnp.dot(a, b, precision=prec)
            err = float(jnp.max(jnp.abs(one - ref)) / np.max(np.abs(ref)))
            print(f"E1 f32 matmul precision={prec}: {tf:.1f} TF/s, rel err {err:.2e}")
        except Exception as ex:
            print(f"E1 precision={prec} failed: {ex}")


def e2_gather():
    E = 4096
    rows_n = E * 6
    tr = jnp.asarray(np.random.default_rng(0).standard_normal((rows_n, 128)), jnp.float32)
    perm = jnp.asarray(np.random.default_rng(1).permutation(rows_n), jnp.int32)

    @jax.jit
    def gath(tr, perm):
        def body(i, v):
            return v[perm] + 1.0
        return jax.lax.fori_loop(0, 32, body, tr)

    dt, _ = timeit(gath, tr, perm)
    per = dt / 32
    gb = 2 * rows_n * 128 * 4 / per / 1e9
    print(f"E2 row gather [24576,128] f32: {per*1e6:.1f} us/pass, {gb:.0f} GB/s")

    # shifted-slice variant (uniform-brick lexicographic neighbors)
    @jax.jit
    def shift(tr):
        def body(i, v):
            return jnp.roll(v, 6, axis=0) + 1.0
        return jax.lax.fori_loop(0, 32, body, tr)

    dt, _ = timeit(shift, tr)
    per = dt / 32
    gb = 2 * rows_n * 128 * 4 / per / 1e9
    print(f"E2 roll [24576,128]: {per*1e6:.1f} us/pass, {gb:.0f} GB/s")


def e3_small_k():
    B = 4096 * 64  # rows
    rng = np.random.default_rng(0)
    u8 = jnp.asarray(rng.standard_normal((B, 8)), jnp.float32)
    m8 = jnp.asarray(rng.standard_normal((8, 8)), jnp.float32)

    @jax.jit
    def mmk8(u, m):
        return jax.lax.fori_loop(0, 32, lambda i, v: jnp.dot(v, m), u)

    dt, _ = timeit(mmk8, u8, m8)
    per = dt / 32
    tf = 2 * B * 8 * 8 / per / 1e12
    gb = 2 * B * 8 * 4 / per / 1e9
    print(f"E3 [B,8]@[8,8] B={B}: {per*1e6:.1f} us, {tf:.2f} TF/s, {gb:.0f} GB/s")

    B2 = 4096 * 4
    u128 = jnp.asarray(rng.standard_normal((B2, 128)), jnp.float32)
    m128 = jnp.asarray(rng.standard_normal((128, 128)), jnp.float32)

    @jax.jit
    def mmk128(u, m):
        return jax.lax.fori_loop(0, 32, lambda i, v: jnp.dot(v, m), u)

    dt, _ = timeit(mmk128, u128, m128)
    per = dt / 32
    tf = 2 * B2 * 128 * 128 / per / 1e12
    gb = 2 * B2 * 128 * 4 / per / 1e9
    print(f"E3 [B,128]@[128,128] B={B2}: {per*1e6:.1f} us, {tf:.2f} TF/s, {gb:.0f} GB/s")

    # batched per-element [E, 64, 8] @ [8,8] via einsum (z-contraction shape)
    E = 4096
    u3 = jnp.asarray(rng.standard_normal((E, 8, 8, 8)), jnp.float32)

    @jax.jit
    def axis_applies(u, m):
        def one(v):
            for ax in (1, 2, 3):
                v = jnp.moveaxis(jnp.moveaxis(v, ax, -1) @ m, -1, ax)
            return v
        return jax.lax.fori_loop(0, 32, lambda i, v: one(v), u)

    dt, _ = timeit(axis_applies, u3, m8)
    per = dt / 32
    tf = 3 * 2 * E * 8**4 / per / 1e12
    print(f"E3 XLA 3-axis apply [4096,8,8,8]: {per*1e6:.1f} us, {tf:.2f} TF/s useful")


def e4_pallas_axis():
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    E, nl = 4096, 8
    BLK = 256
    rng = np.random.default_rng(0)
    u = jnp.asarray(rng.standard_normal((E, nl, nl, nl)), jnp.float32)
    m = jnp.asarray(rng.standard_normal((nl, nl)), jnp.float32)

    def kern(m_ref, u_ref, o_ref):
        v = u_ref[:]
        mm = m_ref[:]
        for ax in (1, 2, 3):
            v = jnp.moveaxis(
                jnp.moveaxis(v, ax, -1) @ mm, -1, ax
            )
        o_ref[:] = v

    @jax.jit
    def run(u, m):
        f = pl.pallas_call(
            kern,
            out_shape=jax.ShapeDtypeStruct(u.shape, u.dtype),
            grid=(E // BLK,),
            in_specs=[
                pl.BlockSpec((nl, nl), lambda i: (0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((BLK, nl, nl, nl), lambda i: (i, 0, 0, 0), memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((BLK, nl, nl, nl), lambda i: (i, 0, 0, 0), memory_space=pltpu.VMEM),
        )
        return jax.lax.fori_loop(0, 32, lambda i, v: f(m, v), u)

    try:
        dt, out = timeit(run, u, m)
        per = dt / 32
        tf = 3 * 2 * E * nl**4 / per / 1e12
        gb = 2 * E * nl**3 * 4 / per / 1e9
        print(f"E4 pallas 3-axis apply: {per*1e6:.1f} us, {tf:.2f} TF/s useful, {gb:.0f} GB/s io")
    except Exception as ex:
        print(f"E4 failed: {type(ex).__name__}: {str(ex)[:500]}")


if __name__ == "__main__":
    print("device:", jax.devices()[0])
    e0_bandwidth()
    e1_matmul_precision()
    e2_gather()
    e3_small_k()
    e4_pallas_axis()
