"""Block-Schwarz preconditioner tests.

Mirrors the reference's Schwarz unit tests (subdomain solves agreeing
with the global operator restricted to the subdomain; PCG acceleration).
"""

import numpy as np
import jax
import jax.numpy as jnp

from disco4est_tpu.geometry.brick import BrickGeometry
from disco4est_tpu.mesh.tree import Forest
from disco4est_tpu.mesh.builder import build_mesh
from disco4est_tpu.laplacian.sipg import (
    apply_sipg,
    apply_sipg_jit,
    build_rhs_with_strong_bc,
)
from disco4est_tpu.solvers.schwarz import (
    BlockSchwarz,
    assemble_diag_blocks,
    schwarz_smooth,
)
from disco4est_tpu.solvers.cg import cg_solve


def test_diag_blocks_match_dense():
    geom = BrickGeometry(dim=2)
    forest = Forest.uniform(geom.conn, 1)
    mesh = build_mesh(geom, forest, deg=2)
    blocks = np.asarray(assemble_diag_blocks(mesh))
    # dense assembly via full operator, extract diagonal blocks
    n = mesh.local_nodes
    nb = mesh.nl**2
    shape = (mesh.n_elements,) + (mesh.nl,) * 2
    cols = []
    for i in range(n):
        e = np.zeros(n)
        e[i] = 1.0
        cols.append(
            np.asarray(apply_sipg_jit(mesh, jnp.asarray(e.reshape(shape)))).reshape(-1)
        )
    A = np.stack(cols, 1)
    for e in range(mesh.n_elements):
        sl = slice(e * nb, (e + 1) * nb)
        assert np.allclose(blocks[e], A[sl, sl], atol=1e-12), e


def test_block_schwarz_pcg():
    geom = BrickGeometry(dim=2)
    forest = Forest.uniform(geom.conn, 3)
    mesh = build_mesh(geom, forest, deg=3)

    def u_fcn(x, y):
        return jnp.sin(jnp.pi * x) * jnp.sin(jnp.pi * y)

    g = mesh.boundary_values(u_fcn)
    f = mesh.init_field(lambda *c: 2 * jnp.pi**2 * u_fcn(*c))
    rhs = build_rhs_with_strong_bc(mesh, f, g)

    M = BlockSchwarz.setup(mesh)

    from functools import partial

    @partial(jax.jit, static_argnames=("use_pc",))
    def solve(mesh, M, rhs, use_pc):
        A = lambda v: apply_sipg(mesh, v)
        if use_pc:
            return cg_solve(A, rhs, M=M, atol=1e-12, rtol=1e-30, max_iter=3000)
        return cg_solve(A, rhs, atol=1e-12, rtol=1e-30, max_iter=3000)

    res_pc = solve(mesh, M, rhs, use_pc=True)
    res_plain = solve(mesh, M, rhs, use_pc=False)
    assert int(res_pc.iterations) < int(res_plain.iterations), (
        int(res_pc.iterations), int(res_plain.iterations),
    )
    assert float(
        jnp.max(jnp.abs(res_pc.x - res_plain.x))
    ) < 1e-8


def test_schwarz_smoother_reduces_error():
    geom = BrickGeometry(dim=2)
    forest = Forest.uniform(geom.conn, 2)
    mesh = build_mesh(geom, forest, deg=2)
    M = BlockSchwarz.setup(mesh)
    rng = np.random.default_rng(0)
    x_exact = jnp.asarray(
        rng.standard_normal((mesh.n_elements,) + (mesh.nl,) * 2)
    )
    A = jax.jit(lambda m, v: apply_sipg(m, v))
    b = A(mesh, x_exact)

    @jax.jit
    def smooth(mesh, M, b, x):
        return schwarz_smooth(lambda v: apply_sipg(mesh, v), M, b, x, 5)

    x = smooth(mesh, M, b, jnp.zeros_like(x_exact))
    e0 = float(jnp.linalg.norm(x_exact.reshape(-1)))
    e1 = float(jnp.linalg.norm((x - x_exact).reshape(-1)))
    assert e1 < 0.7 * e0, (e0, e1)
