"""Unit tests for the reference-element operator core.

Mirrors the reference's `Tests/Unit/d4est_test_operators.c` and
`d4est_test_kron.c`: operators are checked against dense numpy
constructions and known analytic identities.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from disco4est_tpu.ops import lgl, tensor
from disco4est_tpu.ops.operators import DB


DEGS = [1, 2, 3, 4, 7]


@pytest.mark.parametrize("deg", DEGS)
def test_lobatto_nodes_weights(deg):
    x, w = lgl.lobatto_nodes_weights(deg + 1)
    assert x[0] == -1.0 and x[-1] == 1.0
    assert np.all(np.diff(x) > 0)
    # Weights integrate polynomials up to degree 2*deg-1 exactly.
    for p in range(2 * deg):
        exact = (1.0 - (-1.0) ** (p + 1)) / (p + 1)
        assert np.abs(np.sum(w * x**p) - exact) < 1e-13, p


@pytest.mark.parametrize("deg", DEGS)
def test_gauss_nodes_weights(deg):
    x, w = lgl.gauss_nodes_weights(deg + 1)
    for p in range(2 * deg + 1):
        exact = (1.0 - (-1.0) ** (p + 1)) / (p + 1)
        assert np.abs(np.sum(w * x**p) - exact) < 1e-13, p


def test_known_lgl_values():
    # Degree 3 LGL interior nodes are ±1/sqrt(5); degree 2 weights 1/3,4/3.
    x3, _ = lgl.lobatto_nodes_weights(4)
    assert np.allclose(np.abs(x3[1:3]), 1 / np.sqrt(5), atol=1e-14)
    x2, w2 = lgl.lobatto_nodes_weights(3)
    assert np.allclose(w2, [1 / 3, 4 / 3, 1 / 3], atol=1e-14)


@pytest.mark.parametrize("deg", DEGS)
def test_mass_matrix_exact(deg):
    """M = (VVᵀ)⁻¹ equals the exact L2 mass of Lagrange basis functions."""
    ops = DB.ops(deg)
    n = deg + 1
    # Exact mass via high-order Gauss quadrature of Lagrange products.
    gx, gw = lgl.gauss_nodes_weights(2 * n)
    L = DB.interp_to_points(deg, tuple(gx))  # [ngauss, n]
    M_exact = L.T @ np.diag(gw) @ L
    assert np.allclose(ops.mass, M_exact, atol=1e-12)


@pytest.mark.parametrize("deg", DEGS)
def test_diff_matrix(deg):
    """D differentiates polynomials up to `deg` exactly."""
    ops = DB.ops(deg)
    x = ops.lobatto_nodes
    for p in range(deg + 1):
        du = ops.diff @ (x**p)
        exact = p * x ** max(p - 1, 0) if p > 0 else np.zeros_like(x)
        assert np.allclose(du, exact, atol=1e-11), p


@pytest.mark.parametrize("deg_H,deg_h", [(1, 2), (2, 4), (3, 5), (4, 4)])
def test_p_prolong_restrict(deg_H, deg_h):
    P = DB.p_prolong(deg_H, deg_h)
    R = DB.p_restrict(deg_h, deg_H)
    # Restriction of a prolonged field is the identity.
    assert np.allclose(R @ P, np.eye(deg_H + 1), atol=1e-11)
    # Prolong interpolates polynomials exactly.
    xH, _ = lgl.lobatto_nodes_weights(deg_H + 1)
    xh, _ = lgl.lobatto_nodes_weights(deg_h + 1)
    for p in range(deg_H + 1):
        assert np.allclose(P @ xH**p, xh**p, atol=1e-12)


@pytest.mark.parametrize("deg_H,deg_h", [(2, 2), (2, 3), (3, 3)])
def test_hp_prolong_restrict(deg_H, deg_h):
    xH, _ = lgl.lobatto_nodes_weights(deg_H + 1)
    xh, _ = lgl.lobatto_nodes_weights(deg_h + 1)
    acc = np.zeros((deg_H + 1, deg_H + 1))
    for c in (0, 1):
        P = DB.hp_prolong(deg_H, deg_h, c)
        # Child nodes in parent coords.
        xp = 0.5 * (xh - 1.0) if c == 0 else 0.5 * (xh + 1.0)
        for p in range(deg_H + 1):
            assert np.allclose(P @ xH**p, xp**p, atol=1e-12)
        R = DB.hp_restrict(deg_h, deg_H, c)
        acc += R @ P
    # Σ_c R_c P_c = identity on the parent space.
    assert np.allclose(acc, np.eye(deg_H + 1), atol=1e-11)


@pytest.mark.parametrize("dim", [2, 3])
def test_apply_tensor_matches_dense_kron(dim):
    """Batched tensor apply == dense Kronecker matrix action
    (the reference's `d4est_test_kron.c` strategy)."""
    rng = np.random.default_rng(0)
    n, m = 4, 3
    mats = [rng.standard_normal((m, n)) for _ in range(dim)]
    E = 5
    u = rng.standard_normal((E, *([n] * dim)))
    out = np.asarray(tensor.apply_tensor(mats, jnp.asarray(u), dim))
    # Dense: kron(A_dim, ..., A_1) acting on x-fastest flattening.
    dense = mats[dim - 1]
    for d in range(dim - 2, -1, -1):
        dense = np.kron(dense, mats[d])
    for e in range(E):
        ref = dense @ u[e].reshape(-1)
        assert np.allclose(out[e].reshape(-1), ref, atol=1e-12)


@pytest.mark.parametrize("dim", [2, 3])
def test_face_slice_scatter_roundtrip(dim):
    rng = np.random.default_rng(1)
    n = 4
    u = jnp.asarray(rng.standard_normal((2, *([n] * dim))))
    for face in range(2 * dim):
        fv = tensor.face_slice(u, face, dim)
        assert fv.shape == (2, *([n] * (dim - 1)))
        vol = tensor.face_scatter(fv, face, dim, n)
        assert vol.shape == u.shape
        assert np.allclose(
            np.asarray(tensor.face_slice(vol, face, dim)), np.asarray(fv)
        )
        # Interior is zero.
        assert np.allclose(np.sum(np.asarray(vol) ** 2),
                           np.sum(np.asarray(fv) ** 2))


@pytest.mark.parametrize("dim", [2, 3])
def test_np_face_indices_match_slice(dim):
    n = 3
    u = np.arange(n**dim).reshape((n,) * dim)
    for face in range(2 * dim):
        via_slice = np.asarray(
            tensor.face_slice(jnp.asarray(u[None]), face, dim)
        )[0].reshape(-1)
        via_idx = u.reshape(-1)[tensor.np_face_slice_indices(face, dim, n)]
        assert np.array_equal(via_slice, via_idx)


def test_gradient(deg=5, dim=3):
    ops = DB.ops(deg)
    x = ops.lobatto_nodes
    X, Y, Z = np.meshgrid(x, x, x, indexing="ij")  # axes (z? ...)
    # Build u = x^2 y + z^3 on the (z, y, x) layout.
    zz = x[:, None, None]
    yy = x[None, :, None]
    xx = x[None, None, :]
    u = xx**2 * yy + zz**3
    du = tensor.grad(ops.diff, jnp.asarray(u[None]), dim)
    assert np.allclose(np.asarray(du[0, 0]), 2 * xx * yy + 0 * u, atol=1e-10)
    assert np.allclose(np.asarray(du[1, 0]), xx**2 + 0 * u, atol=1e-10)
    assert np.allclose(np.asarray(du[2, 0]), 3 * zz**2 + 0 * u, atol=1e-10)
