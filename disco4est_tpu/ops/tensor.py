"""Batched tensor-product (Kronecker) applies.

Role of the reference's `Kron/d4est_kron.h` hand-unrolled kernels
(`d4est_kron_A1A2A3x_nonsqr`, `vec⊗vec⊙x`, ...): here every per-element
operator application is a *batched* contraction over an element axis, mapped
by XLA onto the MXU.  Element fields are arrays `u[E, n_{dim}, ..., n_1]`
with axis order (z, y, x) so `u.reshape(E, -1)` matches the reference's
x-fastest node ordering.

Direction convention (matches p4est): dir 0 = x = last axis,
dir 1 = y, dir 2 = z.  Face numbering: face 2·dir + side with side 0 = low.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np


def apply_axis(A, u, dir_: int):
    """Contract `A[m, n]` with `u[..., n_dim, ..., n_1]` along direction
    `dir_` (0 = last axis).  Returns array with that axis resized to m."""
    A = jnp.asarray(A, dtype=u.dtype)
    axis = u.ndim - 1 - dir_
    u_moved = jnp.moveaxis(u, axis, -1)
    out = u_moved @ A.T
    return jnp.moveaxis(out, -1, axis)


def apply_tensor(mats, u, dim: int):
    """Apply mats[d] along direction d for d = 0..dim-1 (A₁⊗…⊗A_dim · u,
    the `d4est_kron_A1A2A3x_nonsqr` role, batched over leading axes)."""
    out = u
    for d in range(dim):
        out = apply_axis(mats[d], out, d)
    return out


def apply_iso(A, u, dim: int):
    """Apply the same matrix along every direction (A⊗A⊗A · u)."""
    return apply_tensor([A] * dim, u, dim)


def tensor_weights(w_per_dir, dtype=jnp.float64):
    """Outer product of 1D weight vectors -> [n_dim, ..., n_1] array
    (`d4est_kron_vec1_o_vec2_o_vec3_dot_xy` weight factor)."""
    dim = len(w_per_dir)
    out = jnp.asarray(w_per_dir[dim - 1], dtype=dtype)
    for d in range(dim - 2, -1, -1):
        out = out[..., None] * jnp.asarray(w_per_dir[d], dtype=dtype)
    return out


def grad(D, u, dim: int):
    """Reference-space gradient: stack of D applied along each direction.
    Returns [dim, *u.shape] (dudr[l] = ∂u/∂r_l at nodal points)."""
    return jnp.stack([apply_axis(D, u, l) for l in range(dim)])


# ---------------------------------------------------------------------------
# Face extraction / insertion (the reference's slicer & lift,
# `d4est_operators_apply_slicer` / `d4est_operators_apply_lift`:
# LGL nodes include the endpoints so both are pure indexing).
# ---------------------------------------------------------------------------


def face_slice(u, face: int, dim: int):
    """Extract the face plane of `u[..., n_dim, ..., n_1]`.

    For dir = face//2 the corresponding axis is dropped; remaining axes keep
    their (z, y, x) order, so flattened face nodes are x-fastest — matching
    the reference's face-node ordering.
    """
    dir_, side = divmod(face, 2)
    axis = u.ndim - 1 - dir_
    idx = [slice(None)] * u.ndim
    idx[axis] = 0 if side == 0 else -1
    return u[tuple(idx)]


def face_scatter(face_vals, face: int, dim: int, n: int):
    """Lift: place `face_vals` on the face plane of a zero volume field.
    `face_vals[..., n_{dim-1}, ..., n_1]` -> `[..., n_dim, ..., n_1]`."""
    dir_, side = divmod(face, 2)
    # Insert a new axis of size n at the position of dir_ and pad.
    axis = face_vals.ndim - dim + 1 + (dim - 1 - dir_)
    expanded = jnp.expand_dims(face_vals, axis)
    pad = [(0, 0)] * expanded.ndim
    pad[axis] = (0, n - 1) if side == 0 else (n - 1, 0)
    return jnp.pad(expanded, pad)


def face_normal_sign(face: int) -> float:
    return -1.0 if face % 2 == 0 else 1.0


def np_face_slice_indices(face: int, dim: int, n: int) -> np.ndarray:
    """Flat volume-node indices of a face plane (x-fastest ordering).
    Host-side helper for building gather maps."""
    shape = (n,) * dim
    vol = np.arange(n**dim).reshape(shape)  # axes (z, y, x)
    dir_, side = divmod(face, 2)
    axis = dim - 1 - dir_
    idx = [slice(None)] * dim
    idx[axis] = 0 if side == 0 else -1
    return vol[tuple(idx)].reshape(-1)
