"""Mass-weighted nonlinear terms: M·f(x,u) and its linearization.

Role of the reference's `d4est_quadrature_apply_fofufofvlj` /
`apply_fofufofvlilj` (`Quadrature/d4est_quadrature.h:135-139`): integrate a
pointwise function of the solution against test functions (the nonlinear
term of Newton residuals), and the frozen-u0 diagonal term of the Jacobian
(e.g. ConstantDensityStar's −2πρψ⁵ / −10πρψ⁴·v, TwoPunctures' ψ⁻⁷/ψ⁻⁸
terms).

With jax the linearized term needs no hand-coding — `jax.jvp` of
`apply_mass_fof` gives it — but the explicit form is provided for parity
and for assembling multigrid matrix-operator blocks.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from disco4est_tpu.mesh.builder import MeshData, vol_interp, vol_weights
from disco4est_tpu.ops import tensor


def _quad_setup(mesh: MeshData, dtype):
    Vq = jnp.asarray(mesh.quad.interp(mesh.deg, mesh.deg_quad), dtype)
    _, wq1 = mesh.quad.nodes_weights(mesh.deg_quad)
    w = tensor.tensor_weights([wq1] * mesh.dim, dtype=dtype)
    return Vq, w


def apply_mass_fof(mesh: MeshData, u, fof):
    """Vᵀ W J f(x_q, u_q): nodal vector of ∫ f(x,u) φ_i dV.

    `fof(xyz_tuple, u_q)` is a jax-traceable pointwise function evaluated
    at the quadrature points (`apply_fofufofvlj` semantics).
    """
    dtype = u.dtype
    w = vol_weights(mesh, dtype)
    u_q = vol_interp(mesh, u)
    xyz = tuple(mesh.xyz_quad[:, d].astype(dtype) for d in range(mesh.dim))
    f_q = fof(xyz, u_q)
    return vol_interp(
        mesh, w * mesh.j_quad.astype(dtype) * f_q, transpose=True
    )


def apply_mass_fof_lin(mesh: MeshData, u0, v, dfof):
    """Vᵀ W J f'(x_q, u0_q) ⊙ v_q: the frozen-u0 Jacobian term
    (`apply_fofufofvlilj` semantics)."""
    dtype = v.dtype
    w = vol_weights(mesh, dtype)
    u0_q = vol_interp(mesh, u0)
    v_q = vol_interp(mesh, v)
    xyz = tuple(mesh.xyz_quad[:, d].astype(dtype) for d in range(mesh.dim))
    c_q = dfof(xyz, u0_q)
    return vol_interp(
        mesh, w * mesh.j_quad.astype(dtype) * c_q * v_q, transpose=True
    )


def assemble_fof_blocks(mesh: MeshData, u0, dfof, dtype=None):
    """Per-element dense blocks [E, n, n] of the frozen-u0 term
    Vᵀ diag(w·J·f'(x_q, u0_q)) V — the fine-level input of the multigrid
    matrix operator (`d4est_solver_multigrid_matrix_operator.h:1-21`:
    the reference assembles exactly these blocks, then restricts them
    down the hierarchy; see `solvers/multigrid.set_matrix_operator`)."""
    import numpy as np

    dtype = dtype or u0.dtype
    Vq, w = _quad_setup(mesh, dtype)
    dim = mesh.dim
    u0_q = tensor.apply_iso(Vq, u0.astype(dtype), dim)
    xyz = tuple(mesh.xyz_quad[:, d].astype(dtype) for d in range(dim))
    c_q = dfof(xyz, u0_q)  # [E, nq...]
    E = c_q.shape[0]
    diag = (w * mesh.j_at_quad(dtype) * c_q).reshape(E, -1)  # [E, nq^d]
    # dense ⊗V once (host, static): [nq^d, nl^d], x-fastest flattening
    Vfull = np.array([[1.0]])
    V1 = np.asarray(mesh.quad.interp(mesh.deg, mesh.deg_quad))
    for _ in range(dim):
        Vfull = np.kron(Vfull, V1)
    Vfull = jnp.asarray(Vfull, dtype)
    # B = Vᵀ diag V, batched: [E, nl^d, nl^d]
    return jnp.einsum("qi,eq,qj->eij", Vfull, diag, Vfull)
