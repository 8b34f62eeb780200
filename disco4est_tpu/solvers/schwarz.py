"""Additive Schwarz preconditioner/smoother — element-block stage.

Role of the reference's Schwarz family (`Solver/d4est_solver_schwarz*`,
~5.5 kLoC: vertex-patch subdomains with `num_nodes_overlap` layers,
per-subdomain matrix-free solves, quintic-hat weighting, cross-rank
correction transfer).  TPU-first staging:

- THIS module: zero-overlap subdomains (= one element each) with EXACT
  batched dense solves — the diagonal blocks of the SIPG operator are
  assembled in one shot by probing `apply_sipg(..., neighbors="zero")`
  with all unit vectors at once (a [n, E, ...] vmapped batch), then
  batch-inverted ([E, n, n] `jnp.linalg.inv`, MXU-friendly).  Used as a
  Krylov preconditioner and as a multigrid smoother (damped).
- overlapping vertex-patch subdomains (the reference's
  `num_nodes_overlap ≥ 1`) extend this with neighbor gather/scatter index
  maps — tracked for the next round.
"""

from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from disco4est_tpu.mesh.builder import MeshData
from disco4est_tpu.laplacian.sipg import apply_sipg


@partial(jax.jit, static_argnames=("op",))
def assemble_diag_blocks(mesh: MeshData, op=None):
    """Exact element-diagonal blocks of the operator: [E, n, n].

    `op(mesh, u)` defaults to the SIPG apply with neighbor couplings
    dropped; any operator supporting `neighbors="zero"` works (e.g. a
    Newton Jacobian with its pointwise term, which is block-diagonal
    anyway — the reference's `multigrid_matrix_op` assembles the same
    blocks element by element).
    """
    if op is None:
        op = lambda m, u: apply_sipg(m, u, neighbors="zero")
    dim, nl = mesh.dim, mesh.nl
    E = mesh.n_elements
    n = nl**dim
    eye = jnp.eye(n, dtype=mesh.sigma.dtype)
    basis = jnp.broadcast_to(
        eye.reshape(n, 1, *([nl] * dim)), (n, E, *([nl] * dim))
    )
    cols = jax.vmap(lambda u: op(mesh, u))(basis)  # [n, E, nl...]
    # blocks[e, i, j] = (A e_j)_i
    return jnp.moveaxis(cols.reshape(n, E, n), 0, 2)


@dataclasses.dataclass
class BlockSchwarz:
    """Zero-overlap additive Schwarz: r ↦ blockwise A_ee⁻¹ r."""

    inv_blocks: jnp.ndarray  # [E, n, n]

    @staticmethod
    def setup(mesh: MeshData, op=None) -> "BlockSchwarz":
        blocks = assemble_diag_blocks(mesh, op=op)
        return BlockSchwarz(inv_blocks=jnp.linalg.inv(blocks))

    def __call__(self, r):
        E = r.shape[0]
        rf = r.reshape(E, -1)
        out = jnp.einsum("eij,ej->ei", self.inv_blocks, rf)
        return out.reshape(r.shape)


jax.tree_util.register_pytree_node(
    BlockSchwarz,
    lambda s: ((s.inv_blocks,), None),
    lambda aux, ch: BlockSchwarz(inv_blocks=ch[0]),
)


def schwarz_smooth(A, M: BlockSchwarz, b, x, iterations: int = 3,
                   damping: float = 2.0 / 3.0):
    """Damped block-Schwarz smoothing iterations (the reference's
    `mg_smoother_schwarz` role at overlap 0)."""

    def body(i, x):
        return x + damping * M(b - A(x))

    return jax.lax.fori_loop(0, iterations, body, x)
