"""Matrix-free (preconditioned) conjugate gradients.

Role of the reference's in-house CG (`Solver/d4est_solver_cg.c:76-280`,
matrix-free with `sc_allreduce` dot products) and — with a preconditioner —
of the PETSc KSP 'cg' path.  Here the iteration is a `lax.while_loop` so
the whole solve stays on-device; dot products become `psum`s automatically
when the arrays are sharded over the element mesh axis.
"""

from __future__ import annotations

from functools import partial
from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp


class CGResult(NamedTuple):
    x: jnp.ndarray
    iterations: jnp.ndarray
    residual_norm: jnp.ndarray


def _dot(a, b):
    return jnp.vdot(a.reshape(-1), b.reshape(-1))


def cg_solve(
    A: Callable,
    b,
    x0=None,
    *,
    M: Callable | None = None,
    atol: float = 1e-15,
    rtol: float = 1e-15,
    max_iter: int = 10000,
    resume_state=None,
    return_state: bool = False,
) -> CGResult:
    """Solve A x = b.  `A` (and optional preconditioner `M`) are
    matrix-free callables on pytree-shaped fields.

    Mid-solve checkpointing (`d4est_solver_krylov_petsc.c:236-245` role):
    pass `return_state=True` to get the full Krylov state back, persist
    it, and continue EXACTLY (no restart, no lost conjugacy) by passing
    it as `resume_state` with a larger `max_iter` cap."""
    x0 = jnp.zeros_like(b) if x0 is None else x0
    M = M or (lambda v: v)

    if resume_state is None:
        r0 = b - A(x0)
        z0 = M(r0)
        rz0 = _dot(r0, z0)
        state = (x0, r0, z0, z0, rz0, jnp.asarray(0))
    else:
        state = resume_state
    bnorm = jnp.sqrt(_dot(b, b))
    tol2 = jnp.maximum(atol, rtol * bnorm) ** 2

    def cond(state):
        x, r, z, p, rz, k = state
        return (_dot(r, r) > tol2) & (k < max_iter)

    def body(state):
        x, r, z, p, rz, k = state
        Ap = A(p)
        alpha = rz / _dot(p, Ap)
        x = x + alpha * p
        r = r - alpha * Ap
        z = M(r)
        rz_new = _dot(r, z)
        beta = rz_new / rz
        p = z + beta * p
        return (x, r, z, p, rz_new, k + 1)

    final = jax.lax.while_loop(cond, body, state)
    x, r, _, _, _, k = final
    res = CGResult(x=x, iterations=k, residual_norm=jnp.sqrt(_dot(r, r)))
    return (res, final) if return_state else res
