"""Flexible conjugate gradients (FCG).

Role of the reference's `Solver/d4est_solver_fcg_improved.c` and the PETSc
`fcg` KSP type (the default Krylov method in the reference's inputs,
`[d4est_solver_krylov_petsc] ksp_type = fcg`): CG that re-orthogonalizes
the search direction against the previous one, tolerating nonlinear /
variable preconditioners (multigrid with re-estimated smoother bounds).
"""

from __future__ import annotations

from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp


class FCGResult(NamedTuple):
    x: jnp.ndarray
    iterations: jnp.ndarray
    residual_norm: jnp.ndarray


def _dot(a, b):
    return jnp.vdot(a.reshape(-1), b.reshape(-1))


def fcg_solve(
    A: Callable,
    b,
    x0=None,
    *,
    M: Callable | None = None,
    atol: float = 1e-15,
    rtol: float = 1e-20,
    max_iter: int = 1000,
    resume_state=None,
    return_state: bool = False,
) -> FCGResult:
    """Flexible CG (Notay variant, one-direction truncation).

    `resume_state`/`return_state`: exact mid-solve checkpoint/continue
    (`d4est_solver_fcg_improved.c:319` checkpoint-hook role)."""
    x0 = jnp.zeros_like(b) if x0 is None else x0
    M = M or (lambda v: v)

    bnorm = jnp.sqrt(_dot(b, b))
    tol2 = jnp.maximum(atol, rtol * bnorm) ** 2

    def cond(state):
        x, r, p, Ap, k = state
        return (_dot(r, r) > tol2) & (k < max_iter)

    def body(state):
        x, r, p, Ap, k = state
        pAp = _dot(p, Ap)
        alpha = _dot(r, p) / pAp
        x = x + alpha * p
        r = r - alpha * Ap
        z = M(r)
        # flexible step: orthogonalize against previous direction
        Az = A(z)
        beta = -_dot(Az, p) / pAp
        p = z + beta * p
        Ap = Az + beta * Ap
        return (x, r, p, Ap, k + 1)

    if resume_state is None:
        r0 = b - A(x0)
        p0 = M(r0)
        Ap0 = A(p0)
        state = (x0, r0, p0, Ap0, jnp.asarray(0))
    else:
        state = resume_state
    final = jax.lax.while_loop(cond, body, state)
    x, r, _, _, k = final
    res = FCGResult(x=x, iterations=k, residual_norm=jnp.sqrt(_dot(r, r)))
    return (res, final) if return_state else res
