"""Restarted GMRES.

Role of the reference's PETSc `gmres` KSP option
(`d4est_solver_krylov_petsc.h:16-29`) and the Schwarz subdomain GMRES
(`d4est_solver_schwarz_subdomain_solver_gmres.c`).  Fixed-size Krylov
basis in a `lax.fori_loop` (static restart length) so the whole solve
compiles to one XLA program; Givens-free least-squares via on-host-free
`jnp.linalg.lstsq` on the small Hessenberg system.
"""

from __future__ import annotations

from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp


class GMRESResult(NamedTuple):
    x: jnp.ndarray
    residual_norm: jnp.ndarray
    iterations: jnp.ndarray


def _dot(a, b):
    return jnp.vdot(a.reshape(-1), b.reshape(-1))


def gmres_solve(
    A: Callable,
    b,
    x0=None,
    *,
    M: Callable | None = None,
    restart: int = 30,
    max_restarts: int = 20,
    atol: float = 1e-12,
    rtol: float = 1e-12,
) -> GMRESResult:
    """Left-preconditioned restarted GMRES(m)."""
    M = M or (lambda v: v)
    x0 = jnp.zeros_like(b) if x0 is None else x0
    shape = b.shape
    n = b.size
    dtype = b.dtype
    bnorm = jnp.sqrt(_dot(M(b), M(b)).real)
    tol = jnp.maximum(atol, rtol * bnorm)

    def arnoldi_cycle(x):
        r = M(b - A(x))
        beta = jnp.sqrt(_dot(r, r).real)

        V = jnp.zeros((restart + 1, n), dtype)
        H = jnp.zeros((restart + 1, restart), dtype)
        V = V.at[0].set(r.reshape(-1) / jnp.where(beta > 0, beta, 1.0))

        def body(j, carry):
            V, H = carry
            w = M(A(V[j].reshape(shape))).reshape(-1)
            # modified Gram-Schmidt
            def mgs(i, wh):
                w, H = wh
                h = jnp.vdot(V[i], w)
                return (w - h * V[i], H.at[i, j].set(h))

            w, H = jax.lax.fori_loop(0, j + 1, mgs, (w, H))
            hnorm = jnp.sqrt(jnp.vdot(w, w).real)
            H = H.at[j + 1, j].set(hnorm)
            V = V.at[j + 1].set(w / jnp.where(hnorm > 1e-30, hnorm, 1.0))
            return (V, H)

        V, H = jax.lax.fori_loop(0, restart, body, (V, H))
        e1 = jnp.zeros(restart + 1, dtype).at[0].set(beta)
        y, *_ = jnp.linalg.lstsq(H, e1)
        dx = (V[:restart].T @ y).reshape(shape)
        x = x + dx
        rnorm = jnp.sqrt(_dot(b - A(x), b - A(x)).real)
        return x, rnorm

    def cond(state):
        x, rnorm, k = state
        return (rnorm > tol) & (k < max_restarts)

    def body(state):
        x, _, k = state
        x, rnorm = arnoldi_cycle(x)
        return (x, rnorm, k + 1)

    r0 = jnp.sqrt(_dot(b - A(x0), b - A(x0)).real)
    x, rnorm, k = jax.lax.while_loop(cond, body, (x0, r0, jnp.asarray(0)))
    return GMRESResult(x=x, residual_norm=rnorm, iterations=k)
