"""Spectral-bound estimators: CG-Lanczos and power method.

Role of the reference's `Solver/d4est_solver_cg_eigs.c` (tridiagonal
Lanczos matrix built from CG alphas/betas, used for Chebyshev smoother
bounds) and `Solver/d4est_power_method.c`.
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp


def _dot(a, b):
    return jnp.vdot(a.reshape(-1), b.reshape(-1))


def cg_eigs(A: Callable, b, iters: int = 10):
    """Run `iters` CG iterations on A x = b and estimate the extreme
    eigenvalues of A from the CG tridiagonal (Lanczos) matrix.

    Returns (lmin, lmax).  The reference feeds lmax·multiplier and
    lmax/ratio into the Chebyshev smoother
    (`d4est_solver_multigrid_smoother_cheby.h:13-26`).
    """
    x = jnp.zeros_like(b)
    r = b
    p = r
    rr = _dot(r, r)

    def body(i, state):
        x, r, p, rr, alphas, betas = state
        Ap = A(p)
        pAp = _dot(p, Ap)
        alpha = rr / pAp
        x = x + alpha * p
        r = r - alpha * Ap
        rr_new = _dot(r, r)
        beta = rr_new / rr
        p = r + beta * p
        alphas = alphas.at[i].set(alpha)
        betas = betas.at[i].set(beta)
        return (x, r, p, rr_new, alphas, betas)

    alphas = jnp.zeros(iters, b.dtype)
    betas = jnp.zeros(iters, b.dtype)
    x, r, p, rr, alphas, betas = jax.lax.fori_loop(
        0, iters, body, (x, r, p, rr, alphas, betas)
    )
    # Lanczos tridiagonal from CG coefficients:
    # T_ii = 1/alpha_i + beta_{i-1}/alpha_{i-1}; T_{i,i+1} = sqrt(beta_i)/alpha_i
    prev = jnp.concatenate([jnp.zeros(1, b.dtype), betas[:-1] / alphas[:-1]])
    diag = 1.0 / alphas + prev
    off = jnp.sqrt(jnp.maximum(betas[:-1], 0.0)) / alphas[:-1]
    T = jnp.diag(diag) + jnp.diag(off, 1) + jnp.diag(off, -1)
    w = jnp.linalg.eigvalsh(T)
    return w[0], w[-1]


def power_method(A: Callable, v0, iters: int = 100):
    """Largest eigenvalue via power iteration (`d4est_power_method.c`)."""

    def body(i, state):
        v, lam = state
        w = A(v)
        lam = _dot(v, w) / _dot(v, v)
        v = w / jnp.sqrt(_dot(w, w))
        return (v, lam)

    v = v0 / jnp.sqrt(_dot(v0, v0))
    _, lam = jax.lax.fori_loop(0, iters, body, (v, jnp.asarray(0.0, v0.dtype)))
    return lam
