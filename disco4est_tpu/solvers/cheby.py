"""Chebyshev iteration / smoother.

Role of the reference's `Solver/d4est_solver_multigrid_smoother_cheby.c`:
Chebyshev polynomial smoothing on the interval [λmax/ratio, λmax·mult],
with λmax estimated by CG-Lanczos (`cg_eigs`).  Used as the multigrid
smoother and as a standalone bottom solver.
"""

from __future__ import annotations

import dataclasses
from typing import Callable

import jax
import jax.numpy as jnp

from disco4est_tpu.solvers.eigs import cg_eigs


@dataclasses.dataclass(frozen=True)
class ChebyParams:
    iterations: int = 8
    eigs_cg_iters: int = 10
    lmax_lmin_ratio: float = 30.0
    lmax_multiplier: float = 1.0


def cheby_smooth(A: Callable, b, x, lmin, lmax, iterations: int):
    """x ← Cheby(A, b, x): standard three-term Chebyshev acceleration of
    Richardson iteration on eigenvalue interval [lmin, lmax]."""
    theta = 0.5 * (lmax + lmin)
    delta = 0.5 * (lmax - lmin)
    sigma = theta / delta

    r = b - A(x)
    d = r / theta
    rho_old = 1.0 / sigma

    def body(i, state):
        x, r, d, rho_old = state
        x = x + d
        r = r - A(d)
        rho = 1.0 / (2.0 * sigma - rho_old)
        d = rho * rho_old * d + (2.0 * rho / delta) * r
        return (x, r, d, rho)

    x, r, d, _ = jax.lax.fori_loop(0, iterations - 1, body, (x, r, d, rho_old))
    x = x + d
    return x


def cheby_solve(A: Callable, b, x0=None, params: ChebyParams = ChebyParams()):
    """Standalone Chebyshev solve with self-estimated spectral bounds."""
    x0 = jnp.zeros_like(b) if x0 is None else x0
    _, lmax = cg_eigs(A, b, params.eigs_cg_iters)
    lmax = lmax * params.lmax_multiplier
    lmin = lmax / params.lmax_lmin_ratio
    return cheby_smooth(A, b, x0, lmin, lmax, params.iterations)
