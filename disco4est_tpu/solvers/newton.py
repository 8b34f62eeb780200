"""Newton-Krylov with backtracking line search.

Role of the reference's PETSc SNES wrapper
(`Solver/d4est_solver_newton_petsc.c:406-530`: matrix-free shell Jacobian
= `apply_lhs` with u0 frozen, inner KSP, cubic/backtracking line search)
and the in-house inexact Newton (`d4est_solver_newton.c:136-367`).

The outer loop runs on the host (few iterations; each inner solve is a
fully-jitted Krylov solve), mirroring how the reference alternates
host-side SNES control with matrix-free applies.
"""

from __future__ import annotations

import dataclasses
from typing import Callable, NamedTuple

import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class NewtonParams:
    atol: float = 1e-12
    rtol: float = 1e-50
    max_iter: int = 50
    # Eisenstat-Walker style inner tolerance (the in-house Newton uses
    # min(0.5, sqrt(||F||)) via `d4est_util_min_dbl`, newton.c:205).
    inner_rtol: float = 1e-3
    line_search_max: int = 8
    monitor: bool = False


class NewtonResult(NamedTuple):
    u: jnp.ndarray
    iterations: int
    residual_norm: float
    history: list


def newton_solve(
    residual: Callable,  # F(u)
    jacobian_solve: Callable,  # (u0, rhs, rtol) -> du  solving J(u0) du = rhs
    u0,
    params: NewtonParams = NewtonParams(),
    callback: Callable | None = None,  # (it, u, fnorm) per Newton iterate
) -> NewtonResult:
    """`callback`: invoked after every accepted Newton step — the
    reference checkpoints there every n iterations
    (`d4est_solver_newton_petsc.c:232-245`, `newton.c:325`)."""
    u = u0
    F = residual(u)
    fnorm = float(jnp.sqrt(jnp.vdot(F.reshape(-1), F.reshape(-1)).real))
    fnorm0 = fnorm
    history = [fnorm]
    for it in range(params.max_iter):
        if fnorm < params.atol or fnorm < params.rtol * fnorm0:
            break
        # Eisenstat–Walker-ish forcing term, floored by inner_rtol.
        inner_rtol = max(params.inner_rtol, min(0.5, fnorm**0.5))
        du = jacobian_solve(u, -F, inner_rtol)
        # backtracking line search on ||F||
        lam = 1.0
        for _ in range(params.line_search_max):
            u_try = u + lam * du
            F_try = residual(u_try)
            fnorm_try = float(
                jnp.sqrt(jnp.vdot(F_try.reshape(-1), F_try.reshape(-1)).real)
            )
            if fnorm_try < (1.0 - 1e-4 * lam) * fnorm or fnorm_try < fnorm:
                break
            lam *= 0.5
        u, F, fnorm = u_try, F_try, fnorm_try
        history.append(fnorm)
        if callback is not None:
            callback(it + 1, u, fnorm)
        if params.monitor:
            print(f"newton it {it + 1}: ||F|| = {fnorm:.14e} (lambda={lam})")
    return NewtonResult(
        u=u, iterations=len(history) - 1, residual_norm=fnorm, history=history
    )
