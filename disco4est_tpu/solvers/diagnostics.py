"""Standalone solver diagnostics.

Roles of the reference's `Solver/d4est_solver_full_matrix.c` (dense
assembly by unit vectors), `d4est_solver_matrix_symmetry.c` (Aᵀ = A
check with mismatch reporting), and `d4est_solver_jacobian_tester.c`
(finite-difference Jacobian verification of a nonlinear problem's
`apply_lhs` against its `build_residual`).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def full_matrix(A, shape, dtype=jnp.float64) -> np.ndarray:
    """Dense matrix of the matrix-free operator by probing unit vectors
    (`d4est_solver_full_matrix`).  `A(u)` maps fields of `shape`; returns
    [N, N] with N = prod(shape)."""
    N = int(np.prod(shape))
    Ajit = jax.jit(A)
    cols = []
    v = np.zeros(N)
    for j in range(N):
        v[j] = 1.0
        cols.append(
            np.asarray(Ajit(jnp.asarray(v.reshape(shape), dtype))).reshape(-1)
        )
        v[j] = 0.0
    return np.stack(cols, axis=1)


def matrix_symmetry(A, shape, *, tol=1e-10, print_unequal_pairs=False):
    """Symmetry test (`d4est_solver_matrix_symmetry`,
    SYM_PRINT_UNEQUAL_PAIRS mode): returns (is_symmetric, max_asym,
    worst_pair)."""
    M = full_matrix(A, shape)
    D = M - M.T
    max_asym = float(np.abs(D).max())
    scale = max(float(np.abs(M).max()), 1e-300)
    i, j = np.unravel_index(np.argmax(np.abs(D)), D.shape)
    ok = max_asym <= tol * scale
    if print_unequal_pairs and not ok:
        bad = np.argwhere(np.abs(D) > tol * scale)
        for (a, b) in bad[:20]:
            print(
                f"[SYMMETRY] A[{a},{b}] = {M[a, b]:.15e} != "
                f"A[{b},{a}] = {M[b, a]:.15e}"
            )
    return ok, max_asym, (int(i), int(j))


def jacobian_test(residual, jacobian_apply, u0, *, n_dirs=5, eps=1e-6,
                  seed=0):
    """Finite-difference Jacobian check (`d4est_solver_jacobian_tester`):
    compares J(u0)v against (F(u0+εv) − F(u0−εv))/2ε for random v.
    Returns the max relative error over the probed directions."""
    rng = np.random.default_rng(seed)
    F0 = residual(u0)
    worst = 0.0
    for _ in range(n_dirs):
        v = jnp.asarray(rng.standard_normal(u0.shape))
        Jv = jacobian_apply(u0, v)
        fd = (residual(u0 + eps * v) - residual(u0 - eps * v)) / (2 * eps)
        num = float(jnp.max(jnp.abs(Jv - fd)))
        den = max(float(jnp.max(jnp.abs(Jv))), 1e-300)
        worst = max(worst, num / den)
    return worst
