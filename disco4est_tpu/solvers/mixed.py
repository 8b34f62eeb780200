"""Mixed-precision iterative refinement: f64 contract, f32 speed.

This is the framework's answer to SURVEY.md hard-part #4 ("float64
throughput on TPU — may need mixed-precision smoothers with f64 residual
correction to hit DOF/s targets").  The reference runs everything in
double (`d4est_solver_cg.c` on C doubles); on TPU the MXU runs f32/bf16
natively while f64 is emulated at ~10-50x lower throughput
(BENCH: f64 SIPG apply is ~60x slower than f32).  Classic iterative
refinement recovers the f64 digits while doing almost all the work in f32:

    x = 0                                 (f64)
    repeat:
        r = b - A(x)                      (f64 apply, ONE per outer step)
        d ~= A^{-1} r  via CG in f32      (inner solve, cheap)
        x = x + d                         (f64 update)
    until ||r|| <= tol

Each outer step contracts the error by roughly the inner solve's relative
accuracy (~1e-5 for a 1e-5-rtol f32 CG, floored near f32 epsilon), so a
handful of outer steps reach f64-level residuals.  The residual r is
SCALED to unit norm before the f32 cast — by the final steps ||r|| is
~1e-14·||b||, far below f32's normal range, and the scaling keeps the
inner problem perfectly conditioned in f32.

The digit tests (`tests/test_mixed.py`) assert that the CDS regression
digit 9.6078e-6 (`Tests/Regression/d4est_test_mpi.sh:5-10`) and a Poisson
solve are reproduced bit-comparably to the pure-f64 solver.  This defends
bench.py's f32 headline: f32 is the *inner* dtype of the production
solver, f64 remains the user-facing contract.
"""

from __future__ import annotations

from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp

from disco4est_tpu.solvers.cg import cg_solve


class MixedResult(NamedTuple):
    x: jnp.ndarray
    outer_iterations: jnp.ndarray
    inner_iterations: jnp.ndarray  # total inner (f32) Krylov iterations
    residual_norm: jnp.ndarray


def _dot(a, b):
    return jnp.vdot(a.reshape(-1), b.reshape(-1))


def mixed_refine_solve(
    A: Callable,
    b,
    x0=None,
    *,
    inner_solve: Callable | None = None,
    A32: Callable | None = None,
    M32: Callable | None = None,
    inner_rtol: float = 1e-5,
    inner_max_iter: int = 2000,
    atol: float = 5e-15,
    rtol: float = 1e-14,
    max_outer: int = 60,
) -> MixedResult:
    """Solve A x = b to f64 accuracy with f32 inner solves.

    `A` is the f64 matrix-free operator.  The inner correction solve is
    either `inner_solve(r32) -> (d32, iterations)` (e.g. a V-cycle or
    preconditioned CG in f32; `structured.make_inner_solve` has this
    shape) or, by default, CG on `A32` (defaults to `A` evaluated on
    f32 inputs — pass a dedicated f32-mesh closure to avoid casting the
    f64 factors on every apply).  All on-device (`lax.while_loop`).
    """
    b = jnp.asarray(b)
    x0 = jnp.zeros_like(b) if x0 is None else x0
    if inner_solve is None:
        A32_ = A32 or (lambda v: A(v.astype(b.dtype)).astype(jnp.float32))

        def inner_solve(r32):
            res = cg_solve(
                A32_, r32, M=M32, atol=0.0, rtol=inner_rtol,
                max_iter=inner_max_iter,
            )
            return res.x, res.iterations

    bnorm = jnp.sqrt(_dot(b, b))
    tol = jnp.maximum(atol, rtol * bnorm)

    def cond(state):
        x, r, rn, rn_prev, k, tot = state
        # stall exit: once the outer residual stops contracting (the
        # f32-representation floor, typically ~1e-13 relative on curved
        # meshes) further outer steps are wasted — and a DIVERGING inner
        # solve must not keep feeding garbage corrections
        progressing = (k < 3) | (rn < 0.9 * rn_prev)
        return (rn > tol) & (k < max_outer) & progressing

    def body(state):
        # the residual is carried in the loop state so each outer step
        # pays exactly ONE f64 apply (ADVICE r3: r at the top of body and
        # r2 at the bottom were the same quantity computed twice)
        x, r, rn, rn_prev, k, tot = state
        scale = jnp.where(rn > 0, rn, 1.0)
        r32 = (r / scale).astype(jnp.float32)
        d32, it = inner_solve(r32)
        x_new = x + scale * d32.astype(b.dtype)
        # barrier: XLA:TPU may misfuse the f64 apply with the loop-state
        # updates in composite jits (observed as a stalling outer
        # residual; same pathology as solvers/schwarz_overlap.py)
        x_new = jax.lax.optimization_barrier(x_new)
        r2 = b - jax.lax.optimization_barrier(A(x_new))
        rn2 = jnp.sqrt(_dot(r2, r2))
        # keep the BEST iterate: reject a step that grows the residual
        worse = rn2 > rn
        x_new = jnp.where(worse, x, x_new)
        r2 = jnp.where(worse, r, r2)
        rn_keep = jnp.minimum(rn2, rn)
        return (x_new, r2, rn_keep, rn, k + 1, tot + it)

    r0 = b - A(x0)
    rn0 = jnp.sqrt(_dot(r0, r0))
    state = (
        x0, r0, rn0, jnp.asarray(jnp.inf, rn0.dtype), jnp.asarray(0),
        jnp.asarray(0),
    )
    x, _, rn, _, k, tot = jax.lax.while_loop(cond, body, state)
    return MixedResult(
        x=x, outer_iterations=k, inner_iterations=tot, residual_norm=rn
    )


def mesh_astype(mesh, dtype):
    """Cast every float leaf of a MeshData pytree to `dtype` (int/bool
    tables untouched).  Use once per mesh epoch so the f32 inner solves
    read f32 factor arrays instead of casting f64 on every apply."""
    leaves, treedef = jax.tree_util.tree_flatten(mesh)
    leaves = [
        l.astype(dtype)
        if hasattr(l, "dtype") and l.dtype in (jnp.float64, jnp.float32)
        else l
        for l in leaves
    ]
    return jax.tree_util.tree_unflatten(treedef, leaves)
