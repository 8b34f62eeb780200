"""Stamm problem: hp-AMR benchmark with an r³ line/point singularity.

Role of the reference's `Problems/Stamm/stamm_fcns.h`:
    u = x(1−x)·y(1−y)[·z(1−z)] · |x−c|³,   u = 0 on ∂[0,1]^dim,
with c the singular point ([problem] c2x/c2y/c2z; default 0.5,0.5,0.5 in
`Stamm/options.input`).  The solution has limited regularity at c, making
it the standard smooth_pred hp-AMR convergence test
(`d4est_test_stamm.sh`'s 4 pinned AMR-trajectory norms).

The reference transcribes a machine-generated closed form of f = −Δu
(~80 lines, `stamm_fcns.h:150-230`); here f comes from nested forward-mode
autodiff of the analytic solution — exact to roundoff, zero transcription
risk.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def neg_laplacian(fcn, dim: int):
    """Pointwise f(x...) = −Δ fcn via forward-over-forward autodiff,
    vmapped over arbitrary point-array shapes."""

    def u_at(p):
        return fcn(*[p[i] for i in range(dim)])

    hess = jax.hessian(u_at)

    def f(*coords):
        pts = jnp.stack([jnp.asarray(c) for c in coords], axis=-1)
        flat = pts.reshape(-1, dim)
        H = jax.vmap(hess)(flat)
        lap = jnp.trace(H, axis1=-2, axis2=-1)
        # the reference special-cases the singular point to 0
        # (`stamm_rhs_fcn`: `if (x == c2x && ...) return 0.`); autodiff
        # yields 0·∞ = NaN there — mask it the same way.
        lap = jnp.where(jnp.isfinite(lap), lap, 0.0)
        return -lap.reshape(jnp.shape(coords[0]))

    return f


class StammProblem:
    def __init__(self, c=(0.5, 0.5, 0.5), dim=3):
        self.c = c[:dim]
        self.dim = dim
        self.rhs = neg_laplacian(self.analytic, dim)

    def analytic(self, *coords):
        poly = 1.0
        for x in coords:
            poly = poly * x * (1.0 - x)
        r2 = sum((x - c) ** 2 for x, c in zip(coords, self.c))
        return poly * r2**1.5

    def boundary(self, *coords):
        return jnp.zeros_like(coords[0])
