"""Poisson problem family (sinx, Lorentzian).

Role of the reference's `Problems/Poisson/*` drivers:
- sinx: u = Π sin(πx_d) on the unit brick (`poisson_sinx_fcns.h`; note the
  reference's π constant differs from math.pi at digit 13 — reproduced
  here for parity);
- Lorentzian: u = 1/√(1+r²), f = 3/(1+r²)^{5/2} on the 7-tree cubed
  sphere with compactified inner shell (`poisson_lorentzian_fcns.h`,
  `options_lorentzian_cg.input`: R0=5, R1=1000, compactify_inner).
"""

from __future__ import annotations

import jax.numpy as jnp

D4EST_PI = 3.14159265358932384626433832795  # reference's PI (sic)


class SinxProblem:
    dim = 3

    @staticmethod
    def analytic(*c):
        out = 1.0
        for x in c:
            out = out * jnp.sin(D4EST_PI * x)
        return out

    @staticmethod
    def rhs(*c):
        return len(c) * D4EST_PI**2 * SinxProblem.analytic(*c)

    boundary = analytic


class LorentzianProblem:
    dim = 3

    @staticmethod
    def analytic(x, y, z):
        r2 = x * x + y * y + z * z
        return 1.0 / jnp.sqrt(1.0 + r2)

    @staticmethod
    def rhs(x, y, z):
        r2 = x * x + y * y + z * z
        return 3.0 / (1.0 + r2) ** 2.5

    boundary = analytic
