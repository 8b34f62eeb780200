"""BoyenYorkModel: single Bowen-York black hole (Hamiltonian constraint
on an excised sphere).

Role of the reference's `Problems/BoyenYorkModel/boyen_york_model_fcns.h`:
solve, on the holed sphere r ∈ [R0, R2],

    −∇²ψ + h(x)·ψ⁻⁷ = 0,   h = ¾ (P²/r⁴)(1 − a²/r²)²,

with the exact Bowen-York solution as Dirichlet data:

    ψ = (1 + 2E/r + 6a²/r² + 2a²E/r³ + a⁴/r⁴)^{1/4},  E = √(P² + 4a²)

(`boyen_york_model_analytic_solution` :67-95, `_helmholtz_fcn` :110-128,
residual/jacobian nonlinear terms ψ⁻⁷ / −7ψ⁻⁸ :130-165).
"""

from __future__ import annotations

import dataclasses

import jax.numpy as jnp

from disco4est_tpu.mesh.builder import MeshData
from disco4est_tpu.laplacian.sipg import apply_sipg
from disco4est_tpu.laplacian.nonlinear import apply_mass_fof, apply_mass_fof_lin


@dataclasses.dataclass(frozen=True)
class BoyenYorkParams:
    a: float = 1.0
    P: float = 1.0

    @property
    def E(self) -> float:
        import math

        return math.sqrt(self.P**2 + 4.0 * self.a**2)

    def analytic(self, x, y, z):
        r2 = x * x + y * y + z * z
        r = jnp.sqrt(r2)
        a2 = self.a * self.a
        E = self.E
        s = (
            1.0
            + 2.0 * E / r
            + 6.0 * a2 / r2
            + 2.0 * a2 * E / (r * r2)
            + a2 * a2 / (r2 * r2)
        )
        return s**0.25

    boundary = analytic

    def initial_guess(self, x, y, z):
        return self.analytic(x, y, z)

    def helmholtz(self, x, y, z):
        r2 = x * x + y * y + z * z
        return (
            0.75
            * (self.P**2 / (r2 * r2))
            * (1.0 - self.a**2 / r2) ** 2
        )


def residual(mesh: MeshData, u, g, params: BoyenYorkParams):
    """F(ψ) = Aψ (dirichlet data g) − M[h·ψ⁻⁷].

    Sign note: the reference's `boyen_york_model_build_residual` ADDS
    +M[h·u⁻⁷] (fcns.h:130-145 with vec_axpy(+1)), which its own
    analytic solution does NOT satisfy (∇²ψ + hψ⁻⁷ = 0 for the exact
    Bowen-York conformal factor — verified by autodiff; the standard
    Hamiltonian-constraint sign, matching the TwoPunctures family's
    −⅛K²ψ⁻⁷ term).  BoyenYorkModel ships no regression digits, so we
    implement the physically consistent sign under which the analytic
    solution is exact and p-convergence is observable."""

    def fof(xyz, u_q):
        x, y, z = xyz
        return -params.helmholtz(x, y, z) / (u_q * u_q) ** 3.5

    Au = apply_sipg(mesh, u, g)
    return Au + apply_mass_fof(mesh, u, fof)


def jacobian_apply(mesh: MeshData, u0, v, params: BoyenYorkParams):
    """J(ψ₀)v = Av + M[7h·ψ₀⁻⁸ ⊙ v] (sign per `residual`)."""

    def dfof(xyz, u0_q):
        x, y, z = xyz
        return 7.0 * params.helmholtz(x, y, z) / (u0_q * u0_q) ** 4

    Av = apply_sipg(mesh, v)
    return Av + apply_mass_fof_lin(mesh, u0, v, dfof)
