"""Okendon problem: power-law nonlinearity.

Role of the reference's `Problems/Okendon/okendon_fcns.h`:
    −∇²u + u^p = 0-style:  F(u) = A u + M[(u²)^{p/2}],
    J(u₀)v = A v + M[p·(u₀²)^{(p−1)/2} ⊙ v]
with analytic solution u = M_p · r^{2/(1−p)} (`okendon_fcns.h:86-92`,
M_p = [ (2/(1−p))·(1 + 2/(1−p)) ]^{1/(1−p)} in 3D... the reference's two
variants differ by the bracket; we use the 3D one :90).
"""

from __future__ import annotations

import dataclasses

import jax.numpy as jnp

from disco4est_tpu.mesh.builder import MeshData
from disco4est_tpu.laplacian.sipg import apply_sipg
from disco4est_tpu.laplacian.nonlinear import apply_mass_fof, apply_mass_fof_lin


@dataclasses.dataclass(frozen=True)
class OkendonParams:
    p: float = 0.5

    @property
    def Mp(self):
        q = 2.0 / (1.0 - self.p)
        return 1.0 / (q * (1.0 + q)) ** (1.0 / (1.0 - self.p))

    def analytic(self, x, y, z):
        r2 = x * x + y * y + z * z
        return self.Mp * r2 ** (1.0 / (1.0 - self.p))

    def boundary(self, x, y, z):
        return self.analytic(x, y, z)

    def initial_guess(self, x, y, z):
        return jnp.ones_like(x)


def residual(mesh: MeshData, u, g, params: OkendonParams):
    def fof(xyz, u_q):
        return (u_q * u_q + 1e-300) ** (0.5 * params.p)

    return apply_sipg(mesh, u, g) + apply_mass_fof(mesh, u, fof)


def jacobian_apply(mesh: MeshData, u0, v, params: OkendonParams):
    def dfof(xyz, u0_q):
        return params.p / (u0_q * u0_q + 1e-300) ** (0.5 * (1.0 - params.p))

    return apply_sipg(mesh, v) + apply_mass_fof_lin(mesh, u0, v, dfof)
