"""Norms and convergence logging.

Role of the reference's `IO/d4est_norms.c`: L2 / L∞ / DG-energy norms with
global reduction, per-field `.norms` logs with headers
("num_quadrants num_nodes num_quad_nodes <value>"), and log-log
convergence-rate linear fits (`d4est_norms.h:15-22`,
`d4est_norms_linear_fit`).
"""

from __future__ import annotations

import dataclasses

import jax.numpy as jnp
import numpy as np

from disco4est_tpu.mesh.builder import MeshData


def norm_L2(mesh: MeshData, err):
    """sqrt of globally-summed ∫err² (`d4est_norms_fcn_L2`)."""
    return float(jnp.sqrt(jnp.sum(mesh.l2_norm_sqr(err))))


def norm_Linfty(err):
    return float(jnp.max(jnp.abs(err)))


def norm_energy(mesh: MeshData, err, apply_A):
    """DG energy norm sqrt(eᵀ A e) using the SIPG operator
    (`dGMath/d4est_ip_energy_norm.c` computes vol + interface + boundary
    terms via a mortar sweep; eᵀAe is the same quadratic form)."""
    Ae = apply_A(mesh, err)
    return float(
        jnp.sqrt(jnp.vdot(err.reshape(-1), Ae.reshape(-1)).real)
    )


@dataclasses.dataclass
class NormLog:
    """Accumulates per-AMR-level norms and fits convergence rates."""

    rows: list = dataclasses.field(default_factory=list)

    def add(self, mesh: MeshData, **norms):
        self.rows.append(
            {
                "num_quadrants": mesh.n_elements,
                "num_nodes": mesh.local_nodes,
                "num_quad_nodes": mesh.n_elements * mesh.nq**mesh.dim,
                **norms,
            }
        )

    def lines(self, key: str):
        """Reference-format log lines: 'num_quadrants num_nodes
        num_quad_nodes <value>' (`d4est_norms.c:328`)."""
        return [
            f"{r['num_quadrants']} {r['num_nodes']} {r['num_quad_nodes']} "
            f"{r[key]:.13g}"
            for r in self.rows
        ]

    def convergence_fit(self, key: str):
        """log(err) = C1 + C2·DOF^(1/dim) style linear fit
        (`d4est_norms.c:358` saves slope/intercept)."""
        dofs = np.array([r["num_nodes"] for r in self.rows], float)
        errs = np.array([r[key] for r in self.rows], float)
        mask = errs > 0
        if mask.sum() < 2:
            return None
        slope, intercept = np.polyfit(
            np.log(dofs[mask]), np.log(errs[mask]), 1
        )
        return {"slope": slope, "intercept": intercept}
