"""hp-multigrid V-cycle with Chebyshev smoothing.

Role of the reference's `Solver/d4est_solver_multigrid.c` (1,603 LoC): its
V-cycle literally coarsens the live p4est inside the cycle
(`p4est_coarsen_ext` :984, re-balance :1027, restriction via iterate
:1071, refine back :1199) with per-level ghost/factor caches swapped by a
state machine.  TPU-first re-design (SURVEY.md §7): the ENTIRE level
hierarchy — coarse forests, their geometric factors, and the
prolongation/restriction index maps — is precomputed once per mesh epoch;
the V-cycle is then a pure jitted function over static levels.

- Prolongation coarse→fine: per-element hp-prolong through the lineage
  (copy where the leaf is unchanged).
- Restriction of residuals: the transpose Σ_c P_cᵀ (adjoint of
  prolongation — correct for dual vectors with rediscretized coarse
  operators).
- Smoother: Chebyshev with CG-Lanczos spectral bounds per level
  (`d4est_solver_multigrid_smoother_cheby.c`), bounds re-estimated at
  setup per epoch (`cheby_eigs_*` options).
- Bottom solver: CG (`mg_bottom_solver_cg`).
"""

from __future__ import annotations

import dataclasses
from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np

from disco4est_tpu.mesh.builder import MeshData, build_mesh
from disco4est_tpu.ops.operators import DB
from disco4est_tpu.solvers.cheby import cheby_smooth
from disco4est_tpu.solvers.eigs import cg_eigs
from disco4est_tpu.solvers.cg import cg_solve


@dataclasses.dataclass(frozen=True)
class MGParams:
    n_smooth: int = 8  # cheby_imax
    eigs_cg_iters: int = 10  # cheby_eigs_cg_imax
    lmax_lmin_ratio: float = 30.0
    lmax_multiplier: float = 1.0
    bottom_iters: int = 100
    bottom_rtol: float = 1e-10
    vcycle_imax: int = 1
    vcycle_rtol: float = 1e-9
    vcycle_atol: float = 0.0


class MGLevelMap:
    """Index maps between a fine level and the next coarser level."""

    def __init__(self, src, bits, copy, n_coarse=None):
        self.src = jnp.asarray(src, jnp.int32)  # [Ef] coarse parent
        self.bits = jnp.asarray(bits, jnp.int32)  # [Ef, dim] child bits
        self.copy = jnp.asarray(copy)  # [Ef] unchanged leaves
        self.n_coarse = (
            n_coarse
            if n_coarse is not None
            else (int(np.asarray(src).max()) + 1 if len(src) else 0)
        )


jax.tree_util.register_pytree_node(
    MGLevelMap,
    lambda m: ((m.src, m.bits, m.copy), m.n_coarse),
    lambda aux, ch: MGLevelMap(*ch, n_coarse=aux),
)


class MGHierarchy:
    """Precomputed multigrid hierarchy for one mesh epoch (a pytree, so
    jitted cycles treat every level's factor arrays as runtime data)."""

    def __init__(self, meshes, maps, params: MGParams, bounds=None):
        self.meshes = meshes  # fine → coarse
        self.maps = maps  # maps[i]: level i -> level i+1
        self.params = params
        self.bounds = bounds  # jnp [L, 2] (lmin, lmax) per level

    @property
    def n_levels(self):
        return len(self.meshes)


jax.tree_util.register_pytree_node(
    MGHierarchy,
    lambda h: ((h.meshes, h.maps, h.bounds), h.params),
    lambda aux, ch: MGHierarchy(ch[0], ch[1], aux, bounds=ch[2]),
)


def build_hierarchy(
    mesh: MeshData, params: MGParams = MGParams(), max_levels: int | None = None
) -> MGHierarchy:
    from disco4est_tpu.amr.amr import element_lineage

    meshes = [mesh]
    maps = []
    forest = mesh.forest
    while max_levels is None or len(meshes) < max_levels:
        flags = np.ones(forest.n_elements, bool)
        coarse_forest, _ = forest.coarsen(flags)
        if coarse_forest.n_elements == forest.n_elements:
            break
        coarse_forest = coarse_forest.balance()
        src, child, dl = element_lineage(coarse_forest, forest)
        dim = forest.dim
        # child bits per axis for the (single-level) descent
        bits = np.stack([(child >> d) & 1 for d in range(dim)], axis=-1)
        bits[child < 0] = 0
        if (dl > 1).any():
            raise NotImplementedError(
                "multigrid coarsening produced a >1-level jump"
            )
        coarse_mesh = build_mesh(
            mesh.geom, coarse_forest, mesh.deg, mesh.quad, mesh.deg_quad
        )
        maps.append(MGLevelMap(src, bits, dl == 0))
        meshes.append(coarse_mesh)
        forest = coarse_forest
        if coarse_forest.n_elements <= 1:
            break
    return MGHierarchy(meshes, maps, params)


def _hp_mats(deg, dtype):
    return jnp.asarray(
        np.stack([DB.hp_prolong(deg, deg, c) for c in (0, 1)]), dtype
    )


def prolong(level_map: MGLevelMap, u_coarse, deg, dim):
    """coarse nodal field -> fine nodal field."""
    hp = _hp_mats(deg, u_coarse.dtype)
    vals = u_coarse[level_map.src]  # [Ef, nl...]
    out = vals
    for d in range(dim):
        mats = hp[level_map.bits[:, d]]  # [Ef, nl, nl]
        ax = out.ndim - 1 - d
        v = jnp.moveaxis(out, ax, -1)
        v = jnp.einsum("bij,b...j->b...i", mats, v)
        out = jnp.moveaxis(v, -1, ax)
    cshape = level_map.copy.reshape((-1,) + (1,) * dim)
    return jnp.where(cshape, vals, out)


def restrict(level_map: MGLevelMap, r_fine, deg, dim, n_coarse):
    """fine residual -> coarse residual via Σ P_cᵀ (prolongation adjoint)."""
    hp = _hp_mats(deg, r_fine.dtype)
    out = r_fine
    for d in range(dim):
        mats = hp[level_map.bits[:, d]]  # [Ef, nl, nl]
        ax = out.ndim - 1 - d
        v = jnp.moveaxis(out, ax, -1)
        v = jnp.einsum("bji,b...j->b...i", mats, v)  # transpose apply
        out = jnp.moveaxis(v, -1, ax)
    cshape = level_map.copy.reshape((-1,) + (1,) * dim)
    contrib = jnp.where(cshape, r_fine, out)
    rc = jnp.zeros((n_coarse,) + r_fine.shape[1:], r_fine.dtype)
    return rc.at[level_map.src].add(contrib)


def estimate_bounds(hier: MGHierarchy, A: Callable, seed_field):
    """Per-level Chebyshev spectral bounds via CG-Lanczos (setup-time).

    `A(mesh, u)` is the operator; `seed_field(mesh)` makes an RHS-like
    probe vector for the Lanczos run.
    """
    p = hier.params
    eigs_jit = jax.jit(
        lambda m, v: cg_eigs(lambda w: A(m, w), v, p.eigs_cg_iters)
    )
    bounds = []
    for mesh in hier.meshes:
        b = seed_field(mesh)
        _, lmax = eigs_jit(mesh, b)
        lmax = float(lmax) * p.lmax_multiplier
        bounds.append((lmax / p.lmax_lmin_ratio, lmax))
    hier.bounds = jnp.asarray(bounds)
    return bounds


def v_cycle(hier: MGHierarchy, A: Callable, b, x):
    """One V-cycle (jit-able; static level structure)."""
    p = hier.params
    deg = hier.meshes[0].deg
    dim = hier.meshes[0].dim

    def cycle(level, b_l, x_l):
        mesh = hier.meshes[level]
        lmin, lmax = hier.bounds[level, 0], hier.bounds[level, 1]
        A_l = lambda v: A(mesh, v)
        if level == hier.n_levels - 1:
            res = cg_solve(
                A_l, b_l, x0=x_l, atol=0.0, rtol=p.bottom_rtol,
                max_iter=p.bottom_iters,
            )
            return res.x
        x_l = cheby_smooth(A_l, b_l, x_l, lmin, lmax, p.n_smooth)
        r = b_l - A_l(x_l)
        lm = hier.maps[level]
        r_c = restrict(lm, r, deg, dim, hier.meshes[level + 1].n_elements)
        e_c = cycle(level + 1, r_c, jnp.zeros_like(r_c))
        x_l = x_l + prolong(lm, e_c, deg, dim)
        x_l = cheby_smooth(A_l, b_l, x_l, lmin, lmax, p.n_smooth)
        return x_l

    return cycle(0, b, x)


def mg_solve(hier: MGHierarchy, A: Callable, b, x0=None):
    """Standalone V-cycle iteration to tolerance
    (`d4est_solver_multigrid_solve` :1421)."""
    p = hier.params
    x = jnp.zeros_like(b) if x0 is None else x0
    vjit = jax.jit(lambda h, b_, x_: v_cycle(h, A, b_, x_))
    vjit = lambda b_, x_, _v=vjit: _v(hier, b_, x_)
    Ajit = jax.jit(lambda m, v: A(m, v))
    Ajit = lambda v, _a=Ajit: _a(hier.meshes[0], v)
    r0 = float(jnp.linalg.norm((b - Ajit(x)).reshape(-1)))
    hist = [r0]
    for _ in range(p.vcycle_imax):
        x = vjit(b, x)
        r = float(jnp.linalg.norm((b - Ajit(x)).reshape(-1)))
        hist.append(r)
        if r < p.vcycle_atol or r < p.vcycle_rtol * r0:
            break
    return x, hist


def mg_preconditioner(hier: MGHierarchy, A: Callable):
    """One V-cycle from zero initial guess as a Krylov preconditioner
    (`d4est_krylov_pc_multigrid.c`)."""

    def M(r):
        return v_cycle(hier, A, r, jnp.zeros_like(r))

    return M
