"""True hp (mixed per-element degree) operators by subspace conjugation.

The reference supports per-element degrees everywhere (element payload
`deg`/`deg_quad`, `Mesh/d4est_element_data.h:13-46`; mortars project both
sides onto the max-degree mortar space, `Mesh/d4est_mortars.h:77-79`).
SURVEY.md hard-part #5 warns that degree-heterogeneous batching risks a
compile blowup if done with per-degree buckets.

TPU-first resolution — *padding + conjugation*, zero extra compiles:

- Fields on an hp mesh are stored as PADDED nodal arrays at the storage
  degree `deg = max_e deg_e`: element `e`'s coefficients live in the
  low-index `(deg_e+1)^dim` corner block; the rest are structural zeros.
- Let `P` be the block-diagonal per-element p-prolongation (exact
  polynomial embedding `V_hp → V_max`).  The Galerkin operator of the
  SIPG form on the true hp space is EXACTLY

      A_hp = Pᵀ · A_max · P

  because traces/gradients/jumps of `P û` equal those of `û` (P is an
  embedding, not an approximation), while the penalty σ is built from the
  TRUE degrees (`build_mesh(deg_e=...)`).  So one uniform-degree kernel
  (`apply_sipg`) serves every degree mixture; only the cheap [E, n, n]
  per-element 1D prolongations vary, gathered from a (deg+1)-entry table.
- The same conjugation gives the hp mass matrix, load vector, and
  block-diagonal probes (P is block-diagonal, so `neighbors="zero"`
  probing still yields exact per-element blocks — the Schwarz/block-Jacobi
  path works unchanged).

Equivalence to the reference's mortar-degree construction: both evaluate
the same face integrals of the same piecewise polynomials; the reference
integrates on the max(deg⁻,deg⁺) mortar with its quadrature, we integrate
on the storage-degree face with storage quadrature — identical whenever
the quadrature is exact (affine elements), and a quadrature-degree
refinement of each other on curved ones.
"""

from __future__ import annotations

from functools import lru_cache, partial

import jax
import jax.numpy as jnp
import numpy as np

from disco4est_tpu.mesh.builder import MeshData
from disco4est_tpu.laplacian import sipg as _sipg
from disco4est_tpu.ops.operators import DB


@lru_cache(maxsize=None)
def _prolong_table_np(deg_max: int) -> np.ndarray:
    """[deg_max+1, n, n]: padded 1D p-prolongation per true degree.
    Column block [:, :d+1] = `DB.p_prolong(d, deg_max)`; zero elsewhere."""
    n = deg_max + 1
    T = np.zeros((n, n, n))
    for d in range(1, deg_max + 1):  # degree 0 unused (reference min deg 1)
        T[d, :, : d + 1] = DB.p_prolong(d, deg_max)
    return T


@lru_cache(maxsize=None)
def _restrict_table_np(deg_max: int) -> np.ndarray:
    """[deg_max+1, n, n]: padded 1D L2 p-restriction per true degree.
    Row block [:d+1, :] = `DB.p_restrict(deg_max, d)` (L2 projection,
    `d4est_operators_build_p_restrict_1d`)."""
    n = deg_max + 1
    T = np.zeros((n, n, n))
    for d in range(1, deg_max + 1):  # degree 0 unused (reference min deg 1)
        T[d, : d + 1, :] = DB.p_restrict(deg_max, d)
    return T


def _row_apply_axes(mats, u, dim: int):
    """Per-element 1D matrix along every tensor axis: mats [E, n, n]."""
    for dir_ in range(dim):
        ax = u.ndim - 1 - dir_
        v = jnp.moveaxis(u, ax, -1)
        v = jnp.einsum("eab,e...b->e...a", mats, v)
        u = jnp.moveaxis(v, -1, ax)
    return u


def _gathered(table_np, mesh: MeshData, dtype, transpose=False):
    T = jnp.asarray(table_np, dtype)
    if transpose:
        T = jnp.swapaxes(T, -1, -2)
    return T[mesh.deg_e]


def prolong_padded(u_own, deg_e, deg_storage: int, dim: int):
    """Mesh-free variant of `to_max` (for AMR transfer before the new
    MeshData exists): padded own-degree coefficients -> nodal field at
    `deg_storage`."""
    mats = jnp.asarray(_prolong_table_np(deg_storage), u_own.dtype)[
        jnp.asarray(deg_e)
    ]
    return _row_apply_axes(mats, u_own, dim)


def restrict_padded(u_max, deg_e, deg_storage: int, dim: int):
    """Mesh-free variant of `restrict_to_own` (L2 projection)."""
    mats = jnp.asarray(_restrict_table_np(deg_storage), u_max.dtype)[
        jnp.asarray(deg_e)
    ]
    return _row_apply_axes(mats, u_max, dim)


def to_max(mesh: MeshData, u_own):
    """P û: padded own-degree coefficients -> storage-degree nodal field."""
    mats = _gathered(_prolong_table_np(mesh.deg), mesh, u_own.dtype)
    return _row_apply_axes(mats, u_own, mesh.dim)


def adjoint_to_own(mesh: MeshData, r_max):
    """Pᵀ r: storage-degree residual -> hp-space residual (padded)."""
    mats = _gathered(
        _prolong_table_np(mesh.deg), mesh, r_max.dtype, transpose=True
    )
    return _row_apply_axes(mats, r_max, mesh.dim)


def restrict_to_own(mesh: MeshData, u_max):
    """L2-project a storage-degree field into the hp space (padded
    coefficients).  Exact on fields already in the hp space."""
    mats = _gathered(_restrict_table_np(mesh.deg), mesh, u_max.dtype)
    return _row_apply_axes(mats, u_max, mesh.dim)


def adjoint_restrict_to_storage(mesh: MeshData, r_own):
    """Rᵀ r: hp-space dual vector (padded) -> storage-degree dual — the
    adjoint of `restrict_to_own`, used by the hp-multigrid transfers."""
    mats = _gathered(
        _restrict_table_np(mesh.deg), mesh, r_own.dtype, transpose=True
    )
    return _row_apply_axes(mats, r_own, mesh.dim)


def own_mask(mesh: MeshData, dtype=jnp.float64):
    """[E, nl, ...]: 1 on an element's true coefficient block, 0 on the
    structural padding."""
    nl = mesh.deg + 1
    E = mesh.deg_e.shape[0]
    line = jnp.arange(nl)[None, :] <= mesh.deg_e[:, None]  # [E, nl]
    out = jnp.ones((E,) + (1,) * mesh.dim, bool)
    for d in range(mesh.dim):  # axis order (z, y, x); all axes same mask
        shape = [E] + [1] * mesh.dim
        shape[1 + d] = nl
        out = out & line.reshape(shape)
    return jnp.broadcast_to(out, (E,) + (nl,) * mesh.dim).astype(dtype)


def apply_sipg_hp(mesh: MeshData, u_own, g=None, **kw):
    """A_hp û = Pᵀ A_max (P û) — the exact Galerkin SIPG operator on the
    mixed-degree space (uniform meshes: P = I, reduces to `apply_sipg`)."""
    Au = _sipg.apply_sipg(mesh, to_max(mesh, u_own), g, **kw)
    return adjoint_to_own(mesh, Au)


def apply_mass_hp(mesh: MeshData, v_own):
    return adjoint_to_own(mesh, _sipg.apply_mass(mesh, to_max(mesh, v_own)))


@jax.jit
def build_rhs_with_strong_bc_hp(mesh: MeshData, f, g):
    """Pᵀ(M f − A_max(0; g)): the hp load vector with inhomogeneous
    Dirichlet data folded in (hp analog of
    `d4est_laplacian_build_rhs_with_strong_bc`)."""
    zeros = jnp.zeros_like(f)
    Au0 = _sipg.apply_sipg(mesh, zeros, g)
    return adjoint_to_own(mesh, _sipg.apply_mass(mesh, f) - Au0)


apply_sipg_hp_jit = jax.jit(
    apply_sipg_hp, static_argnames=("neighbors", "volume_mode")
)


# ---------------------------------------------------------------------------
# Own-degree (reference) conventions on hp meshes
# ---------------------------------------------------------------------------
#
# The reference computes per-element quantities at the element's OWN
# degree (`d4est_mesh.c:2299` L2 on own deg_quad; the bi estimator's
# volume term measures the own-basis residual vector,
# `d4est_estimator_bi_new.c:437-489`).  On affine meshes every quadrature
# involved is exact for the polynomial integrands, so the own-degree
# values are reproduced WITHOUT per-degree kernels: take the field's
# own-space nodal values (its hp coefficients), apply the nonpolynomial
# step there (|·| sampling, residual dual transform), then embed with the
# exact prolongation P and integrate at storage degree.


def init_field_own(mesh: MeshData, fcn):
    """Evaluate `fcn` at each element's OWN-degree Lobatto nodes, padded
    into the storage-degree corner block (`d4est_mesh_init_field` on hp
    meshes samples at per-element nodes)."""
    from disco4est_tpu.mesh.builder import _positions, _tensor_points

    dim = mesh.dim
    nl = mesh.deg + 1
    deg_e = np.asarray(mesh.deg_e)
    E = deg_e.shape[0]
    forest = mesh.forest
    from disco4est_tpu.mesh.tree import ROOT

    tree = jnp.asarray(forest.tree, jnp.int32)
    anchor = jnp.asarray(forest.anchor, jnp.float64) / ROOT
    hfrac = jnp.asarray(2.0 ** -forest.level.astype(np.float64))
    out = np.zeros((E,) + (nl,) * dim)
    for d in np.unique(deg_e):
        idx = np.where(deg_e == d)[0]
        pts = _tensor_points(DB.ops(int(d)).lobatto_nodes, dim)
        xyz = _positions(
            mesh.geom, tree[jnp.asarray(idx)], anchor[jnp.asarray(idx)],
            hfrac[jnp.asarray(idx)], pts,
        )  # [Ed, (d+1)...,dim]
        vals = np.asarray(
            fcn(*[xyz[..., c] for c in range(dim)])
        )
        out[np.ix_(idx, *[range(int(d) + 1)] * dim)] = vals
    return jnp.asarray(out)


def l2_norm_sqr_own(mesh: MeshData, v_own):
    """Per-element ∫ v² J dV where v is the own-degree polynomial with
    padded nodal coefficients `v_own` — exact storage-degree integration
    of the embedded function (affine meshes: identical to the reference's
    own-deg-quad value)."""
    return mesh.l2_norm_sqr(to_max(mesh, v_own * own_mask(mesh, v_own.dtype)))


def norm_L2_interp_abs_own(mesh: MeshData, u_max, analytic_fcn):
    """The reference regression 'L2': nodal ABSOLUTE error sampled at each
    element's OWN Lobatto nodes, interpolated as an own-degree polynomial,
    then L2-integrated (`d4est_linalg_vec_fabsdiff` + `compute_l2_norm_sqr`
    at own degree).  `u_max` is the storage-degree solution field."""
    u_own = restrict_to_own(mesh, u_max)  # exact: u is in the hp space
    ua_own = init_field_own(mesh, analytic_fcn).astype(u_max.dtype)
    e_abs = jnp.abs(u_own - ua_own)
    return jnp.sqrt(jnp.sum(l2_norm_sqr_own(mesh, e_abs)))


def residual_own_embedded(mesh: MeshData, F_max):
    """The reference estimator's volume-term residual function: the
    OWN-basis residual vector Pᵀ F interpreted as nodal values of an
    own-degree polynomial, embedded back to storage degree
    (`d4est_estimator_bi_new.c:437` measures Au−rhs in the element's own
    basis).  Pass the result as `estimate_bi`'s residual for hp parity."""
    return to_max(mesh, adjoint_to_own(mesh, F_max))
