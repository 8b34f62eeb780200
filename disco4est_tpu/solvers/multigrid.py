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
    # plugin selection (the reference's smoother/bottom factories,
    # `d4est_solver_multigrid.c:1509-1603`):
    #   smoother ∈ {"cheby", "schwarz", "schwarz_overlap", "none"}
    #     "schwarz" = zero-overlap element-block Jacobi;
    #     "schwarz_overlap" = the reference's overlapping vertex-patch
    #     Schwarz as MG smoother (`_smoother_schwarz.c:89`:
    #     schwarz_iterate per smoothing step, no damping)
    #   bottom   ∈ {"cg", "cheby", "reuse_smoother"}
    smoother: str = "cheby"
    bottom: str = "cg"
    schwarz_iterations: int = 3
    schwarz_damping: float = 2.0 / 3.0
    schwarz_overlap_nodes: int = 2
    schwarz_subdomain_iters: int = 15


class MGLevelMap:
    """Index maps between a fine level and the next coarser level.

    `bits` is the per-row CHILD-BIT PATH [Ef, D, dim] from the coarse
    ancestor down to the fine leaf (D = max descent depth over rows;
    rows shallower than D are padded with bit index 2 = identity), so
    balance cascades that leave a fine leaf several levels below its
    coarse ancestor restrict/prolong exactly (the reference handles the
    same through surrogate meshes, `multigrid.c:984-1071`)."""

    def __init__(self, src, bits, copy, n_coarse=None):
        self.src = jnp.asarray(src, jnp.int32)  # [Ef] coarse parent
        bits = jnp.asarray(bits, jnp.int32)
        if bits.ndim == 2:  # single-level descent convenience
            bits = bits[:, None, :]
        self.bits = bits  # [Ef, D, dim]
        self.copy = jnp.asarray(copy)  # [Ef] unchanged leaves
        self.n_coarse = (
            n_coarse
            if n_coarse is not None
            else (int(np.asarray(src).max()) + 1 if len(src) else 0)
        )


def _mglm_unflatten(aux, ch):
    # raw reconstruction: unflatten must not call jnp.asarray on the
    # children (jit lowering passes ArgInfo placeholders through pytrees)
    obj = object.__new__(MGLevelMap)
    obj.src, obj.bits, obj.copy = ch
    obj.n_coarse = aux
    return obj


jax.tree_util.register_pytree_node(
    MGLevelMap,
    lambda m: ((m.src, m.bits, m.copy), m.n_coarse),
    _mglm_unflatten,
)


class MGHierarchy:
    """Precomputed multigrid hierarchy for one mesh epoch (a pytree, so
    jitted cycles treat every level's factor arrays as runtime data)."""

    def __init__(self, meshes, maps, params: MGParams, bounds=None,
                 smoother_state=None, nl_blocks=None, hp=False):
        self.meshes = meshes  # fine → coarse
        self.maps = maps  # maps[i]: level i -> level i+1
        self.params = params
        self.bounds = bounds  # jnp [L, 2] (lmin, lmax) per level
        # per-level smoother state (e.g. BlockSchwarz inverse blocks)
        self.smoother_state = smoother_state
        # per-level frozen-u0 nonlinear blocks [E_l, n, n] (Newton-MG
        # matrix operator) or None
        self.nl_blocks = nl_blocks
        # True on mixed-degree (hp) meshes: level fields are padded
        # own-degree coefficients, transfers are conjugated with the
        # padded p-embeddings, and `A` must be `apply_sipg_hp`
        self.hp = hp

    @property
    def n_levels(self):
        return len(self.meshes)


jax.tree_util.register_pytree_node(
    MGHierarchy,
    lambda h: (
        (h.meshes, h.maps, h.bounds, h.smoother_state, h.nl_blocks),
        (h.params, h.hp),
    ),
    lambda aux, ch: MGHierarchy(
        ch[0], ch[1], aux[0], bounds=ch[2], smoother_state=ch[3],
        nl_blocks=ch[4], hp=aux[1],
    ),
)


def _bit_path(coarse_forest, fine_forest, src, dl):
    """Per-fine-leaf child-bit path [Ef, D, dim] from its coarse ancestor
    down to the leaf; rows shallower than D are padded with bit 2
    (identity)."""
    dim = fine_forest.dim
    Dmax = max(1, int(dl.max(initial=0)))
    bits = np.full((fine_forest.n_elements, Dmax, dim), 2, np.int32)
    from disco4est_tpu.mesh.tree import ROOT

    rel = fine_forest.anchor.astype(np.int64) - coarse_forest.anchor[
        src
    ].astype(np.int64)
    h_old = (ROOT >> coarse_forest.level[src].astype(np.int64)).astype(
        np.int64
    )
    for k in range(Dmax):
        # cell size at descent depth k+1 below the ancestor
        hk = h_old >> (k + 1)
        active = dl > k
        for d in range(dim):
            b = ((rel[:, d] // np.maximum(hk, 1)) & 1).astype(np.int32)
            bits[active, k, d] = b[active]
    return bits


def build_hierarchy(
    mesh: MeshData, params: MGParams = MGParams(), max_levels: int | None = None
) -> MGHierarchy:
    from disco4est_tpu.amr.amr import element_lineage

    deg_e = np.asarray(mesh.deg_e)
    hp = bool((deg_e != mesh.deg).any())
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
        bits = _bit_path(coarse_forest, forest, src, dl)
        if hp:
            # the reference's hp rule: a coarse parent takes the MIN
            # degree of its descendants
            # (`d4est_solver_multigrid_callbacks.h` coarsen_init)
            deg_c = np.full(coarse_forest.n_elements, mesh.deg, np.int64)
            np.minimum.at(deg_c, src, deg_e)
            coarse_mesh = build_mesh(
                mesh.geom, coarse_forest, mesh.deg, mesh.quad,
                mesh.deg_quad, deg_e=deg_c,
            )
            deg_e = deg_c
        else:
            coarse_mesh = build_mesh(
                mesh.geom, coarse_forest, mesh.deg, mesh.quad, mesh.deg_quad
            )
        maps.append(MGLevelMap(src, bits, dl == 0))
        meshes.append(coarse_mesh)
        forest = coarse_forest
        if coarse_forest.n_elements <= 1:
            break
    return MGHierarchy(meshes, maps, params, hp=hp)


def _hp_mats(deg, dtype):
    """[3, nl, nl]: child-0 prolong, child-1 prolong, identity (pad)."""
    return jnp.asarray(
        np.stack(
            [
                DB.hp_prolong(deg, deg, 0),
                DB.hp_prolong(deg, deg, 1),
                np.eye(deg + 1),
            ]
        ),
        dtype,
    )


def prolong(level_map: MGLevelMap, u_coarse, deg, dim):
    """coarse nodal field -> fine nodal field (multi-level descent)."""
    hp = _hp_mats(deg, u_coarse.dtype)
    vals = u_coarse[level_map.src]  # [Ef, nl...]
    out = vals
    D = level_map.bits.shape[1]
    for k in range(D):
        for d in range(dim):
            mats = hp[level_map.bits[:, k, d]]  # [Ef, nl, nl]
            ax = out.ndim - 1 - d
            v = jnp.moveaxis(out, ax, -1)
            v = jnp.einsum("bij,b...j->b...i", mats, v)
            out = jnp.moveaxis(v, -1, ax)
    cshape = level_map.copy.reshape((-1,) + (1,) * dim)
    return jnp.where(cshape, vals, out)


def restrict(level_map: MGLevelMap, r_fine, deg, dim, n_coarse):
    """fine residual -> coarse residual via Σ P_cᵀ (prolongation adjoint).

    The adjoint applies the per-depth child matrices transposed in
    REVERSE descent order."""
    hp = _hp_mats(deg, r_fine.dtype)
    out = r_fine
    D = level_map.bits.shape[1]
    for k in range(D - 1, -1, -1):
        for d in range(dim):
            mats = hp[level_map.bits[:, k, d]]  # [Ef, nl, nl]
            ax = out.ndim - 1 - d
            v = jnp.moveaxis(out, ax, -1)
            v = jnp.einsum("bji,b...j->b...i", mats, v)  # transpose apply
            out = jnp.moveaxis(v, -1, ax)
    cshape = level_map.copy.reshape((-1,) + (1,) * dim)
    contrib = jnp.where(cshape, r_fine, out)
    rc = jnp.zeros((n_coarse,) + r_fine.shape[1:], r_fine.dtype)
    return rc.at[level_map.src].add(contrib)


def prolong_mats(level_map: MGLevelMap, deg, dim, dtype):
    """Per-fine-row dense prolongation matrices P_e [Ef, n, n] (n = nl^dim)
    through the full descent path — the building block of the Newton-MG
    matrix operator (PᵀBP restriction of frozen-u0 blocks)."""
    hp = np.stack(
        [
            DB.hp_prolong(deg, deg, 0),
            DB.hp_prolong(deg, deg, 1),
            np.eye(deg + 1),
        ]
    )
    hp = jnp.asarray(hp, dtype)
    nl = deg + 1
    Ef, D = level_map.bits.shape[0], level_map.bits.shape[1]

    def kron3(ms):
        # ms: list over directions d=0..dim-1 of [Ef, nl, nl];
        # result acts on x-fastest flat node vectors.
        out = ms[dim - 1]
        for d in range(dim - 2, -1, -1):
            out = jnp.einsum("bij,bkl->bikjl", out, ms[d]).reshape(
                Ef, out.shape[1] * nl, out.shape[2] * nl
            )
        return out

    P = None
    for k in range(D):
        ms = [hp[level_map.bits[:, k, d]] for d in range(dim)]
        Pk = kron3(ms)
        P = Pk if P is None else jnp.einsum("bij,bjk->bik", Pk, P)
    eye = jnp.eye(nl**dim, dtype=dtype)
    return jnp.where(level_map.copy[:, None, None], eye, P)


def restrict_blocks(level_map: MGLevelMap, blocks, deg, dim, n_coarse):
    """Galerkin restriction of per-element dense blocks: B_c = Σ PᵀBP
    (`d4est_solver_multigrid_matrix_operator.h:1-21` role)."""
    P = prolong_mats(level_map, deg, dim, blocks.dtype)
    Bf = blocks  # [Ef, n, n]
    PtBP = jnp.einsum("bji,bjk,bkl->bil", P, Bf, P)
    out = jnp.zeros((n_coarse,) + blocks.shape[1:], blocks.dtype)
    return out.at[level_map.src].add(PtBP)


def set_matrix_operator(hier: MGHierarchy, blocks_fine):
    """Install frozen-u0 nonlinear blocks on the fine level and Galerkin-
    restrict them through the hierarchy (PᵀBP per level) — the reference's
    `d4est_solver_multigrid_matrix_operator` for Newton-MG.  `blocks_fine`
    [E0, n, n] is typically `assemble_nonlinear_blocks(mesh, u0)` of the
    problem's pointwise Jacobian term."""
    deg, dim = hier.meshes[0].deg, hier.meshes[0].dim
    blocks = [blocks_fine]
    for i, lm in enumerate(hier.maps):
        blocks.append(
            restrict_blocks(
                lm, blocks[-1], deg, dim, hier.meshes[i + 1].n_elements
            )
        )
    hier.nl_blocks = blocks
    return hier


def level_operator(hier: MGHierarchy, A: Callable, level: int):
    """The operator at a hierarchy level: base apply + (optional)
    restricted frozen-u0 nonlinear blocks."""
    mesh = hier.meshes[level]
    if hier.nl_blocks is None:
        return lambda v: A(mesh, v)
    B = hier.nl_blocks[level]

    def A_l(v):
        E = v.shape[0]
        extra = jnp.einsum(
            "eij,ej->ei", B.astype(v.dtype), v.reshape(E, -1)
        ).reshape(v.shape)
        return A(mesh, v) + extra

    return A_l


def mg_setup(hier: MGHierarchy, A: Callable, seed_field):
    """Per-level setup: Chebyshev spectral bounds via CG-Lanczos and/or
    smoother state (block-Schwarz inverse blocks), per the configured
    plugins.  `A(mesh, u)` is the operator; `seed_field(mesh)` makes an
    RHS-like probe vector for the Lanczos run."""
    p = hier.params
    bounds = []
    need_cheby = p.smoother == "cheby" or p.bottom in ("cheby",)
    for level, mesh in enumerate(hier.meshes):
        if need_cheby:
            b = seed_field(mesh)
            A_l = level_operator(hier, A, level)
            _, lmax = jax.jit(
                lambda v, _A=A_l: cg_eigs(_A, v, p.eigs_cg_iters)
            )(b)
            lmax = float(lmax) * p.lmax_multiplier
            bounds.append((lmax / p.lmax_lmin_ratio, lmax))
        else:
            bounds.append((0.0, 1.0))
    hier.bounds = jnp.asarray(bounds)
    if p.smoother == "schwarz_overlap":
        # the reference's overlapping Schwarz as MG smoother
        # (`d4est_solver_multigrid_smoother_schwarz_set_apply_lhs`:
        # one schwarz instance per level)
        from disco4est_tpu.solvers.schwarz_overlap import (
            build_overlapping_schwarz,
        )

        hier.smoother_state = [
            build_overlapping_schwarz(
                m,
                num_nodes_overlap=p.schwarz_overlap_nodes,
                iterations=p.schwarz_subdomain_iters,
            )
            for m in hier.meshes
        ]
    if p.smoother == "schwarz":
        # block-Schwarz smoother: exact element-diagonal blocks of the
        # base SIPG operator (+ the level's nonlinear blocks, which are
        # element-block-diagonal by construction).
        from disco4est_tpu.solvers.schwarz import (
            BlockSchwarz,
            assemble_diag_blocks,
        )

        state = []
        for level, m in enumerate(hier.meshes):
            blocks = assemble_diag_blocks(m)
            if hier.nl_blocks is not None:
                blocks = blocks + hier.nl_blocks[level].astype(blocks.dtype)
            state.append(BlockSchwarz(inv_blocks=jnp.linalg.inv(blocks)))
        hier.smoother_state = state
    return bounds


# Backward-compatible alias (round-1 name).
estimate_bounds = mg_setup


def v_cycle(hier: MGHierarchy, A: Callable, b, x):
    """One V-cycle (jit-able; static level structure) with pluggable
    smoother/bottom (`multigrid.c:752-1348` + factories :1509-1603)."""
    p = hier.params
    deg = hier.meshes[0].deg
    dim = hier.meshes[0].dim

    if p.smoother not in ("cheby", "schwarz", "schwarz_overlap", "none"):
        raise ValueError(f"unknown MG smoother {p.smoother!r}")
    if p.bottom not in ("cg", "cheby", "reuse_smoother"):
        raise ValueError(f"unknown MG bottom solver {p.bottom!r}")

    def smooth(level, A_l, b_l, x_l):
        if p.smoother == "none":
            return x_l
        if p.smoother == "schwarz_overlap":
            from disco4est_tpu.solvers.schwarz_overlap import (
                overlap_schwarz_smooth,
            )

            return overlap_schwarz_smooth(
                A_l, hier.smoother_state[level], b_l, x_l,
                iterations=p.schwarz_iterations, damping=1.0,
            )
        if p.smoother == "schwarz":
            from disco4est_tpu.solvers.schwarz import schwarz_smooth

            return schwarz_smooth(
                A_l, hier.smoother_state[level], b_l, x_l,
                iterations=p.schwarz_iterations, damping=p.schwarz_damping,
            )
        lmin, lmax = hier.bounds[level, 0], hier.bounds[level, 1]
        return cheby_smooth(A_l, b_l, x_l, lmin, lmax, p.n_smooth)

    def bottom(level, A_l, b_l, x_l):
        if p.bottom == "reuse_smoother":
            return smooth(level, A_l, b_l, x_l)
        if p.bottom == "cheby":
            lmin, lmax = hier.bounds[level, 0], hier.bounds[level, 1]
            return cheby_smooth(
                A_l, b_l, x_l, lmin, lmax, p.bottom_iters
            )
        res = cg_solve(
            A_l, b_l, x0=x_l, atol=0.0, rtol=p.bottom_rtol,
            max_iter=p.bottom_iters,
        )
        return res.x

    def transfer_down(level, r):
        """residual restriction level -> level+1 (hp: conjugated with
        the padded p-embeddings: r_c = P_cᵀ Tᵀ Rᵀ r)."""
        lm = hier.maps[level]
        n_c = hier.meshes[level + 1].n_elements
        if not hier.hp:
            return restrict(lm, r, deg, dim, n_c)
        from disco4est_tpu.laplacian.hp import (
            adjoint_restrict_to_storage,
            adjoint_to_own,
        )

        s = adjoint_restrict_to_storage(hier.meshes[level], r)
        s_c = restrict(lm, s, deg, dim, n_c)
        return adjoint_to_own(hier.meshes[level + 1], s_c)

    def transfer_up(level, e_c):
        """coarse-correction prolongation level+1 -> level (hp: the
        coarse hp function embeds exactly in the fine hp space under the
        min-degree rule; e_f = R T P_c e_c)."""
        lm = hier.maps[level]
        if not hier.hp:
            return prolong(lm, e_c, deg, dim)
        from disco4est_tpu.laplacian.hp import restrict_to_own, to_max

        e_s = prolong(lm, to_max(hier.meshes[level + 1], e_c), deg, dim)
        return restrict_to_own(hier.meshes[level], e_s)

    def cycle(level, b_l, x_l):
        A_l = level_operator(hier, A, level)
        if level == hier.n_levels - 1:
            return bottom(level, A_l, b_l, x_l)
        x_l = smooth(level, A_l, b_l, x_l)
        r = b_l - A_l(x_l)
        r_c = transfer_down(level, r)
        e_c = cycle(level + 1, r_c, jnp.zeros_like(r_c))
        x_l = x_l + transfer_up(level, e_c)
        x_l = smooth(level, A_l, b_l, x_l)
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
