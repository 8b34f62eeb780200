"""Overlapping additive Schwarz — vertex-patch subdomains with node strips.

Role of the reference's full Schwarz subsystem (~5.5 kLoC,
`Solver/d4est_solver_schwarz_metadata.c:384-799` subdomain = center
element + all face/edge/corner neighbors with `num_nodes_overlap` 1D
nodes of overlap; `_schwarz_operators.c` restriction/weight tables;
`_schwarz_laplacian_ext.c` restricted SIPG apply on precomputed subdomain
geometry; `_subdomain_solver_{cg,gmres,ksp}.c` per-subdomain matrix-free
solves; `_schwarz.c:172-280` weighted correction).

TPU-first re-design — *replicated-subdomain batching*:

- Subdomain membership is computed once per mesh epoch (host): probe
  points just outside every face/edge/corner of each center element find
  all touching leaves (2:1 balance bounds the samples needed).
- All subdomains are materialized as ONE replicated `MeshData` whose
  elements are (subdomain, member) pairs plus a single zero "dummy"
  element.  Faces between two members of the same subdomain keep their
  real coupling; faces leaving the subdomain point at the dummy, whose
  fields/factors are identically zero — which makes the batched
  `apply_sipg` on the replicated mesh compute EXACTLY the restricted
  operator R_s A R_sᵀ of every subdomain simultaneously (the dummy
  contributes u⁺ = 0, ∂u⁺ = 0, i.e. the zero-extension semantics of the
  restriction).  No per-subdomain code path, no tree iteration.
- `num_nodes_overlap` node strips are a hard mask on the replicated
  field (the subdomain's true DOF set); the subdomain solves are a
  batched masked CG with per-subdomain α/β (segment-reduced dot
  products) — S independent Krylov solves in one jitted loop.
- Corrections are combined with partition-of-unity weights: a hat
  profile over the overlap strips, normalized by the accumulated weight
  so ΣᵀW = I exactly (the reference's weighted-correction sum,
  `d4est_solver_schwarz_helpers.c`).
"""

from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from disco4est_tpu.mesh.builder import MeshData, MeshAux
from disco4est_tpu.mesh.tree import Forest, ROOT, _canonicalize_points, _key_of
from disco4est_tpu.laplacian.sipg import apply_sipg


# ---------------------------------------------------------------------------
# membership (host, once per epoch)
# ---------------------------------------------------------------------------


def subdomain_members(forest: Forest, return_rel: bool = False):
    """For each element: sorted unique indices of it + every leaf sharing
    a face, edge, or corner (the reference's vertex-patch membership,
    `d4est_solver_schwarz_metadata.c`).

    With `return_rel=True` also returns `rel`: a dict mapping
    (element, neighbor) -> off tuple, where `off[a] ∈ {-1,0,1}` is the
    probe direction IN THE ELEMENT'S OWN FRAME through which it sees the
    neighbor.  Among multiple hits the off with the fewest nonzero axes
    wins — the reference classifies shared-face over shared-edge over
    shared-corner (`_schwarz_metadata.c:276-360`), and `rel[(e, s)]`
    plays the role of element e's `faces[]`/`core_faces[]` metadata for
    subdomain s.
    """
    from itertools import product

    dim = forest.dim
    E = forest.n_elements
    anchor = forest.anchor.astype(np.int64)
    h = (ROOT >> forest.level.astype(np.int64)).astype(np.int64)
    keys = forest._lookup_arrays()

    members = [{e} for e in range(E)]
    rel: dict = {}
    hf = h // 2  # finest possible neighbor size (2:1 balance)

    for off in product((-1, 0, 1), repeat=dim):
        if not any(off):
            continue
        nnz = sum(1 for o in off if o)
        # per-axis sample offsets relative to my anchor (x = axis 0)
        axis_samples = []
        for a in range(dim):
            o = off[a]
            if o < 0:
                axis_samples.append([-hf[:, None] // 2])
            elif o > 0:
                axis_samples.append([h[:, None] + hf[:, None] // 2])
            else:
                axis_samples.append(
                    [hf[:, None] // 2, h[:, None] - hf[:, None] // 2]
                )
        for combo in product(*axis_samples):
            pt = anchor.copy()
            for a in range(dim):
                pt[:, a] = anchor[:, a] + combo[a][:, 0]
            tree = forest.tree.astype(np.int32).copy()
            valid = np.ones(E, bool)
            pt2, tr, valid = _canonicalize_points(
                forest.conn, tree, pt, valid
            )
            if not valid.any():
                continue
            live = np.where(valid)[0]
            q = _key_of(tr[live], pt2[live], dim)
            idx = np.searchsorted(keys, q, side="right") - 1
            for e, n in zip(live, idx):
                members[e].add(int(n))
                key = (int(e), int(n))
                prev = rel.get(key)
                if prev is None or nnz < sum(1 for o in prev if o):
                    rel[key] = off
    out = [np.array(sorted(m), np.int64) for m in members]
    if return_rel:
        return out, rel
    return out


# ---------------------------------------------------------------------------
# replicated mesh construction
# ---------------------------------------------------------------------------


@dataclasses.dataclass
class OverlappingSchwarz:
    """M r ≈ Σ_s R_sᵀ W_s A_s⁻¹ R_s r (additive, PoU-weighted)."""

    rep_mesh: MeshData  # replicated mesh, last element = zero dummy
    member: jnp.ndarray  # [S, K] global element per slot (dummy slot: E)
    valid: jnp.ndarray  # [S, K] bool
    mask: jnp.ndarray  # [S, K, nl...] hard DOF restriction
    weight: jnp.ndarray  # [S, K, nl...] PoU weights (already normalized)
    iterations: int  # subdomain CG iterations
    shape: tuple  # (E, nl, ...) of the global field
    hp: bool = False  # subdomain operator = A_hp (mixed-degree meshes)

    # -- preconditioner apply ---------------------------------------------
    def __call__(self, r):
        return _schwarz_apply(self, r)


def _flatten_os(s):
    return (
        (s.rep_mesh, s.member, s.valid, s.mask, s.weight),
        (s.iterations, s.shape, s.hp),
    )


def _unflatten_os(aux, ch):
    return OverlappingSchwarz(
        rep_mesh=ch[0], member=ch[1], valid=ch[2], mask=ch[3], weight=ch[4],
        iterations=aux[0], shape=aux[1], hp=aux[2],
    )


jax.tree_util.register_pytree_node(OverlappingSchwarz, _flatten_os, _unflatten_os)


def _quintic_phi(r: np.ndarray) -> np.ndarray:
    """phi(r): quintic hat edge, clipped to sign(r) outside [-1, 1]
    (`d4est_solver_schwarz_operators.c:7-27`)."""
    r = np.asarray(r, np.float64)
    poly = (15.0 * r - 10.0 * r**3 + 3.0 * r**5) / 8.0
    return np.where(r < -1.0, -1.0, np.where(r > 1.0, 1.0, poly))


def _hat_weight(r: np.ndarray, d0: float) -> np.ndarray:
    """poly_hat_weight_fcn: w(r) = ½(phi((r+1)/d0) − phi((r−1)/d0));
    telescopes to an exact partition of unity across the core and its
    ±2-shifted neighbors when d0 ≤ 2.  d0 = 0 (num_nodes_overlap = 1:
    only the face layer overlaps) is taken in the limit: the step
    partition with weight ½ exactly on the shared face (the reference's
    formula divides by zero there)."""
    r = np.asarray(r, np.float64)
    if d0 == 0.0:
        return 0.5 * (np.sign(r + 1.0) - np.sign(r - 1.0))
    return 0.5 * (_quintic_phi((r + 1.0) / d0) - _quintic_phi((r - 1.0) / d0))


def _schwarz_weights_1d(nl: int, rs: int):
    """The reference's 1D weight table
    (`d4est_solver_schwarz_operators_build_schwarz_weights_1d`):
    returns (w_core[nl], w_left[rs], w_right[rs]) where `left/right` name
    the subdomain element's position relative to the core; d0 = overlap
    size in rst space = 1 − r_{nl−rs}."""
    from disco4est_tpu.ops.operators import DB

    r = np.asarray(DB.ops(nl - 1).lobatto_nodes, np.float64)
    d0 = 1.0 - r[nl - rs]
    w_core = _hat_weight(r, d0)
    w_left = _hat_weight(r[nl - rs:] - 2.0, d0)   # its LAST rs nodes
    w_right = _hat_weight(r[:rs] + 2.0, d0)       # its FIRST rs nodes
    return w_core, w_left, w_right


def build_overlapping_schwarz(
    mesh: MeshData,
    num_nodes_overlap: int = 1,
    iterations: int = 15,
    hp: bool = False,
) -> OverlappingSchwarz:
    """Construct the replicated-subdomain preconditioner for one epoch."""
    forest = mesh.forest
    ft = mesh.ft
    dim, nl, nq = mesh.dim, mesh.nl, mesh.nq
    E = mesh.n_elements
    nfaces = 2 * dim
    ov = int(num_nodes_overlap)

    mem_lists, rel = subdomain_members(forest, return_rel=True)
    K = max(len(m) for m in mem_lists)
    S = E
    member = np.full((S, K), E, np.int64)  # E = dummy slot
    valid = np.zeros((S, K), bool)
    slot_of = []  # per subdomain: global -> slot
    for s, m in enumerate(mem_lists):
        # center first (slot 0), then the rest
        rest = [e for e in m if e != s]
        row = [s] + rest
        member[s, : len(row)] = row
        valid[s, : len(row)] = True
        slot_of.append({e: k for k, e in enumerate(row)})

    R = S * K  # replicated count (dummy appended at index R)

    def rep_idx(s, e):
        k = slot_of[s].get(int(e), None)
        return None if k is None else s * K + k

    # ---- gather element-major arrays (dummy row = zeros) ----------------
    mem_flat = member.reshape(-1)  # [R] global index or E
    gather_src = np.concatenate([mem_flat, [E]])  # + dummy

    def g(arr):
        a = np.asarray(arr)
        padded = np.concatenate([a, np.zeros((1,) + a.shape[1:], a.dtype)], 0)
        return jnp.asarray(padded[gather_src])

    # ---- replicated face tables -----------------------------------------
    from disco4est_tpu.mesh.faces import BOUNDARY, CONF

    kind_g = ft.kind  # [E, 2d]
    nbr_g = np.asarray(mesh.nbr_elem)
    nbf_g = np.asarray(mesh.nbr_face)
    perm_l_g = np.asarray(mesh.perm_l)
    perm_q_g = np.asarray(mesh.perm_q)
    bnd_g = np.asarray(mesh.bnd_mask)

    nbr_elem = np.full((R + 1, nfaces), R, np.int64)
    nbr_face = np.zeros((R + 1, nfaces), np.int64)
    perm_l = np.zeros((R + 1, nfaces, nl ** (dim - 1)), np.int32)
    perm_q = np.zeros((R + 1, nfaces, nq ** (dim - 1)), np.int32)
    bnd_mask = np.zeros((R + 1, nfaces), bool)
    conf_mask = np.zeros((R + 1, nfaces), bool)

    for s in range(S):
        for k in range(K):
            if not valid[s, k]:
                continue
            e = member[s, k]
            r = s * K + k
            for f in range(nfaces):
                kd = kind_g[e, f]
                perm_l[r, f] = perm_l_g[e, f]
                perm_q[r, f] = perm_q_g[e, f]
                nbr_face[r, f] = nbf_g[e, f]
                if kd == BOUNDARY:
                    bnd_mask[r, f] = True
                    conf_mask[r, f] = True
                    nbr_elem[r, f] = r
                elif kd == CONF:
                    rr = rep_idx(s, nbr_g[e, f])
                    conf_mask[r, f] = True
                    nbr_elem[r, f] = R if rr is None else rr
                # hanging faces (FINE/COARSE): conf_mask False, handled by
                # replicated hc rows below.

    # self-neighbor for padding/dummy rows (kept out of all masks)
    for r in range(R + 1):
        for f in range(nfaces):
            if nbr_elem[r, f] == R and not conf_mask[r, f]:
                pass  # fine: gathers from dummy are zeros anyway

    # ---- replicated hanging mortar rows ----------------------------------
    Kc = 1 << (dim - 1)
    hc_elem_g = np.asarray(mesh.hc_elem)
    hc_fine_g = np.asarray(mesh.hc_fine)
    M_g = len(hc_elem_g)
    rows = []  # (s, m, rep_coarse, rep_fine[Kc])
    for s in range(S):
        mem_set = slot_of[s]
        for m in range(M_g):
            ce = int(hc_elem_g[m])
            fines = [int(x) for x in hc_fine_g[m]]
            if ce not in mem_set and not any(x in mem_set for x in fines):
                continue
            rc = rep_idx(s, ce)
            rows.append(
                (
                    m,
                    R if rc is None else rc,
                    [
                        R if rep_idx(s, x) is None else rep_idx(s, x)
                        for x in fines
                    ],
                )
            )
    Mr = len(rows)
    fshape_q = (nq,) * (dim - 1)
    if Mr:
        m_idx = np.array([r[0] for r in rows], np.int64)
        hc = dict(
            hc_elem=jnp.asarray([r[1] for r in rows], jnp.int32),
            hc_face=jnp.asarray(np.asarray(mesh.hc_face)[m_idx], jnp.int32),
            hc_fine=jnp.asarray([r[2] for r in rows], jnp.int32),
            hc_fine_face=jnp.asarray(
                np.asarray(mesh.hc_fine_face)[m_idx], jnp.int32
            ),
            hc_perm_l=jnp.asarray(np.asarray(mesh.hc_perm_l)[m_idx]),
            hc_perm_q=jnp.asarray(np.asarray(mesh.hc_perm_q)[m_idx]),
            hc_sj=jnp.asarray(np.asarray(mesh.hc_sj)[m_idx]),
            hc_n=jnp.asarray(np.asarray(mesh.hc_n)[m_idx]),
            hc_drst_m=jnp.asarray(np.asarray(mesh.hc_drst_m)[m_idx]),
            hc_sigma=jnp.asarray(np.asarray(mesh.hc_sigma)[m_idx]),
            hf_perm_l=jnp.asarray(
                np.asarray(mesh.hf_perm_l).reshape(M_g, Kc, -1)[m_idx].reshape(
                    Mr * Kc, -1
                )
            ),
            hf_perm_q=jnp.asarray(
                np.asarray(mesh.hf_perm_q).reshape(M_g, Kc, -1)[m_idx].reshape(
                    Mr * Kc, -1
                )
            ),
        )
    else:
        hc = dict(
            hc_elem=jnp.zeros((0,), jnp.int32),
            hc_face=jnp.zeros((0,), jnp.int32),
            hc_fine=jnp.zeros((0, Kc), jnp.int32),
            hc_fine_face=jnp.zeros((0, Kc), jnp.int32),
            hc_perm_l=jnp.zeros((0, Kc, nl ** (dim - 1)), jnp.int32),
            hc_perm_q=jnp.zeros((0, Kc, nq ** (dim - 1)), jnp.int32),
            hc_sj=jnp.zeros((0, Kc) + fshape_q),
            hc_n=jnp.zeros((0, Kc, dim) + fshape_q),
            hc_drst_m=jnp.zeros((0, Kc, dim, dim) + fshape_q),
            hc_sigma=jnp.zeros((0, Kc)),
            hf_perm_l=jnp.zeros((0, nl ** (dim - 1)), jnp.int32),
            hf_perm_q=jnp.zeros((0, nq ** (dim - 1)), jnp.int32),
        )

    compact = {
        k: (None if getattr(mesh, k) is None else g(getattr(mesh, k)))
        for k in ("j_c", "drdx_c", "wjgg_c", "face_sj_c", "face_n_c")
    }
    rep_mesh = MeshData(
        dim=dim,
        deg=mesh.deg,
        deg_quad=mesh.deg_quad,
        quad=mesh.quad,
        aux=MeshAux(geom=mesh.geom, forest=forest, ft=ft),
        affine=mesh.affine,
        orient_codes=mesh.orient_codes,
        orient_code=g(mesh.orient_code),
        deg_e=g(mesh.deg_e),
        xyz_lobatto=g(mesh.xyz_lobatto),
        xyz_quad=g(mesh.xyz_quad),
        j_quad=g(mesh.j_quad),
        wjgg=g(mesh.wjgg),
        face_xyz_lobatto=g(mesh.face_xyz_lobatto),
        face_xyz_quad=g(mesh.face_xyz_quad),
        face_sj=g(mesh.face_sj),
        face_n=g(mesh.face_n),
        face_drst=g(mesh.face_drst),
        face_h=g(mesh.face_h),
        volume=g(mesh.volume),
        area=g(mesh.area),
        sigma=g(mesh.sigma),
        sigma_q=None if mesh.sigma_q is None else g(mesh.sigma_q),
        nbr_elem=jnp.asarray(nbr_elem, jnp.int32),
        nbr_face=jnp.asarray(nbr_face, jnp.int32),
        perm_l=jnp.asarray(perm_l),
        perm_q=jnp.asarray(perm_q),
        bnd_mask=jnp.asarray(bnd_mask),
        conf_mask=jnp.asarray(conf_mask),
        **hc,
        **compact,
    )

    # ---- masks & weights: the reference's quintic-hat scheme -------------
    # NB (ADVICE r4): the hat telescopes to Σ w = 1 only across CONFORMING
    # neighbor pairs; near hanging mortars the subdomain weights over/
    # under-count nodes exactly as the reference's scheme does.  Harmless
    # for correctness (Schwarz sits inside flexible CG / MG smoothing) but
    # smoother quality degrades slightly on adapted levels.
    # Restriction (mask) keeps `ov` node layers along every axis through
    # which the member touches the core, in the MEMBER'S OWN frame
    # (`apply_schwarz_restrictor` with `ed.faces`); weights are the
    # quintic-hat partition of unity: the side-block hat on touching
    # axes, the CORE hat profile on the remaining axes (the reference
    # populates every axis with the core weights first,
    # `apply_schwarz_weights`, `_schwarz_operators.c`), and no
    # normalization — the hat telescopes to Σ w = 1 exactly on
    # conforming meshes.
    w_core_1d, w_left_1d, w_right_1d = _schwarz_weights_1d(nl, ov)

    mask = np.zeros((S, K) + (nl,) * dim)
    weight = np.zeros((S, K) + (nl,) * dim)
    m_core_1d = np.ones(nl)
    m_low = np.zeros(nl)
    m_low[:ov] = 1.0  # core at my LOW side: keep my first ov layers
    m_high = np.zeros(nl)
    m_high[nl - ov:] = 1.0
    w_low = np.zeros(nl)
    w_low[:ov] = w_right_1d  # I'm RIGHT of the core
    w_high = np.zeros(nl)
    w_high[nl - ov:] = w_left_1d  # I'm LEFT of the core

    for s in range(S):
        for k in range(K):
            if not valid[s, k]:
                continue
            e = member[s, k]
            if e == s:
                mask[s, k] = 1.0
                ww = w_core_1d
                for _ in range(dim - 1):
                    ww = np.multiply.outer(ww, w_core_1d)
                weight[s, k] = ww
                continue
            off = rel.get((int(e), int(s)))
            per_axis_m = []
            per_axis_w = []
            for a in range(dim):
                o = 0 if off is None else off[a]
                if o < 0:  # core at my LOW side along my axis a
                    per_axis_m.append(m_low)
                    per_axis_w.append(w_low)
                elif o > 0:
                    per_axis_m.append(m_high)
                    per_axis_w.append(w_high)
                else:
                    per_axis_m.append(m_core_1d)
                    per_axis_w.append(w_core_1d)
            wm = per_axis_m[dim - 1]
            ww = per_axis_w[dim - 1]
            for a in range(dim - 2, -1, -1):
                wm = np.multiply.outer(wm, per_axis_m[a])
                ww = np.multiply.outer(ww, per_axis_w[a])
            mask[s, k] = wm
            weight[s, k] = ww

    return OverlappingSchwarz(
        rep_mesh=rep_mesh,
        member=jnp.asarray(member, jnp.int32),
        valid=jnp.asarray(valid),
        mask=jnp.asarray(mask),
        weight=jnp.asarray(weight),
        iterations=iterations,
        shape=(E,) + (nl,) * dim,
        hp=hp,
    )


# ---------------------------------------------------------------------------
# apply (jitted): restrict -> batched masked CG -> weighted scatter
# ---------------------------------------------------------------------------


@jax.jit
def _schwarz_apply(s: OverlappingSchwarz, r):
    S, K = s.member.shape
    dim_shape = r.shape[1:]
    E = r.shape[0]
    dtype = r.dtype

    r_pad = jnp.concatenate(
        [r, jnp.zeros((1,) + dim_shape, dtype)], axis=0
    )  # dummy source row
    b = r_pad[s.member] * s.mask.astype(dtype)  # [S, K, nl...]

    if s.hp:
        from disco4est_tpu.laplacian.hp import apply_sipg_hp as _op
    else:
        _op = apply_sipg

    def A(v):  # v [S, K, nl...] masked
        v_rep = v.reshape((S * K,) + dim_shape)
        v_rep = jnp.concatenate(
            [v_rep, jnp.zeros((1,) + dim_shape, dtype)], axis=0
        )
        # The barriers are load-bearing: without them XLA:TPU fuses the
        # reshape/concat into the operator and MISCOMPILES (observed on
        # v5e: A(b) off by O(10%), CG then diverges; CPU exact).  The
        # barrier pins the replicated field as a materialized buffer.
        v_rep = jax.lax.optimization_barrier(v_rep)
        Av = jax.lax.optimization_barrier(_op(s.rep_mesh, v_rep))
        Av = Av[:-1].reshape(v.shape)
        return Av * s.mask.astype(dtype)

    def dot(a_, b_):  # per-subdomain dots [S]
        return jnp.sum((a_ * b_).reshape(S, -1), axis=1)

    def bcast(al):  # [S] -> [S, 1, 1...]
        return al.reshape((S,) + (1,) * (b.ndim - 1))

    # batched CG, fixed iterations (the reference's subdomain_solver with
    # an iteration cap; per-subdomain α/β via segment dots)
    x0 = jnp.zeros_like(b)
    rr0 = dot(b, b)

    def body(i, st):
        x, rs, p, rr = st
        Ap = A(p)
        pAp = dot(p, Ap)
        alpha = jnp.where(pAp > 0, rr / jnp.where(pAp > 0, pAp, 1.0), 0.0)
        x = x + bcast(alpha) * p
        rs = rs - bcast(alpha) * Ap
        rr_new = dot(rs, rs)
        beta = jnp.where(rr > 0, rr_new / jnp.where(rr > 0, rr, 1.0), 0.0)
        p = rs + bcast(beta) * p
        return (x, rs, p, rr_new)

    x, _, _, _ = jax.lax.fori_loop(0, s.iterations, body, (x0, b, b, rr0))

    # weighted scatter-add back to the global field
    contrib = (x * s.weight.astype(dtype)).reshape((S * K,) + dim_shape)
    out = jnp.zeros((E + 1,) + dim_shape, dtype)
    out = out.at[s.member.reshape(-1)].add(contrib)
    return out[:E]


def overlap_schwarz_smooth(A, M: OverlappingSchwarz, b, x, iterations: int = 2,
                           damping: float = 1.0):
    """Schwarz-smoothed iterations (`multigrid_smoother_schwarz` role)."""

    def body(i, x):
        return x + damping * M(b - A(x))

    return jax.lax.fori_loop(0, iterations, body, x)


# ---------------------------------------------------------------------------
# K-slot gather variant (chunked): O(index tables) resident memory
# ---------------------------------------------------------------------------
#
# The replicated-subdomain design above materializes every factor array
# S*K ≈ 27× (BENCH r4 schwarz_memory: 10.7 GB extrapolated at E=32768).
# This variant stores only INDEX tables + per-(s,k) weight CODES and
# gathers the factor rows from the GLOBAL mesh arrays inside the apply,
# processing `chunk` subdomains at a time under lax.scan — peak transient
# memory is chunk*K factor rows, independent of E (the reference's
# per-subdomain `d4est_solver_schwarz_geometric_data` reads, batched).
#
# Weight compression: every (subdomain, member) mask/weight is an outer
# product over axes of one of {low, high, core} 1D profiles selected by
# the member's probe direction `off` — 3^dim cases plus "invalid", so the
# [S, K, nl^dim] arrays collapse to int8 codes + a [3^dim+1, nl^dim]
# table.


@dataclasses.dataclass
class SchwarzKSlot:
    """Chunked K-slot overlapping Schwarz (same math as
    OverlappingSchwarz; memory O(S*K) ints instead of O(S*K*nq^dim)
    floats)."""

    mesh: MeshData  # the GLOBAL mesh (shared, not copied)
    member: jnp.ndarray  # [S_pad, K] global element (E = dummy)
    valid: jnp.ndarray  # [S_pad, K] bool
    codes: jnp.ndarray  # [S_pad, K] int32 mask/weight code (3^dim = invalid)
    mask_table: jnp.ndarray  # [3^dim+1, nl...]
    weight_table: jnp.ndarray  # [3^dim+1, nl...]
    nbr_slot: jnp.ndarray  # [S_pad, K, 2d] int32 in [0, K] (K = dummy)
    bnd: jnp.ndarray  # [S_pad, K, 2d] bool
    conf: jnp.ndarray  # [S_pad, K, 2d] bool
    # hanging mortar rows, grouped per chunk ([nchunk, Mc, ...]; slots
    # local to the chunk, C*K = trash)
    hc: dict
    chunk: int
    iterations: int
    shape: tuple
    hp: bool = False

    def __call__(self, r):
        return _kslot_apply(self, r)


def _flatten_ks(s):
    return (
        (s.mesh, s.member, s.valid, s.codes, s.mask_table, s.weight_table,
         s.nbr_slot, s.bnd, s.conf, s.hc),
        (s.chunk, s.iterations, s.shape, s.hp),
    )


def _unflatten_ks(aux, ch):
    return SchwarzKSlot(
        mesh=ch[0], member=ch[1], valid=ch[2], codes=ch[3], mask_table=ch[4],
        weight_table=ch[5], nbr_slot=ch[6], bnd=ch[7], conf=ch[8], hc=ch[9],
        chunk=aux[0], iterations=aux[1], shape=aux[2], hp=aux[3],
    )


jax.tree_util.register_pytree_node(SchwarzKSlot, _flatten_ks, _unflatten_ks)


def build_overlapping_schwarz_kslot(
    mesh: MeshData,
    num_nodes_overlap: int = 1,
    iterations: int = 15,
    chunk: int = 128,
    hp: bool = False,
) -> SchwarzKSlot:
    from disco4est_tpu.mesh.faces import BOUNDARY, CONF

    forest = mesh.forest
    ft = mesh.ft
    dim, nl, nq = mesh.dim, mesh.nl, mesh.nq
    E = mesh.n_elements
    nfaces = 2 * dim
    ov = int(num_nodes_overlap)

    mem_lists, rel = subdomain_members(forest, return_rel=True)
    K = max(len(m) for m in mem_lists)
    S = E
    C = min(chunk, S)
    S_pad = ((S + C - 1) // C) * C
    nchunk = S_pad // C

    member = np.full((S_pad, K), E, np.int64)
    valid = np.zeros((S_pad, K), bool)
    codes = np.full((S_pad, K), 3**dim, np.int32)  # invalid
    slot_of = [dict() for _ in range(S_pad)]
    for s, m in enumerate(mem_lists):
        rest = [e for e in m if e != s]
        row = [s] + rest
        member[s, : len(row)] = row
        valid[s, : len(row)] = True
        slot_of[s] = {e: k for k, e in enumerate(row)}
        for k, e in enumerate(row):
            off = (0,) * dim if e == s else rel.get((int(e), int(s)))
            if off is None:
                off = (0,) * dim
            codes[s, k] = sum((off[a] + 1) * 3**a for a in range(dim))

    # mask/weight tables per code
    w_core_1d, w_left_1d, w_right_1d = _schwarz_weights_1d(nl, ov)
    m_core_1d = np.ones(nl)
    m_low = np.zeros(nl)
    m_low[:ov] = 1.0
    m_high = np.zeros(nl)
    m_high[nl - ov:] = 1.0
    w_low = np.zeros(nl)
    w_low[:ov] = w_right_1d
    w_high = np.zeros(nl)
    w_high[nl - ov:] = w_left_1d
    mask_table = np.zeros((3**dim + 1,) + (nl,) * dim)
    weight_table = np.zeros((3**dim + 1,) + (nl,) * dim)
    for code in range(3**dim):
        per_m, per_w = [], []
        for a in range(dim):
            o = (code // 3**a) % 3 - 1
            per_m.append(m_low if o < 0 else m_high if o > 0 else m_core_1d)
            per_w.append(w_low if o < 0 else w_high if o > 0 else w_core_1d)
        wm, ww = per_m[dim - 1], per_w[dim - 1]
        for a in range(dim - 2, -1, -1):
            wm = np.multiply.outer(wm, per_m[a])
            ww = np.multiply.outer(ww, per_w[a])
        mask_table[code] = wm
        weight_table[code] = ww

    # topology: neighbor SLOT within the subdomain (K = dummy)
    kind_g = ft.kind
    nbr_g = np.asarray(mesh.nbr_elem)
    nbr_slot = np.full((S_pad, K, nfaces), K, np.int32)
    bnd = np.zeros((S_pad, K, nfaces), bool)
    conf = np.zeros((S_pad, K, nfaces), bool)
    for s in range(S):
        for k in range(K):
            if not valid[s, k]:
                continue
            e = member[s, k]
            for f in range(nfaces):
                kd = kind_g[e, f]
                if kd == BOUNDARY:
                    bnd[s, k, f] = True
                    conf[s, k, f] = True
                    nbr_slot[s, k, f] = k
                elif kd == CONF:
                    conf[s, k, f] = True
                    nbr_slot[s, k, f] = slot_of[s].get(int(nbr_g[e, f]), K)

    # hanging mortar rows grouped per chunk
    Kc = 1 << (dim - 1)
    hc_elem_g = np.asarray(mesh.hc_elem)
    hc_fine_g = np.asarray(mesh.hc_fine)
    M_g = len(hc_elem_g)
    TRASH = C * K
    chunk_rows = [[] for _ in range(nchunk)]
    for s in range(S):
        mem_set = slot_of[s]
        c = s // C
        base = (s - c * C) * K
        for m in range(M_g):
            ce = int(hc_elem_g[m])
            fines = [int(x) for x in hc_fine_g[m]]
            if ce not in mem_set and not any(x in mem_set for x in fines):
                continue
            rc = mem_set.get(ce)
            chunk_rows[c].append(
                (
                    m,
                    TRASH if rc is None else base + rc,
                    [
                        TRASH if mem_set.get(x) is None else base + mem_set[x]
                        for x in fines
                    ],
                )
            )
    Mc = max((len(r) for r in chunk_rows), default=0)
    fshape_q = (nq,) * (dim - 1)
    nfl_flat = nl ** (dim - 1)
    nfq_flat = nq ** (dim - 1)
    hc = {}
    if Mc > 0:
        hc_elem = np.full((nchunk, Mc), TRASH, np.int64)
        hc_face = np.zeros((nchunk, Mc), np.int64)
        hc_fine = np.full((nchunk, Mc, Kc), TRASH, np.int64)
        hc_fine_face = np.zeros((nchunk, Mc, Kc), np.int64)
        hc_perm_l = np.zeros((nchunk, Mc, Kc, nfl_flat), np.int32)
        hc_perm_q = np.zeros((nchunk, Mc, Kc, nfq_flat), np.int32)
        hc_sj = np.zeros((nchunk, Mc, Kc) + fshape_q)
        hc_n = np.zeros((nchunk, Mc, Kc, dim) + fshape_q)
        hc_drst_m = np.zeros((nchunk, Mc, Kc, dim, dim) + fshape_q)
        hc_sigma = np.zeros((nchunk, Mc, Kc))
        hc_sigma_q = (
            np.zeros((nchunk, Mc, Kc) + fshape_q)
            if mesh.hc_sigma_q is not None
            else None
        )
        hf_perm_l = np.zeros((nchunk, Mc * Kc, nfl_flat), np.int32)
        hf_perm_q = np.zeros((nchunk, Mc * Kc, nfq_flat), np.int32)
        hfa = np.asarray(mesh.hc_face)
        hffa = np.asarray(mesh.hc_fine_face)
        pla = np.asarray(mesh.hc_perm_l)
        pqa = np.asarray(mesh.hc_perm_q)
        sja = np.asarray(mesh.hc_sj)
        na = np.asarray(mesh.hc_n)
        da = np.asarray(mesh.hc_drst_m)
        siga = np.asarray(mesh.hc_sigma)
        sigqa = (
            np.asarray(mesh.hc_sigma_q)
            if mesh.hc_sigma_q is not None
            else None
        )
        fpl = np.asarray(mesh.hf_perm_l).reshape(M_g, Kc, -1)
        fpq = np.asarray(mesh.hf_perm_q).reshape(M_g, Kc, -1)
        for c in range(nchunk):
            for i, (m, rc, rfs) in enumerate(chunk_rows[c]):
                hc_elem[c, i] = rc
                hc_face[c, i] = hfa[m]
                hc_fine[c, i] = rfs
                hc_fine_face[c, i] = hffa[m]
                hc_perm_l[c, i] = pla[m]
                hc_perm_q[c, i] = pqa[m]
                hc_sj[c, i] = sja[m]
                hc_n[c, i] = na[m]
                hc_drst_m[c, i] = da[m]
                hc_sigma[c, i] = siga[m]
                if sigqa is not None:
                    hc_sigma_q[c, i] = sigqa[m]
                hf_perm_l[c, i * Kc:(i + 1) * Kc] = fpl[m]
                hf_perm_q[c, i * Kc:(i + 1) * Kc] = fpq[m]
        hc = dict(
            hc_elem=jnp.asarray(hc_elem, jnp.int32),
            hc_face=jnp.asarray(hc_face, jnp.int32),
            hc_fine=jnp.asarray(hc_fine, jnp.int32),
            hc_fine_face=jnp.asarray(hc_fine_face, jnp.int32),
            hc_perm_l=jnp.asarray(hc_perm_l),
            hc_perm_q=jnp.asarray(hc_perm_q),
            hc_sj=jnp.asarray(hc_sj),
            hc_n=jnp.asarray(hc_n),
            hc_drst_m=jnp.asarray(hc_drst_m),
            hc_sigma=jnp.asarray(hc_sigma),
            hf_perm_l=jnp.asarray(hf_perm_l),
            hf_perm_q=jnp.asarray(hf_perm_q),
        )
        if sigqa is not None:
            hc["hc_sigma_q"] = jnp.asarray(hc_sigma_q)

    return SchwarzKSlot(
        mesh=mesh,
        member=jnp.asarray(member, jnp.int32),
        valid=jnp.asarray(valid),
        codes=jnp.asarray(codes),
        mask_table=jnp.asarray(mask_table),
        weight_table=jnp.asarray(weight_table),
        nbr_slot=jnp.asarray(nbr_slot),
        bnd=jnp.asarray(bnd),
        conf=jnp.asarray(conf),
        hc=hc,
        chunk=C,
        iterations=iterations,
        shape=(E,) + (nl,) * dim,
        hp=hp,
    )


@jax.jit
def _kslot_apply(s: SchwarzKSlot, r):
    """M r: lax.scan over subdomain chunks; each chunk gathers its factor
    rows from the global mesh, runs the batched masked CG, and
    scatter-adds the weighted corrections."""
    mesh = s.mesh
    S_pad, K = s.member.shape
    C = s.chunk
    nchunk = S_pad // C
    dim = mesh.dim
    nfaces = 2 * dim
    E = r.shape[0]
    dim_shape = r.shape[1:]
    dtype = r.dtype
    R1 = C * K + 1  # chunk rows + dummy

    if s.hp:
        from disco4est_tpu.laplacian.hp import apply_sipg_hp as _op
    else:
        _op = apply_sipg

    import dataclasses as _dc

    def chunk_mesh(mem, val, nsl, bndc, confc, hcc):
        src = jnp.minimum(mem, E - 1)  # [C*K]
        vm = val.astype(jnp.float64)

        def gat(arr, mask=True):
            if arr is None:
                return None
            out = jnp.asarray(arr)[src]
            if mask:
                out = out * vm.reshape((C * K,) + (1,) * (out.ndim - 1)).astype(
                    out.dtype
                )
            out = jnp.concatenate(
                [out, jnp.zeros((1,) + out.shape[1:], out.dtype)], 0
            )
            return out

        def gat_raw(arr, dummy=0):
            out = jnp.asarray(arr)[src]
            pad = jnp.full((1,) + out.shape[1:], dummy, out.dtype)
            return jnp.concatenate([out, pad], 0)

        # neighbor table: slot -> chunk-local row (K = dummy -> C*K)
        offs = (jnp.arange(C, dtype=jnp.int32) * K)[:, None, None]
        nbr_local = jnp.where(
            nsl < K, offs + nsl, C * K
        ).reshape(C * K, nfaces)
        nbr_local = jnp.concatenate(
            [nbr_local, jnp.full((1, nfaces), C * K, jnp.int32)], 0
        )
        bnd_c = jnp.concatenate(
            [bndc.reshape(C * K, nfaces),
             jnp.zeros((1, nfaces), bool)], 0
        )
        conf_c = jnp.concatenate(
            [confc.reshape(C * K, nfaces),
             jnp.zeros((1, nfaces), bool)], 0
        )
        repl = dict(
            deg_e=gat_raw(mesh.deg_e, dummy=mesh.deg),
            xyz_lobatto=None,
            xyz_quad=None,
            j_quad=None,
            wjgg=gat(mesh.wjgg),
            face_xyz_lobatto=None,
            face_xyz_quad=None,
            face_sj=gat(mesh.face_sj),
            face_n=gat(mesh.face_n, mask=False),
            face_drst=gat(mesh.face_drst, mask=False),
            face_h=None,
            volume=None,
            area=None,
            sigma=gat(mesh.sigma),
            sigma_q=gat(mesh.sigma_q),
            nbr_elem=nbr_local,
            nbr_face=gat_raw(mesh.nbr_face),
            perm_l=gat_raw(mesh.perm_l),
            perm_q=gat_raw(mesh.perm_q),
            orient_code=gat_raw(mesh.orient_code),
            bnd_mask=bnd_c,
            conf_mask=conf_c,
            j_c=gat(mesh.j_c),
            drdx_c=gat(mesh.drdx_c, mask=False),
            wjgg_c=gat(mesh.wjgg_c),
            face_sj_c=gat(mesh.face_sj_c),
            face_n_c=gat(mesh.face_n_c, mask=False),
            rad_interp=None,
            rad_w=None,
            hang_code=None,
            hang_sigma=None,
        )
        if hcc:
            repl.update(hcc)
        else:
            Kc = 1 << (dim - 1)
            nl = mesh.deg + 1
            nq = mesh.deg_quad + 1
            fq = (nq,) * (dim - 1)
            repl.update(
                hc_elem=jnp.zeros((0,), jnp.int32),
                hc_face=jnp.zeros((0,), jnp.int32),
                hc_fine=jnp.zeros((0, Kc), jnp.int32),
                hc_fine_face=jnp.zeros((0, Kc), jnp.int32),
                hc_perm_l=jnp.zeros((0, Kc, nl ** (dim - 1)), jnp.int32),
                hc_perm_q=jnp.zeros((0, Kc, nq ** (dim - 1)), jnp.int32),
                hc_sj=jnp.zeros((0, Kc) + fq),
                hc_n=jnp.zeros((0, Kc, dim) + fq),
                hc_drst_m=jnp.zeros((0, Kc, dim, dim) + fq),
                hc_sigma=jnp.zeros((0, Kc)),
                hc_sigma_q=None,
                hf_perm_l=jnp.zeros((0, nl ** (dim - 1)), jnp.int32),
                hf_perm_q=jnp.zeros((0, nq ** (dim - 1)), jnp.int32),
            )
        if "hc_sigma_q" not in repl:
            repl["hc_sigma_q"] = None
        return _dc.replace(mesh, **repl)

    r_pad = jnp.concatenate([r, jnp.zeros((1,) + dim_shape, dtype)], 0)

    member_x = s.member.reshape(nchunk, C * K)
    valid_x = s.valid.reshape(nchunk, C * K)
    codes_x = s.codes.reshape(nchunk, C, K)
    nsl_x = s.nbr_slot.reshape(nchunk, C, K, nfaces)
    bnd_x = s.bnd.reshape(nchunk, C, K, nfaces)
    conf_x = s.conf.reshape(nchunk, C, K, nfaces)

    def body(out, xs):
        mem, val, cod, nsl, bndc, confc, hcc = xs
        cm = chunk_mesh(mem, val, nsl, bndc, confc, hcc)
        mask = s.mask_table[cod].astype(dtype)  # [C, K, nl...]
        weight = s.weight_table[cod].astype(dtype)

        b = r_pad[jnp.minimum(mem, E)].reshape((C, K) + dim_shape) * mask

        def A(v):
            v_rep = v.reshape((C * K,) + dim_shape)
            v_rep = jnp.concatenate(
                [v_rep, jnp.zeros((1,) + dim_shape, dtype)], 0
            )
            # barriers: see _schwarz_apply (XLA:TPU fusion miscompile)
            v_rep = jax.lax.optimization_barrier(v_rep)
            Av = jax.lax.optimization_barrier(_op(cm, v_rep))
            return Av[:-1].reshape(v.shape) * mask

        def dot(a_, b_):
            return jnp.sum((a_ * b_).reshape(C, -1), axis=1)

        def bcast(al):
            return al.reshape((C,) + (1,) * (b.ndim - 1))

        x0 = jnp.zeros_like(b)
        rr0 = dot(b, b)

        def cg(i, st):
            x, rs, p, rr = st
            Ap = A(p)
            pAp = dot(p, Ap)
            alpha = jnp.where(
                pAp > 0, rr / jnp.where(pAp > 0, pAp, 1.0), 0.0
            )
            x = x + bcast(alpha) * p
            rs = rs - bcast(alpha) * Ap
            rr_new = dot(rs, rs)
            beta = jnp.where(rr > 0, rr_new / jnp.where(rr > 0, rr, 1.0), 0.0)
            p = rs + bcast(beta) * p
            return (x, rs, p, rr_new)

        x, _, _, _ = jax.lax.fori_loop(
            0, s.iterations, cg, (x0, b, b, rr0)
        )
        contrib = (x * weight).reshape((C * K,) + dim_shape)
        out = out.at[mem].add(contrib)
        return out, None

    hc_x = dict(s.hc)  # [nchunk, ...] leaves already chunk-major
    out0 = jnp.zeros((E + 1,) + dim_shape, dtype)
    out, _ = jax.lax.scan(
        body,
        out0,
        (member_x, valid_x, codes_x, nsl_x, bnd_x, conf_x, hc_x),
    )
    return out[:E]
