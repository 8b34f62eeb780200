"""Tree-structured fast SIPG apply for CURVED uniform multi-tree meshes.

The production cubed-sphere row ran at ~25% of roofline: the general
apply's packed neighbor-row gather is a random-DMA floor (~51 GB/s
effective) and the face sweep tail is ~30 latency-bound ops.  On a
UNIFORM multi-tree mesh every tree is a regular lattice in lexicographic
order, so (as in `structured.py` for bricks, reference analog:
`p4est_iterate`'s cache-ordered face sweep, `Mesh/d4est_mortars.c:601`):

- ordering elements (tree, z, y, x) makes every INTRA-tree neighbor a
  constant offset {±1, ±nx, ±nx·ny} — the trace exchange becomes six
  `jnp.roll` shifts (pure streaming), with intra-tree orientation
  trivially the identity;
- per-quad-point factors (sj, pointwise σ, the NEW precomputed
  drstn = (∂r/∂x)·n) stream once per apply;
- the whole face math runs on [E, 2d, nfq] blocks and the volume lift is
  ONE GEMM against a static matrix that folds VᵀW + face placement + Dᵀ;
- the ~12% of directed faces crossing tree boundaries (plus nothing
  else: domain boundaries are handled in-sweep like the brick kernel)
  are re-done by a small subset pass — R-row gathers + per-row
  orientation perms + unique-index scatters per face.

Correctness contract: matches `apply_sipg` to roundoff (tests); serves
the f32 mixed-precision inner solve and the bench.
"""

from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp
import numpy as np

from disco4est_tpu.mesh.builder import MeshData
from disco4est_tpu.ops import tensor
from disco4est_tpu.ops.operators import DB
from disco4est_tpu.laplacian import sipg as _sipg


@dataclasses.dataclass
class TreeStructured:
    """Per-epoch compiled view of a uniform conforming multi-tree mesh."""

    dim: int
    deg: int
    deg_quad: int
    deltas: tuple  # per face: intra-tree lex offset
    R: int  # inter-tree rows (padded, per face: see it_*)
    # data (element-major arrays in LEX order)
    perm: jnp.ndarray  # [E] lex -> original
    inv_perm: jnp.ndarray  # [E] original -> lex
    drstn: jnp.ndarray  # [E, 2d, dim, nfq...] (∂r_l/∂x·n)
    sj: jnp.ndarray  # [E, 2d, nfq...]
    sigma_q: jnp.ndarray  # [E, 2d, nfq...] pointwise (or broadcast scalar)
    bnd: jnp.ndarray  # [E, 2d] domain-boundary flag
    tmask: jnp.ndarray  # [E, 2d] 1 = intra-tree conforming (kernel face)
    # inter-tree rows, grouped per face f: it_elem[f] unique lex rows
    it_elem: jnp.ndarray = None  # [RT] lex element of crossing faces
    it_face: jnp.ndarray = None  # [RT] own face id
    it_nbr_row: jnp.ndarray = None  # [RT] packed neighbor row
    it_code: jnp.ndarray = None  # [RT] orientation code
    it_sj: jnp.ndarray = None  # [RT, nfq_flat] static own-side factors
    it_sigq: jnp.ndarray = None  # [RT, nfq_flat]
    it_drstn: jnp.ndarray = None  # [RT, dim, nfq_flat]
    it_codes: tuple = ()  # static set of nonzero codes present

    @property
    def n_elements(self):
        return self.perm.shape[0]


jax.tree_util.register_dataclass(
    TreeStructured,
    data_fields=["perm", "inv_perm", "drstn", "sj", "sigma_q", "bnd",
                 "tmask", "it_elem", "it_face", "it_nbr_row", "it_code",
                 "it_sj", "it_sigq", "it_drstn"],
    meta_fields=["dim", "deg", "deg_quad", "deltas", "R", "it_codes"],
)


def build_tree_structured(mesh: MeshData):
    """Build the lex view, or None when unsupported (adapted meshes,
    mixed degrees, compact-factor-only meshes)."""
    forest = mesh.forest
    lv = np.asarray(forest.level)
    if lv.size == 0 or not np.all(lv == lv[0]):
        return None
    if mesh.hc_elem.shape[0] != 0:
        return None
    if bool((np.asarray(mesh.deg_e) != mesh.deg).any()):
        return None
    if mesh.face_drst is None:
        return None
    dim = mesh.dim
    nfaces = 2 * dim
    E = mesh.n_elements
    L = int(lv[0])
    n1 = 1 << L
    ntree = E // n1**dim
    if ntree * n1**dim != E:
        return None

    from disco4est_tpu.mesh.tree import ROOT

    tree = np.asarray(forest.tree)
    anchor = np.asarray(forest.anchor)
    h = ROOT >> L
    coords = anchor // h  # [E, dim] in-tree lattice coords
    strides = [n1**d for d in range(dim)]
    key = tree * n1**dim + sum(coords[:, d] * strides[d] for d in range(dim))
    perm = np.argsort(key, kind="stable")
    inv = np.empty(E, np.int64)
    inv[perm] = np.arange(E)

    nbr_e = np.asarray(mesh.nbr_elem)
    nbr_f = np.asarray(mesh.nbr_face)
    orient = np.asarray(mesh.orient_code)
    bnd_g = np.asarray(mesh.bnd_mask)

    deltas = []
    for f in range(nfaces):
        d_, s_ = divmod(f, 2)
        deltas.append((1 if s_ else -1) * strides[d_])

    # classify: tmask = intra-tree constant-offset faces (roll-able);
    # everything else (tree crossings; domain boundary handled in-sweep)
    # goes to the one-shot subset pass
    bnd = bnd_g[perm]
    tmask = np.zeros((E, nfaces), bool)
    flat_rows = []  # (f, lex row) of crossing faces
    same_tree = tree[:, None] == tree[nbr_e]
    for f in range(nfaces):
        for r in range(E):
            e = perm[r]
            if bnd_g[e, f]:
                continue
            ne = nbr_e[e, f]
            if (
                same_tree[e, f]
                and inv[ne] - r == deltas[f]
                and nbr_f[e, f] == (f ^ 1)
                and orient[e, f] == 0
            ):
                tmask[r, f] = True
            else:
                flat_rows.append((f, r))
    RT = max(len(flat_rows), 1)
    nq = mesh.nq
    nfq_flat = nq ** (dim - 1)
    it_elem = np.full(RT, E, np.int64)
    it_face = np.zeros(RT, np.int64)
    it_nbr_row = np.full(RT, E * nfaces, np.int64)
    it_code = np.zeros(RT, np.int32)
    for i, (f, r) in enumerate(flat_rows):
        e = perm[r]
        it_elem[i] = r
        it_face[i] = f
        it_nbr_row[i] = inv[nbr_e[e, f]] * nfaces + nbr_f[e, f]
        it_code[i] = orient[e, f]
    it_codes = tuple(sorted(set(int(c) for c in it_code) - {0}))
    R = RT

    # precomputed drstn = (∂r/∂x)·n : [E, 2d, dim, nfq...]
    fd = np.asarray(mesh.face_drst)
    fn = np.asarray(mesh.face_n)
    drstn = (fd * fn[:, :, None]).sum(3)[perm]
    sj = np.asarray(mesh.face_sj)[perm]
    ecl = np.minimum(it_elem, E - 1)
    it_sj = sj.reshape(E, nfaces, nfq_flat)[ecl, it_face]
    it_drstn = drstn.reshape(E, nfaces, dim, nfq_flat)[ecl, it_face]

    if mesh.sigma_q is not None:
        sigq = np.asarray(mesh.sigma_q)[perm]
    else:
        sigq = np.ascontiguousarray(
            np.asarray(mesh.sigma)[perm].reshape(
                (E, nfaces) + (1,) * (dim - 1)
            )
            * np.ones((1, 1) + sj.shape[2:])
        )
    it_sigq = sigq.reshape(E, nfaces, nfq_flat)[ecl, it_face]

    return TreeStructured(
        dim=dim, deg=mesh.deg, deg_quad=mesh.deg_quad,
        deltas=tuple(deltas), R=R,
        perm=jnp.asarray(perm, jnp.int32),
        inv_perm=jnp.asarray(inv, jnp.int32),
        drstn=jnp.asarray(drstn),
        sj=jnp.asarray(sj),
        sigma_q=jnp.asarray(sigq),
        bnd=jnp.asarray(bnd),
        tmask=jnp.asarray(tmask),
        it_elem=jnp.asarray(it_elem, jnp.int32),
        it_face=jnp.asarray(it_face, jnp.int32),
        it_nbr_row=jnp.asarray(it_nbr_row, jnp.int32),
        it_code=jnp.asarray(it_code),
        it_sj=jnp.asarray(it_sj),
        it_sigq=jnp.asarray(it_sigq),
        it_drstn=jnp.asarray(it_drstn),
        it_codes=it_codes,
    )


@functools.lru_cache(maxsize=None)
def _lift_q_mats(deg: int, deg_quad: int, quad_key, dim: int):
    """Static [2d*(1+dim)*nfq, nv] matrix mapping per-face QUAD-point
    terms (t13, t2_x, t2_y, t2_z) straight to volume contributions:
    rows fold diag(w)·V (Galerkin), face placement, and Dᵀ_l for the
    symmetry components."""
    from disco4est_tpu.quadrature.quadrature import Quadrature
    from disco4est_tpu.laplacian import fast as _fast

    bm = _fast._base_mats(deg, deg_quad, quad_key, dim)
    quad = Quadrature(quad_key)
    nl = deg + 1
    nq = deg_quad + 1
    V = quad.interp(deg, deg_quad)  # [nq, nl]
    _, w = quad.nodes_weights(deg_quad)
    VF = V
    for _ in range(dim - 2):
        VF = np.kron(VF, V)
    if dim == 3:
        VF = np.kron(V, V)  # [nfq_flat, nfl_flat], face kron
    wf = np.asarray(w)
    for _ in range(dim - 2):
        wf = np.multiply.outer(np.asarray(w), wf)
    wf = wf.reshape(-1)
    # rows for term t at quad -> Vᵀ(w t) at lobatto -> place/lift
    VW = (wf[:, None] * VF)  # [nfq, nfl]: t_q -> (VᵀW t)ᵀ rows
    rows = []
    for f in range(2 * dim):
        S = bm["sels"][f]  # [nfl, nv]
        rows.append(VW @ S)  # t13 lift
        for l in range(dim):
            rows.append(VW @ S @ bm["dvol"][l])  # t2_l lift (Dᵀ after)
    return np.concatenate(rows, axis=0)  # [2d*(1+dim)*nfq, nv]


def apply_tree_structured(ts: TreeStructured, mesh: MeshData, u_lex,
                          parts=("volume", "roll", "inter")):
    """Au in LEX order.  `u_lex`: [E, nl, ...] nodal field (lex order);
    `mesh` supplies the volume factors — pass the lex-permuted mesh from
    `permute_mesh_lex`.  `parts` is a BENCH-ABLATION flag (drop "volume"
    or pass "nosubst" to time stages); production callers use the
    default."""
    dim, deg, deg_quad = ts.dim, ts.deg, ts.deg_quad
    nl, nq = deg + 1, deg_quad + 1
    E = ts.n_elements
    dtype = u_lex.dtype
    nfaces = 2 * dim
    nfq_flat = nq ** (dim - 1)
    fshape_q = (nq,) * (dim - 1)

    D = jnp.asarray(DB.ops(deg).diff, dtype)
    Vq = jnp.asarray(mesh.quad.interp(deg, deg_quad), dtype)
    _, wq1 = mesh.quad.nodes_weights(deg_quad)

    u = u_lex
    dudr = [tensor.apply_axis(D, u, l) for l in range(dim)]

    # ---- volume (tensor path, supports per-element radial rules) -------
    from disco4est_tpu.mesh.builder import vol_interp

    Au = jnp.zeros_like(u)
    if "volume" in parts:
        t = [vol_interp(mesh, dudr[l]) for l in range(dim)]
        for lp in range(dim):
            s = jnp.zeros_like(t[0])
            for l in range(dim):
                s = s + mesh.wjgg[:, lp, l].astype(dtype) * t[l]
            s = vol_interp(mesh, s, transpose=True)
            Au = Au + tensor.apply_axis(D.T, s, lp)

    # ---- face traces at QUAD points ------------------------------------
    u_f = _sipg._face_slices(u, dim)  # [E, 2d, nfl...]
    dudr_f = jnp.stack(
        [_sipg._face_slices(dudr[l], dim) for l in range(dim)], axis=2
    )
    u_q = _sipg._face_apply(Vq, u_f, dim)  # [E, 2d, nfq...]
    du_q = _sipg._face_apply(Vq, dudr_f, dim)  # [E, 2d, dim, nfq...]
    drstn = ts.drstn.astype(dtype)
    sj = ts.sj.astype(dtype)
    sigq = ts.sigma_q.astype(dtype).reshape((E, nfaces) + fshape_q)
    dn = (drstn * du_q).sum(2)  # [E, 2d, nfq...]

    # ---- intra-tree faces: masked streaming rolls ----------------------
    ones = (1,) * (dim - 1)
    bnd_b = ts.bnd.reshape((E, nfaces) + ones)
    tm = ts.tmask.astype(dtype).reshape((E, nfaces) + ones)
    W = jnp.asarray(
        _lift_q_mats(deg, deg_quad, mesh.quad.kind, dim), dtype
    )
    zs = []
    for f in range(nfaces):
        u_pf = jnp.roll(u_q[:, f ^ 1], -ts.deltas[f], axis=0)
        dn_pf = jnp.roll(dn[:, f ^ 1], -ts.deltas[f], axis=0)
        b = bnd_b[:, f]
        u_pf = jnp.where(b, 0.0, u_pf)
        dn_pf = jnp.where(b, -dn[:, f], dn_pf)
        c2 = jnp.where(b, 2.0, 1.0).astype(dtype)
        m = jnp.where(b, jnp.ones_like(tm[:, f]), tm[:, f])
        jump = (u_q[:, f] - u_pf) * m
        t13 = (
            -0.5 * sj[:, f] * (dn[:, f] - dn_pf) * m
            + sj[:, f] * sigq[:, f] * jump
        )
        zs.append(t13.reshape(E, nfq_flat))
        t2 = (
            -0.5 * c2[:, None] * drstn[:, f]
            * (sj[:, f] * jump)[:, None]
        )
        zs.append(t2.reshape(E, dim * nfq_flat))
    Z = jnp.concatenate(zs, axis=1)
    Au = Au + (Z @ W).reshape(u.shape)

    # ---- crossing faces: ONE batch, one-hot matmul accumulation --------
    # (XLA fuses the iota-compare one-hot into the GEMM operand — the
    # accumulation runs on the MXU; scatter-add would serialize)
    if "nosubst" not in parts:
        Rp = ts.R
        packed = jnp.concatenate(
            [
                u_q.reshape(E, nfaces, nfq_flat),
                dn.reshape(E, nfaces, nfq_flat),
            ],
            axis=-1,
        ).reshape(E * nfaces, 2 * nfq_flat)
        packed = jnp.concatenate(
            [packed, jnp.zeros((1, 2 * nfq_flat), dtype)], axis=0
        )
        rows_c = jnp.minimum(ts.it_elem, E - 1)
        own = packed[rows_c * nfaces + ts.it_face]
        nbr = packed[jnp.minimum(ts.it_nbr_row, E * nfaces)]
        nbrq = nbr.reshape((Rp, 2) + fshape_q)
        nbrq = _sipg._apply_orient_codes(
            nbrq, ts.it_code[:, None], ts.it_codes, dim
        )
        up_r = nbrq[:, 0].reshape(Rp, nfq_flat)
        dn_r = nbrq[:, 1].reshape(Rp, nfq_flat)
        um_r = own[:, :nfq_flat]
        dnm_r = own[:, nfq_flat:]
        sj_r = ts.it_sj.astype(dtype)
        sg_r = ts.it_sigq.astype(dtype)
        dr_r = ts.it_drstn.astype(dtype)
        valid = (ts.it_elem < E).astype(dtype)[:, None]
        jump = (um_r - up_r) * valid
        t13 = -0.5 * sj_r * (dnm_r - dn_r) * valid + sj_r * sg_r * jump
        t2 = -0.5 * dr_r * (sj_r * jump)[:, None]
        Zr = jnp.concatenate(
            [t13[:, None], t2], axis=1
        ).reshape(Rp, (1 + dim) * nfq_flat)
        blocks = [
            Zr * (ts.it_face == f).astype(dtype)[:, None]
            for f in range(nfaces)
        ]
        Zbig = jnp.concatenate(blocks, axis=1)
        vol_r = Zbig @ W  # [RT, nv]
        onehot = jax.nn.one_hot(rows_c, E, dtype=dtype) * valid
        Au = Au + (onehot.T @ vol_r).reshape(u.shape)

    return Au
    # ---- inter-tree subset pass (ONE batch over all crossing faces) ----
    # two row gathers (neighbor + own traces), static factor rows, static
    # orientation-code transforms, one zero-padded GEMM against the lift
    # matrix, one one-hot matmul accumulation (no scatter-add).
    Rp = ts.R
    packed = jnp.concatenate(
        [
            u_q.reshape(E, nfaces, nfq_flat),
            dn.reshape(E, nfaces, nfq_flat),
        ],
        axis=-1,
    ).reshape(E * nfaces, 2 * nfq_flat)
    packed = jnp.concatenate(
        [packed, jnp.zeros((1, 2 * nfq_flat), dtype)], axis=0
    )
    rows_c = jnp.minimum(ts.it_elem, E - 1)
    own_rows = rows_c * nfaces + ts.it_face
    own = packed[own_rows]  # [RT, 2nfq]
    nbr = packed[jnp.minimum(ts.it_nbr_row, E * nfaces)]
    nbrq = nbr.reshape((Rp, 2) + fshape_q)
    nbrq = _sipg._apply_orient_codes(
        nbrq, ts.it_code[:, None], ts.it_codes, dim
    )
    up_r = nbrq[:, 0].reshape(Rp, nfq_flat)
    dn_r = nbrq[:, 1].reshape(Rp, nfq_flat)
    um_r = own[:, :nfq_flat]
    dnm_r = own[:, nfq_flat:]
    sj_r = ts.it_sj.astype(dtype)
    sg_r = ts.it_sigq.astype(dtype)
    dr_r = ts.it_drstn.astype(dtype)
    valid = (ts.it_elem < E).astype(dtype)[:, None]
    jump = (um_r - up_r) * valid
    t13 = -0.5 * sj_r * (dnm_r - dn_r) * valid + sj_r * sg_r * jump
    t2 = -0.5 * dr_r * (sj_r * jump)[:, None]
    Zr = jnp.concatenate(
        [t13[:, None], t2], axis=1
    ).reshape(Rp, (1 + dim) * nfq_flat)
    # place each row into its face block of the [2d*(1+dim)*nfq] layout
    blocks = [
        Zr * (ts.it_face == f).astype(dtype)[:, None]
        for f in range(nfaces)
    ]
    Zbig = jnp.concatenate(blocks, axis=1)  # [RT, 2d*(1+dim)*nfq]
    vol = Zbig @ W  # [RT, nv]
    vol = jnp.concatenate(
        [vol, jnp.zeros((1, vol.shape[1]), dtype)], axis=0
    )  # trash row for group pads
    per_el = vol[ts.it_group].sum(axis=1)  # [n_uniq, nv]
    rows_u = jnp.minimum(ts.it_uniq, E - 1)
    cur = Au.reshape(E, -1)[rows_u]
    upd = cur + per_el * (ts.it_uniq < E).astype(dtype)[:, None]
    Au = (
        Au.reshape(E, -1).at[rows_u].set(upd).reshape(u.shape)
    )  # unique rows: gather-add-set, no scatter-add lowering

    return Au


def permute_mesh_lex(ts: TreeStructured, mesh: MeshData) -> MeshData:
    """Element-major VOLUME arrays of the mesh in lex order (the face
    stage reads ts.* arrays; only the volume factors are needed here)."""
    import dataclasses as _dc

    p = np.asarray(ts.perm)

    def g(a):
        return None if a is None else jnp.asarray(np.asarray(a)[p])

    return _dc.replace(
        mesh,
        wjgg=g(mesh.wjgg),
        rad_interp=g(mesh.rad_interp),
        rad_w=g(mesh.rad_w),
        aux=mesh.aux,
    )


def to_lex(ts: TreeStructured, v):
    return v[ts.perm]


def from_lex(ts: TreeStructured, v):
    return v[ts.inv_perm]


def make_inner_solve(ts: TreeStructured, mesh_lex: MeshData, *,
                     rtol: float = 1e-4, max_iter: int = 400):
    """Inner-solve closure for `solvers.mixed.mixed_refine_solve`: CG on
    the tree-structured apply in lex order (the permutation is paid once
    per OUTER refinement step).  `mesh_lex` = `permute_mesh_lex(ts, mesh)`
    cast to the inner dtype.

    The inner apply runs at float32 matmul precision (see A below);
    each outer f64 correction contracts the error ~rtol."""
    from disco4est_tpu.solvers.cg import cg_solve

    def inner(r32):
        shape = r32.shape
        b_lex = jax.lax.optimization_barrier(to_lex(ts, r32))

        def A(v):
            # barriers: without them XLA:TPU fuses the CG state updates
            # into the apply and MISCOMPILES in composite jits (same
            # axon pathology as solvers/schwarz_overlap.py; CPU exact).
            # float32 matmul precision: the TPU default (bfloat16
            # multiplies) leaves ~3e-3 apply noise, enough to DIVERGE
            # the inner CG once the outer residual spectrum shifts.
            v = jax.lax.optimization_barrier(v)
            with jax.default_matmul_precision("float32"):
                out = apply_tree_structured(ts, mesh_lex, v)
            return jax.lax.optimization_barrier(out)

        res = cg_solve(A, b_lex, atol=0.0, rtol=rtol, max_iter=max_iter)
        out = jax.lax.optimization_barrier(from_lex(ts, res.x))
        return out.reshape(shape), res.iterations

    return inner
