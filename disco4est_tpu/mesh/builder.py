"""Mesh-data builder: per-epoch precomputation of all geometric factors.

Role of the reference's `d4est_mesh_update` + `d4est_mesh_data_compute`
(`Mesh/d4est_mesh.c:2544-2791`): after every AMR step, rebuild the flat
struct-of-arrays of volume and face geometry factors.  The reference has a
slow path (recompute mortar geometry per operator apply) and a fast
`with_opt` path (precompute; `d4est_laplacian_with_opt*.c`); TPU-first
design makes precompute-and-reuse the ONLY path.

All factor arrays are element-major with static shapes, ready to shard
along the element axis.  Built once per mesh epoch under jit; kernels
consume them every solver iteration.
"""

from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from disco4est_tpu.geometry.base import Geometry
from disco4est_tpu.mesh.faces import (
    FaceTables,
    build_face_tables,
    orientation_perm,
    _tangent_axes,
)
from disco4est_tpu.mesh.tree import Forest, ROOT
from disco4est_tpu.ops import tensor
from disco4est_tpu.ops.operators import DB
from disco4est_tpu.quadrature.quadrature import Quadrature


class MeshAux:
    """Host-side companions of a mesh epoch (forest, face tables, geometry).

    Kernels never read these, so MeshAux instances compare EQUAL to each
    other on purpose: they ride along as jit-static metadata without
    fragmenting the compilation cache — the same compiled solver serves
    every mesh epoch with identical shapes.
    """

    def __init__(self, geom: Geometry, forest: Forest, ft: FaceTables):
        self.geom = geom
        self.forest = forest
        self.ft = ft

    def __eq__(self, other):
        return isinstance(other, MeshAux)

    def __hash__(self):
        return 0


@dataclasses.dataclass
class MeshData:
    """Everything the solvers need for one mesh epoch.

    `deg` is the STORAGE degree (the mesh maximum); fields are arrays
    [E, (deg+1)^dim].  True hp meshes carry a per-element degree `deg_e`
    ≤ deg; the hp operator (laplacian/hp.py) conjugates the storage-degree
    kernels with per-element p-prolongations so the discrete space is the
    reference's per-element-degree DG space while every kernel keeps ONE
    static shape (SURVEY.md hard-part #5 "degree-heterogeneous batching"
    resolved by padding, not bucketing).
    """

    dim: int
    deg: int
    deg_quad: int
    quad: Quadrature
    aux: MeshAux
    # static meta: True when every element map is affine (constant
    # Jacobian) — enables the compact-factor hot path.
    affine: bool
    # static meta: sorted tuple of NON-IDENTITY orientation codes present
    # among conforming faces.  The SIPG apply unrolls one static
    # flip/swap transform per code (zero codes on brick meshes) instead of
    # per-row `take_along_axis` gathers — the round-1 perf killer.
    orient_codes: tuple

    deg_e: jnp.ndarray  # [E] int32 true per-element degree (≤ deg)

    # --- volume arrays (jnp, element-major) ---
    xyz_lobatto: jnp.ndarray  # [E, dim, nl^dim...]
    xyz_quad: jnp.ndarray  # [E, dim, nq^dim...]
    j_quad: jnp.ndarray  # [E, nq^dim...]
    wjgg: jnp.ndarray  # [E, dim, dim, nq^dim...] w⊗J⊗Σ_k G_lk G_lpk

    # --- face arrays, [E, 2*dim, ...], element's own frame ---
    face_xyz_lobatto: jnp.ndarray  # [E, 2d, dim, nfl...]
    face_xyz_quad: jnp.ndarray  # [E, 2d, dim, nfq...] (Robin coeffs, ON_QUAD bc eval)
    face_sj: jnp.ndarray  # [E, 2d, nfq...]
    face_n: jnp.ndarray  # [E, 2d, dim, nfq...]
    face_drst: jnp.ndarray  # [E, 2d, dim, dim, nfq...] ∂r_l/∂x_d
    face_h: jnp.ndarray  # [E, 2d] volume/area h (penalty size)
    volume: jnp.ndarray  # [E]
    area: jnp.ndarray  # [E, 2d]
    sigma: jnp.ndarray  # [E, 2d] SIPG penalty per face
    # Pointwise penalty [E, 2d, nfq...] for FACE_H_EQ_J_DIV_SJ_QUAD
    # (`d4est_mesh.c:650-661`: h = J/sj at each mortar quadrature point,
    # penalty evaluated per point `..._with_opt_flux_sipg.c:622-636`).
    # None under the default scalar volume/area h.  Curved geometries
    # (cubed sphere) need this for reference digit parity.
    sigma_q: jnp.ndarray

    # --- neighbor gather tables (jnp int32/bool) ---
    nbr_elem: jnp.ndarray  # [E, 2d]
    nbr_face: jnp.ndarray  # [E, 2d]
    perm_l: jnp.ndarray  # [E, 2d, nfl_flat] neighbor lobatto node perm
    perm_q: jnp.ndarray  # [E, 2d, nfq_flat]
    orient_code: jnp.ndarray  # [E, 2d] int32 face orientation code
    bnd_mask: jnp.ndarray  # [E, 2d] bool (True on physical boundary)
    conf_mask: jnp.ndarray  # [E, 2d] bool (conforming OR boundary: handled
    #                         by the fused face kernel; hanging faces are
    #                         masked out there and handled by the mortar
    #                         kernels below)

    # --- hanging-face mortars (coarse-side rows [M], K=2^{dim-1}) -------
    # Arrays are in the COARSE element's face frame; sj includes the
    # subface parametrization factor (1/2)^{dim-1} so mortar integrals use
    # the standard [-1,1]^{dim-1} weights (matching the reference's halved
    # spanning vectors, `d4est_mortars.c` dqa/=2).
    hc_elem: jnp.ndarray  # [M]
    hc_face: jnp.ndarray  # [M]
    hc_fine: jnp.ndarray  # [M, K]
    hc_fine_face: jnp.ndarray  # [M, K]
    hc_perm_l: jnp.ndarray  # [M, K, nfl_flat] fine-frame -> coarse-frame
    hc_perm_q: jnp.ndarray  # [M, K, nfq_flat]
    hc_sj: jnp.ndarray  # [M, K, nfq...]
    hc_n: jnp.ndarray  # [M, K, dim, nfq...] outward from coarse elem
    hc_drst_m: jnp.ndarray  # [M, K, dim, dim, nfq...] coarse drst at subface
    hc_sigma: jnp.ndarray  # [M, K]
    # fine-side rows, flattened (m, b) -> row m*K + b
    hf_perm_l: jnp.ndarray  # [M*K, nfl_flat] coarse-frame -> fine-frame
    hf_perm_q: jnp.ndarray  # [M*K, nfq_flat]
    # pointwise mortar penalty (j_div_sj_quad only): [M, K, nfq...] in the
    # COARSE mortar frame; fine rows permute it via hf_perm_q.  None for
    # the scalar penalty modes.
    hc_sigma_q: jnp.ndarray | None = None

    # --- DENSE hanging tables (orth fast path) ---------------------------
    # The [M, K] mortar-row layout above runs as ~50 small latency-bound
    # kernels on TPU; on orthogonal affine meshes with identity hanging
    # orientations the whole mortar pass instead folds into the conforming
    # [E, 2d] face machinery (laplacian/fast.py `_apply_orth`), driven by
    # these per-face tables.  None when hanging rows carry nontrivial
    # orientations, when the penalty is pointwise, or when M == 0.
    hang_code: jnp.ndarray | None = None  # [E, 2d] int32: 0, or subface b+1
    #                                        on the FINE side of a mortar
    hang_sigma: jnp.ndarray | None = None  # [E, 2d] mortar penalty at fine
    #                                         hanging faces (0 elsewhere)

    # --- per-element radial quadrature (compactified shells) ------------
    # Role of `d4est_quadrature_compactified.c`: on compactified outer
    # shells the VOLUME quadrature uses a per-element Gaussian rule for
    # the rational radial weight; rad_interp is the Lobatto→custom-points
    # interpolation per element, rad_w the custom weights (plain Gauss
    # rows on non-shell elements).  None on ordinary meshes.
    rad_interp: jnp.ndarray | None = None  # [E, nq, nl]
    rad_w: jnp.ndarray | None = None  # [E, nq]

    # --- compact affine factors (None for curved geometries) ------------
    # Affine tree maps have constant Jacobians, so one value per element
    # replaces one per quadrature point — ~nq^dim less HBM traffic on the
    # hot path (the factor arrays, not u, dominate the SIPG apply's
    # memory footprint).
    j_c: jnp.ndarray | None = None  # [E]
    drdx_c: jnp.ndarray | None = None  # [E, dim(l), dim(d)]
    wjgg_c: jnp.ndarray | None = None  # [E, dim, dim] J·Σ_k g_lk g_mk
    face_sj_c: jnp.ndarray | None = None  # [E, 2d]
    face_n_c: jnp.ndarray | None = None  # [E, 2d, dim]

    # static meta: True when the geometry is axis-aligned (wjgg diagonal);
    # selects the 3-block volume GEMM in laplacian/fast.py.
    orth: bool = False
    # static meta: True when additionally every cell is a cube (all wjgg
    # diagonal entries equal): the volume collapses to ONE shared block.
    iso: bool = False

    @property
    def forest(self) -> Forest:
        return self.aux.forest

    @property
    def geom(self) -> Geometry:
        return self.aux.geom

    @property
    def ft(self) -> FaceTables:
        return self.aux.ft

    @property
    def n_elements(self) -> int:
        return self.deg_e.shape[0]

    def j_at_quad(self, dtype=None):
        """J at volume quadrature points [E, nq...]; broadcast from the
        compact constant when the full array was not stored."""
        if self.j_quad is not None:
            j = self.j_quad
        else:
            j = jnp.broadcast_to(
                self.j_c.reshape((-1,) + (1,) * self.dim),
                (self.n_elements,) + (self.nq,) * self.dim,
            )
        return j if dtype is None else j.astype(dtype)

    @property
    def nl(self) -> int:
        return self.deg + 1

    @property
    def nq(self) -> int:
        return self.deg_quad + 1

    @property
    def local_nodes(self) -> int:
        return self.n_elements * self.nl**self.dim

    # ---- field helpers (jitted; MeshData is a pytree argument) ----------

    def init_field(self, fcn):
        """Evaluate fcn(x, y[, z]) at Lobatto nodes -> [E, nl...]
        (`d4est_mesh_init_field`, INIT_FIELD_ON_LOBATTO)."""
        return _init_field(self, fcn)

    def init_field_on_quad(self, fcn):
        return _init_field_on_quad(self, fcn)

    def boundary_values(self, fcn):
        """fcn at face Lobatto nodes -> [E, 2d, nfl...] (Dirichlet data)."""
        return _boundary_values(self, fcn)

    def boundary_values_quad(self, fcn):
        """fcn at face quadrature points -> [E, 2d, nfq...] (Robin
        coefficients, EVAL_BNDRY_FCN_ON_QUAD)."""
        return _boundary_values_quad(self, fcn)

    def l2_norm_sqr(self, u):
        """∫ u² J dV per element -> [E] (`d4est_mesh_compute_l2_norm_sqr`)."""
        return _l2_norm_sqr(self, u)


def _require_full(mesh: "MeshData", what: str):
    if mesh.xyz_lobatto is None:
        raise ValueError(
            f"{what} needs per-point position arrays; this mesh was built "
            "with store_full=False (compact affine factors only) — rebuild "
            "with store_full=True"
        )


@partial(jax.jit, static_argnums=(1,))
def _init_field(mesh: "MeshData", fcn):
    _require_full(mesh, "init_field")
    coords = [mesh.xyz_lobatto[:, d] for d in range(mesh.dim)]
    return fcn(*coords)


@partial(jax.jit, static_argnums=(1,))
def _init_field_on_quad(mesh: "MeshData", fcn):
    _require_full(mesh, "init_field_on_quad")
    coords = [mesh.xyz_quad[:, d] for d in range(mesh.dim)]
    return fcn(*coords)


@partial(jax.jit, static_argnums=(1,))
def _boundary_values(mesh: "MeshData", fcn):
    _require_full(mesh, "boundary_values")
    coords = [mesh.face_xyz_lobatto[:, :, d] for d in range(mesh.dim)]
    return fcn(*coords)


@partial(jax.jit, static_argnums=(1,))
def _boundary_values_quad(mesh: "MeshData", fcn):
    _require_full(mesh, "boundary_values_quad")
    coords = [mesh.face_xyz_quad[:, :, d] for d in range(mesh.dim)]
    return fcn(*coords)


def vol_interp(mesh: "MeshData", v, transpose: bool = False):
    """Interpolate a volume field to (or Galerkin-transpose from) the
    volume quadrature points, honoring a per-element radial rule
    (`rad_interp`) when present."""
    dtype = v.dtype
    Vq = jnp.asarray(mesh.quad.interp(mesh.deg, mesh.deg_quad), dtype)
    A = Vq.T if transpose else Vq
    if mesh.rad_interp is None:
        return tensor.apply_iso(A, v, mesh.dim)
    for d in range(mesh.dim - 1):  # tangential dirs 0..dim-2 shared
        v = tensor.apply_axis(A, v, d)
    R = mesh.rad_interp.astype(dtype)
    if transpose:
        R = jnp.swapaxes(R, -1, -2)
    ax = v.ndim - 1 - (mesh.dim - 1)  # radial = direction dim-1
    vm = jnp.moveaxis(v, ax, -1)
    vm = jnp.einsum("eab,e...b->e...a", R, vm)
    return jnp.moveaxis(vm, -1, ax)


def vol_weights(mesh: "MeshData", dtype):
    """Tensor volume quadrature weights: shared [nq]*dim grid, or
    per-element [E, nq...] when a radial rule is present."""
    _, w1 = mesh.quad.nodes_weights(mesh.deg_quad)
    w = tensor.tensor_weights([w1] * mesh.dim, dtype=dtype)
    if mesh.rad_w is None:
        return w
    # replace the radial (slowest) axis weights with the per-element rule
    w_t = tensor.tensor_weights([w1] * (mesh.dim - 1), dtype=dtype)
    rad = mesh.rad_w.astype(dtype)  # [E, nq]
    shape = (rad.shape[0], rad.shape[1]) + (1,) * (mesh.dim - 1)
    return rad.reshape(shape) * w_t[None, None]


@jax.jit
def _l2_norm_sqr(mesh: "MeshData", u):
    u_q = vol_interp(mesh, u)
    w = vol_weights(mesh, u.dtype)
    # j_at_quad broadcasts the compact constant on store_full=False meshes
    integrand = w * mesh.j_at_quad(u.dtype) * u_q * u_q
    return jnp.sum(integrand.reshape(u.shape[0], -1), axis=1)


_MESH_META = [
    "dim", "deg", "deg_quad", "quad", "aux", "affine", "orient_codes",
    "orth", "iso",
]
jax.tree_util.register_dataclass(
    MeshData,
    data_fields=[
        f.name
        for f in dataclasses.fields(MeshData)
        if f.name not in _MESH_META
    ],
    meta_fields=_MESH_META,
)


def _lagrange_matrix(xs: np.ndarray, xq: np.ndarray) -> np.ndarray:
    """[len(xq), len(xs)]: Lagrange basis on nodes xs evaluated at xq."""
    xs = np.asarray(xs, np.float64)
    xq = np.asarray(xq, np.float64)
    V = np.ones((len(xq), len(xs)))
    for l in range(len(xs)):
        for m in range(len(xs)):
            if m != l:
                V[:, l] *= (xq - xs[m]) / (xs[l] - xs[m])
    return V


def build_mesh(
    geom: Geometry,
    forest: Forest,
    deg: int,
    quad: Quadrature | None = None,
    deg_quad: int | None = None,
    penalty_prefactor: float = 2.0,
    penalty_fcn: str = "maxp_sqr_over_minh",
    deg_e: np.ndarray | None = None,
    store_full: bool = True,
    face_h_type: str = "volume_div_area",
    compactified_k: int | None = None,
) -> MeshData:
    """`deg_e` (optional [E] int): true per-element degrees for hp meshes.
    Storage stays at `deg` (must be >= max(deg_e)); penalties use the true
    degrees, matching the reference's per-element `deg` in
    `d4est_laplacian_flux_sipg.c:946-1005`.

    `store_full=False` (affine geometries only): skip the per-quad-point
    factor arrays entirely — the compact constants are exact, and large
    production meshes cannot afford ~nq^dim× redundant factor storage.
    Consumers that need full arrays (estimator, VTK xyz) require
    store_full meshes."""
    quad = quad or Quadrature("legendre")
    deg_quad = deg if deg_quad is None else deg_quad
    dim = forest.dim
    E = forest.n_elements
    nl, nq = deg + 1, deg_quad + 1
    nfaces = 2 * dim

    if deg_e is None:
        deg_e = np.full(E, deg, np.int32)
    else:
        deg_e = np.asarray(deg_e, np.int32)
        if deg_e.max(initial=0) > deg:
            raise ValueError("deg_e exceeds storage degree")

    ft = build_face_tables(forest)
    affine = bool(getattr(geom, "is_affine", False))
    if not affine and not store_full:
        raise ValueError("store_full=False requires an affine geometry")

    tree = jnp.asarray(forest.tree, jnp.int32)
    anchor = jnp.asarray(forest.anchor, jnp.float64) / ROOT
    hfrac = jnp.asarray(2.0 ** -forest.level.astype(np.float64), jnp.float64)
    nbr_elem = jnp.asarray(ft.nbr_elem, jnp.int32)
    nbr_face = jnp.asarray(ft.nbr_face, jnp.int32)

    compact = {}
    if affine:
        compact = _compute_affine_factors(
            geom,
            dim,
            (penalty_fcn, float(penalty_prefactor)),
            tree,
            anchor,
            hfrac,
            nbr_elem,
            nbr_face,
            jnp.asarray(deg_e, jnp.float64),
        )

    if store_full:
        fac = _compute_all_factors(
            geom,
            dim,
            deg,
            deg_quad,
            quad,
            (penalty_fcn, float(penalty_prefactor)),
            tree,
            anchor,
            hfrac,
            nbr_elem,
            nbr_face,
            jnp.asarray(deg_e, jnp.float64),
        )
    else:
        fac = {
            k: None
            for k in (
                "xyz_lobatto",
                "xyz_quad",
                "j_quad",
                "wjgg",
                "face_xyz_lobatto",
                "face_xyz_quad",
                "face_sj",
                "face_n",
                "face_drst",
            )
        }
        fac.update(
            {
                k: compact.pop(k)
                for k in ("volume", "area", "face_h", "sigma")
            }
        )
    compact = {
        k: v
        for k, v in compact.items()
        if k in ("j_c", "drdx_c", "wjgg_c", "face_sj_c", "face_n_c")
    }

    # --- orientation perms (host) ---------------------------------------
    nfl_flat = nl ** (dim - 1)
    nfq_flat = nq ** (dim - 1)
    perm_l = np.zeros((E, nfaces, nfl_flat), np.int32)
    perm_q = np.zeros((E, nfaces, nfq_flat), np.int32)
    codes = ft.orient
    for code in np.unique(codes):
        pl = orientation_perm(dim, nl, int(code))
        pq = orientation_perm(dim, nq, int(code))
        mask = codes == code
        perm_l[mask] = pl
        perm_q[mask] = pq

    from disco4est_tpu.mesh.faces import BOUNDARY, CONF, _orientation_code

    # --- penalty h source (reference [mesh_parameters] face_h_type, all
    # four production modes of `Mesh/d4est_mesh.c:650-800`) --------------
    if face_h_type == "tree_h":
        # FACE_H_EQ_TREE_H: h = dq/P4EST_ROOT_LEN = 2^-level, tree units
        # (`d4est_mesh_calculate_mortar_h_eq_tree_h`, `d4est_mesh.c:668`).
        th = 2.0 ** -forest.level.astype(np.float64)
        h_scalar = np.ascontiguousarray(
            np.broadcast_to(th[:, None], (E, nfaces))
        )
    elif face_h_type == "j_div_sj_min_lobatto":
        # FACE_H_EQ_J_DIV_SJ_MIN_LOBATTO (`d4est_mesh.c:730-750`): scalar
        # per element face = min over the face's Lobatto points of J/sj.
        if not store_full:
            raise ValueError("j_div_sj_min_lobatto requires store_full")
        h_scalar = np.asarray(fac["face_h_lob"])
    elif face_h_type in ("volume_div_area", "j_div_sj_quad"):
        # volume/area as the scalar h; j_div_sj_quad overrides the
        # conforming/hanging sigma with pointwise arrays below.
        h_scalar = np.asarray(fac["face_h"])
    else:
        raise ValueError(f"unknown face_h_type {face_h_type!r}")

    if face_h_type in ("tree_h", "j_div_sj_min_lobatto"):
        # recompute the conforming/boundary sigma from the selected h
        h_m = h_scalar
        h_p = h_scalar[np.asarray(nbr_elem), np.asarray(nbr_face)]
        h_p = np.where(ft.kind == BOUNDARY, h_m, h_p)
        p_m = np.broadcast_to(
            deg_e[:, None], h_m.shape
        ).astype(np.float64)
        p_p = deg_e[np.asarray(nbr_elem)].astype(np.float64)
        fac["sigma"] = jnp.asarray(
            np.asarray(
                sigma_from_degrees(
                    penalty_fcn, float(penalty_prefactor), p_m, p_p,
                    h_m, h_p,
                )
            )
        )

    # store the SELECTED h as mesh.face_h — the reference's hm arrays
    # carry the configured face_h_type, and estimator prefactors read
    # them (`d4est_mesh.c:1808` j_div_sj_min → `_estimator_bi.c:216-233`).
    # Before round 5 this stayed volume/area for every mode — invisible
    # on bricks (the modes coincide there, which is why Stamm/CDS
    # matched) but wrong on curved shells (TP trajectory estimator was
    # 139x off).
    if face_h_type != "volume_div_area":
        fac["face_h"] = jnp.asarray(h_scalar)

    # --- hanging mortar tables ------------------------------------------
    M = len(ft.hc_elem)
    K = 1 << (dim - 1)
    face_h_np = h_scalar
    fshape_q = (nq,) * (dim - 1)
    if M > 0:
        ce, cf = ft.hc_elem, ft.hc_face.astype(np.int32)
        mfac = _compute_mortar_factors(
            geom,
            dim,
            deg_quad,
            quad,
            K,
            jnp.asarray(forest.tree[ce], jnp.int32),
            jnp.asarray(forest.anchor[ce], jnp.float64) / ROOT,
            jnp.asarray(2.0 ** -forest.level[ce].astype(np.float64)),
            jnp.asarray(cf, jnp.int32),
        )
        # penalty: h_m = coarse full-face h; h_p = fine elem's face h
        h_c = face_h_np[ce, cf]  # [M]
        h_f = face_h_np[ft.hc_fine, ft.hc_fine_face.astype(np.int32)]  # [M, K]
        p_c = deg_e[ce].astype(np.float64)  # [M]
        p_f = deg_e[ft.hc_fine].astype(np.float64)  # [M, K]
        hc_sigma = sigma_from_degrees(
            penalty_fcn,
            penalty_prefactor,
            np.broadcast_to(p_c[:, None], p_f.shape),
            p_f,
            np.broadcast_to(h_c[:, None], h_f.shape),
            h_f,
        )
        # orientation perms: coarse frame <-> fine frame per (m, b)
        hc_perm_l = np.zeros((M, K, nfl_flat), np.int32)
        hc_perm_q = np.zeros((M, K, nfq_flat), np.int32)
        hf_perm_l = np.zeros((M * K, nfl_flat), np.int32)
        hf_perm_q = np.zeros((M * K, nfq_flat), np.int32)
        for m in range(M):
            t_c = int(forest.tree[ce[m]])
            for b in range(K):
                fe = int(ft.hc_fine[m, b])
                ff = int(ft.hc_fine_face[m, b])
                t_f = int(forest.tree[fe])
                code_c = (
                    0 if t_f == t_c else _orientation_code(forest.conn, t_c, int(cf[m]))
                )
                code_f = (
                    0 if t_f == t_c else _orientation_code(forest.conn, t_f, ff)
                )
                hc_perm_l[m, b] = orientation_perm(dim, nl, code_c)
                hc_perm_q[m, b] = orientation_perm(dim, nq, code_c)
                hf_perm_l[m * K + b] = orientation_perm(dim, nl, code_f)
                hf_perm_q[m * K + b] = orientation_perm(dim, nq, code_f)
        mortar = dict(
            hc_elem=jnp.asarray(ce, jnp.int32),
            hc_face=jnp.asarray(cf, jnp.int32),
            hc_fine=jnp.asarray(ft.hc_fine, jnp.int32),
            hc_fine_face=jnp.asarray(ft.hc_fine_face, jnp.int32),
            hc_perm_l=jnp.asarray(hc_perm_l),
            hc_perm_q=jnp.asarray(hc_perm_q),
            hc_sj=mfac["sj"],
            hc_n=mfac["n"],
            hc_drst_m=mfac["drst"],
            hc_sigma=jnp.asarray(hc_sigma),
            hf_perm_l=jnp.asarray(hf_perm_l),
            hf_perm_q=jnp.asarray(hf_perm_q),
        )
        # dense per-face hanging tables (orth fast path; identity
        # orientations only — the [E, 2d] machinery skips the perms)
        ident = (
            (hc_perm_l == np.arange(nfl_flat)).all()
            and (hf_perm_l == np.arange(nfl_flat)).all()
        )
        if ident:
            nfc = 2 * dim
            fines = np.asarray(ft.hc_fine)
            ffaces = np.asarray(ft.hc_fine_face, np.int64)
            hang_code = np.zeros((E, nfc), np.int32)
            hang_sigma_d = np.zeros((E, nfc), np.float64)
            bb = np.broadcast_to(np.arange(K)[None, :], (M, K))
            hang_code[fines, ffaces] = (bb + 1).astype(np.int32)
            hang_sigma_d[fines, ffaces] = hc_sigma
            mortar.update(
                hang_code=jnp.asarray(hang_code),
                hang_sigma=jnp.asarray(hang_sigma_d),
            )
    else:
        mortar = dict(
            hc_elem=jnp.zeros((0,), jnp.int32),
            hc_face=jnp.zeros((0,), jnp.int32),
            hc_fine=jnp.zeros((0, K), jnp.int32),
            hc_fine_face=jnp.zeros((0, K), jnp.int32),
            hc_perm_l=jnp.zeros((0, K, nfl_flat), jnp.int32),
            hc_perm_q=jnp.zeros((0, K, nfq_flat), jnp.int32),
            hc_sj=jnp.zeros((0, K) + fshape_q),
            hc_n=jnp.zeros((0, K, dim) + fshape_q),
            hc_drst_m=jnp.zeros((0, K, dim, dim) + fshape_q),
            hc_sigma=jnp.zeros((0, K)),
            hf_perm_l=jnp.zeros((0, nfl_flat), jnp.int32),
            hf_perm_q=jnp.zeros((0, nfq_flat), jnp.int32),
        )

    conf_codes = ft.orient[(ft.kind == CONF)]
    orient_codes = tuple(
        sorted(int(c) for c in np.unique(conf_codes) if c != 0)
    )

    # --- per-element compactified radial quadrature ----------------------
    # (`d4est_quadrature_compactified.c` role, volume path: the radial
    # direction of compactified OUTER SHELL elements gets a per-element
    # Gaussian rule for the rational weight (c1+c2·t)^{-k}; the factor
    # arrays below are rebuilt at those points and `rad_interp`/`rad_w`
    # drive the volume applies.  Face/mortar quadrature stays Gauss.)
    rad = {}
    if compactified_k is not None:
        from disco4est_tpu.quadrature.compactified import rule as _cq_rule
        from disco4est_tpu.quadrature.compactified import shell_c1_c2

        if not store_full:
            raise ValueError("compactified_k requires store_full=True")
        n_outer = int(getattr(geom, "n_outer", 0))
        if not (n_outer and getattr(geom, "compactify_outer", False)):
            raise ValueError(
                "compactified_k needs a compactified outer-shell geometry"
            )
        xg, wg = quad.nodes_weights(deg_quad)
        xl_nodes = DB.ops(deg).lobatto_nodes
        rad_t_np = np.tile(np.asarray(xg), (E, 1))
        rad_w_np = np.tile(np.asarray(wg), (E, 1))
        verts = np.asarray(geom.verts)
        for e in range(E):
            t = int(forest.tree[e])
            if t >= n_outer:
                continue
            c0 = float(verts[t, 0, 2])
            c1v = float(verts[t, 4, 2])
            frac = forest.anchor[e, 2] / ROOT
            hfrac_e = 2.0 ** -float(forest.level[e])
            cmin = c0 + frac * (c1v - c0)
            cmax = c0 + (frac + hfrac_e) * (c1v - c0)
            cc1, cc2 = shell_c1_c2(cmin, cmax, geom.R1, geom.R2)
            t_e, w_e = _cq_rule(cc1, cc2, int(compactified_k), nq)
            rad_t_np[e] = t_e
            rad_w_np[e] = w_e
        rad_interp_np = np.stack(
            [_lagrange_matrix(xl_nodes, rad_t_np[e]) for e in range(E)]
        )
        rad = dict(
            rad_interp=jnp.asarray(rad_interp_np),
            rad_w=jnp.asarray(rad_w_np),
        )
        pe = _compute_vol_factors_perelem(
            geom, dim, quad, deg_quad, tree, anchor, hfrac,
            jnp.asarray(rad_t_np), jnp.asarray(rad_w_np),
        )
        fac.update(pe)

    # --- pointwise penalty for FACE_H_EQ_J_DIV_SJ_QUAD -------------------
    # h(x) = J/sj at each face quadrature point; the neighbor's h is
    # gathered and point-aligned with perm_q so min(h_m, h_p) is evaluated
    # at MATCHED physical points (symmetric operator).  Reference:
    # `d4est_mesh.c:650-661` + `d4est_laplacian_with_opt_flux_sipg.c:622-636`.
    sigma_q = None
    if face_h_type == "j_div_sj_quad":
        if not store_full:
            raise ValueError("j_div_sj_quad requires store_full=True")
        h_q = (np.asarray(fac["face_j"]) / np.asarray(fac["face_sj"])).reshape(
            E, nfaces, -1
        )
        rows = np.asarray(nbr_elem) * nfaces + np.asarray(nbr_face)
        h_p = np.take_along_axis(
            h_q.reshape(E * nfaces, -1)[rows], np.asarray(perm_q), axis=-1
        )
        # boundary faces: penalty from h_m on both sides (reference
        # dirichlet aux passes (deg_m, h_m, deg_m, h_m))
        h_p = np.where((ft.kind == BOUNDARY)[:, :, None], h_q, h_p)
        p_m = deg_e[:, None, None].astype(np.float64)
        p_p = deg_e[np.asarray(nbr_elem)][:, :, None].astype(np.float64)
        sigma_q = jnp.asarray(
            np.asarray(
                sigma_from_degrees(
                    penalty_fcn, float(penalty_prefactor), p_m, p_p,
                    h_q, h_p,
                )
            ).reshape((E, nfaces) + (nq,) * (dim - 1))
        )
        if M > 0:
            # hanging mortars: h_m on the coarse side is j/sj of the
            # MORTAR-sized quadrant = (1/2)·J_c/sj_c at the subface quad
            # points (`d4est_mortars.c` mortar_dq halving); h_p is the
            # fine element's own-face J/sj, reoriented into the coarse
            # mortar frame (`d4est_mesh.c:1046-1070`).
            nfq_flat_ = int(np.prod(fshape_q)) if dim > 1 else 1
            h_m_q = np.asarray(mfac["j_div_sj"]).reshape(M, K, nfq_flat_)
            h_f_face = h_q.reshape(E, nfaces, nfq_flat_)[
                ft.hc_fine, ft.hc_fine_face.astype(np.int32)
            ]  # [M, K, nfq_flat] in each fine element's own frame
            h_p_q = np.take_along_axis(h_f_face, hc_perm_q, axis=-1)
            p_c = deg_e[ce].astype(np.float64)[:, None, None]
            p_f = deg_e[ft.hc_fine].astype(np.float64)[:, :, None]
            mortar["hc_sigma_q"] = jnp.asarray(
                np.asarray(
                    sigma_from_degrees(
                        penalty_fcn, float(penalty_prefactor),
                        p_c, p_f, h_m_q, h_p_q,
                    )
                ).reshape((M, K) + fshape_q)
            )
    fac.pop("face_j", None)
    fac.pop("face_h_lob", None)

    return MeshData(
        **rad,
        sigma_q=sigma_q,
        dim=dim,
        deg=deg,
        deg_quad=deg_quad,
        quad=quad,
        aux=MeshAux(geom=geom, forest=forest, ft=ft),
        affine=affine,
        orth=affine and bool(getattr(geom, "is_orthogonal", False)),
        iso=affine and bool(getattr(geom, "is_isotropic", False)),
        orient_codes=orient_codes,
        deg_e=jnp.asarray(deg_e, jnp.int32),
        nbr_elem=nbr_elem,
        nbr_face=nbr_face,
        perm_l=jnp.asarray(perm_l),
        perm_q=jnp.asarray(perm_q),
        orient_code=jnp.asarray(ft.orient.astype(np.int32)),
        bnd_mask=jnp.asarray(ft.kind == BOUNDARY),
        conf_mask=jnp.asarray((ft.kind == CONF) | (ft.kind == BOUNDARY)),
        **mortar,
        **fac,
        **compact,
    )


def sigma_from_degrees(penalty_fcn, pf, p_m, p_p, h_m, h_p):
    """SIPG penalty σ from both sides' (degree, h) — the reference's
    penalty-function library (`d4est_laplacian_flux_sipg.c:946-1005`),
    generalized to per-face degree arrays for hp meshes."""
    xp = jnp
    if penalty_fcn == "maxp_sqr_over_minh":
        return pf * xp.maximum(p_m, p_p) ** 2 / xp.minimum(h_m, h_p)
    if penalty_fcn == "maxpp1_sqr_over_minh":
        return pf * (xp.maximum(p_m, p_p) + 1.0) ** 2 / xp.minimum(h_m, h_p)
    if penalty_fcn == "meanp_sqr_over_meanh":
        return pf * (0.5 * (p_m + p_p)) ** 2 / (0.5 * (h_m + h_p))
    if penalty_fcn == "mean_p_sqr_over_h":
        return pf * 0.5 * (p_m**2 / h_m + p_p**2 / h_p)
    raise ValueError(penalty_fcn)


@partial(jax.jit, static_argnums=(0, 1, 2, 3, 4, 5))
def _compute_all_factors(
    geom,
    dim,
    deg,
    deg_quad,
    quad,
    penalty,
    tree,
    anchor,
    hfrac,
    nbr_elem,
    nbr_face,
    deg_e,
):
    """All geometric factor arrays in ONE compiled program (mesh epochs are
    rare; a single compile amortizes across the whole epoch)."""
    penalty_fcn, penalty_prefactor = penalty
    E = tree.shape[0]
    nfaces = 2 * dim
    xl = DB.ops(deg).lobatto_nodes
    xq, wq = quad.nodes_weights(deg_quad)

    vol_pts_l = _tensor_points(xl, dim)
    vol_pts_q = _tensor_points(xq, dim)

    fac_vol = _factors(geom, tree, anchor, hfrac, vol_pts_q)
    xyz_l = _positions(geom, tree, anchor, hfrac, vol_pts_l)
    xyz_q = _positions(geom, tree, anchor, hfrac, vol_pts_q)
    j_quad = fac_vol["J"]
    drdx = fac_vol["drdx"]  # [E, nq..., dim(l), dim(d)]
    w3 = tensor.tensor_weights([wq] * dim)

    # wjgg[l,lp] = w * J * Σ_k drdx[l,k] drdx[lp,k]
    gg = jnp.einsum("e...lk,e...mk->e...lm", drdx, drdx)
    wjgg = (w3[None] * j_quad)[..., None, None] * gg
    wjgg = jnp.moveaxis(jnp.moveaxis(wjgg, -1, 1), -1, 1)  # [E, l, lp, nq...]

    # face arrays
    wf = tensor.tensor_weights([wq] * (dim - 1)) if dim > 1 else jnp.ones(())
    face_sj, face_n, face_drst, face_xyz_l, face_xyz_q, area = [], [], [], [], [], []
    face_j = []
    face_h_lob = []
    for f in range(nfaces):
        pts_q = _face_points(xq, dim, f)
        pts_l = _face_points(xl, dim, f)
        ffac = _factors(geom, tree, anchor, hfrac, pts_q)
        sj, n = _surface_jacobian(ffac, f, dim)
        face_j.append(ffac["J"])
        # h = min over face LOBATTO points of J/sj
        # (FACE_H_EQ_J_DIV_SJ_MIN_LOBATTO, `d4est_mesh.c:730-741`)
        lfac = _factors(geom, tree, anchor, hfrac, pts_l)
        lsj, _ = _surface_jacobian(lfac, f, dim)
        face_h_lob.append(
            jnp.min((lfac["J"] / lsj).reshape(E, -1), axis=1)
        )
        face_sj.append(sj)
        face_n.append(jnp.moveaxis(n, -1, 1))
        fd = jnp.moveaxis(jnp.moveaxis(ffac["drdx"], -1, 1), -1, 1)
        face_drst.append(fd)
        face_xyz_l.append(
            jnp.moveaxis(_positions(geom, tree, anchor, hfrac, pts_l), -1, 1)
        )
        face_xyz_q.append(
            jnp.moveaxis(_positions(geom, tree, anchor, hfrac, pts_q), -1, 1)
        )
        area.append(jnp.sum((wf * sj).reshape(E, -1), axis=1))

    face_j = jnp.stack(face_j, axis=1)  # [E, 2d, nfq...] volume J at face
    face_sj = jnp.stack(face_sj, axis=1)  # [E, 2d, nfq...]
    face_n = jnp.stack(face_n, axis=1)  # [E, 2d, dim, nfq...]
    face_drst = jnp.stack(face_drst, axis=1)  # [E, 2d, dim, dim, nfq...]
    face_xyz_l = jnp.stack(face_xyz_l, axis=1)  # [E, 2d, dim, nfl...]
    face_xyz_q = jnp.stack(face_xyz_q, axis=1)  # [E, 2d, dim, nfq...]
    area = jnp.stack(area, axis=1)  # [E, 2d]
    volume = jnp.sum((w3 * j_quad).reshape(E, -1), axis=1)
    face_h = volume[:, None] / area  # FACE_H_EQ_VOLUME_DIV_AREA

    # --- penalty sigma per directed face (true per-element degrees) -----
    h_m = face_h
    h_p = face_h[nbr_elem, nbr_face]
    p_m = jnp.broadcast_to(deg_e[:, None], h_m.shape)
    p_p = deg_e[nbr_elem]  # boundary faces: nbr = self ⇒ p_p = p_m
    sigma = sigma_from_degrees(
        penalty_fcn, penalty_prefactor, p_m, p_p, h_m, h_p
    )

    return dict(
        xyz_lobatto=jnp.moveaxis(xyz_l, -1, 1),
        xyz_quad=jnp.moveaxis(xyz_q, -1, 1),
        j_quad=j_quad,
        wjgg=wjgg,
        face_xyz_lobatto=face_xyz_l,
        face_xyz_quad=face_xyz_q,
        face_sj=face_sj,
        face_n=face_n,
        face_drst=face_drst,
        face_h=face_h,
        volume=volume,
        area=area,
        sigma=sigma,
        face_j=face_j,
        face_h_lob=jnp.stack(face_h_lob, axis=1),
    )


@partial(jax.jit, static_argnums=(0, 1, 2))
def _compute_affine_factors(
    geom, dim, penalty, tree, anchor, hfrac, nbr_elem, nbr_face, deg_e
):
    """Compact per-element factors for affine geometries: the Jacobian is
    constant, so ONE evaluation at the element center replaces the full
    quadrature grid.  Exact (not an approximation) when `geom.is_affine`.

    Convention: `wjgg_c` excludes the separable quadrature weights (the
    apply multiplies by w⊗w⊗w in-register), unlike the full `wjgg` which
    bakes them in."""
    penalty_fcn, penalty_prefactor = penalty
    center = jnp.zeros((1, dim))
    fac = _factors(geom, tree, anchor, hfrac, center)
    j_c = fac["J"][:, 0]  # [E]
    drdx_c = fac["drdx"][:, 0]  # [E, l, d]
    gg = jnp.einsum("elk,emk->elm", drdx_c, drdx_c)
    wjgg_c = j_c[:, None, None] * gg

    # face normals / surface jacobians from the same constants
    sj_list, n_list = [], []
    for f in range(2 * dim):
        a0, side = divmod(f, 2)
        sign = -1.0 if side == 0 else 1.0
        ntilde = sign * j_c[:, None] * drdx_c[:, a0, :]  # [E, d]
        sj = jnp.sqrt(jnp.sum(ntilde**2, axis=-1))
        sj_list.append(sj)
        n_list.append(ntilde / sj[:, None])
    face_sj_c = jnp.stack(sj_list, axis=1)  # [E, 2d]
    face_n_c = jnp.stack(n_list, axis=1)  # [E, 2d, d]

    volume = j_c * (2.0**dim)
    area = face_sj_c * (2.0 ** (dim - 1))
    face_h = volume[:, None] / area
    h_m = face_h
    h_p = face_h[nbr_elem, nbr_face]
    p_m = jnp.broadcast_to(deg_e[:, None], h_m.shape)
    p_p = deg_e[nbr_elem]
    sigma = sigma_from_degrees(
        penalty_fcn, penalty_prefactor, p_m, p_p, h_m, h_p
    )
    return dict(
        j_c=j_c,
        drdx_c=drdx_c,
        wjgg_c=wjgg_c,
        face_sj_c=face_sj_c,
        face_n_c=face_n_c,
        volume=volume,
        area=area,
        face_h=face_h,
        sigma=sigma,
    )


@partial(jax.jit, static_argnums=(0, 1, 2, 3))
def _compute_vol_factors_perelem(
    geom, dim, quad, deg_quad, tree, anchor, hfrac, rad_t, rad_w
):
    """Volume factor arrays evaluated at PER-ELEMENT quadrature grids:
    tangential directions on the shared Gauss nodes, the radial
    direction (tree axis dim-1) on each element's custom abscissas, with
    the custom weights baked into wjgg exactly as the shared path bakes
    w⊗w⊗w (`d4est_quadrature_compactified_setup_storage` role)."""
    xq, wq = quad.nodes_weights(deg_quad)
    gx = jnp.asarray(xq)
    wt = tensor.tensor_weights([wq] * (dim - 1))  # tangential weights

    def one(t, a, h, rt, rw):
        if dim == 3:
            Z, Y, X = jnp.meshgrid(rt, gx, gx, indexing="ij")
            pts = jnp.stack([X, Y, Z], axis=-1)
        else:
            Z, X = jnp.meshgrid(rt, gx, indexing="ij")
            pts = jnp.stack([X, Z], axis=-1)
        rst_tree = a + (pts + 1.0) * 0.5 * h
        dx = geom.dx(t, rst_tree) * (0.5 * h)
        J = _det(dx)
        drdx = _inv(dx, J)
        xyz = geom.x(t, rst_tree)
        w3 = rw.reshape((-1,) + (1,) * (dim - 1)) * wt[None]
        gg = jnp.einsum("...lk,...mk->...lm", drdx, drdx)
        wjgg = (w3 * J)[..., None, None] * gg
        return xyz, J, wjgg

    xyz, J, wjgg = jax.vmap(one)(tree, anchor, hfrac, rad_t, rad_w)
    wjgg = jnp.moveaxis(jnp.moveaxis(wjgg, -1, 1), -1, 1)
    return dict(
        xyz_quad=jnp.moveaxis(xyz, -1, 1),
        j_quad=J,
        wjgg=wjgg,
    )


@partial(jax.jit, static_argnums=(0, 1, 2, 3, 4))
def _compute_mortar_factors(geom, dim, deg_quad, quad, K, tree, anchor, hfrac, cf):
    """Coarse-side geometry factors on hanging-mortar subfaces.

    For each mortar row (a coarse element's hanging face) and each of its
    K subfaces: sj (including the subface parametrization factor
    (1/2)^{dim-1}), outward unit normal, and ∂r/∂x of the COARSE element
    evaluated at the subface quadrature points.  Row-wise `cf` (the coarse
    face id) is data, so one compile covers all meshes.
    """
    xq, _ = quad.nodes_weights(deg_quad)
    # Precompute static point sets: pts_b[b] has shape [2d, nfq..., dim].
    pts_b = [
        jnp.stack(
            [_subface_points(xq, dim, f, b) for f in range(2 * dim)]
        )
        for b in range(K)
    ]

    def row(t, a, h, f):
        sjs, ns, drsts, jdivsjs = [], [], [], []
        for b in range(K):
            pts = pts_b[b][f]  # [nfq..., dim]
            rst_tree = a + (pts + 1.0) * 0.5 * h
            dx = geom.dx(t, rst_tree) * (0.5 * h)
            J = _det(dx)
            drdx = _inv(dx, J)  # [..., l, d]
            a0 = f // 2
            sign = jnp.where(f % 2 == 0, -1.0, 1.0)
            ntilde = sign * J[..., None] * jnp.take(drdx, a0, axis=-2)
            sj = jnp.sqrt(jnp.sum(ntilde**2, axis=-1))
            n = ntilde / sj[..., None]
            sjs.append(sj * 0.5 ** (dim - 1))
            ns.append(jnp.moveaxis(n, -1, 0))
            drsts.append(jnp.moveaxis(jnp.moveaxis(drdx, -1, 0), -1, 0))
            # Reference j_div_sj on the coarse side of a hanging mortar is
            # computed with the MORTAR-sized (half) quadrant
            # (`d4est_mortars_compute_qcoords_on_mortar` halves dq):
            # J_mortar = (1/2)^dim J, sj_mortar = (1/2)^{dim-1} sj, so
            # j/sj on the mortar = (1/2) J/sj of the coarse element
            # (`d4est_mortars.c:255-257`).
            jdivsjs.append(0.5 * J / sj)
        return (
            jnp.stack(sjs),
            jnp.stack(ns),
            jnp.stack(drsts),
            jnp.stack(jdivsjs),
        )

    sj, n, drst, jdivsj = jax.vmap(row)(tree, anchor, hfrac, cf)
    return {"sj": sj, "n": n, "drst": drst, "j_div_sj": jdivsj}


def _subface_points(x1: np.ndarray, dim: int, face: int, b: int) -> jnp.ndarray:
    """Reference points of subface `b` of `face` (coarse element coords):
    the tangent-axis intervals are halved according to b's bits (bit 0 ↦
    the faster tangent axis)."""
    a0, side = divmod(face, 2)
    tang = _tangent_axes(dim, face)
    x1 = np.asarray(x1)

    def sub(x, bit):
        return 0.5 * (x - 1.0) if bit == 0 else 0.5 * (x + 1.0)

    if dim == 2:
        t1 = tang[0]
        pts = np.zeros((len(x1), dim))
        pts[:, t1] = sub(x1, b & 1)
        pts[:, a0] = -1.0 if side == 0 else 1.0
        return jnp.asarray(pts)
    t1, t2 = tang
    n = len(x1)
    g2, g1 = np.meshgrid(sub(x1, (b >> 1) & 1), sub(x1, b & 1), indexing="ij")
    pts = np.zeros((n, n, dim))
    pts[..., t1] = g1
    pts[..., t2] = g2
    pts[..., a0] = -1.0 if side == 0 else 1.0
    return jnp.asarray(pts)


# ---------------------------------------------------------------------------
# geometry evaluation helpers
# ---------------------------------------------------------------------------


def _tensor_points(x1: np.ndarray, dim: int) -> jnp.ndarray:
    """[n^dim grid shaped (n_z, n_y, n_x), dim] reference points; component
    d of the last axis is the coordinate along direction d (x = dir 0)."""
    n = len(x1)
    grids = jnp.meshgrid(*([jnp.asarray(x1)] * dim), indexing="ij")
    # meshgrid axes are (axis0=slowest ... ); our array axes are (z, y, x)
    # so axis i of the array corresponds to direction dim-1-i.
    comps = [grids[dim - 1 - d] for d in range(dim)]  # comp d on grid
    return jnp.stack(comps, axis=-1)


def _face_points(x1: np.ndarray, dim: int, face: int) -> jnp.ndarray:
    """Reference points of a face: [nf_shape..., dim]."""
    a0, side = divmod(face, 2)
    tang = _tangent_axes(dim, face)
    if dim == 2:
        t1 = tang[0]
        pts = jnp.zeros((len(x1), dim))
        pts = pts.at[:, t1].set(jnp.asarray(x1))
        pts = pts.at[:, a0].set(-1.0 if side == 0 else 1.0)
        return pts
    t1, t2 = tang  # t1 fast
    n = len(x1)
    g2, g1 = jnp.meshgrid(jnp.asarray(x1), jnp.asarray(x1), indexing="ij")
    pts = jnp.zeros((n, n, dim))
    pts = pts.at[..., t1].set(g1)
    pts = pts.at[..., t2].set(g2)
    pts = pts.at[..., a0].set(-1.0 if side == 0 else 1.0)
    return pts


def _positions(geom, tree, anchor, hfrac, r_pts):
    """xyz at reference points: [E, pts_shape..., dim]."""

    def one(t, a, h):
        rst_tree = a + (r_pts + 1.0) * 0.5 * h
        return geom.x(t, rst_tree)

    return jax.vmap(one)(tree, anchor, hfrac)


def _factors(geom, tree, anchor, hfrac, r_pts):
    """J and ∂r/∂x at reference points.

    Returns dict with J [E, pts...] and drdx [E, pts..., dim(l), dim(d)]
    where drdx[..., l, d] = ∂r_l/∂x_d (element reference coords).
    """

    def one(t, a, h):
        rst_tree = a + (r_pts + 1.0) * 0.5 * h
        dx = geom.dx(t, rst_tree)  # [pts..., dim(x_i), dim(rtree_j)]
        return dx * (0.5 * h)

    dxdr = jax.vmap(one)(tree, anchor, hfrac)  # [E, pts..., i, j]
    J = _det(dxdr)
    drdx_xr = _inv(dxdr, J)  # [..., j(r), i(x)] = inverse transposed layout
    return {"J": J, "drdx": drdx_xr}


def _det(m):
    dim = m.shape[-1]
    if dim == 2:
        return m[..., 0, 0] * m[..., 1, 1] - m[..., 0, 1] * m[..., 1, 0]
    return (
        m[..., 0, 0] * (m[..., 1, 1] * m[..., 2, 2] - m[..., 1, 2] * m[..., 2, 1])
        - m[..., 0, 1] * (m[..., 1, 0] * m[..., 2, 2] - m[..., 1, 2] * m[..., 2, 0])
        + m[..., 0, 2] * (m[..., 1, 0] * m[..., 2, 1] - m[..., 1, 1] * m[..., 2, 0])
    )


def _inv(m, det):
    """Inverse of [..., i, j] returned as [..., j, i]: entry [l, d] is
    ∂r_l/∂x_d given m[i, j] = ∂x_i/∂r_j."""
    dim = m.shape[-1]
    if dim == 2:
        inv = jnp.stack(
            [
                jnp.stack([m[..., 1, 1], -m[..., 0, 1]], -1),
                jnp.stack([-m[..., 1, 0], m[..., 0, 0]], -1),
            ],
            -2,
        )
        # standard inverse [[d,-b],[-c,a]]/det already has layout
        # [row=j(r), col=i(x)] = ∂r_j/∂x_i, which is what we return.
        return inv / det[..., None, None]
    # With m[i,j]=∂x_i/∂r_j, (m⁻¹)[j,i]=∂r_j/∂x_i = cof[i,j]/det.
    cof = jnp.stack(
        [
            jnp.stack(
                [
                    m[..., (i + 1) % 3, (j + 1) % 3] * m[..., (i + 2) % 3, (j + 2) % 3]
                    - m[..., (i + 1) % 3, (j + 2) % 3] * m[..., (i + 2) % 3, (j + 1) % 3]
                    for j in range(3)
                ],
                -1,
            )
            for i in range(3)
        ],
        -2,
    )  # cof[..., i, j]
    # (m⁻¹)[j,i] = cof[i,j]/det  ->  out[l,d] = (m⁻¹)[l,d] = cof[d,l]/det
    return jnp.swapaxes(cof, -1, -2) / det[..., None, None]


def _surface_jacobian(fac, face: int, dim: int):
    """sj and unit outward normal at face quad points.

    ñ_d = sign · J · ∂r_{a0}/∂x_d ;  sj = |ñ| ;  n = ñ/sj — the standard
    contravariant-normal construction the reference uses for its mortar
    geometry (`Mesh/d4est_mortars.c` sj/n computation).
    """
    a0, side = divmod(face, 2)
    sign = -1.0 if side == 0 else 1.0
    ntilde = sign * fac["J"][..., None] * fac["drdx"][..., a0, :]
    sj = jnp.sqrt(jnp.sum(ntilde**2, axis=-1))
    n = ntilde / sj[..., None]
    return sj, n
