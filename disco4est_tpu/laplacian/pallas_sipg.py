"""Fused Pallas SIPG apply for orthogonal affine conforming meshes.

The XLA GEMM-form apply (`laplacian/fast.py`) is already near the XLA
fusion optimum, but XLA materializes every GEMM result in HBM: the
volume product, the trace block, the face-term block, and the lift input
each make an HBM round trip (~128 MB total at deg 7 / E=4096 vs the
~43 MB information-theoretic floor — measured 198 us vs the 65 us floor
on v5e).  This kernel keeps the element block `u` resident in VMEM and
fuses

    volume GEMM  +  own-trace recompute GEMM  +  face terms  +  lift GEMM

into ONE pass over the elements, so HBM sees only: read u, read the
gathered neighbor traces, write Au.  The neighbor exchange itself stays
a two-phase structure (traces must be globally complete before any
element can read its neighbor's), exactly like the reference's
stiffness → ghost-exchange → flux sequence (`d4est_laplacian.c:318-399`):

    phase A (XLA):    tr   = scale(u @ W_tr)          [writes E*2d rows]
    gather  (XLA):    gath = tr[neighbor_rows]
    phase B (Pallas): Au   = cw ⊙ (u @ W_vol)  +  Z(tr_own, gath) @ W_lift

where phase B recomputes the element's OWN traces from the in-VMEM `u`
(3.2 GFLOP at deg 7) instead of re-reading them from HBM (12.6 MB) —
FLOPs are cheaper than bandwidth here.

The face-mass matrix is folded into the lift rows (`W_lift` rows for the
symmetry term are M̃_f·S_f·D̂_n), eliminating the separate `mj` GEMM of
the XLA path.  Lanes are laid out per directed face as
[t13 (nfl) | s2n (nfl)] so the kernel's face math runs on a flat
[BE·2d, 2·nfl] tile with per-face scalars broadcast along rows.

Precision: `precision="bf16"` (default on TPU) runs the MXU in its
native bf16-multiply / f32-accumulate mode — the same mode XLA uses for
f32 matmuls on TPU by default, and the documented inner dtype of the
mixed-precision solver (`solvers/mixed.py`).  `precision="f32"` keeps
full f32 operands (used by the CPU-interpret correctness tests).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from disco4est_tpu.laplacian import fast as F
from disco4est_tpu.mesh.builder import MeshData


@functools.lru_cache(maxsize=None)
def _mats(deg: int, deg_quad: int, quad_key, dim: int, iso: bool):
    """Host-side f64 fixed matrices, pallas lane layout."""
    bm = F._base_mats(deg, deg_quad, quad_key, dim)
    Mt, Kt = bm["Mt"], bm["Kt"]
    kron_dirs = bm["kron_dirs"]
    nfaces, nv, nfl = bm["nfaces"], bm["nv"], bm["nfl"]

    diag_blocks = [
        kron_dirs([Kt if a == l else Mt for a in range(dim)])
        for l in range(dim)
    ]
    if iso:
        W_vol = sum(diag_blocks)
        nblk = 1
    else:
        W_vol = np.concatenate(diag_blocks, axis=1)
        nblk = dim

    # trace columns, per directed face: [u_f (nfl) | raw dn (nfl)]
    tr_cols = []
    for f in range(nfaces):
        tr_cols.append(bm["sels"][f].T)
        tr_cols.append(bm["dvol"][f // 2][bm["sel_rows"][f]].T)
    W_tr = np.concatenate(tr_cols, axis=1)  # [nv, nfaces*2*nfl]

    # lift rows, per directed face: [t13 (nfl) | s2n (nfl)]; face mass
    # folded into BOTH lane groups (no separate mj GEMM).
    Mf = bm["Mf"]
    rows = []
    for f in range(nfaces):
        rows.append(Mf @ bm["sels"][f])  # t13 lanes
        rows.append(Mf @ bm["sels"][f] @ bm["dvol"][f // 2])  # s2n lanes
    W_lift = np.concatenate(rows, axis=0)  # [nfaces*2*nfl, nv]

    return dict(
        W_vol=W_vol, nblk=nblk, W_tr=W_tr, W_lift=W_lift,
        nv=nv, nfl=nfl, nfaces=nfaces,
    )


def _drstn_n(mesh: MeshData, dtype):
    """Per-directed-face normal component of drdx·n: [E, 2d]."""
    nfaces = 2 * mesh.dim
    drstn = jnp.einsum(
        "eld,efd->efl",
        mesh.drdx_c.astype(dtype),
        mesh.face_n_c.astype(dtype),
    )
    f_idx = jnp.arange(nfaces)
    return drstn[:, f_idx, f_idx // 2]


def compute_traces(mesh: MeshData, u):
    """Phase A: scaled traces [E*2d, 2*nfl] (dn lanes pre-multiplied by
    the face's own drstn_n, so gathered rows need no second gather)."""
    dim, deg = mesh.dim, mesh.deg
    nfl = (deg + 1) ** (dim - 1)
    nfaces = 2 * dim
    E = u.shape[0]
    dtype = u.dtype
    hm = _mats(deg, mesh.deg_quad, mesh.quad.kind, dim, mesh.iso)
    W_tr = jnp.asarray(hm["W_tr"], dtype)
    tr = (u.reshape(E, -1) @ W_tr).reshape(E, nfaces, 2 * nfl)
    lane = jnp.arange(2 * nfl) < nfl
    dn_scale = _drstn_n(mesh, dtype)[..., None]
    tr = tr * jnp.where(lane, jnp.ones((), dtype), dn_scale)
    return tr.reshape(E * nfaces, 2 * nfl)


def _pick_be(E: int) -> int:
    for be in (256, 128, 64, 32, 16, 8, 4, 2, 1):
        if E % be == 0:
            return be
    return 1


def _kernel(u_ref, gath_ref, cw_ref, scal_ref, Wvol_ref, Wtr_ref,
            Wlift_ref, au_ref, *, nv, nfl, nfaces, nblk, precision):
    f32 = jnp.float32
    BE = u_ref.shape[0]
    if precision == "bf16":
        # weights arrive pre-cast to bf16; cast the streamed u block once
        u = u_ref[:].astype(jnp.bfloat16)
        mm = lambda a, b: jnp.dot(a, b, preferred_element_type=f32)
    else:
        u = u_ref[:]
        mm = lambda a, b: jnp.dot(
            a, b, preferred_element_type=f32,
            precision=jax.lax.Precision.HIGHEST,
        )
    Wvol, Wtr, Wlift = Wvol_ref[:], Wtr_ref[:], Wlift_ref[:]

    # ---- volume ---------------------------------------------------------
    acc = mm(u, Wvol)  # [BE, nblk*nv]
    cw = cw_ref[:]  # [BE, nblk]
    au = cw[:, 0][:, None] * acc[:, :nv]
    for b in range(1, nblk):
        au = au + cw[:, b][:, None] * acc[:, b * nv:(b + 1) * nv]

    # ---- own traces (recomputed from in-VMEM u) -------------------------
    # Face math unrolled over the 2*dim static faces: every op is a 2D
    # [BE, *] tile (Mosaic-friendly; no lane<->sublane reshapes).
    t = mm(u, Wtr)  # [BE, nfaces*2*nfl] f32
    g = gath_ref[:].astype(f32)  # [BE, nfaces*2*nfl]
    scal = scal_ref[:]  # [BE, nfaces*4]: (drstn_n, sj, sigma, bnd)/face
    zs = []
    for f in range(nfaces):
        drstn = scal[:, f * 4 + 0][:, None]
        sj = scal[:, f * 4 + 1][:, None]
        sig = scal[:, f * 4 + 2][:, None]
        bnd = scal[:, f * 4 + 3][:, None]
        base = f * 2 * nfl
        u_f = t[:, base:base + nfl]
        dn_m = drstn * t[:, base + nfl:base + 2 * nfl]
        if precision == "bf16":
            # Round the recomputed own traces through bf16 so both sides
            # of a face read the SAME (rounded) trace values — the
            # neighbor sees this element's phase-A bf16 copy, and an
            # unrounded own copy would break the operator's symmetry at
            # the 2^-9 level (ADVICE r3).  Exact bitwise symmetry still
            # requires precision="f32" (accumulation order of the two
            # GEMMs may differ); this keeps any asymmetry at or below
            # bf16 rounding of the same f32 value.
            u_f = u_f.astype(jnp.bfloat16).astype(f32)
            dn_m = dn_m.astype(jnp.bfloat16).astype(f32)
        u_p = g[:, base:base + nfl]
        dn_p = g[:, base + nfl:base + 2 * nfl]
        u_p = jnp.where(bnd > 0, 0.0, u_p)
        dn_p = jnp.where(bnd > 0, -dn_m, dn_p)
        c2 = 1.0 + bnd
        jump = u_f - u_p
        t13 = -0.5 * sj * (dn_m - dn_p) + sj * sig * jump
        s2n = -0.5 * c2 * sj * drstn * jump
        zs.append(t13)
        zs.append(s2n)
    Z = jnp.concatenate(zs, axis=1)  # [BE, nfaces*2*nfl]
    if precision == "bf16":
        Z = Z.astype(jnp.bfloat16)
    au_ref[:] = au + mm(Z, Wlift)


def pallas_path_available(mesh: MeshData, g) -> bool:
    # Mirrors fast.fast_path_available: the kernel has no mortar pass and
    # reads only the per-face scalar sigma, so hanging meshes and
    # pointwise (sigma_q) penalties must take the general path.
    return (
        mesh.orth
        and not mesh.orient_codes
        and g is None
        and mesh.deg >= 1
        and mesh.hc_elem.shape[0] == 0
        and mesh.sigma_q is None
    )


def apply_sipg_pallas(mesh: MeshData, u, *, precision: str | None = None,
                      interpret: bool = False):
    """Fused Pallas SIPG apply.  Same discrete operator as
    `fast.apply_sipg_fast` on orthogonal meshes with g=None."""
    dim, deg = mesh.dim, mesh.deg
    nl = deg + 1
    nfl = nl ** (dim - 1)
    nfaces = 2 * dim
    E = u.shape[0]
    in_shape = u.shape
    dtype = jnp.float32
    if precision is None:
        precision = "bf16" if jax.default_backend() == "tpu" else "f32"

    hm = _mats(deg, mesh.deg_quad, mesh.quad.kind, dim, mesh.iso)
    nv, nblk = hm["nv"], hm["nblk"]

    u2 = u.reshape(E, nv).astype(dtype)
    tr = compute_traces(mesh, u2.reshape((E,) + (nl,) * dim))
    if precision == "bf16":
        # traces stored/exchanged in bf16: halves the gather traffic; the
        # rounding is at the same 2^-9 level as the MXU's bf16 multiplies
        tr = tr.astype(jnp.bfloat16)
    rows = (mesh.nbr_elem * nfaces + mesh.nbr_face).reshape(-1)
    gath = tr[rows].reshape(E, nfaces * 2 * nfl)

    cw = mesh.wjgg_c.astype(dtype)
    cw_in = jnp.stack([cw[:, b, b] for b in range(nblk)], axis=1)  # [E,nblk]
    scal = jnp.stack(
        [
            _drstn_n(mesh, dtype),
            mesh.face_sj_c.astype(dtype),
            mesh.sigma.astype(dtype),
            mesh.bnd_mask.astype(dtype),
        ],
        axis=-1,
    ).reshape(E, nfaces * 4)

    wdtype = jnp.bfloat16 if precision == "bf16" else dtype
    W_vol = jnp.asarray(hm["W_vol"], wdtype)
    W_tr = jnp.asarray(hm["W_tr"], wdtype)
    W_lift = jnp.asarray(hm["W_lift"], wdtype)

    BE = _pick_be(E)
    grid = (E // BE,)
    tw = nfaces * 2 * nfl

    kern = functools.partial(
        _kernel, nv=nv, nfl=nfl, nfaces=nfaces, nblk=nblk,
        precision=precision,
    )
    # NB: with jax x64 enabled, a literal 0 in an index map traces as
    # i64, which Mosaic cannot legalize — keep every index int32.
    row = lambda i: (i, np.int32(0))
    const = lambda i: (np.int32(0), np.int32(0))
    out = pl.pallas_call(
        kern,
        grid=grid,
        in_specs=[
            pl.BlockSpec((BE, nv), row, memory_space=pltpu.VMEM),
            pl.BlockSpec((BE, tw), row, memory_space=pltpu.VMEM),
            pl.BlockSpec((BE, nblk), row, memory_space=pltpu.VMEM),
            pl.BlockSpec((BE, nfaces * 4), row, memory_space=pltpu.VMEM),
            pl.BlockSpec((nv, nblk * nv), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((nv, tw), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((tw, nv), const, memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((BE, nv), row, memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((E, nv), dtype),
        interpret=interpret,
    )(u2, gath, cw_in, scal, W_vol, W_tr, W_lift)
    return out.reshape(in_shape).astype(u.dtype)
