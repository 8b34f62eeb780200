"""Explicit halo-exchange SIPG apply under shard_map.

The GSPMD path (plain jit over sharded arrays) is correct but lowers the
neighbor gathers to ALL-GATHERS of the face arrays — O(global) bytes per
apply.  This module is the scalable path (SURVEY.md §5: "halo via
collectives on precomputed face pairings, overlapped with volume
compute"), replacing the reference's `Mesh/d4est_ghost_data.c`
Isend/Irecv halo:

- elements are block-partitioned in SFC order over the "e" mesh axis
  (exactly p4est's partition);
- a per-epoch `HaloProgram` precomputes, per shard: which LOCAL elements
  to send to which peer (`send_idx`), where received elements land in the
  halo buffer (`recv_pos`), neighbor tables remapped to local+halo
  indexing, and the halo elements' static face factors;
- at apply time each shard exchanges only the halo elements' VOLUME nodal
  values with one `all_to_all` (O(surface) bytes), recomputes their face
  traces locally, and runs the standard fused face kernel.

Coverage: conforming, boundary AND hanging (2:1 mortar) faces — hanging
rows are assigned to the shard owning their element and remote mortar
partners ride the same all_to_all (`_hanging_passes`).  Pointwise
penalties (`sigma_q`, FACE_H_EQ_J_DIV_SJ_QUAD) ship per-face σ tables
with the sharded face arrays.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from disco4est_tpu.mesh.builder import MeshData
from disco4est_tpu.ops import tensor
from disco4est_tpu.ops.operators import DB
from disco4est_tpu.laplacian.sipg import (
    _face_apply,
    _face_scatter_dynamic,
    _face_slices,
    _gather_nd,
    _row_mat_apply,
)


def _hanging_passes(hang, u_f_ext, dudr_f_ext, face_drst_ext, face_sj,
                    face_n, Vq, wf, D, dtype, dim, nl, nq, B):
    """Shard-local hanging-mortar contributions on the halo-extended face
    arrays — the distributed twin of `laplacian/sipg._apply_hanging`.
    Padded table rows index the trash slot: their reads see zeros/garbage
    and their scatter targets fall outside the [B]-row output, where jit
    scatter semantics drop them."""
    K2 = hang["hco_fine"].shape[1]
    Mc = hang["hco_elem"].shape[0]
    Mf = hang["hfi_elem"].shape[0]
    nfl_flat = nl ** (dim - 1)
    nfq_flat = nq ** (dim - 1)
    fshape_l = (nl,) * (dim - 1)
    fshape_q = (nq,) * (dim - 1)
    deg = nl - 1

    hp = jnp.asarray(
        np.stack([DB.hp_prolong(deg, deg, c) for c in (0, 1)]), dtype
    )
    Au = jnp.zeros((B,) + (nl,) * dim, dtype)

    # ---------- coarse-side rows ----------------------------------------
    ce, cfc = hang["hco_elem"], hang["hco_face"]
    uc = u_f_ext[ce, cfc]  # [Mc, nfl...]
    duc = dudr_f_ext[ce, cfc]  # [Mc, dim, nfl...]
    acc13 = jnp.zeros((Mc,) + fshape_l, dtype)
    acc2 = jnp.zeros((Mc, dim) + fshape_l, dtype)
    for b in range(K2):
        bits = [(b >> t) & 1 for t in range(dim - 1)]
        u_m_sub = uc
        du_m_sub = duc
        for t in range(dim - 1):
            u_m_sub = tensor.apply_axis(hp[bits[t]], u_m_sub, t)
            du_m_sub = tensor.apply_axis(hp[bits[t]], du_m_sub, t)
        u_m_q = _face_apply(Vq, u_m_sub, dim)
        du_m_q = _face_apply(Vq, du_m_sub, dim)
        drst_m = hang["hco_drst_m"][:, b].astype(dtype)
        dudx_m = jnp.einsum("mld...,ml...->md...", drst_m, du_m_q)

        fe = hang["hco_fine"][:, b]
        ff = hang["hco_fine_face"][:, b]
        uf = jnp.take_along_axis(
            u_f_ext[fe, ff].reshape(Mc, nfl_flat),
            hang["hco_perm_l"][:, b], axis=-1,
        ).reshape((Mc,) + fshape_l)
        duf = jnp.take_along_axis(
            dudr_f_ext[fe, ff].reshape(Mc, dim, nfl_flat),
            hang["hco_perm_l"][:, b, None, :], axis=-1,
        ).reshape((Mc, dim) + fshape_l)
        drst_p = jnp.take_along_axis(
            face_drst_ext[fe, ff].astype(dtype).reshape(
                Mc, dim, dim, nfq_flat
            ),
            hang["hco_perm_q"][:, b, None, None, :], axis=-1,
        ).reshape((Mc, dim, dim) + fshape_q)
        u_p_q = _face_apply(Vq, uf, dim)
        du_p_q = _face_apply(Vq, duf, dim)
        dudx_p = jnp.einsum("mld...,ml...->md...", drst_p, du_p_q)

        sj = hang["hco_sj"][:, b].astype(dtype)
        n = hang["hco_n"][:, b].astype(dtype)
        # sigma is stored broadcast-ready: [Mc, K2, 1...] for scalar
        # penalties, [Mc, K2, nfq...] for pointwise (j_div_sj_quad)
        sig = hang["hco_sigma"][:, b].astype(dtype)
        jump = u_m_q - u_p_q
        term1 = (
            -jnp.einsum("md...,md...->m...", n, 0.5 * (dudx_m + dudx_p)) * sj
        )
        drst_n = jnp.einsum("mld...,md...->ml...", drst_m, n)
        term2 = -0.5 * drst_n * (sj * jump)[:, None]
        term3 = sj * sig * jump

        vt1 = _face_apply(Vq.T, wf * term1, dim)
        vt2 = _face_apply(Vq.T, wf * term2, dim)
        vt3 = _face_apply(Vq.T, wf * term3, dim)
        for t in range(dim - 1):
            vt1 = tensor.apply_axis(hp[bits[t]].T, vt1, t)
            vt2 = tensor.apply_axis(hp[bits[t]].T, vt2, t)
            vt3 = tensor.apply_axis(hp[bits[t]].T, vt3, t)
        acc13 = acc13 + vt1 + vt3
        acc2 = acc2 + vt2

    Au = _face_scatter_dynamic(Au, ce, cfc, acc13, dim, nl)
    for l in range(dim):
        Au = _face_scatter_dynamic(Au, ce, cfc, acc2[:, l], dim, nl,
                                   D=D, term2_l=l)

    # ---------- fine-side rows -------------------------------------------
    fe, ff = hang["hfi_elem"], hang["hfi_face"]
    u_m = u_f_ext[fe, ff]  # [Mf, nfl...]
    du_m = dudr_f_ext[fe, ff]
    drst_m = face_drst_ext[fe, ff].astype(dtype)
    fe_c = jnp.minimum(fe, B - 1)  # pad rows: clamp local factor reads
    sj = face_sj[fe_c, ff].astype(dtype)
    n = face_n[fe_c, ff].astype(dtype)
    sig = hang["hfi_sigma"].astype(dtype)  # [Mf, 1...] or [Mf, nfq...]

    u_m_q = _face_apply(Vq, u_m, dim)
    du_m_q = _face_apply(Vq, du_m, dim)
    dudx_m = jnp.einsum("mld...,ml...->md...", drst_m, du_m_q)

    uc_rep = u_f_ext[hang["hfi_coarse"], hang["hfi_cface"]]
    duc_rep = dudr_f_ext[hang["hfi_coarse"], hang["hfi_cface"]]
    for t in range(dim - 1):
        mats = hp[hang["hfi_bbit"][:, t]]  # [Mf, nl, nl]
        uc_rep = _row_mat_apply(mats, uc_rep, t)
        duc_rep = _row_mat_apply(mats, duc_rep, t)
    u_p = jnp.take_along_axis(
        uc_rep.reshape(Mf, nfl_flat), hang["hfi_perm_l"], axis=-1
    ).reshape((Mf,) + fshape_l)
    du_p = jnp.take_along_axis(
        duc_rep.reshape(Mf, dim, nfl_flat),
        hang["hfi_perm_l"][:, None, :], axis=-1,
    ).reshape((Mf, dim) + fshape_l)
    drst_p = jnp.take_along_axis(
        hang["hfi_drst_p"].astype(dtype).reshape(Mf, dim, dim, nfq_flat),
        hang["hfi_perm_q"][:, None, None, :], axis=-1,
    ).reshape((Mf, dim, dim) + fshape_q)

    u_p_q = _face_apply(Vq, u_p, dim)
    du_p_q = _face_apply(Vq, du_p, dim)
    dudx_p = jnp.einsum("mld...,ml...->md...", drst_p, du_p_q)

    jump = u_m_q - u_p_q
    term1 = -jnp.einsum("md...,md...->m...", n, 0.5 * (dudx_m + dudx_p)) * sj
    drst_n = jnp.einsum("mld...,md...->ml...", drst_m, n)
    term2 = -0.5 * drst_n * (sj * jump)[:, None]
    term3 = sj * sig * jump

    vt1 = _face_apply(Vq.T, wf * term1, dim)
    vt2 = _face_apply(Vq.T, wf * term2, dim)
    vt3 = _face_apply(Vq.T, wf * term3, dim)

    Au = _face_scatter_dynamic(Au, fe, ff, vt1 + vt3, dim, nl)
    for l in range(dim):
        Au = _face_scatter_dynamic(Au, fe, ff, vt2[:, l], dim, nl,
                                   D=D, term2_l=l)
    return Au


@dataclasses.dataclass
class HaloProgram:
    n_dev: int
    B: int  # elements per shard
    H: int  # halo slots (max over shards; slot H is the trash pad)
    K: int  # max elements exchanged per (src,dst) pair
    send_idx: jnp.ndarray  # [n, n, K] local element ids to send (pad 0)
    recv_pos: jnp.ndarray  # [n, n, K] halo slot of each received element (pad H)
    nbr_local: jnp.ndarray  # [n, B, 2d] neighbor ids in [0, B+H+1)
    halo_face_drst: jnp.ndarray  # [n, H+1, 2d, d, d, nfq...]
    # ---- hanging mortar tables, padded per shard (pad rows index the
    # trash slot B+H: reads see zeros, scatter targets are out of the
    # [B+1)-row output and get DROPPED by jit scatter semantics) --------
    Mc: int = 0  # coarse rows per shard (max, padded)
    Mf: int = 0  # fine rows per shard (max, padded)
    hco_elem: jnp.ndarray | None = None  # [n, Mc] local coarse elem
    hco_face: jnp.ndarray | None = None  # [n, Mc]
    hco_fine: jnp.ndarray | None = None  # [n, Mc, K2] local+halo idx
    hco_fine_face: jnp.ndarray | None = None  # [n, Mc, K2]
    hco_perm_l: jnp.ndarray | None = None  # [n, Mc, K2, nfl_flat]
    hco_perm_q: jnp.ndarray | None = None  # [n, Mc, K2, nfq_flat]
    hco_sj: jnp.ndarray | None = None  # [n, Mc, K2, nfq...]
    hco_n: jnp.ndarray | None = None  # [n, Mc, K2, d, nfq...]
    hco_drst_m: jnp.ndarray | None = None  # [n, Mc, K2, d, d, nfq...]
    hco_sigma: jnp.ndarray | None = None  # [n, Mc, K2]
    hfi_elem: jnp.ndarray | None = None  # [n, Mf] local fine elem
    hfi_face: jnp.ndarray | None = None  # [n, Mf]
    hfi_bbit: jnp.ndarray | None = None  # [n, Mf, dim-1] child bits
    hfi_coarse: jnp.ndarray | None = None  # [n, Mf] local+halo idx
    hfi_cface: jnp.ndarray | None = None  # [n, Mf]
    hfi_perm_l: jnp.ndarray | None = None  # [n, Mf, nfl_flat]
    hfi_perm_q: jnp.ndarray | None = None  # [n, Mf, nfq_flat]
    hfi_drst_p: jnp.ndarray | None = None  # [n, Mf, d, d, nfq...]
    hfi_sigma: jnp.ndarray | None = None  # [n, Mf]


_HALO_META = ("n_dev", "B", "H", "K", "Mc", "Mf")
_HALO_DATA = tuple(
    f.name for f in dataclasses.fields(HaloProgram) if f.name not in _HALO_META
)


def _halo_flatten(h):
    return (
        tuple(getattr(h, k) for k in _HALO_DATA),
        tuple(getattr(h, k) for k in _HALO_META),
    )


def _halo_unflatten(aux, ch):
    return HaloProgram(**dict(zip(_HALO_META, aux)), **dict(zip(_HALO_DATA, ch)))


jax.tree_util.register_pytree_node(HaloProgram, _halo_flatten, _halo_unflatten)


def build_halo_program(mesh: MeshData, n_dev: int) -> HaloProgram:
    """Build the per-epoch halo exchange + local work tables for a block
    SFC partition, covering conforming, boundary AND hanging faces.

    Hanging mortars are assigned: the coarse row of mortar m runs on the
    shard owning the coarse element; each fine row (m, b) runs on the
    shard owning that fine element (both only ever scatter into their own
    elements).  Remote participants (fine partners of local coarse rows,
    coarse partners of local fine rows) join the halo element set, so the
    one volume-value exchange covers them too — the role of the
    reference's variable-size ghost exchange for adapted meshes
    (`Mesh/d4est_ghost_data.c:143-246`)."""
    E = mesh.n_elements
    assert E % n_dev == 0, (E, n_dev)
    B = E // n_dev
    nbr = np.asarray(mesh.nbr_elem)  # [E, 2d]
    nfaces = nbr.shape[1]

    M_g = int(mesh.hc_elem.shape[0])
    hc_elem_g = np.asarray(mesh.hc_elem)
    hc_face_g = np.asarray(mesh.hc_face)
    K2 = 1 << (mesh.dim - 1)
    hc_fine_g = np.asarray(mesh.hc_fine).reshape(M_g, K2)
    hc_fine_face_g = np.asarray(mesh.hc_fine_face).reshape(M_g, K2)

    ext_sets = []
    for s in range(n_dev):
        lo, hi = s * B, (s + 1) * B
        blk = nbr[lo:hi]
        remote = list(blk[(blk < lo) | (blk >= hi)])
        for m in range(M_g):
            ce = int(hc_elem_g[m])
            fines = [int(x) for x in hc_fine_g[m]]
            if lo <= ce < hi:
                remote += [x for x in fines if not (lo <= x < hi)]
            for x in fines:
                if lo <= x < hi and not (lo <= ce < hi):
                    remote.append(ce)
        ext_sets.append(np.unique(np.asarray(remote, np.int64)))
    H = max((len(x) for x in ext_sets), default=0)

    send_lists = {}  # (src, dst) -> local ids at src
    for dst, ext in enumerate(ext_sets):
        for g in ext:
            src = int(g) // B
            send_lists.setdefault((src, dst), []).append(int(g) - src * B)
    K = max((len(v) for v in send_lists.values()), default=1)
    K = max(K, 1)

    send_idx = np.zeros((n_dev, n_dev, K), np.int32)
    recv_pos = np.full((n_dev, n_dev, K), H, np.int32)  # pad -> trash slot
    halo_index = [
        {int(g): i for i, g in enumerate(ext)} for ext in ext_sets
    ]
    for (src, dst), locs in send_lists.items():
        for k, loc in enumerate(locs):
            send_idx[src, dst, k] = loc
            g = src * B + loc
            recv_pos[dst, src, k] = halo_index[dst][g]

    # neighbor tables remapped to local + halo indexing
    nbr_local = np.zeros((n_dev, B, nfaces), np.int32)
    for s in range(n_dev):
        blk = nbr[s * B:(s + 1) * B]
        local = (blk >= s * B) & (blk < (s + 1) * B)
        out = np.where(local, blk - s * B, 0)
        for f in range(nfaces):
            for e in range(B):
                if not local[e, f]:
                    out[e, f] = B + halo_index[s][int(blk[e, f])]
        nbr_local[s] = out

    # static face factors of halo elements (drst needed for dudx_p)
    fd = np.asarray(mesh.face_drst)  # [E, 2d, d, d, nfq...]
    halo_fd = np.zeros((n_dev, H + 1) + fd.shape[1:], fd.dtype)
    for s in range(n_dev):
        for i, g in enumerate(ext_sets[s]):
            halo_fd[s, i] = fd[int(g)]

    # ---- hanging mortar work tables per shard ---------------------------
    hang = {}
    Mc = Mf = 0
    if M_g > 0:
        dim = mesh.dim
        TRASH = B + H
        loc_of = []  # per shard: global -> local-or-halo index
        for s in range(n_dev):
            d = {int(g): B + i for i, g in enumerate(ext_sets[s])}
            for j in range(B):
                d[s * B + j] = j
            loc_of.append(d)

        co_rows = [
            [m for m in range(M_g) if int(hc_elem_g[m]) // B == s]
            for s in range(n_dev)
        ]
        fi_rows = [
            [
                (m, b)
                for m in range(M_g)
                for b in range(K2)
                if int(hc_fine_g[m, b]) // B == s
            ]
            for s in range(n_dev)
        ]
        Mc = max((len(r) for r in co_rows), default=0)
        Mf = max((len(r) for r in fi_rows), default=0)
        Mc, Mf = max(Mc, 1), max(Mf, 1)

        nfl_flat = mesh.nl ** (dim - 1)
        nfq_flat = mesh.nq ** (dim - 1)
        fq = (mesh.nq,) * (dim - 1)
        hc_perm_l_g = np.asarray(mesh.hc_perm_l)
        hc_perm_q_g = np.asarray(mesh.hc_perm_q)
        hc_sj_g = np.asarray(mesh.hc_sj)
        hc_n_g = np.asarray(mesh.hc_n)
        hc_drst_g = np.asarray(mesh.hc_drst_m)
        hf_perm_l_g = np.asarray(mesh.hf_perm_l).reshape(M_g, K2, -1)
        hf_perm_q_g = np.asarray(mesh.hf_perm_q).reshape(M_g, K2, -1)
        # sigma stored broadcast-ready against [.., nfq...] face arrays:
        # scalar penalty -> trailing 1s; pointwise (j_div_sj_quad) -> the
        # full per-quad-point tables, fine side pre-permuted into each
        # fine frame (the `_apply_hanging` take_along_axis done on host)
        if mesh.hc_sigma_q is not None:
            sig_shape = fq
            hc_sig_g = np.asarray(mesh.hc_sigma_q)  # [M, K2, fq...]
            hf_sig_g = np.take_along_axis(
                hc_sig_g.reshape(M_g * K2, nfq_flat),
                hf_perm_q_g.reshape(M_g * K2, nfq_flat),
                axis=-1,
            ).reshape((M_g, K2) + fq)
        else:
            sig_shape = (1,) * (dim - 1)
            hc_sig_g = np.asarray(mesh.hc_sigma).reshape(
                (M_g, K2) + sig_shape
            )
            hf_sig_g = hc_sig_g

        hco_elem = np.full((n_dev, Mc), TRASH, np.int32)
        hco_face = np.zeros((n_dev, Mc), np.int32)
        hco_fine = np.full((n_dev, Mc, K2), TRASH, np.int32)
        hco_fine_face = np.zeros((n_dev, Mc, K2), np.int32)
        hco_perm_l = np.zeros((n_dev, Mc, K2, nfl_flat), np.int32)
        hco_perm_q = np.zeros((n_dev, Mc, K2, nfq_flat), np.int32)
        hco_sj = np.zeros((n_dev, Mc, K2) + fq)
        hco_n = np.zeros((n_dev, Mc, K2, dim) + fq)
        hco_drst_m = np.zeros((n_dev, Mc, K2, dim, dim) + fq)
        hco_sigma = np.zeros((n_dev, Mc, K2) + sig_shape)
        hfi_elem = np.full((n_dev, Mf), TRASH, np.int32)
        hfi_face = np.zeros((n_dev, Mf), np.int32)
        hfi_bbit = np.zeros((n_dev, Mf, max(dim - 1, 1)), np.int32)
        hfi_coarse = np.full((n_dev, Mf), TRASH, np.int32)
        hfi_cface = np.zeros((n_dev, Mf), np.int32)
        hfi_perm_l = np.zeros((n_dev, Mf, nfl_flat), np.int32)
        hfi_perm_q = np.zeros((n_dev, Mf, nfq_flat), np.int32)
        hfi_drst_p = np.zeros((n_dev, Mf, dim, dim) + fq)
        hfi_sigma = np.zeros((n_dev, Mf) + sig_shape)

        for s in range(n_dev):
            for i, m in enumerate(co_rows[s]):
                hco_elem[s, i] = loc_of[s][int(hc_elem_g[m])]
                hco_face[s, i] = int(hc_face_g[m])
                for b in range(K2):
                    hco_fine[s, i, b] = loc_of[s][int(hc_fine_g[m, b])]
                hco_fine_face[s, i] = hc_fine_face_g[m]
                hco_perm_l[s, i] = hc_perm_l_g[m]
                hco_perm_q[s, i] = hc_perm_q_g[m]
                hco_sj[s, i] = hc_sj_g[m]
                hco_n[s, i] = hc_n_g[m]
                hco_drst_m[s, i] = hc_drst_g[m]
                hco_sigma[s, i] = hc_sig_g[m]
            for i, (m, b) in enumerate(fi_rows[s]):
                hfi_elem[s, i] = loc_of[s][int(hc_fine_g[m, b])]
                hfi_face[s, i] = int(hc_fine_face_g[m, b])
                for t in range(dim - 1):
                    hfi_bbit[s, i, t] = (b >> t) & 1
                hfi_coarse[s, i] = loc_of[s][int(hc_elem_g[m])]
                hfi_cface[s, i] = int(hc_face_g[m])
                hfi_perm_l[s, i] = hf_perm_l_g[m, b]
                hfi_perm_q[s, i] = hf_perm_q_g[m, b]
                hfi_drst_p[s, i] = hc_drst_g[m, b]
                hfi_sigma[s, i] = hf_sig_g[m, b]

        hang = dict(
            hco_elem=jnp.asarray(hco_elem),
            hco_face=jnp.asarray(hco_face),
            hco_fine=jnp.asarray(hco_fine),
            hco_fine_face=jnp.asarray(hco_fine_face),
            hco_perm_l=jnp.asarray(hco_perm_l),
            hco_perm_q=jnp.asarray(hco_perm_q),
            hco_sj=jnp.asarray(hco_sj),
            hco_n=jnp.asarray(hco_n),
            hco_drst_m=jnp.asarray(hco_drst_m),
            hco_sigma=jnp.asarray(hco_sigma),
            hfi_elem=jnp.asarray(hfi_elem),
            hfi_face=jnp.asarray(hfi_face),
            hfi_bbit=jnp.asarray(hfi_bbit),
            hfi_coarse=jnp.asarray(hfi_coarse),
            hfi_cface=jnp.asarray(hfi_cface),
            hfi_perm_l=jnp.asarray(hfi_perm_l),
            hfi_perm_q=jnp.asarray(hfi_perm_q),
            hfi_drst_p=jnp.asarray(hfi_drst_p),
            hfi_sigma=jnp.asarray(hfi_sigma),
        )

    return HaloProgram(
        n_dev=n_dev,
        B=B,
        H=H,
        K=K,
        Mc=Mc,
        Mf=Mf,
        send_idx=jnp.asarray(send_idx),
        recv_pos=jnp.asarray(recv_pos),
        nbr_local=jnp.asarray(nbr_local),
        halo_face_drst=jnp.asarray(halo_fd),
        **hang,
    )


def apply_sipg_halo(mesh: MeshData, halo: HaloProgram, u, dev_mesh: Mesh,
                    robin_coeff=None):
    """Halo-exchange SIPG apply: jit(shard_map(...)) over the "e" axis.

    `mesh` arrays and `u` must be sharded over `dev_mesh`; returns Au with
    the same sharding.  Matches `apply_sipg(mesh, u, g)` bitwise up to
    float reassociation.  Pointwise penalties (sigma_q, the
    FACE_H_EQ_J_DIV_SJ_QUAD mode every curved flagship config uses) ride
    the same program: σ tables are element-major and shard with the face
    arrays.
    """
    dim, deg, deg_quad = mesh.dim, mesh.deg, mesh.deg_quad
    nl, nq = deg + 1, deg_quad + 1
    dtype = u.dtype
    nfaces = 2 * dim
    B, H, K, n_dev = halo.B, halo.H, halo.K, halo.n_dev
    nfl_flat = nl ** (dim - 1)
    nfq_flat = nq ** (dim - 1)
    fshape_l = (nl,) * (dim - 1)
    fshape_q = (nq,) * (dim - 1)

    D = jnp.asarray(DB.ops(deg).diff, dtype)
    Vq = jnp.asarray(mesh.quad.interp(deg, deg_quad), dtype)
    _, wq1 = mesh.quad.nodes_weights(deg_quad)
    wf = tensor.tensor_weights([wq1] * (dim - 1), dtype=dtype)
    hanging = halo.Mc > 0 or halo.Mf > 0
    use_robin = robin_coeff is not None
    K2 = 1 << (dim - 1)

    def body(
        u_l, wjgg, face_drst, face_n, face_sj, sigma, bnd, cmask_in,
        nbr_face, perm_l, perm_q,
        send_idx, recv_pos, nbr_local, halo_fd, hang, robin,
    ):
        # shard_map passes blocks with the sharded axis REMOVED only for
        # rank-reduced specs; we use full specs so leading dims are local.
        send_idx = send_idx[0]
        recv_pos = recv_pos[0]
        nbr_local = nbr_local[0]
        halo_fd = halo_fd[0]
        hang = {k: v[0] for k, v in hang.items()}

        # ---- halo exchange of volume nodal values ----------------------
        send_buf = u_l[send_idx.reshape(-1)].reshape(
            (n_dev, K) + u_l.shape[1:]
        )
        recv = jax.lax.all_to_all(
            send_buf, "e", split_axis=0, concat_axis=0, tiled=False
        )
        # recv: [n_dev, K, nl...]; scatter into halo buffer [H+1, nl...]
        halo_u = jnp.zeros((H + 1,) + u_l.shape[1:], dtype)
        halo_u = halo_u.at[recv_pos.reshape(-1)].set(
            recv.reshape((-1,) + u_l.shape[1:])
        )
        u_ext = jnp.concatenate([u_l, halo_u], axis=0)  # [B+H+1, nl...]

        # ---- volume stiffness (local) ----------------------------------
        dudr_l = [tensor.apply_axis(D, u_l, l) for l in range(dim)]
        t = [tensor.apply_iso(Vq, dudr_l[l], dim) for l in range(dim)]
        Au = jnp.zeros_like(u_l)
        for lp in range(dim):
            s = jnp.zeros_like(t[0])
            for l in range(dim):
                s = s + wjgg[:, lp, l].astype(dtype) * t[l]
            s = tensor.apply_iso(Vq.T, s, dim)
            Au = Au + tensor.apply_axis(D.T, s, lp)

        # ---- face traces on the EXTENDED element set -------------------
        dudr_ext = [tensor.apply_axis(D, u_ext, l) for l in range(dim)]
        u_f_ext = _face_slices(u_ext, dim)  # [B+H+1, 2d, nfl...]
        dudr_f_ext = jnp.stack(
            [_face_slices(dudr_ext[l], dim) for l in range(dim)], axis=2
        )
        face_drst_ext = jnp.concatenate(
            [face_drst.astype(dtype), halo_fd.astype(dtype)], axis=0
        )

        u_f = u_f_ext[:B]
        dudr_f = dudr_f_ext[:B]

        u_p = _gather_nd(
            u_f_ext.reshape(B + H + 1, nfaces, nfl_flat)[:, :, None],
            nbr_local, nbr_face, perm_l,
        )[:, :, 0].reshape((B, nfaces) + fshape_l)
        dudr_p = _gather_nd(
            dudr_f_ext.reshape(B + H + 1, nfaces, dim, nfl_flat),
            nbr_local, nbr_face, perm_l,
        ).reshape((B, nfaces, dim) + fshape_l)
        drst_p = _gather_nd(
            face_drst_ext.reshape(B + H + 1, nfaces, dim, dim, nfq_flat),
            nbr_local, nbr_face, perm_q,
        ).reshape((B, nfaces, dim, dim) + fshape_q)

        u_m_q = _face_apply(Vq, u_f, dim)
        u_p_q = _face_apply(Vq, u_p, dim)
        du_m_q = _face_apply(Vq, dudr_f, dim)
        du_p_q = _face_apply(Vq, dudr_p, dim)

        drst_m = face_drst.astype(dtype)
        n_m = face_n.astype(dtype)
        sj = face_sj.astype(dtype)

        dudx_m = jnp.einsum("efld...,efl...->efd...", drst_m, du_m_q)
        dudx_p = jnp.einsum("efld...,efl...->efd...", drst_p, du_p_q)

        bshape = bnd.shape + (1,) * (dim - 1)
        bnd_b = bnd.reshape(bshape)
        u_p_q = jnp.where(bnd_b, 0.0, u_p_q)
        dudx_p = jnp.where(bnd_b[:, :, None], dudx_m, dudx_p)

        jump = u_m_q - u_p_q
        c2 = jnp.where(bnd_b, 2.0, 1.0).astype(dtype)
        term1 = (
            -jnp.einsum("efd...,efd...->ef...", n_m, 0.5 * (dudx_m + dudx_p))
            * sj
        )
        drst_n = jnp.einsum("efld...,efd...->efl...", drst_m, n_m)
        term2 = -0.5 * c2[:, :, None] * drst_n * (sj * jump)[:, :, None]
        # sigma arrives broadcast-ready: [B, 2d, 1...] (scalar penalty)
        # or [B, 2d, nfq...] (pointwise j_div_sj_quad)
        term3 = sj * sigma.astype(dtype) * jump

        if use_robin:
            # Robin BC ∂u/∂n + c·u = r replaces ALL boundary flux terms
            # by ∫ sj·c·u·v (`d4est_laplacian_flux_sipg_robin_aux`);
            # boundary faces are shard-local so no exchange is involved
            robin_term = sj * robin.astype(dtype) * u_m_q
            term1 = jnp.where(bnd_b, robin_term, term1)
            term2 = jnp.where(bnd_b[:, :, None], 0.0, term2)
            term3 = jnp.where(bnd_b, 0.0, term3)

        vt1 = _face_apply(Vq.T, wf * term1, dim)
        vt2 = _face_apply(Vq.T, wf * term2, dim)
        vt3 = _face_apply(Vq.T, wf * term3, dim)

        # hanging faces are handled by the mortar passes below
        cm = cmask_in.reshape(bshape).astype(dtype)
        vt1 = vt1 * cm
        vt2 = vt2 * cm[:, :, None]
        vt3 = vt3 * cm

        for f in range(nfaces):
            Au = Au + tensor.face_scatter(vt1[:, f] + vt3[:, f], f, dim, nl)
            for l in range(dim):
                lifted = tensor.face_scatter(vt2[:, f, l], f, dim, nl)
                Au = Au + tensor.apply_axis(D.T, lifted, l)

        if hanging:
            Au = Au + _hanging_passes(
                hang, u_f_ext, dudr_f_ext, face_drst_ext,
                face_sj, face_n, Vq, wf, D, dtype, dim, nl, nq, B,
            )
        return Au

    try:
        from jax import shard_map as _sm

        def shard_map(f, mesh, in_specs, out_specs, check_rep=False):
            return _sm(
                f, mesh=mesh, in_specs=in_specs, out_specs=out_specs,
                check_vma=check_rep,
            )
    except Exception:  # pragma: no cover
        from jax.experimental.shard_map import shard_map as _sme

        def shard_map(f, mesh, in_specs, out_specs, check_rep=False):
            return _sme(
                f, mesh=mesh, in_specs=in_specs, out_specs=out_specs,
                check_rep=check_rep,
            )

    hang_args = (
        {
            k: getattr(halo, k)
            for k in (
                "hco_elem", "hco_face", "hco_fine", "hco_fine_face",
                "hco_perm_l", "hco_perm_q", "hco_sj", "hco_n",
                "hco_drst_m", "hco_sigma", "hfi_elem", "hfi_face",
                "hfi_bbit", "hfi_coarse", "hfi_cface", "hfi_perm_l",
                "hfi_perm_q", "hfi_drst_p", "hfi_sigma",
            )
        }
        if hanging
        else {}
    )
    sigma_arg = (
        mesh.sigma_q
        if mesh.sigma_q is not None
        else mesh.sigma.reshape(mesh.sigma.shape + (1,) * (dim - 1))
    )
    robin_arg = (
        robin_coeff
        if use_robin
        else jnp.zeros(mesh.sigma.shape + (1,) * (dim - 1), dtype)
    )
    e_spec = P("e")
    mapped = shard_map(
        body,
        mesh=dev_mesh,
        in_specs=(e_spec,) * 17,
        out_specs=e_spec,
    )
    return mapped(
        u, mesh.wjgg, mesh.face_drst, mesh.face_n, mesh.face_sj,
        sigma_arg, mesh.bnd_mask, mesh.conf_mask, mesh.nbr_face,
        mesh.perm_l, mesh.perm_q,
        halo.send_idx, halo.recv_pos, halo.nbr_local, halo.halo_face_drst,
        hang_args, robin_arg,
    )


def apply_sipg_hp_halo(mesh: MeshData, halo: HaloProgram, u_own, dev_mesh):
    """Mixed-degree (hp) halo apply: A_hp = Pᵀ A_max P with the
    storage-degree apply running through the halo program.  P is the
    block-diagonal per-element p-prolongation (`laplacian/hp.py`) —
    element-local, so it shards trivially and the halo still exchanges
    only storage-degree volume values (the reference exchanges
    variable-size per-element vectors, `Mesh/d4est_ghost_data.c:143-246`;
    padding to the storage degree is the TPU static-shape equivalent)."""
    from disco4est_tpu.laplacian.hp import adjoint_to_own, to_max

    Au = apply_sipg_halo(mesh, halo, to_max(mesh, u_own), dev_mesh)
    return adjoint_to_own(mesh, Au)
