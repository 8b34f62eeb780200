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

Round-1 scope: conforming + boundary meshes (hanging meshes fall back to
the GSPMD path).
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
from disco4est_tpu.laplacian.sipg import _face_apply, _gather_nd, _face_slices


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


jax.tree_util.register_pytree_node(
    HaloProgram,
    lambda h: (
        (h.send_idx, h.recv_pos, h.nbr_local, h.halo_face_drst),
        (h.n_dev, h.B, h.H, h.K),
    ),
    lambda aux, ch: HaloProgram(*aux, *ch),
)


def build_halo_program(mesh: MeshData, n_dev: int) -> HaloProgram:
    E = mesh.n_elements
    assert E % n_dev == 0, (E, n_dev)
    if mesh.hc_elem.shape[0] > 0:
        raise NotImplementedError(
            "halo apply currently covers conforming meshes; "
            "use the GSPMD path for hanging meshes"
        )
    B = E // n_dev
    nbr = np.asarray(mesh.nbr_elem)  # [E, 2d]
    nfaces = nbr.shape[1]

    owner = nbr // B
    ext_sets = []
    for s in range(n_dev):
        blk = nbr[s * B:(s + 1) * B]
        remote = blk[(blk < s * B) | (blk >= (s + 1) * B)]
        ext_sets.append(np.unique(remote))
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

    return HaloProgram(
        n_dev=n_dev,
        B=B,
        H=H,
        K=K,
        send_idx=jnp.asarray(send_idx),
        recv_pos=jnp.asarray(recv_pos),
        nbr_local=jnp.asarray(nbr_local),
        halo_face_drst=jnp.asarray(halo_fd),
    )


def apply_sipg_halo(mesh: MeshData, halo: HaloProgram, u, dev_mesh: Mesh):
    """Halo-exchange SIPG apply: jit(shard_map(...)) over the "e" axis.

    `mesh` arrays and `u` must be sharded over `dev_mesh`; returns Au with
    the same sharding.  Matches `apply_sipg(mesh, u, g)` bitwise up to
    float reassociation.
    """
    if mesh.sigma_q is not None:
        raise NotImplementedError(
            "sharded apply with pointwise penalty (j_div_sj_quad) not "
            "implemented yet"
        )
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

    def body(
        u_l, wjgg, face_drst, face_n, face_sj, sigma, bnd,
        nbr_face, perm_l, perm_q,
        send_idx, recv_pos, nbr_local, halo_fd,
    ):
        # shard_map passes blocks with the sharded axis REMOVED only for
        # rank-reduced specs; we use full specs so leading dims are local.
        send_idx = send_idx[0]
        recv_pos = recv_pos[0]
        nbr_local = nbr_local[0]
        halo_fd = halo_fd[0]

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
        term3 = sj * sigma.astype(dtype).reshape(bshape) * jump

        vt1 = _face_apply(Vq.T, wf * term1, dim)
        vt2 = _face_apply(Vq.T, wf * term2, dim)
        vt3 = _face_apply(Vq.T, wf * term3, dim)

        for f in range(nfaces):
            Au = Au + tensor.face_scatter(vt1[:, f] + vt3[:, f], f, dim, nl)
            for l in range(dim):
                lifted = tensor.face_scatter(vt2[:, f, l], f, dim, nl)
                Au = Au + tensor.apply_axis(D.T, lifted, l)
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

    e_spec = P("e")
    mapped = shard_map(
        body,
        mesh=dev_mesh,
        in_specs=(e_spec,) * 14,
        out_specs=e_spec,
    )
    return mapped(
        u, mesh.wjgg, mesh.face_drst, mesh.face_n, mesh.face_sj,
        mesh.sigma, mesh.bnd_mask, mesh.nbr_face, mesh.perm_l, mesh.perm_q,
        halo.send_idx, halo.recv_pos, halo.nbr_local, halo.halo_face_drst,
    )
