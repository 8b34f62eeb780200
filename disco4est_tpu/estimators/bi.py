"""A-posteriori error estimator η² per element ("bi" estimator).

Role of the reference's `Estimators/d4est_estimator_bi.c:350-602`:

  η²(e) = (h_vol/p)² ‖R‖²_{L2(e)}                       (volume residual)
        + Σ_faces ∫ Je1² sj                             (∇u jump)
        + Σ_faces Σ_d ∫ Je2_d² sj                       (u jump)

with Je1 = c_∇·n·(∇u⁻−∇u⁺), Je2_d = c_u·n_d(u⁻−u⁺) (boundary: u−g),
prefactors from the Houston library (`d4est_estimator_bi.h:25-200`).
R is the nodal residual Au−rhs, measured through the mass matrix exactly
as `d4est_mesh_compute_l2_norm_sqr` does.

Batched: one fused kernel over conforming/boundary faces plus the hanging
mortar rows, sharing the face machinery of the SIPG apply.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from disco4est_tpu.mesh.builder import MeshData
from disco4est_tpu.ops import tensor
from disco4est_tpu.ops.operators import DB
from disco4est_tpu.laplacian import sipg as _sipg


def _prefactors(mesh: MeshData, penalty_prefactor: float, flavor: str):
    """(c_gradu², c_u², c_u_dirichlet²) per directed face [E, 2d].

    Houston flavors (`houston_gradu_prefactor_maxp_minh` etc.):
      c_∇² = ½·min(h)/max(p);  c_u² = ½·pf·max(p)²/min(h);
      boundary c_u² without the ½.
    """
    h_m = mesh.face_h
    h_p = mesh.face_h[mesh.nbr_elem, mesh.nbr_face]
    min_h = jnp.minimum(h_m, h_p)
    p_e = mesh.deg_e.astype(h_m.dtype)
    p_m = jnp.broadcast_to(p_e[:, None], h_m.shape)
    p = jnp.maximum(p_m, p_e[mesh.nbr_elem])  # max(p⁻, p⁺); bnd: nbr = self
    if flavor == "houston_maxp_minh":
        c_grad2 = 0.5 * min_h / p
        c_u2 = 0.5 * penalty_prefactor * p * p / min_h
        c_u2_dirichlet = penalty_prefactor * p_m * p_m / h_m
    elif flavor == "maxp_minh":
        c_grad2 = min_h / p
        c_u2 = penalty_prefactor * p * p / min_h
        c_u2_dirichlet = penalty_prefactor * p_m * p_m / h_m
    else:
        raise ValueError(flavor)
    return c_grad2, c_u2, c_u2_dirichlet


from functools import partial as _partial


@_partial(jax.jit, static_argnames=("vol_h",))
def _estimate_bi_impl(mesh: MeshData, u, residual, g, pf, vol_h="cube_approx"):
    dim, deg, deg_quad = mesh.dim, mesh.deg, mesh.deg_quad
    nl, nq = deg + 1, deg_quad + 1
    E = u.shape[0]
    dtype = u.dtype
    K = 1 << (dim - 1)

    # ---- volume term ---------------------------------------------------
    # h_vol: CUBE_APPROX ~ element diameter / sqrt(dim) (VOL_H_EQ_CUBE_APPROX)
    xs = mesh.xyz_lobatto.reshape(E, dim, -1)
    diam = jnp.sqrt(
        jnp.max(
            jnp.sum(
                (xs[:, :, :, None] - xs[:, :, None, :]) ** 2, axis=1
            ),
            axis=(1, 2),
        )
    )
    # volume h option (`d4est_mesh_data_compute_volume_diam`):
    # VOL_H_EQ_DIAM = max pairwise Lobatto distance; CUBE_APPROX divides
    # by sqrt(dim).  TwoPunctures configs use DIAM.
    h_vol = diam if vol_h == "diam" else diam / np.sqrt(dim)
    p_e = mesh.deg_e.astype(dtype)
    eta2 = (h_vol / p_e) ** 2 * mesh.l2_norm_sqr(residual)

    # ---- face terms (conforming + boundary, fused) ---------------------
    D = jnp.asarray(DB.ops(deg).diff, dtype)
    Vq = jnp.asarray(mesh.quad.interp(deg, deg_quad), dtype)
    _, wq1 = mesh.quad.nodes_weights(deg_quad)
    wf = tensor.tensor_weights([wq1] * (dim - 1), dtype=dtype)

    dudr = [tensor.apply_axis(D, u, l) for l in range(dim)]
    u_f = _sipg._face_slices(u, dim)
    dudr_f = jnp.stack([_sipg._face_slices(dudr[l], dim) for l in range(dim)], axis=2)

    nfl_flat = nl ** (dim - 1)
    nfq_flat = nq ** (dim - 1)
    fshape_l = (nl,) * (dim - 1)
    fshape_q = (nq,) * (dim - 1)

    u_p = _sipg._gather_nd(
        u_f.reshape(E, 2 * dim, nfl_flat)[:, :, None],
        mesh.nbr_elem, mesh.nbr_face, mesh.perm_l,
    )[:, :, 0].reshape((E, 2 * dim) + fshape_l)
    dudr_p = _sipg._gather_nd(
        dudr_f.reshape(E, 2 * dim, dim, nfl_flat),
        mesh.nbr_elem, mesh.nbr_face, mesh.perm_l,
    ).reshape((E, 2 * dim, dim) + fshape_l)
    drst_p = _sipg._gather_nd(
        mesh.face_drst.astype(dtype).reshape(E, 2 * dim, dim, dim, nfq_flat),
        mesh.nbr_elem, mesh.nbr_face, mesh.perm_q,
    ).reshape((E, 2 * dim, dim, dim) + fshape_q)

    u_m_q = _sipg._face_apply(Vq, u_f, dim)
    u_p_q = _sipg._face_apply(Vq, u_p, dim)
    du_m_q = _sipg._face_apply(Vq, dudr_f, dim)
    du_p_q = _sipg._face_apply(Vq, dudr_p, dim)

    drst_m = mesh.face_drst.astype(dtype)
    n_m = mesh.face_n.astype(dtype)
    sj = mesh.face_sj.astype(dtype)

    dudx_m = jnp.einsum("efld...,efl...->efd...", drst_m, du_m_q)
    dudx_p = jnp.einsum("efld...,efl...->efd...", drst_p, du_p_q)

    bnd = mesh.bnd_mask
    bshape = bnd.shape + (1,) * (dim - 1)
    bnd_b = bnd.reshape(bshape)
    if g is None:
        g_q = jnp.zeros_like(u_m_q)
    else:
        g_q = _sipg._face_apply(Vq, g.astype(dtype), dim)
    u_p_q = jnp.where(bnd_b, g_q, u_p_q)
    dudx_p = jnp.where(bnd_b[:, :, None], dudx_m, dudx_p)

    c_grad2, c_u2, c_u2_d = _prefactors(mesh, pf, "houston_maxp_minh")
    c_u2 = jnp.where(bnd, c_u2_d, c_u2)

    jump_u = u_m_q - u_p_q
    jump_du = jnp.einsum("efd...,efd...->ef...", n_m, dudx_m - dudx_p)

    # boundary faces contribute no gradient-jump term
    # (`d4est_estimator_bi_dirichlet` computes Je2 only)
    cmask = mesh.conf_mask.reshape(bshape).astype(dtype)
    grad_mask = (mesh.conf_mask & ~bnd).reshape(bshape).astype(dtype)

    Je1_2 = c_grad2.reshape(bshape) * jump_du**2 * grad_mask
    # Σ_d (n_d jump_u)² = jump_u² (unit normal)
    Je2_2 = c_u2.reshape(bshape) * jump_u**2 * cmask

    face_int = jnp.sum(
        (wf * sj * (Je1_2 + Je2_2)).reshape(E, 2 * dim, -1), axis=(1, 2)
    )
    eta2 = eta2 + face_int

    # ---- hanging mortar contributions ----------------------------------
    M = mesh.hc_elem.shape[0]
    if M > 0:
        hp = jnp.asarray(
            np.stack([DB.hp_prolong(deg, deg, c) for c in (0, 1)]), dtype
        )
        ce, cfc = mesh.hc_elem, mesh.hc_face
        uc = u_f[ce, cfc]
        duc = dudr_f[ce, cfc]
        h_c = mesh.face_h[ce, cfc]
        for b in range(K):
            bits = [(b >> t) & 1 for t in range(dim - 1)]
            u_m_sub, du_m_sub = uc, duc
            for t in range(dim - 1):
                u_m_sub = tensor.apply_axis(hp[bits[t]], u_m_sub, t)
                du_m_sub = tensor.apply_axis(hp[bits[t]], du_m_sub, t)
            u_mq = _sipg._face_apply(Vq, u_m_sub, dim)
            du_mq = _sipg._face_apply(Vq, du_m_sub, dim)
            drstm = mesh.hc_drst_m[:, b].astype(dtype)
            dudxm = jnp.einsum("mld...,ml...->md...", drstm, du_mq)

            fe = mesh.hc_fine[:, b]
            ff = mesh.hc_fine_face[:, b]
            uf = jnp.take_along_axis(
                u_f[fe, ff].reshape(M, nfl_flat), mesh.hc_perm_l[:, b], axis=-1
            ).reshape((M,) + fshape_l)
            duf = jnp.take_along_axis(
                dudr_f[fe, ff].reshape(M, dim, nfl_flat),
                mesh.hc_perm_l[:, b, None, :],
                axis=-1,
            ).reshape((M, dim) + fshape_l)
            drstp = jnp.take_along_axis(
                mesh.face_drst[fe, ff].astype(dtype).reshape(M, dim, dim, nfq_flat),
                mesh.hc_perm_q[:, b, None, None, :],
                axis=-1,
            ).reshape((M, dim, dim) + fshape_q)
            u_pq = _sipg._face_apply(Vq, uf, dim)
            du_pq = _sipg._face_apply(Vq, duf, dim)
            dudxp = jnp.einsum("mld...,ml...->md...", drstp, du_pq)

            sjm = mesh.hc_sj[:, b].astype(dtype)
            nm = mesh.hc_n[:, b].astype(dtype)
            h_f = mesh.face_h[fe, ff]
            min_h = jnp.minimum(h_c, h_f)
            p = jnp.maximum(p_e[ce], p_e[fe])  # max(p⁻, p⁺) per mortar row
            cg2 = (0.5 * min_h / p).reshape((M,) + (1,) * (dim - 1))
            cu2 = (0.5 * pf * p * p / min_h).reshape((M,) + (1,) * (dim - 1))

            ju = u_mq - u_pq
            jdu = jnp.einsum("md...,md...->m...", nm, dudxm - dudxp)
            contrib = jnp.sum(
                (wf * sjm * (cg2 * jdu**2 + cu2 * ju**2)).reshape(M, -1),
                axis=1,
            )
            # both sides accumulate the same mortar integral
            eta2 = eta2.at[ce].add(contrib)
            eta2 = eta2.at[fe].add(contrib)
    return eta2


def estimate_bi(mesh: MeshData, u, residual, g=None, penalty_prefactor=2.0,
                vol_h="cube_approx"):
    """η² per element [E].  `residual` = Au − rhs (nodal).
    `vol_h`: volume-h option for the residual term ("cube_approx" or
    "diam", `Mesh/d4est_mesh.h:31-49` VOL_H_EQ_*)."""
    return _estimate_bi_impl(mesh, u, residual, g, penalty_prefactor, vol_h)
