"""Standalone DG (IP) energy norm via a mortar sweep.

Role of the reference's `dGMath/d4est_ip_energy_norm.c:1-448`:

    ‖u‖²_IP = ∫ |∇u|² J dV                      (volume term :349)
            + Σ_interfaces ∫ σ [u]² sj          (interface term :254)
            + Σ_boundary   ∫ σ (u−g)² sj        (boundary term :89)

with σ the SIPG penalty — here read from the mesh's precomputed penalty
arrays (sigma / sigma_q / hc_sigma*), so the norm uses exactly the
penalty function/prefactor/h-mode the operator was built with.

Unlike the quadratic-form shortcut eᵀAe (io/norms.norm_energy), this is
the literal face-sweep definition and reports the per-term breakdown
the reference prints.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from disco4est_tpu.mesh.builder import MeshData, vol_interp
from disco4est_tpu.ops import tensor
from disco4est_tpu.ops.operators import DB
from disco4est_tpu.laplacian import sipg as _sipg


@jax.jit
def ip_energy_norm_sqr(mesh: MeshData, u, g=None):
    """Returns dict(total, volume, interface, boundary) of ‖u‖²_IP.
    `g`: optional Dirichlet data [E, 2d, nfl...] for the boundary term
    (None ⇒ compare against zero)."""
    dim, deg, deg_quad = mesh.dim, mesh.deg, mesh.deg_quad
    nl, nq = deg + 1, deg_quad + 1
    E = u.shape[0]
    dtype = u.dtype
    nfaces = 2 * dim

    D = jnp.asarray(DB.ops(deg).diff, dtype)
    Vq = jnp.asarray(mesh.quad.interp(deg, deg_quad), dtype)
    _, wq1 = mesh.quad.nodes_weights(deg_quad)
    wf = tensor.tensor_weights([wq1] * (dim - 1), dtype=dtype)

    # ---- volume: Σ_l,l' ∫ (∂u/∂r_l)(∂u/∂r_l') wjgg[l,l'] ---------------
    dudr = [tensor.apply_axis(D, u, l) for l in range(dim)]
    t = [vol_interp(mesh, dudr[l]) for l in range(dim)]
    vol = jnp.zeros((), dtype)
    if mesh.wjgg_c is not None:
        w3 = tensor.tensor_weights([wq1] * dim, dtype=dtype)
        cshape = (E,) + (1,) * dim
        for l in range(dim):
            for lp in range(dim):
                c = mesh.wjgg_c[:, l, lp].astype(dtype).reshape(cshape)
                vol = vol + jnp.sum(c * w3 * t[l] * t[lp])
    else:
        for l in range(dim):
            for lp in range(dim):
                vol = vol + jnp.sum(
                    mesh.wjgg[:, l, lp].astype(dtype) * t[l] * t[lp]
                )

    # ---- conforming + boundary faces ------------------------------------
    nfl_flat = nl ** (dim - 1)
    fshape_l = (nl,) * (dim - 1)
    u_f = _sipg._face_slices(u, dim)
    u_p = _sipg._gather_nd(
        u_f.reshape(E, nfaces, nfl_flat)[:, :, None],
        mesh.nbr_elem, mesh.nbr_face, mesh.perm_l,
    )[:, :, 0].reshape((E, nfaces) + fshape_l)
    u_p = _sipg._apply_orient_codes(
        u_p, mesh.orient_code, mesh.orient_codes, dim
    )
    u_m_q = _sipg._face_apply(Vq, u_f, dim)
    u_p_q = _sipg._face_apply(Vq, u_p, dim)

    bnd = mesh.bnd_mask
    bshape = bnd.shape + (1,) * (dim - 1)
    bnd_b = bnd.reshape(bshape)
    if g is None:
        g_q = jnp.zeros_like(u_m_q)
    else:
        g_q = _sipg._face_apply(Vq, g.astype(dtype), dim)
    u_p_q = jnp.where(bnd_b, g_q, u_p_q)
    jump2 = (u_m_q - u_p_q) ** 2

    if mesh.face_sj_c is not None:
        sj = mesh.face_sj_c.astype(dtype).reshape(bshape)
    else:
        sj = mesh.face_sj.astype(dtype)
    if mesh.sigma_q is not None:
        sig = mesh.sigma_q.astype(dtype)
    else:
        sig = mesh.sigma.astype(dtype).reshape(bshape)

    integrand = wf * sj * sig * jump2
    conf_int = mesh.conf_mask & ~bnd
    # each interior face is visited from BOTH sides: halve
    interface = 0.5 * jnp.sum(
        jnp.where(conf_int.reshape(bshape), integrand, 0.0)
    )
    boundary = jnp.sum(jnp.where(bnd_b, integrand, 0.0))

    # ---- hanging mortars (coarse rows, once per mortar) ----------------
    M = mesh.hc_elem.shape[0]
    if M > 0:
        K = 1 << (dim - 1)
        hp = jnp.asarray(
            jnp.stack(
                [jnp.asarray(DB.hp_prolong(deg, deg, c)) for c in (0, 1)]
            ),
            dtype,
        )
        uc = u_f[mesh.hc_elem, mesh.hc_face]
        for b in range(K):
            bits = [(b >> t_) & 1 for t_ in range(dim - 1)]
            u_sub = uc
            for t_ in range(dim - 1):
                u_sub = tensor.apply_axis(hp[bits[t_]], u_sub, t_)
            u_mq = _sipg._face_apply(Vq, u_sub, dim)
            fe = mesh.hc_fine[:, b]
            ff = mesh.hc_fine_face[:, b]
            uf = jnp.take_along_axis(
                u_f[fe, ff].reshape(M, nfl_flat),
                mesh.hc_perm_l[:, b], axis=-1,
            ).reshape((M,) + fshape_l)
            u_pq = _sipg._face_apply(Vq, uf, dim)
            sjm = mesh.hc_sj[:, b].astype(dtype)
            if mesh.hc_sigma_q is not None:
                sgm = mesh.hc_sigma_q[:, b].astype(dtype)
            else:
                sgm = mesh.hc_sigma[:, b].astype(dtype).reshape(
                    (M,) + (1,) * (dim - 1)
                )
            interface = interface + jnp.sum(
                wf * sjm * sgm * (u_mq - u_pq) ** 2
            )

    return {
        "volume": vol,
        "interface": interface,
        "boundary": boundary,
        "total": vol + interface + boundary,
    }
