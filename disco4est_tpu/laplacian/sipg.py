"""Matrix-free SIPG Laplacian apply — THE hot kernel.

Role of the reference's `dGMath/d4est_laplacian.c:318-399`
(`d4est_laplacian_apply_aij` = stiffness + ghost exchange + dudr + mortar
flux sweep) and `d4est_laplacian_flux_sipg.c` (interface/boundary terms).
TPU-first re-design:

- per-element stiffness is a batched tensor contraction using the
  precomputed `wjgg` factor (the reference's `with_opt` precompute
  philosophy made mandatory);
- the face sweep is ONE batched kernel over all (element, face) pairs:
  every directed face computes its own element's contribution (the
  reference's "minus side"), neighbor data arrives via a single gather
  (orientation baked into precomputed permutation tables), so interior
  faces are processed twice — trading ~2× face flops for zero scatter
  conflicts and a static data-parallel layout;
- boundary faces run through the same kernel with `u⁺ := g, ∂u⁺ := ∂u⁻`
  and a doubled symmetry-term coefficient, matching the reference's
  Dirichlet aux term structure exactly
  (`d4est_laplacian_flux_sipg.c:133-148`).

SIPG terms on each directed face (minus side), matching
`d4est_laplacian_flux_sipg_interface_aux` (reference :560-640):
  term1 = -n·sj·½(∇u⁻ + ∇u⁺)            (consistency)
  term2_l = -½·(∂r_l/∂x·n)·sj·(u⁻-u⁺)    (symmetry; then lifted & Dᵀ)
  term3 = sj·σ·(u⁻-u⁺)                   (penalty)
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from disco4est_tpu.mesh.builder import MeshData
from disco4est_tpu.ops import tensor
from disco4est_tpu.ops.operators import DB


def _face_apply(A, v, dim):
    """Apply matrix A along every tangent axis of a face array
    [..., n_{t2}, n_{t1}] (dim-1 trailing axes).

    In 3D this contracts with the single kron matrix A⊗A on the
    flattened face instead of two per-axis passes: one GEMM with
    contraction n² instead of two batched contractions of size n —
    per-axis n (5 at deg 4) leaves the MXU ~95% idle and the face
    sweep latency-bound (the measured curved-sphere bottleneck)."""
    if dim == 2:
        return tensor.apply_axis(A, v, 0)
    A = jnp.asarray(A)
    AF = jnp.kron(A, A).astype(v.dtype)  # folds to a constant under jit
    lead = v.shape[: -(dim - 1)]
    out = v.reshape(lead + (-1,)) @ AF.T
    return out.reshape(lead + (A.shape[0],) * (dim - 1))


def _gather_nd(field_flat, ne, nf, perm):
    """General gather for [S, 2d, C, n_flat] source arrays (C component
    axes); `ne`/`nf` may index a source with more rows than they have
    (halo-extended arrays)."""
    S, F = field_flat.shape[:2]
    flat = field_flat.reshape((S * F,) + field_flat.shape[2:])
    rows = (ne * F + nf)  # [E, 2d]
    g = flat[rows]  # [E, 2d, C..., n_flat]
    perm_b = jnp.expand_dims(perm, axis=tuple(range(2, g.ndim - 1)))
    return jnp.take_along_axis(g, jnp.broadcast_to(perm_b, g.shape[:-1] + perm.shape[-1:]), axis=-1)


def _face_slices(u, dim):
    """[E, 2d, face_shape...] all face planes of a volume field."""
    return jnp.stack(
        [tensor.face_slice(u, f, dim) for f in range(2 * dim)], axis=1
    )


def _orient_transform(v, code: int, dim: int):
    """STATIC orientation transform of a face array [..., n2, n1] (dim-1
    trailing tangent axes): out[j2, j1] = v[i2(j), i1(j)] for the
    flip/flip/swap encoding of `mesh/faces.py:orientation_perm`.  Pure
    layout ops (transpose + reverse) — the TPU-fast replacement for the
    round-1 per-row `take_along_axis` gathers, unrolled once per code
    present in the mesh (zero codes on brick meshes)."""
    if dim == 2:
        return jnp.flip(v, axis=-1) if (code & 1) else v
    if code & 4:
        v = jnp.swapaxes(v, -1, -2)
    if code & 1:
        v = jnp.flip(v, axis=-1)
    if code & 2:
        v = jnp.flip(v, axis=-2)
    return v


def _apply_orient_codes(v, code_arr, codes: tuple, dim: int):
    """Fix gathered neighbor face data whose source frame differs from
    ours: for each static orientation code present, transform the whole
    array and select rows with that code."""
    if not codes:
        return v
    shape = code_arr.shape + (1,) * (dim - 1)
    for c in codes:
        v = jnp.where(
            (code_arr == c).reshape(shape), _orient_transform(v, c, dim), v
        )
    return v


def _dense_grad_ops(deg, deg_quad, quad, dim, dtype):
    """Per-direction dense [nq^dim, nl^dim] operators G_l = (⊗V)·D_l and
    the plain interpolation G = ⊗V, flattened for [E, n] GEMMs.

    TPU rationale: at moderate degree the per-axis tensor contractions
    have contraction size nl (4-8) — a few percent of the 128-wide MXU.
    Flattening each element to a vector and sharing ONE [n, n] operator
    across all elements turns the volume stage into [E, n]·[n, n] GEMMs
    with contraction size nl^dim (64-512): the speed-of-light mapping for
    p ≤ ~4, at the cost of more raw flops.  (The tensor-product path wins
    again at high p; `volume_mode` selects.)"""
    import numpy as _np

    V = quad.interp(deg, deg_quad)
    D = DB.ops(deg).diff
    eye = _np.eye(deg + 1)

    def kron_all(mats):
        # kron_all([A_x, A_y, A_z]) = A_z ⊗ A_y ⊗ A_x: the direction-0
        # factor is the LAST kron operand so it acts on the fastest (x)
        # index of the (z, y, x)-ordered flattening.
        out = mats[-1]
        for m in mats[-2::-1]:
            out = _np.kron(out, m)
        return out

    Gs = []
    for l in range(dim):
        mats = [V @ D if d == l else V for d in range(dim)]
        Gs.append(jnp.asarray(kron_all(mats).T, dtype))  # [nl^d, nq^d] for u@G
    return Gs


def apply_sipg(
    mesh: MeshData,
    u,
    g=None,
    neighbors: str = "full",
    robin_coeff=None,
    robin_rhs=None,
    volume_mode: str = "auto",
):
    """Au for the SIPG Laplacian (−∇²  weak form). `u`: [E, nl...]
    nodal field; `g`: optional Dirichlet data at face Lobatto nodes
    [E, 2d, nfl...] (None ⇒ homogeneous, the pure linear operator).

    `neighbors="zero"` computes the element-block-diagonal action (all
    cross-element couplings dropped): probing it with unit vectors
    assembles the exact diagonal blocks of A in one batch — the basis of
    the block-Jacobi/Schwarz preconditioners
    (`d4est_solver_schwarz_apply_lhs` restricted-operator role).

    Robin boundary conditions (`d4est_laplacian_flux_sipg_robin_aux`,
    reference :340-436: ∂u/∂n + c·u = r replaces ALL boundary flux terms
    by ∫ sj·(c·u − r)·v): pass `robin_coeff` [E, 2d, nfq...] (values used
    on physical-boundary faces; typically `mesh.boundary_values_quad` of
    the coefficient function) and optionally `robin_rhs`."""
    if volume_mode in ("auto", "fast"):
        from disco4est_tpu.laplacian.fast import (
            apply_sipg_fast,
            fast_path_available,
        )

        if fast_path_available(mesh, neighbors, robin_coeff):
            return apply_sipg_fast(mesh, u, g)
        if volume_mode == "fast":
            raise ValueError("fast path unavailable for this mesh/options")

    dim, deg, deg_quad = mesh.dim, mesh.deg, mesh.deg_quad
    nl, nq = deg + 1, deg_quad + 1
    E = u.shape[0]
    dtype = u.dtype

    D = jnp.asarray(DB.ops(deg).diff, dtype)
    Vq = jnp.asarray(mesh.quad.interp(deg, deg_quad), dtype)
    _, wq1 = mesh.quad.nodes_weights(deg_quad)

    # ---- reference-space gradient (shared volume/face) ------------------
    dudr = [tensor.apply_axis(D, u, l) for l in range(dim)]  # dim × [E, nl..]

    # ---- volume stiffness ----------------------------------------------
    # Au_vol = Σ_lp Dᵀ_lp Vᵀ (w·J·Σ_l g_lp·g_l ⊙ V D_l u)
    # Compact affine factors replace the [E, dim, dim, nq^dim] wjgg array
    # with [E, dim, dim] constants — ~nq^dim less HBM traffic.
    if volume_mode == "auto":
        volume_mode = (
            "dense"
            if (deg <= 4 and dim == 3 and mesh.rad_interp is None)
            else "tensor"
        )
    w3 = tensor.tensor_weights([wq1] * dim, dtype=dtype)
    if volume_mode == "dense":
        Gs = _dense_grad_ops(deg, deg_quad, mesh.quad, dim, dtype)
        u_flat = u.reshape(E, -1)
        t_flat = jnp.stack([u_flat @ Gs[l] for l in range(dim)], 1)
        Au = jnp.zeros_like(u)
        if mesh.wjgg_c is not None:
            wjgg_flat = (
                mesh.wjgg_c.astype(dtype)[..., None] * w3.reshape(-1)
            )  # [E, l, lp, nq^d]
        else:
            wjgg_flat = mesh.wjgg.astype(dtype).reshape(E, dim, dim, -1)
        for lp in range(dim):
            s_flat = jnp.einsum("elq,elq->eq", wjgg_flat[:, lp], t_flat)
            Au = Au + (s_flat @ Gs[lp].T).reshape(u.shape)
    else:
        from disco4est_tpu.mesh.builder import vol_interp

        t = [vol_interp(mesh, dudr[l]) for l in range(dim)]
        Au = jnp.zeros_like(u)
        cshape = (E,) + (1,) * dim
        for lp in range(dim):
            s = jnp.zeros_like(t[0])
            for l in range(dim):
                if mesh.wjgg_c is not None:
                    c = mesh.wjgg_c[:, lp, l].astype(dtype).reshape(cshape)
                    s = s + c * (w3 * t[l])
                else:
                    s = s + mesh.wjgg[:, lp, l].astype(dtype) * t[l]
            s = vol_interp(mesh, s, transpose=True)
            Au = Au + tensor.apply_axis(D.T, s, lp)

    # ---- face sweep (single fused batch over [E, 2d]) -------------------
    # Neighbor data is limited to TWO scalars per face point: the trace u⁺
    # and the (frame-independent) normal derivative n⁺·∇u⁺ — gathered with
    # one row gather + static orientation transforms.  The round-1 design
    # gathered the neighbor's full ∂r/∂x tensor with per-row permutations,
    # which dominated the apply (~75% of wall clock, see VERDICT r1).
    nfl_flat = nl ** (dim - 1)
    nfq_flat = nq ** (dim - 1)
    fshape_l = (nl,) * (dim - 1)
    fshape_q = (nq,) * (dim - 1)
    nfaces = 2 * dim

    u_f = _face_slices(u, dim)  # [E, 2d, nfl...]
    dudr_f = jnp.stack(
        [_face_slices(dudr[l], dim) for l in range(dim)], axis=2
    )  # [E, 2d, dim, nfl...]
    u_m_q = _face_apply(Vq, u_f, dim)  # [E, 2d, nfq...]
    dudr_m_q = _face_apply(Vq, dudr_f, dim)  # [E, 2d, dim, nfq...]

    # own-side geometric data (broadcast trailing 1s for the affine case)
    ones = (1,) * (dim - 1)
    if mesh.face_n_c is not None:
        drst_m = mesh.drdx_c.astype(dtype).reshape(
            (E, 1, dim, dim) + ones
        )  # faces share the element's constant ∂r/∂x
        n_m = mesh.face_n_c.astype(dtype).reshape((E, nfaces, dim) + ones)
        sj = mesh.face_sj_c.astype(dtype).reshape((E, nfaces) + ones)
    else:
        drst_m = mesh.face_drst.astype(dtype)  # [E, 2d, l, d, nfq...]
        n_m = mesh.face_n.astype(dtype)  # [E, 2d, d, nfq...]
        sj = mesh.face_sj.astype(dtype)  # [E, 2d, nfq...]
    sigma = mesh.sigma.astype(dtype)  # [E, 2d]

    # n·∇u = (drst·n)·∂u/∂r : only drst_n is ever needed, not full ∂u/∂x
    drst_n = (drst_m * n_m[:, :, None]).sum(3)  # [E, 2d, l, nfq...|1s]
    dn_m = (drst_n * dudr_m_q).sum(2)  # [E, 2d, nfq...]

    bnd = mesh.bnd_mask
    bshape = bnd.shape + ones
    bnd_b = bnd.reshape(bshape)

    if neighbors == "zero":
        u_p_q = jnp.zeros_like(u_m_q)
        dn_p = jnp.zeros_like(dn_m)
    else:
        # one packed row gather for both traces
        rows = mesh.nbr_elem * nfaces + mesh.nbr_face  # [E, 2d]
        packed = jnp.concatenate(
            [
                u_f.reshape(E, nfaces, nfl_flat),
                dn_m.reshape(E, nfaces, nfq_flat),
            ],
            axis=-1,
        ).reshape(E * nfaces, nfl_flat + nfq_flat)
        gath = packed[rows]  # [E, 2d, nfl+nfq]
        u_p = gath[..., :nfl_flat].reshape((E, nfaces) + fshape_l)
        dn_p = gath[..., nfl_flat:].reshape((E, nfaces) + fshape_q)
        u_p = _apply_orient_codes(
            u_p, mesh.orient_code, mesh.orient_codes, dim
        )
        dn_p = _apply_orient_codes(
            dn_p, mesh.orient_code, mesh.orient_codes, dim
        )
        u_p_q = _face_apply(Vq, u_p, dim)

    # boundary: u⁺ := g (or 0), ∂u⁺ := ∂u⁻ (⇔ gathered dn_p := -dn_m)
    if g is None:
        g_q = jnp.zeros_like(u_m_q)
    else:
        g_q = _face_apply(Vq, g.astype(dtype), dim)
    u_p_q = jnp.where(bnd_b, g_q, u_p_q)
    dn_p = jnp.where(bnd_b, -dn_m, dn_p)

    jump = u_m_q - u_p_q
    c2 = jnp.where(bnd_b, 2.0, 1.0).astype(dtype)

    # n⁺ = -n⁻ at matched points, so n⁻·∇u⁺ = -dn_p
    term1 = -0.5 * sj * (dn_m - dn_p)
    term2 = -0.5 * c2[:, :, None] * drst_n * (sj * jump)[:, :, None]
    if mesh.sigma_q is not None:
        # pointwise penalty (FACE_H_EQ_J_DIV_SJ_QUAD): sigma varies over
        # the face quadrature points on curved geometries
        term3 = sj * mesh.sigma_q.astype(dtype) * jump
    else:
        term3 = sj * sigma.reshape(bshape) * jump

    if robin_coeff is not None:
        rr = (
            jnp.zeros_like(u_m_q)
            if robin_rhs is None
            else robin_rhs.astype(dtype)
        )
        robin_term = sj * (robin_coeff.astype(dtype) * u_m_q - rr)
        term1 = jnp.where(bnd_b, robin_term, term1)
        term2 = jnp.where(bnd_b[:, :, None], 0.0, term2)
        term3 = jnp.where(bnd_b, 0.0, term3)

    # Galerkin integral on the face: Vᵀ(w ⊙ term)
    wf = tensor.tensor_weights([wq1] * (dim - 1), dtype=dtype)
    vt1 = _face_apply(Vq.T, wf * (term1 + term3), dim)
    vt2 = _face_apply(Vq.T, wf * term2, dim)

    # hanging faces are handled by the mortar kernels below; mask them out
    # of the fused conforming/boundary kernel.
    cmask = mesh.conf_mask.reshape(bshape).astype(dtype)
    vt1 = vt1 * cmask
    vt2 = vt2 * cmask[:, :, None]

    # lift to volume and accumulate: per face, tangential Dᵀ terms act
    # within the face plane; the normal-direction Dᵀ of a lifted plane is
    # an outer product with one column of Dᵀ — no padded volume temps.
    for f in range(nfaces):
        dir_, side = divmod(f, 2)
        tang = [d for d in range(dim) if d != dir_]
        a = vt1[:, f]
        for l in tang:
            a = a + tensor.apply_axis(D.T, vt2[:, f, l], tang.index(l))
        axis = Au.ndim - 1 - dir_
        idx = [slice(None)] * Au.ndim
        idx[axis] = 0 if side == 0 else nl - 1
        Au = Au.at[tuple(idx)].add(a)
        # normal-direction term: Dᵀ[:, edge] ⊗ vt2[:, f, dir_]
        dcol = D.T[:, 0] if side == 0 else D.T[:, -1]
        col_shape = [1] * Au.ndim
        col_shape[axis] = nl
        Au = Au + jnp.expand_dims(vt2[:, f, dir_], axis) * dcol.reshape(
            col_shape
        )

    if mesh.hc_elem.shape[0] > 0:
        Au = Au + _apply_hanging(
            mesh, u_f, dudr_f, Vq, wf, D, dtype, neighbors=neighbors
        )
    return Au


def _row_mat_apply(mats, v, axis_from_back):
    """Per-row matrix apply: mats [R, a, b] contracted with v's axis
    `axis_from_back` (0 = last).  v: [R, ...]."""
    ax = v.ndim - 1 - axis_from_back
    v_m = jnp.moveaxis(v, ax, -1)  # [R, ..., b]
    out = jnp.einsum("rab,r...b->r...a", mats, v_m)
    return jnp.moveaxis(out, -1, ax)


def _face_scatter_dynamic(Au, elems, faces, vals, dim, nl, D=None, term2_l=None,
                          scale=1.0):
    """Scatter face-nodal values into volume rows of Au where the face id
    varies per row: loop the 2·dim static faces with row masks."""
    for f in range(2 * dim):
        mask = (faces == f).astype(vals.dtype)
        mshape = (len(elems),) + (1,) * (vals.ndim - 1)
        contrib = tensor.face_scatter(vals * mask.reshape(mshape), f, dim, nl)
        if D is not None:
            contrib = tensor.apply_axis(D.T, contrib, term2_l)
        Au = Au.at[elems].add(scale * contrib)
    return Au


import functools as _functools


@_functools.lru_cache(maxsize=None)
def _hanging_lift_mats(deg: int, dim: int):
    """Static per-face lift matrices for the mortar pass: W13[f] places a
    face plane into the volume (row-operand form plane @ W), W2[f]
    additionally applies Dᵀ_l after the lift for each direction l
    (stacked rows [dim*nfl, nv]).  Turns every mortar volume-lift into a
    GEMM — TPU scatters (slow serial lowering) are eliminated."""
    from disco4est_tpu.laplacian import fast as _fast

    bm = _fast._base_mats(deg, deg, "legendre", dim)
    # NB only sels/dvol are used — both depend on deg/dim alone, not on
    # the quadrature kind, so the "legendre" key is safe for any mesh.
    nl = deg + 1
    nfl = nl ** (dim - 1)
    nv = nl**dim
    W13 = np.stack([bm["sels"][f] for f in range(2 * dim)])  # [2d, nfl, nv]
    W2 = np.stack(
        [
            np.concatenate(
                [bm["sels"][f] @ bm["dvol"][l] for l in range(dim)], axis=0
            )
            for f in range(2 * dim)
        ]
    )  # [2d, dim*nfl, nv]
    return W13, W2


def _lift_rows(elems, faces, vt13, vt2, E, deg, dim, dtype):
    """Volume accumulation for dynamic-face mortar rows WITHOUT scatters:
    per-face masked GEMMs against the static lift matrices, then ONE
    one-hot matmul onto the element axis (MXU-friendly; TPU scatter-add
    with duplicate rows lowers to a serial loop)."""
    nl = deg + 1
    nfl = nl ** (dim - 1)
    nv = nl**dim
    R = vt13.shape[0]
    W13_np, W2_np = _hanging_lift_mats(deg, dim)
    W13 = jnp.asarray(W13_np, dtype)
    W2 = jnp.asarray(W2_np, dtype)
    z13 = vt13.reshape(R, nfl)
    z2 = vt2.reshape(R, dim * nfl)
    vol = jnp.zeros((R, nv), dtype)
    for f in range(2 * dim):
        m = (faces == f).astype(dtype)[:, None]
        vol = vol + (m * z13) @ W13[f] + (m * z2) @ W2[f]
    onehot = jax.nn.one_hot(elems, E, dtype=dtype)  # [R, E]
    return (onehot.T @ vol).reshape((E,) + (nl,) * dim)


def _apply_hanging(mesh: MeshData, u_f, dudr_f, Vq, wf, D, dtype,
                   neighbors: str = "full"):
    """Hanging-face (nonconforming) mortar contributions.

    The reference's hanging cases of `d4est_laplacian_flux_sipg_interface`
    + `d4est_mortars_project_side_onto_mortar_space` (side→mortar
    hp-prolong) and `project_mass_mortar_onto_side` (mortar→side
    hp-prolong-transpose).  Two batched kernels:

    - FINE rows (one per fine element touching a coarse face): the mortar
      is the fine face itself; the coarse neighbor's trace is hp-prolonged
      onto it.
    - COARSE rows (one per coarse hanging face): terms are computed on all
      K subfaces, mass-projected back to the coarse face with Σ_b P_bᵀ.

    TPU shape: the subface index b is a BATCH axis (no python-K loop of
    small kernels), and all volume lifts go through `_lift_rows`'s
    GEMM+one-hot accumulation instead of scatters.
    """
    if mesh.face_drst is None:
        raise NotImplementedError(
            "hanging-face apply requires full face factor arrays; build "
            "the mesh with store_full=True"
        )
    dim, deg = mesh.dim, mesh.deg
    nl, nq = deg + 1, mesh.deg_quad + 1
    K = 1 << (dim - 1)
    M = mesh.hc_elem.shape[0]
    E = u_f.shape[0]
    nfl_flat = nl ** (dim - 1)
    nfq_flat = nq ** (dim - 1)
    fshape_l = (nl,) * (dim - 1)
    fshape_q = (nq,) * (dim - 1)

    hp = jnp.asarray(
        np.stack([DB.hp_prolong(deg, deg, c) for c in (0, 1)]), dtype
    )  # [2, nl, nl]
    bits = np.array(
        [[(b >> t) & 1 for t in range(dim - 1)] for b in range(K)]
    )  # [K, dim-1]

    ce, cfc = mesh.hc_elem, mesh.hc_face
    uc = u_f[ce, cfc]  # [M, nfl...] coarse frame
    duc = dudr_f[ce, cfc]  # [M, dim, nfl...]

    def prolong_b(v, t_axis, batched):
        """apply hp[bits[:, t]] along face axis t for every subface b:
        `batched=False`: [M, ...] -> [M, K, ...];
        `batched=True`:  [M, K, ...] -> [M, K, ...]."""
        mats = hp[jnp.asarray(bits[:, t_axis])]  # [K, nl, nl]
        ax = v.ndim - 1 - t_axis
        vm = jnp.moveaxis(v, ax, -1)
        if batched:
            out = jnp.einsum("kab,mk...b->mk...a", mats, vm)
            return jnp.moveaxis(out, -1, ax)
        out = jnp.einsum("kab,m...b->mk...a", mats, vm)
        return jnp.moveaxis(out, -1, ax + 1)

    def project_back_b(v, t_axis):
        """P_bᵀ along face axis t; v [M, K, ...]."""
        mats = hp[jnp.asarray(bits[:, t_axis])]
        ax = v.ndim - 1 - t_axis
        vm = jnp.moveaxis(v, ax, -1)
        out = jnp.einsum("kba,mk...b->mk...a", mats, vm)
        return jnp.moveaxis(out, -1, ax)

    # ---------- coarse-side rows (batched over subfaces b) ---------------
    u_m_sub = uc
    du_m_sub = duc
    for t in range(dim - 1):
        u_m_sub = prolong_b(u_m_sub, t, batched=t > 0)
        du_m_sub = prolong_b(du_m_sub, t, batched=t > 0)
    # shapes now [M, K, (dim,) fshape_l]
    u_m_q = _face_apply(Vq, u_m_sub, dim)
    du_m_q = _face_apply(Vq, du_m_sub, dim)
    drst_m = mesh.hc_drst_m.astype(dtype)  # [M, K, l, d, nfq...]
    dudx_m = jnp.einsum("mkld...,mkl...->mkd...", drst_m, du_m_q)

    fe2 = mesh.hc_fine  # [M, K]
    ff2 = mesh.hc_fine_face
    uf = jnp.take_along_axis(
        u_f[fe2, ff2].reshape(M, K, nfl_flat), mesh.hc_perm_l, axis=-1
    ).reshape((M, K) + fshape_l)
    duf = jnp.take_along_axis(
        dudr_f[fe2, ff2].reshape(M, K, dim, nfl_flat),
        mesh.hc_perm_l[:, :, None, :],
        axis=-1,
    ).reshape((M, K, dim) + fshape_l)
    drst_p = jnp.take_along_axis(
        mesh.face_drst[fe2, ff2].astype(dtype).reshape(
            M, K, dim, dim, nfq_flat
        ),
        mesh.hc_perm_q[:, :, None, None, :],
        axis=-1,
    ).reshape((M, K, dim, dim) + fshape_q)
    u_p_q = _face_apply(Vq, uf, dim)
    du_p_q = _face_apply(Vq, duf, dim)
    dudx_p = jnp.einsum("mkld...,mkl...->mkd...", drst_p, du_p_q)
    if neighbors == "zero":
        u_p_q = jnp.zeros_like(u_p_q)
        dudx_p = jnp.zeros_like(dudx_p)

    sj = mesh.hc_sj.astype(dtype)  # [M, K, nfq...]
    n = mesh.hc_n.astype(dtype)  # [M, K, d, nfq...]
    jump = u_m_q - u_p_q
    term1 = (
        -jnp.einsum("mkd...,mkd...->mk...", n, 0.5 * (dudx_m + dudx_p)) * sj
    )
    drst_n = jnp.einsum("mkld...,mkd...->mkl...", drst_m, n)
    term2 = -0.5 * drst_n * (sj * jump)[:, :, None]
    if mesh.hc_sigma_q is not None:
        # pointwise mortar penalty (FACE_H_EQ_J_DIV_SJ_QUAD)
        term3 = sj * mesh.hc_sigma_q.astype(dtype) * jump
    else:
        sig = mesh.hc_sigma.astype(dtype)
        term3 = sj * sig.reshape((M, K) + (1,) * (dim - 1)) * jump

    vt13 = _face_apply(Vq.T, wf * (term1 + term3), dim)
    vt2 = _face_apply(Vq.T, wf * term2, dim)
    # mass-project subface residuals back to the coarse face: Σ_b P_bᵀ
    for t in range(dim - 1):
        vt13 = project_back_b(vt13, t)
        vt2 = project_back_b(vt2, t)
    acc13 = vt13.sum(axis=1)  # [M, fshape_l]
    acc2 = vt2.sum(axis=1)  # [M, dim, fshape_l]

    Au = _lift_rows(ce, cfc, acc13, acc2, E, deg, dim, dtype)

    # ---------- fine-side rows -------------------------------------------
    fe = mesh.hc_fine.reshape(-1)  # [Mf]
    ff = mesh.hc_fine_face.reshape(-1)
    Mf = fe.shape[0]
    b_idx = jnp.tile(jnp.arange(K), M)
    ce_rep = jnp.repeat(ce, K)
    cf_rep = jnp.repeat(cfc, K)

    u_m = u_f[fe, ff]  # [Mf, nfl...] own (fine) frame
    du_m = dudr_f[fe, ff]
    drst_m = mesh.face_drst[fe, ff].astype(dtype)  # [Mf, l, d, nfq...]
    sj = mesh.face_sj[fe, ff].astype(dtype)
    n = mesh.face_n[fe, ff].astype(dtype)

    u_m_q = _face_apply(Vq, u_m, dim)
    du_m_q = _face_apply(Vq, du_m, dim)
    dudx_m = jnp.einsum("mld...,ml...->md...", drst_m, du_m_q)

    # coarse neighbor trace prolonged onto my subface (per-row child mats),
    # then permuted from the coarse frame into mine.
    uc_rep = u_f[ce_rep, cf_rep]
    duc_rep = dudr_f[ce_rep, cf_rep]
    for t in range(dim - 1):
        mats = hp[(b_idx >> t) & 1]  # [Mf, nl, nl]
        uc_rep = _row_mat_apply(mats, uc_rep, t)
        duc_rep = _row_mat_apply(mats, duc_rep, t)
    u_p = jnp.take_along_axis(
        uc_rep.reshape(Mf, nfl_flat), mesh.hf_perm_l, axis=-1
    ).reshape((Mf,) + fshape_l)
    du_p = jnp.take_along_axis(
        duc_rep.reshape(Mf, dim, nfl_flat),
        mesh.hf_perm_l[:, None, :],
        axis=-1,
    ).reshape((Mf, dim) + fshape_l)
    # the coarse element's drst at my quad points, permuted into my frame
    drst_p = jnp.take_along_axis(
        mesh.hc_drst_m.astype(dtype).reshape(Mf, dim, dim, nfq_flat),
        mesh.hf_perm_q[:, None, None, :],
        axis=-1,
    ).reshape((Mf, dim, dim) + fshape_q)

    u_p_q = _face_apply(Vq, u_p, dim)
    du_p_q = _face_apply(Vq, du_p, dim)
    dudx_p = jnp.einsum("mld...,ml...->md...", drst_p, du_p_q)
    if neighbors == "zero":
        u_p_q = jnp.zeros_like(u_p_q)
        dudx_p = jnp.zeros_like(dudx_p)

    jump = u_m_q - u_p_q
    term1 = -jnp.einsum("md...,md...->m...", n, 0.5 * (dudx_m + dudx_p)) * sj
    drst_n = jnp.einsum("mld...,md...->ml...", drst_m, n)
    term2 = -0.5 * drst_n * (sj * jump)[:, None]
    if mesh.hc_sigma_q is not None:
        # coarse-frame pointwise penalty permuted into each fine frame
        sig_q = jnp.take_along_axis(
            mesh.hc_sigma_q.astype(dtype).reshape(Mf, nfq_flat),
            mesh.hf_perm_q, axis=-1,
        ).reshape((Mf,) + fshape_q)
        term3 = sj * sig_q * jump
    else:
        sig = mesh.hc_sigma.reshape(-1).astype(dtype)
        term3 = sj * sig.reshape((Mf,) + (1,) * (dim - 1)) * jump

    vt13f = _face_apply(Vq.T, wf * (term1 + term3), dim)
    vt2f = _face_apply(Vq.T, wf * term2, dim)

    Au = Au + _lift_rows(fe, ff, vt13f, vt2f, E, deg, dim, dtype)
    return Au


def apply_mass(mesh: MeshData, v, on_quad: bool = False):
    """M v: nodal mass apply via quadrature (`d4est_quadrature_apply_mass_
    matrix` / `apply_galerkin_integral`). If `on_quad`, v is given at
    quadrature points and only Vᵀ(wJ·v) is applied."""
    from disco4est_tpu.mesh.builder import vol_interp, vol_weights

    dtype = v.dtype
    w = vol_weights(mesh, dtype)
    v_q = v if on_quad else vol_interp(mesh, v)
    return vol_interp(mesh, w * mesh.j_at_quad(dtype) * v_q, transpose=True)


@jax.jit
def build_rhs_with_strong_bc(mesh: MeshData, f, g):
    """rhs = M·f − A(0; g): moves inhomogeneous Dirichlet data into the
    load vector (`d4est_laplacian_build_rhs_with_strong_bc`,
    `dGMath/d4est_laplacian.c:16-130`).  `f`: load at Lobatto nodes
    [E, nl...]; `g`: face-Lobatto Dirichlet data [E, 2d, nfl...]."""
    zeros = jnp.zeros_like(f)
    Au0 = apply_sipg(mesh, zeros, g)
    return apply_mass(mesh, f) - Au0


# Jitted entry points: MeshData is a registered pytree, so the SAME
# compiled executable serves every mesh with identical shapes/degrees —
# never close over a mesh in a fresh lambda (that would bake the factor
# arrays in as constants and recompile per epoch).
apply_sipg_jit = jax.jit(
    apply_sipg, static_argnames=("neighbors", "volume_mode")
)
apply_mass_jit = jax.jit(apply_mass, static_argnames=("on_quad",))
