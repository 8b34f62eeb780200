"""Node-weighted SFC repartition with device-side field migration.

Role of the reference's `d4est_amr_load_balance`
(`hpAMR/d4est_amr.c:774-860`): repartition elements along the
space-filling curve weighted by node count, then ship every nodal field
to its new owner with `p4est_transfer_custom` (:846-852).

TPU-native design: elements stay in global SFC (Morton) order — a
partition is a set of contiguous cuts.  Because every shard must hold a
same-shape block (SPMD), a weighted partition is materialized as a
PADDED layout: each shard owns `counts[s]` real elements placed at the
start of a `Bmax`-row block, with `src[s*Bmax + j] = global element id`
(or -1 on pad rows).  Field migration is then ONE device-side gather
from the old layout into the new — under jit over sharded arrays XLA
lowers it to the all-to-all/collective-permute exchange, exactly the
`p4est_transfer_custom` role with no host round trip.

`migrate_after_amr` fuses the AMR field transfer (hp-prolongation onto
children, `d4est_amr.c:339-430`) with the migration: one gather + one
batched child-interp, so an AMR epoch moves each field across the
machine exactly once.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from disco4est_tpu.mesh.tree import Forest, ROOT
from disco4est_tpu.amr.amr import element_lineage
from disco4est_tpu.ops.operators import DB


def sfc_partition(weights: np.ndarray, n_dev: int) -> np.ndarray:
    """Contiguous SFC partition balancing `weights`: returns counts[n_dev]
    with sum = len(weights).  Mirrors p4est's weighted partition rule:
    element e goes to the shard whose cumulative-weight window contains
    it (`p4est_partition_ext` with a weight callback, used by
    `d4est_amr.c:788` with node weights)."""
    w = np.asarray(weights, np.float64)
    E = len(w)
    total = w.sum()
    if total <= 0 or n_dev <= 1:
        base = E // n_dev
        counts = np.full(n_dev, base, np.int64)
        counts[: E - base * n_dev] += 1
        return counts
    c = np.cumsum(w)
    # shard s owns elements whose prefix-weight midpoint falls in
    # [s*total/n, (s+1)*total/n)
    mid = c - 0.5 * w
    owner = np.minimum((mid * n_dev / total).astype(np.int64), n_dev - 1)
    counts = np.bincount(owner, minlength=n_dev).astype(np.int64)
    return counts


@dataclasses.dataclass(eq=False)
class PaddedLayout:
    """A weighted SFC partition as a padded SPMD layout.

    `eq=False`: identity hash/eq so layouts can ride as jit-static aux
    metadata (the np index arrays would otherwise break hashing)."""

    n_dev: int
    Bmax: int
    counts: np.ndarray  # [n_dev] real elements per shard
    src: np.ndarray  # [n_dev*Bmax] global element id, -1 on pad rows

    @property
    def padded_size(self) -> int:
        return self.n_dev * self.Bmax

    @staticmethod
    def build(weights: np.ndarray, n_dev: int) -> "PaddedLayout":
        counts = sfc_partition(weights, n_dev)
        Bmax = int(counts.max())
        src = np.full(n_dev * Bmax, -1, np.int64)
        start = 0
        for s in range(n_dev):
            c = int(counts[s])
            src[s * Bmax : s * Bmax + c] = np.arange(start, start + c)
            start += c
        return PaddedLayout(n_dev=n_dev, Bmax=Bmax, counts=counts, src=src)


def migrate_field(u, layout: PaddedLayout):
    """Gather a global-SFC-ordered field [E, ...] into the padded layout
    [n*Bmax, ...] (pad rows zero).  Call under jit on sharded arrays: the
    gather IS the migration collective."""
    src = jnp.asarray(np.maximum(layout.src, 0))
    valid = jnp.asarray(
        (layout.src >= 0).astype(np.float64)
    ).reshape((-1,) + (1,) * (u.ndim - 1))
    return u[src] * valid.astype(u.dtype)


def unmigrate_field(u_padded, layout: PaddedLayout, E: int):
    """Inverse of migrate_field: padded layout -> global SFC order."""
    dst = np.full(E, 0, np.int64)
    dst[np.asarray(layout.src[layout.src >= 0])] = np.where(
        layout.src >= 0
    )[0]
    return u_padded[jnp.asarray(dst)]


def _amr_transfer_plan(old: Forest, new: Forest):
    """Host-side index plan for the fused transfer: for each new element,
    the old source element and the per-generation child bits (supports
    balance cascades up to depth `max_dl`)."""
    src, child, dl = element_lineage(old, new)
    # the child-bit prolongation below assumes pure refinement lineages;
    # a coarsening (dl < 0) would silently copy one descendant's field
    # instead of projecting (ADVICE r4) — fail loudly until the
    # coarsen-projection branch exists
    assert (dl >= 0).all(), "migrate_after_amr: coarsening not supported"
    max_dl = int(dl.max()) if len(dl) else 0
    Enew = new.n_elements
    dim = old.dim
    bits = np.zeros((Enew, max(max_dl, 1), dim), np.int64)
    for g in range(max_dl):
        h_old = ROOT >> (old.level[src].astype(np.int64) + g)
        rel = new.anchor.astype(np.int64) - old.anchor[src].astype(np.int64)
        sub = (rel % h_old[:, None]) >= (h_old // 2)[:, None]
        bits[:, g] = np.where((dl > g)[:, None], sub.astype(np.int64), 0)
    active = np.zeros((Enew, max(max_dl, 1)), bool)
    for g in range(max_dl):
        active[:, g] = dl > g
    return src, bits, active, max_dl


def migrate_after_amr(
    u_old,
    old: Forest,
    new: Forest,
    deg: int,
    layout: PaddedLayout,
):
    """Fused AMR transfer + repartition: hp-prolong old fields onto the
    new forest's elements AND land them in the new weighted layout, with
    exactly one cross-device gather (the reference's refine-interp
    followed by `p4est_transfer_custom`, as one device program)."""
    dim = old.dim
    nl = deg + 1
    src, bits, active, max_dl = _amr_transfer_plan(old, new)

    # compose with the layout: padded row j sources new element
    # layout.src[j], which sources old element src[layout.src[j]]
    lsrc = np.maximum(layout.src, 0)
    row_src = src[lsrc]
    row_bits = bits[lsrc]
    row_active = active[lsrc]
    row_valid = (layout.src >= 0).astype(np.float64)

    hp1 = jnp.asarray(
        np.stack([DB.hp_prolong(deg, deg, c) for c in (0, 1)])
    )
    eye_or_hp = jnp.concatenate(
        [jnp.eye(nl)[None].astype(hp1.dtype), hp1], axis=0
    )  # [3, nl, nl]: 0 = identity (inactive generation), 1/2 = child 0/1

    row_src_j = jnp.asarray(row_src)
    # per generation & axis: matrix selector 0 (copy) or 1+bit
    sel = jnp.asarray(
        np.where(row_active[:, :, None], 1 + row_bits, 0)
    )  # [R, G, dim]
    valid = jnp.asarray(row_valid)

    def transfer(u):
        vals = u[row_src_j]  # ONE gather = the migration collective
        for g in range(max_dl):
            for d in range(dim):
                mats = eye_or_hp[sel[:, g, d]]  # [R, nl, nl]
                ax = vals.ndim - 1 - d
                v = jnp.moveaxis(vals, ax, -1)
                v = jnp.einsum("bij,b...j->b...i", mats, v)
                vals = jnp.moveaxis(v, -1, ax)
        return vals * valid.reshape((-1,) + (1,) * (vals.ndim - 1)).astype(
            vals.dtype
        )

    return transfer(u_old)


def pad_mesh_to_layout(mesh, layout: PaddedLayout):
    """Reorder + pad every element-major MeshData array into the padded
    layout, remapping the neighbor/mortar index tables, so the SPMD
    machinery (GSPMD sharding, `parallel/halo.HaloProgram`) can run a
    weighted partition whose shard sizes differ: pad rows become isolated
    zero-geometry boundary elements (Au = 0 there, no coupling).

    This is the repartition "rebuild" half; `migrate_after_amr` is the
    field half.  Together they play `p4est_partition_ext` +
    `p4est_transfer_custom` (`hpAMR/d4est_amr.c:788-852`).

    The host-side companions (`mesh.forest`, `mesh.ft`) are NOT remapped:
    the padded mesh carries a guard aux that raises on access, so
    consumers that need the host forest (penalty_debug, build_structured,
    estimators, VTK) must use the unpadded mesh (ADVICE r4).
    """
    import dataclasses as _dc

    from disco4est_tpu.mesh.builder import MeshData

    E = mesh.n_elements
    R = layout.padded_size
    src = np.maximum(layout.src, 0)
    pad = layout.src < 0
    new_of_old = np.zeros(E, np.int64)
    new_of_old[layout.src[~pad]] = np.where(~pad)[0]

    def g(arr, zero_pad=True):
        if arr is None:
            return None
        a = np.asarray(arr)
        out = a[src]
        if zero_pad:
            out[pad] = 0
        return jnp.asarray(out)

    nbr_elem = new_of_old[np.asarray(mesh.nbr_elem)][src]
    nbr_face = np.asarray(mesh.nbr_face)[src]
    rows = np.arange(R)
    nbr_elem[pad] = rows[pad, None]  # pad rows: self-neighbor
    nbr_face[pad] = np.arange(nbr_face.shape[1])[None, :]

    bnd = np.asarray(mesh.bnd_mask)[src]
    bnd[pad] = True
    conf = np.asarray(mesh.conf_mask)[src]
    conf[pad] = True

    deg_e_p = np.asarray(mesh.deg_e)[src].copy()
    deg_e_p[pad] = mesh.deg  # pads carry the storage degree (hp machinery)

    repl = dict(
        deg_e=jnp.asarray(deg_e_p),
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
        sigma_q=g(mesh.sigma_q),
        perm_l=g(mesh.perm_l, zero_pad=False),
        perm_q=g(mesh.perm_q, zero_pad=False),
        orient_code=g(mesh.orient_code, zero_pad=False),
        nbr_elem=jnp.asarray(nbr_elem.astype(np.int32)),
        nbr_face=jnp.asarray(nbr_face.astype(np.int32)),
        bnd_mask=jnp.asarray(bnd),
        conf_mask=jnp.asarray(conf),
        j_c=g(mesh.j_c),
        drdx_c=g(mesh.drdx_c),
        wjgg_c=g(mesh.wjgg_c),
        face_sj_c=g(mesh.face_sj_c),
        face_n_c=g(mesh.face_n_c),
        hc_elem=jnp.asarray(
            new_of_old[np.asarray(mesh.hc_elem)].astype(np.int32)
        ),
        hc_fine=jnp.asarray(
            new_of_old[np.asarray(mesh.hc_fine)].astype(np.int32)
        ),
        # dense hanging tables reorder like any [E, 2d] face array
        # (pads: 0 = not hanging)
        hang_code=g(mesh.hang_code),
        hang_sigma=g(mesh.hang_sigma),
        aux=_PaddedAux(),
    )
    return _dc.replace(mesh, **repl)


class _PaddedAux:
    """Guard aux for padded meshes: the element-major arrays were
    reordered but the host forest/face tables were not — fail loudly
    instead of returning a stale ordering."""

    def __getattr__(self, name):
        raise AttributeError(
            "padded MeshData has no host forest/ft (element ordering was "
            f"remapped by pad_mesh_to_layout); aux.{name} requested — use "
            "the unpadded mesh for host-side consumers"
        )

    def __eq__(self, other):
        return isinstance(other, _PaddedAux)

    def __hash__(self):
        return 1
