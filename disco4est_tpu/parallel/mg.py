"""Shard-resident hp-multigrid: every level stays distributed.

Role of the reference's distributed V-cycle
(`Solver/d4est_solver_multigrid.c:752-1348`): every level remains
partitioned across ranks with per-level ghost caches (element-data
updater `d4est_solver_multigrid.h:167-183`), and restriction/prolongation
move data only between neighboring ranks along the space-filling curve.

TPU-native equivalent (VERDICT r4 #3 — the V-cycle must never gather to
global order):

- every level l gets its own node-weighted `PaddedLayout`, padded sharded
  `MeshData`, and `HaloProgram` (the per-level ghost cache);
- smoothers run `apply_sipg_halo` (one all_to_all per apply);
- restriction/prolongation between level layouts are shard_map programs
  with ONE all_to_all each: because all layouts are contiguous cuts of
  the SAME space-filling curve, a coarse element's children occupy a
  contiguous fine range — only families straddling a cut boundary are
  exchanged (`p4est_transfer_custom` between levels, done as index
  tables + collectives);
- dot products (bottom CG, Lanczos bounds) lower to psum via GSPMD.

The compiled V-cycle contains all_to_all + all-reduce only — zero
all-gathers (HLO-checked in tests/test_mg_sharded.py).
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

from disco4est_tpu.mesh.builder import MeshData
from disco4est_tpu.parallel.halo import (
    HaloProgram,
    apply_sipg_halo,
    build_halo_program,
)
from disco4est_tpu.parallel.repartition import (
    PaddedLayout,
    migrate_field,
    pad_mesh_to_layout,
    unmigrate_field,
)
from disco4est_tpu.parallel.sharding import shard_field, shard_mesh_data
from disco4est_tpu.solvers.multigrid import MGHierarchy, _hp_mats
from disco4est_tpu.solvers.cheby import cheby_smooth
from disco4est_tpu.solvers.cg import cg_solve


def _shard_map(f, mesh, in_specs, out_specs):
    try:
        from jax import shard_map as _sm

        return _sm(f, mesh=mesh, in_specs=in_specs, out_specs=out_specs,
                   check_vma=False)
    except Exception:  # pragma: no cover
        from jax.experimental.shard_map import shard_map as _sme

        return _sme(f, mesh=mesh, in_specs=in_specs, out_specs=out_specs,
                    check_rep=False)


def _exchange(n_dev, B, need):
    """Send/recv tables for a one-shot row exchange: `need[dst]` lists the
    global padded rows (of a [n_dev*B] array) shard `dst` must receive.
    Returns (send_idx [n,n,K], recv_pos [n,n,K], H, index_of) where
    `index_of[dst][row] = halo slot`; pad recv slots point at H (trash)."""
    send_lists: dict = {}
    index_of = []
    for dst in range(n_dev):
        rows = sorted(set(int(r) for r in need[dst]))
        index_of.append({r: i for i, r in enumerate(rows)})
        for r in rows:
            src = r // B
            send_lists.setdefault((src, dst), []).append(r - src * B)
    H = max((len(ix) for ix in index_of), default=0)
    K = max((len(v) for v in send_lists.values()), default=1)
    K = max(K, 1)
    send_idx = np.zeros((n_dev, n_dev, K), np.int32)
    recv_pos = np.full((n_dev, n_dev, K), H, np.int32)
    for (src, dst), locs in send_lists.items():
        for k, loc in enumerate(locs):
            send_idx[src, dst, k] = loc
            recv_pos[dst, src, k] = index_of[dst][src * B + loc]
    return send_idx, recv_pos, H, index_of


@dataclasses.dataclass
class LevelTransfer:
    """Restriction/prolongation between two level layouts, shard-local
    plus one all_to_all each way."""

    n_dev: int
    Bf: int
    Bc: int
    Hr: int  # restrict-direction halo slots
    Hp: int  # prolong-direction halo slots
    Kc: int  # max children per coarse row
    D: int  # bit-path depth
    # per-fine-padded-row transform data (sharded e-major over fine rows)
    bits: jnp.ndarray  # [Rf, D, dim] (2 = identity)
    copy: jnp.ndarray  # [Rf] bool
    # restrict: exchange fine CONTRIB rows, then sum children per coarse row
    r_send: jnp.ndarray  # [n, n, Kr]
    r_recv: jnp.ndarray  # [n, n, Kr]
    child_rows: jnp.ndarray  # [n, Bc, Kc] into [Bf+Hr+1) (pad = trash)
    # prolong: exchange coarse rows, then per-fine-row gather + transform
    p_send: jnp.ndarray  # [n, n, Kp]
    p_recv: jnp.ndarray  # [n, n, Kp]
    parent_rows: jnp.ndarray  # [n, Bf] into [Bc+Hp+1) (pad fine rows = trash)


_LT_META = ("n_dev", "Bf", "Bc", "Hr", "Hp", "Kc", "D")
_LT_DATA = tuple(
    f.name for f in dataclasses.fields(LevelTransfer) if f.name not in _LT_META
)

jax.tree_util.register_pytree_node(
    LevelTransfer,
    lambda t: (
        tuple(getattr(t, k) for k in _LT_DATA),
        tuple(getattr(t, k) for k in _LT_META),
    ),
    lambda aux, ch: LevelTransfer(
        **dict(zip(_LT_META, aux)), **dict(zip(_LT_DATA, ch))
    ),
)


def build_level_transfer(level_map, layout_f: PaddedLayout,
                         layout_c: PaddedLayout, n_dev: int) -> LevelTransfer:
    src = np.asarray(level_map.src)  # [Ef] global coarse parent
    bits_g = np.asarray(level_map.bits)  # [Ef, D, dim]
    copy_g = np.asarray(level_map.copy)
    Ef = src.shape[0]
    D, dim = bits_g.shape[1], bits_g.shape[2]
    Bf, Bc = layout_f.Bmax, layout_c.Bmax

    fpad_of = np.full(Ef, -1, np.int64)  # global fine -> fine padded row
    fp = layout_f.src >= 0
    fpad_of[layout_f.src[fp]] = np.where(fp)[0]
    Ec = int(src.max(initial=-1)) + 1
    cpad_of = np.full(max(Ec, 1), -1, np.int64)
    cp = layout_c.src >= 0
    cpad_of[layout_c.src[cp]] = np.where(cp)[0]

    # per-fine-padded-row transform tables (pads: identity + copy)
    Rf = layout_f.padded_size
    bits = np.full((Rf, D, dim), 2, np.int32)
    copy = np.ones(Rf, bool)
    bits[fp] = bits_g[layout_f.src[fp]]
    copy[fp] = copy_g[layout_f.src[fp]]

    # children per coarse padded row
    children: list = [[] for _ in range(layout_c.padded_size)]
    for f in range(Ef):
        children[cpad_of[src[f]]].append(int(fpad_of[f]))
    Kc = max((len(c) for c in children), default=1)
    Kc = max(Kc, 1)

    # restrict exchange: fine rows whose parent lives on another shard
    need_r = [set() for _ in range(n_dev)]
    for j, ch in enumerate(children):
        s_c = j // Bc
        for fr in ch:
            if fr // Bf != s_c:
                need_r[s_c].add(fr)
    r_send, r_recv, Hr, ix_r = _exchange(n_dev, Bf, need_r)
    TR = Bf + Hr  # trash row of the extended fine buffer
    child_rows = np.full((n_dev, Bc, Kc), TR, np.int32)
    for j, ch in enumerate(children):
        s_c, jr = divmod(j, Bc)
        for k, fr in enumerate(ch):
            if fr // Bf == s_c:
                child_rows[s_c, jr, k] = fr - s_c * Bf
            else:
                child_rows[s_c, jr, k] = Bf + ix_r[s_c][fr]

    # prolong exchange: coarse rows needed by fine rows on another shard
    need_p = [set() for _ in range(n_dev)]
    parent_pad = np.full(Rf, -1, np.int64)
    parent_pad[fp] = cpad_of[src[layout_f.src[fp]]]
    for r in range(Rf):
        s_f = r // Bf
        pj = parent_pad[r]
        if pj >= 0 and pj // Bc != s_f:
            need_p[s_f].add(int(pj))
    p_send, p_recv, Hp, ix_p = _exchange(n_dev, Bc, need_p)
    TP = Bc + Hp
    parent_rows = np.full((n_dev, Bf), TP, np.int32)
    for r in range(Rf):
        s_f, rr = divmod(r, Bf)
        pj = parent_pad[r]
        if pj < 0:
            continue
        if pj // Bc == s_f:
            parent_rows[s_f, rr] = pj - s_f * Bc
        else:
            parent_rows[s_f, rr] = Bc + ix_p[s_f][int(pj)]

    return LevelTransfer(
        n_dev=n_dev, Bf=Bf, Bc=Bc, Hr=Hr, Hp=Hp, Kc=Kc, D=D,
        bits=jnp.asarray(bits),
        copy=jnp.asarray(copy),
        r_send=jnp.asarray(r_send),
        r_recv=jnp.asarray(r_recv),
        child_rows=jnp.asarray(child_rows),
        p_send=jnp.asarray(p_send),
        p_recv=jnp.asarray(p_recv),
        parent_rows=jnp.asarray(parent_rows),
    )


def _row_transform(hp, bits, v, dim, transpose):
    """Per-row bit-path prolongation (or its adjoint) — element-local."""
    D = bits.shape[1]
    order = range(D - 1, -1, -1) if transpose else range(D)
    spec = "bji,b...j->b...i" if transpose else "bij,b...j->b...i"
    for k in order:
        for d in range(dim):
            mats = hp[bits[:, k, d]]
            ax = v.ndim - 1 - d
            m = jnp.moveaxis(v, ax, -1)
            m = jnp.einsum(spec, mats, m)
            v = jnp.moveaxis(m, -1, ax)
    return v


def restrict_sharded(tp: LevelTransfer, r_f, deg, dim, dev_mesh: Mesh):
    """fine (padded, sharded) residual -> coarse (padded, sharded):
    per-row adjoint transform (local) + ONE all_to_all of boundary
    contributions + shard-local child sums."""
    hp = _hp_mats(deg, r_f.dtype)
    n_dev, Bf, Hr, Kc = tp.n_dev, tp.Bf, tp.Hr, tp.Kc

    def body(r_l, bits_l, copy_l, send, recv, childs):
        send, recv, childs = send[0], recv[0], childs[0]
        contrib = _row_transform(hp, bits_l, r_l, dim, transpose=True)
        cshape = copy_l.reshape((-1,) + (1,) * (r_l.ndim - 1))
        contrib = jnp.where(cshape, r_l, contrib)
        send_buf = contrib[send.reshape(-1)].reshape(
            (n_dev, -1) + contrib.shape[1:]
        )
        rcv = jax.lax.all_to_all(
            send_buf, "e", split_axis=0, concat_axis=0, tiled=False
        )
        halo = jnp.zeros((Hr + 1,) + contrib.shape[1:], contrib.dtype)
        halo = halo.at[recv.reshape(-1)].set(
            rcv.reshape((-1,) + contrib.shape[1:])
        )
        ext = jnp.concatenate([contrib, halo], axis=0)
        ext = ext.at[Bf + Hr].set(0.0)  # trash row must read zero
        out = ext[childs.reshape(-1)].reshape(
            childs.shape + contrib.shape[1:]
        ).sum(axis=1)
        return out

    e = P("e")
    return _shard_map(
        body, dev_mesh,
        in_specs=(e, e, e, e, e, e),
        out_specs=e,
    )(r_f, tp.bits, tp.copy, tp.r_send, tp.r_recv, tp.child_rows)


def prolong_sharded(tp: LevelTransfer, e_c, deg, dim, dev_mesh: Mesh):
    """coarse -> fine: ONE all_to_all of boundary coarse rows + per-fine-
    row bit-path transform (local)."""
    hp = _hp_mats(deg, e_c.dtype)
    n_dev, Bc, Hp = tp.n_dev, tp.Bc, tp.Hp

    def body(c_l, bits_l, copy_l, send, recv, parents):
        send, recv, parents = send[0], recv[0], parents[0]
        send_buf = c_l[send.reshape(-1)].reshape(
            (n_dev, -1) + c_l.shape[1:]
        )
        rcv = jax.lax.all_to_all(
            send_buf, "e", split_axis=0, concat_axis=0, tiled=False
        )
        halo = jnp.zeros((Hp + 1,) + c_l.shape[1:], c_l.dtype)
        halo = halo.at[recv.reshape(-1)].set(
            rcv.reshape((-1,) + c_l.shape[1:])
        )
        ext = jnp.concatenate([c_l, halo], axis=0)
        ext = ext.at[Bc + Hp].set(0.0)
        vals = ext[parents]  # [Bf, nl...]
        out = _row_transform(hp, bits_l, vals, dim, transpose=False)
        cshape = copy_l.reshape((-1,) + (1,) * (vals.ndim - 1))
        return jnp.where(cshape, vals, out)

    e = P("e")
    return _shard_map(
        body, dev_mesh,
        in_specs=(e, e, e, e, e, e),
        out_specs=e,
    )(e_c, tp.bits, tp.copy, tp.p_send, tp.p_recv, tp.parent_rows)


@dataclasses.dataclass
class ShardedHierarchy:
    """Per-level distributed state on top of an MGHierarchy."""

    hier: MGHierarchy  # host hierarchy (params, hp flag, level meshes)
    layouts: list  # PaddedLayout per level
    meshes_s: list  # sharded padded MeshData per level
    halos: list  # HaloProgram per level
    transfers: list  # LevelTransfer per level gap
    bounds: jnp.ndarray | None = None  # [L, 2] cheby bounds
    dev_mesh: Mesh | None = None

    @property
    def n_levels(self):
        return len(self.meshes_s)


jax.tree_util.register_pytree_node(
    ShardedHierarchy,
    lambda h: (
        (h.hier, h.meshes_s, h.halos, h.transfers, h.bounds),
        (tuple(h.layouts), h.dev_mesh),
    ),
    lambda aux, ch: ShardedHierarchy(
        hier=ch[0], layouts=list(aux[0]), meshes_s=ch[1], halos=ch[2],
        transfers=ch[3], bounds=ch[4], dev_mesh=aux[1],
    ),
)


def build_sharded_hierarchy(hier: MGHierarchy, n_dev: int,
                            dev_mesh: Mesh) -> ShardedHierarchy:
    """Distribute every level: node-weighted layout + halo program
    (the reference's per-level ghost caches) + level transfer programs."""
    if hier.nl_blocks is not None:
        raise NotImplementedError(
            "sharded hierarchy with Newton-MG matrix operator not wired yet"
        )
    layouts, meshes_s, halos = [], [], []
    for m in hier.meshes:
        w = (np.asarray(m.deg_e) + 1) ** m.dim
        lay = PaddedLayout.build(w, n_dev)
        mp = pad_mesh_to_layout(m, lay)
        halos.append(build_halo_program(mp, n_dev))
        meshes_s.append(shard_mesh_data(mp, dev_mesh))
        layouts.append(lay)
    transfers = [
        build_level_transfer(hier.maps[i], layouts[i], layouts[i + 1], n_dev)
        for i in range(len(hier.maps))
    ]
    return ShardedHierarchy(
        hier=hier, layouts=layouts, meshes_s=meshes_s, halos=halos,
        transfers=transfers, dev_mesh=dev_mesh,
    )


def _level_op(sh: ShardedHierarchy, level: int):
    mesh_s, halo = sh.meshes_s[level], sh.halos[level]
    if sh.hier.hp:
        from disco4est_tpu.parallel.halo import apply_sipg_hp_halo

        return lambda v: apply_sipg_hp_halo(mesh_s, halo, v, sh.dev_mesh)
    return lambda v: apply_sipg_halo(mesh_s, halo, v, sh.dev_mesh)


def mg_setup_sharded(sh: ShardedHierarchy, seed_field):
    """Per-level Chebyshev bounds via CG-Lanczos on the HALO operator
    (dots lower to psum).  `seed_field(mesh)` makes the probe vector on
    the level's host mesh; it is migrated into the level layout."""
    from disco4est_tpu.solvers.eigs import cg_eigs

    p = sh.hier.params
    bounds = []
    for level in range(sh.n_levels):
        b_host = seed_field(sh.hier.meshes[level])
        b = shard_field(
            migrate_field(b_host, sh.layouts[level]), sh.dev_mesh
        )
        A_l = _level_op(sh, level)
        _, lmax = jax.jit(lambda v, _A=A_l: cg_eigs(_A, v, p.eigs_cg_iters))(
            b
        )
        lmax = float(lmax) * p.lmax_multiplier
        bounds.append((lmax / p.lmax_lmin_ratio, lmax))
    sh.bounds = jnp.asarray(bounds)
    return sh


def v_cycle_sharded(sh: ShardedHierarchy, b, x):
    """One V-cycle entirely on sharded padded fields: Chebyshev smoothing
    through the per-level halo programs, all_to_all level transfers, CG
    bottom with psum dots — no gather to global order anywhere."""
    p = sh.hier.params
    deg = sh.hier.meshes[0].deg
    dim = sh.hier.meshes[0].dim
    hp = sh.hier.hp

    def transfer_down(level, r):
        if not hp:
            return restrict_sharded(
                sh.transfers[level], r, deg, dim, sh.dev_mesh
            )
        from disco4est_tpu.laplacian.hp import (
            adjoint_restrict_to_storage,
            adjoint_to_own,
        )

        s = adjoint_restrict_to_storage(sh.meshes_s[level], r)
        s_c = restrict_sharded(sh.transfers[level], s, deg, dim, sh.dev_mesh)
        return adjoint_to_own(sh.meshes_s[level + 1], s_c)

    def transfer_up(level, e_c):
        if not hp:
            return prolong_sharded(
                sh.transfers[level], e_c, deg, dim, sh.dev_mesh
            )
        from disco4est_tpu.laplacian.hp import restrict_to_own, to_max

        e_s = prolong_sharded(
            sh.transfers[level], to_max(sh.meshes_s[level + 1], e_c),
            deg, dim, sh.dev_mesh,
        )
        return restrict_to_own(sh.meshes_s[level], e_s)

    def smooth(level, A_l, b_l, x_l):
        if p.smoother == "none":
            return x_l
        lmin, lmax = sh.bounds[level, 0], sh.bounds[level, 1]
        return cheby_smooth(A_l, b_l, x_l, lmin, lmax, p.n_smooth)

    def bottom(level, A_l, b_l, x_l):
        if p.bottom == "reuse_smoother":
            return smooth(level, A_l, b_l, x_l)
        if p.bottom == "cheby":
            lmin, lmax = sh.bounds[level, 0], sh.bounds[level, 1]
            return cheby_smooth(A_l, b_l, x_l, lmin, lmax, p.bottom_iters)
        return cg_solve(
            A_l, b_l, x0=x_l, atol=0.0, rtol=p.bottom_rtol,
            max_iter=p.bottom_iters,
        ).x

    def cycle(level, b_l, x_l):
        A_l = _level_op(sh, level)
        if level == sh.n_levels - 1:
            return bottom(level, A_l, b_l, x_l)
        x_l = smooth(level, A_l, b_l, x_l)
        r = b_l - A_l(x_l)
        r_c = transfer_down(level, r)
        e_c = cycle(level + 1, r_c, jnp.zeros_like(r_c))
        x_l = x_l + transfer_up(level, e_c)
        x_l = smooth(level, A_l, b_l, x_l)
        return x_l

    return cycle(0, b, x)
