"""Device-mesh sharding of element arrays — the MPI-partition role.

The reference partitions elements across MPI ranks along the p4est
space-filling curve and exchanges one-element-deep halos with nonblocking
point-to-point (`Mesh/d4est_ghost_data.c:143-246`); scalar reductions are
`sc_allreduce` (`Solver/d4est_solver_cg.c:139`).

TPU-native equivalent: ONE named device-mesh axis ("e") over which every
element-major array is sharded.  Elements are already SFC-ordered, so an
equal block partition is exactly p4est's partition.  Neighbor gathers in
the SIPG apply become XLA collectives automatically under jit (GSPMD);
dot products inside jitted Krylov loops lower to `psum`.  An explicit
`shard_map` + `ppermute` halo pipeline is the optimization path for
multi-host scale (SURVEY.md §5 "halo via ppermute on precomputed face
pairings").
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from disco4est_tpu.mesh.builder import MeshData


def element_mesh(devices=None) -> Mesh:
    """1D device mesh over the element axis."""
    devices = devices if devices is not None else jax.devices()
    return Mesh(np.asarray(devices), axis_names=("e",))

def shard_field(u, dev_mesh: Mesh):
    """Shard an element-major field [E, ...] over the "e" axis.

    Multi-host aware: under multi-controller jax (process_count > 1) the
    global array is assembled from each process's addressable shards of
    the HOST-replicated data (every process builds the same mesh epoch
    deterministically — the reference's replicated p4est metadata)."""
    spec = P("e", *([None] * (u.ndim - 1)))
    sh = NamedSharding(dev_mesh, spec)
    if jax.process_count() > 1:
        host = np.asarray(u)
        return jax.make_array_from_callback(
            host.shape, sh, lambda idx: host[idx]
        )
    return jax.device_put(u, sh)


def shard_mesh_data(mesh: MeshData, dev_mesh: Mesh) -> MeshData:
    """Return a MeshData whose element-major arrays are sharded over the
    device mesh.  Non-array metadata is untouched."""
    E = mesh.n_elements
    n_dev = dev_mesh.devices.size
    if E % n_dev != 0:
        raise ValueError(
            f"{E} elements not divisible by {n_dev} devices; "
            "pad or repartition first"
        )

    leaves, treedef = jax.tree_util.tree_flatten(mesh)
    out = []
    for leaf in leaves:
        if hasattr(leaf, "shape") and leaf.ndim >= 1 and leaf.shape[0] == E:
            out.append(shard_field(leaf, dev_mesh))
        else:
            out.append(leaf)
    return jax.tree_util.tree_unflatten(treedef, out)
