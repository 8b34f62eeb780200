"""Device-count invariance: the reference's distributed contract.

`d4est_test_mpi.sh` reruns ConstantDensityStar under `mpirun -np 8` and
`-np 1` and requires the same grep'd norm — results must be independent of
the partition.  Here: the same Poisson solve on 1 device vs sharded over
all 8 virtual CPU devices must agree to solver tolerance.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from disco4est_tpu.geometry.brick import BrickGeometry
from disco4est_tpu.mesh.tree import Forest
from disco4est_tpu.mesh.builder import build_mesh
from disco4est_tpu.laplacian.sipg import apply_sipg, build_rhs_with_strong_bc
from disco4est_tpu.solvers.cg import cg_solve
from disco4est_tpu.parallel.sharding import (
    element_mesh,
    shard_mesh_data,
    shard_field,
)


@jax.jit
def _solve(mesh, rhs):
    return cg_solve(
        lambda v: apply_sipg(mesh, v), rhs, atol=1e-14, rtol=1e-30,
        max_iter=2000,
    ).x


def test_device_count_invariance():
    assert len(jax.devices()) >= 8, "conftest should provide 8 cpu devices"
    geom = BrickGeometry(dim=3)
    forest = Forest.uniform(geom.conn, 2)  # 64 elements
    mesh = build_mesh(geom, forest, deg=2)

    def u_fcn(x, y, z):
        return jnp.sin(jnp.pi * x) * jnp.sin(jnp.pi * y) * jnp.sin(jnp.pi * z)

    g = mesh.boundary_values(u_fcn)
    f = mesh.init_field(lambda *c: 3 * jnp.pi**2 * u_fcn(*c))
    rhs = build_rhs_with_strong_bc(mesh, f, g)

    x_1dev = _solve(mesh, rhs)

    dev_mesh = element_mesh(jax.devices()[:8])
    mesh_sharded = shard_mesh_data(mesh, dev_mesh)
    rhs_sharded = shard_field(rhs, dev_mesh)
    x_8dev = _solve(mesh_sharded, rhs_sharded)

    err = np.max(np.abs(np.asarray(x_1dev) - np.asarray(x_8dev)))
    assert err < 1e-10, err
