"""Worker for the 2-process multi-host CI test (run by
tests/test_multihost.py): joins the distributed runtime, runs one
halo-exchange CG step on the conforming brick over the GLOBAL device
mesh, and prints the psum'd result norm (identical across processes and
to the single-process value — the d4est_test_mpi.sh contract across
PROCESSES)."""

import os
import sys

pid = int(sys.argv[1])
nproc = int(sys.argv[2])
port = sys.argv[3]

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "")
    + " --xla_force_host_platform_device_count=4"
)
import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__)))))

from disco4est_tpu.parallel.multihost import init_multihost

info = init_multihost(
    coordinator=f"localhost:{port}", num_processes=nproc, process_id=pid
)
assert info["num_processes"] == nproc, info

import numpy as np
import jax.numpy as jnp

from disco4est_tpu.geometry.brick import BrickGeometry
from disco4est_tpu.mesh.tree import Forest
from disco4est_tpu.mesh.builder import build_mesh
from disco4est_tpu.laplacian.sipg import build_rhs_with_strong_bc
from disco4est_tpu.parallel.sharding import (
    element_mesh,
    shard_field,
    shard_mesh_data,
)
from disco4est_tpu.parallel.halo import apply_sipg_halo, build_halo_program

n_global = len(jax.devices())
geom = BrickGeometry(dim=3)
forest = Forest.uniform(geom.conn, 1)
mesh = build_mesh(geom, forest, deg=2)

pi = np.pi
u_fcn = lambda x, y, z: jnp.sin(pi * x) * jnp.sin(pi * y) * jnp.sin(pi * z)
g = mesh.boundary_values(u_fcn)
f = mesh.init_field(lambda x, y, z: 3 * pi**2 * u_fcn(x, y, z))
rhs_host = build_rhs_with_strong_bc(mesh, f, g)

dev_mesh = element_mesh(jax.devices())
mesh_s = shard_mesh_data(mesh, dev_mesh)
rhs = shard_field(rhs_host, dev_mesh)
halo = build_halo_program(mesh, n_global)


@jax.jit
def cg_step(mesh_, halo_, r):
    Ap = apply_sipg_halo(mesh_, halo_, r, dev_mesh)
    alpha = jnp.vdot(r.reshape(-1), r.reshape(-1)) / jnp.vdot(
        r.reshape(-1), Ap.reshape(-1)
    )
    x = alpha * r
    return jnp.vdot(x.reshape(-1), x.reshape(-1))


val = float(cg_step(mesh_s, halo, rhs))
print(f"MULTIHOST_RESULT pid={pid} nproc={info['num_processes']} "
      f"ndev={info['global_devices']} val={val:.15e}", flush=True)
