"""Multi-host startup: the `jax.distributed` entry.

Role of the reference's MPI process model (`driver.c:17`
PetscInitialize → sc_MPI world): every host process joins one global
device mesh; all collectives (the halo all_to_all, psum dots, the
repartition gathers) then ride ICI within a slice and DCN across hosts
automatically — the code above this module is identical for 1 host and
N hosts.

Usage (one call per process, before any jax computation):

    from disco4est_tpu.parallel.multihost import init_multihost
    init_multihost()          # env-driven (TPU pods: fully automatic)
    init_multihost(coordinator="host0:1234", num_processes=4,
                   process_id=k)   # explicit (CPU clusters / tests)

After init, `jax.devices()` is the GLOBAL device list; build the element
mesh over it (`parallel.sharding.element_mesh`) and shard as usual.
"""

from __future__ import annotations

import os

import jax


def init_multihost(
    coordinator: str | None = None,
    num_processes: int | None = None,
    process_id: int | None = None,
) -> dict:
    """Initialize jax.distributed; no-op for single-process runs.

    Returns {"process_id", "num_processes", "global_devices",
    "local_devices"}."""
    if coordinator is None:
        coordinator = os.environ.get("DISCO4EST_COORDINATOR")
    if num_processes is None:
        n = os.environ.get("DISCO4EST_NUM_PROCESSES")
        num_processes = int(n) if n else None
    if process_id is None:
        p = os.environ.get("DISCO4EST_PROCESS_ID")
        process_id = int(p) if p else None

    if coordinator is not None or os.environ.get("TPU_WORKER_HOSTNAMES"):
        jax.distributed.initialize(
            coordinator_address=coordinator,
            num_processes=num_processes,
            process_id=process_id,
        )
    return {
        "process_id": jax.process_index(),
        "num_processes": jax.process_count(),
        "global_devices": len(jax.devices()),
        "local_devices": len(jax.local_devices()),
    }
