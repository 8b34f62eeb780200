"""Checkpoint / restore.

Role of the reference's `IO/d4est_checkpoint.c` with two formats
(`d4est_checkpoint_type.h:4`):

- `P4EST_H5`-analog: serialize the forest structure (tree/level/anchor
  arrays), degrees, nodal fields, and validation checksums.  The reference
  writes HDF5 file-per-rank, tying restarts to the same MPI size; here a
  single topology-independent `.npz` restores on any device count
  (SURVEY.md §5: "make topology-independent restore the default").
- `HISTORY`-analog: store the initial-mesh spec plus the per-AMR-level
  refinement logs and REPLAY them on load
  (`d4est_checkpoint_load_mesh_from_amr_history`).

Mid-solve checkpointing hooks (every n Krylov/Newton iterations,
`d4est_solver_krylov_petsc.c:236-245`) call `save` with the current
iterate.
"""

from __future__ import annotations

import json

import numpy as np

from disco4est_tpu.geometry.base import Connectivity
from disco4est_tpu.mesh.tree import Forest


def save(path: str, forest: Forest, fields: dict, *, deg: int,
         amr_history: list | None = None, extra: dict | None = None):
    """Write forest + nodal fields (+ optional AMR history) to `path`.npz."""
    payload = {
        "tree": forest.tree,
        "level": forest.level,
        "anchor": forest.anchor,
        "deg": np.asarray(deg),
        "checksum": np.asarray(forest.checksum(), np.int64),
        "n_elements": np.asarray(forest.n_elements),
    }
    for name, arr in fields.items():
        payload[f"field_{name}"] = np.asarray(arr)
    if amr_history is not None:
        payload["amr_history_lens"] = np.asarray(
            [len(h) for h in amr_history], np.int64
        )
        if amr_history:
            payload["amr_history"] = np.concatenate(
                [np.asarray(h, np.int64) for h in amr_history]
            )
        else:
            payload["amr_history"] = np.zeros(0, np.int64)
    if extra:
        payload["extra_json"] = np.frombuffer(
            json.dumps(extra).encode(), dtype=np.uint8
        )
    np.savez(path, **payload)


def load(path: str, conn: Connectivity):
    """Restore (forest, fields dict, deg, amr_history, extra).

    Validates the structural checksum exactly as the reference validates
    `p4est_checksum`/`degree_sum` on load (`d4est_checkpoint.h:12-13`)."""
    if not path.endswith(".npz"):
        path = path + ".npz"
    data = np.load(path)
    forest = Forest(
        conn,
        data["tree"].astype(np.int32),
        data["level"].astype(np.int8),
        data["anchor"].astype(np.int32),
    )
    if int(data["checksum"]) != forest.checksum():
        raise ValueError("checkpoint checksum mismatch")
    fields = {
        k[len("field_"):]: data[k] for k in data.files if k.startswith("field_")
    }
    history = None
    if "amr_history_lens" in data.files:
        history = []
        flat = data["amr_history"]
        off = 0
        for n in data["amr_history_lens"]:
            history.append(flat[off:off + int(n)])
            off += int(n)
    extra = None
    if "extra_json" in data.files:
        extra = json.loads(bytes(data["extra_json"]).decode())
    return forest, fields, int(data["deg"]), history, extra


def replay_amr_history(initial_forest: Forest, history: list) -> Forest:
    """Rebuild a forest by replaying per-level refinement logs
    (the size-independent restore path, `driver.c:156-227`)."""
    from disco4est_tpu.amr.amr import refine_and_balance

    forest = initial_forest
    for log in history:
        log = np.asarray(log)
        if len(log) != forest.n_elements:
            raise ValueError(
                f"history entry length {len(log)} != {forest.n_elements}"
            )
        forest = refine_and_balance(forest, log < 0)
    return forest
