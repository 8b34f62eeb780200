"""SIPG penalty debugger.

Role of the reference's
`dGMath/d4est_laplacian_flux_sipg_penalty_debugger.c:1-484`: instrument
the penalty function σ over every face of the mesh and report
min/max/mean per face class — the tool for diagnosing penalty blowup on
stretched/compactified elements and for tuning `sipg_penalty_prefactor`.

Batched TPU-shape: the penalties are precomputed per-epoch arrays on
MeshData (sigma / sigma_q / hc_sigma / hc_sigma_q), so the debugger is a
pure reduction pass, no flux sweep needed.
"""

from __future__ import annotations

import numpy as np

from disco4est_tpu.mesh.builder import MeshData
from disco4est_tpu.mesh.faces import BOUNDARY, CONF


def _stats(arr: np.ndarray) -> dict:
    if arr.size == 0:
        return {"min": None, "max": None, "mean": None, "count": 0}
    return {
        "min": float(arr.min()),
        "max": float(arr.max()),
        "mean": float(arr.mean()),
        "count": int(arr.size),
    }


def penalty_report(mesh: MeshData) -> dict:
    """Penalty statistics per face class (`debugger_get_min_penalty` /
    `_get_max_penalty` roles, aggregated in one pass).

    Returns {"interior": .., "boundary": .., "mortar": .., "pointwise":
    bool} where each entry has min/max/mean/count of σ over the faces of
    that class.  For the pointwise penalty (j_div_sj_quad) statistics run
    over every face quadrature point, like the reference evaluates its
    per-point penalty."""
    kind = mesh.ft.kind
    conf = kind == CONF
    bnd = kind == BOUNDARY
    pointwise = mesh.sigma_q is not None
    if pointwise:
        sq = np.asarray(mesh.sigma_q)  # [E, 2d, nfq...]
        flat = sq.reshape(sq.shape[0], sq.shape[1], -1)
        interior = flat[conf]
        boundary = flat[bnd]
    else:
        s = np.asarray(mesh.sigma)
        interior = s[conf]
        boundary = s[bnd]
    if mesh.hc_sigma_q is not None:
        mortar = np.asarray(mesh.hc_sigma_q).reshape(-1)
    else:
        mortar = np.asarray(mesh.hc_sigma).reshape(-1)
    return {
        "pointwise": pointwise,
        "interior": _stats(np.asarray(interior)),
        "boundary": _stats(np.asarray(boundary)),
        "mortar": _stats(mortar),
    }


def print_penalty_report(mesh: MeshData) -> dict:
    """Log the report in the reference's debugger style."""
    rep = penalty_report(mesh)
    for cls in ("interior", "boundary", "mortar"):
        st = rep[cls]
        if st["count"]:
            print(
                f"[PENALTY_DEBUGGER] {cls}: min = {st['min']:.12e} "
                f"max = {st['max']:.12e} mean = {st['mean']:.12e} "
                f"(n = {st['count']})"
            )
        else:
            print(f"[PENALTY_DEBUGGER] {cls}: no faces")
    return rep
