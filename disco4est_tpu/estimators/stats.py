"""Global statistics over the per-element estimator η².

Role of the reference's `Estimators/d4est_estimator_stats.c:227-330`:
sum/mean/max via `sc_allreduce`, and a global percentile found by a sorted
rank walk across ranks.  TPU-native: `jnp.sum/max` and `jnp.sort` — under
element-axis sharding these lower to psum/pmax and a distributed sort, so
the same jitted code covers 1 chip and N chips (the reference's
rank-invariance contract).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


@jax.jit
def estimator_stats(eta2):
    """dict of total/mean/max/sorted-array for percentile queries."""
    total = jnp.sum(eta2)
    return {
        "total": total,
        "mean": total / eta2.shape[0],
        "max": jnp.max(eta2),
        "sorted": jnp.sort(eta2),
    }


def percentile(stats, pct: float):
    """η² value such that `pct` percent of elements lie ABOVE it
    (`d4est_estimator_stats_get_percentile`: e.g. pct=5 → the 5% largest
    elements are marked)."""
    s = stats["sorted"]
    n = s.shape[0]
    k = jnp.clip((n * (100.0 - pct)) // 100, 0, n - 1).astype(int)
    return s[k]


def estimator_stats_per_region(eta2, regions, n_regions: int):
    """Per-region stats (`d4est_estimator_stats_compute_per_region`,
    `Estimators/d4est_estimator_stats.h:25`; the per-bin variant the
    flagship TP driver marks with, `two_punctures_cactus.c:391-392` where
    bin == element region).  Returns a list of `n_regions` dicts shaped
    like `estimator_stats` — `percentile(stats[r], pct)` gives the
    region-local marking threshold
    (`two_punctures_cactus.c:196` `stats[elem_data->region]`).

    Host-side (numpy): regions have data-dependent sizes; marking runs on
    the host between mesh epochs exactly as the reference's rank-local
    loop does."""
    import numpy as np

    eta2 = np.asarray(eta2)
    regions = np.asarray(regions)
    out = []
    for r in range(n_regions):
        vals = eta2[regions == r]
        total = float(vals.sum())
        out.append(
            {
                "total": total,
                "mean": total / max(len(vals), 1),
                "max": float(vals.max()) if len(vals) else 0.0,
                "count": int(len(vals)),
                "sorted": np.sort(vals),
            }
        )
    return out


def element_regions(mesh):
    """[E] region id per element via the geometry's tree→region map
    (`d4est_geometry.h:118` get_region)."""
    import numpy as np

    return mesh.geom.tree_region(np.asarray(mesh.forest.tree))
