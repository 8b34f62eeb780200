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
