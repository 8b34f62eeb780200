"""p-balance (degree-jump limiting) and per-region estimator stats.

References: `hpAMR/d4est_amr.c:917-991` (p-balance pass + log bump),
`d4est_amr_smooth_pred.c:133-168` (post-p-balance predictor update),
`Estimators/d4est_estimator_stats.h:25` / `two_punctures_cactus.c:391`
(per-region stats driving the flagship marking).
"""

import numpy as np
import jax.numpy as jnp

from disco4est_tpu.geometry.brick import BrickGeometry
from disco4est_tpu.geometry.cubed_sphere import CubedSphereGeometry
from disco4est_tpu.mesh.tree import Forest
from disco4est_tpu.mesh.builder import build_mesh
from disco4est_tpu.amr.amr import p_balance_log
from disco4est_tpu.estimators.stats import (
    element_regions,
    estimator_stats_per_region,
    percentile,
)


def test_p_balance_conforming():
    """deg jump of 2 across a conforming face bumps the lagging element's
    log by one (h-marked: child degree +1; p/no-op: degree +1)."""
    geom = BrickGeometry(dim=3)
    forest = Forest.uniform(geom.conn, 1)  # 8 elements
    deg_e = np.full(8, 2, np.int32)
    deg_e[0] = 4  # neighbor jump of 2 onto elements sharing a face with 0
    mesh = build_mesh(geom, forest, deg=4, deg_e=deg_e)

    log = deg_e.astype(np.int64).copy()  # all no-ops
    log[1] = -2  # h-mark one of the lagging neighbors
    new_log, _ = p_balance_log(mesh, deg_e, log, 2, max_degree=7)

    nbr = np.asarray(mesh.nbr_elem)
    lagging = np.zeros(8, bool)
    for f in range(6):
        lagging |= (nbr[:, f] == 0) & (np.arange(8) != 0)
    lagging[0] = False
    # h-marked lagging element: child degree raised (log -= 1)
    assert new_log[1] == -3
    # other lagging elements: p-refined one degree
    for e in np.where(lagging)[0]:
        if e != 1:
            assert new_log[e] == deg_e[e] + 1, (e, new_log[e])
    # non-neighbors and the high-degree element unchanged
    untouched = ~lagging & (np.arange(8) != 0)
    assert np.all(new_log[untouched] == deg_e[untouched])
    assert new_log[0] == deg_e[0]


def test_p_balance_max_degree_cap_and_predictor():
    """Elements at max_degree-1 or above are not bumped; bumped elements
    get predictor *= gamma_p."""
    geom = BrickGeometry(dim=3)
    forest = Forest.uniform(geom.conn, 1)
    deg_e = np.full(8, 2, np.int32)
    deg_e[0] = 5
    deg_e[3] = 4  # at max_degree-1: must NOT be bumped
    mesh = build_mesh(geom, forest, deg=5, deg_e=deg_e)
    log = deg_e.astype(np.int64).copy()
    pred = np.ones(8)
    new_log, new_pred = p_balance_log(
        mesh, deg_e, log, 2, max_degree=5, predictor=pred, gamma_p=0.1
    )
    assert new_log[3] == deg_e[3]
    assert new_pred[3] == 1.0
    bumped = new_log != log
    assert bumped.any()
    assert np.allclose(new_pred[bumped], 0.1)
    assert np.allclose(new_pred[~bumped], 1.0)


def test_p_balance_hanging():
    """Degree jumps across hanging mortars are seen by both sides."""
    geom = BrickGeometry(dim=3)
    forest = Forest.uniform(geom.conn, 1)
    flags = np.zeros(8, bool)
    flags[0] = True
    forest = forest.refine(flags).balance()
    E = forest.n_elements  # 15
    deg_e = np.full(E, 2, np.int32)
    ce_mesh = build_mesh(geom, forest, deg=2, deg_e=deg_e)
    ce = np.asarray(ce_mesh.hc_elem)
    fe = np.asarray(ce_mesh.hc_fine)
    assert ce.size > 0
    # give one fine element of the first mortar degree 4 -> the coarse
    # partner must be bumped
    tgt_fine = int(fe[0, 0])
    coarse = int(ce[0])
    deg_e[tgt_fine] = 4
    mesh = build_mesh(geom, forest, deg=4, deg_e=deg_e)
    log = deg_e.astype(np.int64).copy()
    new_log, _ = p_balance_log(mesh, deg_e, log, 2, max_degree=7)
    assert new_log[coarse] == deg_e[coarse] + 1


def test_per_region_stats_cubed_sphere():
    geom = CubedSphereGeometry("13tree", R0=1.0, R1=2.0, R2=3.0)
    forest = Forest.uniform(geom.conn, 0)  # 13 elements = 13 trees
    mesh = build_mesh(geom, forest, deg=1, face_h_type="j_div_sj_quad")
    regions = element_regions(mesh)
    assert geom.n_regions == 3
    assert (regions == 0).sum() == 6  # outer shell
    assert (regions == 1).sum() == 6  # inner shell
    assert (regions == 2).sum() == 1  # core

    eta2 = np.arange(13, dtype=float) + 1.0
    stats = estimator_stats_per_region(eta2, regions, 3)
    assert np.isclose(sum(s["total"] for s in stats), eta2.sum())
    assert stats[2]["count"] == 1
    # per-region percentile: top-50% threshold within region 0 only
    thr = float(percentile(stats[0], 50.0))
    vals0 = np.sort(eta2[regions == 0])
    assert thr in vals0
    assert (vals0 >= thr).sum() <= max(1, int(np.ceil(0.5 * len(vals0)) + 1))
