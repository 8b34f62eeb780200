from disco4est_tpu.estimators.bi import estimate_bi  # noqa: F401
from disco4est_tpu.estimators.stats import estimator_stats  # noqa: F401
