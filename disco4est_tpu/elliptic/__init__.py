from disco4est_tpu.elliptic.problem import EllipticProblem  # noqa: F401
