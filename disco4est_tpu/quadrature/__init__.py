from disco4est_tpu.quadrature.quadrature import Quadrature  # noqa: F401
