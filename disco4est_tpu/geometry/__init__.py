from disco4est_tpu.geometry.base import Geometry, Connectivity  # noqa: F401
from disco4est_tpu.geometry.brick import BrickGeometry  # noqa: F401
