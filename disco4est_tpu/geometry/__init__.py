from disco4est_tpu.geometry.base import Geometry, Connectivity  # noqa: F401
from disco4est_tpu.geometry.brick import BrickGeometry  # noqa: F401
from disco4est_tpu.geometry.cubed_sphere import CubedSphereGeometry  # noqa: F401
from disco4est_tpu.geometry.disk import DiskGeometry  # noqa: F401
from disco4est_tpu.geometry.misc import (  # noqa: F401
    HoleInABoxGeometry,
    PizzaHalfGeometry,
    TrapGeometry,
)
