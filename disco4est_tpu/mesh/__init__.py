from disco4est_tpu.mesh.tree import Forest, MAXL, ROOT  # noqa: F401
from disco4est_tpu.mesh.faces import FaceTables, build_face_tables  # noqa: F401
