from disco4est_tpu.laplacian.sipg import (  # noqa: F401
    apply_sipg,
    apply_mass,
    build_rhs_with_strong_bc,
)
