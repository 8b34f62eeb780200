from disco4est_tpu.amr.amr import (  # noqa: F401
    amr_step,
    transfer_field,
    refine_and_balance,
)
