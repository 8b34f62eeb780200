from disco4est_tpu.solvers.cg import cg_solve  # noqa: F401
