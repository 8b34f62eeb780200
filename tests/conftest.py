"""Test configuration: run JAX on a virtual 8-device CPU mesh in float64.

Mirrors the reference's test strategy (SURVEY.md §4): correctness is
validated in double precision, and the rank-invariance contract is tested by
comparing 1-device vs N-device runs on the same host (the reference's
`d4est_test_mpi.sh` reruns under mpirun -np 8 / -np 1 and greps identical
norms).
"""

import os

xla_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in xla_flags:
    os.environ["XLA_FLAGS"] = (
        xla_flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax

# The environment may pre-set JAX_PLATFORMS (e.g. "axon,cpu" for the TPU
# tunnel); tests must run on the virtual CPU mesh, so force it via config
# (which wins over the env var).
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)


import pytest


@pytest.fixture(autouse=True, scope="module")
def _clear_jax_caches_between_modules():
    """Drop jitted executables between test modules.

    The in-memory pjit cache accumulates hundreds of compiled programs
    over the suite; past ~3-4 GB the XLA:CPU compiler crashes (SIGSEGV /
    SIGABRT inside compilation, upstream bug — reproducible only in long
    accumulated runs, never in isolation).  The persistent on-disk
    compilation cache keeps the recompiles cheap.
    """
    yield
    jax.clear_caches()
