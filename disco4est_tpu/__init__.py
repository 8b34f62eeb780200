"""disco4est_tpu — a TPU-native hp-adaptive discontinuous Galerkin solver.

A brand-new JAX/XLA/Pallas framework with the capabilities of the reference
C/MPI framework disco4est (hp-adaptive SIPG discretization of nonlinear
elliptic PDEs on curved multi-block 2D/3D meshes, hp-multigrid, Schwarz,
Newton-Krylov, forest-of-octrees AMR), re-designed TPU-first:

- elements live in flat, degree-bucketed struct-of-arrays sharded over a
  1D jax device mesh ("elements" axis), not per-quadrant C structs;
- all hot kernels are batched dense tensor contractions (MXU-friendly),
  with geometry factors precomputed per mesh epoch;
- halo exchange and reductions are XLA collectives, not MPI;
- the 2:1-balanced octree (the p4est role) is a set of array programs
  over Morton keys.

Reference feature map: see SURVEY.md at the repo root.
"""

__version__ = "0.1.0"

# The framework is float64-centric like the reference (its regression
# contract is in f64; `SURVEY.md` §7 "float64 on TPU must be validated
# early").  Kernels are dtype-polymorphic; benchmarks opt into f32/bf16
# explicitly.
import os as _os

import jax as _jax

_jax.config.update("jax_enable_x64", True)

# XLA compiles are expensive; keep a persistent on-disk cache so mesh-epoch
# recompiles and test reruns are cheap.  The cache is keyed by the host
# CPU model: XLA:CPU AOT artifacts baked for one microarchitecture can
# SIGILL on another (observed: cached avx512-targeted code crashing the
# test suite after a VM migration).
def _cpu_tag():
    import hashlib

    try:
        with open("/proc/cpuinfo") as f:
            for line in f:
                if line.startswith(("model name", "flags")):
                    return hashlib.md5(line.encode()).hexdigest()[:8]
    except OSError:
        pass
    return "generic"


_cache_dir = _os.environ.get(
    "DISCO4EST_JAX_CACHE",
    _os.path.expanduser(f"~/.cache/disco4est_jax_{_cpu_tag()}"),
)
try:
    _os.makedirs(_cache_dir, exist_ok=True)
    _jax.config.update("jax_compilation_cache_dir", _cache_dir)
    _jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    _jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.2)
except Exception:  # pragma: no cover - cache is best-effort
    pass

from disco4est_tpu.ops.lgl import (  # noqa: F401
    gauss_nodes_weights,
    lobatto_nodes_weights,
    jacobi,
    grad_jacobi,
)
from disco4est_tpu.ops.operators import Operators1D, OperatorDB  # noqa: F401
