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

from disco4est_tpu.ops.lgl import (  # noqa: F401
    gauss_nodes_weights,
    lobatto_nodes_weights,
    jacobi,
    grad_jacobi,
)
from disco4est_tpu.ops.operators import Operators1D, OperatorDB  # noqa: F401
