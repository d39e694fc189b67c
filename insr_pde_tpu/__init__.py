"""insr_pde_tpu — a TPU-native implicit-neural-spatial-representation PDE framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of qingxu-thu/INSR-PDE
("Simulating Physics with Implicit Neural Spatial Representations", ICML 2023):
each PDE field is a coordinate network (SIREN MLP or random-basis ansatz) and the
simulation advances in time by re-optimizing the field parameters against a
time-discretized PDE residual at Monte-Carlo collocation points.

Layer map (mirrors reference /root/reference, see SURVEY.md §1):
  L1 config   : insr_pde_tpu.config
  L2 runtime  : insr_pde_tpu.models.{networks,solver,base}, insr_pde_tpu.ops.{diff,sampling}
  L3 domain   : insr_pde_tpu.geometry (mesh IO/sampling), insr_pde_tpu.ops.{linalg,knn,svd},
                insr_pde_tpu.models.{rbf,encodings,elast_losses}, insr_pde_tpu.native (C fastmesh)
  L4 models   : insr_pde_tpu.models.{advection,fluid,elasticity,vortex}
  L5 entry    : main.py / recap.py / starterL.py / scripts/*.sh at the repo root
Parallelism  : insr_pde_tpu.parallel (device mesh + shard_map collocation sharding)
"""

__version__ = "0.1.0"

from . import config  # noqa: F401
