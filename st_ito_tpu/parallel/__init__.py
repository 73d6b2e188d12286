"""Device mesh construction and sharding helpers.

The framework uses two mesh axes by convention:
- "pop"  — CMA-ES population sharding for ITO (the reference's mp.Pool
           render parallelism, reference: st_ito/style_transfer.py:499-502)
- "data" — batch data parallelism for training (the reference's Lightning
           DDP/NCCL, reference: scripts/main.py:13-17)

Collectives ride ICI via XLA's SPMD partitioner; nothing here issues
explicit NCCL-style calls.
"""

from st_ito_tpu.parallel.mesh import (
    data_sharding,
    make_mesh,
    population_sharding,
    replicated,
)

__all__ = ["make_mesh", "population_sharding", "data_sharding", "replicated"]
