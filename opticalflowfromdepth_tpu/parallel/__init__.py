"""Parallelism layer: mesh construction, sharding rules, sequence parallel.

Replaces the reference's DDP/NCCL stack (`adjusted_gmflow/utils/dist_utils.py`)
with one global mesh + pjit sharding; adds the optional sequence-parallel
ring matching the reference lacks (SURVEY.md §2.6, §5.7).
"""

from .mesh import (batch_sharding, init_distributed, make_mesh)  # noqa: F401
from .sequence import (matching_shardings, ring_softmax_matmul,  # noqa: F401
                       sharded_global_matching)
