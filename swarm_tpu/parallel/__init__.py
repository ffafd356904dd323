"""Multi-chip parallelism: device meshes + sharded clustering kernels.

The reference's only parallelism is a pthread pool over shared memory
(src/utils/threads.h, SURVEY.md section 2 "parallelism strategies").
The TPU-native equivalent is SPMD over a jax.sharding.Mesh: amplicon
batches are sharded across chips (data parallel over the ICI), the
sequence-hash table and Zobrist tables are replicated, and candidate
counts are merged with psum.
"""

from .mesh import (  # noqa: F401
    ShardedNeighborEngine,
    SortJoinShardedEngine,
    make_mesh,
)
