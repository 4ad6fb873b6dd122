"""Multi-chip / multi-host scaling (SURVEY §5.8, BASELINE configs 4-5).

The reference's only parallelism is single-node rayon fan-out over reads
(src/lib.rs:93-132).  The TPU-native mapping:

* **Correction** — pure data parallelism: the solid bitfield is replicated
  per chip in HBM, read batches shard along the batch axis of a 1-D
  ``jax.sharding.Mesh`` ("dp"); the per-lane while_loop partitions
  trivially, no cross-chip traffic during the scan; order-preserving merge
  happens on the host exactly as in the single-chip path.
* **Counting** — each chip scatter-adds its read shard into a local count
  array; replicas merge with one ``psum`` over ICI inside ``shard_map``;
  thresholding to the bitfield is elementwise on the replicated result.
* **Multi-host** — ``jax.distributed.initialize`` + per-host input file
  sharding; only the host-level read sharding and the ordered gather of
  outputs ride DCN.
"""

from br_tpu.parallel.mesh import (  # noqa: F401
    count_sharded,
    data_parallel_mesh,
    shard_batch,
)
from br_tpu.parallel.multihost import (  # noqa: F401
    count_stripe_merged,
    global_mesh,
    initialize,
    run_correction_striped,
)
