"""Parallelism: device mesh, sharding rules, distributed train step.

The reference is strictly single-device (SURVEY.md §2.3 — no DataParallel/DDP/
NCCL anywhere); this layer is the TPU-native scaling dimension it lacks: a named
`(data, model)` mesh over ICI, GSPMD-partitioned train steps (XLA inserts the
gradient all-reduce and the embedding all-gathers), and vocab-sharded logit/embed
for the model axis."""

from cooperativeimagecaptioning_tpu.parallel.mesh import (  # noqa: F401
    make_mesh, shard_batch, shard_batch_stacked, replicate, param_shardings)
