"""Device mesh + sharding rules.

Axes:
  data  — batch parallelism (the one dimension this workload genuinely needs:
          SURVEY.md §2.3; gradients all-reduce over ICI, the listener's in-batch
          B x B contrastive matrix becomes a sharded matmul + all-gather that
          GSPMD inserts automatically)
  model — vocab parallelism for the two vocab-sized matrices (logit [H, V+1] and
          the embedding table [V+2, D]); optional, size 1 by default.

No hand-written collectives: programs are jitted with NamedSharding constraints
and XLA's SPMD partitioner places psum/all-gather on the interconnect.
"""

from __future__ import annotations

import numpy as np

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_data: int = 0, n_model: int = 1, devices=None) -> Mesh:
    """Create a (data, model) mesh; n_data=0 uses all remaining devices."""
    devices = devices if devices is not None else jax.devices()
    n_total = len(devices)
    if n_data == 0:
        n_data = n_total // n_model
    used = n_data * n_model
    arr = np.array(devices[:used]).reshape(n_data, n_model)
    return Mesh(arr, axis_names=("data", "model"))


def replicate(tree, mesh: Mesh):
    sharding = NamedSharding(mesh, P())
    return jax.device_put(tree, sharding)


# batch keys that are per-run CONSTANTS, not per-step data: always replicated
# (a df_table's power-of-2 leading dim usually divides the data axis, so the
# divisibility rule alone would shard it)
_REPLICATED_KEYS = frozenset({"df_table"})


def shard_batch(batch, mesh: Mesh):
    """Shard every array's leading (batch) axis over 'data'.

    Leaves whose leading dim does not divide the axis (e.g. per-IMAGE reward
    refs [n_img, R, L] next to per-SEQUENCE rows [n_img*seq_per_img, ...])
    and `_REPLICATED_KEYS` constants are replicated instead — GSPMD
    broadcasts them inside the step.  A leaf already committed WITH its
    intended sharding passes through untouched (no per-step re-device_put);
    a committed leaf with a different sharding is still re-placed — e.g. the
    HBM feature cache's gathered batches come out committed-replicated, and
    leaving them replicated would defeat the data axis entirely (each chip
    holding + computing the full global batch).
    """
    n_data = mesh.shape.get("data", 1)
    sharded = NamedSharding(mesh, P("data"))
    replicated = NamedSharding(mesh, P())

    def put(path, x):
        if x is None:
            return None
        # scan the WHOLE path: a DfTable NamedTuple's leaves end in
        # GetAttrKey/SequenceKey, so only the dict entry above them carries
        # the 'df_table' name
        is_const = any(getattr(p, "key", None) in _REPLICATED_KEYS
                       for p in path)
        ok = (not is_const and np.ndim(x) > 0
              and x.shape[0] % n_data == 0)
        want = sharded if ok else replicated
        if isinstance(x, jax.Array) and x.committed and \
                x.sharding.is_equivalent_to(want, x.ndim):
            return x
        return jax.device_put(x, want)
    return jax.tree_util.tree_map_with_path(
        put, batch, is_leaf=lambda x: x is None)


def shard_batch_stacked(xs, mesh: Mesh):
    """shard_batch for fused-chunk inputs stacked on a leading K (step) axis
    (training/loop.py Trainer.train_chunk): axis 1 holds each step's batch
    rows, so THAT axis shards over 'data'; [K]-shaped per-step scalars
    (hp fields, lr) and non-divisible leaves replicate."""
    n_data = mesh.shape.get("data", 1)
    sharded = NamedSharding(mesh, P(None, "data"))
    replicated = NamedSharding(mesh, P())

    def put(x):
        if x is None:
            return None
        ok = np.ndim(x) > 1 and x.shape[1] % n_data == 0
        want = sharded if ok else replicated
        if isinstance(x, jax.Array) and x.committed and \
                x.sharding.is_equivalent_to(want, x.ndim):
            return x
        return jax.device_put(x, want)
    return jax.tree_util.tree_map(put, xs, is_leaf=lambda x: x is None)


def _speaker_rules(path):
    """PartitionSpec for a speaker param leaf, keyed by its tree path."""
    names = [getattr(p, "key", getattr(p, "name", "")) for p in path]
    if "logit" in names:
        if names[-1] == "w":
            return P(None, "model")   # [H, V+1] vocab-sharded
        return P("model")             # bias [V+1]
    if names[-1] == "embed":
        return P("model", None)       # [V+2, D] vocab-sharded rows
    return P()


def param_shardings(params, mesh: Mesh, vocab_sharded: bool = True):
    """NamedShardings for the joint param tree (replicated except vocab dims).

    A vocab dim that does not divide the 'model' axis falls back to replicated
    for that leaf (V+1 and V+2 are consecutive, so with an even model axis at
    most one of logit/embed can shard without padding)."""
    n_model = mesh.shape["model"]

    def spec_for(path, leaf):
        if not vocab_sharded or n_model == 1:
            return NamedSharding(mesh, P())
        spec = _speaker_rules(path)
        shape = getattr(leaf, "shape", ())
        for dim, name in enumerate(spec):
            if name == "model" and shape[dim] % n_model != 0:
                return NamedSharding(mesh, P())
        return NamedSharding(mesh, spec)
    return jax.tree_util.tree_map_with_path(spec_for, params)
