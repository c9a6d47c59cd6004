"""Shared kernel-dispatch policy for the Pallas ops.

Every fused kernel has a pure-JAX reference path (the math oracle and the
CPU/GPU fallback).  On TPU the dispatchers try the Pallas implementation and
fall back to the reference if the call raises — but NEVER silently: the first
failure per kernel emits a RuntimeWarning with the underlying error, and
CIC_KERNEL_STRICT=1 re-raises instead of falling back (use it on real TPU runs
to prove the kernels actually dispatch).

Known limitation (documented in CLAUDE.md): scoped-VMEM OOMs for a pallas_call
embedded in a larger jitted program fire at the OUTER jit's compile time, where
no try/except inside the traced function can catch them.  The guard here covers
trace/lowering-time failures and eager dispatch; compile-time failures surface
to the caller, by design.
"""

from __future__ import annotations

import os
import warnings

import jax

_warned: set = set()


def on_tpu() -> bool:
    """True when the default backend is a real TPU (or the axon tunnel)."""
    return jax.devices()[0].platform in ("tpu", "axon")


def kernel_fallback(name: str, err: Exception) -> None:
    """Record a failed Pallas dispatch: warn once per kernel, or re-raise
    under CIC_KERNEL_STRICT=1."""
    if os.environ.get("CIC_KERNEL_STRICT") == "1":
        raise err
    if name not in _warned:
        _warned.add(name)
        warnings.warn(
            f"Pallas kernel {name!r} failed to dispatch and this process is "
            f"falling back to the pure-JAX reference path (results stay "
            f"correct, performance degrades). Cause: {err!r}",
            RuntimeWarning, stacklevel=3)


def reset_warnings() -> None:
    """Test hook: forget which kernels already warned."""
    _warned.clear()


# ---------------------------------------------------------------------------
# vocab-sharded dispatch (model-parallel meshes)
# ---------------------------------------------------------------------------
# The vocab-projection kernels assume the FULL [H, V+1] weight matrix; under a
# mesh with model axis > 1 the logit/embed matrices are vocab-sharded
# (parallel/mesh.py:_speaker_rules) and a plain pallas_call would force XLA to
# all-gather W every step.  Registering the mesh here switches greedy_head /
# beam_head to their shard_map variants: each model shard runs the kernel on
# its local W slice and the per-shard (top-m, logsumexp) partials merge with
# one small all_gather over ICI — O(B*m) bytes instead of O(H*V).
#
# Process-level state, set once by Trainer/Evaluator/make_distributed_train_
# step before any tracing; programs traced while a mesh is registered bake the
# shard_map in (consistent: they were traced FOR that mesh).

_vocab_mesh = None


def set_vocab_mesh(mesh, vocab_axis: str = "model",
                   data_axis: str = "data") -> None:
    """Register (or clear, mesh=None) the mesh whose `vocab_axis` shards the
    vocab matrices; head dispatchers then use the sharded kernel path."""
    global _vocab_mesh
    if mesh is None or mesh.shape.get(vocab_axis, 1) <= 1:
        _vocab_mesh = None
    else:
        _vocab_mesh = (mesh, vocab_axis, data_axis)


def vocab_mesh():
    """(mesh, vocab_axis, data_axis) when a model-sharded mesh is registered,
    else None."""
    return _vocab_mesh
