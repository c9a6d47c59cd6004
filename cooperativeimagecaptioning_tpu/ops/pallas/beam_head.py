"""Fused beam logit head: logits = h @ W + b -> per-row (top-m values, indices,
logsumexp), without materializing [R, V] logits or running a sort.

Beam search needs, per beam row, the top-`m` words and their log-softmax values
(AttModel.py:209-227 takes per-beam top-`cols` then a global top beam_size).
The XLA path materializes full log-softmax then sorts; this kernel keeps the
whole bf16 W resident in VMEM (like the greedy head) and extracts the top-m by
m iterated masked-argmax passes — pure VPU, exact.

Returns (vals [R, m] logits of the top-m, idx [R, m] ids, lse [R] logsumexp);
log-softmax values are vals - lse[:, None].  Tie-breaking: first maximum wins
at every pass (matches jnp.argmax / the reference sort order per beam).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from cooperativeimagecaptioning_tpu.ops.pallas._dispatch import (
    kernel_fallback, on_tpu, vocab_mesh)

NEG = -1e30


def beam_head_reference(h, w, b, m):
    logits = (h @ w + b).astype(jnp.float32)
    mx = jnp.max(logits, axis=-1)
    lse = mx + jnp.log(jnp.sum(jnp.exp(logits - mx[:, None]), axis=-1))
    vals, idx = jax.lax.top_k(logits, m)
    return vals, idx.astype(jnp.int32), lse


def _make_kernel(m: int):
    def kernel(h_ref, w_ref, b_ref, vals_ref, idx_ref, lse_ref):
        logits = jnp.dot(h_ref[:], w_ref[:],
                         preferred_element_type=jnp.float32) + b_ref[:]
        R, V = logits.shape
        col = jax.lax.broadcasted_iota(jnp.int32, (R, V), 1)
        mx = jnp.max(logits, axis=1, keepdims=True)
        lse_ref[:] = mx + jnp.log(
            jnp.sum(jnp.exp(logits - mx), axis=1, keepdims=True))
        cur = logits
        for k in range(m):
            v = jnp.max(cur, axis=1)                       # [R]
            i = jnp.argmax(cur, axis=1).astype(jnp.int32)  # [R]
            vals_ref[:, k] = v
            idx_ref[:, k] = i
            cur = jnp.where(col == i[:, None], NEG, cur)
    return kernel


@functools.partial(jax.jit, static_argnames=("m", "block_b", "interpret"))
def beam_head_pallas(h, w, b, m: int, block_b: int = 64,
                     interpret: bool = False):
    B, H = h.shape
    V = w.shape[1]
    bb = min(block_b, B)
    while B % bb:
        bb //= 2
    V_pad = -(-V // 128) * 128
    if V_pad != V:
        w = jnp.pad(w, ((0, 0), (0, V_pad - V)))
        b = jnp.pad(b, (0, V_pad - V), constant_values=NEG)
    m_pad = -(-m // 128) * 128  # lane-pad the tiny top-m outputs
    vals, idx, lse = pl.pallas_call(
        _make_kernel(m),
        grid=(B // bb,),
        in_specs=[
            pl.BlockSpec((bb, H), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((H, V_pad), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, V_pad), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((bb, m_pad), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bb, m_pad), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bb, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B, m_pad), jnp.float32),
            jax.ShapeDtypeStruct((B, m_pad), jnp.int32),
            jax.ShapeDtypeStruct((B, 1), jnp.float32),
        ],
        interpret=interpret,
    )(h, w, b.reshape(1, -1))
    return vals[:, :m], idx[:, :m], lse[:, 0]


def _local_beam_head(h, w, b, m: int, interpret: bool = False):
    """Single-shard dispatch body (also the per-shard fn under shard_map):
    resident-W Pallas on TPU for bf16 weights that fit VMEM."""
    if interpret:
        return beam_head_pallas(h, w, b, m, interpret=True)
    if on_tpu() and w.dtype == jnp.bfloat16 and \
            w.shape[0] * w.shape[1] * 2 <= 11 << 20 and h.shape[0] % 8 == 0:
        try:
            return beam_head_pallas(h, w, b, m)
        except Exception as err:
            kernel_fallback("beam_head", err)
    return beam_head_reference(h, w, b, m)


def beam_head_sharded(h, w, b, m: int, mesh, vocab_axis: str = "model",
                      data_axis: str = "data", interpret: bool = False):
    """Vocab-sharded beam head over a (data, model) mesh.

    w [H, V] / b [V] are sharded on `vocab_axis`; h rows ride `data_axis`
    when it divides.  Each model shard runs the resident-W kernel on its local
    vocab slice, then the per-shard top-m candidates (offset to global ids)
    and streaming-logsumexp partials merge with one [B, n*m] all_gather over
    ICI — O(B*m) bytes on the interconnect instead of re-gathering the O(H*V)
    weight matrix every decode step.  Tie behavior matches the reference
    top_k (lower global index wins) because the gather is shard-major and
    within-shard candidates are emitted in first-max order.
    """
    n = mesh.shape[vocab_axis]
    V = w.shape[1]
    assert V % n == 0, (V, n)
    d = data_axis if (mesh.shape.get(data_axis, 1) > 1 and
                      h.shape[0] % mesh.shape[data_axis] == 0) else None
    P = jax.sharding.PartitionSpec

    def local(h_, w_, b_):
        vals, idx, lse = _local_beam_head(h_, w_, b_, m, interpret=interpret)
        shard = jax.lax.axis_index(vocab_axis)
        idx = idx + (shard * (V // n)).astype(idx.dtype)
        vals_g = jax.lax.all_gather(vals, vocab_axis, axis=1, tiled=True)
        idx_g = jax.lax.all_gather(idx, vocab_axis, axis=1, tiled=True)
        lse_g = jax.lax.all_gather(lse, vocab_axis)            # [n, B]
        mx = jnp.max(lse_g, axis=0)
        lse_tot = mx + jnp.log(jnp.sum(jnp.exp(lse_g - mx[None, :]), axis=0))
        tv, sel = jax.lax.top_k(vals_g, m)
        ti = jnp.take_along_axis(idx_g, sel, axis=1)
        return tv, ti, lse_tot

    # check_vma off: the all_gathers DO replicate over vocab_axis but the
    # varying-axes checker cannot infer it through take_along_axis/top_k
    return jax.shard_map(
        local, mesh=mesh,
        in_specs=(P(d), P(None, vocab_axis), P(vocab_axis)),
        out_specs=(P(d), P(d), P(d)), check_vma=False)(h, w, b)


def beam_head(h, w, b, m: int):
    """Dispatch: sharded path on a registered model-parallel mesh, else
    resident-W Pallas on TPU, else reference math."""
    vm = vocab_mesh()
    if vm is not None:
        mesh, va, da = vm
        if w.shape[1] % mesh.shape[va] == 0:
            return beam_head_sharded(h, w, b, m, mesh, va, da)
    return _local_beam_head(h, w, b, m)
