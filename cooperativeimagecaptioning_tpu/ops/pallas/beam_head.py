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


@functools.partial(jax.jit, static_argnames=("m", "block_b"))
def beam_head_pallas(h, w, b, m: int, block_b: int = 64):
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
    )(h, w, b.reshape(1, -1))
    return vals[:, :m], idx[:, :m], lse[:, 0]


def beam_head(h, w, b, m: int):
    """Dispatch: resident-W Pallas on TPU for bf16 weights that fit VMEM."""
    if jax.devices()[0].platform in ("tpu", "axon") and \
            w.dtype == jnp.bfloat16 and \
            w.shape[0] * w.shape[1] * 2 <= 11 << 20 and h.shape[0] % 8 == 0:
        try:
            return beam_head_pallas(h, w, b, m)
        except Exception:
            pass
    return beam_head_reference(h, w, b, m)
