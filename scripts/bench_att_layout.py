#!/usr/bin/env python3
"""Greedy-decode roofline closure experiment (VERDICT r4 item 6): K-major
attention-context layout.

The shipped fused attention kernel (ops/pallas/att_step.py) streams
[bb, K, H] / [bb, K, A] blocks.  TPU tiles the LAST TWO dims of a rank-3
block, so at the reference K=36 every (K, H) tile pads K 36->40 sublanes —
~11% wasted bandwidth and VPU work on padding rows, right at the measured
~9% gap to the streaming roofline (docs/PERFORMANCE.md).  The K-major
variant here streams [K, bb, H] / [K, bb, A] blocks instead: (bb, H) tiles
are exactly aligned (bb multiple of 8, H/A multiples of 128), K becomes the
untiled leading dim, and the softmax reduces across tiles.

The one-time context transpose after encode_features is amortized over the
~L=17 decode steps.

Usage:  python scripts/bench_att_layout.py [B] [iters]
Prints one JSON line: per-step ms for the shipped kernel, the K-major
kernel, and the pure-XLA reference, plus the transpose cost.
"""

from __future__ import annotations

import functools
import json
import sys
import time

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _make_kernel_kmajor(use_mask: bool):
    def kernel(*refs):
        if use_mask:
            (h_ref, emb_ref, patt_ref, wh_ref, bh_ref, wa_ref, ba_ref,
             mask_ref, out_ref) = refs
        else:
            (h_ref, emb_ref, patt_ref, wh_ref, bh_ref, wa_ref, ba_ref,
             out_ref) = refs
        att_h = jnp.dot(h_ref[:], wh_ref[:],
                        preferred_element_type=jnp.float32) + bh_ref[:]
        # [K, BB, A] blocks: (BB, A) tiles are exactly lane/sublane-aligned
        dot = jnp.tanh(patt_ref[:].astype(jnp.float32) + att_h[None, :, :])
        scores = jnp.sum(dot * wa_ref[:][:, 0][None, None, :],
                         axis=2) + ba_ref[0, 0]            # [K, BB]
        scores = scores - jnp.max(scores, axis=0, keepdims=True)
        e = jnp.exp(scores)
        w = e / jnp.sum(e, axis=0, keepdims=True)          # softmax over K
        if use_mask:
            w = w * mask_ref[:]
            w = w / jnp.sum(w, axis=0, keepdims=True)
        out_ref[:] = jnp.sum(
            w[:, :, None] * emb_ref[:].astype(jnp.float32),
            axis=0).astype(out_ref.dtype)
    return kernel


@functools.partial(jax.jit,
                   static_argnames=("block_b", "use_mask", "interpret"))
def attention_kmajor(h, att_emb_t, p_att_t, w_h2att, b_h2att, w_alpha,
                     b_alpha, masks_t, use_mask: bool, block_b: int = 64,
                     interpret: bool = False):
    """att_emb_t [K, B, H], p_att_t [K, B, A], masks_t [K, B] (transposed)."""
    K, B, H = att_emb_t.shape
    A = p_att_t.shape[2]
    from cooperativeimagecaptioning_tpu.ops.pallas.att_step import \
        _pick_block_b
    bb = _pick_block_b(B, K, H, A, block_b, att_emb_t.dtype.itemsize)
    grid = (B // bb,)
    in_specs = [
        pl.BlockSpec((bb, H), lambda i: (i, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((K, bb, H), lambda i: (0, i, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((K, bb, A), lambda i: (0, i, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((H, A), lambda i: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, A), lambda i: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((A, 1), lambda i: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1), lambda i: (0, 0), memory_space=pltpu.SMEM),
    ]
    args = [h, att_emb_t, p_att_t, w_h2att, b_h2att.reshape(1, -1), w_alpha,
            jnp.asarray(b_alpha).reshape(1, 1)]
    if use_mask:
        in_specs.append(pl.BlockSpec((K, bb), lambda i: (0, i),
                                     memory_space=pltpu.VMEM))
        args.append(masks_t)
    return pl.pallas_call(
        _make_kernel_kmajor(use_mask),
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec((bb, H), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, H), h.dtype),
        interpret=interpret,
    )(*args)


def build(B, K=36, H=512, A=512, dtype=jnp.bfloat16, seed=0):
    """Production shapes: ctx att_feats/p_att are PRE-EMBEDDED to rnn_size
    (models/att_model.encode_features), so H = A = rnn = 512 at reference
    dims; h is the previous hidden state [B, H]."""
    rng = np.random.RandomState(seed)
    h = jnp.asarray(rng.randn(B, H), dtype)
    emb = jnp.asarray(rng.randn(B, K, H) * 0.5, dtype)
    p_att = jnp.asarray(rng.randn(B, K, A) * 0.5, dtype)
    w_h2att = jnp.asarray(rng.randn(H, A) / np.sqrt(H), dtype)
    b_h2att = jnp.asarray(rng.randn(A) * 0.01, dtype)
    w_alpha = jnp.asarray(rng.randn(A, 1) / np.sqrt(A), dtype)
    b_alpha = jnp.float32(0.0)
    return h, emb, p_att, w_h2att, b_h2att, w_alpha, b_alpha


def timeit(fn, iters):
    np.asarray(jax.tree.leaves(fn())[0])  # compile + sync via transfer
    t0 = time.perf_counter()
    out = None
    for _ in range(iters):
        out = fn()
    np.asarray(jax.tree.leaves(out)[0])
    return (time.perf_counter() - t0) / iters


def main():
    from cooperativeimagecaptioning_tpu.ops.pallas.att_step import \
        _attention_pallas, attention_reference
    nums = [a for a in sys.argv[1:] if not a.startswith("-")]
    B = int(nums[0]) if nums else 8192
    iters = int(nums[1]) if len(nums) > 1 else 20
    L = 17  # decode-length steps folded into one jit (dispatch amortized)
    h, emb, p_att, wh, bh, wa, ba = build(B)
    emb_t = jnp.moveaxis(emb, 1, 0)
    p_att_t = jnp.moveaxis(p_att, 1, 0)
    hs = jnp.asarray(np.random.RandomState(1).randn(L, B, h.shape[1]), jnp.bfloat16)

    @jax.jit
    def run_current(hs, emb, p_att):
        def body(c, h):
            o = _attention_pallas(h, emb, p_att, wh, bh, wa, ba, None,
                                  use_mask=False)
            return c + o.astype(jnp.float32).sum(), None
        return jax.lax.scan(body, jnp.float32(0.0), hs)[0]

    @jax.jit
    def run_kmajor(hs, emb_t, p_att_t):
        def body(c, h):
            o = attention_kmajor(h, emb_t, p_att_t, wh, bh, wa, ba, None,
                                 use_mask=False)
            return c + o.astype(jnp.float32).sum(), None
        return jax.lax.scan(body, jnp.float32(0.0), hs)[0]

    @jax.jit
    def run_xla(hs, emb, p_att):
        def body(c, h):
            o = attention_reference(h, emb, p_att, wh, bh, wa, ba, None)
            return c + o.astype(jnp.float32).sum(), None
        return jax.lax.scan(body, jnp.float32(0.0), hs)[0]

    @jax.jit
    def transpose_ctx(emb, p_att):
        return jnp.moveaxis(emb, 1, 0), jnp.moveaxis(p_att, 1, 0)

    res = {"B": B, "K": 36, "L": L, "iters": iters}
    res["current_ms_per_step"] = round(
        timeit(lambda: run_current(hs, emb, p_att), iters) / L * 1e3, 4)
    res["kmajor_ms_per_step"] = round(
        timeit(lambda: run_kmajor(hs, emb_t, p_att_t), iters) / L * 1e3, 4)
    res["xla_ms_per_step"] = round(
        timeit(lambda: run_xla(hs, emb, p_att), iters) / L * 1e3, 4)
    res["transpose_ms"] = round(
        timeit(lambda: transpose_ctx(emb, p_att), iters) * 1e3, 4)
    res["kmajor_vs_current"] = round(
        res["current_ms_per_step"] / res["kmajor_ms_per_step"], 3)
    print(json.dumps(res), flush=True)
    return res


if __name__ == "__main__":
    main()
