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

import json
import sys
import time

import numpy as np

import jax
import jax.numpy as jnp


from cooperativeimagecaptioning_tpu.ops.pallas.att_step import (  # noqa: E402
    _attention_pallas_kmajor as attention_kmajor)


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
