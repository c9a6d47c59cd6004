"""Beam-search decode profiling: locate where the per-row cost beyond greedy
decode goes (merge/top-k, state gather, beam head vs greedy head, attention).

Context (docs/PERFORMANCE.md): greedy decode at B=8192 runs ~0.244 us/row-step;
beam=5 at B=1024 (5120 rows) measured ~0.53 us/row-step — 2.2x. This script
times ablated variants of the beam scan to attribute the difference:

  greedy_rows    greedy sample at B = rows (per-row floor, fused greedy head)
  beam_full      decoding.beam_search as shipped
  beam_nomerge   beam scan with the merge replaced by a fixed permutation
                 (keeps state gather + embed + core step + beam head)
  beam_nogather  beam_nomerge with the state gather also removed

Usage: python scripts/bench_beam_profile.py [B] [m] [iters]
"""

from __future__ import annotations

import sys
import time

import numpy as np

import jax
import jax.numpy as jnp


def build(batch_size, dtype=jnp.bfloat16, vocab_size=9487, seq_length=16,
          K=36):
    from cooperativeimagecaptioning_tpu.config import Options
    from cooperativeimagecaptioning_tpu.models import att_model
    from cooperativeimagecaptioning_tpu.training import joint

    opt = Options(caption_model="att2in2", vse_model="None", rnn_size=512,
                  input_encoding_size=512, att_hid_size=512,
                  fc_feat_size=2048, att_feat_size=2048, drop_prob_lm=0.0,
                  compute_dtype="bfloat16")
    opt.vocab_size = vocab_size
    opt.seq_length = seq_length
    params = joint.init_params(jax.random.PRNGKey(0), opt)
    params = jax.tree.map(lambda x: x.astype(dtype)
                          if x.dtype == jnp.float32 else x, params)
    rng = np.random.RandomState(0)
    att = jnp.asarray(rng.randn(batch_size, K, 2048), dtype)
    sp = joint.speaker_view(params, opt)
    return att_model, sp, att, opt


def timeit(fn, args, iters):
    out = fn(*args)
    np.asarray(jax.tree.leaves(out)[0])  # compile + sync via transfer
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    np.asarray(jax.tree.leaves(out)[0])
    return (time.perf_counter() - t0) / iters


def beam_ablated(module, params, ctx, seq_length, m, do_merge, do_gather):
    """beam_search with merge and/or state-gather ablated (timing only)."""
    from cooperativeimagecaptioning_tpu.ops import decoding
    from cooperativeimagecaptioning_tpu.ops.pallas import beam_head

    fc_or_att = ctx.get("att_feats", ctx.get("fc_feats"))
    B = fc_or_att.shape[0]
    nclass = params["logit"]["w"].shape[1]
    bos = nclass
    L = seq_length

    ectx = decoding._expand_for_beams(ctx, m)
    state = module.init_state(params, B * m)
    for pe in module.prefix_embeddings(params, ectx):
        state, _ = module.step(params, ectx, state, pe)

    def head(out):
        vals, idx, lse = beam_head.beam_head(
            out, params["logit"]["w"], params["logit"]["b"], m)
        return ((vals - lse[:, None]).reshape(B, m, m),
                idx.reshape(B, m, m))

    xt = module.embed_token(params, jnp.full((B * m,), bos, jnp.int32))
    state, out = module.step(params, ectx, state, xt)
    lp = head(out)
    beam_sum = jnp.full((B, m), decoding.NEG_INF).at[:, 0].set(0.0)

    def body(carry, t):
        state, lp, beam_sum = carry
        top_lp, top_i = lp
        if do_merge:
            cand = beam_sum[:, :, None] + top_lp
            p, flat_idx = jax.lax.top_k(cand.reshape(B, m * m), m)
            q = flat_idx // m
            c = jnp.take_along_axis(top_i.reshape(B, m * m), flat_idx, axis=1)
            beam_sum = p
        else:
            # fixed NON-identity permutation: an iota q would let XLA elide
            # the take_along_axis gathers entirely, under-measuring the
            # state-gather cost this ablation exists to attribute
            q = jnp.broadcast_to((jnp.arange(m)[None, :] + 1) % m, (B, m))
            c = top_i[:, :, 0]
            beam_sum = beam_sum + top_lp[:, :, 0]
        if do_gather:
            def gather_state(x):
                xm = x.reshape((B, m) + x.shape[1:])
                xm = jnp.take_along_axis(
                    xm, q.reshape((B, m) + (1,) * (x.ndim - 1)), axis=1)
                return xm.reshape((B * m,) + x.shape[1:])
            state = jax.tree.map(gather_state, state)
        xt = module.embed_token(params, c.reshape(B * m))
        state, out = module.step(params, ectx, state, xt)
        lp = head(out)
        return (state, lp, beam_sum), None

    (state, lp, beam_sum), _ = jax.lax.scan(
        body, (state, lp, beam_sum), jnp.arange(1, L))
    return lp[0]


def main():
    from cooperativeimagecaptioning_tpu.models import att_model
    from cooperativeimagecaptioning_tpu.ops import decoding

    B = int(sys.argv[1]) if len(sys.argv) > 1 else 1024
    m = int(sys.argv[2]) if len(sys.argv) > 2 else 5
    iters = int(sys.argv[3]) if len(sys.argv) > 3 else 5
    L = 16
    rows = B * m

    module, sp, att, opt = build(B)
    _, sp_rows, att_rows, _ = build(rows)

    def greedy_rows(params, att):
        ctx = att_model.encode_features(params, None, att, None)
        return decoding.sample(att_model, params, ctx, L,
                               jax.random.PRNGKey(0), mode="greedy").seq

    def beam_full(params, att):
        ctx = att_model.encode_features(params, None, att, None)
        return decoding.beam_search(att_model, params, ctx, L, m).seq

    def beam_nomerge(params, att):
        ctx = att_model.encode_features(params, None, att, None)
        return beam_ablated(att_model, params, ctx, L, m,
                            do_merge=False, do_gather=True)

    def beam_nogather(params, att):
        ctx = att_model.encode_features(params, None, att, None)
        return beam_ablated(att_model, params, ctx, L, m,
                            do_merge=False, do_gather=False)

    results = {}
    results["greedy_rows"] = timeit(jax.jit(greedy_rows),
                                    (sp_rows, att_rows), iters)
    for name, fn in [("beam_full", beam_full),
                     ("beam_nomerge", beam_nomerge),
                     ("beam_nogather", beam_nogather)]:
        results[name] = timeit(jax.jit(fn), (sp, att), iters)

    print(f"B={B} m={m} rows={rows} L={L} (times per decode batch)")
    for name, dt in results.items():
        per_row_step = dt / (rows * (L + 1)) * 1e6
        print(f"  {name:14s} {dt * 1e3:8.2f} ms   {per_row_step:6.3f} "
              f"us/row-step   {B / dt:10.0f} captions/s")
    print(f"  merge+topk cost: "
          f"{(results['beam_full'] - results['beam_nomerge']) * 1e3:.2f} ms; "
          f"state-gather cost: "
          f"{(results['beam_nomerge'] - results['beam_nogather']) * 1e3:.2f} ms; "
          f"head/expand overhead vs greedy rows: "
          f"{(results['beam_nogather'] - results['greedy_rows']) * 1e3:.2f} ms")


if __name__ == "__main__":
    main()
