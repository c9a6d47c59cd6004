#!/usr/bin/env python3
"""Does fusing K training steps into one lax.scan beat per-step dispatch?

Measures the phase-2 MLE step (att2in2, vocab 9487, rnn 512, K=36) at full
protocol dims under the device-feature-cache regime (features gathered on
device by index, as `Trainer._prepare_batch` does with
`--device_feature_cache 1`) two ways:

  A. the production shape: one jitted (gather + grad + guarded update) per
     iteration, dispatched from a Python loop (async dispatch pipelines);
  B. one jitted lax.scan over K iterations with stacked index/label batches
     (one dispatch per K steps).

If B wins >20% (the tunnel noise floor, CLAUDE.md) a `--fused_steps` Trainer
tier is worth building; if not, this records the negative result the same
way scripts/bench_beam_profile.py records the beam dead-ends.

Usage: python scripts/bench_fused_steps.py [batch] [K] [iters]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp


def build(batch=128, n_images=2048, mode="mle"):
    from cooperativeimagecaptioning_tpu.config import Options
    from cooperativeimagecaptioning_tpu.training import joint
    from cooperativeimagecaptioning_tpu.training.optim import (
        OptimizerManager, guarded_update, agents_to_update)

    kw = dict(caption_model="att2in2", vse_model="fc", batch_size=batch,
              rnn_size=512, input_encoding_size=512, att_hid_size=512,
              fc_feat_size=2048, att_feat_size=2048, vse_embed_size=1024,
              drop_prob_lm=0.5, seq_per_img=1, use_att=True, max_att_len=36,
              remat=1)
    if mode == "mle":
        opt = Options(phase=2, caption_loss_weight=1, vse_loss_weight=0, **kw)
        turn = "optimizer"
    else:
        opt = Options(phase=3, is_alternating=1,
                      alternating_turn=["speaker", "listener"],
                      retrieval_reward="gumbel", retrieval_reward_weight=0.01,
                      cider_optimization=0.99, caption_loss_weight=1,
                      vse_loss_weight=0.1, on_device_cider=1, **kw)
        turn = "speaker"
    opt.vocab_size = 9487
    opt.seq_length = 16

    params = joint.init_params(jax.random.PRNGKey(0), opt)
    optim = OptimizerManager(opt, params)
    hp = joint.Hyper.from_opt(opt)
    agents = tuple(a for a in agents_to_update(opt, turn) if a in params)

    rng = np.random.RandomState(0)
    B, K, L = batch, 36, 16
    # HBM-resident feature cache (what --device_feature_cache 1 builds)
    cache = {
        "fc": jnp.asarray(rng.randn(n_images, 2048), jnp.float32),
        "att": jnp.asarray(rng.randn(n_images, K, 2048), jnp.bfloat16),
        "att_mask": jnp.ones((n_images, K), jnp.float32),
    }

    def make_host_batch(i):
        r = np.random.RandomState(1000 + i)
        idx = r.randint(0, n_images, (B,)).astype(np.int32)
        labels = np.concatenate(
            [np.zeros((B, 1)), r.randint(1, 9488, (B, L)),
             np.zeros((B, 1))], 1).astype(np.int32)
        masks = np.ones((B, L + 2), np.float32)
        out = dict(idx=idx, labels=labels, masks=masks)
        if mode != "mle":
            from cooperativeimagecaptioning_tpu.rewards import ngram_device
            gts = [r.randint(1, 9488, (5, L)) for _ in range(B)]
            refs, ref_mask = ngram_device.pad_gts(gts, seq_length=L)
            out["refs"], out["ref_mask"] = np.asarray(refs), np.asarray(ref_mask)
        return out

    modules = None  # closed over inside joint.loss_fn via make wrappers

    def batch_from(cache, hb):
        b = {"fc_feats": jnp.take(cache["fc"], hb["idx"], axis=0),
             "att_feats": jnp.take(cache["att"], hb["idx"], axis=0)
                 .astype(jnp.float32),
             "att_masks": jnp.take(cache["att_mask"], hb["idx"], axis=0),
             "labels": hb["labels"], "masks": hb["masks"]}
        if "refs" in hb:
            b["refs"], b["ref_mask"] = hb["refs"], hb["ref_mask"]
        return b

    from cooperativeimagecaptioning_tpu import models as model_zoo
    mods = {"speaker": model_zoo.setup(opt, opt.caption_model,
                                       "caption_model")}

    def grad_fn(p, b, key, reward):
        def lf(pp):
            return joint.loss_fn(mods, pp, opt, b, key, hp, turn, reward)
        (loss, aux), grads = jax.value_and_grad(lf, has_aux=True)(p)
        return loss, grads

    reward0 = jnp.zeros((B,), jnp.float32)

    @jax.jit
    def step_once(p, states, cache, hb, key):
        b = batch_from(cache, hb)
        loss, grads = grad_fn(p, b, key, reward0)
        p, states, ok = guarded_update(optim.txs, p, grads, states, agents)
        return p, states, loss

    @jax.jit
    def step_scan(p, states, cache, stacked, key0):
        def body(carry, hb):
            p, states = carry
            key = jax.random.fold_in(key0, hb["_i"])
            b = batch_from(cache, {k: v for k, v in hb.items() if k != "_i"})
            loss, grads = grad_fn(p, b, key, reward0)
            p, states, ok = guarded_update(optim.txs, p, grads, states, agents)
            return (p, states), loss
        (p, states), losses = jax.lax.scan(body, (p, states), stacked)
        return p, states, losses[-1]

    return dict(params=params, optim=optim, cache=cache,
                make_host_batch=make_host_batch, step_once=step_once,
                step_scan=step_scan, mode=mode)


def run_fused(batch=128, fuse_k=20, iters=60, mode="mle"):
    """Fused-scan throughput only (it/s) — the driver bench's
    train_mle_fused_it_per_s metric (bench.py): compiles just the K-step scan
    program, then times whole chunks including the stacked host transfers."""
    ctx = build(batch=batch, mode=mode)
    key = jax.random.PRNGKey(0)
    host_batches = [ctx["make_host_batch"](i) for i in range(iters)]
    n_chunks = max(1, iters // fuse_k)

    def stack(chunk):
        out = {k: jnp.asarray(np.stack([hb[k] for hb in chunk]))
               for k in chunk[0]}
        out["_i"] = jnp.arange(len(chunk), dtype=jnp.int32)
        return out

    p, states = ctx["params"], ctx["optim"].states
    st0 = stack(host_batches[:fuse_k])
    p1, s1, loss = ctx["step_scan"](p, states, ctx["cache"], st0, key)
    np.asarray(loss)  # compile + sync
    t0 = time.perf_counter()
    for c in range(n_chunks):
        st = stack(host_batches[(c * fuse_k) % iters:
                                (c * fuse_k) % iters + fuse_k])
        key = jax.random.fold_in(key, 10_000 + c)
        p, states, loss = ctx["step_scan"](p, states, ctx["cache"], st, key)
    np.asarray(loss)
    return n_chunks * fuse_k / (time.perf_counter() - t0)


def run(batch=128, fuse_k=20, iters=60, mode="mle"):
    ctx = build(batch=batch, mode=mode)
    params, optim, cache = ctx["params"], ctx["optim"], ctx["cache"]
    key = jax.random.PRNGKey(0)

    host_batches = [ctx["make_host_batch"](i) for i in range(iters)]

    # --- A: per-step dispatch -------------------------------------------------
    p, states = params, optim.states
    hb0 = {k: jnp.asarray(v) for k, v in host_batches[0].items()}
    t0 = time.time()
    p, states, loss = ctx["step_once"](p, states, cache, hb0, key)
    np.asarray(loss)
    print(f"per-step compile {time.time()-t0:.1f}s")
    t0 = time.perf_counter()
    for i in range(iters):
        hb = {k: jnp.asarray(v) for k, v in host_batches[i].items()}
        key = jax.random.fold_in(key, i)
        p, states, loss = ctx["step_once"](p, states, cache, hb, key)
    np.asarray(loss)
    dt_a = time.perf_counter() - t0
    print(f"A per-step: {iters/dt_a:.2f} it/s ({dt_a/iters*1e3:.1f} ms/it), "
          f"loss {float(loss):.3f}")

    # --- B: fused scan ----------------------------------------------------------
    p, states = params, optim.states
    n_chunks = iters // fuse_k

    def stack(chunk):
        out = {k: jnp.asarray(np.stack([hb[k] for hb in chunk]))
               for k in chunk[0]}
        out["_i"] = jnp.arange(len(chunk), dtype=jnp.int32)
        return out

    st0 = stack(host_batches[:fuse_k])
    t0 = time.time()
    p, states, loss = ctx["step_scan"](p, states, cache, st0, key)
    np.asarray(loss)
    print(f"fused compile {time.time()-t0:.1f}s")
    p, states = params, optim.states
    t0 = time.perf_counter()
    for c in range(n_chunks):
        st = stack(host_batches[c*fuse_k:(c+1)*fuse_k])
        key = jax.random.fold_in(key, 10_000 + c)
        p, states, loss = ctx["step_scan"](p, states, cache, st, key)
    np.asarray(loss)
    dt_b = time.perf_counter() - t0
    n = n_chunks * fuse_k
    print(f"B fused(K={fuse_k}): {n/dt_b:.2f} it/s ({dt_b/n*1e3:.1f} ms/it), "
          f"loss {float(loss):.3f}")
    print(f"speedup B/A: {dt_a/iters/(dt_b/n):.2f}x")


if __name__ == "__main__":
    b = int(sys.argv[1]) if len(sys.argv) > 1 else 128
    k = int(sys.argv[2]) if len(sys.argv) > 2 else 20
    it = int(sys.argv[3]) if len(sys.argv) > 3 else 60
    mode = sys.argv[4] if len(sys.argv) > 4 else "mle"
    run(batch=b, fuse_k=k, iters=it, mode=mode)
