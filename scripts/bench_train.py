#!/usr/bin/env python3
"""Training-throughput benchmark at reference dimensions (not the driver bench).

Measures the jitted phase-2 MLE step and the joint gumbel+on-device-cider step
(att2in2, vocab 9487, rnn 512, K=36) at a given batch size on the current
device.  The reference trains batch 128 on one GPU with per-iteration wall-clock
prints only (train.py:211-216)."""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp


def run(batch=128, iters=10, mode="mle"):
    from cooperativeimagecaptioning_tpu.config import Options
    from cooperativeimagecaptioning_tpu.training import joint
    from cooperativeimagecaptioning_tpu.training.optim import OptimizerManager

    kw = dict(caption_model="att2in2", vse_model="fc", batch_size=batch,
              rnn_size=512, input_encoding_size=512, att_hid_size=512,
              fc_feat_size=2048, att_feat_size=2048, vse_embed_size=1024,
              drop_prob_lm=0.5, seq_per_img=1, use_att=True, max_att_len=36)
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
    _, grad_fn = joint.make_step_fns(opt, turn)
    hp = joint.Hyper.from_opt(opt)

    rng = np.random.RandomState(0)
    B, K, L = batch, 36, 16
    batch_arrays = {
        "fc_feats": jnp.asarray(rng.randn(B, 2048), jnp.float32),
        "att_feats": jnp.asarray(rng.randn(B, K, 2048), jnp.float32),
        "att_masks": jnp.ones((B, K), jnp.float32),
        "labels": jnp.asarray(np.concatenate(
            [np.zeros((B, 1)), rng.randint(1, 9488, (B, L)),
             np.zeros((B, 1))], 1), jnp.int32),
        "masks": jnp.ones((B, L + 2), jnp.float32),
    }
    if mode != "mle":
        from cooperativeimagecaptioning_tpu.rewards import ngram_device
        gts = [rng.randint(1, 9488, (5, L)) for _ in range(B)]
        batch_arrays["refs"], batch_arrays["ref_mask"] = \
            ngram_device.pad_gts(gts, seq_length=L)
    reward = jnp.zeros((B,), jnp.float32)

    def one(i, p):
        # thread the UPDATED params through: step i+1 must depend on step i
        # (grads on stale params would let the device overlap iterations and
        # overstate serialized training throughput)
        key = jax.random.PRNGKey(i)
        (loss, aux), grads = grad_fn(p, batch_arrays, key, hp, reward)
        return optim.step(p, grads, turn), loss

    t0 = time.time()
    p, loss = one(0, params)
    np.asarray(loss)
    compile_s = time.time() - t0
    t0 = time.perf_counter()
    for i in range(iters):
        p, loss = one(i + 1, p)
    np.asarray(loss)
    dt = time.perf_counter() - t0
    print(f"{mode} B={batch}: {iters / dt:.2f} it/s = "
          f"{batch * iters / dt:.0f} captions/s trained "
          f"(compile {compile_s:.0f}s, loss {float(loss):.3f})")
    return batch * iters / dt


if __name__ == "__main__":
    b = int(sys.argv[1]) if len(sys.argv) > 1 else 128
    run(batch=b, mode="mle")
    run(batch=b, mode="joint")
