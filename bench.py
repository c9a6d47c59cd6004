"""Benchmark: captions/sec/chip at beam=1 on the flagship att2in2 speaker.

Reference context: the PyTorch reference decodes with Python per-step loops and
per-batch host<->device copies and publishes no numbers (BASELINE.md); the
driver-set target is >= 5,000 captions/sec/chip at beam=1 on v5e (BASELINE.json
north_star).  vs_baseline reports value / 5000.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np

import jax
import jax.numpy as jnp


def build(batch_size: int, dtype, vocab_size=9487, seq_length=16, K=36):
    from cooperativeimagecaptioning_tpu.config import Options
    from cooperativeimagecaptioning_tpu.models import att_model
    from cooperativeimagecaptioning_tpu.ops import decoding
    from cooperativeimagecaptioning_tpu.training import joint

    opt = Options(caption_model="att2in2", vse_model="None",
                  rnn_size=512, input_encoding_size=512, att_hid_size=512,
                  fc_feat_size=2048, att_feat_size=2048, drop_prob_lm=0.0,
                  batch_size=batch_size, compute_dtype="bfloat16")
    opt.vocab_size = vocab_size
    opt.seq_length = seq_length
    params = joint.init_params(jax.random.PRNGKey(0), opt)
    if dtype != jnp.float32:
        params = jax.tree.map(lambda x: x.astype(dtype)
                              if x.dtype == jnp.float32 else x, params)

    rng = np.random.RandomState(0)
    att = jnp.asarray(rng.randn(batch_size, K, opt.att_feat_size), dtype)
    fc = jnp.asarray(rng.randn(batch_size, opt.fc_feat_size), dtype)

    def decode(params, fc, att):
        sp = joint.speaker_view(params, opt)
        ctx = att_model.encode_features(sp, fc, att, None)
        return decoding.sample(att_model, sp, ctx, opt.seq_length,
                               jax.random.PRNGKey(0), mode="greedy").seq

    return jax.jit(decode), (params, fc, att)


def bench_once(batch_size: int, dtype, iters: int = 10):
    fn, args = build(batch_size, dtype)
    np.asarray(fn(*args))  # compile + warm (host transfer = hard sync; the
    # axon tunnel's block_until_ready is a no-op, so we sync via transfer)
    t0 = time.perf_counter()
    seq = None
    for _ in range(iters):
        seq = fn(*args)
    np.asarray(seq)  # device executes in order; last transfer fences all
    dt = time.perf_counter() - t0
    return batch_size * iters / dt


def bench_beam(batch_size: int, beam_size: int, dtype, iters: int = 5):
    from cooperativeimagecaptioning_tpu.config import Options
    from cooperativeimagecaptioning_tpu.models import att_model
    from cooperativeimagecaptioning_tpu.ops import decoding
    from cooperativeimagecaptioning_tpu.training import joint

    opt = Options(caption_model="att2in2", vse_model="None", rnn_size=512,
                  input_encoding_size=512, att_hid_size=512,
                  fc_feat_size=2048, att_feat_size=2048, drop_prob_lm=0.0)
    opt.vocab_size = 9487
    opt.seq_length = 16
    params = joint.init_params(jax.random.PRNGKey(0), opt)
    if dtype != jnp.float32:
        params = jax.tree.map(lambda x: x.astype(dtype)
                              if x.dtype == jnp.float32 else x, params)
    rng = np.random.RandomState(0)
    att = jnp.asarray(rng.randn(batch_size, 36, 2048), dtype)

    @jax.jit
    def decode(params, att):
        sp = joint.speaker_view(params, opt)
        ctx = att_model.encode_features(sp, None, att, None)
        return decoding.beam_search(att_model, sp, ctx, opt.seq_length,
                                    beam_size).seq

    np.asarray(decode(params, att))
    t0 = time.perf_counter()
    seq = None
    for _ in range(iters):
        seq = decode(params, att)
    np.asarray(seq)
    return batch_size * iters / (time.perf_counter() - t0)


def bench_resnet(batch_size: int = 16, size: int = 448, iters: int = 10):
    from cooperativeimagecaptioning_tpu.preprocess import resnet, feats
    params = resnet.init_params(jax.random.PRNGKey(0), "resnet101")
    run = feats.make_extractor(params)
    x = jnp.asarray(np.random.RandomState(0).rand(batch_size, size, size, 3),
                    jnp.float32)
    np.asarray(run(x)[0])
    t0 = time.perf_counter()
    out = None
    for _ in range(iters):
        out = run(x)
    np.asarray(out[0])
    return batch_size * iters / (time.perf_counter() - t0)


def main():
    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 8192
    extras = "--full" in sys.argv
    dtype = jnp.bfloat16
    platform = jax.devices()[0].platform
    if platform == "cpu":  # CI / local sanity: smaller shapes
        batch = min(batch, 64)
    try:
        best = bench_once(batch, dtype)
    except Exception as e:  # keep the driver run alive on any compile issue
        print(f"bench batch={batch} failed: {e}", file=sys.stderr)
        best = bench_once(max(64, batch // 8), dtype)
    # single config keeps total wall time ~6 min (first compile dominates)
    baseline = 5000.0  # north-star target captions/sec/chip (BASELINE.json)
    out = {
        "metric": "captions_per_sec_per_chip_beam1",
        "value": round(best, 1),
        "unit": "captions/s",
        "vs_baseline": round(best / baseline, 3),
    }
    if extras:
        try:
            out["beam5_captions_per_sec"] = round(
                bench_beam(1024 if platform != "cpu" else 8, 5, dtype), 1)
        except Exception as e:
            print(f"beam bench failed: {e}", file=sys.stderr)
        try:
            out["resnet101_images_per_sec"] = round(bench_resnet(
                16 if platform != "cpu" else 1,
                448 if platform != "cpu" else 64), 1)
        except Exception as e:
            print(f"resnet bench failed: {e}", file=sys.stderr)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
