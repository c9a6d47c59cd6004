"""Att2in2 speaker: attention captioner used in all three reference training
stages (ref: models/AttModel.py, `--caption_model att2in2`).

Structure (ref: AttModel.py:53-101, 492-540):
  embed:    Embedding(V+2, D) -> ReLU -> Dropout
  fc_embed: identity for att2in2 (AttModel.py:534-540)
  att_embed:[BatchNorm?] Linear(att_feat, H) -> ReLU -> Dropout
  ctx2att:  Linear(H, A) applied once per sequence ("p_att_feats", AttModel.py:114)
  core:     Att2in2Core — maxout LSTM where the attention vector enters only the
            cell-input path via a2c (AttModel.py:521-525)
  logit:    Linear(H, V+1)
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from cooperativeimagecaptioning_tpu.models import layers


def init_params(rng, opt):
    V = opt.vocab_size
    D = opt.input_encoding_size
    H = opt.rnn_size
    A = opt.att_hid_size
    keys = jax.random.split(rng, 8)
    params = {
        "embed": layers.uniform_init(keys[0], (V + 2, D), 0.1),
        "att_embed": layers.linear_init(keys[1], opt.att_feat_size, H),
        "ctx2att": layers.linear_init(keys[2], H, A),
        "core": {
            "a2c": layers.linear_init(keys[3], H, 2 * H),
            "i2h": layers.linear_init(keys[4], D, 5 * H),
            "h2h": layers.linear_init(keys[5], H, 5 * H),
            "attention": layers.attention_init(keys[6], H, A),
        },
        "logit": layers.linear_init(keys[7], H, V + 1),
    }
    if getattr(opt, "use_bn", 0):
        params["att_bn"] = {
            "scale": jnp.ones((opt.att_feat_size,)),
            "bias": jnp.zeros((opt.att_feat_size,)),
            # running statistics (torch BatchNorm1d init): eval/serving
            # normalizes with these, batch-independent; training uses batch
            # stats and EMA-updates them (Trainer.train_iteration ->
            # bn_running_update)
            "mean": jnp.zeros((opt.att_feat_size,)),
            "var": jnp.ones((opt.att_feat_size,)),
        }
    return params


def init_state(params, batch_size: int):
    H = params["core"]["h2h"]["w"].shape[0]
    dtype = params["core"]["h2h"]["w"].dtype
    return (jnp.zeros((batch_size, H), dtype), jnp.zeros((batch_size, H), dtype))


def encode_features(params, fc_feats, att_feats, att_masks, rng=None, train=False,
                    drop_prob: float = 0.0):
    """Embed attention features once per sequence (ref: AttModel.py:108-114).

    The reference's pack_padded machinery (AttModel.py:31-51) only exists to skip
    computing embeddings of padded K positions; here we compute them at full static
    shape (TPU-friendly) and rely on the attention mask — identical math because
    padded positions are renormalized away (AttModel.py:480-483).
    """
    del fc_feats  # att2in2 never uses fc feats (identity fc_embed, unused by core)
    x = att_feats
    if "att_bn" in params:
        # optional BatchNorm1d before the embed Linear (ref: AttModel.py:82-85)
        bn = params["att_bn"]
        if "mean" in bn and not train:
            # running stats (torch-imported checkpoints, or EMA-tracked by
            # training): matches the reference's eval()-mode BN exactly,
            # batch-independent
            mean = bn["mean"]
            var = bn["var"]
        elif att_masks is not None:
            # batch statistics over REAL positions only — the reference's
            # pack_wrapper feeds BN the packed (unpadded) rows
            w = att_masks[..., None]
            n = jnp.maximum(jnp.sum(w), 1.0)
            mean = jnp.sum(x * w, axis=(0, 1), keepdims=True) / n
            var = jnp.sum(jnp.square(x - mean) * w, axis=(0, 1),
                          keepdims=True) / n
        else:
            mean = jnp.mean(x, axis=(0, 1), keepdims=True)
            var = jnp.var(x, axis=(0, 1), keepdims=True)
        x = (x - mean) / jnp.sqrt(var + 1e-5)
        x = x * bn["scale"] + bn["bias"]
    emb = jax.nn.relu(layers.linear(params["att_embed"], x))
    if train and drop_prob > 0.0:
        emb = layers.dropout(rng, emb, drop_prob, deterministic=False)
    p_att = layers.linear(params["ctx2att"], emb)
    return {"att_feats": emb, "p_att_feats": p_att, "att_masks": att_masks}


def kmajor_ctx(ctx):
    """Decode-time K-major context layout (--att_kmajor): one transpose per
    sequence makes every per-step attention block exactly tile-aligned
    (ops/pallas/att_step.py K-major section; measured 1.23x on the isolated
    attention step at K=36, B=8192 on v5e).  Composes like quantize_ctx;
    decode-only — training keeps the b-major layout."""
    return {"att_feats_t": jnp.moveaxis(ctx["att_feats"], 1, 0),
            "p_att_t": jnp.moveaxis(ctx["p_att_feats"], 1, 0),
            # masks stay b-major [B, K] (legal Pallas block; the kernel
            # consumes them in its [BB, K]-minor softmax layout anyway) —
            # NOTE for beam expansion this means axis-0 repeat like b-major
            "att_masks": ctx["att_masks"]}


def bn_running_update(params, att_feats, att_masks, momentum=0.1):
    """EMA-update the att BN running statistics from one batch (torch
    BatchNorm1d train-mode semantics: momentum 0.1, unbiased variance).
    Called by the Trainer once per iteration when use_bn is on and the
    params were initialized from scratch — torch-imported checkpoints also
    track, matching the reference's train()-mode forward."""
    bn = params.get("att_bn")
    if bn is None or "mean" not in bn:
        return params
    x = att_feats
    if att_masks is not None:
        w = att_masks[..., None]
        n = jnp.maximum(jnp.sum(w), 2.0)
        mean = jnp.sum(x * w, axis=(0, 1)) / n
        var = jnp.sum(jnp.square(x - mean) * w, axis=(0, 1)) / n
    else:
        n = jnp.float32(x.shape[0] * x.shape[1])
        mean = jnp.mean(x, axis=(0, 1))
        var = jnp.var(x, axis=(0, 1))
    var_unbiased = var * n / jnp.maximum(n - 1.0, 1.0)
    bn = dict(bn)
    bn["mean"] = (1 - momentum) * bn["mean"] + momentum * mean
    bn["var"] = (1 - momentum) * bn["var"] + momentum * var_unbiased
    out = dict(params)
    out["att_bn"] = bn
    return out


def quantize_ctx(ctx):
    """int8-quantize the per-sequence attention context for decode.

    att_feats/p_att_feats are constant across the ~L decode steps; per-(b,k)-row
    int8 halves their HBM footprint vs bf16 (decode-time opt-in via
    --att_quant int8; training keeps the full-precision ctx).  Measured on v5e:
    throughput-neutral at B=8192 (the fused attention kernel is compute-, not
    bandwidth-bound there) — the win is memory, enabling larger serving batches.
    """
    from cooperativeimagecaptioning_tpu.ops.pallas import att_step
    eq, se, pq, sp = att_step.quantize_features(
        ctx["att_feats"], ctx["p_att_feats"])
    return {"att_feats_q": eq, "att_scale": se,
            "p_att_q": pq, "p_att_scale": sp, "att_masks": ctx["att_masks"]}


def prefix_embeddings(params, ctx, rng=None, train=False):
    """No pre-BOS inputs for the attention model."""
    del params, ctx, rng, train
    return []


def embed_token(params, ids, rng=None, train=False, drop_prob: float = 0.0):
    """Embedding -> ReLU -> Dropout (ref: AttModel.py:74-76)."""
    x = jax.nn.relu(layers.embedding_lookup(params["embed"], ids))
    if train and drop_prob > 0.0:
        x = layers.dropout(rng, x, drop_prob, deterministic=False)
    return x


def embed_soft(params, soft_vec, rng=None, train=False, drop_prob: float = 0.0):
    """Soft-vector embedding: matmul with raw table then relu_dropout
    (ref: AttModel.py:395-397)."""
    x = jax.nn.relu(soft_vec @ params["embed"])
    if train and drop_prob > 0.0:
        x = layers.dropout(rng, x, drop_prob, deterministic=False)
    return x


def step(params, ctx, state, xt, rng=None, train=False, drop_prob: float = 0.0):
    """One Att2in2 step (ref: AttModel.py:510-531).

    Attention is computed from the *previous* hidden state; the attention vector
    enters only the in-transform (cell input) path through a2c.  Dropout here is
    applied to the *output* only — the recurrent state keeps the clean next_h
    (AttModel.py:529-530), unlike FCModel.
    """
    h_prev, c_prev = state
    core = params["core"]
    ap = core["attention"]
    from cooperativeimagecaptioning_tpu.ops.pallas import att_step, cell_step
    if "att_feats_t" in ctx:
        att_res = att_step.fused_attention_kmajor(
            h_prev, ctx["att_feats_t"], ctx["p_att_t"],
            ap["h2att"]["w"], ap["h2att"]["b"],
            ap["alpha_net"]["w"], ap["alpha_net"]["b"], ctx["att_masks"])
    elif "att_feats_q" in ctx:
        att_res = att_step.fused_attention_q(
            h_prev, ctx["att_feats_q"], ctx["att_scale"],
            ctx["p_att_q"], ctx["p_att_scale"],
            ap["h2att"]["w"], ap["h2att"]["b"],
            ap["alpha_net"]["w"], ap["alpha_net"]["b"], ctx["att_masks"])
    else:
        att_res = att_step.fused_attention(
            h_prev, ctx["att_feats"], ctx["p_att_feats"],
            ap["h2att"]["w"], ap["h2att"]["b"],
            ap["alpha_net"]["w"], ap["alpha_net"]["b"], ctx["att_masks"])
    next_h, next_c = cell_step.fused_cell(
        xt, h_prev, c_prev, att_res,
        core["i2h"]["w"], core["i2h"]["b"], core["h2h"]["w"], core["h2h"]["b"],
        core["a2c"]["w"], core["a2c"]["b"])
    out = next_h
    if train and drop_prob > 0.0:
        out = layers.dropout(rng, out, drop_prob, deterministic=False)
    return (next_h, next_c), out


def logits(params, out):
    return layers.linear(params["logit"], out)


TEACHER_FORCING_DROPS_PREFIX_OUTPUT = False
