"""Functional building blocks shared by all models.

Parameters are plain nested dicts of jnp arrays (pytrees) — no framework classes —
so per-agent partitioning (speaker/listener subtrees), sharding annotation, and
stop_gradient turn rules stay trivial.

Weight layout convention: Linear params are {'w': [in, out], 'b': [out]} and apply is
`x @ w + b`.  (PyTorch stores [out, in]; checkpoint converters transpose.)
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def linear_init(rng, in_dim: int, out_dim: int, dtype=jnp.float32):
    """torch.nn.Linear default init: U(-1/sqrt(in), 1/sqrt(in)) for w and b."""
    k_w, k_b = jax.random.split(rng)
    bound = 1.0 / jnp.sqrt(in_dim)
    return {
        "w": jax.random.uniform(k_w, (in_dim, out_dim), dtype, -bound, bound),
        "b": jax.random.uniform(k_b, (out_dim,), dtype, -bound, bound),
    }


def linear(params, x):
    return x @ params["w"] + params["b"]


def uniform_init(rng, shape, scale: float, dtype=jnp.float32):
    return jax.random.uniform(rng, shape, dtype, -scale, scale)


def embedding_lookup(table, ids):
    return jnp.take(table, ids, axis=0)


def l2norm(x, axis=-1, eps=1e-7):
    """L2-normalize rows; additive eps matches ref VSEFCModel.py:12-17."""
    return x / (jnp.linalg.norm(x, axis=axis, keepdims=True) + eps)


def dropout(rng, x, rate: float, deterministic: bool):
    """Inverted dropout (torch semantics: scale by 1/(1-p) at train time)."""
    if deterministic or rate == 0.0:
        return x
    keep = 1.0 - rate
    mask = jax.random.bernoulli(rng, keep, x.shape)
    return jnp.where(mask, x / keep, 0.0).astype(x.dtype)


def maxout_lstm_gates(all_input_sums, c_prev, rnn_size: int):
    """Shared maxout-LSTM gate math (ref: FCModel.py:26-42, AttModel.py:514-527).

    all_input_sums: [B, 5H] fused projection (i2h(x) + h2h(h)); chunks are
    [in, forget, out] sigmoid gates then two in-transform halves combined by max.
    Returns (next_h_pre_dropout, next_c).
    """
    sig = jax.nn.sigmoid(all_input_sums[:, : 3 * rnn_size])
    in_gate = sig[:, :rnn_size]
    forget_gate = sig[:, rnn_size: 2 * rnn_size]
    out_gate = sig[:, 2 * rnn_size: 3 * rnn_size]
    in_transform = jnp.maximum(
        all_input_sums[:, 3 * rnn_size: 4 * rnn_size],
        all_input_sums[:, 4 * rnn_size: 5 * rnn_size],
    )
    next_c = forget_gate * c_prev + in_gate * in_transform
    next_h = out_gate * jnp.tanh(next_c)
    return next_h, next_c


def additive_attention(att_params, h, att_feats, p_att_feats, att_masks):
    """Additive attention (ref: AttModel.py:456-489 `Attention`).

    h:           [B, H] hidden state
    att_feats:   [B, K, H] embedded attention features
    p_att_feats: [B, K, A] pre-projected attention features (ctx2att output)
    att_masks:   [B, K] float mask or None
    Returns [B, H] attention-weighted context.

    Masking semantics match the reference exactly: softmax over the full padded
    row, multiply by the mask, renormalize (AttModel.py:480-483) — NOT -inf masking.

    Delegates to ops.pallas.att_step.attention_reference — the SINGLE source
    of the attention math, which is also the fused kernel's fallback and
    test oracle (keeping two copies let them drift).
    """
    from cooperativeimagecaptioning_tpu.ops.pallas import att_step
    return att_step.attention_reference(
        h, att_feats, p_att_feats,
        att_params["h2att"]["w"], att_params["h2att"]["b"],
        att_params["alpha_net"]["w"], att_params["alpha_net"]["b"],
        att_masks)


def attention_init(rng, rnn_size: int, att_hid_size: int, dtype=jnp.float32):
    k1, k2 = jax.random.split(rng)
    return {
        "h2att": linear_init(k1, rnn_size, att_hid_size, dtype),
        "alpha_net": linear_init(k2, att_hid_size, 1, dtype),
    }
