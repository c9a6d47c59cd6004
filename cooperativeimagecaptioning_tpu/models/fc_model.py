"""FCModel speaker: show-tell maxout-LSTM captioner (ref: models/FCModel.py).

Token conventions (ref: FCModel.py:61-62): 0 = EOS/pad, 1..V = words, V+1 = BOS.
Embedding table has V+2 rows; logit layer emits V+1 classes.

The image fc feature is fed as the step-0 input through `img_embed`
(ref: FCModel.py:97-99) — exposed here as one `prefix` step so the generic
lax.scan decoders in ops/decoding.py treat FC and Att models uniformly.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from cooperativeimagecaptioning_tpu.models import layers


def init_params(rng, opt):
    V = opt.vocab_size
    D = opt.input_encoding_size
    H = opt.rnn_size
    k_img, k_i2h, k_h2h, k_emb, k_logit_w = jax.random.split(rng, 5)
    params = {
        "img_embed": layers.linear_init(k_img, opt.fc_feat_size, D),
        "core": {
            "i2h": layers.linear_init(k_i2h, D, 5 * H),
            "h2h": layers.linear_init(k_h2h, H, 5 * H),
        },
        # init_weights (ref: FCModel.py:74-78): U(-0.1, 0.1) embed + logit w, 0 bias
        "embed": layers.uniform_init(k_emb, (V + 2, D), 0.1),
        "logit": {
            "w": layers.uniform_init(k_logit_w, (H, V + 1), 0.1),
            "b": jnp.zeros((V + 1,)),
        },
    }
    return params


def init_state(params, batch_size: int):
    H = params["core"]["h2h"]["w"].shape[0]
    dtype = params["core"]["h2h"]["w"].dtype
    return (jnp.zeros((batch_size, H), dtype), jnp.zeros((batch_size, H), dtype))


def encode_features(params, fc_feats, att_feats, att_masks, rng=None, train=False,
                    drop_prob: float = 0.0):
    """FC model ignores attention features; context is just the fc feats."""
    del att_feats, att_masks, rng, train, drop_prob
    return {"fc_feats": fc_feats}


def prefix_embeddings(params, ctx, rng=None, train=False):
    """Inputs consumed before the BOS step: the embedded image (FCModel.py:97-99)."""
    del rng, train
    return [layers.linear(params["img_embed"], ctx["fc_feats"])]


def embed_token(params, ids, rng=None, train=False, drop_prob: float = 0.0):
    """Hard token embedding — plain lookup, no relu/dropout (FCModel.py:61,119)."""
    del rng, train, drop_prob
    return layers.embedding_lookup(params["embed"], ids)


def embed_soft(params, soft_vec, rng=None, train=False, drop_prob: float = 0.0):
    """Soft/one-hot embedding path ([B, V+2] @ E)."""
    del rng, train, drop_prob
    return soft_vec @ params["embed"]


def step(params, ctx, state, xt, rng=None, train=False, drop_prob: float = 0.0):
    """One maxout-LSTM step (ref: FCModel.py LSTMCore.forward:24-43).

    Returns (new_state, output) where output feeds the logit layer.  NOTE the
    reference applies dropout to next_h *before* storing it in the recurrent
    state (FCModel.py:39-42), so the dropped activation propagates — reproduced.
    """
    h_prev, c_prev = state
    core = params["core"]
    from cooperativeimagecaptioning_tpu.ops.pallas import cell_step
    next_h, next_c = cell_step.fused_cell(
        xt, h_prev, c_prev, None,
        core["i2h"]["w"], core["i2h"]["b"], core["h2h"]["w"], core["h2h"]["b"],
        None, None)
    if train and drop_prob > 0.0:
        next_h = layers.dropout(rng, next_h, drop_prob, deterministic=False)
    return (next_h, next_c), next_h


def logits(params, out):
    return layers.linear(params["logit"], out)


# Teacher-forced training consumes labels[:, :-1] starting at column 0 (which the
# data layer zero-pads), and the image prefix output is *discarded* from the loss
# (ref: FCModel.py:125-127 drops outputs[0]).
TEACHER_FORCING_DROPS_PREFIX_OUTPUT = True
