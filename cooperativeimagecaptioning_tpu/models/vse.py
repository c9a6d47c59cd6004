"""VSE listener: visual-semantic embedding retrieval model (ref: models/VSEFCModel.py).

EncoderImage = Linear(fc_feat, vse_embed) + l2norm (+abs)          (ref :19-54)
EncoderText  = Embedding(V+2, D) + GRU/LSTM + {last,mean,max} pool  (ref :57-140)
ContrastiveLoss = bidirectional hinge ranking w/ hard negatives    (ref :149-207)

The text encoder accepts either integer token ids [B, T] or one-hot/soft inputs
[B, T, V+2] multiplied into the embedding table (ref :102-106) — the differentiable
bridge from the speaker's relaxed samples.

RNN gate layout follows PyTorch (GRU: r,z,n; LSTM: i,f,g,o) so reference checkpoints
convert weight-for-weight.  The reference's pack_padded_sequence machinery is
replaced by a full-length lax.scan + masked pooling — identical outputs because
'last' pooling gathers position len-1 and 'mean'/'max' are explicitly masked.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from cooperativeimagecaptioning_tpu.models import layers


def _rnn_init(rng, in_dim, hid, ngates, dtype=jnp.float32):
    """torch.nn.RNNBase default init: U(-1/sqrt(H), 1/sqrt(H)) everywhere."""
    ks = jax.random.split(rng, 4)
    bound = 1.0 / jnp.sqrt(hid)
    u = lambda k, shape: jax.random.uniform(k, shape, dtype, -bound, bound)
    return {
        "w_ih": u(ks[0], (in_dim, ngates * hid)),
        "w_hh": u(ks[1], (hid, ngates * hid)),
        "b_ih": u(ks[2], (ngates * hid,)),
        "b_hh": u(ks[3], (ngates * hid,)),
    }


def init_params(rng, opt):
    V = opt.vocab_size
    D = opt.input_encoding_size
    E = opt.vse_embed_size
    k_img_w, k_emb, k_rnn = jax.random.split(rng, 3)
    # EncoderImage Xavier init (ref VSEFCModel.py:32-38)
    r = jnp.sqrt(6.0) / jnp.sqrt(opt.fc_feat_size + E)
    img_fc = {
        "w": jax.random.uniform(k_img_w, (opt.fc_feat_size, E), jnp.float32, -r, r),
        "b": jnp.zeros((E,)),
    }
    rnn_type = opt.vse_rnn_type.lower()
    ngates = {"gru": 3, "lstm": 4}[rnn_type]
    return {
        "img_enc": {"fc": img_fc},
        "txt_enc": {
            "embed": layers.uniform_init(k_emb, (V + 2, D), 0.1),
            "rnn": _rnn_init(k_rnn, D, E, ngates),
        },
    }


def gru_step(p, h, x):
    """PyTorch GRUCell math, gate order (r, z, n)."""
    H = h.shape[-1]
    gi = x @ p["w_ih"] + p["b_ih"]
    gh = h @ p["w_hh"] + p["b_hh"]
    r = jax.nn.sigmoid(gi[:, :H] + gh[:, :H])
    z = jax.nn.sigmoid(gi[:, H:2 * H] + gh[:, H:2 * H])
    n = jnp.tanh(gi[:, 2 * H:] + r * gh[:, 2 * H:])
    return (1.0 - z) * n + z * h


def lstm_step(p, state, x):
    """PyTorch LSTMCell math, gate order (i, f, g, o)."""
    h, c = state
    H = h.shape[-1]
    g = x @ p["w_ih"] + p["b_ih"] + h @ p["w_hh"] + p["b_hh"]
    i = jax.nn.sigmoid(g[:, :H])
    f = jax.nn.sigmoid(g[:, H:2 * H])
    gg = jnp.tanh(g[:, 2 * H:3 * H])
    o = jax.nn.sigmoid(g[:, 3 * H:])
    c = f * c + i * gg
    h_new = o * jnp.tanh(c)
    return (h_new, c), h_new


def encode_image(params, opt, fc_feats):
    """ref VSEFCModel.py:40-54."""
    feats = layers.linear(params["img_enc"]["fc"], fc_feats)
    if not opt.vse_no_imgnorm:
        feats = layers.l2norm(feats)
    if opt.vse_use_abs:
        feats = jnp.abs(feats)
    return feats


def encode_text(params, opt, seqs, masks):
    """ref VSEFCModel.py:95-140.  seqs: [B, T] int ids or [B, T, V+2] soft."""
    table = params["txt_enc"]["embed"]
    if seqs.ndim > 2:
        emb = seqs @ table  # one-hot/soft path (ref :102-106)
    else:
        emb = layers.embedding_lookup(table, seqs)
    B, T = emb.shape[0], emb.shape[1]
    E = opt.vse_embed_size
    p = params["txt_enc"]["rnn"]
    rnn_type = opt.vse_rnn_type.lower()

    if rnn_type == "gru":
        def body(h, x):
            h = gru_step(p, h, x)
            return h, h
        _, outs = jax.lax.scan(body, jnp.zeros((B, E), emb.dtype),
                               jnp.moveaxis(emb, 1, 0))
    else:  # lstm
        def body(state, x):
            state, out = lstm_step(p, state, x)
            return state, out
        init = (jnp.zeros((B, E), emb.dtype), jnp.zeros((B, E), emb.dtype))
        _, outs = jax.lax.scan(body, init, jnp.moveaxis(emb, 1, 0))
    outs = jnp.moveaxis(outs, 0, 1)  # [B, T, E]

    lens = jnp.sum((masks > 0).astype(jnp.int32), axis=1)  # (ref :84)
    pool = getattr(opt, "vse_pool_type", "last")
    fmask = masks.astype(outs.dtype)
    if pool == "mean":
        out = jnp.sum(outs * fmask[:, :T, None], axis=1) / \
            jnp.sum(fmask, axis=1, keepdims=True)
    elif pool == "max":
        out = jnp.max(outs * fmask[:, :T, None] +
                      (fmask[:, :T, None] == 0) * -1e10, axis=1)
    else:  # 'last': output at position len-1 (ref :116-129)
        idx = jnp.clip(lens - 1, 0, T - 1)
        out = jnp.take_along_axis(outs, idx[:, None, None], axis=1)[:, 0]
    out = layers.l2norm(out)
    if opt.vse_use_abs:
        out = jnp.abs(out)
    return out


def contrastive_loss(im, s, margin, max_violation, whole_batch=False,
                     only_one_retrieval="off"):
    """Bidirectional hinge ranking loss with hard-negative max (ref :149-207).

    im, s: [B, E].  Returns a scalar (whole_batch=False) or per-sample costs [B].
    """
    scores = im @ s.T  # cosine_sim (inputs already l2-normalized; ref :143-146)
    diag = jnp.diagonal(scores)[:, None]
    cost_s = jnp.clip(margin + scores - diag, 0.0, None)       # caption retrieval
    cost_im = jnp.clip(margin + scores - diag.T, 0.0, None)    # image retrieval
    eye = jnp.eye(scores.shape[0], dtype=bool)
    cost_s = jnp.where(eye, 0.0, cost_s)
    cost_im = jnp.where(eye, 0.0, cost_im)
    if isinstance(max_violation, (bool, int, float)):
        # static flag: single reduction, bit-identical to the reference branch
        if max_violation:
            cost_s = jnp.max(cost_s, axis=1)
            cost_im = jnp.max(cost_im, axis=0)
        else:
            cost_s = jnp.mean(cost_s, axis=1)
            cost_im = jnp.mean(cost_im, axis=0)
    else:
        # traced weight (mean-hinge warm-up, schedules.vse_max_violation_w):
        # blend the two O(B^2) reductions so the switch never recompiles;
        # at w exactly 0.0/1.0 the blend is bit-identical to either branch
        w = jnp.asarray(max_violation, cost_s.dtype)
        cost_s = w * jnp.max(cost_s, axis=1) + \
            (1.0 - w) * jnp.mean(cost_s, axis=1)
        cost_im = w * jnp.max(cost_im, axis=0) + \
            (1.0 - w) * jnp.mean(cost_im, axis=0)
    fn = (lambda x: x) if whole_batch else jnp.sum
    if only_one_retrieval == "image":
        return fn(cost_im)
    if only_one_retrieval == "caption":
        return fn(cost_s)
    return fn(cost_s) + fn(cost_im)


def forward(params, opt, fc_feats, att_feats, seqs, masks, whole_batch=False,
            only_one_retrieval="off", max_violation_w=None):
    """ref VSEFCModel.py:230-241 (att_feats unused, kept for signature parity).

    max_violation_w: optional traced hinge weight (mean-hinge warm-up,
    schedules.vse_max_violation_w); None = the static opt.vse_max_violation."""
    del att_feats
    img_emb = encode_image(params, opt, fc_feats)
    cap_emb = encode_text(params, opt, seqs, masks)
    mv = opt.vse_max_violation if max_violation_w is None else max_violation_w
    return contrastive_loss(img_emb, cap_emb, opt.vse_margin,
                            mv, whole_batch, only_one_retrieval)
