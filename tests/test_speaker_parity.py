"""Numerical parity of the JAX speaker models against the reference (torch oracle).

Covers: maxout-LSTM core step, Att2in2 core step (+attention, masked and unmasked),
and full greedy decode ID bit-match for both FCModel and Att2in2Model
(BASELINE.json north-star config 1)."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from cooperativeimagecaptioning_tpu.config import Options
from cooperativeimagecaptioning_tpu.models import fc_model, att_model
from cooperativeimagecaptioning_tpu.ops import decoding

torch = pytest.importorskip("torch")

from ref_bridge import load_reference, torch_linear_to_jax  # noqa: E402

REF = load_reference()


def small_opt(**kw):
    defaults = dict(vocab_size=23, input_encoding_size=20, rnn_size=24,
                    att_hid_size=12, fc_feat_size=32, att_feat_size=32,
                    drop_prob_lm=0.0, seq_length=16, num_layers=1,
                    rnn_type="lstm", caption_model="fc", vse_model="fc",
                    gumbel_temp=10.0, multinomial_temp=1.0,
                    retrieval_reward="gumbel")
    defaults.update(kw)
    opt = Options()
    for k, v in defaults.items():
        setattr(opt, k, v)
    return opt


class NS:
    """Attribute bag for constructing reference torch modules."""

    def __init__(self, opt):
        for k, v in vars(opt).items():
            setattr(self, k, v)


def copy_fc_weights(tm, params):
    """Copy reference FCModel weights into our param tree."""
    params = dict(params)
    params["img_embed"] = torch_linear_to_jax(tm.img_embed)
    params["core"] = {"i2h": torch_linear_to_jax(tm.core.i2h),
                      "h2h": torch_linear_to_jax(tm.core.h2h)}
    params["embed"] = np.asarray(tm.embed.weight.detach().numpy())
    params["logit"] = torch_linear_to_jax(tm.logit)
    return jax.tree.map(jnp.asarray, params)


def copy_att_weights(tm, params):
    params = dict(params)
    params["embed"] = np.asarray(tm.embed[0].weight.detach().numpy())
    params["att_embed"] = torch_linear_to_jax(tm.att_embed[0])
    params["ctx2att"] = torch_linear_to_jax(tm.ctx2att)
    params["logit"] = torch_linear_to_jax(tm.logit)
    params["core"] = {
        "a2c": torch_linear_to_jax(tm.core.a2c),
        "i2h": torch_linear_to_jax(tm.core.i2h),
        "h2h": torch_linear_to_jax(tm.core.h2h),
        "attention": {
            "h2att": torch_linear_to_jax(tm.core.attention.h2att),
            "alpha_net": torch_linear_to_jax(tm.core.attention.alpha_net),
        },
    }
    return jax.tree.map(jnp.asarray, params)


def test_lstm_core_step_parity():
    opt = small_opt()
    torch.manual_seed(0)
    tcore = REF["FCModel"].LSTMCore(NS(opt)).eval()
    params = fc_model.init_params(jax.random.PRNGKey(0), opt)
    params["core"] = {"i2h": jax.tree.map(jnp.asarray, torch_linear_to_jax(tcore.i2h)),
                      "h2h": jax.tree.map(jnp.asarray, torch_linear_to_jax(tcore.h2h))}

    B, D, H = 5, opt.input_encoding_size, opt.rnn_size
    rng = np.random.RandomState(1)
    xt = rng.randn(B, D).astype(np.float32)
    h0 = rng.randn(B, H).astype(np.float32)
    c0 = rng.randn(B, H).astype(np.float32)

    with torch.no_grad():
        t_out, (t_h, t_c) = tcore(
            torch.from_numpy(xt),
            (torch.from_numpy(h0)[None], torch.from_numpy(c0)[None]))
    (j_h, j_c), j_out = fc_model.step(
        params, {}, (jnp.asarray(h0), jnp.asarray(c0)), jnp.asarray(xt))
    np.testing.assert_allclose(np.asarray(j_out), t_out.numpy(), atol=1e-5)
    np.testing.assert_allclose(np.asarray(j_c), t_c[0].numpy(), atol=1e-5)


@pytest.mark.parametrize("use_masks", [False, True])
def test_att2in2_core_step_parity(use_masks):
    opt = small_opt(caption_model="att2in2")
    torch.manual_seed(0)
    tm = REF["AttModel"].Att2in2Model(NS(opt)).eval()
    params = att_model.init_params(jax.random.PRNGKey(0), opt)
    params = copy_att_weights(tm, params)

    B, K = 4, 7
    rng = np.random.RandomState(2)
    att = rng.randn(B, K, opt.att_feat_size).astype(np.float32)
    h0 = rng.randn(B, opt.rnn_size).astype(np.float32)
    c0 = rng.randn(B, opt.rnn_size).astype(np.float32)
    xt = rng.randn(B, opt.input_encoding_size).astype(np.float32)
    if use_masks:
        # like the batcher, at least one row spans the full padded K
        masks = np.zeros((B, K), np.float32)
        masks[0, :] = 1.0
        for i in range(1, B):
            masks[i, : rng.randint(2, K + 1)] = 1.0
    else:
        masks = None

    with torch.no_grad():
        t_att = torch.from_numpy(att)
        t_masks = torch.from_numpy(masks) if use_masks else None
        emb = REF["AttModel"].pack_wrapper(tm.att_embed, t_att, t_masks)
        p_att = tm.ctx2att(emb)
        t_out, (t_h, t_c) = tm.core(
            torch.from_numpy(xt), None, emb, p_att, t_masks,
            (torch.from_numpy(h0)[None], torch.from_numpy(c0)[None]))

    ctx = att_model.encode_features(
        params, None, jnp.asarray(att),
        jnp.asarray(masks) if use_masks else None)
    (j_h, j_c), j_out = att_model.step(
        params, ctx, (jnp.asarray(h0), jnp.asarray(c0)), jnp.asarray(xt))
    if use_masks:
        # reference zeroes embeddings at padded K positions via packing; ours
        # computes them but attention renormalizes them away — compare outputs only
        pass
    np.testing.assert_allclose(np.asarray(j_out), t_out.numpy(), atol=1e-5)
    np.testing.assert_allclose(np.asarray(j_c), t_c[0].numpy(), atol=1e-5)


def _greedy_ref_fc(tm, fc):
    with torch.no_grad():
        seq, logp = tm.sample(torch.from_numpy(fc), None, None,
                              {"sample_max": 1, "beam_size": 1})
    return seq.numpy(), logp.numpy()


def test_fc_greedy_decode_bitmatch():
    """North-star config 1: FCModel greedy decode ID bit-match (BASELINE.json)."""
    opt = small_opt()
    torch.manual_seed(3)
    tm = REF["FCModel"].FCModel(NS(opt)).eval()
    params = copy_fc_weights(tm, fc_model.init_params(jax.random.PRNGKey(0), opt))

    B = 6
    fc = np.random.RandomState(4).randn(B, opt.fc_feat_size).astype(np.float32)
    t_seq, t_logp = _greedy_ref_fc(tm, fc)

    ctx = fc_model.encode_features(params, jnp.asarray(fc), None, None)
    out = decoding.sample(fc_model, params, ctx, opt.seq_length,
                          jax.random.PRNGKey(0), mode="greedy")
    j_seq = np.asarray(out.seq)
    j_logp = np.asarray(out.logprobs)
    T = t_seq.shape[1]
    np.testing.assert_array_equal(j_seq[:, :T], t_seq)
    assert np.all(j_seq[:, T:] == 0)
    # logprobs match where the reference emitted (post-EOS cols are padding)
    emitted = t_seq > 0
    np.testing.assert_allclose(j_logp[:, :T][emitted], t_logp[emitted], atol=1e-5)


@pytest.mark.parametrize("use_masks", [False, True])
def test_att_greedy_decode_bitmatch(use_masks):
    opt = small_opt(caption_model="att2in2")
    torch.manual_seed(5)
    tm = REF["AttModel"].Att2in2Model(NS(opt)).eval()
    params = copy_att_weights(tm, att_model.init_params(jax.random.PRNGKey(0), opt))

    B, K = 6, 9
    rng = np.random.RandomState(6)
    fc = rng.randn(B, opt.fc_feat_size).astype(np.float32)
    att = rng.randn(B, K, opt.att_feat_size).astype(np.float32)
    if use_masks:
        masks = np.zeros((B, K), np.float32)
        masks[0, :] = 1.0
        for i in range(1, B):
            masks[i, : rng.randint(2, K + 1)] = 1.0
        t_masks = torch.from_numpy(masks)
    else:
        masks, t_masks = None, None

    with torch.no_grad():
        t_seq, t_logp = tm.sample(torch.from_numpy(fc), torch.from_numpy(att),
                                  t_masks, {"sample_max": 1, "beam_size": 1})
    t_seq, t_logp = t_seq.numpy(), t_logp.numpy()

    ctx = att_model.encode_features(
        params, jnp.asarray(fc), jnp.asarray(att),
        jnp.asarray(masks) if use_masks else None)
    out = decoding.sample(att_model, params, ctx, opt.seq_length,
                          jax.random.PRNGKey(0), mode="greedy")
    j_seq = np.asarray(out.seq)
    T = t_seq.shape[1]
    np.testing.assert_array_equal(j_seq[:, :T], t_seq)
    assert np.all(j_seq[:, T:] == 0)


def test_beam1_equals_greedy():
    """beam_size=1 beam search must reproduce the greedy decode (padded)."""
    opt = small_opt(caption_model="att2in2")
    params = att_model.init_params(jax.random.PRNGKey(7), opt)
    B, K = 4, 8
    rng = np.random.RandomState(8)
    att = jnp.asarray(rng.randn(B, K, opt.att_feat_size).astype(np.float32))
    ctx = att_model.encode_features(params, None, att, None)
    greedy = decoding.sample(att_model, params, ctx, opt.seq_length,
                             jax.random.PRNGKey(0), mode="greedy")
    beam = decoding.beam_search(att_model, params, ctx, opt.seq_length, 1)
    np.testing.assert_array_equal(np.asarray(beam.seq), np.asarray(greedy.seq))


def test_beam_search_improves_logprob():
    """Wider beams should never find a worse completed-sequence logprob."""
    opt = small_opt(caption_model="att2in2")
    params = att_model.init_params(jax.random.PRNGKey(9), opt)
    B, K = 4, 8
    rng = np.random.RandomState(10)
    att = jnp.asarray(rng.randn(B, K, opt.att_feat_size).astype(np.float32))
    ctx = att_model.encode_features(params, None, att, None)

    def total_p(out):
        seq = np.asarray(out.seq)
        lp = np.asarray(out.logprobs)
        mask = np.concatenate(
            [np.ones((B, 1), bool), seq[:, :-1] > 0], axis=1)  # include EOS step
        return (lp * mask).sum(1)

    p1 = total_p(decoding.beam_search(att_model, params, ctx, opt.seq_length, 1))
    p3 = total_p(decoding.beam_search(att_model, params, ctx, opt.seq_length, 3))
    assert np.all(p3 >= p1 - 1e-5)


def test_fc_beam1_equals_greedy():
    """FC model (image prefix step) beam_size=1 == greedy."""
    opt = small_opt()
    params = fc_model.init_params(jax.random.PRNGKey(11), opt)
    B = 4
    fc = jnp.asarray(np.random.RandomState(12).randn(
        B, opt.fc_feat_size).astype(np.float32))
    ctx = fc_model.encode_features(params, fc, None, None)
    greedy = decoding.sample(fc_model, params, ctx, opt.seq_length,
                             jax.random.PRNGKey(0), mode="greedy")
    beam = decoding.beam_search(fc_model, params, ctx, opt.seq_length, 1)
    np.testing.assert_array_equal(np.asarray(beam.seq), np.asarray(greedy.seq))


def test_teacher_forced_logprobs_parity():
    """Teacher-forced forward matches the reference's per-step log-softmax
    chain (no scheduled sampling, no dropout) — stepping the torch core
    manually since the reference forward() uses torch-0.4-only APIs."""
    opt = small_opt(caption_model="att2in2")
    torch.manual_seed(21)
    tm = REF["AttModel"].Att2in2Model(NS(opt)).eval()
    params = copy_att_weights(tm, att_model.init_params(jax.random.PRNGKey(0), opt))

    B, K, L = 5, 7, 10
    rng = np.random.RandomState(22)
    fc = rng.randn(B, opt.fc_feat_size).astype(np.float32)
    att = rng.randn(B, K, opt.att_feat_size).astype(np.float32)
    labels = np.zeros((B, L + 2), np.int64)
    for i in range(B):
        n = rng.randint(2, L + 1)
        labels[i, 1:1 + n] = rng.randint(1, opt.vocab_size + 1, n)

    import torch.nn.functional as F
    with torch.no_grad():
        t_att = torch.from_numpy(att)
        emb = tm.att_embed(t_att)
        p_att = tm.ctx2att(emb)
        state = (torch.zeros(1, B, opt.rnn_size),
                 torch.zeros(1, B, opt.rnn_size))
        outs = []
        for i in range(L + 1):  # inputs labels[:, :-1] (ref AttModel.py:116-141)
            xt = tm.embed(torch.from_numpy(labels[:, i]))
            out, state = tm.core(xt, None, emb, p_att, None, state)
            outs.append(F.log_softmax(tm.logit(out), dim=1))
        want = torch.stack(outs, 1).numpy()

    ctx = att_model.encode_features(params, jnp.asarray(fc), jnp.asarray(att),
                                    None)
    got = np.asarray(decoding.teacher_forced_logprobs(
        att_model, params, ctx, jnp.asarray(labels[:, :-1])))
    np.testing.assert_allclose(got, want, atol=2e-5)


def test_beam_decoding_constraint_no_repeats():
    """decoding_constraint=1 (non-fused beam branch): no word repeats at
    consecutive steps (ref AttModel.py:203-206)."""
    opt = small_opt(caption_model="att2in2")
    params = att_model.init_params(jax.random.PRNGKey(13), opt)
    B, K = 4, 8
    att = jnp.asarray(np.random.RandomState(14).randn(
        B, K, opt.att_feat_size).astype(np.float32))
    ctx = att_model.encode_features(params, None, att, None)
    out = decoding.beam_search(att_model, params, ctx, opt.seq_length, 3,
                               decoding_constraint=1)
    seq = np.asarray(out.seq)
    for row in seq:
        words = [t for t in row if t > 0]
        for a, b in zip(words, words[1:]):
            assert a != b
