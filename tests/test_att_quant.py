"""int8-quantized attention context: quant error bounds, kernel-vs-reference
parity, and decode equivalence against an explicitly dequantized context."""

import numpy as np
import jax
import jax.numpy as jnp

from cooperativeimagecaptioning_tpu.ops.pallas import att_step


def case(seed=0, B=8, K=6, H=16, A=12, masks=True):
    rng = np.random.RandomState(seed)
    h = jnp.asarray(rng.randn(B, H).astype(np.float32))
    emb = jnp.asarray(np.abs(rng.randn(B, K, H)).astype(np.float32))  # post-ReLU
    patt = jnp.asarray(rng.randn(B, K, A).astype(np.float32))
    wh = jnp.asarray(rng.randn(H, A).astype(np.float32) * 0.1)
    bh = jnp.asarray(rng.randn(A).astype(np.float32) * 0.1)
    wa = jnp.asarray(rng.randn(A, 1).astype(np.float32) * 0.1)
    ba = jnp.asarray(rng.randn(1).astype(np.float32) * 0.1)
    m = None
    if masks:
        m = np.zeros((B, K), np.float32)
        for i in range(B):
            m[i, : rng.randint(1, K + 1)] = 1
        m = jnp.asarray(m)
    return h, emb, patt, wh, bh, wa, ba, m


def test_quantize_roundtrip_error_bound():
    _, emb, patt, *_ = case(seed=3)
    eq, se, pq, sp = att_step.quantize_features(emb, patt)
    emb_d, patt_d = att_step.dequantize_features(eq, se, pq, sp)
    # per-row error <= half a quantization step = row_max / 254
    err = np.max(np.abs(np.asarray(emb_d - emb)), axis=-1)
    bound = np.max(np.abs(np.asarray(emb)), axis=-1) / 254.0 + 1e-7
    assert (err <= bound).all()
    err_p = np.max(np.abs(np.asarray(patt_d - patt)), axis=-1)
    bound_p = np.max(np.abs(np.asarray(patt)), axis=-1) / 254.0 + 1e-7
    assert (err_p <= bound_p).all()


def test_fused_q_matches_dequantized_reference():
    for masks in (True, False):
        h, emb, patt, wh, bh, wa, ba, m = case(seed=1, masks=masks)
        eq, se, pq, sp = att_step.quantize_features(emb, patt)
        emb_d, patt_d = att_step.dequantize_features(eq, se, pq, sp)
        want = att_step.attention_reference(
            h, emb_d, patt_d, wh, bh, wa, ba, m)
        got = att_step.fused_attention_q(
            h, eq, se, pq, sp, wh, bh, wa, ba, m)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   atol=1e-5)


def test_fused_q_gradients_flow_to_h_and_weights():
    h, emb, patt, wh, bh, wa, ba, m = case(seed=2)
    eq, se, pq, sp = att_step.quantize_features(emb, patt)
    emb_d, patt_d = att_step.dequantize_features(eq, se, pq, sp)

    def f_q(h, wh):
        return jnp.sum(att_step.fused_attention_q(
            h, eq, se, pq, sp, wh, bh, wa, ba, m) ** 2)

    def f_ref(h, wh):
        return jnp.sum(att_step.attention_reference(
            h, emb_d, patt_d, wh, bh, wa, ba, m) ** 2)

    g_q = jax.grad(f_q, argnums=(0, 1))(h, wh)
    g_ref = jax.grad(f_ref, argnums=(0, 1))(h, wh)
    for a, b in zip(g_q, g_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)


def _speaker(seed=0, B=6, K=5, V=40, L=9):
    from cooperativeimagecaptioning_tpu.config import Options
    from cooperativeimagecaptioning_tpu.models import att_model
    from cooperativeimagecaptioning_tpu.training import joint
    opt = Options(caption_model="att2in2", vse_model="None", rnn_size=24,
                  input_encoding_size=20, att_hid_size=16, fc_feat_size=32,
                  att_feat_size=32, drop_prob_lm=0.0)
    opt.vocab_size = V
    opt.seq_length = L
    params = joint.init_params(jax.random.PRNGKey(seed), opt)
    sp = joint.speaker_view(params, opt)
    rng = np.random.RandomState(seed)
    att = jnp.asarray(rng.randn(B, K, 32).astype(np.float32))
    masks = jnp.asarray((rng.rand(B, K) < 0.8).astype(np.float32)
                        ).at[:, 0].set(1.0)
    return att_model, sp, att, masks, opt


def test_quantized_decode_matches_dequantized_ctx():
    """Greedy/beam decode over quantize_ctx == decode over the explicitly
    dequantized context (the quantization is the ONLY difference)."""
    from cooperativeimagecaptioning_tpu.models import att_model
    from cooperativeimagecaptioning_tpu.ops import decoding
    module, sp, att, masks, opt = _speaker()
    ctx = att_model.encode_features(sp, None, att, masks)
    qctx = att_model.quantize_ctx(ctx)
    emb_d, patt_d = att_step.dequantize_features(
        qctx["att_feats_q"], qctx["att_scale"],
        qctx["p_att_q"], qctx["p_att_scale"])
    dctx = {"att_feats": emb_d, "p_att_feats": patt_d, "att_masks": masks}

    got = decoding.sample(module, sp, qctx, opt.seq_length,
                          jax.random.PRNGKey(0), mode="greedy")
    want = decoding.sample(module, sp, dctx, opt.seq_length,
                           jax.random.PRNGKey(0), mode="greedy")
    np.testing.assert_array_equal(np.asarray(got.seq), np.asarray(want.seq))
    np.testing.assert_allclose(np.asarray(got.logprobs),
                               np.asarray(want.logprobs), atol=1e-5)

    gb = decoding.beam_search(module, sp, qctx, opt.seq_length, 2)
    wb = decoding.beam_search(module, sp, dctx, opt.seq_length, 2)
    np.testing.assert_array_equal(np.asarray(gb.seq), np.asarray(wb.seq))


def test_quantized_decode_close_to_fp32():
    """Quantization should rarely flip greedy argmax decisions on a random
    model; assert a high token-agreement rate rather than bit equality."""
    from cooperativeimagecaptioning_tpu.models import att_model
    from cooperativeimagecaptioning_tpu.ops import decoding
    module, sp, att, masks, opt = _speaker(seed=4, B=16)
    ctx = att_model.encode_features(sp, None, att, masks)
    qctx = att_model.quantize_ctx(ctx)
    a = np.asarray(decoding.sample(module, sp, ctx, opt.seq_length,
                                   jax.random.PRNGKey(0), mode="greedy").seq)
    b = np.asarray(decoding.sample(module, sp, qctx, opt.seq_length,
                                   jax.random.PRNGKey(0), mode="greedy").seq)
    assert (a == b).mean() > 0.9
