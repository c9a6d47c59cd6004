"""Golden beam-search parity vs the reference sample_beam (VERDICT r1 item 3).

The oracle is the reference's own beam loop (AttModel.py:150-289) running
under torch, with only its two torch<=0.3 scalar idioms shimmed (see
ref_bridge.load_reference_beam_att).  beam=2 is the final-eval protocol
(ref eval.py:33); beam=5 exercises deeper merges; decoding_constraint covers
the forbid-previous-word scatter (AttModel.py:203-206).

FCModel.sample_beam cannot serve as an oracle: it references undefined
`fc_feats_d`/`self.new_img_embed` (FCModel.py:161-163) and raises NameError
even on period-correct torch — the reference never beam-decoded the FC
speaker (final eval uses att2in2).
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from cooperativeimagecaptioning_tpu.config import Options
from cooperativeimagecaptioning_tpu.models import att_model
from cooperativeimagecaptioning_tpu.ops import decoding

torch = pytest.importorskip("torch")

from ref_bridge import load_reference_beam_att  # noqa: E402
from test_speaker_parity import NS, copy_att_weights, small_opt  # noqa: E402

BEAM_MOD = load_reference_beam_att()


def _setup(seed, B=5, K=9, use_masks=False, **opt_kw):
    opt = small_opt(caption_model="att2in2", **opt_kw)
    torch.manual_seed(seed)
    tm = BEAM_MOD.Att2in2Model(NS(opt)).eval()
    params = copy_att_weights(
        tm, att_model.init_params(jax.random.PRNGKey(0), opt))
    rng = np.random.RandomState(seed)
    fc = rng.randn(B, opt.fc_feat_size).astype(np.float32)
    att = rng.randn(B, K, opt.att_feat_size).astype(np.float32)
    if use_masks:
        masks = np.zeros((B, K), np.float32)
        masks[0, :] = 1.0
        for i in range(1, B):
            masks[i, : rng.randint(2, K + 1)] = 1.0
    else:
        masks = None
    return opt, tm, params, fc, att, masks


def _run_both(opt, tm, params, fc, att, masks, beam_size, constraint):
    t_masks = torch.from_numpy(masks) if masks is not None else None
    with torch.no_grad():
        t_seq, t_logps = tm.sample_beam(
            torch.from_numpy(fc), torch.from_numpy(att), t_masks,
            {"beam_size": beam_size, "decoding_constraint": constraint})
    ctx = att_model.encode_features(
        params, jnp.asarray(fc), jnp.asarray(att),
        jnp.asarray(masks) if masks is not None else None)
    out = decoding.beam_search(att_model, params, ctx, opt.seq_length,
                               beam_size, decoding_constraint=constraint)
    return t_seq.numpy(), t_logps.numpy(), np.asarray(out.seq), \
        np.asarray(out.logprobs)


@pytest.mark.parametrize("beam_size,constraint,use_masks", [
    (2, 0, False), (2, 0, True), (5, 0, False),
    (2, 1, False), (5, 1, True),
])
def test_beam_golden_ids_bitmatch(beam_size, constraint, use_masks):
    opt, tm, params, fc, att, masks = _setup(
        seed=31 + beam_size + constraint, use_masks=use_masks)
    t_seq, t_logps, j_seq, j_logps = _run_both(
        opt, tm, params, fc, att, masks, beam_size, constraint)
    np.testing.assert_array_equal(j_seq, t_seq)
    # per-step logprobs of the winning beam (zeros beyond the done step in
    # both implementations)
    np.testing.assert_allclose(j_logps, t_logps, atol=2e-5)


def test_beam_golden_short_sequences():
    """Small vocab + long L forces early EOS emissions and done-beam
    re-records — the tie/bookkeeping-heavy regime."""
    opt, tm, params, fc, att, masks = _setup(
        seed=7, B=6, vocab_size=6, seq_length=16)
    t_seq, t_logps, j_seq, j_logps = _run_both(
        opt, tm, params, fc, att, masks, 3, 0)
    np.testing.assert_array_equal(j_seq, t_seq)
    np.testing.assert_allclose(j_logps, t_logps, atol=2e-5)


def test_fc_sample_beam_is_broken_upstream():
    """Documents why the FC beam has no golden oracle: the reference's own
    FCModel.sample_beam raises NameError (undefined fc_feats_d,
    FCModel.py:161-163) before any decoding happens."""
    from ref_bridge import load_reference
    REF = load_reference()
    opt = small_opt(caption_model="fc")
    torch.manual_seed(3)
    tm = REF["FCModel"].FCModel(NS(opt)).eval()
    fc = torch.randn(1, opt.fc_feat_size)
    with pytest.raises((NameError, AttributeError)):
        with torch.no_grad():
            tm.sample_beam(fc, None, None, {"beam_size": 2})
