"""End-to-end evaluation stack on synthetic data: eval_split with language and
rank metrics, retrieval math sanity, beam-size plumbing."""

import numpy as np
import jax

from cooperativeimagecaptioning_tpu.config import Options
from cooperativeimagecaptioning_tpu.data import DataLoader
from cooperativeimagecaptioning_tpu.data.sources import SyntheticDataset
from cooperativeimagecaptioning_tpu.evaluation.eval_split import Evaluator
from cooperativeimagecaptioning_tpu.evaluation import retrieval
from cooperativeimagecaptioning_tpu.training import joint


def eval_opt(tmp_path, **kw):
    base = dict(
        caption_model="att2in2", vse_model="fc", batch_size=4, seq_per_img=1,
        rnn_size=16, input_encoding_size=12, att_hid_size=8, vse_embed_size=16,
        fc_feat_size=20, att_feat_size=20, drop_prob_lm=0.0,
        checkpoint_path=str(tmp_path), language_eval=1, rank_eval=1,
        val_images_use=-1, beam_size=1, id="evt", use_att=True,
        caption_loss_weight=1, vse_loss_weight=0.1)
    base.update(kw)
    return Options(**base)


def build(tmp_path, **kw):
    opt = eval_opt(tmp_path, **kw)
    ds = SyntheticDataset(num_images=20, vocab_size=25, seq_length=8,
                          fc_feat_size=20, att_feat_size=20, max_K=6)
    loader = DataLoader(opt, dataset=ds)
    opt.vocab_size = loader.vocab_size
    opt.seq_length = loader.seq_length
    params = joint.init_params(jax.random.PRNGKey(0), opt)
    return opt, loader, params


def test_eval_split_full(tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    opt, loader, params = build(tmp_path)
    ev = Evaluator(opt)
    losses, predictions, lang_stats = ev.eval_split(
        params, loader, {"split": "val", "num_images": -1})
    assert "loss_cap" in losses
    assert "rsum" in losses and np.isfinite(losses["rsum"])
    assert "CIDEr" in lang_stats
    val_images = len(loader.split_ix["val"])
    assert len(predictions) == val_images
    ids = {p["image_id"] for p in predictions}
    assert len(ids) == val_images  # deduped, one caption per image


def test_eval_split_beam2(tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    opt, loader, params = build(tmp_path, language_eval=0, rank_eval=0)
    ev = Evaluator(opt)
    losses, preds, _ = ev.eval_split(
        params, loader, {"split": "val", "beam_size": 2})
    assert len(preds) == len(loader.split_ix["val"])


def test_eval_gen_sent_ranking(tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    opt, loader, params = build(tmp_path, language_eval=0, rank_eval=1)
    ev = Evaluator(opt)
    ranks = ev.evalrank(params, loader, {"split": "val"}, use_gen_sent=True)
    assert "t2i_r1" in ranks and "images_ranking" in ranks


def test_i2t_t2i_perfect_embeddings():
    """With identical image/caption embeddings the correct item ranks first."""
    n = 12
    rng = np.random.RandomState(0)
    embs = rng.randn(n, 8)
    embs /= np.linalg.norm(embs, axis=1, keepdims=True)
    img5 = np.repeat(embs, 5, axis=0)
    cap5 = np.repeat(embs, 5, axis=0)
    r = retrieval.i2t(img5, cap5)
    assert r[0] == 100.0  # R@1
    ri = retrieval.t2i(img5, cap5)
    assert ri[0] == 100.0


def test_encode_data_counts(tmp_path):
    opt, loader, params = build(tmp_path)
    ev = Evaluator(opt)
    img, cap, infos = ev.encode_data(params, loader, {"split": "val"},
                                     use_gen_sent=False)
    n_val = len(loader.split_ix["val"])
    assert img.shape[0] == n_val * 5  # GT mode: 5 captions/image
    assert cap.shape[0] == n_val * 5
    img_g, cap_g, _ = ev.encode_data(params, loader, {"split": "val"},
                                     use_gen_sent=True)
    assert img_g.shape[0] == n_val


def test_encode_data_gen_sample_max(tmp_path):
    """gen_sample_max=0 ranks SAMPLED captions (opt-in extension; the
    reference pins the gen-sent decode to greedy, eval_utils.py:347, which
    stays the default): image embeddings are generation-independent, caption
    embeddings must differ for an untrained model."""
    opt, loader, params = build(tmp_path)
    ev = Evaluator(opt)
    img_g, cap_g, _ = ev.encode_data(params, loader, {"split": "val"},
                                     use_gen_sent=True)
    img_s, cap_s, _ = ev.encode_data(
        params, loader, {"split": "val", "gen_sample_max": 0},
        use_gen_sent=True)
    np.testing.assert_allclose(img_g, img_s, rtol=1e-5)
    assert not np.allclose(cap_g, cap_s)
    # and the default (no key) is bit-identical to explicit greedy
    img_g2, cap_g2, _ = ev.encode_data(
        params, loader, {"split": "val", "gen_sample_max": 1},
        use_gen_sent=True)
    np.testing.assert_array_equal(cap_g, cap_g2)


def test_gen_sample_max_flows_through_eval_split(tmp_path, monkeypatch):
    """The full path eval_split -> evalrank -> encode_data honors
    gen_sample_max (rank metrics can saturate at toy scale, so pin the
    decode-program key instead of the scores)."""
    monkeypatch.chdir(tmp_path)
    opt, loader, params = build(tmp_path, language_eval=0)
    ev = Evaluator(opt)
    ev.eval_split(params, loader,
                  {"split": "val", "num_images": -1, "gen_sample_max": 0},
                  use_gen_sent=True)
    # greedy program for the prediction loop, sampling program for the rank
    # eval's gen-sent decode
    assert (1, 0, 1.0) in ev._decode_fns, list(ev._decode_fns)


def test_eval_split_sampling_modes(tmp_path, monkeypatch):
    """sample_max=0 (multinomial) and 2 (gumbel-noise max) eval protocols."""
    monkeypatch.chdir(tmp_path)
    opt, loader, params = build(tmp_path, language_eval=0, rank_eval=0)
    ev = Evaluator(opt)
    for sm in (0, 2):
        losses, preds, _ = ev.eval_split(
            params, loader, {"split": "val", "sample_max": sm,
                             "temperature": 0.8})
        assert len(preds) == len(loader.split_ix["val"])


def test_eval_split_trim_semantics(tmp_path, monkeypatch):
    """The deferred-transfer eval loop (r5: per-batch np.asarray syncs
    removed) must keep the reference trimming exactly (eval_utils.py:211-225):
    a num_images cap mid-batch and a wrap overshoot both drop only the tail
    predictions of the offending batch."""
    monkeypatch.chdir(tmp_path)
    opt = eval_opt(tmp_path, language_eval=0, rank_eval=0)
    ds = SyntheticDataset(num_images=30, vocab_size=25, seq_length=8,
                          fc_feat_size=20, att_feat_size=20, max_K=6)
    loader = DataLoader(opt, dataset=ds)
    opt.vocab_size = loader.vocab_size
    opt.seq_length = loader.seq_length
    params = joint.init_params(jax.random.PRNGKey(0), opt)
    ev = Evaluator(opt)
    n_val = len(loader.split_ix["val"])
    assert n_val % opt.batch_size != 0  # the wrap overshoot case is real

    # full split: wrap overshoot trimmed to the split size, ids unique
    _, preds, _ = ev.eval_split(params, loader,
                                {"split": "val", "num_images": -1})
    assert len(preds) == n_val
    assert len({p["image_id"] for p in preds}) == n_val

    # mid-batch cap: exactly num_images survive, and they are the FIRST ones
    cap = opt.batch_size + 1
    _, preds_cap, _ = ev.eval_split(params, loader,
                                    {"split": "val", "num_images": cap})
    assert len(preds_cap) == cap
    assert [p["image_id"] for p in preds_cap] == \
        [p["image_id"] for p in preds[:cap]]


def test_scores_ranks_hits_matches_numpy_spec():
    """The device rank core (scores_ranks_hits) must reproduce
    target_ranks/top_retrieved on the f32 score matrix EXACTLY — including
    tie behavior (ties toward the larger column index).  Identity pool makes
    the device matmul reproduce an arbitrary score matrix bit-exactly."""
    rng = np.random.RandomState(7)
    Q, M, T = 37, 23, 3
    scores = rng.randn(Q, M).astype(np.float32)
    # engineered exact ties, incl. tied targets
    scores[5, 3] = scores[5, 17] = scores[5, 9]
    scores[12, :] = 0.25
    scores[20, 1] = scores[20, 2]
    targets = rng.randint(0, M, size=(Q, T))
    ref_ranks = retrieval.target_ranks(scores, targets)
    ref_hits = retrieval.top_retrieved(scores, 4)
    ranks, hits = retrieval.scores_ranks_hits(
        scores, np.eye(M, dtype=np.float32), targets, 4, chunk=8)
    np.testing.assert_array_equal(ranks, ref_ranks)
    np.testing.assert_array_equal(hits, ref_hits)
