"""On-device hashed-ngram CIDEr-D vs the host string-protocol scorer."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from cooperativeimagecaptioning_tpu.rewards import self_critical, ngram_device


def make_data(seed=0, n_img=6, spi=2, L=10, R=4, vocab=30):
    rng = np.random.RandomState(seed)
    gts = []
    for _ in range(n_img):
        n = rng.randint(2, R + 1)
        g = np.zeros((n, L), np.int64)
        for r in range(n):
            k = rng.randint(2, L + 1)
            g[r, :k] = rng.randint(1, vocab, k)
        gts.append(g)
    B = n_img * spi
    def sample():
        s = np.zeros((B, L), np.int64)
        for i in range(B):
            k = rng.randint(1, L + 1)
            s[i, :k] = rng.randint(1, vocab, k)
        return s
    gen, greedy = sample(), sample()
    gen[0] = gts[0][0]  # one exact match
    return gts, gen, greedy, spi


def test_device_matches_host_scorer():
    gts, gen, greedy, spi = make_data()
    self_critical.reset_scorer()
    self_critical.init_scorer("corpus")
    want_scores, want_greedy = self_critical.get_self_critical_reward(
        gts, gen, greedy)

    refs, rmask = ngram_device.pad_gts(gts)
    got_scores, got_gen, got_greedy = jax.jit(
        ngram_device.ciderd_rewards_device, static_argnames=("seq_per_img",))(
        jnp.asarray(gen), jnp.asarray(greedy), refs, rmask, seq_per_img=spi)
    np.testing.assert_allclose(np.asarray(got_scores), want_scores,
                               rtol=2e-4, atol=2e-5)
    np.testing.assert_allclose(float(got_greedy), want_greedy, rtol=2e-4)


@pytest.mark.slow
def test_device_matches_host_spi1_short_seqs():
    gts, gen, greedy, _ = make_data(seed=3, n_img=4, spi=1, L=6, R=3, vocab=8)
    # heavy overlap regime: small vocab forces shared n-grams + clipping
    self_critical.reset_scorer()
    self_critical.init_scorer("corpus")
    want_scores, want_greedy = self_critical.get_self_critical_reward(
        gts, gen, greedy)
    refs, rmask = ngram_device.pad_gts(gts)
    got_scores, _, got_greedy = ngram_device.ciderd_rewards_device(
        jnp.asarray(gen), jnp.asarray(greedy), refs, rmask, seq_per_img=1)
    np.testing.assert_allclose(np.asarray(got_scores), want_scores,
                               rtol=2e-4, atol=2e-5)


@pytest.mark.slow
def test_exact_match_tops_batch():
    gts, gen, greedy, spi = make_data(seed=5)
    refs, rmask = ngram_device.pad_gts(gts)
    _, cider_gen, _ = ngram_device.ciderd_rewards_device(
        jnp.asarray(gen), jnp.asarray(greedy), refs, rmask, seq_per_img=spi)
    cg = np.asarray(cider_gen)
    assert cg[0] >= cg.max() - 1e-6


# ---------------------------------------------------------------------------
# Cached-df tier (DfTable): linear-in-B df lookups vs corpus-mode containment
# ---------------------------------------------------------------------------

def _token_strs(arr):
    """array_to_str token list (includes the terminal 0, misc/rewards.py:26)."""
    out = []
    for x in arr:
        out.append(int(x))
        if int(x) == 0:
            break
    return out


def _grams(tokens, n):
    return [tuple(tokens[i:i + n]) for i in range(len(tokens) - n + 1)]


def test_df_table_matches_corpus_dense():
    """A DfTable built from the expanded batch refs (corpus-mode counting)
    reproduces the dense containment path bit-for-bit."""
    gts, gen, greedy, spi = make_data(seed=11)
    refs, rmask = ngram_device.pad_gts(gts)
    B2 = 2 * gen.shape[0]
    expand = B2 / len(gts)
    df = {}
    for g in gts:
        grams = set()
        for row in np.asarray(g):
            toks = _token_strs(row)
            for n in (1, 2, 3, 4):
                grams.update(_grams(toks, n))
        for gr in grams:
            df[gr] = df.get(gr, 0.0) + expand
    table = ngram_device.build_df_table(df, ref_len=B2)

    dense = ngram_device.ciderd_rewards_device(
        jnp.asarray(gen), jnp.asarray(greedy), refs, rmask, seq_per_img=spi)
    tabled = ngram_device.ciderd_rewards_device(
        jnp.asarray(gen), jnp.asarray(greedy), refs, rmask, seq_per_img=spi,
        df_table=table)
    for a, b in zip(dense, tabled):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-6, atol=1e-7)


def test_df_table_matches_host_cached_pickle(tmp_path):
    """Reference-format df pickle (decimal-string token tuples + ref_len):
    the device table tier matches the host CiderD scorer in cached-df mode."""
    import pickle
    from cooperativeimagecaptioning_tpu.rewards import cider_d, self_critical

    rng = np.random.RandomState(17)
    # synthesize a "training corpus" df: 200 documents of random sentences
    df = {}
    for _ in range(200):
        grams = set()
        for _r in range(3):
            k = rng.randint(3, 10)
            toks = list(rng.randint(1, 20, k)) + [0]
            for n in (1, 2, 3, 4):
                grams.update(_grams(toks, n))
        for g in grams:
            df[tuple(str(t) for t in g)] = \
                df.get(tuple(str(t) for t in g), 0.0) + 1.0
    pkl_path = tmp_path / "synth-df.p"
    with open(pkl_path, "wb") as f:
        pickle.dump({"ref_len": 200, "document_frequency": df}, f)

    gts, gen, greedy, spi = make_data(seed=13, vocab=20)

    # host: cached-df scorer over the string protocol
    scorer = cider_d.CiderD(df="synth-df", df_path=str(pkl_path))
    B = gen.shape[0]
    res = [{"image_id": i,
            "caption": [self_critical.array_to_str(
                np.concatenate([gen, greedy])[i])]}
           for i in range(2 * B)]
    gts_strs = {i: [self_critical.array_to_str(g[j]) for j in range(len(g))]
                for i, g in enumerate(gts)}
    gts_map = {i: gts_strs[i % B // spi] for i in range(2 * B)}
    _, want = scorer.compute_score(gts_map, res)

    refs, rmask = ngram_device.pad_gts(gts)
    table = ngram_device.load_df_table(str(pkl_path))
    _, got_gen, got_greedy = ngram_device.ciderd_rewards_device(
        jnp.asarray(gen), jnp.asarray(greedy), refs, rmask, seq_per_img=spi,
        df_table=table)
    np.testing.assert_allclose(np.asarray(got_gen), want[:B],
                               rtol=2e-4, atol=2e-5)
    np.testing.assert_allclose(float(got_greedy), want[B:].mean(), rtol=2e-4)


@pytest.mark.slow
def test_trainer_uses_df_table(tmp_path, monkeypatch):
    """--cached_tokens <name> + --on_device_cider 1 loads data/<name>.p into a
    DfTable and trains through the table tier."""
    import pickle
    from test_training import tiny_opt, tiny_dataset
    from cooperativeimagecaptioning_tpu.training.loop import Trainer

    df = {("1",): 40.0, ("2",): 25.0, ("1", "2"): 10.0, ("3",): 5.0}
    (tmp_path / "data").mkdir()
    with open(tmp_path / "data" / "synthdf.p", "wb") as f:
        pickle.dump({"ref_len": 100, "document_frequency": df}, f)
    monkeypatch.chdir(tmp_path)

    opt = tiny_opt(is_alternating=1, alternating_turn=["speaker", "listener"],
                   retrieval_reward="gumbel", retrieval_reward_weight=0.1,
                   cider_optimization=0.9, caption_loss_weight=1,
                   vse_loss_weight=0.1, phase=3, on_device_cider=1,
                   cached_tokens="synthdf",
                   checkpoint_path=str(tmp_path / "ckpt"))
    tr = Trainer(opt, dataset=tiny_dataset(opt), verbose=False)
    assert tr._df_table is not None
    for _ in range(2):
        loss_dict, _, _ = tr.train_iteration()
        assert np.isfinite(loss_dict["loss"])
        assert "loss_cider" in loss_dict
