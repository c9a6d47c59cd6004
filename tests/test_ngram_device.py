"""On-device hashed-ngram CIDEr-D vs the host string-protocol scorer."""

import numpy as np
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


def test_exact_match_tops_batch():
    gts, gen, greedy, spi = make_data(seed=5)
    refs, rmask = ngram_device.pad_gts(gts)
    _, cider_gen, _ = ngram_device.ciderd_rewards_device(
        jnp.asarray(gen), jnp.asarray(greedy), refs, rmask, seq_per_img=spi)
    cg = np.asarray(cider_gen)
    assert cg[0] >= cg.max() - 1e-6
