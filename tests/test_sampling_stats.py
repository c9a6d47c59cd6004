"""Statistical checks: the samplers' first-word distributions match the model's
predictive probabilities (guards rng/temperature plumbing bugs)."""

import numpy as np
import jax
import jax.numpy as jnp

from cooperativeimagecaptioning_tpu.ops import relaxations


def test_multinomial_st_matches_softmax_distribution():
    rng = np.random.RandomState(0)
    C = 6
    logits = jnp.asarray(rng.randn(C).astype(np.float32))
    lp = jax.nn.log_softmax(logits)
    n = 20000
    lps = jnp.broadcast_to(lp, (n, C))
    _, ind = relaxations.multinomial_st(jax.random.PRNGKey(1), lps, 1.0)
    counts = np.bincount(np.asarray(ind), minlength=C) / n
    expected = np.asarray(jax.nn.softmax(logits))
    assert np.abs(counts - expected).max() < 0.015


def test_gumbel_st_matches_categorical_distribution():
    """argmax(logits + Gumbel) ~ Categorical(softmax(logits)) regardless of
    the temperature used for the soft relaxation."""
    rng = np.random.RandomState(2)
    C = 5
    logits = jnp.asarray(rng.randn(C).astype(np.float32))
    lp = jax.nn.log_softmax(logits)
    n = 20000
    lps = jnp.broadcast_to(lp, (n, C))
    _, ind = relaxations.gumbel_st(jax.random.PRNGKey(3), lps, 7.0)
    counts = np.bincount(np.asarray(ind), minlength=C) / n
    expected = np.asarray(jax.nn.softmax(logits))
    assert np.abs(counts - expected).max() < 0.015


def test_temperature_sharpens_multinomial():
    rng = np.random.RandomState(4)
    C = 8
    lp = jax.nn.log_softmax(jnp.asarray(rng.randn(C).astype(np.float32)))
    n = 8000
    lps = jnp.broadcast_to(lp, (n, C))
    best = int(jnp.argmax(lp))
    _, cold = relaxations.multinomial_st(jax.random.PRNGKey(5), lps, 0.3)
    _, hot = relaxations.multinomial_st(jax.random.PRNGKey(5), lps, 3.0)
    p_cold = float((np.asarray(cold) == best).mean())
    p_hot = float((np.asarray(hot) == best).mean())
    assert p_cold > p_hot + 0.1


def test_partial_sampling_hard_fraction():
    """gumbel_soft hardens ~ss_prob of the rows."""
    rng = np.random.RandomState(6)
    lp = jax.nn.log_softmax(
        jnp.asarray(rng.randn(4000, 7).astype(np.float32)), axis=-1)
    out, _ = relaxations.gumbel_soft(jax.random.PRNGKey(7), lp, 2.0,
                                     ss_prob=0.25)
    out = np.asarray(out)
    hard = np.isclose(out.max(-1), 1.0, atol=1e-6) & \
        np.isclose(out.sum(-1), 1.0, atol=1e-6)
    frac = hard.mean()
    assert 0.2 < frac < 0.3
