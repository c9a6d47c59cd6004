"""Fused greedy logit head: reference math + interpret-mode kernel parity."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from cooperativeimagecaptioning_tpu.ops.pallas import logit_head


def case(seed=0, B=16, H=32, V=50):
    rng = np.random.RandomState(seed)
    h = jnp.asarray(rng.randn(B, H).astype(np.float32))
    w = jnp.asarray((rng.randn(H, V) * 0.1).astype(np.float32))
    b = jnp.asarray((rng.randn(V) * 0.1).astype(np.float32))
    return h, w, b


def test_reference_head_matches_log_softmax():
    h, w, b = case()
    it, lp = logit_head.greedy_head_reference(h, w, b)
    full = jax.nn.log_softmax(h @ w + b, axis=-1)
    np.testing.assert_array_equal(np.asarray(it),
                                  np.asarray(jnp.argmax(full, axis=-1)))
    np.testing.assert_allclose(np.asarray(lp),
                               np.asarray(jnp.max(full, axis=-1)), atol=1e-6)


def test_streaming_logsumexp_math():
    """The kernel's streaming reduction, re-implemented in numpy over tiles,
    must equal the full-array result (validates the accumulator algebra)."""
    h, w, b = case(seed=1, B=8, H=16, V=96)
    logits = np.asarray(h @ w + b)
    BV = 32
    m = np.full((8,), -1e30)
    s = np.zeros((8,))
    best = np.full((8,), -1e30)
    arg = np.zeros((8,), np.int64)
    for j in range(0, 96, BV):
        tile = logits[:, j: j + BV]
        tmax = tile.max(1)
        targ = tile.argmax(1) + j
        m_new = np.maximum(m, tmax)
        s = s * np.exp(m - m_new) + np.exp(tile - m_new[:, None]).sum(1)
        m = m_new
        improved = tmax > best
        arg = np.where(improved, targ, arg)
        best = np.where(improved, tmax, best)
    lp = best - (m + np.log(s))
    it_ref, lp_ref = logit_head.greedy_head_reference(h, w, b)
    np.testing.assert_array_equal(arg, np.asarray(it_ref))
    np.testing.assert_allclose(lp, np.asarray(lp_ref), atol=1e-6)


def test_tie_break_first_max():
    h = jnp.zeros((2, 4))
    w = jnp.zeros((4, 6))
    b = jnp.asarray([1.0, 3.0, 3.0, 0.0, 3.0, 2.0])
    it, _ = logit_head.greedy_head_reference(h, w, b)
    assert np.all(np.asarray(it) == 1)  # first of the tied maxima


def test_beam_head_reference_math():
    from cooperativeimagecaptioning_tpu.ops.pallas import beam_head
    rng = np.random.RandomState(9)
    h = jnp.asarray(rng.randn(6, 16).astype(np.float32))
    w = jnp.asarray((rng.randn(16, 40) * 0.2).astype(np.float32))
    b = jnp.asarray((rng.randn(40) * 0.2).astype(np.float32))
    vals, idx, lse = beam_head.beam_head_reference(h, w, b, 3)
    full = np.asarray(h @ w + b)
    want_v, want_i = jax.lax.top_k(jnp.asarray(full), 3)
    np.testing.assert_allclose(np.asarray(vals), np.asarray(want_v), atol=1e-6)
    np.testing.assert_array_equal(np.asarray(idx), np.asarray(want_i))
    # log-softmax of the top word == vals - lse
    lp = np.asarray(jax.nn.log_softmax(jnp.asarray(full), axis=-1))
    np.testing.assert_allclose(np.asarray(vals[:, 0] - lse),
                               lp[np.arange(6), np.asarray(idx)[:, 0]],
                               atol=1e-6)
