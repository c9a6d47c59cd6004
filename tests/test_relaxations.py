"""Relaxation ops: forward structure and straight-through gradient checks."""

import numpy as np
import jax
import jax.numpy as jnp

from cooperativeimagecaptioning_tpu.ops import relaxations
from cooperativeimagecaptioning_tpu.ops import losses


def logprobs_of(seed, B=8, C=11):
    rng = np.random.RandomState(seed)
    logits = jnp.asarray(rng.randn(B, C).astype(np.float32))
    return jax.nn.log_softmax(logits, axis=-1)


def test_gumbel_st_forward_is_one_hot():
    lp = logprobs_of(0)
    oh, ind = relaxations.gumbel_st(jax.random.PRNGKey(0), lp, 2.0)
    oh = np.asarray(oh)
    assert np.allclose(oh.sum(-1), 1.0, atol=1e-6)
    assert np.allclose(oh.max(-1), 1.0, atol=1e-6)
    assert np.array_equal(oh.argmax(-1), np.asarray(ind))


def test_gumbel_st_gradient_matches_soft_sample():
    """grad through ST one-hot == grad through softmax((lp+g)/T) with same noise."""
    lp = logprobs_of(1)
    key = jax.random.PRNGKey(7)
    v = jnp.asarray(np.random.RandomState(2).randn(*lp.shape).astype(np.float32))

    def f_hard(lp):
        oh, _ = relaxations.gumbel_st(key, lp, 3.0)
        return jnp.sum(oh * v)

    def f_soft(lp):
        g = relaxations.sample_gumbel(key, lp.shape)
        y = jax.nn.softmax((lp + g) / 3.0, axis=-1)
        return jnp.sum(y * v)

    g_hard = jax.grad(f_hard)(lp)
    g_soft = jax.grad(f_soft)(lp)
    np.testing.assert_allclose(np.asarray(g_hard), np.asarray(g_soft), atol=1e-6)


def test_multinomial_st_gradient_matches_softmax():
    lp = logprobs_of(3)
    key = jax.random.PRNGKey(9)
    v = jnp.asarray(np.random.RandomState(4).randn(*lp.shape).astype(np.float32))

    def f_hard(lp):
        oh, _ = relaxations.multinomial_st(key, lp, 1.0)
        return jnp.sum(oh * v)

    def f_soft(lp):
        return jnp.sum(jax.nn.softmax(lp, axis=-1) * v)

    np.testing.assert_allclose(np.asarray(jax.grad(f_hard)(lp)),
                               np.asarray(jax.grad(f_soft)(lp)), atol=1e-6)


def test_gumbel_soft_rows_partition():
    """ST rows are one-hot, soft rows equal the soft sample y; grads flow via y."""
    lp = logprobs_of(5, B=64)
    key = jax.random.PRNGKey(11)
    out, ind = relaxations.gumbel_soft(key, lp, 2.0, ss_prob=0.5)
    # reconstruct y with the same subkey the op used
    k_g, _ = jax.random.split(key)
    g = relaxations.sample_gumbel(k_g, lp.shape)
    y = jax.nn.softmax((lp + g) / 2.0, axis=-1)
    out, y = np.asarray(out), np.asarray(y)
    is_hard = np.isclose(out.max(-1), 1.0, atol=1e-6) & \
        np.isclose(out.sum(-1), 1.0, atol=1e-6)
    is_soft = np.all(np.isclose(out, y, atol=1e-6), axis=-1)
    assert np.all(is_hard | is_soft)
    assert is_hard.any() and is_soft.any()  # with B=64, both sides almost surely


def test_multinomial_soft_ss_zero_returns_probs():
    lp = logprobs_of(6)
    out, _ = relaxations.multinomial_soft(jax.random.PRNGKey(0), lp, 1.0, 0.0)
    np.testing.assert_allclose(np.asarray(out), np.exp(np.asarray(lp)), atol=1e-6)


def test_language_model_criterion():
    """Masked NLL matches the reference formula -sum(lp[target]*mask)/sum(mask)."""
    rng = np.random.RandomState(7)
    B, T, C = 4, 6, 9
    lp = jax.nn.log_softmax(jnp.asarray(rng.randn(B, T, C).astype(np.float32)))
    targets = jnp.asarray(rng.randint(0, C, (B, T + 2)))
    masks = jnp.asarray((rng.rand(B, T + 2) > 0.3).astype(np.float32))
    got = losses.language_model_criterion(lp, targets, masks)
    lp_np = np.asarray(lp)
    t_np, m_np = np.asarray(targets)[:, :T], np.asarray(masks)[:, :T]
    picked = np.take_along_axis(lp_np, t_np[..., None], axis=2)[..., 0]
    want = -(picked * m_np).sum() / m_np.sum()
    np.testing.assert_allclose(float(got), want, rtol=1e-6)


def test_masks_from_seq():
    seq = jnp.asarray([[3, 4, 0, 0], [5, 0, 0, 0]])
    m = np.asarray(losses.masks_from_seq(seq))
    np.testing.assert_array_equal(m, [[1, 1, 1, 1, 0], [1, 1, 1, 0, 0]])
