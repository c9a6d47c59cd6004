"""Straight-through / partial-sampling relaxations of discrete word sampling.

These make the discrete caption differentiable so the listener's retrieval loss can
train the speaker end-to-end (the paper's core technique).  Pure functions of
(rng, logprobs) with `jax.lax.stop_gradient` implementing the straight-through trick
`(y_hard - y).detach() + y`.

References:
  gumbel_st        — models/gumbel.py:6-30
  gumbel_soft      — models/gumbel_softmax.py:17-42 (partial sampling)
  multinomial_st   — models/multinomial.py:4-27
  multinomial_soft — models/multinomial_soft.py:5-35 (partial sampling)

All take *logprobs* (log-softmax outputs) like the reference call sites
(AttModel.py:346,357,368,382).  Shapes: logprobs [B, C] -> (relaxed [B, C], ind [B]).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def sample_gumbel(rng, shape, eps: float = 1e-20, dtype=jnp.float32):
    """-log(-log(U + eps) + eps) with U~Uniform[0,1) (ref: gumbel.py:7-12)."""
    u = jax.random.uniform(rng, shape, dtype)
    return -jnp.log(-jnp.log(u + eps) + eps)


def _one_hot_of_argmax(y):
    ind = jnp.argmax(y, axis=-1)
    return jax.nn.one_hot(ind, y.shape[-1], dtype=y.dtype), ind


def gumbel_st(rng, logprobs, temperature):
    """Straight-through Gumbel-softmax (ref: gumbel.py:14-30).

    Forward: hard one-hot of argmax(logprobs + g); backward: d softmax((lp+g)/T).
    """
    g = sample_gumbel(rng, logprobs.shape, dtype=logprobs.dtype)
    y = jax.nn.softmax((logprobs + g) / temperature, axis=-1)
    y_hard, ind = _one_hot_of_argmax(y)
    one_hot = jax.lax.stop_gradient(y_hard - y) + y
    return one_hot, ind


def gumbel_soft(rng, logprobs, temperature, ss_prob: float = 0.25):
    """Partial-sampling Gumbel-softmax (ref: gumbel_softmax.py:17-42).

    A per-row Bernoulli(ss_prob) mask selects rows that get the straight-through
    hard forward; unselected rows pass the soft distribution y through unchanged.
    Exactly mirrors the reference row-masked construction
    `(part_y_hard - part_logits).detach() + y`.
    """
    rng_g, rng_mask = jax.random.split(rng)
    g = sample_gumbel(rng_g, logprobs.shape, dtype=logprobs.dtype)
    y = jax.nn.softmax((logprobs + g) / temperature, axis=-1)
    y_hard, ind = _one_hot_of_argmax(y)
    # ss_prob may be a traced scalar (annealed without recompiling); the masked
    # path below reduces exactly to `y` when ss_prob == 0.
    mask = (jax.random.uniform(rng_mask, (logprobs.shape[0],)) < ss_prob)
    mask = mask[:, None].astype(y.dtype)
    part_y = y * mask
    part_y_hard = y_hard * mask
    out = jax.lax.stop_gradient(part_y_hard - part_y) + y
    return out, ind


def multinomial_st(rng, logprobs, temperature):
    """Straight-through multinomial (ref: multinomial.py:4-27).

    y = softmax(logprobs / T); draw ind ~ Categorical(y); forward hard one-hot,
    backward d y.  (For T==1, softmax(logprobs) == exp(logprobs) by shift
    invariance, matching the reference exactly.)
    """
    y = jax.nn.softmax(logprobs / temperature, axis=-1)
    ind = jax.random.categorical(rng, logprobs / temperature, axis=-1)
    y_hard = jax.nn.one_hot(ind, y.shape[-1], dtype=y.dtype)
    one_hot = jax.lax.stop_gradient(y_hard - y) + y
    return one_hot, ind


def multinomial_soft(rng, logprobs, temperature, ss_prob: float = 0.25):
    """Partial-sampling multinomial (ref: multinomial_soft.py:5-35).

    NOTE the reference uses y = exp(logprobs / T), which for T != 1 is
    *unnormalized*; torch.multinomial renormalizes for the draw but the
    unnormalized y is what flows through the soft rows.  Reproduced faithfully.
    """
    rng_draw, rng_mask = jax.random.split(rng)
    y = jnp.exp(logprobs / temperature)
    ind = jax.random.categorical(rng_draw, logprobs / temperature, axis=-1)
    y_hard = jax.nn.one_hot(ind, y.shape[-1], dtype=y.dtype)
    mask = (jax.random.uniform(rng_mask, (logprobs.shape[0],)) < ss_prob)
    mask = mask[:, None].astype(y.dtype)
    part_y = y * mask
    part_y_hard = y_hard * mask
    out = jax.lax.stop_gradient(part_y_hard - part_y) + y
    return out, ind
