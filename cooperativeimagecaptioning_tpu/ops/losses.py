"""Loss functions (ref: misc/utils.py:45-58 LanguageModelCriterion and the reward
losses composed in models/AlternatingJointModel.py)."""

from __future__ import annotations

import jax.numpy as jnp


def language_model_criterion(logprobs, targets, masks):
    """Masked NLL (ref: misc/utils.py:45-58).

    logprobs: [B, T, C]; targets/masks: [B, >=T] — truncated to T like the
    reference (which truncates because its time loop may early-break).
    """
    T = logprobs.shape[1]
    targets = targets[:, :T]
    masks = masks[:, :T]
    picked = jnp.take_along_axis(logprobs, targets[..., None], axis=2)[..., 0]
    return -jnp.sum(picked * masks) / jnp.sum(masks)


def self_critical_loss(sample_logprobs, reward, gen_masks):
    """REINFORCE surrogate: -E[r * logp], masked and mean-normalized.

    ref: AlternatingJointModel.py:421-427 (cider) and :292-324 (retrieval):
      loss = sum(logp * coeff * mask[:, 1:]) / sum(mask[:, 1:])
    where coeff = -reward (cider) or (retrieval_loss - baseline) per sample.
    sample_logprobs: [B, L]; reward: [B] (stop-gradient applied by caller);
    gen_masks: [B, L+1] — column 0 dropped like the reference's masks[:, 1:].
    """
    m = gen_masks[:, 1:]
    loss = sample_logprobs * reward[:, None] * m
    return jnp.sum(loss) / jnp.sum(m)


def masks_from_seq(seq):
    """Masks for a sampled sequence (ref: AlternatingJointModel.py:232-235).

    seq: [B, L] sampled ids (0 after EOS).  Returns [B, L+1]:
      cat(ones[B, 2], (seq > 0)[:, :-1]) — two leading ones cover BOS + first word.
    """
    B = seq.shape[0]
    lead = jnp.ones((B, 2), jnp.float32)
    body = (seq > 0).astype(jnp.float32)[:, :-1]
    return jnp.concatenate([lead, body], axis=1)
