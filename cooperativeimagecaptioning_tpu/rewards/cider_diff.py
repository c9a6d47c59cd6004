"""Differentiable soft CIDEr over word *distributions*
(ref: cider/pyciderevalcap/cider_diff/{cider,cider_scorer}.py — imported by
AlternatingJointModel.py:53, flag-gated by --soft_cider/--df, dormant call site).

For a hypothesis distribution res [T, C] and a reference, per n:
  expected gram frequency  E[g] = (1/(T-n)) * sum_t exp( (1/(n+1)) *
                                   sum_m log res[t+m, w_m] )   (partial windows
                                   at the tail keep only available m terms,
                                   exactly like the reference's shifted matmuls,
                                   cider_scorer.py:168-183)
  score_n = sum_distinct_g min(E[g], tf_g / sum tf) * idf_g     (histogram
                                   intersection, :185-199)
  score   = mean over n WITH grams, summed over refs, / n_refs, x10 (:202-213)
No length penalty (the diff variant has none).

This JAX version runs fully on device: reference grams are taken as token
windows (no sparse matrices), distinct-gram sums use the 1/tf position-weight
trick shared with ngram_device, and corpus document frequency uses the hashed
containment counts.  It is differentiable end-to-end in `res` — enabling direct
soft-CIDEr maximization through the relaxed caption distributions (the
capability the reference wired but never called).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from cooperativeimagecaptioning_tpu.rewards.ngram_device import (
    _gram_hashes, NS, containment_df)


def soft_cider_scores(res, refs, ref_mask, ref_len_log=None, eps=1e-20):
    """res: [B, T, C] word distributions; refs: [B, R, Lr] token ids (0 = EOS
    convention of the caller); ref_mask: [B, R].  Returns [B] differentiable
    scores.  Document frequency: corpus mode over the B ref sets
    (cider_scorer.py:99-105)."""
    B, T, C = res.shape
    _, R, Lr = refs.shape
    logres = jnp.log(res + eps)  # [B, T, C]
    if ref_len_log is None:
        ref_len_log = jnp.log(jnp.float32(B))

    total = jnp.zeros((B, R))
    n_count = jnp.zeros((B, R))
    for n in NS:
        gr, vr = _gram_hashes(refs, n)      # [B, R, Lr]
        vr = vr * ref_mask[..., None]
        # tf within each ref (per position)
        eq_rr = (gr[..., :, None] == gr[..., None, :]).astype(jnp.float32)
        tf = jnp.einsum("brij,brj->bri", eq_rr, vr)  # [B, R, Lr]
        tf_total = jnp.sum(vr, axis=-1)              # [B, R] = #gram positions
        # corpus df: count of batch items whose ref set contains the gram
        # (shared dense-containment helper, rewards/ngram_device.py).
        # NOTE the dense compare is O((B*R*Lr)^2) per n inside the grad
        # graph — soft_cider is practical to B~64-128 images on one v5e;
        # beyond that, batch down or extend the DfTable tier to this path
        df = containment_df(gr, gr.reshape(B, R * Lr),
                            vr.reshape(B, R * Lr))   # [B, R, Lr]
        idf = ref_len_log - jnp.log(jnp.maximum(1.0, df))

        # expected frequency of each ref gram position's gram in the hypothesis:
        # sum_m logres[t+m, w_m] with tail truncation, exp(/(n+1)), mean over t
        acc = jnp.zeros((B, R, Lr, T))
        for m in range(n):
            w_m = jnp.roll(refs, -m, axis=-1)        # token at gram offset m
            # lp[b, r, j, t] = logres[b, t, w_m[b, r, j]]
            lp = jnp.take_along_axis(
                logres[:, None, None, :, :],
                w_m[..., None, None].astype(jnp.int32).clip(0, C - 1),
                axis=-1)[..., 0]                     # [B, R, Lr, T]
            if m == 0:
                acc = acc + lp
            else:
                # res_freq[:, :-m] += mult[:, m:]  (cider_scorer.py:180-183)
                acc = acc.at[..., : T - m].add(lp[..., m:])
        # reference indexes n from 0: exp(acc / gram_len), mean over T-(len-1)
        efreq = jnp.sum(jnp.exp(acc / n), axis=-1) / (T - (n - 1))  # [B,R,Lr]

        ref_freq = tf / jnp.maximum(tf_total[..., None], 1e-9)
        inter = jnp.minimum(efreq, ref_freq) * idf
        # distinct grams once: weight each position by valid/tf
        w = vr * jnp.where(tf > 0, 1.0 / jnp.maximum(tf, 1e-9), 0.0)
        score_n = jnp.sum(inter * w, axis=-1)        # [B, R]
        has_grams = (tf_total > 0).astype(jnp.float32)
        total = total + score_n * has_grams
        n_count = n_count + has_grams

    per_ref = jnp.where(n_count > 0, total / jnp.maximum(n_count, 1.0), 0.0)
    n_refs = jnp.maximum(jnp.sum(ref_mask, axis=1), 1.0)
    return jnp.sum(per_ref * ref_mask, axis=1) / n_refs * 10.0


def soft_cider_loss(soft_seq, refs, ref_mask):
    """Loss = -mean soft CIDEr of the relaxed caption distributions.

    soft_seq: [B, L, V+2] relaxed one-hot/soft sequence from the sampler (the
    trailing BOS column is dropped to match the logit vocabulary)."""
    res = soft_seq[..., :-1]
    scores = soft_cider_scores(res, refs, ref_mask)
    return -jnp.mean(scores)
