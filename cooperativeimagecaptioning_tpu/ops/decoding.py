"""lax.scan decoders: teacher-forced forward, multi-mode sampling, on-device beam
search.  Generic over the speaker module interface (fc_model / att_model).

TPU-first redesign of the reference's Python-level per-step loops:
  - teacher forcing    ref: AttModel.py:103-148, FCModel.py:91-131
  - sampling (5 modes) ref: AttModel.py:291-452, FCModel.py:260-327
  - beam search        ref: AttModel.py:150-289, FCModel.py:133-258

The reference breaks out of time loops when every sequence hits EOS and truncates
outputs; here every loop is a fixed `seq_length`-step lax.scan with an `unfinished`
mask, so the emitted sequences are zero-padded to full length — numerically identical
under the masked losses (mask construction `(seq > 0)[:, :-1]` is padding-invariant).

Beam search is fully vectorized: the beam dimension is folded into batch, candidate
expansion is a top-k over beam x vocab, and recurrent state is gathered by beam
index — replacing the reference's per-image / per-candidate Python loops and
per-step device->host copies (AttModel.py:202).
"""

from __future__ import annotations

from typing import Any, NamedTuple

import jax
import jax.numpy as jnp

from cooperativeimagecaptioning_tpu.ops import relaxations

NEG_INF = -1e38


class SampleOutput(NamedTuple):
    seq: Any          # [B, L] int32 — sampled word ids, 0-padded after EOS
    logprobs: Any     # [B, L] float — per-step logprob of the sampled word
    soft: Any = None  # [B, L, V+2] relaxed one-hot/soft vectors (one-hot modes only)


# ---------------------------------------------------------------------------
# Teacher-forced forward
# ---------------------------------------------------------------------------

def teacher_forced_logprobs(module, params, ctx, inputs, rng=None, train=False,
                            drop_prob=0.0, ss_prob=0.0):
    """Log-probs for each next-token prediction.

    inputs: [B, T] token ids — the reference feeds labels[:, :-1] (column 0 is the
    zero pad that acts as the training-time start token; ref FCModel.py:115,
    AttModel.py:131).  Returns [B, T, V+1] logprobs aligned with targets
    labels[:, 1:].

    Scheduled sampling (ref: AttModel.py:118-129): for step j >= 1, each row is
    replaced with prob `ss_prob` by a sample from the previous step's predictive
    distribution.
    """
    B, T = inputs.shape
    if rng is None:
        rng = jax.random.PRNGKey(0)
    state = module.init_state(params, B)
    rng, rng_prefix = jax.random.split(rng)
    for pe in module.prefix_embeddings(params, ctx, rng=rng_prefix, train=train):
        rng, r_step = jax.random.split(rng)
        state, _ = module.step(params, ctx, state, pe, r_step, train, drop_prob)

    nclass = params["logit"]["w"].shape[1]
    lp0 = jnp.zeros((B, nclass), jnp.float32)
    use_ss = train and (not isinstance(ss_prob, float) or ss_prob > 0.0)
    ss_prob = jnp.asarray(ss_prob, jnp.float32)

    def body(carry, xs):
        state, prev_lp, rng = carry
        j, it = xs
        rng, r_mask, r_draw, r_emb, r_step = jax.random.split(rng, 5)
        if use_ss:
            replace = (jax.random.uniform(r_mask, (B,)) < ss_prob) & (j >= 1)
            sampled = jax.random.categorical(r_draw, prev_lp, axis=-1)
            it = jnp.where(replace, sampled.astype(it.dtype), it)
        xt = module.embed_token(params, it, r_emb, train, drop_prob)
        state, out = module.step(params, ctx, state, xt, r_step, train, drop_prob)
        lp = jax.nn.log_softmax(module.logits(params, out), axis=-1)
        return (state, lp, rng), lp

    xs = (jnp.arange(T), jnp.moveaxis(inputs, 1, 0))
    (_, _, _), lps = jax.lax.scan(body, (state, lp0, rng), xs)
    return jnp.moveaxis(lps, 0, 1)  # [B, T, V+1]


def teacher_forced_loss(module, params, ctx, inputs, targets, masks, rng=None,
                        train=False, drop_prob=0.0, ss_prob=0.0):
    """Fused masked-NLL teacher forcing (--remat 1 path).

    Identical math (and identical rng consumption) to
    teacher_forced_logprobs + language_model_criterion, but the per-step CE
    is reduced inside the scan — the [B, T, V+1] logprob tensor is never
    materialized — and the scan body is jax.checkpoint'ed, so backward
    rematerializes each step's logits instead of storing them.  At B=8192,
    vocab 9487, L=16 that removes a ~5 GB f32 residual, trading one extra
    vocab matmul per step; it is what makes very large-batch training
    compile on a single v5e chip.
    """
    B, T = inputs.shape
    targets = targets[:, :T]
    masks = masks[:, :T]
    if rng is None:
        rng = jax.random.PRNGKey(0)
    state = module.init_state(params, B)
    rng, rng_prefix = jax.random.split(rng)
    for pe in module.prefix_embeddings(params, ctx, rng=rng_prefix,
                                       train=train):
        rng, r_step = jax.random.split(rng)
        state, _ = module.step(params, ctx, state, pe, r_step, train,
                               drop_prob)

    nclass = params["logit"]["w"].shape[1]
    lp0 = jnp.zeros((B, nclass), jnp.float32)
    use_ss = train and (not isinstance(ss_prob, float) or ss_prob > 0.0)
    ss_prob = jnp.asarray(ss_prob, jnp.float32)

    def body(carry, xs):
        state, prev_lp, rng, num, den = carry
        j, it, tgt, msk = xs
        rng, r_mask, r_draw, r_emb, r_step = jax.random.split(rng, 5)
        if use_ss:
            replace = (jax.random.uniform(r_mask, (B,)) < ss_prob) & (j >= 1)
            sampled = jax.random.categorical(r_draw, prev_lp, axis=-1)
            it = jnp.where(replace, sampled.astype(it.dtype), it)
        xt = module.embed_token(params, it, r_emb, train, drop_prob)
        state, out = module.step(params, ctx, state, xt, r_step, train,
                                 drop_prob)
        lp = jax.nn.log_softmax(module.logits(params, out), axis=-1)
        picked = jnp.take_along_axis(lp, tgt[:, None], axis=1)[:, 0]
        num = num + jnp.sum(picked * msk)
        den = den + jnp.sum(msk)
        return (state, lp, rng, num, den), None

    xs = (jnp.arange(T), jnp.moveaxis(inputs, 1, 0),
          jnp.moveaxis(targets, 1, 0), jnp.moveaxis(masks, 1, 0))
    carry0 = (state, lp0, rng, jnp.float32(0.0), jnp.float32(0.0))
    (_, _, _, num, den), _ = jax.lax.scan(jax.checkpoint(body), carry0, xs)
    return -num / den


# ---------------------------------------------------------------------------
# Sampling
# ---------------------------------------------------------------------------

def _make_selector(mode, temperature, gumbel_temp, multinomial_temp,
                   prob_gumbel_softmax, prob_multinomial_soft):
    """Token selector: (rng, logprobs) -> (it, sample_lp, relaxed_or_None).

    Mode mapping from reference flags (AttModel.py:327-392, FCModel.py:281-301):
      greedy           sample_max == 1
      gumbel_noise_max sample_max == 2 (FCModel.py:284-289)
      sample           multinomial draw at `temperature` (reinforce / plain)
      gumbel_st        retrieval_reward == 'gumbel'
      multinomial_st   retrieval_reward == 'multinomial'
      gumbel_soft      retrieval_reward == 'gumbel_softmax'
      multinomial_soft retrieval_reward == 'multinomial_soft'
    """
    def gather(lp, it):
        return jnp.take_along_axis(lp, it[:, None], axis=1)[:, 0]

    if mode == "greedy":
        def select(rng, lp):
            it = jnp.argmax(lp, axis=-1)
            return it, jnp.max(lp, axis=-1), None
    elif mode == "gumbel_noise_max":
        def select(rng, lp):
            # ref FCModel.py:285-289: noise = -log(-log(U+eps)+eps), eps=1e-9
            g = jax.random.uniform(rng, lp.shape)
            noise = -jnp.log(-jnp.log(g + 1e-9) + 1e-9)
            perturbed = (lp + noise) / temperature
            it = jnp.argmax(perturbed, axis=-1)
            return it, jnp.max(perturbed, axis=-1), None
    elif mode == "sample":
        def select(rng, lp):
            it = jax.random.categorical(rng, lp / temperature, axis=-1)
            return it, gather(lp, it), None
    elif mode == "gumbel_st":
        def select(rng, lp):
            relaxed, it = relaxations.gumbel_st(rng, lp, gumbel_temp)
            return it, gather(lp, it), relaxed
    elif mode == "multinomial_st":
        def select(rng, lp):
            relaxed, it = relaxations.multinomial_st(rng, lp, multinomial_temp)
            return it, gather(lp, it), relaxed
    elif mode == "gumbel_soft":
        def select(rng, lp):
            relaxed, it = relaxations.gumbel_soft(
                rng, lp, gumbel_temp, prob_gumbel_softmax)
            return it, gather(lp, it), relaxed
    elif mode == "multinomial_soft":
        def select(rng, lp):
            relaxed, it = relaxations.multinomial_soft(
                rng, lp, multinomial_temp, prob_multinomial_soft)
            return it, gather(lp, it), relaxed
    else:
        raise ValueError(f"unknown sampling mode: {mode}")
    return select


def sample(module, params, ctx, seq_length, rng, mode="greedy", temperature=1.0,
           gumbel_temp=10.0, multinomial_temp=1.0, prob_gumbel_softmax=0.25,
           prob_multinomial_soft=0.25, decoding_constraint=0, train=False,
           drop_prob=0.0, remat=False):
    """Autoregressive sampling under a fixed-length lax.scan.

    Step order matches the reference loop (AttModel.py:323-444): select a token
    from the previous step's logprobs, record it (masked by `unfinished`), embed
    the *raw* token (hard modes) or the *unmodified* soft vector (soft modes,
    AttModel.py:395-399), then run the core.  The relaxed emission recorded in
    `soft` is post-masking with finished rows replaced by the EOS one-hot
    (AttModel.py:416-433).
    """
    one_hot_mode = mode in ("gumbel_st", "multinomial_st",
                            "gumbel_soft", "multinomial_soft")
    select = _make_selector(mode, temperature, gumbel_temp, multinomial_temp,
                            prob_gumbel_softmax, prob_multinomial_soft)

    if "att_feats_t" in ctx:  # K-major decode layout: batch on axis 1
        B = ctx["att_feats_t"].shape[1]
    else:
        fc_or_att = ctx.get(
            "att_feats", ctx.get("att_feats_q", ctx.get("fc_feats")))
        B = fc_or_att.shape[0]
    nclass = params["logit"]["w"].shape[1]  # V+1
    vocab_plus2 = nclass + 1                # V+2
    bos = nclass  # BOS id = vocab_size + 1 = nclass (ref: FCModel.py:279)

    state = module.init_state(params, B)
    rng, rng_prefix = jax.random.split(rng)
    for pe in module.prefix_embeddings(params, ctx, rng=rng_prefix, train=train):
        rng, r_step = jax.random.split(rng)
        state, _ = module.step(params, ctx, state, pe, r_step, train, drop_prob)

    # Fused-greedy fast path: the carry holds only (argmax, its logprob) per row
    # instead of the full [B, V+1] log-softmax — the Pallas logit head streams
    # vocab tiles through VMEM and never materializes logits in HBM.
    use_fused = mode == "greedy" and not decoding_constraint

    def head(out):
        if use_fused:
            from cooperativeimagecaptioning_tpu.ops.pallas import logit_head
            return logit_head.greedy_head(
                out, params["logit"]["w"], params["logit"]["b"])
        return jax.nn.log_softmax(module.logits(params, out), axis=-1)

    def select_from(rng, sel):
        if use_fused:
            it, sample_lp = sel
            return it, sample_lp, None
        return select(rng, sel)

    # t = 0: BOS step
    rng, r_emb, r_step = jax.random.split(rng, 3)
    xt = module.embed_token(params, jnp.full((B,), bos, jnp.int32),
                            r_emb, train, drop_prob)
    state, out = module.step(params, ctx, state, xt, r_step, train, drop_prob)
    lp = head(out)

    eos_one_hot = jnp.zeros((vocab_plus2,)).at[0].set(1.0)

    def emit(it, sample_lp, relaxed, unfinished, t):
        """Apply the unfinished-mask bookkeeping of AttModel.py:401-434."""
        unfinished = jnp.where(t == 1, it > 0, unfinished & (it > 0))
        it_masked = it * unfinished.astype(it.dtype)
        if one_hot_mode:
            oh = jnp.concatenate(
                [relaxed, jnp.zeros((B, 1), relaxed.dtype)], axis=1)  # [B, V+2]
            # (jnp.where alone realizes the reference's mask-then-replace,
            # AttModel.py:416-433 — a separate pre-multiply is redundant)
            oh = jnp.where(unfinished[:, None], oh, eos_one_hot[None, :])
        else:
            # zero-width placeholder: scan still stacks it, but it costs nothing
            oh = jnp.zeros((B, 0), jnp.float32)
        return unfinished, it_masked, sample_lp, oh

    def body(carry, t):
        state, lp, unfinished, rng = carry
        rng, r_sel, r_emb, r_step = jax.random.split(rng, 4)
        it, sample_lp, relaxed = select_from(r_sel, lp)
        unfinished, it_masked, sample_lp, oh = emit(
            it, sample_lp, relaxed, unfinished, t)
        # Embed the *raw* sampled token / unmodified soft vector (see docstring).
        if one_hot_mode and mode in ("gumbel_soft", "multinomial_soft"):
            soft_in = jnp.concatenate(
                [relaxed, jnp.zeros((B, 1), relaxed.dtype)], axis=1)
            xt = module.embed_soft(params, soft_in, r_emb, train, drop_prob)
        else:
            xt = module.embed_token(params, it, r_emb, train, drop_prob)
        state, out = module.step(params, ctx, state, xt, r_step, train, drop_prob)
        if use_fused:
            lp = head(out)
        else:
            logits = module.logits(params, out)
            if decoding_constraint:
                penalty = jnp.zeros_like(logits).at[
                    jnp.arange(B), it_masked].set(NEG_INF)
                logits = logits + penalty
            lp = jax.nn.log_softmax(logits, axis=-1)
        return (state, lp, unfinished, rng), (it_masked, sample_lp, oh)

    unfinished0 = jnp.ones((B,), bool)
    carry = (state, lp, unfinished0, rng)
    if remat:
        # backward rematerializes each step (relaxed-sampling training at
        # very large batch: the per-step logits/relaxed residuals dominate)
        body = jax.checkpoint(body)
    if seq_length > 1:
        carry, (seqs, lps, ohs) = jax.lax.scan(
            body, carry, jnp.arange(1, seq_length))
        seqs = jnp.moveaxis(seqs, 0, 1)
        lps = jnp.moveaxis(lps, 0, 1)
        ohs = jnp.moveaxis(ohs, 0, 1)
    else:
        seqs = jnp.zeros((B, 0), jnp.int32)
        lps = jnp.zeros((B, 0))
        ohs = jnp.zeros((B, 0, vocab_plus2))
    # Final selection (reference iteration t == seq_length emits but skips using
    # the subsequent core step's logprobs).
    state, lp, unfinished, rng = carry
    rng, r_sel = jax.random.split(rng)
    it, sample_lp, relaxed = select_from(r_sel, lp)
    unfinished, it_masked, sample_lp, oh = emit(
        it, sample_lp, relaxed, unfinished, jnp.asarray(seq_length))
    seq = jnp.concatenate([seqs, it_masked[:, None]], axis=1)
    logprobs = jnp.concatenate([lps, sample_lp[:, None]], axis=1)
    soft = jnp.concatenate([ohs, oh[:, None]], axis=1) if one_hot_mode else None
    return SampleOutput(seq.astype(jnp.int32), logprobs, soft)


# ---------------------------------------------------------------------------
# Beam search
# ---------------------------------------------------------------------------

def _expand_for_beams(tree, m, axis=0):
    """Repeat each batch row m times along the batch axis
    ([B, ...] -> [B*m, ...]; axis=1 for the K-major ctx layout, whose
    every entry carries batch on axis 1)."""
    def rep(x):
        if x is None:
            return None
        return jnp.repeat(x, m, axis=axis)
    return jax.tree.map(rep, tree, is_leaf=lambda x: x is None)


def beam_search(module, params, ctx, seq_length, beam_size,
                decoding_constraint=0):
    """Vectorized on-device beam search (ref: AttModel.py:150-289).

    Semantics reproduced from the reference:
      * at the first merge step only beam 0 is active (AttModel.py:213-215);
      * a beam emitting EOS is recorded as done but *keeps decoding*
        (AttModel.py:259-266) — later re-records always score lower because
        per-step logprobs are <= 0, so a running max equals the reference's
        sort-by-p choice;
      * at the final step every beam is recorded (t == seq_length case);
      * ties: the reference sorts candidates stably by (word-rank, beam); we take
        the first maximum in candidate-rank order — identical unless two float
        sums tie exactly across different words.
    Returns SampleOutput(seq [B, L], logprobs [B, L]).
    """
    if "att_feats_t" in ctx:  # K-major decode layout: batch on axis 1
        B = ctx["att_feats_t"].shape[1]
    else:
        fc_or_att = ctx.get(
            "att_feats", ctx.get("att_feats_q", ctx.get("fc_feats")))
        B = fc_or_att.shape[0]
    m = beam_size
    nclass = params["logit"]["w"].shape[1]
    bos = nclass
    L = seq_length

    if "att_feats_t" in ctx:
        # K-major ctx: transposed entries (*_t) carry batch on axis 1,
        # the (b-major) mask on axis 0.  The barrier forces the expanded
        # context to MATERIALIZE before the decode scan — without it XLA
        # inlines the mid-axis repeat into every scan step's kernel input
        # (measured: 33k vs 66k captions/s at beam 2, B=2048)
        ectx = {k: (None if v is None else jax.lax.optimization_barrier(
                    jnp.repeat(v, m, axis=1 if k.endswith("_t") else 0)))
                for k, v in ctx.items()}
    else:
        ectx = _expand_for_beams(ctx, m)
    state = module.init_state(params, B * m)
    for pe in module.prefix_embeddings(params, ectx):
        state, _ = module.step(params, ectx, state, pe)

    # Fused beam head: per-beam top-k + lse come out of the vocab projection
    # directly (no [R, V] log-softmax, no sort).  With decoding_constraint one
    # word per beam may be forbidden, so fetch k = m+1 candidates and mask —
    # the masked top-m of those k equals the top-m of the masked distribution
    # (the reference masks BEFORE its per-beam sort, AttModel.py:203-218, but
    # AFTER log_softmax, so lse is over the full vocab either way).
    kk = m + 1 if decoding_constraint else m

    def head(out):
        from cooperativeimagecaptioning_tpu.ops.pallas import beam_head
        vals, idx, lse = beam_head.beam_head(
            out, params["logit"]["w"], params["logit"]["b"], kk)
        lp_vals = (vals - lse[:, None]).reshape(B, m, kk)
        return (lp_vals, idx.reshape(B, m, kk))

    xt = module.embed_token(params, jnp.full((B * m,), bos, jnp.int32))
    state, out = module.step(params, ectx, state, xt)
    lp = head(out)

    # Backpointer formulation (r5): the scan carries only (state, lp,
    # beam_sum, prev_c, best_p/best_t/best_j) and emits per-step
    # (q, c, r) backpointer rows; sequences are reconstructed ONCE after the
    # scan by a reverse backtrack.  Replaces the carried [B, m, L] seq/logps
    # gathers + at-sets + per-step [B, L] best-selects (the beam profiler's
    # "merge+bookkeeping" tier) with O(1) small stores per step; outputs are
    # bit-identical (tests/test_beam_golden.py pins ids vs the torch
    # reference at beam 2 and 5, with/without decoding_constraint).
    # Only beam 0 is active at the first merge (ref AttModel.py:213-215):
    # encode that in the initial sums instead of masking candidates per step.
    beam_sum = jnp.full((B, m), NEG_INF).at[:, 0].set(0.0)
    best_p = jnp.full((B,), NEG_INF)
    best_t = jnp.zeros((B,), jnp.int32)
    best_j = jnp.zeros((B,), jnp.int32)
    prev_c0 = jnp.zeros((B, m), jnp.int32)

    def merge(t, lp, beam_sum, prev_c, best_p, best_t, best_j):
        """One candidate expansion + reduction; returns the backpointer row
        (q source beams, c words, r per-step logprobs), new sums, and the
        updated best-done record (p, t, candidate index)."""
        # lp = (per-beam top-kk log-softmax values [B,m,kk], ids [B,m,kk]);
        # the global reduction over the m*m survivors is exactly the
        # reference's per-beam-cols-then-global construction
        # (AttModel.py:209-227)
        top_lp, top_i = lp
        if decoding_constraint:
            # ref AttModel.py:203-206: forbid repeating the word emitted at
            # t-2 (only for t > 1) — that word is the previous merge's c for
            # each current beam; reduce the masked kk=m+1 candidates back to
            # the per-beam top-m the reference's cols loop considers
            forbid = (top_i == prev_c[:, :, None]) & (t > 1)
            top_lp = jnp.where(forbid, NEG_INF, top_lp)
            top_lp, sel = jax.lax.top_k(top_lp, m)      # [B, m, m]
            top_i = jnp.take_along_axis(top_i, sel, axis=2)
        cand = beam_sum[:, :, None] + top_lp            # [B, m, m]
        p, flat_idx = jax.lax.top_k(cand.reshape(B, m * m), m)
        q = flat_idx // m
        c = jnp.take_along_axis(top_i.reshape(B, m * m), flat_idx, axis=1)
        r = jnp.take_along_axis(top_lp.reshape(B, m * m), flat_idx, axis=1)
        # done-beam recording: argmax = first max = candidate-rank order
        is_done = (c == 0) | (t == L)
        done_p = jnp.where(is_done, p, NEG_INF)
        cand_j = jnp.argmax(done_p, axis=1).astype(jnp.int32)
        cand_p = jnp.take_along_axis(done_p, cand_j[:, None], axis=1)[:, 0]
        improved = cand_p > best_p
        best_p = jnp.where(improved, cand_p, best_p)
        best_t = jnp.where(improved, jnp.asarray(t, jnp.int32), best_t)
        best_j = jnp.where(improved, cand_j, best_j)
        return q, c, r, p, best_p, best_t, best_j

    def body(carry, t):
        (state, lp, beam_sum, prev_c, best_p, best_t, best_j) = carry
        q, c, r, beam_sum, best_p, best_t, best_j = merge(
            t, lp, beam_sum, prev_c, best_p, best_t, best_j)

        # gather recurrent state by source beam
        def gather_state(x):
            xm = x.reshape((B, m) + x.shape[1:])
            xm = jnp.take_along_axis(
                xm, q.reshape((B, m) + (1,) * (x.ndim - 1)), axis=1)
            return xm.reshape((B * m,) + x.shape[1:])
        state = jax.tree.map(gather_state, state)
        xt = module.embed_token(params, c.reshape(B * m))
        new_state, out = module.step(params, ectx, state, xt)
        lp = head(out)
        return (new_state, lp, beam_sum, c, best_p, best_t, best_j), (q, c, r)

    carry = (state, lp, beam_sum, prev_c0, best_p, best_t, best_j)
    if L > 1:
        carry, (qs, cs, rs) = jax.lax.scan(body, carry, jnp.arange(1, L))
    else:
        qs = jnp.zeros((0, B, m), jnp.int32)
        cs = jnp.zeros((0, B, m), jnp.int32)
        rs = jnp.zeros((0, B, m))
    (state, lp, beam_sum, prev_c, best_p, best_t, best_j) = carry
    # final merge at t == L (no core step needed afterwards)
    q_l, c_l, r_l, _, best_p, best_t, best_j = merge(
        jnp.asarray(L), lp, beam_sum, prev_c, best_p, best_t, best_j)
    qs = jnp.concatenate([qs, q_l[None].astype(qs.dtype)], axis=0)
    cs = jnp.concatenate([cs, c_l[None].astype(cs.dtype)], axis=0)
    rs = jnp.concatenate([rs, r_l[None].astype(rs.dtype)], axis=0)

    # reverse backtrack: start at (best_t, best_j) and follow q pointers;
    # positions past best_t stay 0 (the carried formulation's zero-init)
    def back(carry, inputs):
        j = carry
        t, q_t, c_t, r_t = inputs
        j = jnp.where(t == best_t, best_j, j)
        active = t <= best_t
        word = jnp.where(active, jnp.take_along_axis(
            c_t, j[:, None], axis=1)[:, 0], 0)
        logp = jnp.where(active, jnp.take_along_axis(
            r_t, j[:, None], axis=1)[:, 0], 0.0)
        j = jnp.where(active, jnp.take_along_axis(
            q_t, j[:, None], axis=1)[:, 0].astype(jnp.int32), j)
        return j, (word, logp)

    ts = jnp.arange(L, 0, -1)
    _, (words, logps) = jax.lax.scan(
        back, jnp.zeros((B,), jnp.int32),
        (ts, qs[::-1], cs[::-1], rs[::-1]))
    best_seq = jnp.moveaxis(words[::-1], 0, 1).astype(jnp.int32)
    best_logps = jnp.moveaxis(logps[::-1], 0, 1)
    return SampleOutput(best_seq, best_logps)
