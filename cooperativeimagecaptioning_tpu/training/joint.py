"""Cooperative joint model: loss composition + alternating-turn semantics
(ref: models/AlternatingJointModel.py).

Total loss (ref :433-504):
    loss = caption_loss_weight * XE
         + vse_loss_weight * contrastive(GT captions)
         + retrieval_reward_weight * DISC
         + cider_optimization * CIDEr-RL
where DISC is either REINFORCE over the listener's per-sample retrieval loss with a
{greedy, gt, no} baseline (ref :226-332), or the differentiable straight-through /
partial-sampling path feeding relaxed one-hot captions into the listener (ref
:343-376).  Alternating turns zero out loss groups per agent (ref :507-555).

TPU-native structure: self-critical rewards need host-side CIDEr-D string scoring,
so a training iteration is two jitted stages sharing one PRNG key —
  stage A `sample_for_reward`: decode sampled + greedy captions (no grad);
  host: CIDEr-D reward;
  stage B `loss_fn` (grad): recomputes the *identical* sampled trajectory (same
  rng) inside the gradient graph and consumes the reward as a constant.
Non-cider configurations skip stage A entirely and run a single fused step.
"""

from __future__ import annotations

from typing import Any, NamedTuple

import jax
import jax.numpy as jnp

from cooperativeimagecaptioning_tpu import models as model_zoo
from cooperativeimagecaptioning_tpu.models import vse
from cooperativeimagecaptioning_tpu.ops import decoding, losses

ONE_HOT_MODES = ("gumbel", "multinomial", "gumbel_softmax", "multinomial_soft")
_MODE_MAP = {
    "gumbel": "gumbel_st",
    "multinomial": "multinomial_st",
    "gumbel_softmax": "gumbel_soft",
    "multinomial_soft": "multinomial_soft",
}


class Hyper(NamedTuple):
    """Traced per-iteration hyperparameters (annealed without recompiling).

    Mirrors the schedule targets of train.py:416-435."""
    ss_prob: Any
    gumbel_temp: Any
    multinomial_temp: Any
    prob_gumbel_softmax: Any
    prob_multinomial_soft: Any
    caption_loss_weight: Any
    vse_loss_weight: Any
    retrieval_reward_weight: Any
    cider_weight: Any
    vse_max_w: Any

    @classmethod
    def from_opt(cls, opt):
        return cls(
            ss_prob=jnp.float32(getattr(opt, "ss_prob", 0.0)),
            gumbel_temp=jnp.float32(opt.gumbel_temp),
            multinomial_temp=jnp.float32(opt.multinomial_temp),
            prob_gumbel_softmax=jnp.float32(opt.prob_gumbel_softmax),
            prob_multinomial_soft=jnp.float32(opt.prob_multinomial_soft),
            caption_loss_weight=jnp.float32(opt.caption_loss_weight),
            vse_loss_weight=jnp.float32(opt.vse_loss_weight),
            retrieval_reward_weight=jnp.float32(opt.retrieval_reward_weight),
            cider_weight=jnp.float32(opt.cider_optimization),
            vse_max_w=jnp.float32(opt.vse_max_violation),
        )


def has_listener(opt) -> bool:
    return opt.vse_model != "None"


def init_params(rng, opt):
    """Build the joint param tree {'speaker': ..., 'listener': ...}.

    With share_embed (ref :83-88) the word-embedding table is stored only under
    the listener and injected into the speaker view, so one optimizer update
    keeps them identical by construction (vs the reference's aliased nn.Parameter
    + post-step identity check, train.py:132-140).
    """
    k_spk, k_vse = jax.random.split(rng)
    speaker_mod = model_zoo.setup(opt, opt.caption_model, "caption_model")
    params = {"speaker": speaker_mod.init_params(k_spk, opt)}
    if has_listener(opt):
        params["listener"] = vse.init_params(k_vse, opt)
        if opt.share_embed:
            del params["speaker"]["embed"]
    return params


def speaker_view(params, opt):
    """Speaker params with the shared embedding injected (frozen in phase 2,
    ref :86-88)."""
    sp = params["speaker"]
    if opt.share_embed and "listener" in params:
        sp = dict(sp)
        emb = params["listener"]["txt_enc"]["embed"]
        if opt.phase == 2:
            emb = jax.lax.stop_gradient(emb)
        sp["embed"] = emb
    return sp


def _prepend_bos_ids(seq, vocab_size):
    """cat(BOS column, seq) (ref :238-240)."""
    B = seq.shape[0]
    bos = jnp.full((B, 1), vocab_size + 1, seq.dtype)
    return jnp.concatenate([bos, seq], axis=1)


def _prepend_bos_one_hot(soft_seq, vocab_size):
    """One-hot BOS row prepended to relaxed sequences (ref :358-370)."""
    B, _, C = soft_seq.shape
    bos = jnp.zeros((B, 1, C), soft_seq.dtype).at[:, 0, vocab_size + 1].set(1.0)
    return jnp.concatenate([bos, soft_seq], axis=1)


def _rngs(rng):
    """Named rng split shared by stage A and stage B (keeps trajectories equal)."""
    keys = jax.random.split(rng, 5)
    return {"xe": keys[0], "disc": keys[1], "cider": keys[2],
            "greedy": keys[3], "listener": keys[4]}


def _sample_kwargs(opt, hp, train):
    return dict(
        gumbel_temp=hp.gumbel_temp,
        multinomial_temp=hp.multinomial_temp,
        prob_gumbel_softmax=hp.prob_gumbel_softmax,
        prob_multinomial_soft=hp.prob_multinomial_soft,
        decoding_constraint=opt.decoding_constraint,
        train=train, drop_prob=opt.drop_prob_lm if train else 0.0,
        remat=bool(getattr(opt, "remat", 0)) and train,
    )


def _cider_reuses_disc(opt, turn) -> bool:
    """Whether the CIDEr branch reuses the DISC branch's sample
    (ref :490-495: re-sample for soft modes or when DISC inactive)."""
    return (opt.retrieval_reward_weight > 0 and has_listener(opt)
            and turn != "listener"
            and opt.retrieval_reward in ("reinforce", "gumbel", "multinomial"))


def _disc_active(opt, turn) -> bool:
    return (opt.retrieval_reward_weight > 0 and has_listener(opt)
            and turn != "listener")


def _cider_active(opt, turn) -> bool:
    return opt.cider_optimization > 0 and turn != "listener"


def sample_for_reward(modules, params, opt, batch, rng, hp, turn, train=True):
    """Stage A: the (gen_result, greedy_res) pair the CIDEr reward needs
    (ref :378-403).  Must consume rngs exactly like loss_fn's cider trajectory."""
    spk = modules["speaker"]
    sp = speaker_view(params, opt)
    r = _rngs(rng)
    kw = _sample_kwargs(opt, hp, train)
    ctx = spk.encode_features(sp, batch["fc_feats"], batch.get("att_feats"),
                              batch.get("att_masks"), r["xe"], train,
                              drop_prob=kw["drop_prob"])
    if _cider_reuses_disc(opt, turn):
        mode = _MODE_MAP.get(opt.retrieval_reward, "sample")
        out = decoding.sample(spk, sp, ctx, opt.seq_length, r["disc"],
                              mode=mode, temperature=1.0, **kw)
    else:
        out = decoding.sample(spk, sp, ctx, opt.seq_length, r["cider"],
                              mode="sample", temperature=1.0, **kw)
    greedy = decoding.sample(spk, sp, ctx, opt.seq_length, r["greedy"],
                             mode="greedy", **kw)
    return out.seq, greedy.seq


def loss_fn(modules, params, opt, batch, rng, hp, turn, reward, train=True):
    """Stage B: total loss + aux dict (keys mirror the reference `_loss` dict).

    turn: 'speaker' | 'listener' | 'optimizer' (non-alternating);
    reward: [B] float coefficient for the CIDEr branch (zeros when inactive) —
    already differenced / raw per `use_gen_cider_scores` on the host.
    """
    spk = modules["speaker"]
    sp = speaker_view(params, opt)
    r = _rngs(rng)
    kw = _sample_kwargs(opt, hp, train)
    drop = kw["drop_prob"]
    aux = {}
    V = opt.vocab_size
    fc = batch["fc_feats"]
    att = batch.get("att_feats")
    att_masks = batch.get("att_masks")
    labels = batch["labels"]
    masks = batch["masks"]

    ctx = spk.encode_features(sp, fc, att, att_masks, r["xe"], train,
                              drop_prob=drop)
    loss = jnp.float32(0.0)

    if turn == "listener":
        # Listener turn (ref :528-555): MLE/cider/disc zeroed; train the listener
        # on captions sampled from the (frozen) speaker.
        out = decoding.sample(spk, sp, ctx, opt.seq_length, r["listener"],
                              mode="sample", temperature=1.0, **kw)
        seqs = _prepend_bos_ids(jax.lax.stop_gradient(out.seq), V)
        smasks = losses.masks_from_seq(out.seq)
        loss_vse = vse.forward(params["listener"], opt, fc, att, seqs, smasks,
                               only_one_retrieval=opt.only_one_retrieval,
            max_violation_w=hp.vse_max_w)
        loss = hp.vse_loss_weight * loss_vse
        aux["loss_vse"] = loss_vse
        aux["vse_contrastive"] = loss_vse
        return loss, aux

    # ---- MLE (ref :196-207) ----
    if opt.caption_loss_weight > 0:
        if getattr(opt, "remat", 0):
            # fused CE + rematerialized scan body: no [B, T, V+1] residual
            loss_cap = decoding.teacher_forced_loss(
                spk, sp, ctx, labels[:, :-1], labels[:, 1:], masks[:, 1:],
                r["xe"], train, drop, hp.ss_prob)
        else:
            lps = decoding.teacher_forced_logprobs(
                spk, sp, ctx, labels[:, :-1], r["xe"], train, drop,
                hp.ss_prob)
            loss_cap = losses.language_model_criterion(
                lps, labels[:, 1:], masks[:, 1:])
        loss = loss + hp.caption_loss_weight * loss_cap
        aux["loss_cap"] = loss_cap
        aux["cap_xe"] = loss_cap

    # ---- GT contrastive (ref :209-224); zeroed on speaker turn (ref :516-518) ----
    if opt.vse_loss_weight > 0 and has_listener(opt) and turn != "speaker":
        loss_vse = vse.forward(params["listener"], opt, fc, att, labels, masks,
                               only_one_retrieval=opt.only_one_retrieval,
            max_violation_w=hp.vse_max_w)
        loss = loss + hp.vse_loss_weight * loss_vse
        aux["loss_vse"] = loss_vse
        aux["vse_contrastive"] = loss_vse

    gen_logprobs = None
    gen_masks = None
    gen_seq = None

    # ---- DISC (ref :455-488) ----
    if _disc_active(opt, turn):
        if opt.retrieval_reward == "reinforce":
            out = decoding.sample(spk, sp, ctx, opt.seq_length, r["disc"],
                                  mode="sample", temperature=1.0, **kw)
            _masks = losses.masks_from_seq(out.seq)
            _seqs = _prepend_bos_ids(out.seq, V)
            retrieval_loss = vse.forward(
                params["listener"], opt, fc, att, _seqs, _masks,
                whole_batch=True, only_one_retrieval=opt.only_one_retrieval,
            max_violation_w=hp.vse_max_w)
            if opt.reinforce_baseline_type == "greedy":
                # volatile=True in the ref (:255-258): no grad through the
                # baseline decode — cut it out of the backward graph entirely
                sg = jax.lax.stop_gradient
                gout = decoding.sample(spk, sg(sp), jax.tree.map(
                    lambda x: None if x is None else sg(x), ctx,
                    is_leaf=lambda x: x is None), opt.seq_length,
                    r["greedy"], mode="greedy", **kw)
                g_seqs = _prepend_bos_ids(jax.lax.stop_gradient(gout.seq), V)
                g_masks = losses.masks_from_seq(gout.seq)
                baseline = vse.forward(
                    params["listener"], opt, fc, att, g_seqs, g_masks,
                    whole_batch=True, only_one_retrieval=opt.only_one_retrieval,
            max_violation_w=hp.vse_max_w)
            elif opt.reinforce_baseline_type == "gt":
                baseline = vse.forward(
                    params["listener"], opt, fc, att, labels, masks,
                    whole_batch=True, only_one_retrieval=opt.only_one_retrieval,
            max_violation_w=hp.vse_max_w)
            else:
                baseline = jnp.zeros_like(retrieval_loss)
            coeff = jax.lax.stop_gradient(retrieval_loss - baseline)
            sc_loss = losses.self_critical_loss(out.logprobs, coeff, _masks)
            loss = loss + hp.retrieval_reward_weight * sc_loss
            aux["retrieval_sc_loss"] = sc_loss
            aux["retrieval_loss"] = jnp.sum(retrieval_loss)
            aux["retrieval_loss_greedy"] = jnp.sum(baseline)
            gen_seq, gen_logprobs, gen_masks = out.seq, out.logprobs, _masks
        else:
            # Straight-through / partial-sampling (ref :343-376)
            mode = _MODE_MAP[opt.retrieval_reward]
            out = decoding.sample(spk, sp, ctx, opt.seq_length, r["disc"],
                                  mode=mode, temperature=1.0, **kw)
            _masks = losses.masks_from_seq(out.seq)
            _seqs = _prepend_bos_one_hot(out.soft, V)
            loss_vse_disc = vse.forward(
                params["listener"], opt, fc, att, _seqs, _masks,
                only_one_retrieval=opt.only_one_retrieval,
            max_violation_w=hp.vse_max_w)
            loss = loss + hp.retrieval_reward_weight * loss_vse_disc
            aux["retrieval_loss"] = loss_vse_disc
            gen_seq, gen_logprobs, gen_masks = out.seq, out.logprobs, _masks
            gen_soft = out.soft

    # ---- CIDEr self-critical (ref :489-503) ----
    if _cider_active(opt, turn):
        if getattr(opt, "soft_cider", 0) and _disc_active(opt, turn) and \
                opt.retrieval_reward in ONE_HOT_MODES and "refs" in batch:
            # Differentiable soft-CIDEr over the relaxed distributions — the
            # capability the reference wired (--soft_cider/--df, cider_diff
            # import at AlternatingJointModel.py:53) but never called.
            from cooperativeimagecaptioning_tpu.rewards import cider_diff
            loss_cider = cider_diff.soft_cider_loss(
                gen_soft, batch["refs"], batch["ref_mask"])
            loss = loss + hp.cider_weight * loss_cider
            aux["loss_cider"] = loss_cider
            return loss, aux
        if not _cider_reuses_disc(opt, turn):
            out = decoding.sample(spk, sp, ctx, opt.seq_length, r["cider"],
                                  mode="sample", temperature=1.0, **kw)
            gen_seq = out.seq
            gen_logprobs = out.logprobs
            gen_masks = losses.masks_from_seq(out.seq)
        if getattr(opt, "on_device_cider", 0) and "refs" in batch:
            # fused performance tier: hashed-ngram CIDEr-D inside the step
            from cooperativeimagecaptioning_tpu.rewards import ngram_device
            sg = jax.lax.stop_gradient
            greedy = decoding.sample(spk, sg(sp), jax.tree.map(
                lambda x: None if x is None else sg(x), ctx,
                is_leaf=lambda x: x is None), opt.seq_length,
                r["greedy"], mode="greedy", **kw).seq
            scores, cider_gen, cider_greedy = \
                ngram_device.ciderd_rewards_device(
                    jax.lax.stop_gradient(gen_seq),
                    jax.lax.stop_gradient(greedy),
                    batch["refs"], batch["ref_mask"],
                    seq_per_img=opt.seq_per_img,
                    df_table=batch.get("df_table"))
            reward = cider_gen if opt.use_gen_cider_scores else scores
            aux["avg_reward"] = jnp.mean(scores)
            aux["cider_greedy"] = cider_greedy
        loss_cider = losses.self_critical_loss(
            gen_logprobs, -jax.lax.stop_gradient(reward), gen_masks)
        loss = loss + hp.cider_weight * loss_cider
        aux["loss_cider"] = loss_cider

    return loss, aux


def make_raw_fns(opt, turn: str):
    """Unjitted (sample_fn, value_and_grad_fn) pair for a static turn.

    The per-step path jits these directly (make_step_fns); the fused
    multi-step trainer (training/loop.py Trainer._chunk_fn) embeds them in a
    lax.scan body so K iterations compile into ONE device program."""
    modules = {"speaker": model_zoo.setup(opt, opt.caption_model,
                                          "caption_model")}

    def _sample(params, batch, rng, hp):
        return sample_for_reward(modules, params, opt, batch, rng, hp, turn)

    def _loss(params, batch, rng, hp, reward):
        return loss_fn(modules, params, opt, batch, rng, hp, turn, reward)

    return _sample, jax.value_and_grad(_loss, has_aux=True)


def make_step_fns(opt, turn: str):
    """Build (sample_fn, value_and_grad_fn) jitted for a given static turn."""
    sample, grad = make_raw_fns(opt, turn)
    return jax.jit(sample), jax.jit(grad)


def uses_soft_cider(opt, turn: str) -> bool:
    return (getattr(opt, "soft_cider", 0) and _disc_active(opt, turn)
            and opt.retrieval_reward in ONE_HOT_MODES)


def needs_device_refs(opt) -> bool:
    return bool(getattr(opt, "on_device_cider", 0) or
                getattr(opt, "soft_cider", 0))


def needs_reward(opt, turn: str) -> bool:
    """Host reward stage needed (off when a device tier handles it)."""
    return (_cider_active(opt, turn)
            and not getattr(opt, "on_device_cider", 0)
            and not uses_soft_cider(opt, turn))
