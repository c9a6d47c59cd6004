"""Fused on-device CIDEr reward inside the training step (performance tier)."""

import numpy as np
import pytest

from cooperativeimagecaptioning_tpu.training.loop import Trainer
from test_training import tiny_opt, tiny_dataset


@pytest.mark.slow
def test_training_with_on_device_cider():
    opt = tiny_opt(is_alternating=1, alternating_turn=["speaker", "listener"],
                   retrieval_reward="gumbel", retrieval_reward_weight=0.1,
                   cider_optimization=0.9, caption_loss_weight=1,
                   vse_loss_weight=0.1, phase=3, on_device_cider=1)
    tr = Trainer(opt, dataset=tiny_dataset(opt), verbose=False)
    for _ in range(2):
        loss_dict, turn, _ = tr.train_iteration()
        assert np.isfinite(loss_dict["loss"])
        assert "avg_reward" in loss_dict
        assert "cider_greedy" in loss_dict
        assert "loss_cider" in loss_dict


@pytest.mark.slow
def test_on_device_matches_host_reward_path():
    """Same config, host vs device reward tier: losses should be close (same
    trajectories via shared rng; rewards computed by the two tiers agree)."""
    import jax
    common = dict(retrieval_reward="multinomial", retrieval_reward_weight=0.2,
                  cider_optimization=0.8, caption_loss_weight=1,
                  vse_loss_weight=0, phase=3, drop_prob_lm=0.0,
                  learning_rate=0.0)
    opt_host = tiny_opt(**common)
    opt_dev = tiny_opt(on_device_cider=1, **common)
    ds = tiny_dataset(opt_host)
    tr_h = Trainer(opt_host, dataset=ds, verbose=False, rng_seed=7)
    tr_d = Trainer(opt_dev, dataset=tiny_dataset(opt_dev), verbose=False,
                   rng_seed=7)
    # identical params and data stream
    tr_d.params = jax.tree.map(lambda x: x, tr_h.params)
    data = tr_h.loader.get_batch("train")
    ld_h, _, _ = tr_h.train_iteration(data=data)
    ld_d, _, _ = tr_d.train_iteration(data=data)
    assert abs(ld_h["avg_reward"] - ld_d["avg_reward"]) < 1e-3
    assert abs(ld_h["loss"] - ld_d["loss"]) < 1e-3


@pytest.mark.slow
def test_training_with_soft_cider():
    """Flag-gated differentiable soft-CIDEr path (--soft_cider 1)."""
    opt = tiny_opt(is_alternating=1, alternating_turn=["speaker", "listener"],
                   retrieval_reward="gumbel_softmax",
                   retrieval_reward_weight=0.1, cider_optimization=0.9,
                   caption_loss_weight=1, vse_loss_weight=0.1, phase=3,
                   soft_cider=1)
    tr = Trainer(opt, dataset=tiny_dataset(opt), verbose=False)
    for _ in range(2):
        loss_dict, _, _ = tr.train_iteration()
        assert np.isfinite(loss_dict["loss"])
        assert "loss_cider" in loss_dict
        assert "avg_reward" not in loss_dict  # no REINFORCE reward stage


@pytest.mark.slow
def test_scst_does_not_minimize_its_objective():
    """Sign-regression guard for the SCST estimator: with the correct sign,
    avg_reward (expected sampled CIDEr-D minus the greedy baseline) stays
    ~flat-to-rising on this tiny noisy task (measured: 0.18 -> 0.17); a
    flipped surrogate sign actively MINIMIZES the objective and craters it.
    Greedy-decode CIDEr is deliberately NOT asserted — on synthetic
    per-position-independent refs the optimal sampling policy is multimodal
    and argmax decoding decouples from the objective (see STATUS.md round-3
    notes; at full dims avg_reward climbs -0.25 -> +0.13)."""
    import os, tempfile
    import numpy as np
    work = tempfile.mkdtemp(prefix="cic_scst_ctl_")
    mopt = tiny_opt(phase=2, caption_loss_weight=1, vse_loss_weight=0,
                    batch_size=8, checkpoint_path=os.path.join(work, "mle"))
    os.makedirs(mopt.checkpoint_path)
    ds = tiny_dataset(mopt)
    tr = Trainer(mopt, dataset=ds, verbose=False, rng_seed=0)
    for _ in range(300):                      # MLE warm-up (probe protocol)
        tr.train_iteration()
    tr.ckpt.save_model(tr.params)
    tr.close()

    opt = tiny_opt(phase=3, is_alternating=1, alternating_turn=["speaker"],
                   retrieval_reward="gumbel", retrieval_reward_weight=0.0,
                   cider_optimization=1.0, caption_loss_weight=0,
                   vse_loss_weight=0, on_device_cider=1, batch_size=8,
                   learning_rate=5e-4, cached_tokens="corpus",
                   speaker_stage_2_model_path=os.path.join(
                       mopt.checkpoint_path, "model.pth"),
                   checkpoint_path=os.path.join(work, "rl"))
    os.makedirs(opt.checkpoint_path)
    tr = Trainer(opt, dataset=ds, verbose=False, rng_seed=0)
    rewards = []
    for i in range(400):
        ld, _, _ = tr.train_iteration()
        rewards.append(float(ld["avg_reward"]))
    tr.close()
    early = np.mean(rewards[:60])
    late = np.mean(rewards[-60:])
    assert late > early - 0.1, (early, late)
