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
