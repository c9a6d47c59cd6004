"""Experiment-driver flag mapping (ref: bash_scripts/run_joint.sh modes)."""

import argparse
import sys

sys.path.insert(0, "/root/repo")
from scripts.run_joint import build_run  # noqa: E402


def args(**kw):
    base = dict(optimization="gumbel", discriminative=0.01, temperature=8.0,
                lr=5e-3, decay=0.75, every=15, batch=128, vse=0.0, caption=0.0,
                reinforce_baseline="gt", shared_embedding=0, prob=0.25,
                softmax_cooling=0.0, annealing=0.93, annealing_every=500,
                max_epochs=350)
    base.update(kw)
    return argparse.Namespace(**base)


def test_cider_is_one_minus_discriminative():
    for d in (0.01, 0.5, 0.8):
        _, ov = build_run(args(discriminative=d))
        assert abs(ov["cider_optimization"] - (1 - d)) < 1e-9
        assert ov["retrieval_reward_weight"] == d


def test_mode_flag_sets():
    name, ov = build_run(args(optimization="gumbel"))
    assert name.startswith("G0.01_T8_TA0.93_AE500")
    assert ov["retrieval_reward"] == "gumbel"
    assert ov["gumbel_temperature_annealing_factor"] == 0.93

    name, ov = build_run(args(optimization="gumbel_softmax", prob=0.3,
                              softmax_cooling=0.5))
    assert ov["prob_gumbel_softmax"] == 0.3
    assert ov["softmax_cooling_decay_factor"] == 0.5
    assert "_O0.5_" in name

    name, ov = build_run(args(optimization="multinomial_soft"))
    assert ov["retrieval_reward"] == "multinomial_soft"
    assert ov["prob_multinomial_soft"] == 0.25

    name, ov = build_run(args(optimization="reinforce", vse=0.1,
                              reinforce_baseline="gt"))
    assert ov["reinforce_baseline_type"] == "gt"
    assert ov["vse_loss_weight"] == 0.1
    assert "BSL_gt" in name


def test_ablation_modes():
    # reinforce_listener: listener-only, 500 epochs, no cider/caption loss
    _, ov = build_run(args(optimization="reinforce_listener"))
    assert ov["alternating_turn"] == ["listener"]
    assert ov["max_epochs"] == 500
    assert ov["cider_optimization"] == 0
    assert ov["caption_loss_weight"] == 0
    # *_speaker ablations: non-alternating phase 3
    for mode, rr in [("reinforce_speaker", "reinforce"),
                     ("gumbel_speaker", "gumbel"),
                     ("multinomial_speaker", "multinomial")]:
        _, ov = build_run(args(optimization=mode))
        assert ov["is_alternating"] == 0
        assert ov["phase"] == 3
        assert ov["retrieval_reward"] == rr
