"""Fused multi-step trainer (`--fused_steps K`): K iterations compiled into
one lax.scan program (training/loop.py Trainer.train_chunk).

TPU-native extension with no reference analog — the contract under test is
SEMANTIC EQUIVALENCE with the per-step path (train_iteration): same PRNG
stream, same schedule values per iteration, same guarded updates, same
histories cadence, same termination (checkpoint boundaries, max_iterations,
max_epochs) — only the dispatch granularity changes.
"""

import os

import numpy as np
import pytest
import jax

from cooperativeimagecaptioning_tpu.training.loop import Trainer

from test_training import tiny_opt, tiny_dataset


def _run(opt, max_iterations):
    tr = Trainer(opt, dataset=tiny_dataset(opt), verbose=False)
    tr.train(max_iterations=max_iterations)
    return tr


def _assert_params_close(a, b, rtol=1e-6, atol=1e-7):
    fa, fb = jax.tree.leaves(a), jax.tree.leaves(b)
    assert len(fa) == len(fb)
    for x, y in zip(fa, fb):
        np.testing.assert_allclose(np.asarray(x), np.asarray(y),
                                   rtol=rtol, atol=atol)


def _hist_floats(h):
    return {k: float(v) for k, v in h.items()}


def test_fused_mle_matches_per_step():
    """Phase-2 MLE: 6 iterations as 2 fused chunks of 3 must reproduce the
    per-step path exactly — params, per-iteration loss history, and the
    carried PRNG key (same split order step-for-step)."""
    common = dict(phase=2, caption_loss_weight=1, vse_loss_weight=0,
                  device_feature_cache=1, max_att_len=6, losses_log_every=1,
                  save_checkpoint_every=10_000)
    out = {}
    for k in (1, 3):
        tr = _run(tiny_opt(fused_steps=k, **common), max_iterations=6)
        assert tr.iteration == 6
        assert bool(tr._chunk_fns) == (k > 1)  # fused path actually ran
        out[k] = (jax.tree.map(np.asarray, tr.params),
                  _hist_floats(tr.loss_history),
                  np.asarray(tr._rng))
    assert out[1][1].keys() == out[3][1].keys() == set(range(1, 7))
    for it in out[1][1]:
        np.testing.assert_allclose(out[3][1][it], out[1][1][it],
                                   rtol=1e-6, err_msg=f"iter {it}")
    _assert_params_close(out[3][0], out[1][0])
    np.testing.assert_array_equal(out[3][2], out[1][2])


@pytest.mark.slow
def test_fused_joint_gumbel_on_device_cider_matches_per_step():
    """The flagship joint step (gumbel relaxation + on-device CIDEr reward +
    listener loss) through the scan: staged refs/ref_mask and per-step Hyper
    rows must reproduce the per-step trajectory."""
    common = dict(phase=3, is_alternating=1,
                  alternating_turn=["speaker", "listener"],
                  retrieval_reward="gumbel", retrieval_reward_weight=0.1,
                  cider_optimization=0.5, caption_loss_weight=1,
                  vse_loss_weight=0.1, on_device_cider=1,
                  device_feature_cache=1, max_att_len=6, losses_log_every=1,
                  save_checkpoint_every=10_000)
    out = {}
    for k in (1, 4):
        tr = _run(tiny_opt(fused_steps=k, **common), max_iterations=4)
        assert tr.iteration == 4
        out[k] = (jax.tree.map(np.asarray, tr.params),
                  _hist_floats(tr.loss_history))
        if k > 1:
            assert tr._fused_gate() is None
    for it in out[1][1]:
        np.testing.assert_allclose(out[4][1][it], out[1][1][it],
                                   rtol=1e-5, err_msg=f"iter {it}")
    _assert_params_close(out[4][0], out[1][0], rtol=1e-5, atol=1e-6)


@pytest.mark.slow
def test_fused_schedules_track_epoch_wraps():
    """Schedules recomputed per staged step must match the per-step path
    across epoch wraps: lr decay + scheduled-sampling + gumbel anneal all
    keyed on the exact (iteration, epoch) the per-step path would see.
    The tiny train split wraps every few iterations, so 10 iterations put
    several wraps mid-chunk for K=4."""
    common = dict(phase=2, caption_loss_weight=1, vse_loss_weight=0,
                  device_feature_cache=1, max_att_len=6, losses_log_every=1,
                  save_checkpoint_every=10_000,
                  learning_rate_decay_start=0, learning_rate_decay_every=1,
                  learning_rate_decay_rate=0.5,
                  scheduled_sampling_start=0,
                  scheduled_sampling_increase_every=1,
                  scheduled_sampling_increase_prob=0.05)
    out = {}
    for k in (1, 4):
        tr = _run(tiny_opt(fused_steps=k, **common), max_iterations=10)
        out[k] = (_hist_floats(tr.lr_history),
                  _hist_floats(tr.ss_prob_history),
                  tr.epoch, jax.tree.map(np.asarray, tr.params))
    assert out[4][0] == out[1][0]          # lr decayed identically
    assert out[4][1] == out[1][1]          # ss_prob stepped identically
    assert out[4][2] == out[1][2] >= 2     # same wraps, several mid-chunk
    assert len(set(out[1][0].values())) > 1  # the schedule actually moved
    _assert_params_close(out[4][3], out[1][3])


@pytest.mark.slow
def test_fused_falls_back_per_step_when_gated():
    """Host-interaction configs the scan cannot carry must fall back to
    per-step execution (with the gate reason), not crash or silently change
    semantics."""
    # host-side SCST reward (no on-device tier)
    opt = tiny_opt(phase=3, is_alternating=1, alternating_turn=["speaker"],
                   retrieval_reward="gumbel", retrieval_reward_weight=0.1,
                   cider_optimization=0.5, caption_loss_weight=1,
                   vse_loss_weight=0.1, device_feature_cache=1,
                   max_att_len=6, fused_steps=4,
                   save_checkpoint_every=10_000)
    tr = Trainer(opt, dataset=tiny_dataset(opt), verbose=False)
    assert "reward" in tr._fused_gate()
    tr.train(max_iterations=2)
    assert tr.iteration == 2 and not tr._chunk_fns
    # no device feature cache -> per-step streaming
    opt2 = tiny_opt(phase=2, caption_loss_weight=1, vse_loss_weight=0,
                    fused_steps=4, save_checkpoint_every=10_000)
    tr2 = Trainer(opt2, dataset=tiny_dataset(opt2), verbose=False)
    assert "device_feature_cache" in tr2._fused_gate()
    tr2.train(max_iterations=2)
    assert tr2.iteration == 2 and not tr2._chunk_fns
    # reinforce alternation flips the step graph per iteration
    opt3 = tiny_opt(phase=3, is_alternating=1,
                    alternating_turn=["speaker", "listener"],
                    retrieval_reward="reinforce", retrieval_reward_weight=0.1,
                    cider_optimization=0, caption_loss_weight=1,
                    vse_loss_weight=0.1, device_feature_cache=1,
                    max_att_len=6, fused_steps=4,
                    save_checkpoint_every=10_000)
    tr3 = Trainer(opt3, dataset=tiny_dataset(opt3), verbose=False)
    assert "alternation" in tr3._fused_gate()
    tr3.close()


def test_fused_respects_checkpoint_boundaries(tmp_path):
    """A chunk must never cross a save_checkpoint_every boundary: with
    fused_steps=16 > save_checkpoint_every=4 the trainer still checkpoints
    at 4 and 8, exactly like the per-step path."""
    opt = tiny_opt(phase=2, caption_loss_weight=1, vse_loss_weight=0,
                   device_feature_cache=1, max_att_len=6, fused_steps=16,
                   save_checkpoint_every=4,
                   checkpoint_path=str(tmp_path / "ck"))
    os.makedirs(opt.checkpoint_path)
    tr = _run(opt, max_iterations=8)
    assert tr.iteration == 8
    assert set(tr.val_result_history) == {4, 8}
    assert os.path.exists(os.path.join(opt.checkpoint_path, "model.pth"))


@pytest.mark.slow
def test_fused_stops_at_max_epochs():
    """max_epochs reached mid-chunk: _stage_chunk stops right after the
    wrapping batch, so the fused run consumes exactly as many iterations as
    the per-step path would."""
    common = dict(phase=2, caption_loss_weight=1, vse_loss_weight=0,
                  device_feature_cache=1, max_att_len=6, max_epochs=1,
                  save_checkpoint_every=10_000)
    ends = {}
    for k in (1, 16):
        tr = _run(tiny_opt(fused_steps=k, **common), max_iterations=None)
        ends[k] = (tr.iteration, tr.epoch)
    assert ends[16] == ends[1]
    assert ends[1][1] == 1  # stopped right at the first wrap


@pytest.mark.slow
def test_fused_on_data_mesh_matches_single_device():
    """shard_batch_stacked: the fused chunk sharded over a DP-2 mesh (stacked
    inputs shard on axis 1) must reproduce the unsharded fused trajectory."""
    common = dict(phase=2, caption_loss_weight=1, vse_loss_weight=0,
                  device_feature_cache=1, max_att_len=6, fused_steps=3,
                  losses_log_every=1, save_checkpoint_every=10_000)
    out = {}
    for axis in (1, 2):
        tr = _run(tiny_opt(mesh_data_axis=axis, **common), max_iterations=6)
        out[axis] = (jax.tree.map(np.asarray, tr.params),
                     _hist_floats(tr.loss_history))
        assert bool(tr._chunk_fns)
    for it in out[1][1]:
        np.testing.assert_allclose(out[2][1][it], out[1][1][it],
                                   rtol=1e-3, err_msg=f"iter {it}")
    # sharded-sum reassociation + 6 Adam steps: parity, not bit-equality
    _assert_params_close(out[2][0], out[1][0], rtol=5e-3, atol=1e-4)


def test_fused_skipped_step_accounting():
    """The scan's per-step ok flags must accumulate into the optimizer's
    skipped counter exactly like per-step guarded updates (here: all finite,
    so zero skipped — the counter is device-resident either way)."""
    opt = tiny_opt(phase=2, caption_loss_weight=1, vse_loss_weight=0,
                   device_feature_cache=1, max_att_len=6, fused_steps=3,
                   save_checkpoint_every=10_000)
    tr = _run(opt, max_iterations=6)
    assert tr.optim.skipped_steps() == 0
    assert bool(tr.optim.last_step_ok)
