"""Full 3-stage experiment pipeline on synthetic data (ref: README.md:60-102 —
run_fc_con -> run_att -> run_joint, with cross-stage checkpoint seeding)."""

import os

import numpy as np
import pytest
import jax

from cooperativeimagecaptioning_tpu.config import Options
from cooperativeimagecaptioning_tpu.data.sources import SyntheticDataset
from cooperativeimagecaptioning_tpu.training.loop import Trainer


DIMS = dict(rnn_size=16, input_encoding_size=12, att_hid_size=8,
            vse_embed_size=16, fc_feat_size=20, att_feat_size=20,
            batch_size=4, seq_per_img=1, drop_prob_lm=0.1,
            save_checkpoint_every=100000, language_eval=0, rank_eval=0,
            cached_tokens="corpus")


def ds(opt):
    return SyntheticDataset(num_images=16, vocab_size=25, seq_length=8,
                            fc_feat_size=opt.fc_feat_size,
                            att_feat_size=opt.att_feat_size, max_K=6)


@pytest.mark.slow
def test_three_stage_pipeline(tmp_path):
    # ---- phase 1: listener pretrain (run_fc_con.sh semantics) ----
    p1_dir = str(tmp_path / "log_fc_con")
    opt1 = Options(caption_model="fc", vse_model="fc", phase=1,
                   vse_loss_weight=1, caption_loss_weight=0, id="fc_con",
                   checkpoint_path=p1_dir, **DIMS)
    tr1 = Trainer(opt1, dataset=ds(opt1), verbose=False)
    for _ in range(3):
        tr1.train_iteration()
    tr1.ckpt.save_model(tr1.params)
    listener_ckpt = os.path.join(p1_dir, "model.pth")
    assert os.path.isfile(listener_ckpt)

    # ---- phase 2: speaker MLE (run_att.sh semantics) ----
    p2_dir = str(tmp_path / "log_att")
    opt2 = Options(caption_model="att2in2", vse_model="fc", phase=2,
                   vse_loss_weight=0, caption_loss_weight=1, id="att",
                   checkpoint_path=p2_dir, **DIMS)
    tr2 = Trainer(opt2, dataset=ds(opt2), verbose=False)
    for _ in range(3):
        tr2.train_iteration()
    tr2.ckpt.save_model(tr2.params)
    speaker_ckpt = os.path.join(p2_dir, "model.pth")

    # ---- phase 3: joint, seeded from stage 1+2 (run_joint.sh semantics) ----
    p3_dir = str(tmp_path / "joint")
    os.makedirs(p3_dir)
    opt3 = Options(caption_model="att2in2", vse_model="fc", phase=3,
                   is_alternating=1, alternating_turn=["speaker", "listener"],
                   retrieval_reward="gumbel", retrieval_reward_weight=0.1,
                   cider_optimization=0.9, caption_loss_weight=1,
                   vse_loss_weight=0.1, id="att_d0.1",
                   checkpoint_path=p3_dir,
                   speaker_stage_2_model_path=speaker_ckpt,
                   initialize_retrieval=listener_ckpt, **DIMS)
    tr3 = Trainer(opt3, dataset=ds(opt3), verbose=False)

    # bootstrap cascade: speaker weights came from stage 2, listener from stage 1
    s2 = jax.tree.leaves(tr2.params["speaker"])
    s3 = jax.tree.leaves(tr3.params["speaker"])
    assert any(np.array_equal(np.asarray(a), np.asarray(b))
               for a, b in zip(s2, s3))
    l1 = jax.tree.leaves(tr1.params["listener"])
    l3 = jax.tree.leaves(tr3.params["listener"])
    assert all(np.array_equal(np.asarray(a), np.asarray(b))
               for a, b in zip(l1, l3))

    for _ in range(2):
        loss_dict, _, _ = tr3.train_iteration()
        assert np.isfinite(loss_dict["loss"])
