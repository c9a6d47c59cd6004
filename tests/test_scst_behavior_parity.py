"""Behavioral SCST parity with the reference on the synthetic geometry.

On per-position-independent synthetic refs, SCST's objective (avg_reward =
expected sampled CIDEr-D - greedy baseline) does not collapse while
greedy-decode CIDEr declines — in BOTH frameworks, from the SAME MLE-warmed
weights.  This pins the measured full-scale showcase behavior (STATUS.md
round 3) as task geometry shared with the reference's own torch code
(AlternatingJointModel.py:405-431 surrogate), not an implementation
divergence.
"""

import os

import numpy as np
import pytest
import jax

from cooperativeimagecaptioning_tpu.training.loop import Trainer
from cooperativeimagecaptioning_tpu.training import joint
from cooperativeimagecaptioning_tpu.utils import torch_interop
from cooperativeimagecaptioning_tpu.rewards import self_critical

from test_training import tiny_opt, tiny_dataset

torch = pytest.importorskip("torch")
from ref_bridge import load_reference  # noqa: E402
from test_speaker_parity import NS  # noqa: E402


@pytest.mark.slow
def test_reference_scst_shows_same_signature(tmp_path):
    REF = load_reference()
    mopt = tiny_opt(phase=2, caption_loss_weight=1, vse_loss_weight=0,
                    batch_size=8, checkpoint_path=str(tmp_path / "mle"))
    os.makedirs(mopt.checkpoint_path)
    ds = tiny_dataset(mopt)
    tr = Trainer(mopt, dataset=ds, verbose=False, rng_seed=0)
    for _ in range(300):
        tr.train_iteration()
    sp = joint.speaker_view(tr.params, mopt)
    sd = torch_interop.export_state_dict({"speaker": sp}, "att2in2",
                                         wrapped=False)
    loader = tr.loader
    self_critical.reset_scorer()
    scorer = self_critical.init_scorer("corpus")
    mopt.seq_length = loader.seq_length
    mopt.vocab_size = loader.vocab_size
    tm = REF["AttModel"].Att2in2Model(NS(mopt))
    missing, unexpected = tm.load_state_dict(sd, strict=False)
    assert not unexpected and not missing, (missing, unexpected)

    def greedy_cider():
        tm.eval()
        gts, res = {}, []
        N = ds.num_images()
        att = np.zeros((N, 6, mopt.att_feat_size), np.float32)
        am = np.zeros((N, 6), np.float32)
        fc = np.stack([ds.get_fc(i) for i in range(N)]).astype(np.float32)
        for i in range(N):
            a = ds.get_att(i)
            att[i, : a.shape[0]] = a
            am[i, : a.shape[0]] = 1
        with torch.no_grad():
            seq, _ = tm.sample(torch.from_numpy(fc), torch.from_numpy(att),
                               torch.from_numpy(am), {"sample_max": 1})
        seq = seq.numpy()
        for i in range(N):
            gts[i] = [self_critical.array_to_str(r) for r in ds.get_refs(i)]
            res.append({"image_id": i,
                        "caption": [self_critical.array_to_str(seq[i])]})
        tm.train()
        return float(scorer.compute_score(gts, res)[0])

    optim = torch.optim.Adam(tm.parameters(), lr=5e-4)
    c0 = greedy_cider()
    tm.train()
    torch.manual_seed(0)
    rewards = []
    for it in range(300):
        data = loader.get_batch("train")
        fc = torch.from_numpy(np.asarray(data["fc_feats"], np.float32))
        att = torch.from_numpy(np.asarray(data["att_feats"], np.float32))
        am = data.get("att_masks")
        am = torch.from_numpy(np.asarray(am, np.float32)) \
            if am is not None else None
        gen, logp = tm.sample(fc, att, am, {"sample_max": 0})
        with torch.no_grad():
            greedy, _ = tm.sample(fc, att, am, {"sample_max": 1})
        scores, _ = self_critical.get_self_critical_reward(
            data["gts"], gen.numpy(), greedy.numpy())
        rewards.append(float(np.mean(scores)))
        gen_masks = torch.cat([torch.ones(gen.size(0), 2),
                               (gen > 0).float()[:, :-1]], 1)
        rew = torch.from_numpy(np.asarray(scores, np.float32))
        loss = (logp * (-rew).unsqueeze(1) * gen_masks[:, 1:]).sum() \
            / gen_masks[:, 1:].sum()
        optim.zero_grad()
        loss.backward()
        for group in optim.param_groups:      # ref utils.clip_gradient
            for p in group["params"]:
                if p.grad is not None:
                    p.grad.data.clamp_(-0.1, 0.1)
        optim.step()
    c1 = greedy_cider()
    tr.close()
    early, late = np.mean(rewards[:50]), np.mean(rewards[-50:])
    # the reference's objective does not collapse (same guard as ours) ...
    assert late > early - 0.1, (early, late)
    # ... while ITS greedy CIDEr declines on this geometry (measured
    # 0.19 -> 0.09): the decoupling is shared, not a framework divergence
    assert c1 < c0 + 0.05, (c0, c1)
