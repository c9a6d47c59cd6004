"""BASELINE.json config 5 end-to-end: ResNet feature extraction -> on-disk
feature dirs -> file loader -> REINFORCE + CIDEr-D joint training."""

import json
import os

import numpy as np
import pytest
import jax

from cooperativeimagecaptioning_tpu.config import Options
from cooperativeimagecaptioning_tpu.preprocess import feats, labels as prepro
from cooperativeimagecaptioning_tpu.preprocess import resnet
from cooperativeimagecaptioning_tpu.training.loop import Trainer

h5py = pytest.importorskip("h5py")


@pytest.mark.slow
def test_resnet_to_reinforce_training(tmp_path):
    rng = np.random.RandomState(0)
    n_imgs = 8
    words = ["a", "man", "dog", "rides", "bike", "red", "park"]

    # raw dataset json (karpathy format)
    imgs = []
    for i in range(n_imgs):
        sents = [{"tokens": list(rng.choice(words, 5))} for _ in range(3)]
        sents.append({"tokens": words})
        imgs.append({"sentences": sents, "cocoid": 700 + i,
                     "split": ["train", "train", "val", "test"][i % 4],
                     "filepath": "val2014", "filename": f"im{i}.jpg"})
    src = tmp_path / "raw.json"
    with open(src, "w") as f:
        json.dump({"images": imgs}, f)

    # stage 0: labels + vocab
    out_json = str(tmp_path / "cocotalk.json")
    out_h5 = str(tmp_path / "cocotalk_label.h5")
    prepro.prepro_labels(str(src), out_json, out_h5, max_length=6)

    # stage 0': ResNet feature extraction (tiny net, real pipeline + artifacts)
    params = resnet.init_params(jax.random.PRNGKey(0), (1, 1, 1, 1))
    images = [rng.randint(0, 255, (48, 56, 3), np.uint8)
              for _ in range(n_imgs)]
    fc_dir, att_dir = feats.extract_to_dirs(
        params, images, [700 + i for i in range(n_imgs)],
        str(tmp_path / "cocotalk"), att_size=3, resize_to=48)

    # joint REINFORCE + CIDEr-D training over the extracted features
    opt = Options(caption_model="att2in2", vse_model="fc", batch_size=4,
                  seq_per_img=1, rnn_size=16, input_encoding_size=12,
                  att_hid_size=8, vse_embed_size=16, fc_feat_size=2048,
                  att_feat_size=2048, drop_prob_lm=0.1, id="c5",
                  checkpoint_path=str(tmp_path / "run"),
                  save_checkpoint_every=100000,
                  input_json=out_json, input_label_h5=out_h5,
                  input_fc_dir=fc_dir, input_att_dir=att_dir,
                  is_alternating=1, alternating_turn=["speaker", "listener"],
                  retrieval_reward="reinforce", retrieval_reward_weight=0.8,
                  cider_optimization=0.2, caption_loss_weight=1,
                  vse_loss_weight=0.1, reinforce_baseline_type="gt",
                  cached_tokens="corpus", phase=3)
    os.makedirs(opt.checkpoint_path, exist_ok=True)
    tr = Trainer(opt, verbose=False)
    for _ in range(2):  # one speaker + one listener turn
        loss_dict, turn, _ = tr.train_iteration()
        assert np.isfinite(loss_dict["loss"])
    assert "avg_reward" in loss_dict or turn == "listener"
    tr.loader.close()
