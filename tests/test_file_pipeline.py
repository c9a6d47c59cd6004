"""End-to-end on the reference's on-disk data formats: karpathy json ->
prepro_labels (vocab + label h5) -> per-image npy/npz feature dirs -> FileDataset
loader (through the native C++ readers) -> training -> standalone eval.eval."""

import json
import os
import sys

import numpy as np
import pytest

from cooperativeimagecaptioning_tpu.config import Options
from cooperativeimagecaptioning_tpu.preprocess import labels as prepro
from cooperativeimagecaptioning_tpu.training.loop import Trainer

h5py = pytest.importorskip("h5py")


def build_data(tmp_path, n_imgs=12):
    rng = np.random.RandomState(0)
    words = ["a", "man", "dog", "rides", "bike", "red", "park", "woman",
             "sits", "grass"]
    imgs = []
    for i in range(n_imgs):
        sents = [{"tokens": list(rng.choice(words, rng.randint(3, 7)))}
                 for _ in range(3)]
        # make words frequent enough to pass the >5 threshold
        sents.append({"tokens": words})
        imgs.append({"sentences": sents, "cocoid": 500 + i,
                     "split": ["train", "train", "val", "test"][i % 4],
                     "filepath": "val2014", "filename": f"im{i}.jpg"})
    src = tmp_path / "dataset.json"
    with open(src, "w") as f:
        json.dump({"images": imgs}, f)

    out_json = str(tmp_path / "cocotalk.json")
    out_h5 = str(tmp_path / "cocotalk_label.h5")
    prepro.prepro_labels(str(src), out_json, out_h5, max_length=8)

    fc_dir = tmp_path / "cocotalk_fc"
    att_dir = tmp_path / "cocotalk_att"
    fc_dir.mkdir(); att_dir.mkdir()
    for i in range(n_imgs):
        np.save(fc_dir / f"{500 + i}.npy",
                rng.randn(16).astype(np.float32))
        np.savez_compressed(att_dir / f"{500 + i}.npz",
                            feat=rng.randn(rng.randint(3, 6), 16)
                            .astype(np.float32))
    return out_json, out_h5, str(fc_dir), str(att_dir)


@pytest.mark.slow
def test_file_pipeline_train_and_eval(tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    out_json, out_h5, fc_dir, att_dir = build_data(tmp_path)
    ckpt = str(tmp_path / "run")
    os.makedirs(ckpt)
    opt = Options(caption_model="att2in2", vse_model="fc", batch_size=3,
                  seq_per_img=2, rnn_size=16, input_encoding_size=12,
                  att_hid_size=8, vse_embed_size=16, fc_feat_size=16,
                  att_feat_size=16, drop_prob_lm=0.1, id="fp",
                  checkpoint_path=ckpt, save_checkpoint_every=100000,
                  input_json=out_json, input_label_h5=out_h5,
                  input_fc_dir=fc_dir, input_att_dir=att_dir,
                  caption_loss_weight=1, vse_loss_weight=0.2, phase=2,
                  language_eval=0, rank_eval=0)
    tr = Trainer(opt, verbose=False)  # FileDataset path (no synthetic ds)
    assert tr.loader.vocab_size > 0
    assert tr.loader.seq_length == 8
    for _ in range(3):
        loss_dict, _, _ = tr.train_iteration()
        assert np.isfinite(loss_dict["loss"])
    tr.loader.close()

    # standalone eval driver (ref: eval.py) at a saved checkpoint
    tr.ckpt.save_model(tr.params, iteration=3)
    import pickle
    infos_name = os.path.join(ckpt, "infos_fp.pkl")
    with open(infos_name, "wb") as f:
        pickle.dump({"opt": opt, "vocab": tr.loader.get_vocab()}, f)
    sys.path.insert(0, "/root/repo")
    import eval as eval_mod
    res = eval_mod.eval(opt, os.path.join(ckpt, "model-3.pth"), infos_name,
                        split="test", iteration=None)
    assert opt.beam_size == 2  # final-eval protocol applied (ref eval.py:33)
    assert len(res["split_predictions"]) == len(tr.loader.split_ix["test"])
    assert all(isinstance(p["caption"], str)
               for p in res["split_predictions"])
