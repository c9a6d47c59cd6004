"""Turnkey pipeline: scripts/reproduce_coco.py drives the ENTIRE reference
protocol — raw Karpathy json + images -> prepro labels/ngrams/feats ->
listener pretrain -> speaker MLE -> joint optimization -> harvest — through
the real CLIs on a fabricated synthetic layout (ref: README.md:27-102)."""

import json
import os
import sys

import pytest

sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__)))))


@pytest.mark.slow
def test_reproduce_coco_synthetic_chain(tmp_path):
    from scripts import reproduce_coco
    wd = str(tmp_path / "repro")
    reproduce_coco.main(["--synthetic", "16", "--workdir", wd,
                         "--set", "losses_log_every=2"])

    data = os.path.join(wd, "data")
    # prepro artifacts (the reference's download layout, rebuilt locally)
    assert os.path.isfile(os.path.join(data, "cocotalk.json"))
    assert os.path.isfile(os.path.join(data, "cocotalk_label.h5"))
    assert os.path.isfile(os.path.join(data, "coco-train-idxs.p"))
    assert os.listdir(os.path.join(data, "cocotalk_fc"))
    assert os.listdir(os.path.join(data, "cocotalk_att"))
    with open(os.path.join(data, "cocotalk.json")) as f:
        talk = json.load(f)
    assert talk["ix_to_word"] and talk["images"]

    # stage artifacts
    assert os.path.isfile(os.path.join(wd, "log_fc_con", "model-best.pth"))
    assert os.path.isfile(os.path.join(wd, "log_att", "model-best.pth"))
    joint_runs = [d for d in os.listdir(os.path.join(wd, "gumbel"))
                  if d != "json_dir"]
    assert joint_runs
    run_dir = os.path.join(wd, "gumbel", joint_runs[0])
    names = os.listdir(run_dir)
    assert any(n.startswith("alternatingModel") for n in names)
    # harvest emitted the per-criterion dicts + results json
    assert "val_dict.pkl" in names
    json_dir = os.path.join(wd, "gumbel", "json_dir")
    assert os.path.isdir(json_dir) and any(
        n.endswith(".json") for n in os.listdir(json_dir)), \
        f"no harvest json in {json_dir}"

    # idempotence: a second invocation skips completed stages quickly and
    # does not raise (resume-from-layout behavior)
    reproduce_coco.main(["--synthetic", "16", "--workdir", wd,
                         "--set", "losses_log_every=2"])


# ---- layout checker: partial-download / partial-run states (fast) ----------

def _mk_labels(data, vocab=6, n_images=4, max_label=None, seq=5):
    """Write a consistent (or deliberately inconsistent) cocotalk pair."""
    import h5py
    import numpy as np
    os.makedirs(data, exist_ok=True)
    talk = {"ix_to_word": {str(i + 1): f"w{i}" for i in range(vocab)},
            "images": [{"id": i, "split": "train"} for i in range(n_images)]}
    with open(os.path.join(data, "cocotalk.json"), "w") as f:
        json.dump(talk, f)
    labels = np.random.RandomState(0).randint(
        1, (max_label or vocab) + 1, (n_images, seq), dtype="int64")
    labels[0, 0] = max_label or vocab  # pin the max so the check is exact
    with h5py.File(os.path.join(data, "cocotalk_label.h5"), "w") as f:
        f.create_dataset("labels", data=labels)
        f.create_dataset("label_start_ix", data=np.arange(1, n_images + 1))
        f.create_dataset("label_end_ix", data=np.arange(1, n_images + 1))
        f.create_dataset("label_length",
                         data=np.full((n_images,), seq, dtype="int64"))


def test_layout_empty_dir(tmp_path):
    from scripts import reproduce_coco
    rep = reproduce_coco.check_layout(str(tmp_path))
    assert rep["labels"]["state"] == "missing"
    assert rep["ngrams"]["state"] == "missing"
    assert rep["feats"]["state"] == "missing"
    assert "--raw-json" in rep["labels"]["action"]


def test_layout_json_without_h5_is_partial(tmp_path):
    from scripts import reproduce_coco
    data = str(tmp_path / "data")
    _mk_labels(data)
    os.remove(os.path.join(data, "cocotalk_label.h5"))
    rep = reproduce_coco.check_layout(str(tmp_path))
    assert rep["labels"]["state"] == "partial"
    assert "cocotalk_label.h5" in rep["labels"]["action"]


def test_layout_vocab_mismatch_detected_and_aborts(tmp_path, capsys):
    """h5 built against a bigger vocab than the json: a mixed state that must
    abort with an actionable message, never be silently trained on."""
    from scripts import reproduce_coco
    data = str(tmp_path / "data")
    _mk_labels(data, vocab=6, max_label=11)
    rep = reproduce_coco.check_layout(str(tmp_path))
    assert rep["labels"]["state"] == "mismatch"
    assert "delete both" in rep["labels"]["action"]
    with pytest.raises(SystemExit) as ei:
        reproduce_coco.main(["--workdir", str(tmp_path)])
    assert "mismatch" in str(ei.value)


def test_layout_stale_labels_vs_raw_json(tmp_path):
    from scripts import reproduce_coco
    data = str(tmp_path / "data")
    _mk_labels(data)
    raw = str(tmp_path / "dataset_coco.json")
    with open(raw, "w") as f:
        json.dump({"images": []}, f)
    old = os.path.getmtime(os.path.join(data, "cocotalk.json")) - 100
    os.utime(os.path.join(data, "cocotalk.json"), (old, old))
    os.utime(os.path.join(data, "cocotalk_label.h5"), (old, old))
    rep = reproduce_coco.check_layout(str(tmp_path), raw_json=raw)
    assert rep["labels"]["state"] == "stale"
    # without the newer raw json the same pair is consistent -> ok
    rep2 = reproduce_coco.check_layout(str(tmp_path))
    assert rep2["labels"]["state"] == "ok"
    assert rep2["labels"]["vocab_size"] == 6


def test_layout_stale_ngrams(tmp_path):
    from scripts import reproduce_coco
    data = str(tmp_path / "data")
    _mk_labels(data)
    idxs = os.path.join(data, "coco-train-idxs.p")
    with open(idxs, "wb") as f:
        f.write(b"x")
    old = os.path.getmtime(idxs) - 100
    os.utime(idxs, (old, old))
    rep = reproduce_coco.check_layout(str(tmp_path))
    assert rep["ngrams"]["state"] == "stale"


def test_layout_partial_feats_counts(tmp_path):
    from scripts import reproduce_coco
    import numpy as np
    data = str(tmp_path / "data")
    _mk_labels(data, n_images=4)
    for d in ("cocotalk_fc", "cocotalk_att"):
        os.makedirs(os.path.join(data, d))
    np.save(os.path.join(data, "cocotalk_fc", "0.npy"), np.zeros(3))
    np.savez(os.path.join(data, "cocotalk_att", "0.npz"), feat=np.zeros(3))
    rep = reproduce_coco.check_layout(str(tmp_path))
    assert rep["feats"]["state"] == "partial"
    assert rep["feats"]["n_fc"] == 1
    assert "1/4" in rep["feats"]["action"]


def test_extract_to_dirs_resumes_partial(tmp_path):
    """Partial feature dirs resume: already-extracted ids are not rewritten."""
    import numpy as np
    from cooperativeimagecaptioning_tpu.preprocess import feats, resnet
    import jax
    params = resnet.init_params(jax.random.PRNGKey(0), "resnet101")
    rng = np.random.RandomState(0)
    images = [rng.randint(0, 255, (32, 32, 3), dtype="uint8")
              for _ in range(4)]
    out = str(tmp_path / "cocotalk")
    feats.extract_to_dirs(params, images[:2], [0, 1], out, att_size=2,
                          batch_size=2, resize_to=32)
    before = {f: os.path.getmtime(os.path.join(out + "_fc", f))
              for f in os.listdir(out + "_fc")}
    feats.extract_to_dirs(params, images, [0, 1, 2, 3], out, att_size=2,
                          batch_size=2, resize_to=32)
    after = {f: os.path.getmtime(os.path.join(out + "_fc", f))
             for f in before}
    assert before == after  # ids 0/1 untouched
    assert sorted(os.listdir(out + "_fc")) == [
        "0.npy", "1.npy", "2.npy", "3.npy"]
