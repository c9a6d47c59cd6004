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
