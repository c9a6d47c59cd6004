"""Results-harvesting pipeline: histories scan -> best-checkpoint selection ->
pruning -> test re-eval -> json report (ref: plots_general_curve.py)."""

import json
import os
import pickle

import numpy as np

import jax

from cooperativeimagecaptioning_tpu.config import Options
from cooperativeimagecaptioning_tpu.data.sources import SyntheticDataset
from cooperativeimagecaptioning_tpu.evaluation import harvest
from cooperativeimagecaptioning_tpu.training import joint
from cooperativeimagecaptioning_tpu.training.checkpoint import save_params


def fake_run_dir(tmp_path, run_id="run1", iters=(5, 10, 15)):
    """Materialize a plausible run directory without training."""
    opt = Options(caption_model="att2in2", vse_model="fc", rnn_size=8,
                  input_encoding_size=8, att_hid_size=8, vse_embed_size=8,
                  fc_feat_size=12, att_feat_size=12,
                  checkpoint_path=str(tmp_path), id=run_id)
    opt.vocab_size = 10
    opt.seq_length = 6
    params = joint.init_params(jax.random.PRNGKey(0), opt)
    hist = {"val_result_history": {}}
    ciders = {5: 0.5, 10: 0.9, 15: 0.7}
    bleus = {5: 0.3, 10: 0.2, 15: 0.4}
    r10s = {5: 40.0, 10: 20.0, 15: 30.0}
    for it in iters:
        save_params(params, os.path.join(tmp_path, f"model-{it}.pth"))
        hist["val_result_history"][it] = {
            "lang_stats": {"CIDEr": ciders[it], "Bleu_4": bleus[it]},
            "loss": {"t2i_r10": r10s[it]},
            "predictions": []}
    save_params(params, os.path.join(tmp_path, "model.pth"))
    with open(os.path.join(tmp_path, f"histories_{run_id}.pkl"), "wb") as f:
        pickle.dump(hist, f)
    with open(os.path.join(tmp_path, f"infos_{run_id}.pkl"), "wb") as f:
        pickle.dump({"opt": opt, "vocab": {}}, f)
    return opt


def test_best_selection_and_pruning(tmp_path):
    opt = fake_run_dir(tmp_path)
    metrics = harvest.create_model_metrics(str(tmp_path), "run1")
    assert metrics["test_models"] == {"cider": 10, "bleu4": 15, "t2i_r10": 5}
    harvest.remove_unnecessary_models(metrics, str(tmp_path))
    remaining = sorted(f for f in os.listdir(tmp_path)
                       if f.startswith("model-"))
    assert remaining == ["model-10.pth", "model-15.pth", "model-5.pth"]
    assert os.path.isfile(tmp_path / "model.pth")  # latest untouched


def test_json_report(tmp_path):
    opt = fake_run_dir(tmp_path)
    path = harvest.create_dicts_and_json_after_training(
        opt, run_test_eval=False)
    assert os.path.isfile(tmp_path / "val_dict.pkl")
    assert os.path.isfile(tmp_path / "test_dict.pkl")
    with open(path) as f:
        report = json.load(f)
    assert report["best_iteration_by"]["cider"] == 10
    assert report["val"]["cider"]["cider"] == 0.9


def test_standalone_multi_run_cli(tmp_path):
    """`python -m ...harvest --dir <parent>` harvests every run dir under the
    parent (ref plots_general_curve.py main :493-535) with dict caching."""
    parent = tmp_path / "runs"
    for name in ("gumbel_t1", "gumbel_t2", "skipme_BS50"):
        d = parent / name
        d.mkdir(parents=True)
        fake_run_dir(d, run_id=name)
    (parent / "not_a_run").mkdir()  # no histories -> ignored

    jd = str(tmp_path / "json_dir")
    results = harvest.main(["--dir", str(parent), "--skip", "BS50",
                            "--json_dir", jd])
    assert len(results) == 2
    for run_dir, path in results.items():
        assert path is not None and os.path.isfile(path)
        assert os.path.isfile(os.path.join(run_dir, "val_dict.pkl"))
    assert sorted(os.listdir(jd)) == ["gumbel_t1.json", "gumbel_t2.json"]

    # second invocation: both runs cached (val_dict.pkl present, model count
    # pruned to the 3 selected == not above threshold)
    results2 = harvest.harvest_runs(str(parent), skip_substrings=("BS50",),
                                    min_models_in_dir=3, json_dir=jd)
    assert all(v is None for v in results2.values())

    # force_new_dict busts the cache
    results3 = harvest.harvest_runs(str(parent), skip_substrings=("BS50",),
                                    force_new_dict=True, json_dir=jd)
    assert all(v is not None for v in results3.values())


def test_single_run_dir_cli(tmp_path):
    fake_run_dir(tmp_path, run_id="solo")
    jd = str(tmp_path / "jd")
    results = harvest.main(["--dir", str(tmp_path), "--json_dir", jd])
    assert len(results) == 1
    (path,) = results.values()
    with open(path) as f:
        rep = json.load(f)
    assert rep["best_iteration_by"] == {"cider": 10, "bleu4": 15,
                                        "t2i_r10": 5}


import pytest


@pytest.mark.slow
def test_full_harvest_with_real_test_reeval(tmp_path, monkeypatch):
    """End-to-end: train a tiny run, checkpoint twice, then harvest WITH the
    test re-evaluation (harvest.eval_test -> eval.eval on the selected
    checkpoints) — the path every other harvest test stubs out."""
    monkeypatch.chdir(tmp_path)
    import jax as _jax
    from cooperativeimagecaptioning_tpu.config import Options
    from cooperativeimagecaptioning_tpu.training.loop import Trainer

    ckpt = str(tmp_path / "run")
    os.makedirs(ckpt)
    ds = SyntheticDataset(num_images=24, vocab_size=20, seq_length=6,
                          fc_feat_size=12, att_feat_size=12, max_K=5)
    opt = Options(caption_model="att2in2", vse_model="fc", batch_size=6,
                  seq_per_img=1, rnn_size=12, input_encoding_size=10,
                  att_hid_size=8, vse_embed_size=12, fc_feat_size=12,
                  att_feat_size=12, drop_prob_lm=0.0, learning_rate=1e-3,
                  grad_clip=0.1, checkpoint_path=ckpt, id="hrun",
                  save_checkpoint_every=3, losses_log_every=2,
                  language_eval=1, rank_eval=1, max_epochs=-1, max_att_len=5,
                  phase=2, caption_loss_weight=1, vse_loss_weight=0.1,
                  val_images_use=-1, load_best_score=0)
    tr = Trainer(opt, dataset=ds, verbose=False)
    for _ in range(6):
        tr.train_iteration()
        if tr.iteration % opt.save_checkpoint_every == 0:
            tr.checkpoint_operations()

    path = harvest.create_dicts_and_json_after_training(
        opt, dataset=ds, run_test_eval=True)
    assert path is not None and os.path.isfile(path)
    with open(os.path.join(ckpt, "test_dict.pkl"), "rb") as f:
        test_dict = pickle.load(f)
    assert test_dict, "test re-eval produced nothing"
    for crit, payload in test_dict.items():
        assert "CIDEr" in payload["lang_stats"]
        assert np.isfinite(payload["loss"]["loss_cap"])
        assert payload["split_predictions"]


def test_metric_free_history_keeps_all_checkpoints(tmp_path):
    """With language_eval=0 and rank_eval=0 every lang_stats is empty: no
    selection criterion has data, so harvesting must NOT pick iteration[0]
    as 'best' and delete the rest (the all-default argmax did exactly that;
    the reference KeyErrors instead, plots_general_curve.py:304-307)."""
    import os, pickle
    from cooperativeimagecaptioning_tpu.evaluation import harvest
    run = tmp_path / "run"
    os.makedirs(run)
    hist = {"val_result_history": {
        500: {"loss": {}, "lang_stats": {}, "predictions": []},
        1000: {"loss": {}, "lang_stats": {}, "predictions": []}}}
    with open(run / "histories_x.pkl", "wb") as f:
        pickle.dump(hist, f)
    for it in (500, 1000):
        (run / f"model-{it}.pth").write_bytes(b"x")
    m = harvest.create_model_metrics(str(run), "x")
    assert m["test_models"] == {}
    harvest.remove_unnecessary_models(m, str(run))
    assert sorted(os.listdir(run)) == [
        "histories_x.pkl", "model-1000.pth", "model-500.pth"]
