"""Orbax checkpoint tier (--checkpoint_backend orbax): async atomic model
saves with the reference naming taxonomy (.orbax dirs), restores that honor
the live params' shardings (mesh resume without a host gather)."""

import os

import numpy as np
import pytest
import jax

from test_training import tiny_opt, tiny_dataset
from cooperativeimagecaptioning_tpu.training.loop import Trainer


def test_orbax_roundtrip_single_device(tmp_path):
    ckpt = str(tmp_path / "ckpt")
    os.makedirs(ckpt)
    opt = tiny_opt(phase=2, vse_loss_weight=0, caption_loss_weight=1,
                   checkpoint_path=ckpt, start_from=ckpt, load_best_score=0,
                   checkpoint_backend="orbax")
    tr = Trainer(opt, dataset=tiny_dataset(opt), verbose=False)
    for _ in range(2):
        tr.train_iteration()
    cwd = os.getcwd()
    os.chdir(tmp_path)
    try:
        tr.checkpoint_operations()
    finally:
        os.chdir(cwd)
    tr.ckpt.sync()
    names = sorted(os.listdir(ckpt))
    assert "model.orbax" in names and "model-2.orbax" in names
    assert "model-best.orbax" in names
    assert not any(n.endswith("model.pth") for n in names)

    tr2 = Trainer(opt, dataset=tiny_dataset(opt), verbose=False)
    assert tr2.iteration == tr.iteration
    for a, b in zip(jax.tree.leaves(tr.params), jax.tree.leaves(tr2.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


@pytest.mark.slow
def test_orbax_mesh_resume_keeps_shardings(tmp_path):
    """Resume a mesh Trainer from an orbax checkpoint: params restore and
    train on the (4 data, 2 model) mesh; values match the saved tree."""
    ckpt = str(tmp_path / "ckpt")
    os.makedirs(ckpt)
    common = dict(phase=2, vse_loss_weight=0, caption_loss_weight=1,
                  checkpoint_path=ckpt, start_from=ckpt, load_best_score=0,
                  checkpoint_backend="orbax", mesh_data_axis=4,
                  mesh_model_axis=2)
    opt = tiny_opt(**common)
    tr = Trainer(opt, dataset=tiny_dataset(opt), verbose=False)
    for _ in range(2):
        tr.train_iteration()
    cwd = os.getcwd()
    os.chdir(tmp_path)
    try:
        tr.checkpoint_operations()
    finally:
        os.chdir(cwd)
    tr.ckpt.sync()

    tr2 = Trainer(tiny_opt(**common), dataset=tiny_dataset(opt),
                  verbose=False)
    assert tr2.mesh is not None
    for a, b in zip(jax.tree.leaves(tr.params), jax.tree.leaves(tr2.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    loss_dict, _, _ = tr2.train_iteration()
    assert np.isfinite(float(loss_dict["loss"]))


def test_load_params_into_orbax_fallback(tmp_path):
    """eval/harvest load via the module-level load_params_into(.pth path):
    on an orbax run the .pth is absent and the .orbax sibling must restore."""
    from cooperativeimagecaptioning_tpu.training import checkpoint as ck
    from cooperativeimagecaptioning_tpu.training import joint
    opt = tiny_opt()
    params = joint.init_params(jax.random.PRNGKey(0), opt)
    import orbax.checkpoint as ocp
    path = str(tmp_path / "model-7.pth")
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(ck.CheckpointManager._orbax_path(path), params)
    ckptr.wait_until_finished()  # async save must commit before the restore
    fresh = joint.init_params(jax.random.PRNGKey(1), opt)
    restored = ck.load_params_into(fresh, path)
    for a, b in zip(jax.tree.leaves(params), jax.tree.leaves(restored)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_harvest_recognizes_orbax_artifacts(tmp_path):
    """_count_iter_models and pruning treat <kind>-<it>.orbax directories as
    per-iteration model artifacts (regression: orbax runs were mis-cached as
    'no checkpoints' and never pruned)."""
    from cooperativeimagecaptioning_tpu.evaluation import harvest
    run = tmp_path / "run"
    run.mkdir()
    for it in (5, 10, 15):
        (run / f"alternatingModel-{it}.orbax").mkdir()
        (run / f"alternatingModel-{it}.orbax" / "blob").write_text("x")
    assert harvest._count_iter_models(str(run)) == 3
    metrics = {"test_models": {"cider": 10, "bleu4": 10, "t2i_r10": 15}}
    harvest.remove_unnecessary_models(metrics, str(run))
    left = sorted(os.listdir(run))
    assert left == ["alternatingModel-10.orbax", "alternatingModel-15.orbax"]


def test_load_params_into_orbax_lenient_merge(tmp_path):
    """A structure mismatch on the .orbax fallback must use the same lenient
    merge as the .pth path (regression: a speaker-only orbax checkpoint loaded
    into speaker+listener params raised instead of merging)."""
    from cooperativeimagecaptioning_tpu.training import checkpoint as ck
    from cooperativeimagecaptioning_tpu.training import joint
    import orbax.checkpoint as ocp
    opt = tiny_opt()
    saved = joint.init_params(jax.random.PRNGKey(0), opt)
    path = str(tmp_path / "model.pth")
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(ck.CheckpointManager._orbax_path(path),
               {"speaker": saved["speaker"]})
    ckptr.wait_until_finished()
    fresh = joint.init_params(jax.random.PRNGKey(1), opt)
    merged = ck.load_params_into(fresh, path)
    for a, b in zip(jax.tree.leaves(saved["speaker"]),
                    jax.tree.leaves(merged["speaker"])):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    for a, b in zip(jax.tree.leaves(fresh["listener"]),
                    jax.tree.leaves(merged["listener"])):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
