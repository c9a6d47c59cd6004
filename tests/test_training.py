"""End-to-end training smoke + behavior tests on synthetic data.

Covers all reference training configurations (BASELINE.json configs / run_*.sh):
  phase 1 listener pretrain, phase 2 speaker MLE, joint gumbel / gumbel_softmax /
  multinomial / multinomial_soft / reinforce (+cider), and the alternating-turn
  gradient-isolation invariant the reference audits at runtime
  (AlternatingJointModel.py:571-686)."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from cooperativeimagecaptioning_tpu.config import Options
from cooperativeimagecaptioning_tpu.data.sources import SyntheticDataset
from cooperativeimagecaptioning_tpu.training.loop import Trainer


def tiny_opt(**kw):
    base = dict(
        caption_model="att2in2", vse_model="fc", batch_size=4, seq_per_img=1,
        rnn_size=16, input_encoding_size=12, att_hid_size=8, vse_embed_size=16,
        fc_feat_size=20, att_feat_size=20, drop_prob_lm=0.1,
        learning_rate=1e-3, grad_clip=0.1, checkpoint_path="/tmp/cic_test_ckpt",
        save_checkpoint_every=10_000, losses_log_every=5, language_eval=0,
        rank_eval=0, max_epochs=-1, cached_tokens="corpus")
    base.update(kw)
    return Options(**base)


def tiny_dataset(opt, **kw):
    return SyntheticDataset(
        num_images=16, vocab_size=25, seq_length=8,
        fc_feat_size=opt.fc_feat_size, att_feat_size=opt.att_feat_size,
        max_K=6, **kw)


def leaves_changed(a, b):
    fa = jax.tree.leaves(a)
    fb = jax.tree.leaves(b)
    return [bool(np.any(np.asarray(x) != np.asarray(y)))
            for x, y in zip(fa, fb)]


def run_iters(opt, n=3, **ds_kw):
    tr = Trainer(opt, dataset=tiny_dataset(opt, **ds_kw), verbose=False)
    losses = []
    for _ in range(n):
        loss_dict, turn, _ = tr.train_iteration()
        losses.append(loss_dict)
        assert np.isfinite(loss_dict["loss"])
    return tr, losses


def test_phase1_listener_pretrain():
    """run_fc_con.sh: vse only, caption frozen (caption_loss_weight 0)."""
    opt = tiny_opt(caption_model="fc", phase=1, vse_loss_weight=1,
                   caption_loss_weight=0)
    tr, losses = run_iters(opt)
    assert "loss_vse" in losses[0]
    assert "loss_cap" not in losses[0]


@pytest.mark.slow
def test_phase2_speaker_mle():
    """run_att.sh: pure MLE."""
    opt = tiny_opt(phase=2, vse_loss_weight=0, caption_loss_weight=1)
    before = jax.tree.map(np.asarray, {"l": None})  # placeholder
    tr, losses = run_iters(opt)
    assert "loss_cap" in losses[0]
    assert "loss_vse" not in losses[0]


@pytest.mark.slow
def test_phase2_loss_decreases():
    opt = tiny_opt(phase=2, vse_loss_weight=0, caption_loss_weight=1,
                   learning_rate=5e-3, drop_prob_lm=0.0)
    tr = Trainer(opt, dataset=tiny_dataset(opt), verbose=False)
    first = tr.train_iteration()[0]["loss_cap"]
    for _ in range(30):
        last = tr.train_iteration()[0]["loss_cap"]
    assert last < first


@pytest.mark.parametrize("mode", ["gumbel", "gumbel_softmax", "multinomial",
                                  "multinomial_soft"])
@pytest.mark.slow
def test_joint_st_modes(mode):
    """run_joint.sh -o <mode>: alternating, disc + cider composition."""
    opt = tiny_opt(is_alternating=1, alternating_turn=["speaker", "listener"],
                   retrieval_reward=mode, retrieval_reward_weight=0.1,
                   cider_optimization=0.9, caption_loss_weight=1,
                   vse_loss_weight=0.1, phase=3)
    tr, losses = run_iters(opt, n=2)
    assert "retrieval_loss" in losses[0]
    assert "loss_cider" in losses[0]
    assert "avg_reward" in losses[0]
    # non-reinforce alternating collapses turns to speaker only
    # (optimizer.py:90-96)
    assert tr.turns == ["speaker"]


@pytest.mark.slow
def test_joint_reinforce_alternating_isolation():
    """reinforce: speaker turn must not move listener params and vice versa
    (the invariant the reference audits in changeModelUpdateStatus)."""
    opt = tiny_opt(is_alternating=1, alternating_turn=["speaker", "listener"],
                   retrieval_reward="reinforce", retrieval_reward_weight=0.8,
                   cider_optimization=0.2, caption_loss_weight=1,
                   vse_loss_weight=0.1, reinforce_baseline_type="greedy",
                   phase=3)
    tr = Trainer(opt, dataset=tiny_dataset(opt), verbose=False)
    assert tr.turns == ["speaker", "listener"]

    p0 = jax.tree.map(np.asarray, tr.params)
    _, turn, _ = tr.train_iteration()  # speaker turn
    assert turn == "speaker"
    p1 = jax.tree.map(np.asarray, tr.params)
    assert any(leaves_changed(p0["speaker"], p1["speaker"]))
    assert not any(leaves_changed(p0["listener"], p1["listener"]))

    _, turn, _ = tr.train_iteration()  # listener turn
    assert turn == "listener"
    p2 = jax.tree.map(np.asarray, tr.params)
    assert not any(leaves_changed(p1["speaker"], p2["speaker"]))
    assert any(leaves_changed(p1["listener"], p2["listener"]))


@pytest.mark.slow
def test_joint_gumbel_updates_both_agents():
    """Non-reinforce: both optimizers step on the (collapsed) speaker turn."""
    opt = tiny_opt(is_alternating=1, alternating_turn=["speaker", "listener"],
                   retrieval_reward="gumbel", retrieval_reward_weight=1.0,
                   cider_optimization=0, caption_loss_weight=1,
                   vse_loss_weight=0.0, phase=3)
    tr = Trainer(opt, dataset=tiny_dataset(opt), verbose=False)
    p0 = jax.tree.map(np.asarray, tr.params)
    tr.train_iteration()
    p1 = jax.tree.map(np.asarray, tr.params)
    assert any(leaves_changed(p0["speaker"], p1["speaker"]))
    assert any(leaves_changed(p0["listener"], p1["listener"]))


@pytest.mark.slow
def test_reinforce_baseline_types():
    for bl in ["greedy", "gt", "no"]:
        opt = tiny_opt(retrieval_reward="reinforce", retrieval_reward_weight=1,
                       reinforce_baseline_type=bl, caption_loss_weight=1,
                       vse_loss_weight=0, phase=3)
        tr, losses = run_iters(opt, n=1)
        assert "retrieval_sc_loss" in losses[0]


def test_share_embed_stays_identical():
    """Shared word embedding must remain bit-identical after optimizer steps
    (ref: train.py:132-140 check_equal_embed_weights)."""
    opt = tiny_opt(share_embed=1, retrieval_reward="gumbel",
                   retrieval_reward_weight=0.5, is_alternating=1,
                   alternating_turn=["speaker", "listener"],
                   caption_loss_weight=1, vse_loss_weight=0.1, phase=3)
    tr = Trainer(opt, dataset=tiny_dataset(opt), verbose=False)
    assert "embed" not in tr.params["speaker"]  # stored once, injected
    tr.train_iteration()


@pytest.mark.slow
def test_checkpoint_resume_roundtrip(tmp_path):
    opt = tiny_opt(phase=2, caption_loss_weight=1, vse_loss_weight=0,
                   checkpoint_path=str(tmp_path), id="t1",
                   save_checkpoint_every=2, rank_eval=0, val_images_use=4)
    ds = tiny_dataset(opt)
    tr = Trainer(opt, dataset=ds, verbose=False)
    for _ in range(2):
        tr.train_iteration()
    tr.checkpoint_operations()
    p_saved = jax.tree.map(np.asarray, tr.params)
    it_saved = tr.iteration

    opt2 = tiny_opt(phase=2, caption_loss_weight=1, vse_loss_weight=0,
                    checkpoint_path=str(tmp_path), id="t1",
                    start_from=str(tmp_path))
    tr2 = Trainer(opt2, dataset=ds, verbose=False)
    assert tr2.iteration == it_saved
    assert all(not c for c in leaves_changed(p_saved, tr2.params))

    # Adam moments and step counts resume too (ref optimizer.py:149-188;
    # regression: they silently re-initialized, so the first post-resume
    # steps took fresh bias-corrected jumps)
    for agent, st in tr.optim.state_dict().items():
        st2 = tr2.optim.state_dict()[agent]
        for a, b in zip(jax.tree.leaves(st), jax.tree.leaves(st2)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


@pytest.mark.slow
def test_seq_per_img_replication():
    """seq_per_img=5: fc feats replicated per caption, rewards index
    gts[i % B // spi] correctly (ref dataloader.py:218, rewards.py:55)."""
    opt = tiny_opt(phase=3, retrieval_reward="multinomial",
                   retrieval_reward_weight=0.1, cider_optimization=0.9,
                   caption_loss_weight=1, vse_loss_weight=0.1, seq_per_img=5,
                   is_alternating=0)
    tr = Trainer(opt, dataset=tiny_dataset(opt), verbose=False)
    data = tr.loader.get_batch("train")
    B = opt.batch_size * opt.seq_per_img
    assert data["fc_feats"].shape[0] == B
    assert data["labels"].shape[0] == B
    # fc rows replicated within each image group
    fc = data["fc_feats"]
    assert np.array_equal(fc[0], fc[4])
    assert not np.array_equal(fc[0], fc[5])
    loss_dict, _, _ = tr.train_iteration(data=data)
    assert np.isfinite(loss_dict["loss"])
    assert "avg_reward" in loss_dict


def test_phase1_checkpoint_operations(tmp_path, monkeypatch):
    """Phase-1 checkpoint ops: dual-split rank eval + nested vse criterion
    (ref: eval_utils.py:259-267, train.py:262-282)."""
    monkeypatch.chdir(tmp_path)
    opt = tiny_opt(caption_model="fc", phase=1, vse_loss_weight=1,
                   caption_loss_weight=0, rank_eval=1, language_eval=0,
                   checkpoint_path=str(tmp_path), id="p1", val_images_use=-1)
    tr = Trainer(opt, dataset=tiny_dataset(opt), verbose=False)
    tr.train_iteration()
    val_loss, lang_stats = tr.checkpoint_operations()
    assert "val" in val_loss and "test" in val_loss  # dual-split ranking
    assert "rsum" in val_loss["val"]
    assert tr.best_val_score_vse is not None


@pytest.mark.slow
def test_only_one_retrieval_variants():
    """only_one_retrieval image/caption flows through the joint loss
    (ref VSEFCModel.py:202-207)."""
    for oor in ("image", "caption"):
        opt = tiny_opt(retrieval_reward="gumbel", retrieval_reward_weight=0.5,
                       caption_loss_weight=1, vse_loss_weight=0.1, phase=3,
                       is_alternating=0, only_one_retrieval=oor)
        tr = Trainer(opt, dataset=tiny_dataset(opt), verbose=False)
        ld, _, _ = tr.train_iteration()
        assert np.isfinite(float(ld["loss"]))


@pytest.mark.slow
def test_runtime_grad_isolation_audit():
    """--audit_grad_isolation 1: a reinforce alternating run passes the
    per-turn isolation audit (ref UpdateError, AlternatingJointModel:571-686),
    and a tampered frozen agent raises."""
    import pytest
    from cooperativeimagecaptioning_tpu.training import audit

    opt = tiny_opt(is_alternating=1, alternating_turn=["speaker", "listener"],
                   retrieval_reward="reinforce", retrieval_reward_weight=0.1,
                   reinforce_baseline_type="greedy", cider_optimization=0,
                   caption_loss_weight=1, vse_loss_weight=0.1, phase=3,
                   audit_grad_isolation=1)
    tr = Trainer(opt, dataset=tiny_dataset(opt), verbose=False)
    for _ in range(4):  # both turns, audited every step
        loss_dict, turn, _ = tr.train_iteration()
        assert np.isfinite(loss_dict["loss"])

    # negative case: fake a listener update during a speaker-only turn
    prev = tr.params
    tampered = {a: dict(t) for a, t in tr.params.items()}
    tampered["listener"] = jax.tree.map(lambda x: x + 1.0,
                                        tampered["listener"])
    with pytest.raises(audit.UpdateError):
        audit.audit_update(prev, tampered, ("speaker",))


@pytest.mark.slow
def test_remat_teacher_forced_loss_parity():
    """--remat 1 (fused-CE rematerialized scan) is bit-identical to the
    standard teacher-forced path in loss AND gradients."""
    import jax.numpy as jnp
    from cooperativeimagecaptioning_tpu.training import joint

    def run(remat):
        opt = tiny_opt(phase=3, caption_loss_weight=1, vse_loss_weight=0.2,
                       retrieval_reward_weight=0, cider_optimization=0,
                       remat=remat, ss_prob=0.15, drop_prob_lm=0.3)
        opt.vocab_size = 12
        opt.seq_length = 6
        params = joint.init_params(jax.random.PRNGKey(0), opt)
        rng = np.random.RandomState(0)
        B, L = 4, 6
        batch = {
            "fc_feats": jnp.asarray(rng.randn(B, 20).astype(np.float32)),
            "att_feats": jnp.asarray(
                rng.randn(B, 5, 20).astype(np.float32)),
            "att_masks": None,
            "labels": jnp.asarray(np.concatenate(
                [np.zeros((B, 1), np.int32),
                 rng.randint(1, 13, (B, L)).astype(np.int32),
                 np.zeros((B, 1), np.int32)], 1)),
            "masks": jnp.ones((B, L + 2), jnp.float32)}
        hp = joint.Hyper.from_opt(opt)
        _, grad_fn = joint.make_step_fns(opt, "optimizer")
        (loss, _), grads = grad_fn(params, batch, jax.random.PRNGKey(7), hp,
                                   jnp.zeros((B,)))
        return float(loss), jax.tree.leaves(grads)

    l0, g0 = run(0)
    l1, g1 = run(1)
    assert abs(l0 - l1) < 1e-6
    for a, b in zip(g0, g1):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)



def test_nonfinite_guard_counts_skipped_steps():
    """NaN grads leave params + Adam state untouched and increment the
    device-side skipped-step counter (read once, at checkpoint cadence)."""
    from cooperativeimagecaptioning_tpu.training.optim import OptimizerManager
    from cooperativeimagecaptioning_tpu.training import joint
    import jax.numpy as jnp
    opt = tiny_opt(phase=2, vse_loss_weight=0, caption_loss_weight=1)
    opt.vocab_size, opt.seq_length = 25, 8
    params = joint.init_params(jax.random.PRNGKey(0), opt)
    om = OptimizerManager(opt, params)
    good = jax.tree.map(jnp.ones_like, params)
    bad = jax.tree.map(
        lambda x: jnp.full_like(x, jnp.nan), params)
    p1 = om.step(params, bad, "optimizer")
    for a, b in zip(jax.tree.leaves(p1), jax.tree.leaves(params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    assert om.skipped_steps() == 1
    p2 = om.step(p1, good, "optimizer")
    assert om.skipped_steps() == 1
    assert any(not np.array_equal(np.asarray(a), np.asarray(b))
               for a, b in zip(jax.tree.leaves(p2), jax.tree.leaves(p1)))


def test_audit_tolerates_guard_skipped_step():
    """--audit_grad_isolation must not raise UpdateError for a step the
    non-finite guard rejected (params legitimately unchanged)."""
    opt = tiny_opt(phase=3, is_alternating=1,
                   alternating_turn=["speaker", "listener"],
                   retrieval_reward="gumbel", retrieval_reward_weight=0.1,
                   cider_optimization=0.9, caption_loss_weight=1,
                   vse_loss_weight=0.1, on_device_cider=1,
                   audit_grad_isolation=1)
    ds = tiny_dataset(opt)
    tr = Trainer(opt, dataset=ds, verbose=False)
    data = tr.loader.get_batch("train")
    data["fc_feats"] = np.full_like(data["fc_feats"], np.nan)
    data["att_feats"] = np.full_like(data["att_feats"], np.nan)
    ld, _, _ = tr.train_iteration(data=data)  # NaN grads -> guard skips
    assert tr.optim.skipped_steps() == 1
    ld, _, _ = tr.train_iteration()  # healthy step passes the audit
    assert np.isfinite(float(ld["loss"]))
    tr.close()


def test_stage2_optimizer_seeds_joint_run(tmp_path):
    """A fresh joint run carries the stage-2 speaker's Adam state
    (ref optimizer.py:49-96 / copy_model.sh whole-dir copy)."""
    from cooperativeimagecaptioning_tpu.training import checkpoint as ck
    opt2 = tiny_opt(phase=2, caption_loss_weight=1, vse_loss_weight=0,
                    checkpoint_path=str(tmp_path / "att"))
    import os
    os.makedirs(opt2.checkpoint_path)
    ds = tiny_dataset(opt2)
    tr2 = Trainer(opt2, dataset=ds, verbose=False)
    for _ in range(2):
        tr2.train_iteration()
    tr2.ckpt.save_optimizers(tr2.optim)  # writes optimizer.pth (phase 2)
    tr2.ckpt.save_model(tr2.params)

    jopt = tiny_opt(phase=3, is_alternating=1,
                    alternating_turn=["speaker", "listener"],
                    retrieval_reward="gumbel", retrieval_reward_weight=0.1,
                    cider_optimization=0, caption_loss_weight=1,
                    vse_loss_weight=0.1,
                    checkpoint_path=str(tmp_path / "joint"),
                    speaker_stage_2_optimizer_path=os.path.join(
                        opt2.checkpoint_path, "optimizer.pth"))
    os.makedirs(jopt.checkpoint_path)
    trj = Trainer(jopt, dataset=ds, verbose=False)
    want = jax.tree.leaves(tr2.optim.state_dict()["speaker"])
    got = jax.tree.leaves(trj.optim.state_dict()["speaker"])
    matched = sum(np.array_equal(np.asarray(a), np.asarray(b))
                  for a, b in zip(want, got))
    assert matched == len(want)  # Adam moments + step count carried over


def test_options_replace_rejects_unknown():
    opt = tiny_opt()
    with pytest.raises(AttributeError):
        opt.replace(learning_rte=1e-4)
    assert opt.replace(learning_rate=1e-4).learning_rate == 1e-4


def test_listener_optimizer_seeds_from_initialize_retrieval(tmp_path):
    """A fresh joint run also carries the stage-1 listener's Adam state, read
    from optimizer.pth next to --initialize_retrieval (ref optimizer.py:79-85);
    share_embed gates BOTH cross-stage seedings off (ref optimizer.py:60-63)."""
    import os
    opt1 = tiny_opt(caption_model="fc", phase=1, vse_loss_weight=1,
                    caption_loss_weight=0,
                    checkpoint_path=str(tmp_path / "con"))
    os.makedirs(opt1.checkpoint_path)
    ds = tiny_dataset(opt1)
    tr1 = Trainer(opt1, dataset=ds, verbose=False)
    for _ in range(2):
        tr1.train_iteration()
    tr1.ckpt.save_optimizers(tr1.optim)  # optimizer.pth (phase-1 listener)
    tr1.ckpt.save_model(tr1.params)      # model.pth
    tr1.close()
    retrieval_path = os.path.join(opt1.checkpoint_path, "model.pth")

    def joint_opt(**kw):
        return tiny_opt(phase=3, is_alternating=1,
                        alternating_turn=["speaker", "listener"],
                        retrieval_reward="gumbel",
                        retrieval_reward_weight=0.1, cider_optimization=0,
                        caption_loss_weight=1, vse_loss_weight=0.1,
                        initialize_retrieval=retrieval_path,
                        checkpoint_path=str(tmp_path / "joint"), **kw)

    jopt = joint_opt()
    os.makedirs(jopt.checkpoint_path)
    trj = Trainer(jopt, dataset=ds, verbose=False)
    want = jax.tree.leaves(tr1.optim.state_dict()["listener"])
    got = jax.tree.leaves(trj.optim.state_dict()["listener"])
    assert all(np.array_equal(np.asarray(a), np.asarray(b))
               for a, b in zip(want, got))
    trj.close()

    # share_embed: the listener state must stay FRESH (zero moments)
    trs = Trainer(joint_opt(share_embed=1), dataset=ds, verbose=False)
    fresh = jax.tree.leaves(trs.optim.state_dict()["listener"])
    matched = sum(np.array_equal(np.asarray(a), np.asarray(b))
                  for a, b in zip(want, fresh))
    assert matched < len(want)
    trs.close()


def test_device_feature_cache_matches_streaming():
    """--device_feature_cache gathers fc/att from an HBM-resident cache by
    batch index instead of streaming features from host; the training math
    must be identical to the streaming path (masked attention makes the
    different padding widths exact no-ops)."""
    losses = {}
    for cache in (0, 1):
        # max_att_len pins both paths to the same padded K: without it the
        # streaming path pads to the batch max and the cache to the dataset
        # max, which is mathematically identical but float-reassociates
        opt = tiny_opt(phase=2, caption_loss_weight=1, vse_loss_weight=0,
                       device_feature_cache=cache, max_att_len=6)
        tr, ld = run_iters(opt, n=3)
        losses[cache] = [float(d["loss"]) for d in ld]
        if cache:
            assert tr._feat_cache is not None
            assert "train" in tr.loader.feature_free_splits
        tr.close()
    np.testing.assert_allclose(losses[1], losses[0], rtol=1e-7)


def test_put_chunked_matches_single_transfer():
    """Chunked host->device upload (bounded RPCs through thin links) must
    reproduce the array exactly, including the non-divisible tail."""
    opt = tiny_opt()
    tr = Trainer(opt, dataset=tiny_dataset(opt), verbose=False)
    arr = np.arange(7 * 3 * 5, dtype=np.float32).reshape(7, 3, 5)
    out = tr._put_chunked(arr, chunk_bytes=2 * arr[0].nbytes)  # 4 chunks
    np.testing.assert_array_equal(np.asarray(out), arr)
    out1 = tr._put_chunked(arr)  # single-transfer path
    np.testing.assert_array_equal(np.asarray(out1), arr)
    tr.close()


def test_feature_cache_bf16_and_cross_stage_extension():
    """feature_cache_dtype=bf16 stores the att block half-width (gathered
    batches come back f32), and a cache built by a phase-1 fc+fc stage
    (fc-only) is EXTENDED with the att block when a later att-model stage
    reuses the same dataset (the multi-stage showcase/reproduce protocols)."""
    opt1 = tiny_opt(phase=1, caption_model="fc", vse_loss_weight=1,
                    caption_loss_weight=0, device_feature_cache=1)
    ds = tiny_dataset(opt1)
    tr1 = Trainer(opt1, dataset=ds, verbose=False)
    assert "att" not in tr1._feat_cache  # fc+fc stage needs no att block
    tr1.close()

    opt2 = tiny_opt(phase=2, caption_loss_weight=1, vse_loss_weight=0,
                    device_feature_cache=1, feature_cache_dtype="bf16",
                    max_att_len=6)
    tr2 = Trainer(opt2, dataset=ds, verbose=False)
    assert tr2._feat_cache["att"].dtype == jnp.bfloat16
    assert tr2._feat_cache["fc"] is tr1._feat_cache["fc"]  # shared, not rebuilt
    batch = tr2._prepare_batch(tr2.loader.get_batch("train"))
    assert batch["att_feats"].dtype == jnp.float32
    # bf16-rounded features must still train: loss finite and close to the
    # f32-cache loss (same batch order via the fresh loader)
    loss_dict, _, _ = tr2.train_iteration()
    assert np.isfinite(float(loss_dict["loss"]))
    tr2.close()


def test_eval_uses_feature_cache_and_matches_streaming(tmp_path):
    """Checkpoint evals gather val features from the HBM cache on device
    (round 4): predictions, val losses, and rank metrics must be identical
    to the streaming path, and the val split must actually go feature-free
    (the host link never ships eval features again)."""
    import os
    results = {}
    for cache in (0, 1):
        opt = tiny_opt(phase=2, caption_loss_weight=1, vse_loss_weight=0,
                       device_feature_cache=cache, max_att_len=6,
                       language_eval=1, rank_eval=1, val_images_use=4,
                       checkpoint_path=str(tmp_path / f"c{cache}"))
        os.makedirs(opt.checkpoint_path, exist_ok=True)
        tr = Trainer(opt, dataset=tiny_dataset(opt), verbose=False)
        tr.train_iteration()
        tr.checkpoint_operations()
        entry = tr.val_result_history[tr.iteration]
        if cache:
            assert tr._evaluator.feat_cache is not None
            assert {"val", "test"} <= tr.loader.feature_free_splits
            # feature-free val batches carry only dummy feature rows
            tr.loader.reset_iterator("val")
            data = tr.loader.get_batch("val")
            assert data["fc_feats"].shape[1] == 1
        results[cache] = entry
        tr.close()
    assert results[0]["predictions"] == results[1]["predictions"]
    for k, v in results[0]["loss"].items():
        if isinstance(v, float):
            np.testing.assert_allclose(results[1]["loss"][k], v, rtol=1e-6,
                                       err_msg=k)
    assert results[0]["lang_stats"] == results[1]["lang_stats"]


def test_fresh_seeded_joint_keeps_stage1_listener(tmp_path):
    """copy_model.sh seeding regression: a FRESH joint run dir seeded from the
    stage-2 checkpoint must bootstrap speaker=stage-2, listener=stage-1
    (initialize_retrieval) — the copied file must not masquerade as
    alternatingModel.pth, which would make try_load_model lenient-merge
    stage-2's untrained listener over the trained one (ref cascade
    AlternatingJointModel.py:131-177).  A genuine resume (alternatingModel.pth
    saved by joint training) must override the seeds."""
    import os
    from scripts.run_joint import seed_checkpoint_dir

    opt1 = tiny_opt(caption_model="fc", phase=1, vse_loss_weight=1,
                    caption_loss_weight=0,
                    checkpoint_path=str(tmp_path / "con"))
    os.makedirs(opt1.checkpoint_path)
    ds = tiny_dataset(opt1)
    tr1 = Trainer(opt1, dataset=ds, verbose=False)
    for _ in range(2):
        tr1.train_iteration()
    tr1.ckpt.save_model(tr1.params)
    listener_s1 = jax.tree.leaves(tr1.params["listener"])
    tr1.close()

    opt2 = tiny_opt(phase=2, caption_loss_weight=1, vse_loss_weight=0,
                    checkpoint_path=str(tmp_path / "att"))
    os.makedirs(opt2.checkpoint_path)
    tr2 = Trainer(opt2, dataset=ds, verbose=False)
    for _ in range(2):
        tr2.train_iteration()
    tr2.ckpt.save_model(tr2.params)
    speaker_s2 = jax.tree.leaves(tr2.params["speaker"])
    listener_s2 = jax.tree.leaves(tr2.params["listener"])
    tr2.close()

    s3 = str(tmp_path / "joint")
    s2_model = os.path.join(opt2.checkpoint_path, "model.pth")
    seed_checkpoint_dir(s3, s2_model, "att_d0.01")
    assert not os.path.isfile(os.path.join(s3, "alternatingModel.pth"))

    jopt = tiny_opt(phase=3, is_alternating=1,
                    alternating_turn=["speaker", "listener"],
                    retrieval_reward="gumbel", retrieval_reward_weight=0.1,
                    cider_optimization=0, caption_loss_weight=1,
                    vse_loss_weight=0.1, checkpoint_path=s3, start_from=s3,
                    speaker_stage_2_model_path=s2_model,
                    initialize_retrieval=os.path.join(
                        opt1.checkpoint_path, "model.pth"))
    trj = Trainer(jopt, dataset=ds, verbose=False)
    got_l = jax.tree.leaves(trj.params["listener"])
    got_s = jax.tree.leaves(trj.params["speaker"])
    assert all(np.array_equal(np.asarray(a), np.asarray(b))
               for a, b in zip(listener_s1, got_l)), \
        "fresh seeded joint run lost the stage-1 listener"
    assert all(np.array_equal(np.asarray(a), np.asarray(b))
               for a, b in zip(speaker_s2, got_s))
    # the stage-2 checkpoint's random listener must NOT have won
    assert any(not np.array_equal(np.asarray(a), np.asarray(b))
               for a, b in zip(listener_s2, got_l))

    # train one joint turn, save, and resume: alternatingModel.pth now exists
    # and its (trained) listener must override the stage-1 seed
    trj.train_iteration()
    trj.ckpt.save_model(trj.params)
    assert os.path.isfile(os.path.join(s3, "alternatingModel.pth"))
    trained_l = jax.tree.leaves(trj.params["listener"])
    trj.close()
    trr = Trainer(jopt, dataset=ds, verbose=False)
    got = jax.tree.leaves(trr.params["listener"])
    assert all(np.array_equal(np.asarray(a), np.asarray(b))
               for a, b in zip(trained_l, got))
    trr.close()


def test_phase2_carries_stage1_listener(tmp_path):
    """run_att.sh passes --initialize_retrieval (stage-1 model_vse-best) into
    PHASE 2, so stage-2 checkpoints embed the trained listener — the
    reference's joint bootstrap depends on this carry (run_att.sh:102-103)."""
    import os
    opt1 = tiny_opt(caption_model="fc", phase=1, vse_loss_weight=1,
                    caption_loss_weight=0,
                    checkpoint_path=str(tmp_path / "con"))
    os.makedirs(opt1.checkpoint_path)
    ds = tiny_dataset(opt1)
    tr1 = Trainer(opt1, dataset=ds, verbose=False)
    tr1.train_iteration()
    tr1.ckpt.save_model(tr1.params)
    listener_s1 = jax.tree.leaves(tr1.params["listener"])
    tr1.close()

    opt2 = tiny_opt(phase=2, caption_loss_weight=1, vse_loss_weight=0,
                    initialize_retrieval=os.path.join(
                        opt1.checkpoint_path, "model.pth"),
                    checkpoint_path=str(tmp_path / "att"))
    os.makedirs(opt2.checkpoint_path)
    tr2 = Trainer(opt2, dataset=ds, verbose=False)
    got = jax.tree.leaves(tr2.params["listener"])
    assert all(np.array_equal(np.asarray(a), np.asarray(b))
               for a, b in zip(listener_s1, got))
    tr2.close()


def test_feature_cache_invalidated_on_transform_change():
    """Cross-stage cache reuse is keyed on the att transforms + storage
    dtype: a later stage with different norm_att_feat (or dtype) must
    rebuild the att block, not train on the other stage's scaling."""
    opt_a = tiny_opt(phase=2, caption_loss_weight=1, vse_loss_weight=0,
                     device_feature_cache=1, max_att_len=6)
    ds = tiny_dataset(opt_a)
    tr_a = Trainer(opt_a, dataset=ds, verbose=False)
    att_a = tr_a._feat_cache["att"]
    tr_a.close()

    opt_b = opt_a.replace(norm_att_feat=1)
    tr_b = Trainer(opt_b, dataset=ds, verbose=False)
    att_b = tr_b._feat_cache["att"]
    assert att_b is not att_a
    a = np.asarray(att_a[0, 0]); b = np.asarray(att_b[0, 0])
    np.testing.assert_allclose(b, a / np.linalg.norm(a), rtol=1e-5)
    tr_b.close()

    # same transforms again -> reuse without rebuild
    tr_c = Trainer(opt_b, dataset=ds, verbose=False)
    assert tr_c._feat_cache["att"] is att_b
    tr_c.close()


def test_histories_recorded_via_train_iteration(tmp_path):
    """loss/lr/ss histories must be recorded by train_iteration itself (ref
    train.py:238-244) so showcase/library drivers that bypass Trainer.train()
    still produce the reference's histories pkl; values are converted to
    host floats at checkpoint save."""
    import os, pickle
    opt = tiny_opt(phase=2, caption_loss_weight=1, vse_loss_weight=0,
                   losses_log_every=2, save_checkpoint_every=10_000,
                   checkpoint_path=str(tmp_path / "h"))
    os.makedirs(opt.checkpoint_path)
    tr = Trainer(opt, dataset=tiny_dataset(opt), verbose=False)
    for _ in range(5):
        tr.train_iteration()
    assert sorted(tr.loss_history) == [2, 4]
    assert sorted(tr.lr_history) == [2, 4]
    tr.checkpoint_operations()
    tr.close()
    h = pickle.load(open(os.path.join(
        opt.checkpoint_path, f"histories_{opt.id}.pkl"), "rb"))
    assert set(h["loss_history"]) == {2, 4}
    assert all(isinstance(v, float) for v in h["loss_history"].values())


def test_use_bn_tracks_running_stats_from_scratch():
    """use_bn trained from scratch must produce batch-INDEPENDENT eval
    outputs: training tracks BN running stats (EMA, torch semantics), and
    eval normalizes with them — not with eval-batch statistics (which made
    a caption depend on which other images shared the batch)."""
    from cooperativeimagecaptioning_tpu.models import att_model as am
    opt = tiny_opt(phase=2, caption_loss_weight=1, vse_loss_weight=0,
                   use_bn=1, max_att_len=6)
    tr = Trainer(opt, dataset=tiny_dataset(opt), verbose=False)
    bn0 = jax.tree.map(np.asarray, tr.params["speaker"]["att_bn"])
    assert "mean" in bn0 and "var" in bn0  # running stats exist at init
    for _ in range(3):
        tr.train_iteration()
    bn1 = jax.tree.map(np.asarray, tr.params["speaker"]["att_bn"])
    assert not np.allclose(bn0["mean"], bn1["mean"])  # EMA moved
    # eval path: same image, different batch compositions -> same encoding
    sp = tr.params["speaker"]
    rng = np.random.RandomState(0)
    att = rng.randn(4, 6, opt.att_feat_size).astype(np.float32)
    m = np.ones((4, 6), np.float32)
    full = np.asarray(am.encode_features(sp, None, jnp.asarray(att),
                                         jnp.asarray(m))["att_feats"])
    solo = np.asarray(am.encode_features(sp, None, jnp.asarray(att[:1]),
                                         jnp.asarray(m[:1]))["att_feats"])
    np.testing.assert_allclose(full[:1], solo, rtol=1e-5, atol=1e-6)
    tr.close()


def test_vse_hinge_warmup_switches_mean_to_max():
    """Extension flag vse_hinge_warmup_iters (VSE++ warm-start recipe,
    VERDICT r4 item 3): the phase-1 contrastive loss uses the MEAN hinge
    while iteration < warmup and the reference max-violation hinge after —
    traced through Hyper.vse_max_w so the switch never recompiles.  Verified
    by matching each side of the boundary against an explicitly-flagged run
    on the same batch/PRNG."""
    from cooperativeimagecaptioning_tpu.training import schedules

    def loss_at(opt, iteration, seed=3):
        tr = Trainer(opt, dataset=tiny_dataset(opt), verbose=False)
        tr.iteration = iteration
        tr._rng = jax.random.PRNGKey(seed)
        data = tr.loader.get_batch("train")
        loss_dict, _, _ = tr.train_iteration(data=data)
        tr.close()
        return float(loss_dict["loss_vse"])

    base = dict(caption_model="fc", phase=1, vse_loss_weight=1,
                caption_loss_weight=0, drop_prob_lm=0.0)
    warm = tiny_opt(vse_hinge_warmup_iters=3, **base)
    mean_flag = tiny_opt(vse_max_violation=0, **base)
    max_flag = tiny_opt(vse_max_violation=1, **base)
    assert schedules.vse_max_violation_w(warm, 2) == 0.0
    assert schedules.vse_max_violation_w(warm, 3) == 1.0
    assert loss_at(warm, 2) == loss_at(mean_flag, 2)   # warm-up: mean hinge
    assert loss_at(warm, 3) == loss_at(max_flag, 3)    # post-switch: max
    assert loss_at(mean_flag, 2) != loss_at(max_flag, 2)  # the switch is real
