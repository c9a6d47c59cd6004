"""Distributed (GSPMD) training step on the virtual 8-device CPU mesh, and
equivalence with the single-device step."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from cooperativeimagecaptioning_tpu.config import Options
from cooperativeimagecaptioning_tpu.parallel import (
    make_mesh, replicate, shard_batch)
from cooperativeimagecaptioning_tpu.parallel.train_step import (
    make_distributed_train_step)
from cooperativeimagecaptioning_tpu.training import joint


def make_opt(**kw):
    base = dict(caption_model="att2in2", vse_model="fc", batch_size=16,
                rnn_size=16, input_encoding_size=12, att_hid_size=8,
                vse_embed_size=16, fc_feat_size=20, att_feat_size=20,
                drop_prob_lm=0.0, learning_rate=1e-3, is_alternating=1,
                alternating_turn=["speaker", "listener"],
                retrieval_reward="gumbel", retrieval_reward_weight=0.1,
                cider_optimization=0, caption_loss_weight=1,
                vse_loss_weight=0.1, phase=3, max_att_len=6, seq_per_img=1,
                use_att=True)
    base.update(kw)
    opt = Options(**base)
    opt.vocab_size = 30
    opt.seq_length = 8
    return opt


def make_batch(opt, seed=0):
    rng = np.random.RandomState(seed)
    B, K, L = opt.batch_size, opt.max_att_len, opt.seq_length
    return {
        "fc_feats": jnp.asarray(rng.randn(B, opt.fc_feat_size), jnp.float32),
        "att_feats": jnp.asarray(
            rng.randn(B, K, opt.att_feat_size), jnp.float32),
        "att_masks": jnp.ones((B, K), jnp.float32),
        "labels": jnp.asarray(np.concatenate(
            [np.zeros((B, 1)), rng.randint(1, 30, (B, L)),
             np.zeros((B, 1))], axis=1), jnp.int32),
        "masks": jnp.ones((B, L + 2), jnp.float32),
    }


@pytest.mark.slow
def test_distributed_step_runs_and_matches_replicated():
    assert len(jax.devices()) >= 8
    opt = make_opt()
    params = joint.init_params(jax.random.PRNGKey(0), opt)
    batch = make_batch(opt)
    hp = joint.Hyper.from_opt(opt)
    rng = jax.random.PRNGKey(1)
    reward = jnp.zeros((opt.batch_size,))

    # single-device reference loss
    modules = {"speaker": __import__(
        "cooperativeimagecaptioning_tpu.models.att_model",
        fromlist=["x"])}
    from cooperativeimagecaptioning_tpu import models as zoo
    mods = {"speaker": zoo.setup(opt, "att2in2", "caption_model")}
    loss_ref, _ = joint.loss_fn(mods, params, opt, batch, rng, hp,
                                "speaker", reward, train=True)

    for n_data, n_model in [(8, 1), (4, 2)]:
        mesh = make_mesh(n_data=n_data, n_model=n_model)
        with mesh:
            p = replicate(params, mesh)
            init_states, step = make_distributed_train_step(
                opt, "speaker", mesh, donate=False)
            states = replicate(init_states(p), mesh)
            sb = shard_batch(batch, mesh)
            new_p, new_s, loss, aux = step(
                p, states, sb, replicate(rng, mesh), replicate(hp, mesh),
                jax.device_put(reward, jax.sharding.NamedSharding(
                    mesh, jax.sharding.PartitionSpec("data"))))
            # identical math regardless of mesh shape
            np.testing.assert_allclose(float(loss), float(loss_ref),
                                       rtol=2e-5)
            # params actually moved
            moved = any(
                not np.array_equal(np.asarray(a), np.asarray(b))
                for a, b in zip(jax.tree.leaves(p), jax.tree.leaves(new_p)))
            assert moved


@pytest.mark.slow
def test_distributed_step_on_device_cider_refs():
    """The distributed step must accept the reward-ref batch keys
    ('refs'/'ref_mask') and produce a NONZERO CIDEr loss term (regression:
    a fixed 5-key in_shardings dict rejected them, silently zeroing the RL
    term on the multi-chip path)."""
    assert len(jax.devices()) >= 8
    opt = make_opt(cider_optimization=0.9, on_device_cider=1)
    params = joint.init_params(jax.random.PRNGKey(0), opt)
    batch = make_batch(opt)
    from cooperativeimagecaptioning_tpu.rewards import ngram_device
    gts = [np.asarray(batch["labels"])[i:i + 1, 1:-1].astype(np.int32)
           for i in range(opt.batch_size)]
    batch = dict(batch)
    batch["refs"], batch["ref_mask"] = ngram_device.pad_gts(
        gts, seq_length=opt.seq_length)
    hp = joint.Hyper.from_opt(opt)
    rng = jax.random.PRNGKey(1)
    reward = jnp.zeros((opt.batch_size,))

    mesh = make_mesh(n_data=8, n_model=1)
    with mesh:
        p = replicate(params, mesh)
        init_states, step = make_distributed_train_step(
            opt, "speaker", mesh, donate=False)
        states = replicate(init_states(p), mesh)
        new_p, new_s, loss, aux = step(
            p, states, batch, replicate(rng, mesh), replicate(hp, mesh),
            jax.device_put(reward, jax.sharding.NamedSharding(
                mesh, jax.sharding.PartitionSpec("data"))))
        assert np.isfinite(float(loss))
        assert "loss_cider" in aux and float(aux["loss_cider"]) != 0.0


def test_shard_batch_keeps_committed_leaves():
    """A leaf the caller already committed (e.g. a replicated df_table whose
    power-of-2 leading dim divides the data axis) must pass through shard_batch
    untouched instead of being re-device_put to P('data') every step."""
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P
    from cooperativeimagecaptioning_tpu.rewards.ngram_device import DfTable
    mesh = make_mesh(n_data=4, n_model=2)
    # the REAL df_table shape: a NamedTuple whose leaf paths end in
    # GetAttrKey/SequenceKey, not the 'df_table' dict key — the constant
    # detection must scan the whole path
    df = jax.device_put(
        DfTable(keys=(jnp.zeros(8, jnp.uint32),),
                dfs=(jnp.zeros(8, jnp.float32),),
                ref_len_log=jnp.float32(1.0)),
        NamedSharding(mesh, P()))
    out = shard_batch({"x": jnp.zeros((8, 3)), "df_table": df}, mesh)
    assert out["df_table"].keys[0] is df.keys[0]  # placement preserved
    assert out["df_table"].dfs[0].sharding.spec == P()
    assert out["x"].sharding.spec == P("data")
    # a committed-but-WRONGLY-placed batch leaf (the HBM feature cache's
    # gathered batches come out committed-replicated) must still be resharded
    # to P('data') — leaving it replicated would defeat the data axis
    att = jax.device_put(jnp.zeros((8, 4, 3)), NamedSharding(mesh, P()))
    out2 = shard_batch({"att_feats": att}, mesh)
    assert out2["att_feats"].sharding.spec == P("data")


@pytest.mark.slow
def test_vocab_sharded_decode_matches_replicated():
    """Greedy + beam decode with logit/embed vocab-sharded on the model axis
    (and the sharded head kernels registered) must produce the same token ids
    as single-device replicated decode.  This is the n_model>1 eval path the
    CLI reaches via --mesh_model_axis (round-2 weak item 6)."""
    from jax.sharding import NamedSharding, PartitionSpec as P
    from cooperativeimagecaptioning_tpu import models as zoo
    from cooperativeimagecaptioning_tpu.ops import decoding
    from cooperativeimagecaptioning_tpu.ops.pallas import _dispatch
    from cooperativeimagecaptioning_tpu.parallel import param_shardings

    assert len(jax.devices()) >= 8
    opt = make_opt()
    opt.vocab_size = 31                      # V+1 = 32 divides model axis 2
    params = joint.init_params(jax.random.PRNGKey(0), opt)
    batch = make_batch(opt)
    module = zoo.setup(opt, "att2in2", "caption_model")

    def decode(p, beam_size):
        sp = joint.speaker_view(p, opt)
        ctx = module.encode_features(sp, batch["fc_feats"],
                                     batch["att_feats"], batch["att_masks"])
        if beam_size > 1:
            out = decoding.beam_search(module, sp, ctx, opt.seq_length,
                                       beam_size)
        else:
            out = decoding.sample(module, sp, ctx, opt.seq_length,
                                  jax.random.PRNGKey(123), mode="greedy")
        return out.seq

    want = {bs: np.asarray(jax.jit(decode, static_argnums=1)(params, bs))
            for bs in (1, 2)}

    mesh = make_mesh(n_data=4, n_model=2)
    shardings = param_shardings(params, mesh, vocab_sharded=True)
    specs = {s.spec for s in jax.tree.leaves(shardings)}
    assert P(None, "model") in specs, "logit.w did not vocab-shard"
    sharded_params = jax.device_put(params, shardings)
    _dispatch.set_vocab_mesh(mesh)
    try:
        for bs in (1, 2):
            got = np.asarray(jax.jit(decode, static_argnums=1)(
                sharded_params, bs))
            np.testing.assert_array_equal(got, want[bs])
    finally:
        _dispatch.set_vocab_mesh(None)
