"""Reference torch checkpoint conversion: converted params decode identically."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from cooperativeimagecaptioning_tpu.models import att_model, fc_model, vse
from cooperativeimagecaptioning_tpu.ops import decoding
from cooperativeimagecaptioning_tpu.utils import torch_interop

torch = pytest.importorskip("torch")

from ref_bridge import load_reference  # noqa: E402
from test_speaker_parity import small_opt, NS  # noqa: E402
from test_listener_parity import vse_opt  # noqa: E402

REF = load_reference()


def test_convert_att_model_checkpoint_decodes_identically():
    opt = small_opt(caption_model="att2in2")
    torch.manual_seed(31)
    tm = REF["AttModel"].Att2in2Model(NS(opt)).eval()
    sd = tm.state_dict()
    params = jax.tree.map(
        jnp.asarray, torch_interop.convert_state_dict(sd, "att2in2",
                                                      has_listener=False))
    rng = np.random.RandomState(32)
    B, K = 4, 6
    fc = rng.randn(B, opt.fc_feat_size).astype(np.float32)
    att = rng.randn(B, K, opt.att_feat_size).astype(np.float32)
    with torch.no_grad():
        t_seq, _ = tm.sample(torch.from_numpy(fc), torch.from_numpy(att),
                             None, {"sample_max": 1, "beam_size": 1})
    ctx = att_model.encode_features(params["speaker"], jnp.asarray(fc),
                                    jnp.asarray(att), None)
    out = decoding.sample(att_model, params["speaker"], ctx, opt.seq_length,
                          jax.random.PRNGKey(0), mode="greedy")
    T = t_seq.shape[1]
    np.testing.assert_array_equal(np.asarray(out.seq)[:, :T], t_seq.numpy())


def test_convert_fc_model_checkpoint():
    opt = small_opt(caption_model="fc")
    torch.manual_seed(33)
    tm = REF["FCModel"].FCModel(NS(opt)).eval()
    params = torch_interop.convert_state_dict(tm.state_dict(), "fc",
                                              has_listener=False)
    assert params["speaker"]["img_embed"]["w"].shape == (opt.fc_feat_size,
                                                         opt.input_encoding_size)
    assert params["speaker"]["embed"].shape == (opt.vocab_size + 2,
                                                opt.input_encoding_size)


def test_convert_joint_checkpoint_with_listener():
    opt = vse_opt()
    opt.caption_model = "att2in2"
    for k, v in vars(small_opt(caption_model="att2in2")).items():
        if not hasattr(opt, k) or getattr(opt, k) in (None, 0, ""):
            setattr(opt, k, v)
    opt.vocab_size = 19
    torch.manual_seed(34)
    tvse = REF["VSEFCModel"].VSEFCModel(NS(opt)).eval()
    tcap = REF["AttModel"].Att2in2Model(NS(opt)).eval()
    sd = {("caption_generator." + k): v for k, v in tcap.state_dict().items()}
    sd.update({("vse." + k): v for k, v in tvse.state_dict().items()})
    params = jax.tree.map(jnp.asarray,
                          torch_interop.convert_state_dict(sd, "att2in2"))
    # listener encoders match
    rng = np.random.RandomState(35)
    fcf = rng.randn(5, opt.fc_feat_size).astype(np.float32)
    with torch.no_grad():
        want = tvse.img_enc(torch.from_numpy(fcf)).numpy()
    got = np.asarray(vse.encode_image(params["listener"], opt,
                                      jnp.asarray(fcf)))
    np.testing.assert_allclose(got, want, atol=2e-5)


def test_export_att_checkpoint_loads_into_reference_and_bitmatches():
    """Our params -> reference state_dict: strict load into the reference
    Att2in2Model, then greedy decode IDs bit-match our decode."""
    from cooperativeimagecaptioning_tpu.training import joint
    opt = small_opt(caption_model="att2in2")
    params = joint.init_params(jax.random.PRNGKey(7), opt)
    sp = joint.speaker_view(params, opt)
    sd = torch_interop.export_state_dict({"speaker": sp}, "att2in2",
                                     wrapped=False)
    tm = REF["AttModel"].Att2in2Model(NS(opt)).eval()
    missing, unexpected = tm.load_state_dict(sd, strict=False)
    assert not unexpected, unexpected
    # the only tolerated missing keys are dropout/relu-free dupes — none
    assert not [m for m in missing], missing

    rng = np.random.RandomState(11)
    B, K = 4, 6
    fc = rng.randn(B, opt.fc_feat_size).astype(np.float32)
    att = rng.randn(B, K, opt.att_feat_size).astype(np.float32)
    with torch.no_grad():
        t_seq, _ = tm.sample(torch.from_numpy(fc), torch.from_numpy(att),
                             None, {"sample_max": 1, "beam_size": 1})
    ctx = att_model.encode_features(sp, jnp.asarray(fc), jnp.asarray(att),
                                    None)
    out = decoding.sample(att_model, sp, ctx, opt.seq_length,
                          jax.random.PRNGKey(0), mode="greedy")
    T = t_seq.shape[1]
    np.testing.assert_array_equal(np.asarray(out.seq)[:, :T], t_seq.numpy())


def test_export_roundtrip_all_trees():
    """export -> convert is the identity for fc, att2in2, and the listener."""
    from cooperativeimagecaptioning_tpu.training import joint
    for cm in ("fc", "att2in2"):
        opt = vse_opt()
        opt.caption_model = cm
        for k, v in vars(small_opt(caption_model=cm)).items():
            if not hasattr(opt, k) or getattr(opt, k) in (None, 0, ""):
                setattr(opt, k, v)
        opt.vse_model = "fc"
        params = joint.init_params(jax.random.PRNGKey(3), opt)
        tree = {"speaker": joint.speaker_view(params, opt),
                "listener": params["listener"]}
        sd = torch_interop.export_state_dict(tree, cm)
        back = torch_interop.convert_state_dict(sd, cm)
        a, b = jax.tree.leaves(tree), jax.tree.leaves(back)
        assert len(a) == len(b)
        for x, y in zip(a, b):
            np.testing.assert_array_equal(np.asarray(x), np.asarray(y))


def test_convert_use_bn_checkpoint_decodes_identically():
    """use_bn=1: the reference puts a BatchNorm1d before the embed Linear
    (AttModel.py:82-85).  Converted checkpoints carry the BN affine + running
    stats, and our frozen-stat decode bit-matches the reference's eval()-mode
    greedy sample (batch-independent, unlike batch-stat normalization)."""
    opt = small_opt(caption_model="att2in2")
    opt.use_bn = 1
    torch.manual_seed(41)
    tm = REF["AttModel"].Att2in2Model(NS(opt)).eval()
    with torch.no_grad():  # make the running stats non-trivial
        bn = tm.att_embed[0]
        bn.running_mean.uniform_(-0.5, 0.5)
        bn.running_var.uniform_(0.5, 1.5)
    sd = tm.state_dict()
    params = jax.tree.map(
        jnp.asarray, torch_interop.convert_state_dict(sd, "att2in2",
                                                      has_listener=False))
    assert "att_bn" in params["speaker"]
    assert "mean" in params["speaker"]["att_bn"]

    rng = np.random.RandomState(42)
    B, K = 4, 6
    fc = rng.randn(B, opt.fc_feat_size).astype(np.float32)
    att = rng.randn(B, K, opt.att_feat_size).astype(np.float32)
    # the reference BN requires the packed path (att_masks present): on
    # unmasked [B, K, F] input BatchNorm1d reads K as the channel dim and
    # errors — use_bn is only reachable with variable-K masks upstream
    masks = np.zeros((B, K), np.float32)
    masks[:, 0] = 1
    for i in range(B):
        masks[i, : rng.randint(2, K + 1)] = 1
    with torch.no_grad():
        t_seq, _ = tm.sample(torch.from_numpy(fc), torch.from_numpy(att),
                             torch.from_numpy(masks),
                             {"sample_max": 1, "beam_size": 1})
    ctx = att_model.encode_features(params["speaker"], jnp.asarray(fc),
                                    jnp.asarray(att), jnp.asarray(masks))
    out = decoding.sample(att_model, params["speaker"], ctx, opt.seq_length,
                          jax.random.PRNGKey(0), mode="greedy")
    T = t_seq.shape[1]
    np.testing.assert_array_equal(np.asarray(out.seq)[:, :T], t_seq.numpy())

    # and the export direction round-trips the BN block strict into torch
    sd2 = torch_interop.export_state_dict(
        {"speaker": params["speaker"]}, "att2in2", wrapped=False)
    tm2 = REF["AttModel"].Att2in2Model(NS(opt)).eval()
    missing, unexpected = tm2.load_state_dict(sd2, strict=False)
    assert not unexpected and not missing, (missing, unexpected)
