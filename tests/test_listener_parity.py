"""Parity of the VSE listener (encoders + contrastive loss) against the reference."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from cooperativeimagecaptioning_tpu.config import Options
from cooperativeimagecaptioning_tpu.models import vse

torch = pytest.importorskip("torch")

from ref_bridge import load_reference, torch_linear_to_jax  # noqa: E402

REF = load_reference()


def vse_opt(**kw):
    defaults = dict(vocab_size=19, input_encoding_size=16, vse_embed_size=24,
                    vse_num_layers=1, vse_rnn_type="gru", vse_margin=0.2,
                    vse_max_violation=1, vse_measure="cosine", vse_use_abs=0,
                    vse_no_imgnorm=0, vse_loss_type="contrastive",
                    vse_pool_type="last", fc_feat_size=32)
    defaults.update(kw)
    opt = Options()
    for k, v in defaults.items():
        setattr(opt, k, v)
    return opt


class NS:
    def __init__(self, opt):
        for k, v in vars(opt).items():
            setattr(self, k, v)


def copy_vse_weights(tm, params, rnn_type="gru"):
    params = dict(params)
    params["img_enc"] = {"fc": torch_linear_to_jax(tm.img_enc.fc)}
    rnn = tm.txt_enc.rnn
    params["txt_enc"] = {
        "embed": np.asarray(tm.txt_enc.embed.weight.detach().numpy()),
        "rnn": {
            "w_ih": np.asarray(rnn.weight_ih_l0.detach().numpy().T),
            "w_hh": np.asarray(rnn.weight_hh_l0.detach().numpy().T),
            "b_ih": np.asarray(rnn.bias_ih_l0.detach().numpy()),
            "b_hh": np.asarray(rnn.bias_hh_l0.detach().numpy()),
        },
    }
    return jax.tree.map(jnp.asarray, params)


def make_batch(opt, B=6, T=10, seed=0):
    rng = np.random.RandomState(seed)
    fc = rng.randn(B, opt.fc_feat_size).astype(np.float32)
    seqs = np.zeros((B, T), np.int64)
    masks = np.zeros((B, T), np.float32)
    for i in range(B):
        n = rng.randint(1, T - 2)  # words
        seqs[i, 1:1 + n] = rng.randint(1, opt.vocab_size + 1, n)
        masks[i, : n + 2] = 1.0  # +2 like the label masks (dataloader.py:233-237)
    return fc, seqs, masks


@pytest.mark.parametrize("pool", ["last", "mean", "max"])
@pytest.mark.parametrize("rnn_type", ["gru", "lstm"])
def test_text_encoder_parity(pool, rnn_type):
    opt = vse_opt(vse_pool_type=pool, vse_rnn_type=rnn_type)
    torch.manual_seed(0)
    tm = REF["VSEFCModel"].VSEFCModel(NS(opt)).eval()
    params = copy_vse_weights(tm, vse.init_params(jax.random.PRNGKey(0), opt))

    fc, seqs, masks = make_batch(opt)
    with torch.no_grad():
        t_out = tm.txt_enc(torch.from_numpy(seqs), torch.from_numpy(masks))
    j_out = vse.encode_text(params, opt, jnp.asarray(seqs), jnp.asarray(masks))
    np.testing.assert_allclose(np.asarray(j_out), t_out.numpy(), atol=2e-5)


def test_text_encoder_one_hot_parity():
    """The differentiable one-hot bridge (VSEFCModel.py:102-106)."""
    opt = vse_opt()
    torch.manual_seed(1)
    tm = REF["VSEFCModel"].VSEFCModel(NS(opt)).eval()
    params = copy_vse_weights(tm, vse.init_params(jax.random.PRNGKey(0), opt))

    _, seqs, masks = make_batch(opt, seed=2)
    one_hot = np.eye(opt.vocab_size + 2, dtype=np.float32)[seqs]
    with torch.no_grad():
        t_out = tm.txt_enc(torch.from_numpy(one_hot), torch.from_numpy(masks))
    j_out = vse.encode_text(params, opt, jnp.asarray(one_hot), jnp.asarray(masks))
    np.testing.assert_allclose(np.asarray(j_out), t_out.numpy(), atol=2e-5)


@pytest.mark.parametrize("use_abs,no_imgnorm", [(0, 0), (1, 0), (0, 1)])
def test_image_encoder_parity(use_abs, no_imgnorm):
    opt = vse_opt(vse_use_abs=use_abs, vse_no_imgnorm=no_imgnorm)
    torch.manual_seed(2)
    tm = REF["VSEFCModel"].VSEFCModel(NS(opt)).eval()
    params = copy_vse_weights(tm, vse.init_params(jax.random.PRNGKey(0), opt))
    fc, _, _ = make_batch(opt, seed=3)
    with torch.no_grad():
        t_out = tm.img_enc(torch.from_numpy(fc))
    j_out = vse.encode_image(params, opt, jnp.asarray(fc))
    np.testing.assert_allclose(np.asarray(j_out), t_out.numpy(), atol=2e-5)


@pytest.mark.parametrize("max_violation", [0, 1])
@pytest.mark.parametrize("whole_batch", [False, True])
@pytest.mark.parametrize("oor", ["off", "image", "caption"])
def test_contrastive_loss_parity(max_violation, whole_batch, oor):
    opt = vse_opt(vse_max_violation=max_violation)
    torch.manual_seed(3)
    tm = REF["VSEFCModel"].VSEFCModel(NS(opt)).eval()
    B, E = 7, opt.vse_embed_size
    rng = np.random.RandomState(4)
    im = rng.randn(B, E).astype(np.float32)
    s = rng.randn(B, E).astype(np.float32)
    with torch.no_grad():
        t_loss = tm.contrastive_loss(
            torch.from_numpy(im), torch.from_numpy(s), whole_batch, oor)
    j_loss = vse.contrastive_loss(jnp.asarray(im), jnp.asarray(s),
                                  opt.vse_margin, max_violation,
                                  whole_batch, oor)
    np.testing.assert_allclose(np.asarray(j_loss), t_loss.numpy(), atol=2e-5)


def test_full_vse_forward_parity():
    opt = vse_opt()
    torch.manual_seed(5)
    tm = REF["VSEFCModel"].VSEFCModel(NS(opt)).eval()
    params = copy_vse_weights(tm, vse.init_params(jax.random.PRNGKey(0), opt))
    fc, seqs, masks = make_batch(opt, seed=6)
    with torch.no_grad():
        t_loss = tm(torch.from_numpy(fc), None, torch.from_numpy(seqs),
                    torch.from_numpy(masks), whole_batch=True)
    j_loss = vse.forward(params, opt, jnp.asarray(fc), None,
                         jnp.asarray(seqs), jnp.asarray(masks),
                         whole_batch=True)
    np.testing.assert_allclose(np.asarray(j_loss), t_loss.numpy(), atol=2e-5)
