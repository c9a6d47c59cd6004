"""ResNet feature extractor parity vs the reference torch implementation
(misc/resnet.py with its two deviations + misc/resnet_utils.py head)."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from cooperativeimagecaptioning_tpu.preprocess import resnet as jresnet

torch = pytest.importorskip("torch")

from ref_bridge import load_reference  # noqa: E402

REF = load_reference()


def build_pair(blocks=(1, 1, 1, 1), seed=0):
    import importlib
    ref_resnet = importlib.import_module("misc.resnet")
    torch.manual_seed(seed)
    tm = ref_resnet.ResNet(ref_resnet.Bottleneck, list(blocks)).eval()
    sd = {k: v.detach().numpy() for k, v in tm.state_dict().items()}
    params = jresnet.convert_torch_state_dict(sd, blocks)
    return tm, params


def test_resnet_feature_map_parity():
    tm, params = build_pair()
    rng = np.random.RandomState(0)
    x = rng.randn(2, 3, 65, 65).astype(np.float32)  # odd size: ceil-mode path
    with torch.no_grad():
        t = torch.from_numpy(x)
        t = tm.conv1(t); t = tm.bn1(t); t = tm.relu(t); t = tm.maxpool(t)
        t = tm.layer1(t); t = tm.layer2(t); t = tm.layer3(t); t = tm.layer4(t)
        want = t.numpy().transpose(0, 2, 3, 1)
    got = np.asarray(jresnet.resnet_forward(
        params, jnp.asarray(x.transpose(0, 2, 3, 1))))
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, atol=2e-4)


def test_myresnet_head_parity():
    import torch.nn.functional as F
    tm, params = build_pair(seed=1)
    rng = np.random.RandomState(1)
    x = rng.randn(1, 3, 96, 80).astype(np.float32)
    with torch.no_grad():
        t = torch.from_numpy(x)
        t = tm.conv1(t); t = tm.bn1(t); t = tm.relu(t); t = tm.maxpool(t)
        t = tm.layer1(t); t = tm.layer2(t); t = tm.layer3(t); t = tm.layer4(t)
        fc_want = t.mean(3).mean(2).squeeze(0).numpy()
        att_want = F.adaptive_avg_pool2d(t, [3, 3]).squeeze(0) \
            .permute(1, 2, 0).numpy()
    fc, att = jresnet.features(params, jnp.asarray(x.transpose(0, 2, 3, 1)),
                               att_size=3)
    np.testing.assert_allclose(np.asarray(fc[0]), fc_want, atol=2e-4)
    np.testing.assert_allclose(np.asarray(att[0]), att_want, atol=2e-4)


def test_maxpool_ceil_mode():
    """Deviation #2: ceil_mode max pool must match torch for odd sizes."""
    pool = torch.nn.MaxPool2d(3, 2, padding=0, ceil_mode=True)
    for H in (7, 8, 9, 112, 113):
        x = np.random.RandomState(H).randn(1, 4, H, H).astype(np.float32)
        want = pool(torch.from_numpy(x)).numpy().transpose(0, 2, 3, 1)
        got = np.asarray(jresnet.max_pool_ceil(
            jnp.asarray(x.transpose(0, 2, 3, 1))))
        np.testing.assert_allclose(got, want, atol=1e-6)


def test_extract_to_dirs_artifacts(tmp_path):
    from cooperativeimagecaptioning_tpu.preprocess import feats
    params = jresnet.init_params(jax.random.PRNGKey(0), (1, 1, 1, 1))
    rng = np.random.RandomState(0)
    images = [rng.randint(0, 255, (70, 90, 3), np.uint8),
              rng.randint(0, 255, (50, 50), np.uint8)]  # one grayscale
    ids = [101, 102]
    out = str(tmp_path / "cocotalk")
    dir_fc, dir_att = feats.extract_to_dirs(params, images, ids, out,
                                            att_size=3, resize_to=64)
    fc = np.load(f"{dir_fc}/101.npy")
    att = np.load(f"{dir_att}/102.npz")["feat"]
    assert fc.shape == (2048,)
    assert att.shape == (3, 3, 2048)
