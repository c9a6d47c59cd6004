"""ResNet family in JAX for offline feature extraction
(ref: misc/resnet.py, misc/resnet_utils.py, preprocess/prepro_feats.py).

Preserves the reference's two documented deviations from stock torchvision:
  1. the 1x1 conv1 of each Bottleneck carries the stride (misc/resnet.py:62-63);
  2. the stem maxpool uses ceil_mode=True with padding 0 (misc/resnet.py:105-106).

Inference-only (feature extraction never trains the CNN): batch norm uses the
stored running statistics.  Weights convert 1:1 from torch state_dicts (OIHW ->
HWIO).  Unlike the reference's image-at-a-time Python loop (prepro_feats.py:73),
`extract_features` is batched and jit-compiled: resize/normalize fuse into the
first conv, and the whole batch rides the MXU.
"""

from __future__ import annotations

import math

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax

LAYER_SPECS = {
    "resnet50": (3, 4, 6, 3),
    "resnet101": (3, 4, 23, 3),
    "resnet152": (3, 8, 36, 3),
}

IMAGENET_MEAN = np.array([0.485, 0.456, 0.406], np.float32)
IMAGENET_STD = np.array([0.229, 0.224, 0.225], np.float32)


# -- layers -----------------------------------------------------------------

def conv(p, x, stride=1, padding=0):
    return lax.conv_general_dilated(
        x, p["w"], window_strides=(stride, stride),
        padding=[(padding, padding)] * 2,
        dimension_numbers=("NHWC", "HWIO", "NHWC"))


def batch_norm(p, x, eps=1e-5):
    inv = lax.rsqrt(p["var"] + eps)
    return (x - p["mean"]) * inv * p["scale"] + p["bias"]


def max_pool_ceil(x, k=3, s=2):
    """MaxPool2d(kernel=3, stride=2, padding=0, ceil_mode=True)
    (ref: misc/resnet.py:105-106)."""
    H, W = x.shape[1], x.shape[2]
    out_h = math.ceil((H - k) / s) + 1
    out_w = math.ceil((W - k) / s) + 1
    pad_h = max(0, (out_h - 1) * s + k - H)
    pad_w = max(0, (out_w - 1) * s + k - W)
    return lax.reduce_window(
        x, -jnp.inf, lax.max, (1, k, k, 1), (1, s, s, 1),
        [(0, 0), (0, pad_h), (0, pad_w), (0, 0)])


def adaptive_avg_pool(x, out_hw):
    """F.adaptive_avg_pool2d semantics: cell i spans
    [floor(i*H/out), ceil((i+1)*H/out))."""
    B, H, W, C = x.shape
    oh, ow = out_hw
    rows = []
    for i in range(oh):
        h0, h1 = (i * H) // oh, -(-((i + 1) * H) // oh)
        cols = []
        for j in range(ow):
            w0, w1 = (j * W) // ow, -(-((j + 1) * W) // ow)
            cols.append(jnp.mean(x[:, h0:h1, w0:w1, :], axis=(1, 2)))
        rows.append(jnp.stack(cols, axis=1))
    return jnp.stack(rows, axis=1)  # [B, oh, ow, C]


# -- blocks -----------------------------------------------------------------

def bottleneck(p, x, stride):
    """ref: misc/resnet.py:56-93 — stride on the 1x1 conv1 (deviation #1)."""
    residual = x
    out = jax.nn.relu(batch_norm(p["bn1"], conv(p["conv1"], x, stride=stride)))
    out = jax.nn.relu(batch_norm(p["bn2"], conv(p["conv2"], out, padding=1)))
    out = batch_norm(p["bn3"], conv(p["conv3"], out))
    if "downsample" in p:
        residual = batch_norm(p["downsample"]["bn"],
                              conv(p["downsample"]["conv"], x, stride=stride))
    return jax.nn.relu(out + residual)


def resnet_forward(params, x):
    """Stem + 4 stages; returns the layer4 feature map [B, H/32(ish), W/32, 2048]."""
    x = jax.nn.relu(batch_norm(params["bn1"],
                               conv(params["conv1"], x, stride=2, padding=3)))
    x = max_pool_ceil(x)
    for li, blocks in enumerate([params["layer1"], params["layer2"],
                                 params["layer3"], params["layer4"]]):
        stride = 1 if li == 0 else 2
        for bi, bp in enumerate(blocks):
            x = bottleneck(bp, x, stride if bi == 0 else 1)
    return x


def features(params, images, att_size=14):
    """myResnet head (ref: misc/resnet_utils.py:11-28).

    images: [B, H, W, 3] already normalized.  Returns
    (fc [B, 2048], att [B, att_size, att_size, 2048])."""
    x = resnet_forward(params, images)
    fc = jnp.mean(x, axis=(1, 2))
    att = adaptive_avg_pool(x, (att_size, att_size))
    return fc, att


def preprocess_images(images_uint8):
    """raw uint8 [B, H, W, 3] -> normalized float (ref: prepro_feats.py:75-87)."""
    x = images_uint8.astype(jnp.float32) / 255.0
    return (x - IMAGENET_MEAN) / IMAGENET_STD


# -- params -----------------------------------------------------------------

def _conv_init(rng, k, cin, cout):
    n = k * k * cout
    return {"w": jax.random.normal(rng, (k, k, cin, cout)) *
            np.sqrt(2.0 / n)}


def _bn_init(c):
    return {"scale": jnp.ones((c,)), "bias": jnp.zeros((c,)),
            "mean": jnp.zeros((c,)), "var": jnp.ones((c,))}


def _blocks_of(arch):
    return arch if isinstance(arch, (tuple, list)) else LAYER_SPECS[arch]


def init_params(rng, arch="resnet101"):
    blocks = _blocks_of(arch)
    keys = iter(jax.random.split(rng, 4 + sum(blocks) * 4))
    params = {"conv1": _conv_init(next(keys), 7, 3, 64), "bn1": _bn_init(64)}
    inplanes = 64
    for li, n_blocks in enumerate(blocks):
        planes = 64 * (2 ** li)
        layer = []
        for bi in range(n_blocks):
            bp = {
                "conv1": _conv_init(next(keys), 1, inplanes if bi == 0 else
                                    planes * 4, planes),
                "bn1": _bn_init(planes),
                "conv2": _conv_init(next(keys), 3, planes, planes),
                "bn2": _bn_init(planes),
                "conv3": _conv_init(next(keys), 1, planes, planes * 4),
                "bn3": _bn_init(planes * 4),
            }
            if bi == 0:
                bp["downsample"] = {
                    "conv": _conv_init(next(keys), 1, inplanes, planes * 4),
                    "bn": _bn_init(planes * 4),
                }
            layer.append(bp)
        params[f"layer{li + 1}"] = layer
        inplanes = planes * 4
    return params


def convert_torch_state_dict(state_dict, arch="resnet101"):
    """torchvision/ref state_dict -> our param tree (OIHW -> HWIO)."""
    def cw(name):
        return jnp.asarray(np.asarray(state_dict[name]).transpose(2, 3, 1, 0))

    def bn(prefix):
        g = lambda s: jnp.asarray(np.asarray(state_dict[prefix + s]))
        return {"scale": g(".weight"), "bias": g(".bias"),
                "mean": g(".running_mean"), "var": g(".running_var")}

    params = {"conv1": {"w": cw("conv1.weight")}, "bn1": bn("bn1")}
    for li, n_blocks in enumerate(_blocks_of(arch)):
        layer = []
        for bi in range(n_blocks):
            pre = f"layer{li + 1}.{bi}"
            bp = {"conv1": {"w": cw(f"{pre}.conv1.weight")},
                  "bn1": bn(f"{pre}.bn1"),
                  "conv2": {"w": cw(f"{pre}.conv2.weight")},
                  "bn2": bn(f"{pre}.bn2"),
                  "conv3": {"w": cw(f"{pre}.conv3.weight")},
                  "bn3": bn(f"{pre}.bn3")}
            if f"{pre}.downsample.0.weight" in state_dict:
                bp["downsample"] = {
                    "conv": {"w": cw(f"{pre}.downsample.0.weight")},
                    "bn": bn(f"{pre}.downsample.1")}
            layer.append(bp)
        params[f"layer{li + 1}"] = layer
    return params
