"""Feature-extraction pipeline (ref: preprocess/prepro_feats.py).

raw images -> per-image {id}.npy (fc 2048) + {id}.npz (att 14x14x2048), same
artifacts as the reference.  Redesign: instead of the reference's one-image-at-
a-time GPU loop (prepro_feats.py:73-105), images are resized on host to a fixed
resolution, batched, and pushed through one jitted normalize->ResNet->pool
program.  Pass resize_to=None to reproduce the reference's native-resolution
behavior exactly (one compile per unique image shape)."""

from __future__ import annotations

import json
import os

import numpy as np

import jax
import jax.numpy as jnp

from cooperativeimagecaptioning_tpu.preprocess import resnet


def _to_rgb_float(img):
    """grayscale fix + [0,1] scaling (ref: prepro_feats.py:80-84)."""
    if img.ndim == 2:
        img = np.stack([img] * 3, axis=2)
    return img.astype(np.float32) / 255.0


def make_extractor(params, att_size=14):
    @jax.jit
    def run(batch):
        x = (batch - resnet.IMAGENET_MEAN) / resnet.IMAGENET_STD
        return resnet.features(params, x, att_size)
    return run


def extract_to_dirs(params, images, ids, output_dir, att_size=14,
                    batch_size=8, resize_to=448, skip_existing=True):
    """images: list of uint8 HWC arrays (or callables returning them); ids:
    matching artifact keys.  Writes <output_dir>_fc/<id>.npy and
    <output_dir>_att/<id>.npz (ref: prepro_feats.py:88-101).

    skip_existing resumes a partially-extracted layout (123k COCO images take
    hours — a crash must not restart from zero): images whose fc AND att
    artifacts both exist are not recomputed."""
    dir_fc = output_dir + "_fc"
    dir_att = output_dir + "_att"
    os.makedirs(dir_fc, exist_ok=True)
    os.makedirs(dir_att, exist_ok=True)
    todo = list(range(len(images)))
    if skip_existing:
        todo = [k for k in todo if not (
            os.path.isfile(os.path.join(dir_fc, f"{ids[k]}.npy"))
            and os.path.isfile(os.path.join(dir_att, f"{ids[k]}.npz")))]
        if len(todo) < len(images):
            print(f"feats: resuming — {len(images) - len(todo)}/"
                  f"{len(images)} already extracted", flush=True)
    run = make_extractor(params, att_size)
    np.random.seed(123)  # determinism pin (ref: prepro_feats.py:64)

    def load(i):
        img = images[i]() if callable(images[i]) else images[i]
        img = _to_rgb_float(np.asarray(img))
        if resize_to is not None and img.shape[:2] != (resize_to, resize_to):
            img = _resize_bilinear(img, resize_to)
        return img

    i = 0
    while i < len(todo):
        idx = todo[i:i + batch_size]
        batch = [load(k) for k in idx]
        if resize_to is None:
            for k, img in zip(idx, batch):
                fc, att = run(jnp.asarray(img[None]))
                _write(dir_fc, dir_att, ids[k], fc[0], att[0])
        else:
            fc, att = run(jnp.asarray(np.stack(batch)))
            fc, att = np.asarray(fc), np.asarray(att)
            for off, k in enumerate(idx):
                _write(dir_fc, dir_att, ids[k], fc[off], att[off])
        i += len(idx)
    return dir_fc, dir_att


def _write(dir_fc, dir_att, key, fc, att):
    """Atomic artifact writes (tmp + rename): skip_existing's resume treats
    an existing file as complete, so a crash / supervisor SIGKILL mid-write
    must never leave a truncated .npy/.npz behind — it would be skipped
    forever and crash training at np.load time."""
    fc_tmp = os.path.join(dir_fc, f".{key}.tmp.npy")
    np.save(fc_tmp, np.asarray(fc, np.float32))
    os.replace(fc_tmp, os.path.join(dir_fc, f"{key}.npy"))
    att_tmp = os.path.join(dir_att, f".{key}.tmp.npz")
    with open(att_tmp, "wb") as f:
        np.savez_compressed(f, feat=np.asarray(att, np.float32))
    os.replace(att_tmp, os.path.join(dir_att, f"{key}.npz"))


def _lin_weights(n_in, n_out):
    """[n_out, n_in] anti-aliased linear resampling weights — the same
    triangle kernel (scaled by the ratio when downsampling, half-pixel
    centers, edge renormalization) as jax.image.resize(method='bilinear')."""
    scale = n_in / n_out
    kscale = max(scale, 1.0)  # widen the kernel when downsampling (AA)
    src = (np.arange(n_out, dtype=np.float64) + 0.5) * scale - 0.5
    dist = (src[:, None] - np.arange(n_in, dtype=np.float64)[None, :]) / kscale
    w = np.maximum(0.0, 1.0 - np.abs(dist))
    return (w / w.sum(axis=1, keepdims=True)).astype(np.float32)


def _resize_bilinear(img, size):
    """Host-side bilinear resize to a square (enables fixed-shape batching).

    Pure numpy: routing this through jax on the TPU backend compiled one
    resize program PER distinct raw resolution and shipped every image
    host->device->host through the thin tunnel just to resize it."""
    img = np.asarray(img, np.float32)
    H, W, _ = img.shape
    wy = _lin_weights(H, size)
    wx = _lin_weights(W, size)
    return np.einsum("oh,hwc,pw->opc", wy, img, wx, optimize=True)


def prepro_feats(input_json, images_root, output_dir, model_weights=None,
                 arch="resnet101", att_size=14, dataset="coco",
                 batch_size=8, resize_to=448):
    """CLI-equivalent pipeline (ref: prepro_feats.py:53-105)."""
    with open(input_json) as f:
        imgs = json.load(f)["images"]
    if model_weights:
        import pickle
        with open(model_weights, "rb") as f:
            params = resnet.convert_torch_state_dict(pickle.load(f), arch)
    else:
        params = resnet.init_params(jax.random.PRNGKey(0), arch)

    def loader(img):
        def _load():
            try:
                from imageio import imread
            except ImportError:
                from PIL import Image
                imread = lambda p: np.asarray(Image.open(p))
            if dataset in ("flickr8k", "flickr30k"):
                path = os.path.join(images_root, img["filename"])
            else:
                path = os.path.join(images_root, img.get("filepath", ""),
                                    img["filename"])
            return imread(path)
        return _load

    ids = [img["filename"].split(".")[0]
           if dataset in ("flickr8k", "flickr30k") else img["cocoid"]
           for img in imgs]
    return extract_to_dirs(params, [loader(im) for im in imgs], ids,
                           output_dir, att_size, batch_size, resize_to)


def main(argv=None):
    """Standalone CLI (ref: prepro_feats.py:108-129)."""
    import argparse
    import json as _json
    ap = argparse.ArgumentParser()
    ap.add_argument("--input_json", required=True,
                    help="dataset json (Karpathy split format)")
    ap.add_argument("--output_dir", default="data",
                    help="writes <dir>_fc/ and <dir>_att/")
    ap.add_argument("--images_root", default="",
                    help="root of raw image folders")
    ap.add_argument("--att_size", default=14, type=int, help="14x14 or 7x7")
    ap.add_argument("--model", default="resnet101", type=str,
                    help="resnet101, resnet152")
    ap.add_argument("--model_weights", default=None, type=str,
                    help="pickled torchvision state_dict (converted)")
    ap.add_argument("--dataset", default="coco", type=str)
    ap.add_argument("--batch_size", default=8, type=int)
    args = ap.parse_args(argv)
    print("parsed input parameters:")
    print(_json.dumps(vars(args), indent=2))
    return prepro_feats(args.input_json, args.images_root, args.output_dir,
                        model_weights=args.model_weights, arch=args.model,
                        att_size=args.att_size, dataset=args.dataset,
                        batch_size=args.batch_size)


if __name__ == "__main__":
    main()
