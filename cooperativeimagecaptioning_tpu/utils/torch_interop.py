"""Torch checkpoint interop: convert reference .pth state_dicts to our param
trees, so models trained with the PyTorch reference load directly.

Key mapping (reference module tree -> our pytree):
  caption_generator.embed(.0).weight        -> speaker.embed            [V+2, D]
  caption_generator.img_embed.*             -> speaker.img_embed        (fc)
  caption_generator.att_embed.<i>.*         -> speaker.att_embed        (att)
  caption_generator.ctx2att.*               -> speaker.ctx2att
  caption_generator.core.{i2h,h2h,a2c}.*    -> speaker.core.*
  caption_generator.core.attention.*        -> speaker.core.attention.*
  caption_generator.logit.*                 -> speaker.logit
  vse.img_enc.fc.*                          -> listener.img_enc.fc
  vse.txt_enc.embed.weight                  -> listener.txt_enc.embed
  vse.txt_enc.rnn.{weight,bias}_{ih,hh}_l0  -> listener.txt_enc.rnn     (transposed)
Linear weights transpose [out, in] -> [in, out].
"""

from __future__ import annotations

import numpy as np


def _np(t):
    try:
        return t.detach().cpu().numpy()
    except AttributeError:
        return np.asarray(t)


def _linear(sd, prefix):
    return {"w": _np(sd[prefix + ".weight"]).T.copy(),
            "b": _np(sd[prefix + ".bias"]).copy()}


def convert_state_dict(sd, caption_model="att2in2", has_listener=True,
                       share_embed=False):
    """Reference AlternatingJointModel state_dict -> {'speaker','listener'} tree.

    Also accepts bare caption-model state_dicts (keys without the
    caption_generator. prefix)."""
    if not any(k.startswith("caption_generator.") for k in sd):
        sd = {("caption_generator." + k): v for k, v in sd.items()}

    cg = "caption_generator."
    speaker = {}
    if caption_model == "fc":
        speaker["img_embed"] = _linear(sd, cg + "img_embed")
        speaker["core"] = {"i2h": _linear(sd, cg + "core.i2h"),
                           "h2h": _linear(sd, cg + "core.h2h")}
        embed_key = cg + "embed.weight"
    else:
        # att_embed is a Sequential whose Linear index depends on use_bn
        lin_idx = next(i for i in range(3)
                       if f"{cg}att_embed.{i}.weight" in sd and
                       _np(sd[f"{cg}att_embed.{i}.weight"]).ndim == 2)
        speaker["att_embed"] = _linear(sd, f"{cg}att_embed.{lin_idx}")
        bn_w = sd.get(f"{cg}att_embed.0.weight")
        if bn_w is not None and _np(bn_w).ndim == 1:
            # use_bn=1: BatchNorm1d precedes the Linear (AttModel.py:82-85);
            # carry its affine + running stats (frozen-stat BN at decode)
            speaker["att_bn"] = {
                "scale": _np(bn_w).copy(),
                "bias": _np(sd[f"{cg}att_embed.0.bias"]).copy(),
                "mean": _np(sd[f"{cg}att_embed.0.running_mean"]).copy(),
                "var": _np(sd[f"{cg}att_embed.0.running_var"]).copy(),
            }
        speaker["ctx2att"] = _linear(sd, cg + "ctx2att")
        speaker["core"] = {
            "i2h": _linear(sd, cg + "core.i2h"),
            "h2h": _linear(sd, cg + "core.h2h"),
            "a2c": _linear(sd, cg + "core.a2c"),
            "attention": {
                "h2att": _linear(sd, cg + "core.attention.h2att"),
                "alpha_net": _linear(sd, cg + "core.attention.alpha_net"),
            },
        }
        embed_key = cg + "embed.0.weight"
    speaker["logit"] = _linear(sd, cg + "logit")
    if not share_embed:
        speaker["embed"] = _np(sd[embed_key]).copy()

    params = {"speaker": speaker}
    if has_listener and any(k.startswith("vse.") for k in sd):
        rnn = "vse.txt_enc.rnn."
        params["listener"] = {
            "img_enc": {"fc": _linear(sd, "vse.img_enc.fc")},
            "txt_enc": {
                "embed": _np(sd["vse.txt_enc.embed.weight"]).copy(),
                "rnn": {
                    "w_ih": _np(sd[rnn + "weight_ih_l0"]).T.copy(),
                    "w_hh": _np(sd[rnn + "weight_hh_l0"]).T.copy(),
                    "b_ih": _np(sd[rnn + "bias_ih_l0"]).copy(),
                    "b_hh": _np(sd[rnn + "bias_hh_l0"]).copy(),
                },
            },
        }
    return params


def load_torch_checkpoint(path, caption_model="att2in2", share_embed=False):
    """Load a reference .pth via torch (host tool; torch required)."""
    import torch
    sd = torch.load(path, map_location="cpu")
    return convert_state_dict(sd, caption_model=caption_model,
                              share_embed=share_embed)


def _torch_linear(tree):
    import torch
    return {"weight": torch.from_numpy(np.asarray(tree["w"]).T.copy()),
            "bias": torch.from_numpy(np.asarray(tree["b"]).copy())}


def export_state_dict(params, caption_model="att2in2", wrapped=None):
    """Our {'speaker'[, 'listener']} pytree -> a reference-shaped torch
    state_dict (the inverse of convert_state_dict), so models trained here
    load into the PyTorch reference via load_state_dict (use_bn=0 layout;
    this build has no BatchNorm params to export).

    Keys follow AlternatingJointModel naming (caption_generator./vse.
    prefixes) when `wrapped` — default: wrapped iff a listener is present;
    wrapped=False emits bare FCModel/AttModel keys for loading into a
    standalone reference speaker."""
    import torch
    sd = {}

    def put(prefix, tree):
        for k, v in _torch_linear(tree).items():
            sd[f"{prefix}.{k}"] = v

    sp = params.get("speaker", params)
    if wrapped is None:
        wrapped = params.get("listener") is not None
    cg = "caption_generator." if wrapped else ""
    if caption_model == "fc":
        put(cg + "img_embed", sp["img_embed"])
        put(cg + "core.i2h", sp["core"]["i2h"])
        put(cg + "core.h2h", sp["core"]["h2h"])
        sd[cg + "embed.weight"] = torch.from_numpy(
            np.asarray(sp["embed"]).copy())
    else:
        if "att_bn" in sp:
            import torch as _torch
            bn = sp["att_bn"]
            sd[cg + "att_embed.0.weight"] = _torch.from_numpy(
                np.asarray(bn["scale"]).copy())
            sd[cg + "att_embed.0.bias"] = _torch.from_numpy(
                np.asarray(bn["bias"]).copy())
            sd[cg + "att_embed.0.running_mean"] = _torch.from_numpy(
                np.asarray(bn.get("mean", np.zeros_like(bn["scale"]))).copy())
            sd[cg + "att_embed.0.running_var"] = _torch.from_numpy(
                np.asarray(bn.get("var", np.ones_like(bn["scale"]))).copy())
            sd[cg + "att_embed.0.num_batches_tracked"] = _torch.tensor(0)
            put(cg + "att_embed.1", sp["att_embed"])
        else:
            put(cg + "att_embed.0", sp["att_embed"])
        put(cg + "ctx2att", sp["ctx2att"])
        for name in ("i2h", "h2h", "a2c"):
            put(cg + f"core.{name}", sp["core"][name])
        put(cg + "core.attention.h2att", sp["core"]["attention"]["h2att"])
        put(cg + "core.attention.alpha_net",
            sp["core"]["attention"]["alpha_net"])
        sd[cg + "embed.0.weight"] = torch.from_numpy(
            np.asarray(sp["embed"]).copy())
    put(cg + "logit", sp["logit"])

    li = params.get("listener")
    if li is not None:
        put("vse.img_enc.fc", li["img_enc"]["fc"])
        sd["vse.txt_enc.embed.weight"] = torch.from_numpy(
            np.asarray(li["txt_enc"]["embed"]).copy())
        rnn = li["txt_enc"]["rnn"]
        sd["vse.txt_enc.rnn.weight_ih_l0"] = torch.from_numpy(
            np.asarray(rnn["w_ih"]).T.copy())
        sd["vse.txt_enc.rnn.weight_hh_l0"] = torch.from_numpy(
            np.asarray(rnn["w_hh"]).T.copy())
        sd["vse.txt_enc.rnn.bias_ih_l0"] = torch.from_numpy(
            np.asarray(rnn["b_ih"]).copy())
        sd["vse.txt_enc.rnn.bias_hh_l0"] = torch.from_numpy(
            np.asarray(rnn["b_hh"]).copy())
    return sd


def save_torch_checkpoint(params, path, caption_model="att2in2"):
    """Write a reference-loadable .pth for our params (torch required)."""
    import torch
    torch.save(export_state_dict(params, caption_model=caption_model), path)
