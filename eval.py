#!/usr/bin/env python3
"""Standalone evaluation driver (ref: eval.py).

eval(opt, model_name, infos_name, ann_file, listener, split, iteration):
rebuild the joint model at a specific checkpoint, optionally swap in a GT
listener, and run eval_split with generated-caption ranking."""

from __future__ import annotations

import pickle

import numpy as np
import jax

from cooperativeimagecaptioning_tpu.data import DataLoader
from cooperativeimagecaptioning_tpu.evaluation.eval_split import Evaluator
from cooperativeimagecaptioning_tpu.training import joint, checkpoint as ck


def eval(opt, model_name, infos_name, ann_file=None, listener=None,
         split="test", iteration=None, dataset=None):
    """ref: eval.py:20-91."""
    with open(infos_name, "rb") as f:
        infos = pickle.load(f)
    if not hasattr(opt, "att_hid_size") or opt is None:
        opt = infos["opt"]
    opt.split = split
    opt.beam_size = 2          # final-eval protocol (ref: eval.py:33)
    np.random.seed(123)        # determinism pin (ref: eval.py:34)

    saved = infos.get("opt")
    if saved is not None:
        if not getattr(opt, "input_fc_dir", ""):
            opt.input_fc_dir = saved.input_fc_dir
            opt.input_att_dir = saved.input_att_dir
            opt.input_label_h5 = saved.input_label_h5
        if not getattr(opt, "input_json", ""):
            opt.input_json = saved.input_json
        if not opt.batch_size:
            opt.batch_size = saved.batch_size
        if not opt.id:
            opt.id = saved.id
    opt.cider_optimization = 0  # (ref: eval.py:68)

    loader = DataLoader(opt, dataset=dataset)
    opt.vocab_size = loader.vocab_size
    opt.seq_length = loader.seq_length

    params = joint.init_params(jax.random.PRNGKey(getattr(opt, "seed", 123)),
                               opt)
    params = ck.load_params_into(params, model_name)
    if listener == "gt" and getattr(opt, "initialize_retrieval", None):
        gt = ck.load_params(opt.initialize_retrieval)
        if "listener" in gt:
            params["listener"] = gt["listener"]
            print("gt listener is loaded for evaluation")
        else:
            print(f"warning: {opt.initialize_retrieval} has no 'listener' "
                  "subtree; evaluating with the TRAINED listener")

    ev = Evaluator(opt)
    eval_kwargs = dict(vars(opt))
    eval_kwargs["split"] = split
    loss, split_predictions, lang_stats = ev.eval_split(
        params, loader, eval_kwargs, ann_file=ann_file, use_gen_sent=True)
    return {"loss": loss, "split_predictions": split_predictions,
            "lang_stats": lang_stats}


if __name__ == "__main__":
    raise SystemExit("use eval.eval(...) programmatically, as the reference does")
