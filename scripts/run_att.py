#!/usr/bin/env python3
"""Phase-2 speaker MLE pretraining driver (ref: bash_scripts/run_att.sh).

Trains the att2in2 speaker with teacher forcing only: vse_loss_weight 0,
retrieval_reward_weight 0, scheduled sampling ramp, 200 epochs."""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


# Reference phase-2 flag-set (bash_scripts/run_att.sh:90-108) — the ONE
# source shared by this driver and scripts/showcase_full_scale.py (stage 2).
STAGE_FLAGS = dict(
    id="att", caption_model="att2in2", vse_model="fc", phase=2,
    vse_loss_weight=0, caption_loss_weight=1, retrieval_reward_weight=0,
    language_eval=1, rank_eval=0, seq_per_img=1, learning_rate=5e-4,
    learning_rate_decay_start=0, learning_rate_decay_every=15,
    scheduled_sampling_start=0)


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("-b", "--batch", type=int, default=128)
    p.add_argument("--max-epochs", type=int, default=200)
    p.add_argument("--root-dir", default="runs")
    p.add_argument("--input-json", default="data/cocotalk.json")
    p.add_argument("--input-label-h5", default="data/cocotalk_label.h5")
    p.add_argument("--input-fc-dir", default="data/cocotalk_fc")
    p.add_argument("--input-att-dir", default="data/cocobu_att")
    p.add_argument("-I", "--dataset", default="coco")
    p.add_argument("-E", "--shared-embedding", type=int, default=0)
    p.add_argument("--listener-stage-1-model", default="",
                   help="stage-1 model_vse-best.pth: phase 2 carries the "
                        "trained listener in its checkpoints (ref "
                        "run_att.sh:102-103 --initialize_retrieval)")
    p.add_argument("--set", action="append", default=[],
                   metavar="K=V", help="Options override, e.g. --set rnn_size=64 (repeatable)")
    args = p.parse_args(argv)

    from cooperativeimagecaptioning_tpu.config import Options
    from cooperativeimagecaptioning_tpu.training.loop import train

    ckpt = os.path.join(args.root_dir, "log_att")
    os.makedirs(ckpt, exist_ok=True)
    opt = Options(
        share_embed=args.shared_embedding,
        initialize_retrieval=args.listener_stage_1_model or None,
        batch_size=args.batch, max_epochs=args.max_epochs,
        checkpoint_path=ckpt, start_from=ckpt if os.listdir(ckpt) else None,
        input_json=args.input_json, input_label_h5=args.input_label_h5,
        input_fc_dir=args.input_fc_dir, input_att_dir=args.input_att_dir,
        dataset=args.dataset,
        save_checkpoint_every=3000, val_images_use=5000, **STAGE_FLAGS)
    from cooperativeimagecaptioning_tpu.config import parse_set_overrides
    opt = opt.replace(**parse_set_overrides(args.set))
    train(opt)


if __name__ == "__main__":
    main()
