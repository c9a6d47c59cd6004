#!/usr/bin/env python3
"""Training entry point (ref: train.py).

Same CLI as the reference; after a phase-3/joint run, results harvesting builds
val/test dicts and the consolidated json report (ref: train.py:565-574)."""

from cooperativeimagecaptioning_tpu import config
from cooperativeimagecaptioning_tpu.training.loop import train


def main():
    opt = config.parse_opt()
    trainer = train(opt)
    if opt.phase in (1, 2):
        return
    from cooperativeimagecaptioning_tpu.evaluation import harvest
    harvest.create_dicts_and_json_after_training(opt)
    print("Finished all")
    return trainer


if __name__ == "__main__":
    main()
