"""cooperativeimagecaptioning_tpu — a TPU-native (JAX/XLA/Pallas/pjit) rebuild of the
ICCV'19 cooperative image-captioning framework (reference: vgilad/CooperativeImageCaptioning).

The framework trains a *speaker* (LSTM caption generator over precomputed image
features) and a *listener* (visual-semantic embedding retrieval model) cooperatively,
with straight-through Gumbel-softmax / multinomial relaxations or REINFORCE with
CIDEr-D self-critical rewards making the discrete captions differentiable.

Layer map (mirrors reference SURVEY.md §1, redesigned TPU-first):
  config          — argparse-compatible flag registry       (ref: opts.py)
  data            — cocotalk json/h5 readers + batcher       (ref: dataloader.py)
  models          — speaker (fc / att2in2), listener (vse)   (ref: models/*.py)
  ops             — lax.scan decoders, relaxations, beam     (ref: sample/sample_beam)
  rewards         — CIDEr-D self-critical rewards            (ref: misc/rewards.py)
  training        — alternating trainer, optax optimizers    (ref: train.py, optimizer.py)
  evaluation      — eval_split / retrieval ranking           (ref: eval_utils.py)
  metrics         — BLEU/ROUGE/CIDEr/METEOR + tokenizer      (ref: coco-caption, cider)
  parallel        — mesh / sharding helpers (data-parallel over ICI)
  preprocess      — label/vocab/ngram/feature preprocessing  (ref: preprocess/)
"""

__version__ = "0.1.0"
