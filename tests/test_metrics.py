"""Language metrics parity against the reference's vendored scorers where they are
importable (BLEU, ROUGE-L), plus tokenizer/METEOR behavior tests."""

import sys

import numpy as np
import pytest

from cooperativeimagecaptioning_tpu.metrics import bleu, rouge, meteor, tokenizer


def _ref_module(relpath, name):
    sys.path.insert(0, "/root/reference/coco-caption")
    try:
        import importlib
        return importlib.import_module(f"pycocoevalcap.{relpath}.{name}")
    finally:
        sys.path.pop(0)


def case(seed=0, n=8):
    rng = np.random.RandomState(seed)
    words = ["a", "man", "dog", "rides", "on", "the", "red", "bike", "park",
             "woman", "sits", "grass", "two", "play"]
    gts, res = {}, {}
    for i in range(n):
        gts[i] = [" ".join(rng.choice(words, rng.randint(4, 10)))
                  for _ in range(rng.randint(2, 6))]
        res[i] = [" ".join(rng.choice(words, rng.randint(3, 10)))]
    res[0] = [gts[0][0]]  # one exact match
    return gts, res


def test_bleu_parity_vs_reference():
    ref_bleu = _ref_module("bleu", "bleu")
    gts, res = case()
    want, want_per = ref_bleu.Bleu(4).compute_score(gts, res)
    got, got_per = bleu.compute_bleu(gts, res)
    np.testing.assert_allclose(got, want, rtol=1e-8)
    for k in range(4):
        np.testing.assert_allclose(got_per[k], want_per[k], rtol=1e-8)


def test_rouge_parity_vs_reference():
    ref_rouge = _ref_module("rouge", "rouge")
    gts, res = case(seed=1)
    want_mean, want = ref_rouge.Rouge().compute_score(gts, res)
    got_mean, got = rouge.compute_rouge(gts, res)
    np.testing.assert_allclose(got, want, rtol=1e-8)
    np.testing.assert_allclose(got_mean, want_mean, rtol=1e-8)


def test_tokenizer_basic():
    out = tokenizer.tokenize(
        {0: [{"caption": "A man, riding; on the dog's back!"}]})
    assert out[0][0] == "a man riding on the dog 's back"


def test_tokenizer_strips_punct_preserves_words():
    out = tokenizer.tokenize({0: [{"caption": "Hello... (world)?"}]})
    assert out[0][0] == "hello world"


def test_meteor_exact_match_scores_high():
    gts = {0: ["a man rides a red bike"], 1: ["a dog in the park"]}
    res = {0: ["a man rides a red bike"], 1: ["the cat on a mat"]}
    mean, per = meteor.compute_meteor(gts, res)
    assert per[0] > 0.9
    assert per[0] > per[1]


def test_meteor_stem_matching():
    s_exact = meteor.sentence_meteor("a man riding", ["a man riding"])
    s_stem = meteor.sentence_meteor("a man rides", ["a man riding"])
    s_none = meteor.sentence_meteor("a man walks", ["a man riding"])
    assert s_exact > s_stem > s_none


def test_cocoeval_driver_end_to_end():
    from cooperativeimagecaptioning_tpu.evaluation.coco_eval import (
        CocoAnnotations, CocoEvalCap)
    gts, res = case(seed=2, n=5)
    anns = [{"image_id": i, "caption": c, "id": 10 * i + j}
            for i in gts for j, c in enumerate(gts[i])]
    coco = CocoAnnotations(dataset={
        "annotations": anns, "images": [{"id": i} for i in gts]})
    preds = [{"image_id": i, "caption": res[i][0]} for i in res]
    ce = CocoEvalCap(coco, coco.load_res(preds))
    scores = ce.evaluate()
    for k in ("Bleu_1", "Bleu_4", "METEOR", "ROUGE_L", "CIDEr"):
        assert k in scores and np.isfinite(scores[k])
    assert ce.img_to_eval[0]["Bleu_1"] >= ce.img_to_eval[1]["Bleu_1"] - 1.0
