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
    # METEOR 1.5 parameterization: even a verbatim match keeps the residual
    # fragmentation penalty gamma*(1/m)^beta (= .6*(1/6)^.2 here), so the
    # ceiling is ~0.58, not ~1.0 as under the 2005 constants
    assert per[0] > 0.5
    assert per[0] > per[1]


def test_meteor_15_formula_verbatim_match():
    """Hand-computed METEOR 1.5 score for a verbatim 2-content-word match:
    P=R=Fmean=1, pen = .6*(chunks/m)^.2 with chunks=1, m=3."""
    score = meteor.sentence_meteor("red bike go", ["red bike go"])
    want = 1.0 - 0.6 * (1.0 / 3.0) ** 0.2
    assert abs(score - want) < 1e-12


def test_meteor_function_word_weighting():
    """delta=.75: matching only function words is worth far less than
    matching only content words (same counts)."""
    s_content = meteor.sentence_meteor("red bike", ["red bike parked here"])
    s_function = meteor.sentence_meteor("of the", ["of the red bike"])
    assert s_content > s_function


def test_meteor_corpus_micro_average():
    """The corpus score aggregates summed stats (jar EVAL semantics), which
    differs from the mean of per-segment scores."""
    gts = {0: ["a man rides a red bike"], 1: ["a dog in the park"]}
    res = {0: ["a man rides a red bike"], 1: ["a dog sits in a park"]}
    mean, per = meteor.compute_meteor(gts, res)
    assert np.isfinite(mean) and mean > 0
    assert abs(mean - per.mean()) > 1e-6  # micro != macro here


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


def test_meteor_empty_hypothesis_counts_denominators():
    """A segment with an empty hypothesis contributes its reference length to
    the corpus recall denominator (jar EVAL aggregation) instead of vanishing
    from the micro-average."""
    gts = {0: ["a man rides a red bike"], 1: ["a dog in the park"]}
    res_empty = {0: ["a man rides a red bike"], 1: [""]}
    part, per = meteor.compute_meteor(gts, res_empty)
    assert per[1] == 0.0
    only0, _ = meteor.compute_meteor({0: gts[0]}, {0: res_empty[0]})
    assert part < only0  # the skipped-segment bug made these equal

    # the pure-Python tier agrees (compute_meteor may dispatch to native)
    import numpy as np
    total = np.zeros(6)
    for i in sorted(gts):
        _, st = meteor.sentence_stats(res_empty[i][0], gts[i])
        total += np.asarray(st)
    assert abs(meteor._score_from_stats(total) - part) < 1e-12


def test_bleu_single_image_stays_closest():
    """coco-caption's Bleu wrapper forces option='closest' (bleu.py:41), so
    the scorer's 1-image 'average' default never fires — parity on a 1-image
    corpus must hold with 'closest'."""
    ref_bleu = _ref_module("bleu", "bleu")
    gts = {0: ["a red bike parked by the old wall today",
               "the bike leans on a wall"]}
    res = {0: ["a bike leans on the wall now then"]}  # len between the refs
    want, want_per = ref_bleu.Bleu(4).compute_score(gts, res)
    got, got_per = bleu.compute_bleu(gts, res)
    np.testing.assert_allclose(got, want, rtol=1e-8)
    for k in range(4):
        np.testing.assert_allclose(got_per[k], want_per[k], rtol=1e-8)
