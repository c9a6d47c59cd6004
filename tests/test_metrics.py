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


# ---------------------------------------------------------------------------
# METEOR 1.5 stage machinery (synonym / paraphrase / function-word data files,
# ref protocol: coco-caption/pycocoevalcap/meteor/meteor.py:17-47; the data
# blobs are missing upstream — synthetic tables exercise the machinery)
# ---------------------------------------------------------------------------

def _stage_resources():
    return meteor.MeteorResources(
        function_words=["the", "a", "of"],
        synonym_groups=[{"cat", "feline"}, {"dog", "canine", "hound"}],
        paraphrases=[(["big", "house"], ["mansion"]), (["quick"], ["fast"])])


def test_meteor_synonym_stage_weight():
    """A synonym-only match scores with weight 0.8: between exact (1.0) and
    no match, and above a stem-only variant at equal alignment shape."""
    res = _stage_resources()
    s_exact = meteor.sentence_meteor("the cat sat", ["the cat sat"], res)
    s_syn = meteor.sentence_meteor("the feline sat", ["the cat sat"], res)
    s_none = meteor.sentence_meteor("the rock sat", ["the cat sat"], res)
    assert s_exact > s_syn > s_none


def test_meteor_synonym_needs_shared_group():
    res = _stage_resources()
    with_syn = meteor.sentence_meteor("a hound ran", ["a dog ran"], res)
    without = meteor.sentence_meteor("a hound ran", ["a dog ran"])
    assert with_syn > without


def test_meteor_paraphrase_stage_matches_phrases():
    res = _stage_resources()
    s_par = meteor.sentence_meteor(
        "she bought the mansion", ["she bought the big house"], res)
    s_off = meteor.sentence_meteor(
        "she bought the mansion", ["she bought the big house"])
    assert s_par > s_off
    # both directions of a table entry match
    s_rev = meteor.sentence_meteor(
        "she bought the big house", ["she bought the mansion"], res)
    assert s_rev > meteor.sentence_meteor(
        "she bought the big house", ["she bought the mansion"])


def test_meteor_function_words_override():
    """A provided function.words list replaces the built-in set: demoting a
    content word to function changes the delta weighting."""
    base = meteor.sentence_meteor("red bike", ["red bike parked"])
    res = meteor.MeteorResources(function_words=["parked"])
    changed = meteor.sentence_meteor("red bike", ["red bike parked"], res)
    assert changed != base


def test_meteor_resources_load_gz_paraphrase_format(tmp_path):
    """paraphrase-en.gz line convention: 'phrase ||| paraphrase [||| prob]',
    gz-compressed; function.words one per line."""
    import gzip
    par = tmp_path / "paraphrase-en.gz"
    with gzip.open(par, "wt") as f:
        f.write("big house ||| mansion ||| 0.71\n")
        f.write("quick\tfast\n")           # tab variant accepted too
        f.write("malformed line\n")
    fw = tmp_path / "function.words"
    fw.write_text("# comment\nthe\na\nof\n")
    syn = tmp_path / "synonyms.txt"
    syn.write_text("cat feline\nlonely\n")
    res = meteor.MeteorResources.load(
        function_words_path=str(fw), synonyms_path=str(syn),
        paraphrase_path=str(par))
    assert res.function_words == frozenset({"the", "a", "of"})
    assert res.synonym_groups == [frozenset({"cat", "feline"})]
    assert tuple("big house".split()) in res.par_map
    assert tuple(["mansion"]) in res.par_map  # reverse direction
    assert tuple(["quick"]) in res.par_map
    s = meteor.sentence_meteor("a mansion", ["a big house"], res)
    assert s > meteor.sentence_meteor("a mansion", ["a big house"])


def test_meteor_stage_tiers_agree_bitwise():
    """Python and C++ tiers must agree on scores WITH resources active (the
    native tier receives them via cic_meteor_configure)."""
    from cooperativeimagecaptioning_tpu.native import bindings
    if not bindings.available():
        import pytest
        pytest.skip("native tier unavailable")
    res = _stage_resources()
    gts = {0: ["the cat sat on the big house mat", "a feline rested quick"],
           1: ["a dog ran fast across the field"],
           2: ["empty hypothesis case reference"]}
    hyp = {0: ["the feline sat on the mansion mat"],
           1: ["a hound ran quick across a field"],
           2: [""]}
    ids = sorted(gts)
    py_scores, total = [], np.zeros(6)
    for i in ids:
        sc, st = meteor.sentence_stats(hyp[i][0], gts[i], res)
        py_scores.append(sc)
        total += np.asarray(st)
    nat_corpus, nat_scores = bindings.meteor(gts, hyp, res)
    np.testing.assert_allclose(nat_scores, py_scores, atol=1e-12)
    np.testing.assert_allclose(nat_corpus,
                               meteor._score_from_stats(total), atol=1e-12)
    # and the no-resources path resets cleanly after a configured call
    nat0 = bindings.meteor(gts, hyp, None)
    py0 = [meteor.sentence_stats(hyp[i][0], gts[i], None)[0] for i in ids]
    np.testing.assert_allclose(nat0[1], py0, atol=1e-12)


def test_meteor_lite_notice_printed_once(capsys):
    meteor._warned_lite.clear()
    gts = {0: ["a b"]}
    hyp = {0: ["a b"]}
    meteor.compute_meteor(gts, hyp)
    meteor.compute_meteor(gts, hyp)
    out = capsys.readouterr().out
    assert out.count("NOT comparable to jar-computed") == 1
