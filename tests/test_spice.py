"""SPICE-lite scene-graph tuple metric."""

import numpy as np

from cooperativeimagecaptioning_tpu.metrics import spice


def test_parse_tuples_structure():
    t = spice.parse_tuples("a young man riding a red bike in the park")
    assert ("O", "man") in t
    assert ("A", "man", "young") in t
    assert ("A", "bike", "red") in t
    assert ("R", "man", "ride", "bike") in t
    assert ("R", "bike", "in", "park") in t


def test_exact_match_is_perfect():
    s = "a dog sitting on the grass"
    out = spice.sentence_spice(s, [s])
    assert out["All"]["f"] == 1.0


def test_spice_ordering():
    refs = ["a man riding a red bike in the park"]
    good = spice.sentence_spice("a man riding a bike", refs)["All"]["f"]
    bad = spice.sentence_spice("two cats sleep on the sofa", refs)["All"]["f"]
    assert good > bad == 0.0


def test_compute_spice_contract():
    gts = {0: ["a man rides a bike"], 1: ["a cat on a mat"]}
    res = {0: ["a man rides a bike"], 1: ["a dog in a park"]}
    mean_f, per = spice.compute_spice(gts, res)
    assert 0 <= mean_f <= 1
    assert set(per[0].keys()) == {"All", "Object", "Attribute", "Relation"}
    for v in per[0].values():
        assert {"p", "r", "f"} <= set(v.keys())


def test_language_eval_spice_integration():
    """CocoEvalCap with include_spice surfaces SPICE + per-category subscores."""
    from cooperativeimagecaptioning_tpu.evaluation.coco_eval import (
        CocoAnnotations, CocoEvalCap)
    gts = {0: ["a man rides a bike"], 1: ["a cat on a mat"]}
    anns = [{"image_id": i, "caption": c, "id": 10 * i + j}
            for i in gts for j, c in enumerate(gts[i])]
    coco = CocoAnnotations(dataset={"annotations": anns,
                                    "images": [{"id": i} for i in gts]})
    preds = [{"image_id": 0, "caption": "a man rides a bike"},
             {"image_id": 1, "caption": "a cat sits on a mat"}]
    ce = CocoEvalCap(coco, coco.load_res(preds), include_spice=True)
    scores = ce.evaluate()
    assert "SPICE" in scores and np.isfinite(scores["SPICE"])
    assert isinstance(ce.img_to_eval[0]["SPICE"], dict)
