"""Caption<->caption retrieval experiments (gen2gt / gt2gen / halves)."""

import numpy as np

from cooperativeimagecaptioning_tpu.evaluation import caption_retrieval as cr
from cooperativeimagecaptioning_tpu.evaluation.eval_split import Evaluator
from test_evaluation import build


def test_gen2gt_perfect():
    rng = np.random.RandomState(0)
    n, cpi, E = 10, 5, 8
    gen = rng.randn(n, E)
    gen /= np.linalg.norm(gen, axis=1, keepdims=True)
    # each image's 5 GT captions = small perturbations of its generated one
    gt = np.repeat(gen, cpi, axis=0) + 0.01 * rng.randn(n * cpi, E)
    r = cr.gen2gt(gen, gt, cpi)
    assert r[0] == 100.0
    r2 = cr.gt2gen(gen, gt, cpi)
    assert r2[0] == 100.0


def test_gt2gen_random_is_worse():
    rng = np.random.RandomState(1)
    n, cpi, E = 20, 5, 8
    gen = rng.randn(n, E)
    gt = rng.randn(n * cpi, E)
    r = cr.gt2gen(gen, gt, cpi)
    assert r[0] < 50.0


def test_split_halves_shapes():
    seqs = np.arange(24).reshape(4, 6)
    masks = np.ones((4, 6)); masks[2, 4:] = 0
    lens = masks.sum(1)
    (f_s, f_m), (s_s, s_m) = cr.split_halves(seqs, masks, lens)
    assert f_s.shape[1] >= 1
    assert f_s.shape[1] + s_s.shape[1] <= 2 * seqs.shape[1]
    # second half of row 2 has len - half tokens
    half = f_s.shape[1]
    assert s_m[2].sum() == lens[2] - half


def test_evalrankcap_end_to_end(tmp_path):
    opt, loader, params = build(tmp_path, language_eval=0, rank_eval=0)
    ev = Evaluator(opt)
    out = cr.evalrankcap(ev, params, loader, {"split": "val"})
    for k in ("gen2gt_r1", "gt2gen_r1", "gen2gt_meanr"):
        assert k in out and np.isfinite(out[k])
    halves = cr.evalrankcap(ev, params, loader, {"split": "val"},
                            divide_caption=1)
    assert "first" in halves and "second" in halves


def test_split_halves_shared_rule():
    """The reference computes ONE half over the GT and generated groups
    together (eval_utils.py:1128-1148) — both groups must cut at the same
    point even when their mean lengths differ."""
    import numpy as np
    from cooperativeimagecaptioning_tpu.evaluation.caption_retrieval import \
        split_halves
    gt = np.arange(1, 13).reshape(1, 12)
    gt_m = np.ones((1, 12)); gt_lens = np.array([12.0])
    gen = np.arange(101, 113).reshape(1, 12)
    gen_m = np.ones((1, 12)); gen_lens = np.array([6.0])
    both = np.concatenate([gt_lens, gen_lens])
    (g1, _), _ = split_halves(gt, gt_m, gt_lens, shared_lens=both)
    (n1, _), _ = split_halves(gen, gen_m, gen_lens, shared_lens=both)
    # shared half = min(floor(mean(9)/2)=4, min(6)-1=5) = 4 for BOTH groups
    assert g1.shape[1] == 4 and n1.shape[1] == 4
