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
