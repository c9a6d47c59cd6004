"""CIDEr-D parity against the reference's vendored scorer, plus reward protocol."""

import sys

import numpy as np

from cooperativeimagecaptioning_tpu.rewards.cider_d import CiderD
from cooperativeimagecaptioning_tpu.rewards import self_critical


def _load_ref_ciderd():
    sys.path.insert(0, "/root/reference/cider/pyciderevalcap/ciderD")
    try:
        import ciderD  # noqa
        return ciderD.CiderD
    finally:
        sys.path.pop(0)


def make_case(seed=0, n_img=6, vocab=30):
    rng = np.random.RandomState(seed)
    gts, res = {}, []
    for i in range(n_img):
        refs = []
        for _ in range(rng.randint(2, 6)):
            L = rng.randint(3, 12)
            refs.append(" ".join(str(x) for x in rng.randint(1, vocab, L)))
        gts[i] = refs
        L = rng.randint(2, 12)
        hyp = " ".join(str(x) for x in rng.randint(1, vocab, L))
        res.append({"image_id": i, "caption": [hyp]})
    # make one hypothesis overlap a reference heavily
    res[0]["caption"] = [gts[0][0]]
    return gts, res


def test_ciderd_corpus_parity():
    RefCiderD = _load_ref_ciderd()
    gts, res = make_case()
    ref = RefCiderD(df="corpus")
    want_mean, want = ref.compute_score(gts, res)
    got_mean, got = CiderD(df="corpus").compute_score(gts, res)
    np.testing.assert_allclose(got, want, rtol=1e-9)
    np.testing.assert_allclose(got_mean, want_mean, rtol=1e-9)


def test_ciderd_identical_caption_scores_high():
    gts, res = make_case(seed=1)
    _, scores = CiderD(df="corpus").compute_score(gts, res)
    assert scores[0] == max(scores)


def test_array_to_str_stops_at_zero():
    assert self_critical.array_to_str([3, 5, 0, 7]) == "3 5 0"
    assert self_critical.array_to_str([2, 4]) == "2 4"


def test_self_critical_reward_shape_and_sign():
    self_critical.reset_scorer()
    self_critical.init_scorer("corpus")
    rng = np.random.RandomState(2)
    n_img, spi, L = 4, 2, 8
    gts = [rng.randint(1, 20, (3, L)) for _ in range(n_img)]
    B = n_img * spi
    gen = rng.randint(0, 20, (B, L))
    # greedy == one of the refs for image 0 -> its reward should beat random rows
    greedy = rng.randint(0, 20, (B, L))
    gen[0] = gts[0][0]
    scores, cider_greedy = self_critical.get_self_critical_reward(
        gts, gen, greedy)
    assert scores.shape == (B,)
    assert isinstance(cider_greedy, float)
    cg, scores2, _ = self_critical.get_self_critical_reward(
        gts, gen, greedy, return_gen_scores=True)
    np.testing.assert_allclose(scores, scores2)
    assert cg[0] >= cg.max() - 1e-9  # exact-match caption gets the top raw score
