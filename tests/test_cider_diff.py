"""Differentiable soft CIDEr vs the reference cider_diff scorer (torch oracle)."""

import os
import pickle
import sys
from collections import defaultdict

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from cooperativeimagecaptioning_tpu.rewards import cider_diff

torch = pytest.importorskip("torch")


def _load_ref_scorer(tmp_path):
    """The reference class loads cider/data/coco-val.p at class-definition time
    (a missing large blob); materialize a stub df pickle and chdir to it."""
    os.makedirs(tmp_path / "cider" / "data", exist_ok=True)
    with open(tmp_path / "cider" / "data" / "coco-val.p", "wb") as f:
        pickle.dump({"document_frequency": defaultdict(float),
                     "ref_len": 40504}, f)
    old = os.getcwd()
    os.chdir(tmp_path)
    sys.path.insert(0, "/root/reference/cider/pyciderevalcap/cider_diff")
    try:
        import importlib
        import cider_scorer as ref_mod
        importlib.reload(ref_mod)
        return ref_mod
    finally:
        sys.path.pop(0)
        os.chdir(old)


def make_case(seed=0, B=3, R=2, Lr=8, T=6, V=10):
    rng = np.random.RandomState(seed)
    refs = np.zeros((B, R, Lr), np.int64)
    for b in range(B):
        for r in range(R):
            k = rng.randint(2, Lr - 1)
            refs[b, r, :k] = rng.randint(1, V, k)
            # terminal 0 marks the end and is part of the gram stream
    res = rng.rand(B, T, V + 1).astype(np.float32) + 0.05
    res /= res.sum(-1, keepdims=True)
    return refs, np.ones((B, R), np.float32), res


def ref_strings(refs):
    out = []
    for b in range(refs.shape[0]):
        caps = []
        for r in range(refs.shape[1]):
            toks = []
            for t in refs[b, r]:
                toks.append(str(int(t)))
                if t == 0:
                    break
            caps.append(" ".join(toks))
        out.append(caps)
    return out


def test_soft_cider_matches_reference(tmp_path):
    ref_mod = _load_ref_scorer(tmp_path)
    refs, rmask, res = make_case()
    V = 10
    word_index = {str(i): i for i in range(V)}  # vocab_size = 11 = C

    scorer = ref_mod.CiderScorer(word_index=word_index)
    for caps in ref_strings(refs):
        scorer += caps
    scorer.compute_df(df_mode="corpus")
    want = []
    for b in range(res.shape[0]):
        with torch.no_grad():
            want.append(float(scorer.compute_score(
                torch.from_numpy(res[b]), b)))

    got = np.asarray(cider_diff.soft_cider_scores(
        jnp.asarray(res), jnp.asarray(refs), jnp.asarray(rmask)))
    np.testing.assert_allclose(got, want, rtol=2e-4)


def test_soft_cider_differentiable():
    refs, rmask, res = make_case(seed=1)
    g = jax.grad(lambda r: jnp.sum(cider_diff.soft_cider_scores(
        r, jnp.asarray(refs), jnp.asarray(rmask))))(jnp.asarray(res))
    g = np.asarray(g)
    assert np.all(np.isfinite(g))
    assert np.abs(g).max() > 0


def test_soft_cider_prefers_matching_distribution():
    refs, rmask, _ = make_case(seed=2, B=2, R=1, Lr=6, T=6)
    C = 11
    # peaked distribution on ref tokens vs uniform
    res_match = np.full((2, 6, C), 1e-3, np.float32)
    for b in range(2):
        for t in range(6):
            res_match[b, t, int(refs[b, 0, t])] = 1.0
    res_match /= res_match.sum(-1, keepdims=True)
    res_flat = np.full((2, 6, C), 1.0 / C, np.float32)
    s_match = np.asarray(cider_diff.soft_cider_scores(
        jnp.asarray(res_match), jnp.asarray(refs), jnp.asarray(rmask)))
    s_flat = np.asarray(cider_diff.soft_cider_scores(
        jnp.asarray(res_flat), jnp.asarray(refs), jnp.asarray(rmask)))
    assert np.all(s_match > s_flat)
