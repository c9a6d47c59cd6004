"""METEOR scorer (replaces meteor-1.5.jar, ref:
coco-caption/pycocoevalcap/meteor/meteor.py which drives the jar over a stdio
protocol).

Implements METEOR's scoring model with the classic English parameterization
(Banerjee & Lavie 2005 / NLTK: alpha=0.9, penalty = 0.5*(chunks/matches)^3):
  * stage-wise word alignment (exact match first, then Porter-stem match),
    resolving ties toward fewer chunks like the reference beam aligner;
  * weighted precision/recall harmonic mean + fragmentation penalty:
        Fmean = P*R / (alpha*P + (1-alpha)*R)
        Pen   = gamma * (chunks/matches)^beta
        score = (1 - Pen) * Fmean
  * multi-reference: score against each reference, take the max.

METEOR 1.5's synonym/paraphrase modules require WordNet / paraphrase-en.gz
(missing large blobs in the reference checkout too, .MISSING_LARGE_BLOBS:3-4), so
this is the exact+stem METEOR variant with the classic parameters — documented
divergence from the jar.  A C++ implementation (native/) is used when built.
"""

from __future__ import annotations

import numpy as np

from cooperativeimagecaptioning_tpu.metrics.porter import stem

ALPHA, BETA, GAMMA = 0.9, 3.0, 0.5
W_EXACT, W_STEM = 1.0, 0.6


def _align(hyp_words, ref_words):
    """Greedy stage-wise alignment.  Returns (matches list of (hi, ri, weight))."""
    hyp_taken = [False] * len(hyp_words)
    ref_taken = [False] * len(ref_words)
    matches = []

    def run_stage(key_fn, weight):
        # prefer monotonic pairs (reduces chunks), like the beam aligner's
        # tie-breaking toward contiguity
        ref_keys = {}
        for ri, w in enumerate(ref_words):
            if not ref_taken[ri]:
                ref_keys.setdefault(key_fn(w), []).append(ri)
        last_ri = -1
        for hi, w in enumerate(hyp_words):
            if hyp_taken[hi]:
                continue
            cands = [ri for ri in ref_keys.get(key_fn(w), [])
                     if not ref_taken[ri]]
            if not cands:
                continue
            after = [ri for ri in cands if ri > last_ri]
            ri = after[0] if after else cands[0]
            hyp_taken[hi] = True
            ref_taken[ri] = True
            matches.append((hi, ri, weight))
            last_ri = ri

    run_stage(lambda w: w, W_EXACT)
    run_stage(stem, W_STEM)
    return matches


def _count_chunks(matches):
    """Number of maximal runs of contiguous, order-preserving matches."""
    if not matches:
        return 0
    ms = sorted((hi, ri) for hi, ri, _ in matches)
    chunks = 1
    for (h0, r0), (h1, r1) in zip(ms, ms[1:]):
        if not (h1 == h0 + 1 and r1 == r0 + 1):
            chunks += 1
    return chunks


def sentence_meteor(hyp: str, refs: list) -> float:
    hyp_words = hyp.split()
    best = 0.0
    for ref in refs:
        ref_words = ref.split()
        if not hyp_words or not ref_words:
            continue
        matches = _align(hyp_words, ref_words)
        m = len(matches)
        if m == 0:
            continue
        wsum = sum(w for _, _, w in matches)
        p = wsum / len(hyp_words)
        r = wsum / len(ref_words)
        if p == 0 or r == 0:
            continue
        fmean = p * r / (ALPHA * p + (1 - ALPHA) * r)
        frag = _count_chunks(matches) / m
        pen = GAMMA * frag ** BETA
        score = (1 - pen) * fmean
        best = max(best, score)
    return best


def compute_meteor(gts: dict, res: dict):
    try:
        from cooperativeimagecaptioning_tpu.native import bindings
        if bindings.available():
            return bindings.meteor(gts, res)
    except Exception:
        pass
    ids = sorted(gts.keys(), key=lambda x: str(x))
    scores = np.array([sentence_meteor(res[i][0], gts[i]) for i in ids])
    return float(scores.mean()), scores
