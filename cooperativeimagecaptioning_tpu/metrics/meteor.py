"""METEOR scorer (replaces meteor-1.5.jar, ref:
coco-caption/pycocoevalcap/meteor/meteor.py which drives the jar over a stdio
protocol with `-l en -norm`, i.e. the English 'rank'-task tuning).

Implements the METEOR 1.5 scoring model (Denkowski & Lavie 2014):
  * stage-wise word alignment — exact match first, then Porter-stem match —
    resolving ties toward fewer chunks like the jar's beam aligner;
  * content/function word distinction: matched and total words are weighted
    delta for content words and (1-delta) for function words;
        P     = sum_i w_i*(d*m_i(h_c) + (1-d)*m_i(h_f)) / (d*|h_c|+(1-d)*|h_f|)
        R     = likewise over the reference
        Fmean = P*R / (alpha*P + (1-alpha)*R)
        Pen   = gamma * (chunks/m)^beta
        score = (1 - Pen) * Fmean
    with the 1.5 English parameters alpha=.85 beta=.2 gamma=.6 delta=.75 and
    stage weights exact=1.0, stem=0.6;
  * multi-reference: the best-scoring reference's statistics represent the
    segment (jar semantics);
  * the corpus score is the micro-average — the formula applied to SUMMED
    segment statistics — exactly how the jar's final EVAL line aggregates,
    not the mean of sentence scores.

Data-unavailable divergences (the blobs are absent upstream too,
.MISSING_LARGE_BLOBS): the synonym stage (WordNet, weight 0.8) and paraphrase
stage (paraphrase-en.gz, weight 0.6) cannot run, and the corpus-derived
function.words list is approximated by a built-in English function-word set.
A C++ implementation (native/cic_native.cpp) is used when built; both tiers
agree bit-for-bit on the shared test corpus.
"""

from __future__ import annotations

import numpy as np

from cooperativeimagecaptioning_tpu.metrics.porter import stem

ALPHA, BETA, GAMMA, DELTA = 0.85, 0.2, 0.6, 0.75
W_EXACT, W_STEM = 1.0, 0.6

# Approximation of METEOR's corpus-derived English function.words (words with
# relative frequency > 1e-3): determiners, prepositions, conjunctions,
# pronouns, auxiliaries, and high-frequency adverbs/particles.
FUNCTION_WORDS = frozenset("""
a an the this that these those some any each every no all both either neither
i you he she it we they me him her us them my your his its our their mine
yours hers ours theirs myself yourself himself herself itself ourselves
themselves who whom whose which what
is am are was were be been being do does did done doing have has had having
will would shall should can could may might must ought need dare used
and or but nor so yet for if then than as because while although though
since unless until when where why how whether that
of in on at by with from to into onto upon about above below under over
between among through during before after against across behind beyond
around near off out up down within without along toward towards
not n't never also just only even still too very quite rather there here
's 'd 'll 'm 're 've
. , ; : ! ? ' " ` `` '' -- ( ) [ ]
""".split())


def _align(hyp_words, ref_words):
    """Greedy stage-wise alignment.  Returns matches [(hi, ri, weight)]."""
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


def _score_from_stats(st):
    """METEOR 1.5 formula over a stats vector
    [wp_num, p_den, wr_num, r_den, chunks, matches]."""
    wp_num, p_den, wr_num, r_den, chunks, m = st
    if m <= 0 or p_den <= 0 or r_den <= 0:
        return 0.0
    p = wp_num / p_den
    r = wr_num / r_den
    if p == 0 or r == 0:
        return 0.0
    fmean = p * r / (ALPHA * p + (1 - ALPHA) * r)
    pen = GAMMA * (chunks / m) ** BETA
    return (1 - pen) * fmean


def _pair_stats(hyp_words, ref_words):
    matches = _align(hyp_words, ref_words)
    m = len(matches)
    cw = lambda w: DELTA if w not in FUNCTION_WORDS else (1 - DELTA)
    p_den = sum(cw(w) for w in hyp_words)
    r_den = sum(cw(w) for w in ref_words)
    wp_num = sum(wt * cw(hyp_words[hi]) for hi, _, wt in matches)
    wr_num = sum(wt * cw(ref_words[ri]) for _, ri, wt in matches)
    return [wp_num, p_den, wr_num, r_den, float(_count_chunks(matches)),
            float(m)]


def sentence_stats(hyp: str, refs: list):
    """(score, stats) for the best-scoring reference (jar segment semantics)."""
    hyp_words = hyp.split()
    best_score, best_stats = 0.0, None
    for ref in refs:
        ref_words = ref.split()
        if not hyp_words or not ref_words:
            continue
        st = _pair_stats(hyp_words, ref_words)
        sc = _score_from_stats(st)
        if sc >= best_score or best_stats is None:
            best_score, best_stats = sc, st
    if best_stats is None:
        # degenerate segment (empty hypothesis and/or references): zero
        # matches, but the length denominators still count toward the corpus
        # micro-average — the jar's EVAL aggregation includes them too
        cw = lambda w: DELTA if w not in FUNCTION_WORDS else (1 - DELTA)
        ref_words = next((r.split() for r in refs if r.split()), [])
        best_stats = [0.0, sum(cw(w) for w in hyp_words), 0.0,
                      sum(cw(w) for w in ref_words), 0.0, 0.0]
    return best_score, best_stats


def sentence_meteor(hyp: str, refs: list) -> float:
    return sentence_stats(hyp, refs)[0]


def compute_meteor(gts: dict, res: dict):
    """Returns (corpus_score, per-segment scores).  The corpus score is the
    micro-average over summed stats, matching the jar's final EVAL line."""
    try:
        from cooperativeimagecaptioning_tpu.native import bindings
        if bindings.available():
            return bindings.meteor(gts, res)
    except Exception:
        pass
    ids = sorted(gts.keys(), key=lambda x: str(x))
    scores, total = [], np.zeros(6)
    for i in ids:
        sc, st = sentence_stats(res[i][0], gts[i])
        scores.append(sc)
        total += np.asarray(st)
    return float(_score_from_stats(total)), np.array(scores)
