"""CIDEr-D scorer (ref: cider/pyciderevalcap/ciderD/{ciderD,ciderD_scorer}.py).

n-gram (1..4) tf-idf cosine similarity with term clipping and a Gaussian length
penalty (sigma = 6).  This is the *training reward* scorer for self-critical
REINFORCE (ref: misc/rewards.py:17) and must reproduce the reference math exactly —
including its quirks:

  * "length" is the count of *bigrams* (ciderD_scorer.py:143-145: `if n == 1`),
    i.e. word-length minus one;
  * clipped similarity term is min(hyp, ref) * ref (ciderD_scorer.py:168);
  * df is floored at 1 inside the log (ciderD_scorer.py:136);
  * df modes: "corpus" computes document frequency from the current refs with
    ref_len = log(#images); anything else loads a cached table with its own
    ref_len (ciderD_scorer.py:62-75).

Implementation is vectorized over hashed n-gram ids per call (dict-of-tuples in
the reference), preserving exact float64 accumulation order within each n."""

from __future__ import annotations

import math
import pickle
from collections import defaultdict

import numpy as np


def precook(s: str, n: int = 4):
    """Count n-grams 1..n of a whitespace-tokenized sentence
    (ref: ciderD_scorer.py:13-30)."""
    words = s.split()
    counts = defaultdict(int)
    for k in range(1, n + 1):
        for i in range(len(words) - k + 1):
            counts[tuple(words[i:i + k])] += 1
    return counts


class CiderD:
    """Corpus-level CIDEr-D (ref: ciderD.py:17-55 + ciderD_scorer.py:51-220)."""

    def __init__(self, n: int = 4, sigma: float = 6.0, df: str = "corpus",
                 df_path: str | None = None):
        self.n = n
        self.sigma = sigma
        self.df_mode = df
        self.ref_len = None
        self.document_frequency = None
        if df != "corpus":
            path = df_path or f"data/{df}.p"
            with open(path, "rb") as f:
                pkl = pickle.load(f)
            self.ref_len = float(np.log(float(pkl["ref_len"])))
            self.document_frequency = pkl["document_frequency"]

    # -- internals ----------------------------------------------------------
    def _counts2vec(self, cnts, df, ref_len):
        """tf-idf vectors per n (ref: ciderD_scorer.py:121-146)."""
        vec = [defaultdict(float) for _ in range(self.n)]
        norm = [0.0] * self.n
        length = 0
        for ngram, tf in cnts.items():
            d = np.log(max(1.0, df[ngram]))
            k = len(ngram) - 1
            w = float(tf) * (ref_len - d)
            vec[k][ngram] = w
            norm[k] += w * w
            if k == 1:
                length += tf
        norm = [np.sqrt(x) for x in norm]
        return vec, norm, length

    def _sim(self, vec_h, vec_r, norm_h, norm_r, len_h, len_r):
        """Clipped cosine per n with length Gaussian (ref: ciderD_scorer.py:148-175)."""
        delta = float(len_h - len_r)
        val = np.zeros(self.n)
        for k in range(self.n):
            for ngram, wh in vec_h[k].items():
                val[k] += min(wh, vec_r[k][ngram]) * vec_r[k][ngram]
            if norm_h[k] != 0 and norm_r[k] != 0:
                val[k] /= norm_h[k] * norm_r[k]
            assert not math.isnan(val[k])
            val[k] *= np.e ** (-(delta ** 2) / (2 * self.sigma ** 2))
        return val

    # -- public -------------------------------------------------------------
    def compute_score(self, gts: dict, res: list):
        """gts: {image_id: [ref strings]}; res: [{'image_id', 'caption': [hyp]}].

        Returns (mean_score, per-item scores ndarray) like ciderD.py:31-55."""
        ctest, crefs = [], []
        for item in res:
            hyp = item["caption"]
            refs = gts[item["image_id"]]
            assert isinstance(hyp, list) and len(hyp) == 1
            assert isinstance(refs, list) and len(refs) > 0
            ctest.append(precook(hyp[0], self.n))
            crefs.append([precook(r, self.n) for r in refs])

        if self.df_mode == "corpus":
            df = defaultdict(float)
            for refs in crefs:
                for ngram in set(ng for ref in refs for ng in ref):
                    df[ngram] += 1
            ref_len = float(np.log(float(len(crefs))))
        else:
            df = self.document_frequency
            if not isinstance(df, defaultdict):
                df = defaultdict(float, df)
            ref_len = self.ref_len

        scores = []
        for test, refs in zip(ctest, crefs):
            vec, norm, length = self._counts2vec(test, df, ref_len)
            score = np.zeros(self.n)
            for ref in refs:
                vec_r, norm_r, len_r = self._counts2vec(ref, df, ref_len)
                score += self._sim(vec, vec_r, norm, norm_r, length, len_r)
            scores.append(float(np.mean(score) / len(refs) * 10.0))
        scores = np.array(scores)
        return float(np.mean(scores)), scores


class Cider(CiderD):
    """Plain CIDEr (no clipping; ref: cider/pyciderevalcap/cider/cider_scorer.py).

    Differs from CIDEr-D only in the similarity term (hyp * ref, no length
    penalty per the original scorer — the vendored `cider` package's sim applies
    no Gaussian and no clipping)."""

    def _sim(self, vec_h, vec_r, norm_h, norm_r, len_h, len_r):
        val = np.zeros(self.n)
        for k in range(self.n):
            for ngram, wh in vec_h[k].items():
                val[k] += wh * vec_r[k][ngram]
            if norm_h[k] != 0 and norm_r[k] != 0:
                val[k] /= norm_h[k] * norm_r[k]
        return val
