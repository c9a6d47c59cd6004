"""On-device CIDEr-D self-critical rewards via hashed n-grams.

Performance tier of the reward engine (SURVEY.md §7 step 7): the host tier
(self_critical.py) serializes IDs to strings and runs the dict-based scorer; this
tier reproduces the same math fully inside jit so REINFORCE training never leaves
the device:

  * token sequences follow array_to_str semantics — tokens up to and INCLUDING
    the first 0 (misc/rewards.py:26-32);
  * n-grams (n = 1..4) are polynomial rolling hashes mod 2^32 (collision
    probability ~1e-5 per batch at COCO scale — the host tier stays the
    correctness oracle);
  * 'corpus' document frequency reproduces the reference's quirk of counting
    the 2B-times-expanded ref list (each image's refs appear 2*seq_per_img
    times, ref_len = log(2B); misc/rewards.py:53-55 + ciderD_scorer.py:204-216);
  * "length" is the BIGRAM count (eff_len - 1), matching ciderD_scorer.py:143-145;
  * clipped similarity min(h, r)*r per distinct gram, Gaussian length penalty
    sigma = 6, mean over n, /n_refs, x10.

Shapes: gen/greedy [B, L]; refs [n_img, R, L] padded with ref_mask [n_img, R].
"""

from __future__ import annotations

import pickle
from typing import NamedTuple

import numpy as np

import jax
import jax.numpy as jnp

HASH_P = jnp.uint32(1_000_003)
NS = (1, 2, 3, 4)
SIGMA = 6.0


class DfTable(NamedTuple):
    """Precomputed document frequency as per-n sorted hash tables.

    TPU analogue of the reference's non-corpus df mode (the cached
    `data/<name>.p` pickle, ciderD_scorer.py:62-75): df lookups become
    binary searches over device-resident sorted key arrays, which removes
    the O(batch^2) dense containment of corpus mode — the reward cost is
    then linear in batch size.
    """
    keys: tuple          # per n in NS: [T_n] uint32 sorted ngram hashes
    dfs: tuple           # per n in NS: [T_n] float32 document frequencies
    ref_len_log: jnp.ndarray  # scalar log(ref_len)


def hash_ngram(tokens) -> int:
    """Host mirror of _gram_hashes' rolling hash."""
    h = 0
    for t in tokens:
        h = (h * 1_000_003 + int(t) + 1) % (2 ** 32)
    return h


def build_df_table(document_frequency, ref_len) -> DfTable:
    """dict{ngram tuple -> df} + ref_len count -> device DfTable.

    Accepts reference-style pickles where tokens are decimal strings
    (misc/rewards.py array_to_str protocol) or int tuples.  The ~1e-5 hash
    collision rate merges colliding grams to the max df (conservative:
    overestimating df only shrinks a gram's idf weight)."""
    per_n = {n: {} for n in NS}
    for ngram, df in document_frequency.items():
        n = len(ngram)
        if n not in per_n or df <= 0:
            continue
        h = hash_ngram(ngram)
        d = per_n[n]
        d[h] = max(d.get(h, 0.0), float(df))
    keys, dfs = [], []
    for n in NS:
        # uint32 end-to-end: int64 would be silently truncated to int32 by
        # jnp without x64, scrambling the sort order of keys >= 2^31
        items = sorted(per_n[n].items()) or [(0, 0.0)]  # sentinel row (df 0)
        keys.append(jnp.asarray(
            np.fromiter((k for k, _ in items), np.uint32, len(items))))
        dfs.append(jnp.asarray(
            np.fromiter((v for _, v in items), np.float32, len(items))))
    return DfTable(tuple(keys), tuple(dfs),
                   jnp.float32(np.log(float(ref_len))))


def load_df_table(path: str) -> DfTable:
    """Load a reference-format df pickle ({'ref_len', 'document_frequency'},
    ciderD_scorer.py:70-74)."""
    with open(path, "rb") as f:
        pkl = pickle.load(f)
    return build_df_table(pkl["document_frequency"], pkl["ref_len"])


def _df_lookup(keys, dfs, q):
    """Binary-search df of each query hash; 0.0 for unseen grams (the
    reference's defaultdict(float) semantics).  All-uint32 compare."""
    shape = q.shape
    qf = q.reshape(-1).astype(jnp.uint32)
    # method='sort' (co-sort queries with keys) measured 3.4x faster than the
    # binary-search scan on v5e at this query:table ratio
    idx = jnp.clip(jnp.searchsorted(keys, qf, method="sort"), 0,
                   keys.shape[0] - 1)
    return jnp.where(keys[idx] == qf, dfs[idx], 0.0).reshape(shape)


def pad_gts_np(gts_list, max_refs=None, seq_length=None):
    """Host helper: list of [n_i, L_i] ref arrays -> numpy (refs [n_img, R, L],
    ref_mask [n_img, R]).  Kept on host so callers that stack several batches
    (the fused multi-step trainer) pay one device transfer, not one per batch."""
    n_img = len(gts_list)
    R = max_refs or max(len(g) for g in gts_list)
    L = seq_length or max(int(np.asarray(g).shape[1]) for g in gts_list)
    refs = np.zeros((n_img, R, L), np.int32)
    mask = np.zeros((n_img, R), np.float32)
    for i, g in enumerate(gts_list):
        g = np.asarray(g)[:R]
        refs[i, :len(g), :g.shape[1]] = g
        mask[i, :len(g)] = 1.0
    return refs, mask


def pad_gts(gts_list, max_refs=None, seq_length=None):
    """Device variant of pad_gts_np (one transfer per call)."""
    refs, mask = pad_gts_np(gts_list, max_refs=max_refs, seq_length=seq_length)
    return jnp.asarray(refs), jnp.asarray(mask)


def containment_df(q_hash, flat_gr, flat_vr, expand=1.0):
    """Dense corpus document frequency: df[q] = expand * #images whose ref set
    contains gram q.  flat_gr/flat_vr are the per-image flattened gram hash
    table [n_img, M] and its validity mask.  O(Q*n_img*M) compares — the VPU
    eats these; beats sort+searchsorted on TPU up to B~1024 (see caller)."""
    n_img, M = flat_gr.shape
    eq = (q_hash[..., None, None] == flat_gr[None, ...]).astype(jnp.float32) \
        * flat_vr[None, ...]
    contains = jnp.max(eq.reshape(q_hash.shape + (n_img, M)), axis=-1)
    return jnp.sum(contains, axis=-1) * expand


def _eff_len(seq):
    """Length including the terminal 0 (or full length if none)."""
    L = seq.shape[-1]
    has_zero = jnp.any(seq == 0, axis=-1)
    first_zero = jnp.argmax(seq == 0, axis=-1)
    return jnp.where(has_zero, first_zero + 1, L)


def _gram_hashes(seq, n):
    """[..., L] tokens -> ([..., L] hashes, [..., L] validity) for n-grams
    starting at each position."""
    L = seq.shape[-1]
    t = seq.astype(jnp.uint32)
    h = jnp.zeros_like(t)
    for k in range(n):
        tk = jnp.roll(t, -k, axis=-1) if k else t
        h = h * HASH_P + tk + jnp.uint32(1)
    eff = _eff_len(seq)[..., None]
    pos = jnp.arange(L)
    valid = (jnp.broadcast_to(pos, seq.shape) + n) <= eff
    return h, valid.astype(jnp.float32)


def ciderd_rewards_device(gen, greedy, refs, ref_mask, seq_per_img=1,
                          sigma=SIGMA, df_table: DfTable | None = None):
    """Returns (scores [B] = cider(gen)-cider(greedy), cider_gen [B],
    cider_greedy scalar).

    df_table=None (corpus mode) computes df from the expanded batch refs via
    the dense containment matrix — exact reference parity, O(B^2) in batch.
    With a DfTable (the reference's cached-df mode), df comes from sorted-
    table binary searches and the whole reward is linear in batch size."""
    B, L = gen.shape
    n_img, R, Lr = refs.shape
    seqs = jnp.concatenate([gen, greedy], axis=0).astype(jnp.int32)  # [2B, L]
    B2 = 2 * B
    img_of = (jnp.arange(B2) % B) // seq_per_img  # (misc/rewards.py:55)
    my_refs = refs[img_of]                 # [2B, R, Lr]
    my_rmask = ref_mask[img_of]            # [2B, R]
    n_refs = jnp.sum(ref_mask, axis=1)[img_of]  # [2B]

    # df expansion factor: each image's ref set appears (2B / n_img) times
    expand = B2 / n_img
    if df_table is not None:
        ref_len_log = df_table.ref_len_log
    else:
        ref_len_log = jnp.log(jnp.float32(B2))

    len_h = jnp.maximum(_eff_len(seqs) - 1, 0).astype(jnp.float32)   # bigrams
    len_r = jnp.maximum(_eff_len(refs) - 1, 0).astype(jnp.float32)   # [n_img,R]
    len_r = len_r[img_of]                                            # [2B, R]
    delta = len_h[:, None] - len_r                                   # [2B, R]
    len_pen = jnp.exp(-(delta ** 2) / (2 * sigma ** 2)) * my_rmask

    sim_sum = jnp.zeros((B2, R))
    for n in NS:
        gh, vh = _gram_hashes(seqs, n)            # [2B, L]
        gr, vr = _gram_hashes(refs, n)            # [n_img, R, Lr]
        vr = vr * ref_mask[..., None]
        gr_mine = gr[img_of]                      # [2B, R, Lr]
        vr_mine = vr[img_of]

        # hyp term frequency: [2B, L]
        eq_hh = (gh[:, :, None] == gh[:, None, :]).astype(jnp.float32)
        tf_h = jnp.einsum("sij,sj->si", eq_hh, vh)
        # count of hyp gram i in ref r: [2B, L, R]
        eq_hr = (gh[:, :, None, None] == gr_mine[:, None, :, :]) \
            .astype(jnp.float32)
        cnt_r = jnp.einsum("sirj,srj->sir", eq_hr, vr_mine)
        # ref term frequency (within each ref): [n_img, R, Lr]
        eq_rr = (gr[..., :, None] == gr[..., None, :]).astype(jnp.float32)
        tf_r = jnp.einsum("zrij,zrj->zri", eq_rr, vr)

        if df_table is not None:
            # cached-df tier: O(log T) binary search per gram, linear in B
            kn, dn = df_table.keys[n - 1], df_table.dfs[n - 1]
            df_h = _df_lookup(kn, dn, gh)           # [2B, L]
            df_r = _df_lookup(kn, dn, gr)           # [n_img, R, Lr]
        else:
            # Corpus mode: document frequency over the expanded ref list.
            # contains[q, z] = image z has gram q in any ref.  The dense
            # containment matrix is O(Q*N) but beats a sort+searchsorted
            # formulation on TPU at batch scale (measured 6.0 vs 4.0 it/s at
            # B=1024 — the VPU eats dense compares; sorts and binary-search
            # gathers are latency-bound).  It is quadratic in batch, so past
            # B~1024 use the DfTable tier instead.
            flat_gr = gr.reshape(n_img, R * Lr)
            flat_vr = vr.reshape(n_img, R * Lr)
            df_h = containment_df(gh, flat_gr, flat_vr, expand)   # [2B, L]
            df_r = containment_df(gr.reshape(n_img, R * Lr), flat_gr,
                                  flat_vr, expand).reshape(n_img, R, Lr)

        idf_h = ref_len_log - jnp.log(jnp.maximum(1.0, df_h))
        idf_r = ref_len_log - jnp.log(jnp.maximum(1.0, df_r))
        w_h = tf_h * idf_h                          # [2B, L]
        w_r_pos = tf_r * idf_r                      # [n_img, R, Lr]

        # norms over DISTINCT grams: sum_i valid * w^2 / tf
        norm_h = jnp.sqrt(jnp.sum(
            vh * jnp.where(tf_h > 0, w_h ** 2 / jnp.maximum(tf_h, 1e-9), 0.0),
            axis=1))                                # [2B]
        norm_r = jnp.sqrt(jnp.sum(
            vr * jnp.where(tf_r > 0,
                           w_r_pos ** 2 / jnp.maximum(tf_r, 1e-9), 0.0),
            axis=2))[img_of]                        # [2B, R]

        # w_r of each hyp gram in each ref: cnt_r * idf(gram)
        w_r_of_h = cnt_r * idf_h[:, :, None]        # [2B, L, R]
        clipped = jnp.minimum(w_h[:, :, None], w_r_of_h) * w_r_of_h
        # each distinct hyp gram once: weight valid/tf
        weight = vh * jnp.where(tf_h > 0, 1.0 / jnp.maximum(tf_h, 1e-9), 0.0)
        val = jnp.einsum("sir,si->sr", clipped, weight)  # [2B, R]
        denom = norm_h[:, None] * norm_r
        val = jnp.where(denom > 0, val / jnp.maximum(denom, 1e-20), 0.0)
        sim_sum = sim_sum + val * len_pen

    # mean over n, sum over refs, / n_refs, x10 (ciderD_scorer.py:186-196)
    per_seq = jnp.sum(sim_sum, axis=1) / len(NS) / jnp.maximum(n_refs, 1) * 10.0
    cider_gen = per_seq[:B]
    cider_greedy_vec = per_seq[B:]
    return (cider_gen - cider_greedy_vec, cider_gen,
            jnp.mean(cider_greedy_vec))
