"""Retrieval ranking suite (ref: eval_utils.py:283-720).

i2t: image -> 5 GT captions annotation ranks (ref :545-595)
t2i: caption -> image search ranks, with per-query distractor records (ref :598-720)
evalrank: R@1/5/10, median/mean rank, rsum, optional 5-fold COCO (ref :415-542)

Pure numpy on embedding matrices — the embeddings themselves are produced on device
by encode_data and pulled once per split.
"""

from __future__ import annotations

import numpy as np


def i2t(images, captions, npts=None, return_ranks=False, caps_per_image=5):
    """Images [cpi*N, K] (row-replicated), captions [cpi*N, K] (ref :545-595).

    The reference hardcodes 5 captions/image (it only ranks COCO/Flickr);
    caps_per_image generalizes to other datasets."""
    cpi = caps_per_image
    if npts is None:
        npts = images.shape[0] // cpi
    ranks = np.zeros(npts)
    top1 = np.zeros(npts)
    for index in range(npts):
        im = images[cpi * index].reshape(1, -1)
        d = (im @ captions.T).flatten()
        inds = np.argsort(d)[::-1]
        rank = 1e20
        for i in range(cpi * index, cpi * index + cpi):
            tmp = np.where(inds == i)[0][0]
            rank = min(rank, tmp)
        ranks[index] = rank
        top1[index] = inds[0]
    r1 = 100.0 * len(np.where(ranks < 1)[0]) / len(ranks)
    r5 = 100.0 * len(np.where(ranks < 5)[0]) / len(ranks)
    r10 = 100.0 * len(np.where(ranks < 10)[0]) / len(ranks)
    medr = np.floor(np.median(ranks)) + 1
    meanr = ranks.mean() + 1
    stats = (r1, r5, r10, medr, meanr)
    if return_ranks:
        return stats, (ranks, top1)
    return stats


def t2i(images, captions, images_data=None, npts=None, return_ranks=False,
        use_gen_sent=False, caps_per_image=None):
    """Caption -> image search (ref :598-720).

    caps_per_image: 5 for GT ranking, 1 for generated captions."""
    cpi = caps_per_image or (1 if use_gen_sent else 5)
    if npts is None:
        npts = images.shape[0] // cpi
    ims = images[::cpi]
    ranks = np.zeros(cpi * npts)
    top1 = np.zeros(cpi * npts)
    images_ranking = {}
    images_data = images_data or [{} for _ in range(npts)]
    for index in range(npts):
        queries = captions[cpi * index: cpi * index + cpi]
        d = queries @ ims.T
        inds = np.zeros(d.shape)
        for i in range(len(inds)):
            inds[i] = np.argsort(d[i])[::-1]
            rank_i = np.where(inds[i] == index)[0][0]
            ranks[cpi * index + i] = rank_i
            top1[cpi * index + i] = inds[i][0]
            meta = images_data[index] if index < len(images_data) else {}
            rec = {"image_id": meta.get("id"), "rank_correct_im": rank_i,
                   "file_path": meta.get("file_path", "")}
            for j in range(min(4, inds.shape[1])):  # distractors (ref :690-704)
                dmeta = images_data[int(inds[i, j])] \
                    if int(inds[i, j]) < len(images_data) else {}
                rec[f"im_id_rank_{j}"] = dmeta.get("id")
                rec[f"im_url_rank_{j}"] = dmeta.get("file_path", "")
            if use_gen_sent:
                images_ranking[index] = rec
            else:
                images_ranking.setdefault(index, {})[f"caption{i}"] = rec
    r1 = 100.0 * len(np.where(ranks < 1)[0]) / len(ranks)
    r5 = 100.0 * len(np.where(ranks < 5)[0]) / len(ranks)
    r10 = 100.0 * len(np.where(ranks < 10)[0]) / len(ranks)
    medr = np.floor(np.median(ranks)) + 1
    meanr = ranks.mean() + 1
    stats = (r1, r5, r10, medr, meanr)
    if return_ranks:
        return stats, (ranks, top1), images_ranking
    return stats


def rank_metrics(img_embs, cap_embs, images_data=None, use_gen_sent=False,
                 fold5=False, caps_per_image=None):
    """evalrank metric dict (ref :415-542)."""
    cpi = caps_per_image or (1 if use_gen_sent else 5)
    if not use_gen_sent:
        if not fold5:
            r, _ = i2t(img_embs, cap_embs, return_ranks=True,
                       caps_per_image=cpi)
            ri, _, images_ranking = t2i(img_embs, cap_embs, images_data,
                                        return_ranks=True,
                                        caps_per_image=cpi)
            ar = (r[0] + r[1] + r[2]) / 3
            ari = (ri[0] + ri[1] + ri[2]) / 3
            rsum = sum(r[:3]) + sum(ri[:3])
        else:
            results = []
            for i in range(5):
                sl = slice(i * 5000, (i + 1) * 5000)
                r = i2t(img_embs[sl], cap_embs[sl])
                ri = t2i(img_embs[sl], cap_embs[sl], caps_per_image=cpi)
                ar = (r[0] + r[1] + r[2]) / 3
                ari = (ri[0] + ri[1] + ri[2]) / 3
                rsum = sum(r[:3]) + sum(ri[:3])
                results += [list(r) + list(ri) + [ar, ari, rsum]]
            mean = np.array(results).mean(axis=0)
            r, ri = tuple(mean[:5]), tuple(mean[5:10])
            ar, ari, rsum = mean[10], mean[11], mean[12]
            images_ranking = {}
        return {"rsum": rsum, "i2t_ar": ar, "t2i_ar": ari,
                "i2t_r1": r[0], "i2t_r5": r[1], "i2t_r10": r[2],
                "i2t_medr": r[3], "i2t_meanr": r[4],
                "t2i_r1": ri[0], "t2i_r5": ri[1], "t2i_r10": ri[2],
                "t2i_medr": ri[3], "t2i_meanr": ri[4],
                "gt_images_ranking": images_ranking}
    # generated captions: t2i only (ref :494-540)
    ri, _, images_ranking = t2i(img_embs, cap_embs, images_data,
                                return_ranks=True, use_gen_sent=True)
    ari = (ri[0] + ri[1] + ri[2]) / 3
    rsum = sum(ri[:3])
    return {"rsum": rsum, "t2i_ar": ari,
            "t2i_r1": ri[0], "t2i_r5": ri[1], "t2i_r10": ri[2],
            "t2i_medr": ri[3], "t2i_meanr": ri[4],
            "images_ranking": images_ranking}
