"""Data loader: prefetcher stream equivalence, iterator wrap/shuffle, masks."""

import numpy as np

from cooperativeimagecaptioning_tpu.config import Options
from cooperativeimagecaptioning_tpu.data import DataLoader
from cooperativeimagecaptioning_tpu.data.sources import SyntheticDataset


def make(prefetch=False, seed=123, **kw):
    base = dict(batch_size=4, seq_per_img=2, use_att=True, seed=seed,
                fc_feat_size=12, att_feat_size=12, prefetch_batches=2)
    base.update(kw)
    opt = Options(**{k: v for k, v in base.items()
                     if k not in ("use_att",)})
    opt.use_att = base["use_att"]
    ds = SyntheticDataset(num_images=10, vocab_size=15, seq_length=6,
                          fc_feat_size=12, att_feat_size=12, max_K=5)
    return DataLoader(opt, dataset=ds, prefetch=prefetch)


def test_prefetcher_stream_matches_direct():
    a = make(prefetch=False)
    b = make(prefetch=True)
    for _ in range(4):
        da = a.get_batch("train")
        db = b.get_batch("train")
        np.testing.assert_array_equal(da["labels"], db["labels"])
        np.testing.assert_allclose(da["fc_feats"], db["fc_feats"])
        assert [i["id"] for i in da["infos"]] == [i["id"] for i in db["infos"]]
    b.close()


def test_epoch_wrap_shuffles_train():
    ld = make()
    order_before = list(ld.split_ix["train"])
    seen = []
    for _ in range(4):  # 6 train images / batch 4 -> wraps
        data = ld.get_batch("train")
        seen.append(data["bounds"]["wrapped"])
    assert any(seen)
    # val order never shuffles
    ld.get_batch("val")
    assert ld.split_ix["val"] == sorted(ld.split_ix["val"])


def test_label_masks_plus_two():
    ld = make()
    data = ld.get_batch("train")
    labels, masks = data["labels"], data["masks"]
    nonzeros = (labels != 0).sum(1)
    np.testing.assert_array_equal(masks.sum(1), nonzeros + 2)
    assert labels[:, 0].sum() == 0  # zero start column


def test_static_att_padding():
    ld = make(max_att_len=9)
    data = ld.get_batch("train")
    assert data["att_feats"].shape[1] == 9
    assert data["att_masks"] is not None  # never collapses when static


def test_flickr_image_key(tmp_path):
    """flickr datasets key features by filename stem (ref dataloader.py:255-258)."""
    import json
    from cooperativeimagecaptioning_tpu.data.sources import FileDataset
    from cooperativeimagecaptioning_tpu.config import Options
    info = {"ix_to_word": {"1": "a"},
            "images": [{"id": 5, "split": "train",
                        "file_path": "flickr30k-images/12345.jpg"}]}
    with open(tmp_path / "info.json", "w") as f:
        json.dump(info, f)
    opt = Options(input_json=str(tmp_path / "info.json"), input_label_h5="none",
                  input_fc_dir=str(tmp_path), input_att_dir=str(tmp_path),
                  dataset="flickr30k")
    ds = FileDataset(opt)
    assert ds.image_key(0) == "12345"
    assert ds.gt_caps_per_image == 5


def test_prefetch_reset_iterator_no_skip():
    """reset_iterator joins the in-flight prefetch worker BEFORE zeroing the
    counter, so the next pass covers the split's head (regression: a racing
    fetch re-advanced the freshly-reset iterator and evals silently skipped
    the first images)."""
    ld = make(prefetch=True)
    val = list(ld.split_ix["val"])
    for _ in range(20):  # interleave fetches and resets to provoke the race
        ld.get_batch("val")
        ld.reset_iterator("val")
        seen = []
        while True:
            d = ld.get_batch("val")
            seen += [i["ix"] for i in d["infos"]]
            if d["bounds"]["wrapped"]:
                break
        assert sorted(set(seen[: len(val)])) == sorted(val)
        ld.reset_iterator("val")
    ld.close()


def test_prefetch_propagates_fetch_errors():
    """A failing fetch surfaces at get_batch() instead of killing the worker
    silently and hanging the consumer."""
    ld = make(prefetch=True)

    def boom(split, spi):
        raise OSError("corrupt feature file")
    ld._fetch_one = boom
    try:
        ld.get_batch("train")
        assert False, "expected the fetch error to propagate"
    except OSError as e:
        assert "corrupt" in str(e)
    ld.close()


def test_prefetch_batch_size_change():
    """get_batch(split, batch_size) with a new size must not serve stale
    prefetched batches of the old size."""
    ld = make(prefetch=True)
    assert ld.get_batch("train", 4)["labels"].shape[0] == 4 * ld.seq_per_img
    assert ld.get_batch("train", 2)["labels"].shape[0] == 2 * ld.seq_per_img
    ld.close()


def test_prefetch_resume_state_tracks_consumed_not_fetched():
    """With the prefetcher ahead, checkpoints must record the CONSUMED
    iterator state: the live attributes run up to depth+1 batches ahead, and
    saving those made resume skip data (and a wrap-time shuffle recorded
    early desynchronized split_ix from the recorded position)."""
    import time
    from cooperativeimagecaptioning_tpu.config import Options
    from cooperativeimagecaptioning_tpu.data.loader import DataLoader
    from cooperativeimagecaptioning_tpu.data.sources import SyntheticDataset
    opt = Options(batch_size=4, seq_per_img=1, prefetch_batches=3)
    ds = SyntheticDataset(num_images=40, vocab_size=20, seq_length=6,
                          fc_feat_size=8, att_feat_size=8, max_K=3)
    ld = DataLoader(opt, dataset=ds, prefetch=True)
    data = ld.get_batch("train")
    for _ in range(50):  # let the worker run ahead
        if ld.iterators["train"] > 4:
            break
        time.sleep(0.05)
    it, six = ld.resume_state()
    assert it["train"] == 4, it           # exactly one batch consumed
    assert ld.iterators["train"] > 4      # live state is ahead
    # consumed indices match the recorded order's head
    got = [i["ix"] for i in data["infos"]]
    assert got == six["train"][:4] if six is not None else True
    # a second consumed batch advances the consumed view by one batch
    ld.get_batch("train")
    it2, _ = ld.resume_state()
    assert it2["train"] == 8, it2
    ld.close()


def test_prefetch_seq_per_img_switch_invalidates():
    """Eval's rank pass flips loader.seq_per_img; in-flight prefetched
    batches built with the old value must be dropped, not served."""
    ld = make(prefetch=True)
    d = ld.get_batch("train")
    assert d["labels"].shape[0] == 4 * 2
    ld.seq_per_img = 1
    d = ld.get_batch("train")
    assert d["labels"].shape[0] == 4 * 1, d["labels"].shape
    # and back again
    ld.seq_per_img = 2
    d = ld.get_batch("train")
    assert d["labels"].shape[0] == 4 * 2
    ld.close()


def test_resume_state_per_split_consumed_merge():
    """Consuming a val batch (checkpoint eval) must not clobber the train
    entries of the consumed view with live fetch-ahead state."""
    import time
    ld = make(prefetch=True, prefetch_batches=3)
    ld.get_batch("train")                  # consume exactly one train batch
    for _ in range(100):                   # let the worker run ahead
        if ld.iterators["train"] != 4:
            break
        time.sleep(0.02)
    ld.get_batch("val")                    # a checkpoint-eval style read
    it, _ = ld.resume_state()
    assert it["train"] == 4, it            # not the live fetch-ahead value
    assert it["val"] == 4 % len(ld.split_ix["val"]) or it["val"] == 4, it
    ld.close()


def test_resume_state_order_survives_unconsumed_wrap():
    """A wrap-time shuffle that only the prefetch worker has seen (fetched,
    not consumed) must not leak into resume_state: the recorded order must
    stay the one the consumed position indexes into."""
    import time
    ld = make(prefetch=True, prefetch_batches=4)
    order0 = list(ld.split_ix["train"])    # 6 train images: wrap at batch 2
    data = ld.get_batch("train")           # consume batch 1 only
    for _ in range(200):                   # worker crosses the wrap
        if ld._six_version["train"] > 0:
            break
        time.sleep(0.02)
    assert ld._six_version["train"] > 0, "prefetcher never crossed the wrap"
    it, six = ld.resume_state()
    assert it["train"] == 4
    assert six["train"] == order0, "post-shuffle order leaked into resume"
    assert [i["ix"] for i in data["infos"]] == six["train"][:4]
    ld.close()
