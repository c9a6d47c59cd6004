"""Label/vocab and n-gram preprocessing parity with reference semantics."""

import json
import pickle

import numpy as np
import pytest

from cooperativeimagecaptioning_tpu.preprocess import labels as L
from cooperativeimagecaptioning_tpu.preprocess import ngrams as NG


def karpathy_json(tmp_path, n_imgs=6):
    rng = np.random.RandomState(0)
    words = ["a", "man", "dog", "rides", "bike", "red", "park", "rareword1",
             "rareword2"]
    imgs = []
    for i in range(n_imgs):
        sents = []
        for _ in range(rng.randint(2, 4)):
            toks = list(rng.choice(words[:7], rng.randint(3, 8)))
            if rng.rand() < 0.3:
                toks.append(words[7 + rng.randint(2)])  # rare words -> UNK
            sents.append({"tokens": toks})
        imgs.append({"sentences": sents, "cocoid": 1000 + i,
                     "split": ["train", "val", "test"][i % 3],
                     "filepath": "val2014", "filename": f"img{i}.jpg"})
    # make common words frequent enough to cross the >5 threshold
    for i in range(n_imgs):
        imgs[i]["sentences"].append(
            {"tokens": ["a", "man", "dog", "rides", "bike", "red", "park"]})
    path = tmp_path / "dataset.json"
    with open(path, "w") as f:
        json.dump({"images": imgs}, f)
    return str(path), imgs


def test_prepro_labels_artifacts(tmp_path):
    h5py = pytest.importorskip("h5py")
    src, imgs = karpathy_json(tmp_path)
    out_json = str(tmp_path / "cocotalk.json")
    out_h5 = str(tmp_path / "cocotalk_label.h5")
    info = L.prepro_labels(src, out_json, out_h5, max_length=16,
                           word_count_threshold=5)
    assert "UNK" in info["ix_to_word"].values()
    with h5py.File(out_h5) as f:
        lab = f["labels"][:]
        s, e = f["label_start_ix"][:], f["label_end_ix"][:]
    # 1-indexed inclusive pointers, per-image caption counts line up
    assert s[0] == 1
    n_caps = [len(im["sentences"]) for im in imgs]
    np.testing.assert_array_equal(e - s + 1, n_caps)
    assert lab.max() <= len(info["ix_to_word"])
    assert lab.shape[1] == 16


def test_prepro_labels_threshold_unk():
    imgs = [{"sentences": [{"tokens": ["common"] * 7 + ["rare"]}]}]
    vocab = L.build_vocab(imgs, count_thr=5)
    assert vocab == ["common", "UNK"]
    assert imgs[0]["final_captions"][0][-1] == "UNK"


def test_prepro_ngrams_pickle_contract(tmp_path):
    src, imgs = karpathy_json(tmp_path)
    out_json = str(tmp_path / "cocotalk.json")
    out_h5 = str(tmp_path / "cocotalk_label.h5")
    pytest.importorskip("h5py")
    L.prepro_labels(src, out_json, out_h5)
    out = str(tmp_path / "coco-train")
    ref_len = NG.prepro_ngrams(src, out_json, out, split="train")
    with open(out + "-idxs.p", "rb") as f:
        pkl = pickle.load(f)
    assert pkl["ref_len"] == ref_len
    df = pkl["document_frequency"]
    # every key is a tuple of id-strings ending possibly with '0' (<eos>)
    ks = list(df.keys())
    assert all(isinstance(k, tuple) for k in ks)
    assert any(k[-1] == "0" for k in ks if len(k) >= 1)
    # usable by the CiderD cached-df mode
    from cooperativeimagecaptioning_tpu.rewards.cider_d import CiderD
    scorer = CiderD(df="coco-train", df_path=out + "-idxs.p")
    gts = {0: ["3 4 5 0"]}
    res = [{"image_id": 0, "caption": ["3 4 5 0"]}]
    mean, scores = scorer.compute_score(gts, res)
    assert scores[0] > 0


def test_prepro_cli_mains(tmp_path):
    """The standalone prepro CLIs (ref: preprocess/prepro_{labels,ngrams}.py
    argparse mains): labels stem gets '_label.h5' appended like the
    reference, and the ngram CLI consumes the labels CLI's dict json."""
    h5py = pytest.importorskip("h5py")
    src, imgs = karpathy_json(tmp_path)
    out_json = str(tmp_path / "talk.json")
    stem = str(tmp_path / "talk")
    L.main(["--input_json", src, "--output_json", out_json,
            "--output_h5", stem, "--dataset", "coco"])
    assert (tmp_path / "talk_label.h5").is_file()
    with open(out_json) as f:
        talk = json.load(f)
    assert talk["images"][0]["id"] == 1000

    pkl_stem = str(tmp_path / "df")
    NG.main(["--input_json", src, "--dict_json", out_json,
             "--output_pkl", pkl_stem, "--split", "train"])
    for suffix in ("-words.p", "-idxs.p"):
        with open(pkl_stem + suffix, "rb") as f:
            pkl = pickle.load(f)
        assert pkl["ref_len"] > 0 and len(pkl["document_frequency"]) > 0


def test_prepro_labels_flickr_out_json(tmp_path):
    """--dataset flickr30k: id = imgid, file_path = split/filename
    (ref prepro_labels.py:171-175)."""
    src, imgs = karpathy_json(tmp_path)
    # flickr jsons carry imgid, no filepath
    with open(src) as f:
        data = json.load(f)
    for i, img in enumerate(data["images"]):
        img["imgid"] = 7000 + i
        img.pop("filepath")
    with open(src, "w") as f:
        json.dump(data, f)
    out_json = str(tmp_path / "f30k.json")
    L.prepro_labels(src, out_json, str(tmp_path / "f30k_label.h5"),
                    dataset="flickr30k")
    with open(out_json) as f:
        talk = json.load(f)
    assert talk["images"][0]["id"] == 7000
    assert talk["images"][0]["file_path"] == "train/img0.jpg"


def test_host_resize_matches_jax_image_resize():
    """The host numpy resize (one compile per raw resolution avoided) must
    reproduce jax.image.resize(method='bilinear') incl. the anti-aliased
    downsampling kernel."""
    import numpy as np
    import jax
    import jax.numpy as jnp
    from cooperativeimagecaptioning_tpu.preprocess.feats import \
        _resize_bilinear
    rng = np.random.RandomState(3)
    for (h, w, s) in ((37, 53, 64), (64, 64, 32), (100, 40, 48)):
        img = rng.rand(h, w, 3).astype(np.float32)
        got = _resize_bilinear(img, s)
        want = np.asarray(jax.image.resize(
            jnp.asarray(img), (s, s, 3), method="bilinear"))
        np.testing.assert_allclose(got, want, atol=1e-4)
