"""C++ native library: build + bit-parity with the pure-Python metric tier."""

import numpy as np
import pytest

from cooperativeimagecaptioning_tpu.native import bindings
from cooperativeimagecaptioning_tpu.metrics import meteor, porter, tokenizer

pytestmark = pytest.mark.skipif(not bindings.available(),
                                reason="native build unavailable")

WORDS = ["caresses", "flies", "dies", "mules", "denied", "died", "agreed",
         "owned", "humbled", "sized", "meetings", "stating", "siezing",
         "itemization", "sensational", "traditional", "reference", "colonizer",
         "plotted", "riding", "rides", "horse", "happiness", "relational",
         "conditional", "rational", "valency", "hesitancy", "digitizer",
         "conformably", "radically", "differently", "vilely", "analogously"]


def test_porter_parity():
    for w in WORDS:
        assert bindings.porter_stem(w) == porter.stem(w), w


def test_tokenizer_parity():
    caps = {
        0: [{"caption": "A man, riding; on the dog's back!"}],
        1: [{"caption": "Hello... (world)? It isn't -- really \"fine\"."}],
        2: [{"caption": "Two dogs play:  in the grass."}],
    }
    # force the python fallback for the expectation
    want = {}
    for k, cs in caps.items():
        want[k] = [" ".join(
            t for t in tokenizer.ptb_tokenize_line(c["caption"])
            if t not in tokenizer.PUNCTUATIONS) for c in cs]
    got = bindings.ptb_tokenize(caps)
    assert got == want


def test_meteor_parity():
    rng = np.random.RandomState(0)
    words = ["a", "man", "rides", "riding", "dog", "park", "the", "on",
             "grass", "sits"]
    gts, res = {}, {}
    for i in range(12):
        gts[i] = [" ".join(rng.choice(words, rng.randint(3, 9)))
                  for _ in range(3)]
        res[i] = [" ".join(rng.choice(words, rng.randint(3, 9)))]
    # compute python scores directly (bypassing the native dispatch), using the
    # scorer's key=str id ordering
    per_py = np.array([meteor.sentence_meteor(res[i][0], gts[i])
                       for i in sorted(gts, key=str)])
    m_native, per_native = bindings.meteor(gts, res)
    np.testing.assert_allclose(per_native, per_py, atol=1e-12)


def test_native_npy_npz_readers(tmp_path):
    rng = np.random.RandomState(0)
    fc = rng.randn(2048).astype(np.float32)
    att = rng.randn(5, 7, 2048).astype(np.float32)
    np.save(tmp_path / "101.npy", fc)
    np.savez_compressed(tmp_path / "101.npz", feat=att)
    np.savez(tmp_path / "102.npz", feat=att)  # stored (uncompressed) member
    got_fc = bindings.read_npy(str(tmp_path / "101.npy"))
    np.testing.assert_array_equal(got_fc, fc)
    got_att = bindings.read_npz_feat(str(tmp_path / "101.npz"))
    np.testing.assert_array_equal(got_att, att)
    got_att2 = bindings.read_npz_feat(str(tmp_path / "102.npz"))
    np.testing.assert_array_equal(got_att2, att)


def test_dir_feature_source_uses_native(tmp_path):
    from cooperativeimagecaptioning_tpu.data.sources import DirFeatureSource
    rng = np.random.RandomState(1)
    fc = rng.randn(64).astype(np.float32)
    att = rng.randn(3, 16).astype(np.float32)
    np.save(tmp_path / "7.npy", fc)
    np.savez_compressed(tmp_path / "7.npz", feat=att)
    src_fc = DirFeatureSource(str(tmp_path), ".npy")
    src_att = DirFeatureSource(str(tmp_path), ".npz")
    np.testing.assert_array_equal(src_fc.get("7"), fc)
    np.testing.assert_array_equal(src_att.get("7"), att)


def test_tokenizer_empty_and_trailing_empty_captions():
    """Empty captions (untrained models emit these) must survive batching."""
    caps = {0: [{"caption": ""}], 1: [{"caption": "a man"}],
            2: [{"caption": ""}]}
    out = bindings.ptb_tokenize(caps)
    assert out == {0: [""], 1: ["a man"], 2: [""]}


def test_spice_cpp_parity():
    """C++ SPICE-lite must agree exactly with the Python specification."""
    from cooperativeimagecaptioning_tpu.metrics import spice as pyspice
    cases = [
        ("a young man riding a red bike in the park",
         ["a man rides a bicycle", "the man is on a red bike in a park"]),
        ("two dogs play in the green grass",
         ["dogs playing on grass", "a dog runs through a field"]),
        ("", ["a cat"]),
        ("a painting of the old building hanging on a wall",
         ["an old painting on the wall of a building"]),
        ("woman wearing a blue dress holding an umbrella",
         ["a woman in a blue dress holds an umbrella"]),
    ]
    for hyp, refs in cases:
        want = pyspice.sentence_spice(hyp, refs)
        got = bindings.spice_sentence(hyp, refs)
        for cat in ("All", "Object", "Attribute", "Relation"):
            for k in ("p", "r", "f"):
                assert abs(got[cat][k] - want[cat][k]) < 1e-12, (hyp, cat, k)


def test_tokenizer_parity_fuzz():
    """Random word + punctuation soups: the C++ tokenizer must reproduce the
    Python tier byte-for-byte (quotes, clitics, double dashes, brackets,
    currency/percent, abbreviations)."""
    import random
    rng = random.Random(7)
    pieces = ["a", "man", "dog's", "isn't", "--", "...", "(hello)",
              "\"fine\"", "it;", "two,", "play:", "grass.", "world?",
              "don't", "U.S.", "Mr.", "50%", "$5", "3.14", "#1", "a-b",
              "x--y", "''", "``", "[ok]", "{no}", "he'll", "they're",
              "won't", "&", "@home", "*"]
    for _ in range(500):
        cap = " ".join(rng.choices(pieces, k=rng.randint(0, 10)))
        want = " ".join(t for t in tokenizer.ptb_tokenize_line(cap)
                        if t not in tokenizer.PUNCTUATIONS)
        got = bindings.ptb_tokenize({0: [{"caption": cap}]})[0][0]
        assert got == want, repr(cap)


def test_meteor_parity_fuzz():
    """Random sentences over a stem-heavy vocab (exact + Porter-stem stages
    both fire): native per-image scores must match the Python tier."""
    import random
    rng = random.Random(11)
    words = ["a", "man", "rides", "riding", "dog", "park", "the", "on",
             "grass", "sits", "cat", "running", "ran", "happily", "dogs",
             "parks", "walked", "walk", "jumps", "jumped"]
    for _ in range(150):
        gts = [" ".join(rng.choices(words, k=rng.randint(1, 12)))
               for _ in range(3)]
        res = " ".join(rng.choices(words, k=rng.randint(1, 12)))
        py = meteor.sentence_meteor(res, gts)
        _, per = bindings.meteor({0: gts}, {0: [res]})
        assert abs(per[0] - py) < 1e-12, (res, gts)
