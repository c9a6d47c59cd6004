"""docs/FLAGS.md stays in sync with the config registry (config._FLAGS),
and the registry's own invariants hold for every documented flag."""

import os

from scripts.gen_flags_doc import render, _groups_from_source

from cooperativeimagecaptioning_tpu import config

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_flags_doc_in_sync():
    with open(os.path.join(REPO, "docs", "FLAGS.md")) as f:
        committed = f.read()
    assert committed == render(), (
        "docs/FLAGS.md is stale — run python scripts/gen_flags_doc.py")


def test_groups_cover_every_flag_once():
    names = [n for _, ns in _groups_from_source() for n in ns]
    assert sorted(names) == sorted(f[0] for f in config._FLAGS)
    assert len(names) == len(set(names))


def test_tpu_additions_grouped_last():
    groups = _groups_from_source()
    tpu = [i for i, (t, _) in enumerate(groups) if "TPU-native" in t]
    assert tpu == [len(groups) - 1]
