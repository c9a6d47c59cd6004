"""Serving tier: warm bucketed captioning over a trained run dir."""

import os

import numpy as np
import pytest

from test_training import tiny_opt, tiny_dataset
from cooperativeimagecaptioning_tpu.serving import CaptioningService
from cooperativeimagecaptioning_tpu.training.loop import Trainer


@pytest.fixture(scope="module")
def run_dir(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("serve")
    ckpt = str(tmp / "ckpt")
    os.makedirs(ckpt)
    opt = tiny_opt(phase=2, vse_loss_weight=0, caption_loss_weight=1,
                   checkpoint_path=ckpt, load_best_score=0, rank_eval=0,
                   language_eval=0)
    tr = Trainer(opt, dataset=tiny_dataset(opt), verbose=False)
    for _ in range(3):
        tr.train_iteration()
    cwd = os.getcwd()
    os.chdir(tmp)
    try:
        tr.checkpoint_operations()
    finally:
        os.chdir(cwd)
    return ckpt, opt, tr


def test_service_matches_direct_decode(run_dir):
    ckpt, opt, tr = run_dir
    svc = CaptioningService.from_run_dir(ckpt, buckets=(4, 8),
                                         compute_dtype="float32",
                                         max_att_len=6)
    rng = np.random.RandomState(0)
    n = 3  # pads into the 4-bucket
    fc = rng.randn(n, opt.fc_feat_size).astype(np.float32)
    att = rng.randn(n, 6, opt.att_feat_size).astype(np.float32)
    sents = svc.caption(fc, att)
    assert len(sents) == n and all(isinstance(s, str) for s in sents)

    # direct decode on the same params must give the same ids
    import jax
    import jax.numpy as jnp
    from cooperativeimagecaptioning_tpu.ops import decoding
    from cooperativeimagecaptioning_tpu.training import joint
    sp = joint.speaker_view(tr.params, opt)
    ctx = svc.speaker.encode_features(sp, jnp.asarray(fc), jnp.asarray(att),
                                      jnp.ones((n, 6)))
    direct = decoding.sample(svc.speaker, sp, ctx, opt.seq_length,
                             jax.random.PRNGKey(123), mode="greedy").seq
    got = svc.caption_ids(fc, att)
    np.testing.assert_array_equal(got, np.asarray(direct))


def test_service_chunks_large_requests(run_dir):
    ckpt, opt, _ = run_dir
    svc = CaptioningService.from_run_dir(ckpt, buckets=(4,),
                                         compute_dtype="float32",
                                         max_att_len=6)
    rng = np.random.RandomState(1)
    n = 10  # 3 chunks of the 4-bucket
    fc = rng.randn(n, opt.fc_feat_size).astype(np.float32)
    att = rng.randn(n, 6, opt.att_feat_size).astype(np.float32)
    ids = svc.caption_ids(fc, att)
    assert ids.shape[0] == n
    # chunking must not change per-row results
    ids_one = svc.caption_ids(fc[:4], att[:4])
    np.testing.assert_array_equal(ids[:4], ids_one)


def test_service_att_quant(run_dir):
    """int8 att-context serving: same surface, captions still decode, and ids
    match a direct decode over the quantized context."""
    ckpt, opt, tr = run_dir
    svc = CaptioningService.from_run_dir(ckpt, buckets=(4,),
                                         compute_dtype="float32",
                                         max_att_len=6, att_quant="int8")
    rng = np.random.RandomState(3)
    n = 3
    fc = rng.randn(n, opt.fc_feat_size).astype(np.float32)
    att = rng.randn(n, 6, opt.att_feat_size).astype(np.float32)
    sents = svc.caption(fc, att)
    assert len(sents) == n and all(isinstance(s, str) for s in sents)

    import jax
    import jax.numpy as jnp
    from cooperativeimagecaptioning_tpu.ops import decoding
    from cooperativeimagecaptioning_tpu.training import joint
    sp = joint.speaker_view(tr.params, opt)
    ctx = svc.speaker.encode_features(sp, jnp.asarray(fc), jnp.asarray(att),
                                      jnp.ones((n, 6)))
    qctx = svc.speaker.quantize_ctx(ctx)
    direct = decoding.sample(svc.speaker, sp, qctx, opt.seq_length,
                             jax.random.PRNGKey(123), mode="greedy").seq
    np.testing.assert_array_equal(svc.caption_ids(fc, att),
                                  np.asarray(direct))


def test_service_beam_protocol_and_warmup(run_dir):
    ckpt, opt, _ = run_dir
    svc = CaptioningService.from_run_dir(ckpt, beam_size=2, buckets=(4,),
                                         compute_dtype="float32",
                                         max_att_len=6)
    svc.warmup()
    rng = np.random.RandomState(2)
    sents = svc.caption(rng.randn(2, opt.fc_feat_size).astype(np.float32),
                        rng.randn(2, 6, opt.att_feat_size).astype(np.float32))
    assert len(sents) == 2


def test_service_does_not_mutate_caller_masks(run_dir):
    """Full-bucket chunks must not write through to the caller's att_masks
    (regression: m[:, 0] = 1.0 on a numpy view), and real rows' masks are
    respected as given."""
    ckpt, opt, tr = run_dir
    svc = CaptioningService.from_run_dir(ckpt, buckets=(4,),
                                         compute_dtype="float32",
                                         max_att_len=6)
    rng = np.random.RandomState(5)
    n = 4  # == bucket: the no-padding path where pad0 may alias
    fc = rng.randn(n, opt.fc_feat_size).astype(np.float32)
    att = rng.randn(n, 6, opt.att_feat_size).astype(np.float32)
    masks = np.zeros((n, 6), np.float32)
    masks[:, 1:3] = 1.0  # slot 0 deliberately invalid
    snapshot = masks.copy()
    ids = svc.caption_ids(fc, att, masks)
    np.testing.assert_array_equal(masks, snapshot)

    # and the decode honored the caller's mask (slot 0 stays masked):
    import jax
    import jax.numpy as jnp
    from cooperativeimagecaptioning_tpu.ops import decoding
    from cooperativeimagecaptioning_tpu.training import joint
    sp = joint.speaker_view(tr.params, opt)
    ctx = svc.speaker.encode_features(sp, jnp.asarray(fc), jnp.asarray(att),
                                      jnp.asarray(masks))
    direct = decoding.sample(svc.speaker, sp, ctx, opt.seq_length,
                             jax.random.PRNGKey(123), mode="greedy").seq
    np.testing.assert_array_equal(ids, np.asarray(direct))


def test_from_run_dir_ignores_training_checkpoint_path(run_dir, tmp_path):
    """Serving a copied run dir must not mkdir (or require) the training
    machine's checkpoint_path recorded in the infos pickle."""
    import os
    import pickle
    import shutil
    ckpt, opt, _ = run_dir
    copied = str(tmp_path / "copied_run")
    shutil.copytree(ckpt, copied)
    with open(os.path.join(copied, "infos_.pkl"), "rb") as f:
        infos = pickle.load(f)
    stray = str(tmp_path / "machineA" / "does" / "not" / "exist")
    infos["opt"].checkpoint_path = stray
    with open(os.path.join(copied, "infos_.pkl"), "wb") as f:
        pickle.dump(infos, f)
    svc = CaptioningService.from_run_dir(copied, buckets=(4,),
                                         compute_dtype="float32",
                                         max_att_len=6)
    assert not os.path.exists(stray)
    rng = np.random.RandomState(0)
    fc = rng.randn(2, opt.fc_feat_size).astype(np.float32)
    att = rng.randn(2, 6, opt.att_feat_size).astype(np.float32)
    assert len(svc.caption(fc, att)) == 2


def test_http_endpoint(run_dir):
    """POST /caption (json + npz payloads) and GET /healthz over the
    stdlib HTTP tier."""
    import io
    import json
    import threading
    import urllib.request
    from cooperativeimagecaptioning_tpu.serving import make_http_server

    ckpt, opt, _ = run_dir
    svc = CaptioningService.from_run_dir(ckpt, buckets=(4,),
                                         compute_dtype="float32",
                                         max_att_len=6)
    srv = make_http_server(svc, "127.0.0.1", 0)
    port = srv.server_address[1]
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    try:
        base = f"http://127.0.0.1:{port}"
        with urllib.request.urlopen(base + "/healthz") as r:
            h = json.loads(r.read())
        assert h["status"] == "ok" and h["buckets"] == [4]

        rng = np.random.RandomState(0)
        n = 2
        fc = rng.randn(n, opt.fc_feat_size).astype(np.float32)
        att = rng.randn(n, 6, opt.att_feat_size).astype(np.float32)

        req = urllib.request.Request(
            base + "/caption",
            data=json.dumps({"fc": fc.tolist(), "att": att.tolist()}).encode(),
            headers={"Content-Type": "application/json"})
        with urllib.request.urlopen(req) as r:
            out_json = json.loads(r.read())
        assert len(out_json["captions"]) == n

        buf = io.BytesIO()
        np.savez(buf, fc=fc, att=att)
        req = urllib.request.Request(
            base + "/caption", data=buf.getvalue(),
            headers={"Content-Type": "application/x-npz"})
        with urllib.request.urlopen(req) as r:
            out_npz = json.loads(r.read())
        assert out_npz["ids"] == out_json["ids"]

        # malformed request -> 400 with an error message, server survives
        req = urllib.request.Request(
            base + "/caption", data=b"{}",
            headers={"Content-Type": "application/json"})
        try:
            urllib.request.urlopen(req)
            assert False, "expected HTTP 400"
        except urllib.error.HTTPError as e:
            assert e.code == 400 and "error" in json.loads(e.read())
    finally:
        srv.shutdown()


def test_service_empty_request(run_dir):
    ckpt, opt, _ = run_dir
    svc = CaptioningService.from_run_dir(ckpt, buckets=(4,),
                                         compute_dtype="float32",
                                         max_att_len=6)
    out = svc.caption_ids(np.zeros((0, opt.fc_feat_size), np.float32))
    assert out.shape == (0, opt.seq_length)
    assert svc.caption(np.zeros((0, opt.fc_feat_size), np.float32)) == []


def test_service_zero_mask_real_row_stays_finite(run_dir):
    """A REAL row whose mask has no valid region after truncation to
    max_att_len must decode like a first-key-only mask (not NaN), and the
    caller's mask array must come back unmutated."""
    ckpt, opt, _ = run_dir
    svc = CaptioningService.from_run_dir(ckpt, buckets=(4,),
                                         compute_dtype="float32",
                                         max_att_len=6)
    rng = np.random.RandomState(3)
    n = 4
    fc = rng.randn(n, opt.fc_feat_size).astype(np.float32)
    att = rng.randn(n, 8, opt.att_feat_size).astype(np.float32)
    masks = np.zeros((n, 8), np.float32)
    masks[:, 6:] = 1.0  # valid regions all beyond K=6 -> all-zero after trunc
    orig = masks.copy()
    got = svc.caption_ids(fc, att, masks)
    first_key = np.zeros((n, 8), np.float32)
    first_key[:, 0] = 1.0
    want = svc.caption_ids(fc, att, first_key)
    np.testing.assert_array_equal(got, want)
    np.testing.assert_array_equal(masks, orig)
