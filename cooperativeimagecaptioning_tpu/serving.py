"""Serving: a warm, bucketed captioning service over a trained checkpoint.

Deployment tier (no reference counterpart — the reference serves nothing;
its closest surface is eval.py's batch decode).  TPU-native serving needs
static shapes: every distinct (batch, K) signature would recompile the decode
graph, so requests are padded up to a fixed set of batch buckets (and a fixed
attention length), each bucket compiling exactly once.  Decode runs greedy or
beam (the final-eval protocol is beam 2, ref eval.py:33) in bf16 by default.

Usage:
    svc = CaptioningService.from_run_dir("runs/gumbel_x", beam_size=2)
    svc.warmup()                       # compile all buckets up front
    sentences = svc.caption(fc_feats, att_feats, att_masks)
"""

from __future__ import annotations

import os
import pickle

import numpy as np

import jax
import jax.numpy as jnp

from cooperativeimagecaptioning_tpu import models as model_zoo
from cooperativeimagecaptioning_tpu.ops import decoding
from cooperativeimagecaptioning_tpu.training import checkpoint as ckpt_mod
from cooperativeimagecaptioning_tpu.training import joint
from cooperativeimagecaptioning_tpu.utils import decode_sequence

DEFAULT_BUCKETS = (1, 8, 64, 512, 4096)


class CaptioningService:
    """Stateless jitted decode over fixed batch buckets."""

    def __init__(self, opt, params, vocab, beam_size: int = 0,
                 buckets=DEFAULT_BUCKETS, compute_dtype="bfloat16",
                 max_att_len: int = 0, att_quant: str = "",
                 att_kmajor: int = None):
        self.opt = opt
        self.vocab = vocab
        self.att_quant = att_quant or getattr(opt, "att_quant", "")
        if att_kmajor is not None:
            # serving-time override of the decode layout (+14.5% greedy on
            # v5e; beam paths keep b-major).  opt may be a loaded reference
            # namespace — mutate a private copy either way
            import copy as _copy
            self.opt = opt = _copy.copy(opt)
            opt.att_kmajor = int(att_kmajor)
        self.beam_size = int(beam_size or 0)
        self.buckets = tuple(sorted(buckets))
        self.max_att_len = max_att_len or getattr(opt, "max_att_len", 0) or 36
        self._warned_trunc = False
        self._warned_zero_mask = False
        self.speaker = model_zoo.setup(opt, opt.caption_model,
                                       "caption_model")
        self._dtype = jnp.bfloat16 if compute_dtype == "bfloat16" else \
            jnp.float32
        sp = joint.speaker_view(params, opt)
        self.params = jax.tree.map(
            lambda x: x.astype(self._dtype)
            if hasattr(x, "dtype") and x.dtype == jnp.float32 else x, sp)
        self._fns = {}

    # -- constructors ---------------------------------------------------------
    @classmethod
    def from_run_dir(cls, run_dir, run_id: str = "", model_name: str = None,
                     **kw):
        """Load opt + vocab from infos_<id>.pkl and params from the best (or
        given) model artifact — the artifacts a reference user already has."""
        with open(os.path.join(run_dir, f"infos_{run_id}.pkl"), "rb") as f:
            infos = pickle.load(f)
        import copy
        opt = copy.copy(infos["opt"])
        # the infos opt carries the TRAINING machine's checkpoint_path;
        # restoring must not mkdir (or fail on) that path here — the
        # artifacts live in run_dir on this machine
        opt.checkpoint_path = run_dir
        vocab = infos["vocab"]
        if model_name is None:
            for cand in ("model-best.pth", "alternatingModel.pth",
                         "model.pth"):
                if os.path.isfile(os.path.join(run_dir, cand)) or \
                        os.path.isdir(os.path.join(
                            run_dir, cand[:-4] + ".orbax")):
                    model_name = cand
                    break
            else:
                raise FileNotFoundError(f"no model artifact in {run_dir}")
        path = os.path.join(run_dir, model_name)
        params = joint.init_params(jax.random.PRNGKey(0), opt)
        mgr = ckpt_mod.CheckpointManager(opt)
        restored = mgr._try_restore_tree(params, path)
        if restored is None:
            raise FileNotFoundError(path)
        return cls(opt, restored, vocab, **kw)

    # -- decode programs ------------------------------------------------------
    def _fn(self, bucket: int, use_att: bool):
        key = (bucket, use_att)
        if key not in self._fns:
            opt, spk, m = self.opt, self.speaker, self.beam_size

            quant = self.att_quant

            def run(params, fc, att, att_masks):
                ctx = spk.encode_features(params, fc, att, att_masks)
                if quant == "int8" and hasattr(spk, "quantize_ctx"):
                    ctx = spk.quantize_ctx(ctx)
                elif getattr(self.opt, "att_kmajor", 0) and \
                        hasattr(spk, "kmajor_ctx") and \
                        ctx.get("att_feats") is not None:
                    # greedy +14.5%, beam +22% on v5e (decoding.py barrier)
                    ctx = spk.kmajor_ctx(ctx)
                if m > 1:
                    out = decoding.beam_search(
                        spk, params, ctx, opt.seq_length, m,
                        decoding_constraint=getattr(
                            opt, "decoding_constraint", 0))
                else:
                    out = decoding.sample(
                        spk, params, ctx, opt.seq_length,
                        jax.random.PRNGKey(123), mode="greedy",
                        decoding_constraint=getattr(
                            opt, "decoding_constraint", 0))
                return out.seq
            self._fns[key] = jax.jit(run)
        return self._fns[key]

    def _bucket_for(self, n: int) -> int:
        for b in self.buckets:
            if n <= b:
                return b
        return self.buckets[-1]

    def warmup(self, use_att=None):
        """Compile every bucket up front (serving readiness)."""
        if use_att is None:
            use_att = self.opt.caption_model != "fc"
        for b in self.buckets:
            self._run_bucket(np.zeros((b, self.opt.fc_feat_size), np.float32),
                             np.zeros((b, self.max_att_len,
                                       self.opt.att_feat_size), np.float32)
                             if use_att else None,
                             np.ones((b, self.max_att_len), np.float32)
                             if use_att else None, b)

    def _host_cast(self, x):
        """Cast on HOST before the transfer: bf16 features ship half the
        bytes (the dominant serving cost is host->device feature traffic)."""
        if self._dtype == jnp.bfloat16:
            import ml_dtypes
            return np.asarray(x).astype(ml_dtypes.bfloat16)
        return np.asarray(x, np.float32)

    def _run_bucket(self, fc, att, att_masks, bucket):
        fn = self._fn(bucket, att is not None)
        fc = jnp.asarray(self._host_cast(fc))
        att = jnp.asarray(self._host_cast(att)) if att is not None else None
        am = jnp.asarray(att_masks, jnp.float32) \
            if att_masks is not None else None
        return fn(self.params, fc, att, am)

    # -- public ---------------------------------------------------------------
    def caption_ids(self, fc_feats, att_feats=None, att_masks=None):
        """[n, ...] features -> [n, seq_length] decoded ids (0-padded)."""
        n = int(np.asarray(fc_feats).shape[0])
        if n == 0:
            return np.zeros((0, self.opt.seq_length), np.int32)
        if att_feats is not None and \
                np.asarray(att_feats).shape[1] > self.max_att_len and \
                not self._warned_trunc:
            self._warned_trunc = True
            print(f"warning: truncating attention features "
                  f"{np.asarray(att_feats).shape[1]} -> {self.max_att_len} "
                  f"regions; construct the service with max_att_len= to keep "
                  f"them all")
        b = self._bucket_for(n)

        def pad0(x, to):
            x = np.asarray(x)
            if x.shape[0] == to:
                return x
            return np.concatenate(
                [x, np.zeros((to - x.shape[0],) + x.shape[1:], x.dtype)])

        outs = []
        for start in range(0, n, b):
            chunk = slice(start, min(start + b, n))
            # re-bucket the (possibly small) remainder chunk: padding 4
            # leftover images up to the largest bucket would pay a full
            # max-batch decode for them
            cb = self._bucket_for(min(b, n - start))
            fc = pad0(np.asarray(fc_feats)[chunk], cb)
            att = None
            am = None
            if att_feats is not None:
                a = np.asarray(att_feats)[chunk]
                K = self.max_att_len
                if a.shape[1] < K:
                    a = np.pad(a, ((0, 0), (0, K - a.shape[1]), (0, 0)))
                else:
                    a = a[:, :K]
                att = pad0(a, cb)
                m = np.asarray(att_masks)[chunk] if att_masks is not None \
                    else np.ones(np.asarray(att_feats)[chunk].shape[:2],
                                 np.float32)
                if m.shape[1] < K:
                    m = np.pad(m, ((0, 0), (0, K - m.shape[1])))
                else:
                    m = m[:, :K]
                # a REAL row can end up all-zero too (its valid regions all
                # beyond K after truncation, or a degenerate input) — the
                # masked softmax would emit NaN ids; give such rows their
                # first key back, on a copy so the caller's array is never
                # mutated
                zero_rows = m.sum(axis=1) == 0
                if zero_rows.any():
                    if not self._warned_zero_mask:
                        self._warned_zero_mask = True
                        print("warning: attention mask rows with no valid "
                              "region after truncation; forcing the first "
                              "key valid for those rows")
                    m = m.copy()
                    m[zero_rows, 0] = 1.0
                # filler rows (all-zero masks) need >= 1 valid key for the
                # masked softmax; real rows keep the caller's mask untouched.
                # pad0 copied when filler rows exist, so the write below can
                # never alias the caller's array.
                rows = chunk.stop - chunk.start
                m = pad0(m, cb)
                if rows < cb:
                    m[rows:, 0] = 1.0
                am = m
            seq = np.asarray(self._run_bucket(fc, att, am, cb))
            outs.append(seq[: chunk.stop - chunk.start])
        return np.concatenate(outs, axis=0)

    def caption(self, fc_feats, att_feats=None, att_masks=None):
        """[n, ...] features -> list of n caption strings."""
        ids = self.caption_ids(fc_feats, att_feats, att_masks)
        return decode_sequence(self.vocab, ids)


# ---------------------------------------------------------------------------
# HTTP tier: a dependency-free JSON/npz endpoint over CaptioningService.
# ---------------------------------------------------------------------------

def make_http_server(service, host="127.0.0.1", port=8000):
    """ThreadingHTTPServer over a CaptioningService.

    POST /caption with either
      * Content-Type application/x-npz — an np.savez payload with arrays
        `fc` [n, fc_dim] and optional `att` [n, K, att_dim] / `att_masks`
        [n, K] (the wire format for real feature volumes), or
      * JSON {"fc": [[...]], "att": [[[...]]], "att_masks": [[...]]}
    -> {"captions": [...], "ids": [[...]]}.  GET /healthz -> readiness +
    bucket config.  Decode calls are serialized with a lock (the jitted
    programs are thread-compatible but a single chip serves one batch at a
    time anyway)."""
    import io
    import json
    import threading
    from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

    lock = threading.Lock()

    class Handler(BaseHTTPRequestHandler):
        def _send(self, code, payload):
            body = json.dumps(payload).encode()
            self.send_response(code)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def log_message(self, *a):  # quiet by default
            pass

        def do_GET(self):
            if self.path != "/healthz":
                return self._send(404, {"error": "not found"})
            self._send(200, {"status": "ok",
                             "buckets": list(service.buckets),
                             "beam_size": service.beam_size,
                             "max_att_len": service.max_att_len})

        def do_POST(self):
            if self.path != "/caption":
                return self._send(404, {"error": "not found"})
            n = int(self.headers.get("Content-Length", 0))
            raw = self.rfile.read(n)
            ctype = self.headers.get("Content-Type", "application/json")
            try:
                if "npz" in ctype:
                    z = np.load(io.BytesIO(raw), allow_pickle=False)
                    fc = z["fc"]
                    att = z["att"] if "att" in z.files else None
                    am = z["att_masks"] if "att_masks" in z.files else None
                else:
                    req = json.loads(raw.decode())
                    fc = np.asarray(req["fc"], np.float32)
                    att = np.asarray(req["att"], np.float32) \
                        if req.get("att") is not None else None
                    am = np.asarray(req["att_masks"], np.float32) \
                        if req.get("att_masks") is not None else None
                with lock:
                    ids = service.caption_ids(fc, att, am)
                caps = decode_sequence(service.vocab, ids)
            except Exception as e:  # surface the error to the client
                return self._send(400, {"error": f"{type(e).__name__}: {e}"})
            self._send(200, {"captions": caps, "ids": ids.tolist()})

    return ThreadingHTTPServer((host, port), Handler)


def main(argv=None):
    """python -m cooperativeimagecaptioning_tpu.serving --run_dir D [--port P]"""
    import argparse
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--run_dir", required=True)
    p.add_argument("--run_id", default="")
    p.add_argument("--host", default="127.0.0.1")
    p.add_argument("--port", type=int, default=8000)
    p.add_argument("--beam_size", type=int, default=0)
    p.add_argument("--buckets", type=int, nargs="+",
                   default=list(DEFAULT_BUCKETS))
    p.add_argument("--max_att_len", type=int, default=0)
    p.add_argument("--att_quant", default="")
    p.add_argument("--att_kmajor", type=int, default=None,
                   help="decode-time K-major attention layout "
                        "(+14.5%% greedy on v5e; beam paths keep b-major)")
    p.add_argument("--compute_dtype", default="bfloat16")
    p.add_argument("--warmup", action="store_true",
                   help="compile every bucket before accepting requests")
    a = p.parse_args(argv)
    svc = CaptioningService.from_run_dir(
        a.run_dir, run_id=a.run_id, beam_size=a.beam_size,
        buckets=tuple(a.buckets), compute_dtype=a.compute_dtype,
        max_att_len=a.max_att_len, att_quant=a.att_quant,
        att_kmajor=a.att_kmajor)
    if a.warmup:
        print("warming up buckets...", flush=True)
        svc.warmup()
    srv = make_http_server(svc, a.host, a.port)
    print(f"serving {a.run_dir} on http://{a.host}:{a.port} "
          f"(buckets {svc.buckets}, beam {svc.beam_size})", flush=True)
    srv.serve_forever()


if __name__ == "__main__":
    main()
