"""ctypes bindings for the C++ native library (cic_native.cpp).

Builds libcic_native.so on first use (g++ -O2 -shared -fPIC); every entry point
has a pure-Python fallback in metrics/, so the framework works without a
compiler — the native path is the fast tier used by the language-metric tools
(replacing the reference's Java subprocesses, SURVEY.md §2.4)."""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

_HERE = os.path.dirname(os.path.abspath(__file__))
_SRCS = [os.path.join(_HERE, "cic_native.cpp"),
         os.path.join(_HERE, "cic_io.cpp"),
         os.path.join(_HERE, "cic_spice.cpp")]
_SRC = _SRCS[0]
_SO = os.path.join(_HERE, "libcic_native.so")
_lock = threading.Lock()
_lib = None
_tried = False


def build(force: bool = False) -> bool:
    """Compile the shared library; returns True on success."""
    if os.path.isfile(_SO) and not force and all(
            os.path.getmtime(_SO) >= os.path.getmtime(s) for s in _SRCS):
        return True
    try:
        subprocess.run(
            ["g++", "-O2", "-std=c++17", "-shared", "-fPIC", *_SRCS,
             "-o", _SO, "-lz"],
            check=True, capture_output=True, timeout=120)
        return True
    except Exception:
        return False


def _load():
    global _lib, _tried
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        if not build():
            return None
        lib = ctypes.CDLL(_SO)
        lib.cic_tokenize.argtypes = [ctypes.c_char_p]
        lib.cic_tokenize.restype = ctypes.c_char_p
        lib.cic_meteor.argtypes = [ctypes.c_char_p]
        lib.cic_meteor.restype = ctypes.c_double
        lib.cic_meteor_stats.argtypes = [ctypes.c_char_p,
                                         ctypes.POINTER(ctypes.c_double)]
        lib.cic_meteor_stats.restype = ctypes.c_double
        lib.cic_meteor_corpus.argtypes = [ctypes.POINTER(ctypes.c_double)]
        lib.cic_meteor_corpus.restype = ctypes.c_double
        lib.cic_meteor_configure.argtypes = [ctypes.c_char_p]
        lib.cic_meteor_configure.restype = ctypes.c_int
        lib.cic_porter_stem.argtypes = [ctypes.c_char_p]
        lib.cic_porter_stem.restype = ctypes.c_char_p
        lib.cic_version.restype = ctypes.c_int
        for fn in (lib.cic_read_npy, lib.cic_read_npz_feat):
            fn.argtypes = [ctypes.c_char_p,
                           ctypes.POINTER(ctypes.c_float),
                           ctypes.c_int64,
                           ctypes.POINTER(ctypes.c_int64)]
            fn.restype = ctypes.c_int
        lib.cic_spice.argtypes = [ctypes.c_char_p,
                                  ctypes.POINTER(ctypes.c_double)]
        lib.cic_spice.restype = ctypes.c_int
        lib.cic_spice_configure.argtypes = [ctypes.c_char_p]
        lib.cic_spice_configure.restype = ctypes.c_int
        _lib = lib
        return _lib


def available() -> bool:
    return _load() is not None


def ptb_tokenize(captions_for_image: dict) -> dict:
    """Same contract as metrics.tokenizer.tokenize."""
    lib = _load()
    keys, lines = [], []
    for k, caps in captions_for_image.items():
        for c in caps:
            keys.append(k)
            lines.append(c["caption"].replace("\n", " "))
    payload = "\n".join(lines).encode("utf-8", "replace")
    out_lines = lib.cic_tokenize(payload).decode("utf-8").split("\n") \
        if lines else []
    # the C line loop drops trailing empty lines (e.g. a model emitting an
    # empty caption); pad — tokenize("") == "" so this is exact
    out_lines += [""] * (len(keys) - len(out_lines))
    out = {k: [] for k in captions_for_image}
    for k, line in zip(keys, out_lines):
        out[k].append(line)
    return out


_meteor_cfg = [None]  # last-configured resource serialization


def meteor(gts: dict, res: dict, resources=None):
    """Same contract as metrics.meteor.compute_meteor: per-segment scores +
    the jar's micro-averaged corpus score over summed stats.  `resources`
    (metrics.meteor.MeteorResources) activates the synonym/paraphrase stages
    via cic_meteor_configure; the serialization is cached so repeated corpus
    calls don't re-push the table."""
    import numpy as np
    lib = _load()
    wire = resources.serialize() if resources is not None else ""
    if wire != _meteor_cfg[0]:
        lib.cic_meteor_configure(wire.encode("utf-8", "replace"))
        _meteor_cfg[0] = wire
    ids = sorted(gts.keys(), key=lambda x: str(x))
    scores = []
    total = np.zeros(6)
    out7 = (ctypes.c_double * 7)()
    for i in ids:
        payload = (res[i][0] + "\x02" + "\x01".join(gts[i])).encode(
            "utf-8", "replace")
        scores.append(lib.cic_meteor_stats(payload, out7))
        total += np.asarray(out7[1:7])
    summed = (ctypes.c_double * 6)(*total)
    return float(lib.cic_meteor_corpus(summed)), np.array(scores)


def porter_stem(word: str) -> str:
    lib = _load()
    return lib.cic_porter_stem(word.encode("utf-8")).decode("utf-8")


_scratch = threading.local()


def _scratch_buf(max_elems):
    """Per-thread reusable scratch for the native readers (a fresh 64MB
    np.empty per feature file churned allocations on the loader hot path;
    thread-local because the train and val prefetch workers read
    concurrently).  The readers copy out of it before returning."""
    import numpy as np
    buf = getattr(_scratch, "buf", None)
    if buf is None or buf.size < max_elems:
        buf = _scratch.buf = np.empty(max_elems, np.float32)
    return buf


def read_npy(path: str, max_elems: int = 1 << 24):
    """Native npy reader (f32, C-order).  Returns ndarray or None on
    unsupported input (caller falls back to np.load)."""
    import numpy as np
    lib = _load()
    buf = _scratch_buf(max_elems)
    shape = np.zeros(8, np.int64)
    ndim = lib.cic_read_npy(
        path.encode(), buf.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        max_elems, shape.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)))
    if ndim <= 0:
        return None
    shp = tuple(int(s) for s in shape[:ndim])
    n = int(np.prod(shp))
    return buf[:n].reshape(shp).copy()


_spice_cfg = [None]  # last-pushed synonym serialization


def spice_configure(groups) -> None:
    """Push SPICE synonym groups (iterable of word lists) to the C++ tier;
    metrics.spice keeps this in lockstep with its own table.  Empty clears
    back to exact matching.  Idempotent pushes are skipped."""
    lib = _load()
    if lib is None:
        return
    payload = "\x01".join(" ".join(g) for g in groups)
    if _spice_cfg[0] == payload:
        return
    lib.cic_spice_configure(payload.encode("utf-8", "replace"))
    _spice_cfg[0] = payload


def spice_sentence(hyp: str, refs: list) -> dict:
    """Same contract as metrics.spice.sentence_spice (synonym matching
    follows the last spice_configure push — metrics.spice pushes whenever
    its own table changes)."""
    lib = _load()
    out = (ctypes.c_double * 12)()
    payload = (hyp + "\x02" + "\x01".join(refs)).encode("utf-8", "replace")
    if lib.cic_spice(payload, out) != 0:
        raise ValueError("bad spice payload")
    cats = ("All", "Object", "Attribute", "Relation")
    return {c: {"p": out[3 * i], "r": out[3 * i + 1], "f": out[3 * i + 2]}
            for i, c in enumerate(cats)}


def read_npz_feat(path: str, max_elems: int = 1 << 24):
    """Native npz['feat'] reader (stored or deflated member)."""
    import numpy as np
    lib = _load()
    buf = _scratch_buf(max_elems)
    shape = np.zeros(8, np.int64)
    ndim = lib.cic_read_npz_feat(
        path.encode(), buf.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        max_elems, shape.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)))
    if ndim <= 0:
        return None
    shp = tuple(int(s) for s in shape[:ndim])
    n = int(np.prod(shp))
    return buf[:n].reshape(shp).copy()
