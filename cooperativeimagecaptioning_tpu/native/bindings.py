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
_SRC = os.path.join(_HERE, "cic_native.cpp")
_SO = os.path.join(_HERE, "libcic_native.so")
_lock = threading.Lock()
_lib = None
_tried = False


def build(force: bool = False) -> bool:
    """Compile the shared library; returns True on success."""
    if os.path.isfile(_SO) and not force and \
            os.path.getmtime(_SO) >= os.path.getmtime(_SRC):
        return True
    try:
        subprocess.run(
            ["g++", "-O2", "-std=c++17", "-shared", "-fPIC", _SRC, "-o", _SO],
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
        lib.cic_porter_stem.argtypes = [ctypes.c_char_p]
        lib.cic_porter_stem.restype = ctypes.c_char_p
        lib.cic_version.restype = ctypes.c_int
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
    out = {k: [] for k in captions_for_image}
    for k, line in zip(keys, out_lines):
        out[k].append(line)
    return out


def meteor(gts: dict, res: dict):
    """Same contract as metrics.meteor.compute_meteor."""
    import numpy as np
    lib = _load()
    ids = sorted(gts.keys(), key=lambda x: str(x))
    scores = []
    for i in ids:
        payload = (res[i][0] + "\x02" + "\x01".join(gts[i])).encode(
            "utf-8", "replace")
        scores.append(lib.cic_meteor(payload))
    scores = np.array(scores)
    return float(scores.mean()), scores


def porter_stem(word: str) -> str:
    lib = _load()
    return lib.cic_porter_stem(word.encode("utf-8")).decode("utf-8")
