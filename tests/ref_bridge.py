"""Import bridge to the upstream reference at /root/reference for parity tests.

The reference targets PyTorch 0.4 / old scipy+skimage; we stub the legacy modules it
imports but never exercises in these tests.  Only used as a numerical oracle — no
reference code is copied into the framework.
"""

import sys
import types

REF = "/root/reference"
_loaded = {}


def _stub(name, **attrs):
    if name in sys.modules:
        return sys.modules[name]
    mod = types.ModuleType(name)
    for k, v in attrs.items():
        setattr(mod, k, v)
    sys.modules[name] = mod
    return mod


def load_reference():
    """Returns dict of reference modules; raises ImportError if unusable."""
    if _loaded:
        return _loaded
    if REF not in sys.path:
        sys.path.insert(0, REF)
    sk = _stub("skimage")
    sk.io = _stub("skimage.io", imread=None)
    sk.transform = _stub("skimage.transform")
    try:
        import scipy  # noqa: F401
        if "scipy.misc" not in sys.modules:
            m = _stub("scipy.misc", imresize=lambda *a, **k: None)
            sys.modules["scipy"].misc = m
    except ImportError:
        _stub("scipy")
        _stub("scipy.misc", imresize=lambda *a, **k: None)
    _stub("lmdb", open=lambda *a, **k: None)
    # cider_diff loads a doc-freq pickle at class-definition time; stub it so the
    # reference models package imports (AlternatingJointModel.py:53)
    _stub("cider")
    _stub("cider.pyciderevalcap")
    _stub("cider.pyciderevalcap.cider_diff")
    _stub("cider.pyciderevalcap.cider_diff.cider", Cider=type("Cider", (), {}))
    import importlib
    _loaded["FCModel"] = importlib.import_module("models.FCModel")
    _loaded["AttModel"] = importlib.import_module("models.AttModel")
    _loaded["VSEFCModel"] = importlib.import_module("models.VSEFCModel")
    _loaded["gumbel"] = importlib.import_module("models.gumbel")
    _loaded["utils"] = importlib.import_module("misc.utils")
    return _loaded


def load_reference_beam_att():
    """Reference AttModel with its torch<=0.3 scalar idioms shimmed so
    `sample_beam` (AttModel.py:150-289) runs on modern torch as the golden
    beam oracle.  Two mechanical transforms, no logic change:
      * `.data[0]` on 0-dim tensors -> `.item()` (0-dim indexing was removed);
      * the done-beam record `'p': beam_logprobs_sum[vix]` -> `.item()`:
        1-D integer indexing returned a float *copy* in torch 0.3, but an
        aliasing 0-dim view today — without the copy, later in-place updates
        of beam_logprobs_sum would silently rewrite recorded scores.
    FCModel.sample_beam is NOT loadable even upstream: it references
    undefined `fc_feats_d` / `self.new_img_embed` (FCModel.py:161-163), so
    the reference could never beam-decode the FC speaker.
    """
    if "AttModelBeam" in _loaded:
        return _loaded["AttModelBeam"]
    load_reference()
    path = REF + "/models/AttModel.py"
    with open(path) as f:
        src = f.read()
    src = src.replace(".data[0]", ".item()")
    src = src.replace("'p': beam_logprobs_sum[vix]}",
                      "'p': beam_logprobs_sum[vix].item()}")
    import importlib.util
    spec = importlib.util.spec_from_loader("models._attmodel_beamshim",
                                           loader=None)
    mod = importlib.util.module_from_spec(spec)
    mod.__file__ = path
    exec(compile(src, path, "exec"), mod.__dict__)
    _loaded["AttModelBeam"] = mod
    return mod


def torch_linear_to_jax(mod):
    """nn.Linear -> {'w': [in, out], 'b': [out]} numpy arrays."""
    import numpy as np
    return {"w": np.asarray(mod.weight.detach().numpy().T),
            "b": np.asarray(mod.bias.detach().numpy())}
