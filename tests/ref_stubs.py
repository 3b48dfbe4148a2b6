"""Stub the reference's heavyweight/unavailable deps so model3 imports.

model3.py pulls in vocos / accelerate / torchaudio / ema_pytorch / numba
(via monotonic_align) / librosa (via utils) at import time; none of those
affect the forward math we test. monotonic_align.maximum_path is replaced by
our native C++ kernel so the full VITS forward runs.
"""
import sys
import types

import numpy as np


def install():
    import importlib

    # Modules where the stub must always win, even over a real install:
    #  - monotonic_align: the reference's copy is importable once
    #    /root/reference is on sys.path but needs numba; the stub backed by
    #    our native kernel must provide maximum_path.
    #  - vocos: a real install would make the reference's
    #    Vocos.from_pretrained (model3.py:1293) hit the network.
    FORCE_STUB = ("monotonic_align", "vocos")

    def mod(name, **attrs):
        # never shadow a real install of import-time-only deps: stubbing
        # e.g. accelerate (present in this image) breaks transformers' lazy
        # imports for unrelated tests. FORCE_STUB modules are exempt.
        if name not in sys.modules and name not in FORCE_STUB:
            try:
                return sys.modules.setdefault(
                    name, importlib.import_module(name))
            except Exception:
                # broken-but-present packages (e.g. an ABI-mismatched
                # torchaudio) raise OSError/RuntimeError, not ImportError;
                # fall through to the stub either way.
                pass
        m = types.ModuleType(name)
        for k, v in attrs.items():
            setattr(m, k, v)
        if name in FORCE_STUB:
            sys.modules[name] = m
        else:
            sys.modules.setdefault(name, m)
        return sys.modules[name]

    class _Dummy:
        def __init__(self, *a, **k):
            pass

        @classmethod
        def from_pretrained(cls, *a, **k):
            return cls()

    mod("vocos", Vocos=_Dummy)
    mod("torchaudio", load=None, save=None)
    mod("torchaudio.transforms", Resample=_Dummy, MelSpectrogram=_Dummy,
        Spectrogram=_Dummy)
    sys.modules["torchaudio"].transforms = sys.modules["torchaudio.transforms"]
    mod("accelerate", Accelerator=_Dummy,
        DistributedDataParallelKwargs=_Dummy)
    mod("ema_pytorch", EMA=_Dummy)
    mod("librosa")
    mod("librosa.core")

    # monotonic_align backed by our native kernel
    import torch
    from diff_vits_tpu.ops.mas_native import maximum_path_native

    def maximum_path(neg_cent, mask):
        device, dtype = neg_cent.device, neg_cent.dtype
        nc = neg_cent.detach().cpu().numpy().astype(np.float32)
        t_ys = mask.sum(1)[:, 0].cpu().numpy().astype(np.int32)
        t_xs = mask.sum(2)[:, 0].cpu().numpy().astype(np.int32)
        path = maximum_path_native(nc, t_ys, t_xs)
        return torch.from_numpy(path).to(device=device, dtype=dtype)

    mod("monotonic_align", maximum_path=maximum_path)
