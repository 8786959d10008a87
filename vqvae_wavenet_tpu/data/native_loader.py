"""ctypes binding for the native C++ data loader (cpp/dataloader.cpp).

Builds the shared library on first use (g++, cached next to the source) and
exposes a Dataset-compatible ``next()`` returning the same
{'x': [B, max_len, 1], 'y': [B, 1, S]} host batches.  Falls back to the
pure-Python Dataset automatically when compilation fails or the corpus
isn't 16 kHz PCM16 (e.g. VCTK's 48 kHz originals) — see
data/datasets.py for that path.
"""
from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional

import numpy as np

_CPP_DIR = os.path.join(os.path.dirname(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__)))), "cpp")
_LIB_PATH = os.path.join(_CPP_DIR, "libvqwavenet_dataloader.so")

_lib = None


def _load_lib():
    global _lib
    if _lib is not None:
        return _lib
    if not os.path.exists(_LIB_PATH):
        src = os.path.join(_CPP_DIR, "dataloader.cpp")
        subprocess.run(
            ["g++", "-O3", "-std=c++17", "-fPIC", "-Wall", "-pthread",
             "-shared", "-o", _LIB_PATH, src],
            check=True, capture_output=True)
    lib = ctypes.CDLL(_LIB_PATH)
    lib.dl_create.restype = ctypes.c_void_p
    lib.dl_create.argtypes = [
        ctypes.c_char_p, ctypes.POINTER(ctypes.c_int32), ctypes.c_int,
        ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int,
        ctypes.c_uint64]
    lib.dl_next.restype = ctypes.c_int
    lib.dl_next.argtypes = [ctypes.c_void_p,
                            ctypes.POINTER(ctypes.c_float),
                            ctypes.POINTER(ctypes.c_int32)]
    lib.dl_destroy.argtypes = [ctypes.c_void_p]
    lib.dl_read_wav.restype = ctypes.c_int64
    lib.dl_read_wav.argtypes = [ctypes.c_char_p,
                                ctypes.POINTER(ctypes.c_float),
                                ctypes.c_int64]
    _lib = lib
    return lib


def native_available() -> bool:
    try:
        _load_lib()
        return True
    except Exception:
        return False


def read_wav_native(path: str) -> Optional[np.ndarray]:
    """Read a 16-bit PCM wav via the native parser; None if unsupported."""
    lib = _load_lib()
    n = lib.dl_read_wav(path.encode(), None, 0)
    if n < 0:
        return None
    out = np.empty(n, np.float32)
    lib.dl_read_wav(path.encode(),
                    out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), n)
    return out


class NativeLoader:
    """Thread-pooled batch producer over absolute wav paths."""

    def __init__(self, files, speaker_ids, num_speakers: int,
                 batch_size: int, max_len: int, num_threads: int = 4,
                 queue_cap: int = 8, seed: int = 0):
        lib = _load_lib()
        self._lib = lib
        self.batch_size = batch_size
        self.max_len = max_len
        self.num_speakers = num_speakers
        joined = "\n".join(files).encode()
        spk = np.asarray(speaker_ids, np.int32)
        self._handle = lib.dl_create(
            joined, spk.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            len(files), batch_size, max_len, num_threads, queue_cap,
            ctypes.c_uint64(seed))
        if not self._handle:
            raise RuntimeError("dl_create failed (file/speaker mismatch)")

    def next(self):
        x = np.empty((self.batch_size, self.max_len), np.float32)
        s = np.empty((self.batch_size,), np.int32)
        ok = self._lib.dl_next(
            ctypes.c_void_p(self._handle),
            x.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            s.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)))
        if not ok:
            raise RuntimeError("native loader stopped")
        y = np.zeros((self.batch_size, 1, self.num_speakers), np.float32)
        y[np.arange(self.batch_size), 0, s] = 1.0
        return {"x": x[..., None], "y": y}

    def stop(self):
        if getattr(self, "_handle", None):
            self._lib.dl_destroy(ctypes.c_void_p(self._handle))
            self._handle = None

    def __del__(self):
        try:
            self.stop()
        except Exception:
            pass
