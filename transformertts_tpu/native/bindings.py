"""ctypes bindings + on-demand build for the C++ npz batch loader.

The shared library is compiled once (g++ -O3) into the package directory (or
$TTS_NATIVE_CACHE).  Everything degrades gracefully: if no toolchain or the
npz files are deflate-compressed, callers fall back to the numpy path.
"""

from __future__ import annotations

import ctypes
import logging
import os
import subprocess
import threading
from pathlib import Path

import numpy as np

log = logging.getLogger("transformertts_tpu.native")

_SRC = Path(__file__).parent / "npz_loader.cpp"
_BUILD_LOCK = threading.Lock()
_LIB = None
_LIB_TRIED = False


def _lib_path() -> Path:
    cache = os.environ.get("TTS_NATIVE_CACHE")
    base = Path(cache) if cache else _SRC.parent
    return base / "libnpz_loader.so"


def _build() -> Path | None:
    out = _lib_path()
    if out.exists() and out.stat().st_mtime >= _SRC.stat().st_mtime:
        return out
    cmd = ["g++", "-O3", "-shared", "-fPIC", "-std=c++17", "-pthread",
           str(_SRC), "-o", str(out)]
    try:
        subprocess.run(cmd, check=True, capture_output=True, text=True, timeout=120)
        return out
    except (subprocess.SubprocessError, FileNotFoundError, OSError) as e:
        detail = getattr(e, "stderr", "") or str(e)
        log.warning("native loader build failed (falling back to numpy): %s", detail)
        return None


def _load_lib():
    global _LIB, _LIB_TRIED
    with _BUILD_LOCK:
        if _LIB_TRIED:
            return _LIB
        _LIB_TRIED = True
        path = _build()
        if path is None:
            return None
        lib = ctypes.CDLL(str(path))
        lib.ds_open.restype = ctypes.c_void_p
        lib.ds_open.argtypes = [ctypes.POINTER(ctypes.c_char_p), ctypes.c_int]
        lib.ds_close.argtypes = [ctypes.c_void_p]
        lib.ds_load_batch.restype = ctypes.c_int
        lib.ds_load_batch.argtypes = [
            ctypes.c_void_p,
            ctypes.POINTER(ctypes.c_int32), ctypes.c_int,
            ctypes.c_int, ctypes.c_int, ctypes.c_int,
            ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_float),
            ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_int32),
            ctypes.c_int,
        ]
        _LIB = lib
        return _LIB


def native_available() -> bool:
    return _load_lib() is not None


class NativeBatchLoader:
    """Loads padded (B, bp) phoneme / (B, bm, n_mels) mel batches in C++."""

    def __init__(self, paths: list[str | Path], n_threads: int = 4):
        lib = _load_lib()
        if lib is None:
            raise RuntimeError("native loader unavailable")
        self._lib = lib
        self._paths = [str(p).encode() for p in paths]
        arr = (ctypes.c_char_p * len(self._paths))(*self._paths)
        self._handle = lib.ds_open(arr, len(self._paths))
        self._n_threads = n_threads

    def load_batch(self, indices: np.ndarray, bp: int, bm: int, n_mels: int) -> dict:
        n = len(indices)
        indices = np.ascontiguousarray(indices, np.int32)
        phoneme = np.empty((n, bp), np.int32)
        mel = np.empty((n, bm, n_mels), np.float32)
        p_lens = np.zeros((n,), np.int32)
        m_lens = np.zeros((n,), np.int32)
        errs = self._lib.ds_load_batch(
            self._handle,
            indices.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)), n,
            bp, bm, n_mels,
            phoneme.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            mel.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            p_lens.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            m_lens.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            self._n_threads,
        )
        if errs:
            raise RuntimeError(f"native loader: {errs} item errors in batch")
        return {
            "phoneme": phoneme, "melspec": mel,
            "phoneme_lens": p_lens, "melspec_lens": m_lens,
        }

    def close(self):
        if getattr(self, "_handle", None):
            self._lib.ds_close(self._handle)
            self._handle = None

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass
