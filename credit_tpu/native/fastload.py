"""ctypes bindings + on-demand build for the fastload C++ library.

Codec ids shared with fastload.cpp: 0 raw, 1 zlib, 2 gzip, 3 zstd.
All entry points release the GIL for the whole batch (ctypes calls into
foreign code drop it), so decode threads and the training step overlap.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional, Sequence

import numpy as np

CODEC_RAW, CODEC_ZLIB, CODEC_GZIP, CODEC_ZSTD = 0, 1, 2, 3

_CODEC_BY_ID = {None: CODEC_RAW, "zlib": CODEC_ZLIB, "gzip": CODEC_GZIP,
                "zstd": CODEC_ZSTD}

_STATUS_MSG = {1: "read error", 2: "decode error", 3: "size mismatch",
               4: "unsupported codec", 5: "missing"}

_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_build_failed = False


def _src_dir() -> str:
    return os.path.dirname(os.path.abspath(__file__))


def _build(src: str, out: str) -> bool:
    cmd = ["g++", "-O3", "-shared", "-fPIC", "-std=c++17", "-pthread",
           src, "-o", out, "-lz", "-lzstd"]
    try:
        r = subprocess.run(cmd, capture_output=True, text=True, timeout=120)
    except (OSError, subprocess.TimeoutExpired):
        return False
    return r.returncode == 0 and os.path.exists(out)


def _load() -> Optional[ctypes.CDLL]:
    """Build (if stale) and dlopen the library; None when unavailable."""
    global _lib, _build_failed
    if _lib is not None or _build_failed:
        return _lib
    with _lock:
        if _lib is not None or _build_failed:
            return _lib
        src = os.path.join(_src_dir(), "fastload.cpp")
        out = os.environ.get(
            "CREDIT_TPU_FASTLOAD_SO", os.path.join(_src_dir(), "_fastload.so"))
        try:
            stale = (not os.path.exists(out)
                     or os.path.getmtime(out) < os.path.getmtime(src))
        except OSError:
            stale = True
        if stale and not _build(src, out):
            _build_failed = True
            return None
        try:
            lib = ctypes.CDLL(out)
        except OSError:
            _build_failed = True
            return None
        lib.fl_capabilities.restype = ctypes.c_int32
        lib.fl_decode_batch.restype = ctypes.c_int32
        lib.fl_decode_batch.argtypes = [
            ctypes.c_int64, ctypes.POINTER(ctypes.c_void_p),
            ctypes.POINTER(ctypes.c_int64), ctypes.POINTER(ctypes.c_int32),
            ctypes.POINTER(ctypes.c_void_p), ctypes.POINTER(ctypes.c_int64),
            ctypes.c_int32, ctypes.POINTER(ctypes.c_int32)]
        lib.fl_read_decode_batch.restype = ctypes.c_int32
        lib.fl_read_decode_batch.argtypes = [
            ctypes.c_int64, ctypes.POINTER(ctypes.c_char_p),
            ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_void_p),
            ctypes.POINTER(ctypes.c_int64), ctypes.c_int32,
            ctypes.POINTER(ctypes.c_int32)]
        _lib = lib
        return _lib


def available() -> bool:
    """True when the compiled library is (or can be) loaded."""
    return _load() is not None


def codec_id(compressor: Optional[dict]) -> Optional[int]:
    """Map a zarr compressor dict to a fastload codec id (None: no native
    support — caller should use its Python path)."""
    cid = None if compressor is None else compressor.get("id")
    return _CODEC_BY_ID.get(cid)


def _out_ptrs(outs: Sequence[np.ndarray]):
    n = len(outs)
    dsts = (ctypes.c_void_p * n)()
    dlens = (ctypes.c_int64 * n)()
    for i, o in enumerate(outs):
        assert o.flags["C_CONTIGUOUS"] and o.flags["WRITEABLE"]
        dsts[i] = o.ctypes.data_as(ctypes.c_void_p).value
        dlens[i] = o.nbytes
    return dsts, dlens


def decode_batch(raws: Sequence[bytes], codecs: Sequence[int],
                 outs: Sequence[np.ndarray], n_threads: int = 0) -> None:
    """Decompress n in-memory chunks into preallocated C-contiguous arrays.

    Raises RuntimeError naming the first failed item. Caller guarantees the
    native library is available (check `available()`)."""
    lib = _load()
    assert lib is not None, "fastload unavailable — guard with available()"
    n = len(raws)
    if n == 0:
        return
    # keep byte objects referenced while the C side runs
    srcs = (ctypes.c_void_p * n)()
    slens = (ctypes.c_int64 * n)()
    for i, raw in enumerate(raws):
        srcs[i] = ctypes.cast(ctypes.c_char_p(raw), ctypes.c_void_p).value
        slens[i] = len(raw)
    cods = (ctypes.c_int32 * n)(*codecs)
    dsts, dlens = _out_ptrs(outs)
    status = (ctypes.c_int32 * n)()
    rc = lib.fl_decode_batch(n, srcs, slens, cods, dsts, dlens,
                             n_threads, status)
    if rc != 0:
        i = rc - 1
        raise RuntimeError(
            f"fastload: chunk {i} failed: "
            f"{_STATUS_MSG.get(status[i], status[i])}")


def read_decode_batch(paths: Sequence[str], codecs: Sequence[int],
                      outs: Sequence[np.ndarray],
                      n_threads: int = 0) -> np.ndarray:
    """Read+decompress n local files into preallocated arrays.

    Returns a bool mask of which files existed (missing files leave their
    output untouched — pre-fill with the fill value). Raises on hard
    decode/read failures."""
    lib = _load()
    assert lib is not None, "fastload unavailable — guard with available()"
    n = len(paths)
    found = np.ones(n, dtype=bool)
    if n == 0:
        return found
    cpaths = (ctypes.c_char_p * n)(*[p.encode() for p in paths])
    cods = (ctypes.c_int32 * n)(*codecs)
    dsts, dlens = _out_ptrs(outs)
    status = (ctypes.c_int32 * n)()
    rc = lib.fl_read_decode_batch(n, cpaths, cods, dsts, dlens,
                                  n_threads, status)
    if rc != 0:
        i = rc - 1
        raise RuntimeError(
            f"fastload: {paths[i]}: "
            f"{_STATUS_MSG.get(status[i], status[i])}")
    for i in range(n):
        if status[i] == 5:
            found[i] = False
    return found
