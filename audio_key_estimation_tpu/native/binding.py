"""ctypes bindings for the C++ audio runtime (libakx.so).

Builds on demand with `make` if the shared object is missing (gated — falls
back cleanly to the pure-numpy decoder in data/audio_io.py when no compiler
is available). pybind11 is not in this environment; the C ABI + ctypes keeps
the binding dependency-free.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import warnings
from typing import Optional

_DIR = os.path.dirname(os.path.abspath(__file__))
_SO = os.path.join(_DIR, "libakx.so")
_lib: Optional[ctypes.CDLL] = None
_tried = False


def _declare(lib: ctypes.CDLL) -> ctypes.CDLL:
    lib.akx_decode_wav.restype = ctypes.c_void_p
    lib.akx_decode_wav.argtypes = [ctypes.c_char_p]
    lib.akx_decode_mp3.restype = ctypes.c_void_p
    lib.akx_decode_mp3.argtypes = [ctypes.c_char_p]
    lib.akx_samples.restype = ctypes.POINTER(ctypes.c_float)
    lib.akx_samples.argtypes = [ctypes.c_void_p]
    lib.akx_num_samples.restype = ctypes.c_int64
    lib.akx_num_samples.argtypes = [ctypes.c_void_p]
    lib.akx_sample_rate.restype = ctypes.c_int
    lib.akx_sample_rate.argtypes = [ctypes.c_void_p]
    lib.akx_error.restype = ctypes.c_char_p
    lib.akx_error.argtypes = [ctypes.c_void_p]
    lib.akx_free.argtypes = [ctypes.c_void_p]

    lib.akx_pool_create.restype = ctypes.c_void_p
    lib.akx_pool_create.argtypes = [ctypes.c_int]
    lib.akx_pool_destroy.argtypes = [ctypes.c_void_p]
    lib.akx_pool_submit.argtypes = [ctypes.c_void_p, ctypes.c_int64,
                                    ctypes.c_char_p]
    lib.akx_pool_poll.restype = ctypes.c_void_p
    lib.akx_pool_poll.argtypes = [ctypes.c_void_p]
    lib.akx_result_id.restype = ctypes.c_int64
    lib.akx_result_id.argtypes = [ctypes.c_void_p]
    lib.akx_result_ok.restype = ctypes.c_int
    lib.akx_result_ok.argtypes = [ctypes.c_void_p]
    lib.akx_result_samples.restype = ctypes.POINTER(ctypes.c_float)
    lib.akx_result_samples.argtypes = [ctypes.c_void_p]
    lib.akx_result_num_samples.restype = ctypes.c_int64
    lib.akx_result_num_samples.argtypes = [ctypes.c_void_p]
    lib.akx_result_sample_rate.restype = ctypes.c_int
    lib.akx_result_sample_rate.argtypes = [ctypes.c_void_p]
    lib.akx_result_error.restype = ctypes.c_char_p
    lib.akx_result_error.argtypes = [ctypes.c_void_p]
    lib.akx_result_free.argtypes = [ctypes.c_void_p]

    lib.akx_ingest_batch.restype = ctypes.c_int64
    lib.akx_ingest_batch.argtypes = [
        ctypes.POINTER(ctypes.c_char_p), ctypes.c_int64,
        ctypes.POINTER(ctypes.c_int16), ctypes.c_int64, ctypes.c_int64,
        ctypes.c_int,
        ctypes.POINTER(ctypes.c_int64), ctypes.POINTER(ctypes.c_int32),
        ctypes.POINTER(ctypes.c_uint8)]
    return lib


def load_library(build_if_missing: bool = True) -> Optional[ctypes.CDLL]:
    global _lib, _tried
    if _lib is not None:
        return _lib
    if _tried:
        # one attempt per process: a stale .so with a broken toolchain
        # would otherwise re-spawn a failing `make` (up to 120 s) on every
        # call in the per-file decode hot path
        return None
    _tried = True
    srcs = [os.path.join(_DIR, f) for f in
            ("akx_native.cpp", "akx_mp3.cpp", "akx_decoded.h",
             "akx_mp3_tables.h")]
    stale = (not os.path.exists(_SO)
             or any(os.path.exists(s)
                    and os.path.getmtime(s) > os.path.getmtime(_SO)
                    for s in srcs))
    if stale and build_if_missing:
        try:
            subprocess.run(["make", "-C", _DIR, "-sB"], check=True,
                           capture_output=True, timeout=120)
        except Exception as e:
            if not os.path.exists(_SO):
                return None
            # the stale .so may load with all symbols resolving yet behave
            # per the OLD source — make that failure mode loud (ADVICE r2)
            warnings.warn(
                f"libakx.so is older than akx_native.cpp and the rebuild "
                f"failed ({e!r}); proceeding with the STALE library — its "
                f"behavior may not match the current source",
                RuntimeWarning, stacklevel=2)
    if not os.path.exists(_SO):
        return None
    try:
        _lib = _declare(ctypes.CDLL(_SO))
    except (OSError, AttributeError):  # missing .so or outdated symbols
        return None
    return _lib


def native_available() -> bool:
    return load_library() is not None
