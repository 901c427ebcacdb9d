"""Native (C++) runtime components, bound via ctypes.

The reference is pure Python end to end (SURVEY.md §0: no native code
anywhere); its performance-bearing kernels borrow NumPy/CuPy C cores.  In
this framework the *compute* path is XLA/Pallas — the native layer instead
covers the runtime around it, starting with the prefetching data loader
(src/loader.cpp).

The shared library is compiled on first use with the system toolchain and
cached next to the sources keyed by a source hash, so a checkout works
without a build step.  Everything degrades gracefully: if no C++ compiler
is available, ``load_library()`` returns None and callers fall back to
NumPy implementations.
"""

from __future__ import annotations

import ctypes
import hashlib
import os
import subprocess
import threading
from typing import TYPE_CHECKING

if TYPE_CHECKING:
    from typing import Optional

_SRC_DIR = os.path.join(os.path.dirname(__file__), "src")
_BUILD_DIR = os.path.join(os.path.dirname(__file__), "_build")
_SOURCES = ["loader.cpp", "tokenizer.cpp"]

_lock = threading.Lock()
_lib: "Optional[ctypes.CDLL]" = None
_tried = False


def _source_hash() -> str:
    h = hashlib.sha256()
    for name in _SOURCES:
        with open(os.path.join(_SRC_DIR, name), "rb") as f:
            h.update(f.read())
    return h.hexdigest()[:16]


def _compile(so_path: str) -> bool:
    srcs = [os.path.join(_SRC_DIR, s) for s in _SOURCES]
    cmd = [
        "g++", "-O3", "-std=c++17", "-shared", "-fPIC", "-pthread",
        *srcs, "-o", so_path,
    ]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=120)
        return True
    except Exception:
        return False


def load_library() -> "Optional[ctypes.CDLL]":
    """The native library, building it on first call; None if unavailable."""
    global _lib, _tried
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        os.makedirs(_BUILD_DIR, exist_ok=True)
        so_path = os.path.join(_BUILD_DIR, f"libminidiff_{_source_hash()}.so")
        if not os.path.exists(so_path) and not _compile(so_path):
            return None
        try:
            lib = ctypes.CDLL(so_path)
        except OSError:
            return None

        lib.ld_open.restype = ctypes.c_void_p
        lib.ld_open.argtypes = [
            ctypes.c_char_p, ctypes.c_uint64, ctypes.c_uint64,
            ctypes.c_uint32, ctypes.c_uint32, ctypes.c_uint32,
            ctypes.c_uint64, ctypes.c_int, ctypes.c_int,
        ]
        lib.ld_num_batches.restype = ctypes.c_uint64
        lib.ld_num_batches.argtypes = [ctypes.c_void_p]
        lib.ld_start_epoch.restype = ctypes.c_int
        lib.ld_start_epoch.argtypes = [ctypes.c_void_p, ctypes.c_uint64]
        lib.ld_next.restype = ctypes.c_longlong
        lib.ld_next.argtypes = [ctypes.c_void_p, ctypes.c_char_p]
        lib.ld_close.restype = None
        lib.ld_close.argtypes = [ctypes.c_void_p]

        lib.tok_train.restype = ctypes.c_void_p
        lib.tok_train.argtypes = [
            ctypes.c_char_p, ctypes.c_uint64, ctypes.c_uint32,
        ]
        lib.tok_from_merges.restype = ctypes.c_void_p
        lib.tok_from_merges.argtypes = [
            ctypes.POINTER(ctypes.c_uint32), ctypes.c_uint32,
        ]
        lib.tok_num_merges.restype = ctypes.c_uint32
        lib.tok_num_merges.argtypes = [ctypes.c_void_p]
        lib.tok_get_merges.restype = None
        lib.tok_get_merges.argtypes = [
            ctypes.c_void_p, ctypes.POINTER(ctypes.c_uint32),
        ]
        lib.tok_encode.restype = ctypes.c_uint64
        lib.tok_encode.argtypes = [
            ctypes.c_void_p, ctypes.c_char_p, ctypes.c_uint64,
            ctypes.POINTER(ctypes.c_uint32),
        ]
        lib.tok_decode.restype = ctypes.c_uint64
        lib.tok_decode.argtypes = [
            ctypes.c_void_p, ctypes.POINTER(ctypes.c_uint32),
            ctypes.c_uint64, ctypes.c_char_p,
        ]
        lib.tok_free.restype = None
        lib.tok_free.argtypes = [ctypes.c_void_p]

        _lib = lib
        return _lib


def available() -> bool:
    return load_library() is not None
