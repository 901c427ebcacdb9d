"""Persistent autotune-decision cache (per device kind, JSON on disk).

Every kernel family races its Pallas candidates against XLA's composed path
once per (shape, dtype, ...) key — but the in-memory decision caches die
with the process, so every fresh process (each bench run, each training
job) pays the full racing cost again: tens of compile-and-measure rounds,
minutes of wall time through a remote-device tunnel.  Decisions are tiny
and stable (the races demand an 8% win margin, far above residual noise),
so they are the right thing to persist, NOT the measurements.

Layout: one JSON file per (family, device kind) under
``$MINIDIFF_TPU_TUNE_CACHE`` (default ``/tmp/minidiff_tpu_tune_cache``;
set to ``0`` to disable).  Keys are ``repr()`` of the family's key tuple;
values are the decision verbatim (bools, ``"composed"``, tile tuples —
JSON lists decode back to tuples).  Files are written atomically
(tmp+rename) and merged under a process lock; a corrupt or unreadable
file degrades to an empty cache, never an error.

Delete the cache directory after kernel changes that could flip a
decision's validity (the real-TPU test tier in tests_tpu/ catches stale
decisions that stop lowering: it re-races from scratch).

No reference counterpart: /root/reference delegates all kernel choice to
NumPy/CuPy (SURVEY §0).
"""

from __future__ import annotations

import json
import os
import threading

_LOCK = threading.Lock()
_LOADED: dict = {}

_MISS = object()


def _root():
    p = os.environ.get("MINIDIFF_TPU_TUNE_CACHE",
                       "/tmp/minidiff_tpu_tune_cache")
    return None if p in ("", "0") else p


def _device_tag() -> str:
    try:
        import jax

        return str(jax.devices()[0].device_kind).replace(" ", "_")
    except Exception:  # pragma: no cover
        return "unknown"


def _file(family: str):
    root = _root()
    if root is None:
        return None
    return os.path.join(root, f"{family}_{_device_tag()}.json")


def _decode(v):
    if isinstance(v, list):
        return tuple(_decode(x) for x in v)
    return v


def lookup(family: str, key) -> tuple:
    """(hit, decision).  ``decision`` may legitimately be None/False."""
    f = _file(family)
    if f is None:
        return False, None
    with _LOCK:
        if family not in _LOADED:
            try:
                with open(f) as fh:
                    _LOADED[family] = json.load(fh)
            except Exception:
                _LOADED[family] = {}
        raw = _LOADED[family].get(repr(key), _MISS)
    if raw is _MISS:
        return False, None
    return True, _decode(raw)


def record(family: str, key, value) -> None:
    f = _file(family)
    if f is None:
        return
    with _LOCK:
        d = _LOADED.setdefault(family, {})
        d[repr(key)] = value
        try:
            os.makedirs(os.path.dirname(f), exist_ok=True)
            tmp = f"{f}.{os.getpid()}.tmp"
            with open(tmp, "w") as fh:
                json.dump(d, fh)
            os.replace(tmp, f)
        except Exception:
            pass  # persistence is best-effort; the in-memory cache stands
