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
(tmp+rename); a corrupt or unreadable file degrades to an empty cache,
never an error.

Staleness control: each file carries a ``__fingerprint__`` entry — a hash
of the kernel family's own source file plus a schema version.  Editing a
kernel module invalidates its persisted decisions automatically on next
load (a decision that still lowers but is now the SLOW choice would
otherwise persist silently forever).  ``record`` re-reads and merges the
on-disk file before the atomic replace, so two concurrent processes
(parallel bench + training job) do not drop each other's decisions.

Callers must only ``record`` verdicts from races that ran to completion:
a transient failure (device OOM, tunnel hiccup) maps to an in-memory
fallback for this process, never to a persisted decision.

No reference counterpart: /root/reference delegates all kernel choice to
NumPy/CuPy (SURVEY §0).
"""

from __future__ import annotations

import hashlib
import json
import os
import threading

_LOCK = threading.Lock()
_LOADED: dict = {}
_FPRINTS: dict = {}

_MISS = object()
_SCHEMA = "2"


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


def _fingerprint(family: str) -> str:
    """Hash of the family's kernel source + schema version.

    A decision keyed under one fingerprint is discarded when the kernel
    module changes — re-racing is minutes, shipping a stale slow pick is
    forever.
    """
    if family not in _FPRINTS:
        h = hashlib.sha1(_SCHEMA.encode())
        src = os.path.join(os.path.dirname(__file__), f"{family}.py")
        try:
            with open(src, "rb") as fh:
                h.update(fh.read())
        except Exception:  # pragma: no cover - frozen/odd installs
            h.update(b"no-source")
        _FPRINTS[family] = h.hexdigest()
    return _FPRINTS[family]


def _read_disk(f: str, family: str) -> dict:
    """Load the on-disk dict iff its fingerprint matches, else empty."""
    try:
        with open(f) as fh:
            d = json.load(fh)
    except Exception:
        return {}
    if d.get("__fingerprint__") != _fingerprint(family):
        return {}
    return {k: v for k, v in d.items() if k != "__fingerprint__"}


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
            _LOADED[family] = _read_disk(f, family)
        raw = _LOADED[family].get(repr(key), _MISS)
    if raw is _MISS:
        return False, None
    return True, _decode(raw)


def record(family: str, key, value) -> None:
    """Persist one completed-race verdict (merge + atomic replace)."""
    f = _file(family)
    if f is None:
        return
    with _LOCK:
        d = _LOADED.setdefault(family, {})
        d[repr(key)] = value
        try:
            os.makedirs(os.path.dirname(f), exist_ok=True)
            # merge entries another process recorded since our load; our
            # own keys win (we just raced them on this device)
            merged = _read_disk(f, family)
            merged.update(d)
            _LOADED[family] = merged
            out = dict(merged)
            out["__fingerprint__"] = _fingerprint(family)
            tmp = f"{f}.{os.getpid()}.tmp"
            with open(tmp, "w") as fh:
                json.dump(out, fh)
            os.replace(tmp, f)
        except Exception:
            pass  # persistence is best-effort; the in-memory cache stands
