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

Staleness control: each file carries a ``__fingerprint__`` entry.  When the
family module declares ``TUNE_FINGERPRINT_SOURCES`` (a tuple of the kernel
functions and candidate tables whose change would invalidate a persisted
verdict), the fingerprint hashes exactly those sources — editing a
docstring, a test helper, or an unrelated kernel in the same file keeps the
family's decisions alive across releases.  Without the declaration it falls
back to hashing the whole module file.  Either way a changed fingerprint
discards the persisted decisions on next load (a decision that still lowers
but is now the SLOW choice would otherwise persist silently forever).

``record`` re-reads the on-disk file before the atomic replace and merges
ONLY the keys this process actually raced (a dirty set) over it, so two
concurrent processes (parallel bench + training job) do not drop — or
overwrite with a stale loaded snapshot — each other's decisions.

Callers must only ``record`` verdicts from races that ran to completion:
a transient failure (device OOM, tunnel hiccup) maps to an in-memory
fallback for this process, never to a persisted decision.

A packaged SEED tier (``kernels/tune_seed/``, see ``_seed_file``) backs
the writable cache: decisions raced on the target device at release time
ship with the package, so a cold process on a fresh machine starts with
zero race compiles.  Seeds are fingerprint-gated like everything else —
an edited kernel silently misses its seed and re-races.  Refresh with
``benchmarks/refresh_tune_seed.py`` after the last kernel change.

No reference counterpart: /root/reference delegates all kernel choice to
NumPy/CuPy (SURVEY §0).
"""

from __future__ import annotations

import hashlib
import importlib
import inspect
import json
import os
import threading

_LOCK = threading.Lock()
_LOADED: dict = {}
_FPRINTS: dict = {}
_DIRTY: dict = {}  # family -> set of key-reprs recorded by THIS process
_SEED_LOADED: dict = {}  # family -> packaged read-only seed decisions

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


def _family_sources(family: str):
    """The declared fingerprint inputs for a family, or None.

    Each element of the module's ``TUNE_FINGERPRINT_SOURCES`` is a callable
    (hashed by its dedented source text) or any other object (hashed by
    ``repr`` — candidate tables, schema tags).  Any failure → None, which
    sends the caller to the whole-file fallback.
    """
    try:
        mod = importlib.import_module(f"minidiff_tpu.kernels.{family}")
        items = getattr(mod, "TUNE_FINGERPRINT_SOURCES", None)
        if items is None:
            return None
        out = []
        for it in items:
            if callable(it):
                out.append(inspect.getsource(it))
            else:
                out.append(repr(it))
        return out
    except Exception:  # pragma: no cover - frozen/odd installs
        return None


def _fingerprint(family: str) -> str:
    """Hash of the family's decision-relevant kernel sources + schema.

    A decision keyed under one fingerprint is discarded when those sources
    change — re-racing is minutes, shipping a stale slow pick is forever.
    Only the DECLARED kernel functions/candidate tables participate (see
    ``_family_sources``), so editing unrelated code in the same module no
    longer wipes a whole family's verdicts every release.
    """
    if family not in _FPRINTS:
        h = hashlib.sha1(_SCHEMA.encode())
        srcs = _family_sources(family)
        if srcs is not None:
            for s in srcs:
                h.update(s.encode())
        else:
            src = os.path.join(os.path.dirname(__file__), f"{family}.py")
            try:
                with open(src, "rb") as fh:
                    h.update(fh.read())
            except Exception:  # pragma: no cover - frozen/odd installs
                h.update(b"no-source")
        _FPRINTS[family] = h.hexdigest()
    return _FPRINTS[family]


def _seed_file(family: str):
    """Packaged READ-ONLY seed decisions (minidiff_tpu/kernels/tune_seed/).

    A cold process on a fresh machine otherwise re-races every kernel —
    each race candidate is a jitted chain compiled through the (slow)
    device tunnel, and the cold-start race bill alone blew the round-4
    driver's bench budget (BENCH_r04 rc=124: ~25 candidate compiles at
    10-20 s each before the headline).  Seeds are populated from a real
    race run on the target device at release time and carry the same
    per-kernel source fingerprints, so a stale seed (edited kernel)
    simply misses and the race runs as before.  ``MINIDIFF_TPU_TUNE_SEED``
    overrides the directory; "" or "0" disables."""
    root = os.environ.get(
        "MINIDIFF_TPU_TUNE_SEED",
        os.path.join(os.path.dirname(__file__), "tune_seed"))
    if root in ("", "0"):
        return None
    return os.path.join(root, f"{family}_{_device_tag()}.json")


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
            # packaged seed fallback (never merged into the writable
            # cache: record() persists only keys THIS process raced)
            if family not in _SEED_LOADED:
                sf = _seed_file(family)
                _SEED_LOADED[family] = (
                    _read_disk(sf, family) if sf else {})
            raw = _SEED_LOADED[family].get(repr(key), _MISS)
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
        dirty = _DIRTY.setdefault(family, set())
        dirty.add(repr(key))
        try:
            os.makedirs(os.path.dirname(f), exist_ok=True)
            # start from the freshest disk contents and overlay ONLY the
            # keys this process raced itself: entries merely loaded at
            # lookup time must not clobber a concurrent process's newer
            # verdicts for keys we never measured
            merged = _read_disk(f, family)
            merged.update({k: d[k] for k in dirty if k in d})
            merged.update(
                {k: v for k, v in d.items() if k not in merged})
            _LOADED[family] = merged
            out = dict(merged)
            out["__fingerprint__"] = _fingerprint(family)
            tmp = f"{f}.{os.getpid()}.tmp"
            with open(tmp, "w") as fh:
                json.dump(out, fh)
            os.replace(tmp, f)
        except Exception:
            pass  # persistence is best-effort; the in-memory cache stands
