"""Persistent autotune-decision cache: fingerprinting + merge semantics.

No reference counterpart (the reference delegates kernel choice to
NumPy/CuPy, SURVEY §0); this covers the repo's own durability bar:
decisions must not survive kernel-source changes, and concurrent
processes must not clobber each other's entries.
"""

from __future__ import annotations

import json
import os

import pytest

from minidiff_tpu.kernels import tunecache


@pytest.fixture()
def cache_dir(tmp_path, monkeypatch):
    monkeypatch.setenv("MINIDIFF_TPU_TUNE_CACHE", str(tmp_path))
    tunecache._LOADED.clear()
    tunecache._FPRINTS.clear()
    tunecache._DIRTY.clear()
    yield tmp_path
    tunecache._LOADED.clear()
    tunecache._FPRINTS.clear()
    tunecache._DIRTY.clear()


def test_roundtrip_and_tuple_decode(cache_dir):
    key = ("nn", 512, 512, 512, "float32", "float32")
    hit, _ = tunecache.lookup("matmul", key)
    assert not hit
    tunecache.record("matmul", key, [512, 512, 512])
    # fresh-process view: drop the in-memory layer, re-read from disk
    tunecache._LOADED.clear()
    hit, dec = tunecache.lookup("matmul", key)
    assert hit and dec == (512, 512, 512)
    # False and "composed" are legitimate persisted decisions
    tunecache.record("matmul", ("k2",), False)
    tunecache.record("matmul", ("k3",), "composed")
    tunecache._LOADED.clear()
    assert tunecache.lookup("matmul", ("k2",)) == (True, False)
    assert tunecache.lookup("matmul", ("k3",)) == (True, "composed")


def test_kernel_source_change_invalidates(cache_dir):
    tunecache.record("matmul", ("k",), True)
    f = tunecache._file("matmul")
    assert os.path.exists(f)
    # simulate a kernel edit in a later process: the stored fingerprint no
    # longer matches the source hash
    d = json.load(open(f))
    d["__fingerprint__"] = "stale-fingerprint"
    json.dump(d, open(f, "w"))
    tunecache._LOADED.clear()
    hit, _ = tunecache.lookup("matmul", ("k",))
    assert not hit  # stale decisions are discarded wholesale


def test_concurrent_process_entries_merge(cache_dir):
    # process A loads (empty), process B records its key, then A records
    # a different key: B's entry must survive A's write
    tunecache.lookup("matmul", ("a",))
    loaded_a = dict(tunecache._LOADED["matmul"])
    # "process B": write directly through a second in-memory state
    tunecache._LOADED["matmul"] = {}
    tunecache.record("matmul", ("b",), [128, 128, 128])
    # back to "process A"'s stale snapshot, record its own key
    tunecache._LOADED["matmul"] = loaded_a
    tunecache.record("matmul", ("a",), True)
    tunecache._LOADED.clear()
    assert tunecache.lookup("matmul", ("a",)) == (True, True)
    assert tunecache.lookup("matmul", ("b",)) == (True, (128, 128, 128))


def test_loaded_snapshot_does_not_clobber_fresher_disk(cache_dir):
    # ADVICE r4: a key this process only LOADED (never raced) must not
    # overwrite a concurrent process's fresher verdict when we record an
    # unrelated key of our own.
    tunecache.record("matmul", ("shared",), [128, 128, 128])
    tunecache._LOADED.clear()
    tunecache._DIRTY.clear()
    tunecache.lookup("matmul", ("shared",))  # loads the old verdict
    # "process B" re-races the shared key and persists a fresher verdict
    saved = dict(tunecache._LOADED["matmul"])
    tunecache._LOADED["matmul"] = {}
    tunecache._DIRTY.clear()
    tunecache.record("matmul", ("shared",), [512, 512, 512])
    # back in "process A": record an unrelated key; A's stale loaded copy
    # of ("shared",) must not win over B's fresher one
    tunecache._LOADED["matmul"] = saved
    tunecache._DIRTY.clear()
    tunecache.record("matmul", ("mine",), True)
    tunecache._LOADED.clear()
    assert tunecache.lookup("matmul", ("shared",)) == (
        True, (512, 512, 512))
    assert tunecache.lookup("matmul", ("mine",)) == (True, True)


def test_fingerprint_uses_declared_sources_only(cache_dir):
    # Families declaring TUNE_FINGERPRINT_SOURCES hash exactly those
    # sources; the whole-file fallback fingerprint differs, proving the
    # declaration is actually in effect (an edit outside the declared
    # functions keeps decisions alive).
    for fam in ("matmul", "attention", "layernorm", "xent", "scan"):
        srcs = tunecache._family_sources(fam)
        assert srcs is not None and len(srcs) >= 5, fam
        fp = tunecache._fingerprint(fam)
        # recompute from the declaration alone — must be deterministic
        tunecache._FPRINTS.clear()
        assert tunecache._fingerprint(fam) == fp
    assert tunecache._family_sources("definitely_not_a_family") is None


def test_disabled_cache(monkeypatch):
    monkeypatch.setenv("MINIDIFF_TPU_TUNE_CACHE", "0")
    tunecache._LOADED.clear()
    tunecache.record("matmul", ("k",), True)
    assert tunecache.lookup("matmul", ("k",)) == (False, None)


def test_seed_fallback(cache_dir, tmp_path, monkeypatch):
    """A packaged seed file serves decisions a cold writable cache lacks —
    fingerprint-gated, never merged into record()'s persisted keys."""
    seed_dir = tmp_path / "seed"
    seed_dir.mkdir()
    monkeypatch.setenv("MINIDIFF_TPU_TUNE_SEED", str(seed_dir))
    tunecache._SEED_LOADED.clear()
    key = ("nn", 1024, 1024, 1024, "bfloat16", "bfloat16")
    seed = {repr(key): [256, 256, 512],
            "__fingerprint__": tunecache._fingerprint("matmul")}
    fname = f"matmul_{tunecache._device_tag()}.json"
    (seed_dir / fname).write_text(json.dumps(seed))

    hit, dec = tunecache.lookup("matmul", key)
    assert hit and dec == (256, 256, 512)

    # a fresh race recorded for a DIFFERENT key must not persist the
    # seed-served one (record() writes only this process's dirty keys)
    tunecache.record("matmul", ("other",), False)
    with open(os.path.join(str(cache_dir), fname)) as fh:
        persisted = json.load(fh)
    assert repr(key) not in persisted

    # stale seed (wrong fingerprint) misses
    tunecache._SEED_LOADED.clear()
    tunecache._LOADED.clear()
    seed["__fingerprint__"] = "stale"
    (seed_dir / fname).write_text(json.dumps(seed))
    hit, _ = tunecache.lookup("matmul", ("never-raced",))
    assert not hit
    tunecache._SEED_LOADED.clear()


def test_seed_disabled(cache_dir, monkeypatch):
    monkeypatch.setenv("MINIDIFF_TPU_TUNE_SEED", "0")
    tunecache._SEED_LOADED.clear()
    hit, _ = tunecache.lookup("matmul", ("no-seed",))
    assert not hit
    tunecache._SEED_LOADED.clear()
