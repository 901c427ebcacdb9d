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
    yield tmp_path
    tunecache._LOADED.clear()
    tunecache._FPRINTS.clear()


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


def test_disabled_cache(monkeypatch):
    monkeypatch.setenv("MINIDIFF_TPU_TUNE_CACHE", "0")
    tunecache._LOADED.clear()
    tunecache.record("matmul", ("k",), True)
    assert tunecache.lookup("matmul", ("k",)) == (False, None)
