"""Prefetching DataLoader over fixed-record datasets (native C++ backend).

The reference has no data subsystem (SURVEY.md §5: IO is np.save/np.load
only).  Training on TPU needs host-side batch assembly hidden behind device
compute, so batches are gathered by the native loader's worker threads
(native/src/loader.cpp) over an mmap'd record file — the ctypes call
releases the GIL, so the next batches materialize while JAX dispatches the
current step.  Without a C++ toolchain everything falls back to a NumPy
gather with identical semantics (including the shuffle order, which is
always produced by the same Fisher-Yates/mt19937_64 stream).

Dataset format (``save_dataset`` / ``DataLoader``): ``<path>.bin`` holds n
fixed-size records — the per-item bytes of every field concatenated — and
``<path>.json`` the field metadata.  One permutation therefore shuffles all
fields in lockstep.
"""

from __future__ import annotations

import ctypes
import json
import os
import tempfile
from typing import TYPE_CHECKING

import numpy as np

import minidiff_tpu as md
from minidiff_tpu import native

if TYPE_CHECKING:
    from typing import Any, Dict, Iterator, Optional, Sequence, Tuple


def _field_meta(name: str, arr: np.ndarray) -> "Dict[str, Any]":
    return {
        "name": name,
        "dtype": str(arr.dtype),
        "shape": list(arr.shape[1:]),
        "item_bytes": int(arr.dtype.itemsize * int(np.prod(arr.shape[1:], dtype=np.int64))),
    }


def save_dataset(path: str, **fields: np.ndarray) -> str:
    """Write aligned arrays as one record file + JSON header; returns path.

    Every field must share the leading (item) dimension.  Record i is the
    concatenation of each field's item-i bytes, so a single index gather
    fetches a full training example.
    """
    if not fields:
        raise ValueError("save_dataset needs at least one field")
    arrays = {k: np.ascontiguousarray(v) for k, v in fields.items()}
    n = next(iter(arrays.values())).shape[0]
    if n == 0:
        raise ValueError("save_dataset needs at least one item")
    for k, v in arrays.items():
        if v.shape[0] != n:
            raise ValueError(f"field {k!r} has {v.shape[0]} items, expected {n}")
    metas = [_field_meta(k, v) for k, v in arrays.items()]
    # per-item byte rows, horizontally concatenated across fields
    rows = [
        v.reshape(n, -1).view(np.uint8).reshape(n, m["item_bytes"])
        for v, m in zip(arrays.values(), metas)
    ]
    packed = rows[0] if len(rows) == 1 else np.hstack(rows)
    packed.tofile(path + ".bin")
    with open(path + ".json", "w") as f:
        json.dump({"n_items": int(n), "fields": metas}, f)
    return path


class DataLoader:
    """Iterate (optionally shuffled) batches of md.Tensors over a dataset.

    ``source`` is either a dataset path from ``save_dataset`` or a dict of
    aligned numpy arrays (packed to a temporary dataset automatically).
    Each epoch re-shuffles deterministically from (seed, epoch); iterate the
    loader once per epoch.  Yields dicts {field: Tensor}.
    """

    def __init__(
        self,
        source: "Any",
        batch_size: int,
        shuffle: bool = True,
        seed: int = 0,
        num_threads: int = 2,
        capacity: int = 4,
        drop_last: bool = False,
    ):
        self._tmp = None
        if isinstance(source, dict):
            self._tmp = tempfile.NamedTemporaryFile(
                prefix="mdd_", suffix="", delete=False
            )
            self._tmp.close()
            source = save_dataset(self._tmp.name, **source)
        with open(source + ".json") as f:
            header = json.load(f)
        self.path = source
        self.n_items = int(header["n_items"])
        self.fields = header["fields"]
        self.item_bytes = sum(m["item_bytes"] for m in self.fields)
        self.batch_size = int(batch_size)
        self.shuffle = shuffle
        self.seed = int(seed)
        self.drop_last = drop_last
        self.epoch = 0

        self._lib = native.load_library()
        self._handle = None
        if self._lib is not None:
            self._handle = self._lib.ld_open(
                (source + ".bin").encode(), self.n_items, self.item_bytes,
                self.batch_size, int(num_threads), int(capacity),
                self.seed, int(bool(shuffle)), int(bool(drop_last)),
            )
        if self._handle is None:
            # NumPy fallback: same record layout, same shuffle stream
            self._records = np.fromfile(
                source + ".bin", dtype=np.uint8
            ).reshape(self.n_items, self.item_bytes)

    # -- the shuffle stream shared by both paths: mt19937_64 Fisher-Yates,
    # matching native/src/loader.cpp::ld_start_epoch exactly --
    @staticmethod
    def _permutation(n: int, seed: int, epoch: int) -> np.ndarray:
        perm = np.arange(n, dtype=np.uint64)
        rng = _MT19937_64(seed + 0x9E3779B97F4A7C15 * (epoch + 1))
        for i in range(n - 1, 0, -1):
            j = int(rng.next() % (i + 1))
            perm[i], perm[j] = perm[j], perm[i]
        return perm

    def __len__(self) -> int:
        if self.drop_last:
            return self.n_items // self.batch_size
        return (self.n_items + self.batch_size - 1) // self.batch_size

    def _split(self, flat: np.ndarray, count: int) -> "Dict[str, md.Tensor]":
        rows = flat.reshape(count, self.item_bytes)
        out = {}
        off = 0
        for m in self.fields:
            chunk = rows[:, off:off + m["item_bytes"]]
            arr = np.ascontiguousarray(chunk).view(np.dtype(m["dtype"]))
            arr = arr.reshape(count, *m["shape"])
            out[m["name"]] = md.Tensor(arr)
            off += m["item_bytes"]
        return out

    def __iter__(self) -> "Iterator[Dict[str, md.Tensor]]":
        # Eager setup (NOT a generator body): each __iter__ claims the shared
        # native handle immediately; a still-active previous generator would
        # otherwise silently start yielding the NEW epoch's batches
        # (ld_start_epoch resets the claim/deliver counters it reads from).
        epoch = self.epoch
        self.epoch += 1
        self._iter_token = token = getattr(self, "_iter_token", 0) + 1
        if self._handle is not None:
            self._lib.ld_start_epoch(self._handle, epoch)
            return self._native_iter(token)
        return self._fallback_iter(epoch)

    def _native_iter(self, token: int) -> "Iterator[Dict[str, md.Tensor]]":
        buf = ctypes.create_string_buffer(self.batch_size * self.item_bytes)
        for _ in range(len(self)):
            if self._iter_token != token:
                raise RuntimeError(
                    "DataLoader: this iterator was invalidated by a newer "
                    "__iter__() on the same loader (the native prefetcher "
                    "supports one active epoch at a time)"
                )
            count = self._lib.ld_next(self._handle, buf)
            if count <= 0:
                break
            flat = np.frombuffer(
                buf, dtype=np.uint8, count=int(count) * self.item_bytes
            ).copy()
            yield self._split(flat, int(count))

    def _fallback_iter(self, epoch: int) -> "Iterator[Dict[str, md.Tensor]]":
        # independent per-iterator state: concurrent fallback iterators are
        # safe (each owns its permutation)
        order = (
            self._permutation(self.n_items, self.seed, epoch)
            if self.shuffle else np.arange(self.n_items, dtype=np.uint64)
        )
        for start in range(0, len(self) * self.batch_size, self.batch_size):
            idx = order[start:start + self.batch_size].astype(np.int64)
            if len(idx) == 0:
                break
            yield self._split(self._records[idx].ravel(), len(idx))

    @property
    def native(self) -> bool:
        """True when batches come from the C++ prefetcher."""
        return self._handle is not None

    def close(self) -> None:
        if self._handle is not None:
            self._lib.ld_close(self._handle)
            self._handle = None
        if self._tmp is not None:
            for suffix in (".bin", ".json"):
                try:
                    os.unlink(self._tmp.name + suffix)
                except OSError:
                    pass
            try:
                os.unlink(self._tmp.name)
            except OSError:
                pass
            self._tmp = None

    def __enter__(self) -> "DataLoader":
        return self

    def __exit__(self, *exc: "Any") -> None:
        self.close()

    def __del__(self) -> None:
        try:
            self.close()
        except Exception:
            pass


class _MT19937_64:
    """Minimal mt19937_64 (the C++ <random> engine) so the NumPy fallback
    reproduces the native loader's shuffle order bit-for-bit."""

    N, M = 312, 156
    MATRIX_A = 0xB5026F5AA96619E9
    UPPER = 0xFFFFFFFF80000000
    LOWER = 0x7FFFFFFF
    MASK = 0xFFFFFFFFFFFFFFFF

    def __init__(self, seed: int):
        self.mt = [0] * self.N
        self.mt[0] = seed & self.MASK
        for i in range(1, self.N):
            self.mt[i] = (
                6364136223846793005 * (self.mt[i - 1] ^ (self.mt[i - 1] >> 62)) + i
            ) & self.MASK
        self.mti = self.N

    def next(self) -> int:
        if self.mti >= self.N:
            for i in range(self.N):
                x = (self.mt[i] & self.UPPER) | (self.mt[(i + 1) % self.N] & self.LOWER)
                xa = x >> 1
                if x & 1:
                    xa ^= self.MATRIX_A
                self.mt[i] = self.mt[(i + self.M) % self.N] ^ xa
            self.mti = 0
        y = self.mt[self.mti]
        self.mti += 1
        y ^= (y >> 29) & 0x5555555555555555
        y ^= (y << 17) & 0x71D67FFFEDA60000
        y ^= (y << 37) & 0xFFF7EEE000000000
        y ^= y >> 43
        return y & self.MASK
