"""Byte-level BPE tokenizer (native C++ core, identical Python fallback).

Completes the text pipeline around the LM family: train merges over a
corpus, encode text to int ids (feed ``md.DataLoader`` / ``TransformerLM``),
decode generated ids back to text.  The C++ core (native/src/tokenizer.cpp)
does training and encoding; the pure-Python fallback implements the SAME
canonical algorithm (most-frequent pair, ties to the smallest pair; encode
by lowest merge rank), so vocabularies transfer bit-for-bit between
machines with and without a toolchain.

Byte-level: ids 0..255 are raw bytes — any string round-trips, no
unknown-token handling needed.
"""

from __future__ import annotations

import ctypes
import json
from typing import TYPE_CHECKING

import numpy as np

from minidiff_tpu import native

if TYPE_CHECKING:
    from typing import Any, List, Optional, Tuple, Union


class BPETokenizer:
    """``BPETokenizer.train(corpus, vocab_size)`` -> encode/decode/save."""

    def __init__(self, merges: "Optional[List[Tuple[int, int]]]" = None):
        self.merges: "List[Tuple[int, int]]" = [
            (int(a), int(b)) for a, b in (merges or [])
        ]
        for i, (a, b) in enumerate(self.merges):
            # a merge may only reference earlier ids — rejects cyclic /
            # forward-referencing tables that would recurse forever
            if not (0 <= a < 256 + i and 0 <= b < 256 + i):
                raise ValueError(
                    f"invalid merge {i}: ({a}, {b}) references a non-earlier id"
                )
        self._lib = native.load_library()
        self._handle = None
        if self._lib is not None and self.merges:
            self._handle = self._make_handle()

    # -- construction ------------------------------------------------------

    def _make_handle(self):
        flat = (ctypes.c_uint32 * (2 * len(self.merges)))()
        for i, (a, b) in enumerate(self.merges):
            flat[2 * i], flat[2 * i + 1] = a, b
        return self._lib.tok_from_merges(flat, len(self.merges))

    @classmethod
    def train(cls, corpus: "Union[str, bytes]", vocab_size: int) -> "BPETokenizer":
        data = corpus.encode("utf-8") if isinstance(corpus, str) else bytes(corpus)
        assert vocab_size >= 256, "byte-level BPE needs vocab_size >= 256"
        lib = native.load_library()
        tok = cls()
        if lib is not None:
            h = lib.tok_train(data, len(data), vocab_size)
            n = lib.tok_num_merges(h)
            flat = (ctypes.c_uint32 * (2 * n))()
            lib.tok_get_merges(h, flat)
            lib.tok_free(h)
            tok.merges = [(flat[2 * i], flat[2 * i + 1]) for i in range(n)]
        else:
            tok.merges = _train_py(data, vocab_size)
        if tok._lib is not None and tok.merges:
            tok._handle = tok._make_handle()
        return tok

    # -- use ---------------------------------------------------------------

    @property
    def vocab_size(self) -> int:
        return 256 + len(self.merges)

    def encode(self, text: "Union[str, bytes]") -> np.ndarray:
        data = text.encode("utf-8") if isinstance(text, str) else bytes(text)
        if not data:
            return np.zeros(0, dtype=np.int32)
        if self._handle is not None:
            out = (ctypes.c_uint32 * len(data))()
            n = self._lib.tok_encode(self._handle, data, len(data), out)
            return np.frombuffer(out, dtype=np.uint32, count=int(n)).astype(
                np.int32
            )
        return np.asarray(_encode_py(data, self.merges), dtype=np.int32)

    def decode(self, ids: "Any") -> str:
        arr = np.asarray(
            ids.detach() if hasattr(ids, "detach") else ids
        ).ravel()
        if arr.size == 0:
            return ""
        if (arr < 0).any() or (arr >= self.vocab_size).any():
            bad = int(arr[(arr < 0) | (arr >= self.vocab_size)][0])
            raise ValueError(
                f"token id {bad} out of range for vocab_size {self.vocab_size}"
            )
        arr = arr.astype(np.uint32)
        if self._handle is not None:
            cids = (ctypes.c_uint32 * arr.size)(*arr.tolist())
            n = self._lib.tok_decode(self._handle, cids, arr.size, None)
            if n == 2 ** 64 - 1:  # defense in depth: native OOV sentinel
                raise ValueError("token id out of range")
            buf = ctypes.create_string_buffer(int(n))
            self._lib.tok_decode(self._handle, cids, arr.size, buf)
            return buf.raw.decode("utf-8", errors="replace")
        out = bytearray()
        for t in arr.tolist():
            out.extend(_expand_py(int(t), self.merges))
        return bytes(out).decode("utf-8", errors="replace")

    # -- persistence -------------------------------------------------------

    def save(self, path: str) -> None:
        with open(path, "w") as f:
            json.dump({"merges": self.merges}, f)

    @classmethod
    def load(cls, path: str) -> "BPETokenizer":
        with open(path) as f:
            return cls(merges=json.load(f)["merges"])

    @property
    def native(self) -> bool:
        return self._handle is not None

    def __del__(self):
        try:
            if self._handle is not None:
                self._lib.tok_free(self._handle)
                self._handle = None
        except Exception:
            pass


# -- pure-Python reference implementation (must match tokenizer.cpp) --------


def _merge_pass(toks: list, pair: tuple, new_id: int) -> list:
    out = []
    i = 0
    while i < len(toks):
        if (i + 1 < len(toks) and toks[i] == pair[0]
                and toks[i + 1] == pair[1]):
            out.append(new_id)
            i += 2
        else:
            out.append(toks[i])
            i += 1
    return out


def _train_py(data: bytes, vocab_size: int) -> list:
    toks = list(data)
    merges: list = []
    while 256 + len(merges) < vocab_size and len(toks) >= 2:
        counts: dict = {}
        for a, b in zip(toks, toks[1:]):
            counts[(a, b)] = counts.get((a, b), 0) + 1
        # most frequent; ties -> smallest pair (matches the C++ std::map scan)
        best, best_n = None, 0
        for pair in sorted(counts):
            if counts[pair] > best_n:
                best, best_n = pair, counts[pair]
        if best_n < 2:
            break
        merges.append((best[0], best[1]))
        toks = _merge_pass(toks, best, 256 + len(merges) - 1)
    return merges


def _encode_py(data: bytes, merges: list) -> list:
    rank = {tuple(p): i for i, p in enumerate(merges)}
    toks = list(data)
    while True:
        best_rank = None
        for a, b in zip(toks, toks[1:]):
            r = rank.get((a, b))
            if r is not None and (best_rank is None or r < best_rank):
                best_rank = r
        if best_rank is None:
            break
        toks = _merge_pass(toks, tuple(merges[best_rank]), 256 + best_rank)
    return toks


def _expand_py(tid: int, merges: list) -> bytes:
    if tid < 256:
        return bytes([tid])
    a, b = merges[tid - 256]
    if a >= tid or b >= tid:  # matches the C++ guard against cycles
        raise ValueError(f"invalid merge table at id {tid}")
    return _expand_py(int(a), merges) + _expand_py(int(b), merges)
