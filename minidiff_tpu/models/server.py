"""Continuous batching: a slot-based decode server over one compiled step.

Production serving never sees aligned batches — requests arrive and finish
at different times.  ``DecodeServer`` keeps a fixed pool of ``max_batch``
decode slots over ONE batched KV cache and runs every active request
together in a single compiled step program per token; finished slots are
released and re-filled by new requests without touching the others.  All
device programs have static shapes (prompt lengths bucket to multiples of
128), so the server runs exactly two executables at steady state: a
per-bucket slot prefill and the shared batched step.

TPU-idiomatic choices (all shapes static, all positions data):
- per-row cache rows/masks via the one-hot-contraction idiom of
  models/speculative.py (``_write_rows``/``_chunk_step`` are reused
  directly — the batched step IS a c=1 chunk step);
- slot prefill runs the whole prompt as one parallel (flash-eligible)
  forward on a single row, then swaps the row into the batched cache with
  a batch one-hot select (replacing the slot's old cache entirely);
- prompt padding needs no masking: pad rows land at cache positions
  >= the request's length, the read mask is ``l <= pos``, and decode
  overwrites each such row before ``pos`` ever reaches it;
- inactive slots keep decoding garbage into their own (dead) rows — the
  outputs are ignored host-side and the rows are rewritten on reuse, so
  no per-slot branching enters the program.

Greedy outputs are token-for-token identical to running each request
alone through ``generate_compiled`` (the tests' contract).  No reference
counterpart: /root/reference has no serving layer.
"""

from __future__ import annotations

from typing import TYPE_CHECKING

import numpy as np

import minidiff_tpu as md
from minidiff_tpu.models import functional as F
from minidiff_tpu.models.speculative import _chunk_step, _prefill  # noqa: F401

if TYPE_CHECKING:
    from typing import Any, Dict, List, Optional, Sequence

    from minidiff_tpu.models.transformer import TransformerLM

__all__ = ["DecodeServer", "SpeculativeDecodeServer", "SSMDecodeServer"]

_BUCKET = 128


def _is_tensor(x):
    return isinstance(x, md.Tensor)


class _ServerBase:
    """Shared continuous-batching host logic over family-specific device
    programs: subclasses own the per-slot state pytree (`_alloc_state`)
    and the two executables (`_build_prefill(bucket)` / `_build_step`),
    both with the uniform calling convention
    ``fn(params, state, ...) -> (state', tokens)``."""

    def __init__(self, model, params, max_batch: int = 8,
                 window: "Optional[int]" = None, greedy: bool = True,
                 temperature: float = 1.0, top_k: "Optional[int]" = None,
                 top_p: "Optional[float]" = None,
                 min_p: "Optional[float]" = None,
                 eos_id: "Optional[int]" = None,
                 prefill_chunk: "Optional[int]" = None):
        import jax

        import minidiff_tpu.backend as backend

        assert backend.backend_name() == "xla", "DecodeServer needs xla"
        self.model = model
        self.max_batch = max_batch
        self.greedy = greedy
        self.temperature = float(temperature)
        self.top_k = top_k
        self.top_p = top_p
        self.min_p = min_p
        self.eos_id = eos_id
        self._params_raw = jax.tree.map(lambda t: t._data, params,
                                        is_leaf=_is_tensor)
        self.window = self._resolve_window(window)
        self._state = self._alloc_state()
        # host-side slot state
        self._pos = np.zeros(max_batch, np.int64)      # position of last token
        self._tok = np.zeros(max_batch, np.int64)      # last emitted token
        self._free: "List[int]" = list(range(max_batch))
        self._budget = np.zeros(max_batch, np.int64)   # tokens still to emit
        self._out: "Dict[int, list]" = {}
        self._seed = np.zeros(max_batch, np.uint32)
        self._steps = np.zeros(max_batch, np.int64)    # slot-local step count
        self._prefill_cache: dict = {}
        self._step_fn = None
        self._prefixes: "Dict[int, Any]" = {}   # pid -> (rows, length)
        self._next_prefix_id = 0
        self._prefix_fill_cache: dict = {}
        self._prefix_submit_cache: dict = {}
        if prefill_chunk is not None:
            assert prefill_chunk % _BUCKET == 0 and prefill_chunk > 0, (
                "prefill_chunk must be a positive multiple of 128")
        self._prefill_chunk = prefill_chunk
        self._chunk_fill = None

    # -- device programs ---------------------------------------------------

    def _select(self, logits, keys):
        """Next token from (B, V) logits; keys (B, 2) uint32 per row."""
        import jax

        with md.no_grad():
            if self.greedy:
                return md.argmax(logits, axis=-1)
            from minidiff_tpu.models import functional as F

            scaled = logits / max(self.temperature, 1e-6)
            scaled = F.truncate_logits(scaled, top_k=self.top_k,
                                       top_p=self.top_p, min_p=self.min_p)
            import jax.numpy as jnp

            u = jax.vmap(lambda k: jax.random.uniform(
                jax.random.wrap_key_data(k, impl="threefry2x32"),
                (logits.shape[-1],), jnp.float32, 1e-9, 1.0))(keys._data)
            gumbel = md.Tensor(-jnp.log(-jnp.log(u))).astype(scaled.dtype)
            return md.argmax(scaled + gumbel, axis=-1)

    # -- host API ------------------------------------------------------------

    def active(self) -> bool:
        """True while any slot is still decoding (finished-but-uncollected
        slots do not count — they wait for ``collect``)."""
        return any(s not in self._free and self._budget[s] > 0
                   for s in range(self.max_batch))

    def submit(self, prompt: "Sequence[int]", max_new_tokens: int,
               seed: int = 0, prefix: "Optional[int]" = None) -> int:
        """Admit a request into a free slot (raises when the pool is full);
        runs the bucketed prefill and emits the first token.

        ``prefix``: id from :meth:`register_prefix` — the request's tokens
        continue AFTER the registered prefix (shared system prompt); only
        the suffix is prefilled, the prefix KV is reused from the one
        registration-time forward."""
        import jax.numpy as jnp

        if not self._free:
            raise RuntimeError(
                "no free slots — step() until a request finishes and "
                "collect() it (collect releases the slot)")
        prompt = list(prompt)
        s0 = len(prompt)
        assert s0 >= 1 and max_new_tokens >= 1
        if prefix is not None:
            return self._submit_with_prefix(prompt, max_new_tokens, seed,
                                            prefix)
        if self._prefill_chunk is not None and s0 > self._prefill_chunk:
            return self._submit_chunked(prompt, max_new_tokens, seed)
        if self.window is not None:
            assert s0 + max_new_tokens <= self.window
        slot = self._free.pop(0)
        sb = -(-s0 // _BUCKET) * _BUCKET
        if sb not in self._prefill_cache:
            self._prefill_cache[sb] = self._build_prefill(sb)
        padded = np.zeros((1, sb), np.int64)
        padded[0, :s0] = prompt
        self._seed[slot] = np.uint32(seed & 0xFFFFFFFF)
        self._steps[slot] = 0
        kraw = self._fold(slot)
        self._state, nxt = self._prefill_cache[sb](
            self._params_raw, self._state, jnp.asarray(padded),
            jnp.asarray(s0, jnp.int32), jnp.asarray(slot, jnp.int32),
            jnp.asarray(kraw))
        tok = int(np.asarray(nxt)[0])
        self._pos[slot] = s0          # position the new token will occupy
        self._tok[slot] = tok
        self._budget[slot] = max_new_tokens - 1
        self._out[slot] = [tok]
        self._steps[slot] = 1
        if self.eos_id is not None and tok == self.eos_id:
            self._budget[slot] = 0
        return slot

    def register_prefix(self, tokens: "Sequence[int]") -> int:
        raise NotImplementedError(
            f"{type(self).__name__} does not support prefix caching")

    def _submit_with_prefix(self, prompt, max_new_tokens, seed, prefix):
        raise NotImplementedError(
            f"{type(self).__name__} does not support prefix caching")

    def _submit_chunked(self, prompt, max_new_tokens, seed, rows=None,
                        p0: int = 0):
        raise NotImplementedError(
            f"{type(self).__name__} does not support chunked prefill "
            "(prefill_chunk only applies to the transformer DecodeServer)")

    def _fold(self, slot: int) -> np.ndarray:
        """Per-(slot seed, slot step) uint32x2 key material."""
        rng = np.random.default_rng(
            (int(self._seed[slot]), int(self._steps[slot])))
        return np.asarray(rng.integers(0, 2 ** 32, 2), np.uint32)

    def step(self) -> "Dict[int, int]":
        """One batched decode step for every live slot; returns
        {slot: emitted token}.  Slots whose budget hits zero (or emit
        ``eos_id``) auto-release."""
        import jax.numpy as jnp

        if self._step_fn is None:
            self._step_fn = self._build_step()
        live = [s for s in range(self.max_batch)
                if s not in self._free and self._budget[s] > 0]
        if not live:
            return {}
        if self.greedy:  # keys are never read by greedy argmax
            keys = np.zeros((self.max_batch, 2), np.uint32)
        else:
            keys = np.stack([self._fold(s) for s in range(self.max_batch)])
        self._state, nxt = self._step_fn(
            self._params_raw, self._state, jnp.asarray(self._tok),
            jnp.asarray(self._pos), jnp.asarray(keys))
        nxt = np.asarray(nxt)
        emitted: "Dict[int, int]" = {}
        for s in live:
            tok = int(nxt[s])
            emitted[s] = tok
            self._out[s].append(tok)
            self._pos[s] += 1
            self._tok[s] = tok
            self._steps[s] += 1
            self._budget[s] -= 1
            if self.eos_id is not None and tok == self.eos_id:
                self._budget[s] = 0
        return emitted

    def done(self, slot: int) -> bool:
        return self._budget[slot] == 0 and slot in self._out

    def collect(self, slot: int) -> "List[int]":
        """Generated tokens for ``slot`` (first token included).

        Collecting a FINISHED request releases its slot for reuse — a
        slot is never recycled under an uncollected output, so stale
        handles cannot observe another request's tokens."""
        out = list(self._out[slot])
        if self._budget[slot] == 0 and slot not in self._free:
            self._free.append(slot)
        return out


class DecodeServer(_ServerBase):
    """Fixed-slot continuous-batching decode server (transformer family).

    >>> srv = DecodeServer(model, params, max_batch=4, window=1024)
    >>> slot = srv.submit([1, 2, 3], max_new_tokens=64)
    >>> while srv.active():
    ...     for s, tok in srv.step().items():  # one compiled step, all slots
    ...         ...
    >>> tokens = srv.collect(slot)             # slot auto-releases when done

    ``greedy=False`` draws per-step Gumbel-max samples at ``temperature``
    (optional ``top_k``) from a key folded out of (seed, slot-local step) —
    each request's sample stream is deterministic in its submission seed.
    """

    def _resolve_window(self, window):
        w = int(window or self.model.max_seq_len)
        assert w % _BUCKET == 0, "window must be a 128 multiple"
        # positions beyond max_seq_len would clamp the pos_emb gather
        # (silently wrong tokens for non-rope models) — refuse up front
        assert w <= self.model.max_seq_len, (
            f"window {w} exceeds model.max_seq_len "
            f"{self.model.max_seq_len}")
        return w

    def _alloc_state(self):
        import jax.numpy as jnp

        model = self.model
        p_dtype = self._params_raw["tok_emb"].dtype
        kv = model.blocks[0].attn.num_kv_heads
        hd = model.blocks[0].attn.head_dim
        return [
            {"k": jnp.zeros((self.max_batch, kv, self.window, hd), p_dtype),
             "v": jnp.zeros((self.max_batch, kv, self.window, hd), p_dtype)}
            for _ in model.blocks
        ]

    def _build_step(self):
        import jax

        model, L = self.model, self.window

        @jax.jit
        def step(raw_p, caches_raw, toks, pos, keys):
            with md.no_grad():
                p = jax.tree.map(md.Tensor, raw_p)
                caches = jax.tree.map(md.Tensor, caches_raw)
                b = toks.shape[0]
                new_caches, logits = _chunk_step(
                    model, p, caches, md.Tensor(toks).reshape((b, 1)),
                    md.Tensor(pos), L)
                nxt = self._select(logits[:, 0], md.Tensor(keys))
                return (jax.tree.map(lambda t: t._data, new_caches,
                                     is_leaf=_is_tensor), nxt._data)

        return step

    def _build_prefill(self, sb: int):
        """(params, caches, toks (1, sb), length, slot, key) ->
        (caches', first token (1,)): one-row parallel prefill swapped into
        the batched cache by a batch one-hot."""
        import jax
        import jax.numpy as jnp

        model, L, B = self.model, self.window, self.max_batch

        @jax.jit
        def prefill(raw_p, caches_raw, toks, length, slot, key):
            with md.no_grad():
                p = jax.tree.map(md.Tensor, raw_p)
                caches = jax.tree.map(md.Tensor, caches_raw)
                toks_t = md.Tensor(toks)
                s = sb
                pos = md.arange(s)
                x = p["tok_emb"][toks_t]
                if not model.rope:
                    x = x + p["pos_emb"][:s]
                sel_b = (md.arange(B) == md.Tensor(slot)).astype(
                    md.float32)                      # (B,) batch one-hot
                new_caches = []
                for blk, bp, cache in zip(model.blocks, p["blocks"], caches):
                    attn = blk.attn
                    q, kk, vv = F.block_qkv(blk, bp, x, pos)
                    row_k = md.zeros(
                        (1, attn.num_kv_heads, L, attn.head_dim)).astype(
                        cache["k"].dtype)
                    row_v = md.zeros_like(row_k)
                    row_k[:, :, :s, :] = kk.astype(row_k.dtype)
                    row_v[:, :, :s, :] = vv.astype(row_v.dtype)
                    sel = sel_b.reshape((B, 1, 1, 1)).astype(cache["k"].dtype)
                    new_caches.append({
                        "k": cache["k"] * (1.0 - sel) + sel * row_k,
                        "v": cache["v"] * (1.0 - sel) + sel * row_v,
                    })
                    o = md.sdpa(q, attn.expand_kv(kk), attn.expand_kv(vv),
                                causal=True, window=model.window,
                                sinks=model.sinks)
                    x = F.block_finish(blk, bp, x, o)
                x = model.ln_f.apply(p["ln_f"], x)
                logits = model.lm_head(p, x)         # (1, sb, V)
                last = (md.arange(s) == (md.Tensor(length) - 1)).astype(
                    logits.dtype)                    # (sb,) one-hot gather
                lg = md.einsum("j,bjv->bv", last, logits)
                nxt = self._select(lg, md.Tensor(key).reshape((1, 2)))
                return (jax.tree.map(lambda t: t._data, new_caches,
                                     is_leaf=_is_tensor), nxt._data)

        return prefill



    # -- prefix caching (shared system prompts) ------------------------------

    def register_prefix(self, tokens: "Sequence[int]") -> int:
        """Run the shared prefix ONCE and keep its KV rows on device; later
        ``submit(suffix, prefix=pid)`` calls prefill only the suffix.

        The stored rows are one (1, kv, window, hd) cache row per block —
        the memory cost of one extra slot per registered prefix.  Greedy
        outputs remain token-identical to submitting the concatenated
        prompt (the tests' contract)."""
        import jax.numpy as jnp

        tokens = list(tokens)
        p0 = len(tokens)
        assert p0 >= 1
        if self.window is not None:
            assert p0 + 1 < self.window, "prefix leaves no room to decode"
        pb = -(-p0 // _BUCKET) * _BUCKET
        if pb not in self._prefix_fill_cache:
            self._prefix_fill_cache[pb] = self._build_prefix_fill(pb)
        padded = np.zeros((1, pb), np.int64)
        padded[0, :p0] = tokens
        rows = self._prefix_fill_cache[pb](self._params_raw,
                                           jnp.asarray(padded))
        pid = self._next_prefix_id
        self._next_prefix_id += 1
        self._prefixes[pid] = (rows, p0)
        return pid

    def release_prefix(self, pid: int) -> None:
        """Free a registered prefix's device rows."""
        del self._prefixes[pid]

    def _build_prefix_fill(self, pb: int):
        """(params, toks (1, pb)) -> per-block rows {"k","v"} (1,kv,L,hd)
        with the prefix KV written at [0, pb).  Pad garbage at [p0, pb) is
        provably overwritten by the suffix prefill before any live query
        can read it (suffix buckets are >= 128 > pb - p0)."""
        import jax

        model, L = self.model, self.window
        cache_dtype = self._params_raw["tok_emb"].dtype

        @jax.jit
        def fill(raw_p, toks):
            with md.no_grad():
                p = jax.tree.map(md.Tensor, raw_p)
                rows, _ = _prefill(model, p, md.Tensor(toks), L, cache_dtype)
                return jax.tree.map(lambda t: t._data, rows,
                                    is_leaf=_is_tensor)

        return fill

    def _submit_with_prefix(self, prompt, max_new_tokens, seed, prefix):
        rows, p0 = self._prefixes[prefix]
        if (self._prefill_chunk is not None
                and len(prompt) > self._prefill_chunk):
            return self._submit_chunked(prompt, max_new_tokens, seed,
                                        rows=rows, p0=p0)
        return self._finish_submit_rows(rows, p0, prompt, max_new_tokens,
                                        seed)

    # -- chunked prefill -----------------------------------------------------

    def _zero_rows(self):
        """Fresh empty one-row KV per block, (1, kv, window, hd)."""
        import jax.numpy as jnp

        model, L = self.model, self.window
        dt = self._params_raw["tok_emb"].dtype
        kv = model.blocks[0].attn.num_kv_heads
        hd = model.blocks[0].attn.head_dim
        return [{"k": jnp.zeros((1, kv, L, hd), dt),
                 "v": jnp.zeros((1, kv, L, hd), dt)}
                for _ in model.blocks]

    def _build_chunk_fill(self, C: int):
        """(params, rows, toks (1, C), p0) -> rows': one prefill chunk —
        C queries attend over the rows' KV written so far (l <= pos mask)
        plus in-chunk causality, and scatter their own KV at global
        positions p0..p0+C-1.  Logits are discarded; only the tail chunk
        (via the prefix-submit program) selects a token."""
        import jax

        model, L = self.model, self.window

        @jax.jit
        def fill(raw_p, rows_raw, toks, p0):
            with md.no_grad():
                p = jax.tree.map(md.Tensor, raw_p)
                rows = jax.tree.map(md.Tensor, rows_raw)
                new_rows, _ = _chunk_step(
                    model, p, rows, md.Tensor(toks),
                    md.Tensor(p0).reshape((1,)), L)
                return jax.tree.map(lambda t: t._data, new_rows,
                                    is_leaf=_is_tensor)

        return fill

    def _submit_chunked(self, prompt, max_new_tokens, seed, rows=None,
                        p0: int = 0):
        """Prefill a long prompt in fixed ``prefill_chunk``-token pieces.

        Exactly TWO steady-state prefill executables regardless of prompt
        length: the chunk-fill body (shape (1, C) always) and the tail's
        prefix-submit program (per tail bucket).  Per-call device latency
        is bounded by one chunk's attention (C x window), so decode steps
        for other slots can interleave between chunks host-side — the
        chunked-prefill latency contract of modern serving stacks.
        Greedy outputs are token-identical to the dense one-shot prefill
        (the tests' contract).  ``rows``/``p0`` carry an optional cached
        prefix so prefix reuse and chunking compose."""
        import jax.numpy as jnp

        C = self._prefill_chunk
        s0 = len(prompt)
        if self.window is not None:
            assert p0 + s0 + max_new_tokens <= self.window
        n_chunks = -(-s0 // C)
        tail = s0 - C * (n_chunks - 1)           # in [1, C]
        if self._chunk_fill is None:
            self._chunk_fill = self._build_chunk_fill(C)
        if rows is None:
            rows = self._zero_rows()
        for i in range(n_chunks - 1):
            chunk = np.asarray(prompt[i * C:(i + 1) * C],
                               np.int64).reshape(1, C)
            rows = self._chunk_fill(
                self._params_raw, rows, jnp.asarray(chunk),
                jnp.asarray(p0 + i * C, jnp.int32))
        return self._finish_submit_rows(
            rows, p0 + C * (n_chunks - 1), prompt[C * (n_chunks - 1):],
            max_new_tokens, seed)

    def _finish_submit_rows(self, rows, p0, prompt, max_new_tokens, seed):
        """Run ``prompt`` as the final chunk over ``rows`` (prefix KV for
        positions [0, p0)), swap the combined row into the batched cache,
        and emit the request's first token."""
        import jax.numpy as jnp

        s0 = len(prompt)
        assert s0 >= 1, "suffix must contain at least one token"
        if self.window is not None:
            assert p0 + s0 + max_new_tokens <= self.window
        slot = self._free.pop(0)
        sb = -(-s0 // _BUCKET) * _BUCKET
        if sb not in self._prefix_submit_cache:
            self._prefix_submit_cache[sb] = self._build_prefix_submit(sb)
        padded = np.zeros((1, sb), np.int64)
        padded[0, :s0] = prompt
        self._seed[slot] = np.uint32(seed & 0xFFFFFFFF)
        self._steps[slot] = 0
        kraw = self._fold(slot)
        self._state, nxt = self._prefix_submit_cache[sb](
            self._params_raw, self._state, rows, jnp.asarray(padded),
            jnp.asarray(p0, jnp.int32), jnp.asarray(s0, jnp.int32),
            jnp.asarray(slot, jnp.int32), jnp.asarray(kraw))
        tok = int(np.asarray(nxt)[0])
        self._pos[slot] = p0 + s0
        self._tok[slot] = tok
        self._budget[slot] = max_new_tokens - 1
        self._out[slot] = [tok]
        self._steps[slot] = 1
        if self.eos_id is not None and tok == self.eos_id:
            self._budget[slot] = 0
        return slot

    def _build_prefix_submit(self, sb: int):
        """(params, caches, prefix rows, toks (1, sb), p0, s0, slot, key)
        -> (caches', first token (1,)): the suffix runs as ONE chunk step
        over the prefix rows (global positions p0..p0+sb-1, in-chunk
        causality and the prefix KV under one mask predicate), then the
        combined row swaps into the batched cache by a batch one-hot."""
        import jax

        model, L, B = self.model, self.window, self.max_batch

        @jax.jit
        def prefill(raw_p, caches_raw, rows_raw, toks, p0, s0, slot, key):
            with md.no_grad():
                p = jax.tree.map(md.Tensor, raw_p)
                caches = jax.tree.map(md.Tensor, caches_raw)
                rows = jax.tree.map(md.Tensor, rows_raw)
                new_rows, logits = _chunk_step(
                    model, p, rows, md.Tensor(toks),
                    md.Tensor(p0).reshape((1,)), L)     # (1, sb, V)
                sel_b = (md.arange(B) == md.Tensor(slot))
                new_caches = []
                for cache, row in zip(caches, new_rows):
                    sel = sel_b.reshape((B, 1, 1, 1)).astype(
                        cache["k"].dtype)
                    new_caches.append({
                        "k": cache["k"] * (1.0 - sel)
                        + sel * row["k"].astype(cache["k"].dtype),
                        "v": cache["v"] * (1.0 - sel)
                        + sel * row["v"].astype(cache["v"].dtype),
                    })
                last = (md.arange(sb) == (md.Tensor(s0) - 1)).astype(
                    logits.dtype)                       # (sb,) one-hot
                lg = md.einsum("j,bjv->bv", last, logits)
                nxt = self._select(lg, md.Tensor(key).reshape((1, 2)))
                return (jax.tree.map(lambda t: t._data, new_caches,
                                     is_leaf=_is_tensor), nxt._data)

        return prefill


class SpeculativeDecodeServer(DecodeServer):
    """Speculative decoding × continuous batching (VERDICT r4 item 7).

    DecodeServer slots where ``step()`` runs ONE draft-and-verify round
    for every live slot: the draft model proposes ``k`` tokens per row
    from its own batched KV cache, the target verifies all rows in a
    single (k+1)-chunk forward, and each row accepts its longest
    agreeing prefix plus the target's bonus token — per-slot acceptance
    is DATA (the ``_chunk_step`` per-row position/mask idiom), so rows at
    different depths advance at their own pace inside one compiled
    program.  Greedy-only: that is what makes the output token-identical
    to each request's solo speculative (= solo greedy) decode.

    ``step()`` returns ``{slot: [tokens]}`` — one to k+1 tokens per live
    slot per call (the base server's scalar-per-slot contract widens).
    """

    def __init__(self, model, params, draft, draft_params, k: int = 4,
                 **kw):
        import jax

        assert kw.get("greedy", True), (
            "speculative exactness is greedy-only (sampling would need "
            "per-token rejection sampling)")
        assert kw.get("prefill_chunk") is None, (
            "chunked prefill is not composed with the speculative server")
        assert int(k) >= 1
        self.draft = draft
        self.k = int(k)
        self._draft_params_raw = jax.tree.map(
            lambda t: t._data, draft_params, is_leaf=_is_tensor)
        super().__init__(model, params, **kw)
        self._dstate = self._alloc_draft_state()
        self._round_fn = None
        self._dprefill_cache: dict = {}

    def _alloc_draft_state(self):
        import jax.numpy as jnp

        d = self.draft
        dt = self._draft_params_raw["tok_emb"].dtype
        kv = d.blocks[0].attn.num_kv_heads
        hd = d.blocks[0].attn.head_dim
        return [
            {"k": jnp.zeros((self.max_batch, kv, self.window, hd), dt),
             "v": jnp.zeros((self.max_batch, kv, self.window, hd), dt)}
            for _ in d.blocks
        ]

    def submit(self, prompt, max_new_tokens, seed: int = 0, prefix=None):
        import jax.numpy as jnp

        assert prefix is None, (
            "prefix caching is not composed with the speculative server")
        prompt = list(prompt)
        s0 = len(prompt)
        # verification chunks overhang up to k positions past the last
        # emitted token: the cache window and both models' position
        # tables must cover it
        need = s0 + max_new_tokens + self.k
        assert need <= self.window, (need, self.window)
        if not self.draft.rope:
            assert need <= self.draft.max_seq_len, (
                "draft pos_emb too small (+k overhang)")
        slot = super().submit(prompt, max_new_tokens, seed)
        sb = -(-s0 // _BUCKET) * _BUCKET
        if sb not in self._dprefill_cache:
            self._dprefill_cache[sb] = self._build_draft_prefill(sb)
        padded = np.zeros((1, sb), np.int64)
        padded[0, :s0] = prompt
        self._dstate = self._dprefill_cache[sb](
            self._draft_params_raw, self._dstate, jnp.asarray(padded),
            jnp.asarray(slot, jnp.int32))
        return slot

    def _build_draft_prefill(self, sb: int):
        """Prompt prefill for the DRAFT cache row (no token selection —
        the draft only ever continues from target-accepted tokens)."""
        import jax

        model, L, B = self.draft, self.window, self.max_batch

        @jax.jit
        def prefill(raw_p, caches_raw, toks, slot):
            with md.no_grad():
                p = jax.tree.map(md.Tensor, raw_p)
                caches = jax.tree.map(md.Tensor, caches_raw)
                toks_t = md.Tensor(toks)
                s = sb
                pos = md.arange(s)
                x = p["tok_emb"][toks_t]
                if not model.rope:
                    x = x + p["pos_emb"][:s]
                sel_b = (md.arange(B) == md.Tensor(slot)).astype(md.float32)
                new_caches = []
                for blk, bp, cache in zip(model.blocks, p["blocks"],
                                          caches):
                    attn = blk.attn
                    q, kk, vv = F.block_qkv(blk, bp, x, pos)
                    row_k = md.zeros(
                        (1, attn.num_kv_heads, L, attn.head_dim)).astype(
                        cache["k"].dtype)
                    row_v = md.zeros_like(row_k)
                    row_k[:, :, :s, :] = kk.astype(row_k.dtype)
                    row_v[:, :, :s, :] = vv.astype(row_v.dtype)
                    sel = sel_b.reshape((B, 1, 1, 1)).astype(
                        cache["k"].dtype)
                    new_caches.append({
                        "k": cache["k"] * (1.0 - sel) + sel * row_k,
                        "v": cache["v"] * (1.0 - sel) + sel * row_v,
                    })
                    o = md.sdpa(q, attn.expand_kv(kk), attn.expand_kv(vv),
                                causal=True, window=model.window,
                                sinks=model.sinks)
                    x = F.block_finish(blk, bp, x, o)
                return jax.tree.map(lambda t: t._data, new_caches,
                                    is_leaf=_is_tensor)

        return prefill

    def _build_round(self):
        """One speculative round over the whole pool: draft k, verify in
        one chunk, accept per row.  The per-round math is the loop body of
        speculative.generate_speculative_compiled, batched over slots."""
        import jax

        target, draft, L, k = self.model, self.draft, self.window, self.k
        c = k + 1

        @jax.jit
        def round_fn(tp, dp, tc_raw, dc_raw, toks, pos):
            with md.no_grad():
                p_t = jax.tree.map(md.Tensor, tp)
                p_d = jax.tree.map(md.Tensor, dp)
                t_caches = jax.tree.map(md.Tensor, tc_raw)
                d_caches = jax.tree.map(md.Tensor, dc_raw)
                tok = md.Tensor(toks)
                pos_t = md.Tensor(pos)
                b = toks.shape[0]

                drafts = []
                cur = tok
                for j in range(k):
                    d_caches, dl = _chunk_step(
                        draft, p_d, d_caches, cur.reshape((b, 1)),
                        pos_t + j, L)
                    cur = md.argmax(dl[:, 0, :], axis=-1).astype(md.int32)
                    drafts.append(cur)
                # cache-fill d_k at pos+k (full acceptance starts the next
                # round at pos+k+1 — see speculative.py)
                d_caches, _ = _chunk_step(
                    draft, p_d, d_caches, cur.reshape((b, 1)), pos_t + k, L)
                d_toks = md.transpose(md.stack(drafts), axes=(1, 0))

                chunk = md.concat([tok.reshape((b, 1)), d_toks], axis=1)
                t_caches, t_logits = _chunk_step(
                    target, p_t, t_caches, chunk, pos_t, L)
                g = md.argmax(t_logits, axis=-1).astype(md.int32)

                match = (d_toks == g[:, :k]).astype(md.int32)
                pref = md.cumsum(match, axis=1)
                steps_ = md.arange(1, k + 1).astype(md.int32)
                acc = md.sum(
                    (pref == steps_.reshape((1, k))).astype(md.int32),
                    axis=1)
                jvec = md.arange(c).astype(md.int32).reshape((1, c))
                acc_col = acc.reshape((b, 1))
                bonus = md.sum(g * (jvec == acc_col).astype(md.int32),
                               axis=1)
                d_pad = md.concat(
                    [d_toks, md.zeros((b, 1)).astype(md.int32)], axis=1)
                emit = md.where(jvec < acc_col, d_pad,
                                md.broadcast_to(bonus.reshape((b, 1)),
                                                (b, c)))
                return (
                    jax.tree.map(lambda t: t._data, t_caches,
                                 is_leaf=_is_tensor),
                    jax.tree.map(lambda t: t._data, d_caches,
                                 is_leaf=_is_tensor),
                    emit._data, acc._data,
                )

        return round_fn

    def step(self) -> "Dict[int, list]":
        """One speculative round for every live slot; returns
        ``{slot: [emitted tokens]}`` (1..k+1 per slot, budget/eos
        truncated)."""
        import jax.numpy as jnp

        if self._round_fn is None:
            self._round_fn = self._build_round()
        live = [s for s in range(self.max_batch)
                if s not in self._free and self._budget[s] > 0]
        if not live:
            return {}
        self._state, self._dstate, emit, acc = self._round_fn(
            self._params_raw, self._draft_params_raw, self._state,
            self._dstate, jnp.asarray(np.asarray(self._tok), jnp.int32),
            jnp.asarray(np.asarray(self._pos), jnp.int32))
        emit = np.asarray(emit)
        acc = np.asarray(acc)
        emitted: "Dict[int, list]" = {}
        for s in live:
            n_acc = int(acc[s]) + 1
            toks_s = [int(t) for t in emit[s, :min(n_acc, self._budget[s])]]
            if self.eos_id is not None and self.eos_id in toks_s:
                toks_s = toks_s[:toks_s.index(self.eos_id) + 1]
                self._budget[s] = len(toks_s)  # zeroed by the -= below
            self._out[s].extend(toks_s)
            emitted[s] = toks_s
            # the cache advanced by the full acceptance regardless of
            # budget truncation (a finishing slot's rows go dead anyway)
            self._pos[s] += n_acc
            self._tok[s] = int(emit[s, n_acc - 1])
            self._steps[s] += 1
            self._budget[s] -= len(toks_s)
        return emitted


class SSMDecodeServer(_ServerBase):
    """Continuous batching for the Mamba family: the slot state is the
    O(1) recurrent state (per block one (B, d_inner, n) hidden + a
    (B, K-1, d_inner) conv window) — no attention window, no per-request
    length limit, constant HBM per step regardless of context.  Slot
    prefill runs the prompt as ONE ragged parallel scan
    (``MambaLM.prefill(lengths=...)``) and swaps the row in by a batch
    one-hot; the shared step is the already-batched ``MambaLM.step``."""

    def _resolve_window(self, window):
        return None  # no KV window: context length is unbounded

    def _alloc_state(self):
        import jax

        states = self.model.init_state(self.max_batch)
        return jax.tree.map(lambda t: t._data, states, is_leaf=_is_tensor)

    def _build_step(self):
        import jax

        model = self.model

        @jax.jit
        def step(raw_p, states_raw, toks, pos, keys):
            with md.no_grad():
                p = jax.tree.map(md.Tensor, raw_p)
                st = jax.tree.map(md.Tensor, states_raw)
                logits, st2 = model.step(p, st, md.Tensor(toks))
                nxt = self._select(logits, md.Tensor(keys))
                return (jax.tree.map(lambda t: t._data, st2,
                                     is_leaf=_is_tensor), nxt._data)

        return step

    def _build_prefill(self, sb: int):
        import jax

        model, B = self.model, self.max_batch

        @jax.jit
        def prefill(raw_p, states_raw, toks, length, slot, key):
            with md.no_grad():
                p = jax.tree.map(md.Tensor, raw_p)
                st = jax.tree.map(md.Tensor, states_raw)
                lg, rows = model.prefill(
                    p, md.Tensor(toks),
                    lengths=md.Tensor(length).reshape((1,)))
                sel = (md.arange(B) == md.Tensor(slot))
                new_states = []
                for old, new in zip(st, rows):
                    sh = sel.reshape((B, 1, 1)).astype(old["h"].dtype)
                    sc = sel.reshape((B, 1, 1)).astype(old["conv"].dtype)
                    new_states.append({
                        "h": old["h"] * (1.0 - sh) + sh * new["h"],
                        "conv": old["conv"] * (1.0 - sc) + sc * new["conv"],
                    })
                nxt = self._select(lg, md.Tensor(key).reshape((1, 2)))
                return (jax.tree.map(lambda t: t._data, new_states,
                                     is_leaf=_is_tensor), nxt._data)

        return prefill
