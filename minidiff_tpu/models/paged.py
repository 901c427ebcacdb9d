"""Paged KV-cache serving: vLLM-style block tables over a shared page pool.

``DecodeServer`` (models/server.py) reserves a dense ``window``-long KV row
per slot — a slot decoding 30 tokens holds the same HBM as one decoding
4096.  ``PagedDecodeServer`` replaces the per-slot rows with ONE pool of
fixed 128-token pages per layer plus a per-slot page table: pages are
allocated on demand (prompt pages at submit, one page each time decode
crosses a 128 boundary) and returned to the pool when the request is
collected.  Total KV memory is ``num_pages`` pages — set below
``max_batch * window/128`` to oversubscribe capacity against the actual
(not worst-case) request lengths, exactly the trade modern serving stacks
make.  Pool exhaustion raises loudly at submit/step; nothing is silently
evicted.

TPU-idiomatic choices (all static shapes; positions and page ids are data):
- the page table is a host numpy array mirrored to the device as a tiny
  ``(max_batch, window/128)`` int32 input each call — page allocation is
  host bookkeeping, never a recompile;
- decode-step KV writes are per-row dynamic-update-slices into the pool
  (``kernels/paged.append_kv``): O(batch) cache lines written per layer,
  never a pool rewrite;
- decode attention runs the fused page-walk kernel
  (``kernels/paged.paged_attention``): the page table rides as scalar
  prefetch, each grid step DMAs exactly one allocated page, and pages
  past a slot's length are elided by index-map clamping — HBM traffic is
  the pool bytes the slot actually holds;
- prefix caching and chunked prefill REUSE the dense server's row
  machinery (the suffix chunk-step over a (1, kv, window, hd) row), then
  scatter the combined row's pages into the pool — compute reuse is
  identical to the dense server, only the final residence differs;
- unallocated table entries point at page 0, which is reserved as the
  garbage page: reads beyond a slot's length are masked by the position
  predicate, dead slots' writes land there, and a live slot's pages are
  never touched.

Greedy outputs are token-identical to ``generate_compiled`` (the tests'
contract).  No reference counterpart: /root/reference has no serving
layer (SURVEY §2.2).
"""

from __future__ import annotations

from typing import TYPE_CHECKING

import numpy as np

import minidiff_tpu as md
from minidiff_tpu.models import functional as F
from minidiff_tpu.models.server import _BUCKET, DecodeServer
from minidiff_tpu.models.speculative import _chunk_step

if TYPE_CHECKING:
    from typing import Dict, List, Optional, Sequence

__all__ = ["PagedDecodeServer", "PAGE"]

PAGE = 128  # tokens per KV page (= the server's prompt bucket)


class PagedDecodeServer(DecodeServer):
    """Continuous batching over a paged KV cache (transformer family).

    >>> srv = PagedDecodeServer(model, params, max_batch=8, window=2048,
    ...                         num_pages=64)   # 64*128 pooled KV tokens,
    ...                                         # vs 8*2048/128 = 128 dense
    >>> slot = srv.submit([1, 2, 3], max_new_tokens=64)
    >>> while srv.active():
    ...     srv.step()
    >>> tokens = srv.collect(slot)              # pages return to the pool

    Same host API and token-identical outputs as ``DecodeServer`` —
    including ``register_prefix`` and ``prefill_chunk`` (inherited row
    machinery + page scatter); the difference is purely the memory model.
    ``num_pages`` defaults to the dense-equivalent capacity
    (``max_batch * window / 128``).
    """

    def __init__(self, model, params, max_batch: int = 8,
                 window: "Optional[int]" = None,
                 num_pages: "Optional[int]" = None, **kw):
        self._num_pages = num_pages  # resolved after window, in _alloc_state
        super().__init__(model, params, max_batch=max_batch, window=window,
                         **kw)

    # -- window / state ------------------------------------------------------

    def _resolve_window(self, window):
        w = int(window or self.model.max_seq_len)
        assert w % PAGE == 0, "window must be a 128 multiple"
        assert w <= self.model.max_seq_len, (
            f"window {w} exceeds model.max_seq_len "
            f"{self.model.max_seq_len}")
        return w

    def _alloc_state(self):
        import jax.numpy as jnp

        model = self.model
        self._maxp = self.window // PAGE
        if self._num_pages is None:
            self._num_pages = self.max_batch * self._maxp
        assert self._num_pages >= 1
        p_dtype = self._params_raw["tok_emb"].dtype
        kv = model.blocks[0].attn.num_kv_heads
        hd = model.blocks[0].attn.head_dim
        # Page 0 is RESERVED as the garbage page and never allocated:
        # released slots keep stepping (the batched program has no per-slot
        # branch) and their zeroed table rows direct both the dead writes
        # and the masked reads there — a live slot's pages are never
        # touched.  Usable capacity is therefore num_pages - 1.
        self._num_pages += 1
        self._free_pages: "List[int]" = list(range(1, self._num_pages))
        self._slot_pages: "Dict[int, List[int]]" = {}
        self._table_np = np.zeros((self.max_batch, self._maxp), np.int32)
        return {
            "pools": [
                {"k": jnp.zeros((self._num_pages, kv, PAGE, hd), p_dtype),
                 "v": jnp.zeros((self._num_pages, kv, PAGE, hd), p_dtype)}
                for _ in model.blocks
            ],
            "table": jnp.asarray(self._table_np),
        }

    # -- host-side page allocator -------------------------------------------

    def pages_in_use(self) -> int:
        return (self._num_pages - 1) - len(self._free_pages)

    def free_page_count(self) -> int:
        return len(self._free_pages)

    def kv_bytes(self) -> int:
        """Device bytes held by the KV pool (all layers, both of k/v)."""
        import jax.numpy as jnp

        per = 0
        for pool in self._state["pools"]:
            per += pool["k"].size * jnp.dtype(pool["k"].dtype).itemsize
            per += pool["v"].size * jnp.dtype(pool["v"].dtype).itemsize
        return per

    def _take_page(self, slot: int) -> None:
        if not self._free_pages:
            raise RuntimeError(
                f"KV page pool exhausted ({self._num_pages - 1} usable "
                f"pages, all in use) — collect() finished requests to free "
                f"their pages, or construct the server with a larger "
                f"num_pages")
        pid = self._free_pages.pop(0)
        pages = self._slot_pages.setdefault(slot, [])
        self._table_np[slot, len(pages)] = pid
        pages.append(pid)

    def _release_pages(self, slot: int) -> None:
        for pid in self._slot_pages.pop(slot, []):
            self._free_pages.append(pid)
        self._table_np[slot, :] = 0

    def _sync_table(self) -> None:
        import jax.numpy as jnp

        self._state = {**self._state, "table": jnp.asarray(self._table_np)}

    # -- host API overrides --------------------------------------------------

    def submit(self, prompt: "Sequence[int]", max_new_tokens: int,
               seed: int = 0, prefix: "Optional[int]" = None) -> int:
        s0 = len(prompt)
        assert s0 >= 1
        if not self._free:
            raise RuntimeError(
                "no free slots — step() until a request finishes and "
                "collect() it (collect releases the slot)")
        chunked = (self._prefill_chunk is not None
                   and s0 > self._prefill_chunk)
        if prefix is None and not chunked:
            # direct path: the bucketed prefill writes sb/PAGE whole pages
            # (pad positions land past the request's length: masked on
            # read, overwritten by decode before pos reaches them — the
            # dense server's argument).  Rows paths (prefix/chunked)
            # allocate in _finish_submit_rows instead.
            if self.window is not None:
                assert s0 + max_new_tokens <= self.window
            sb = -(-s0 // _BUCKET) * _BUCKET
            slot = self._free[0]  # the slot the base submit will pop
            self._release_pages(slot)  # stale pages from an uncollected past
            for _ in range(sb // PAGE):
                self._take_page(slot)
            self._sync_table()
        return super().submit(prompt, max_new_tokens, seed=seed,
                              prefix=prefix)

    def _finish_submit_rows(self, rows, p0, prompt, max_new_tokens, seed):
        # rows path (prefix / chunked): the combined row holds KV for
        # positions [0, p0 + len(prompt)); allocate the pages that cover
        # them before the scatter program runs
        slot = self._free[0]
        self._release_pages(slot)
        npg = -(-(p0 + len(prompt)) // PAGE)
        for _ in range(npg):
            self._take_page(slot)
        self._sync_table()
        return super()._finish_submit_rows(rows, p0, prompt, max_new_tokens,
                                           seed)

    def step(self):
        # allocate the page the incoming token will land in, when decode
        # crosses a 128 boundary this step
        for s in range(self.max_batch):
            if s in self._free or self._budget[s] <= 0:
                continue
            pidx = int(self._pos[s]) // PAGE
            if pidx >= len(self._slot_pages.get(s, [])):
                self._take_page(s)
        self._sync_table()
        return super().step()

    def collect(self, slot: int) -> "List[int]":
        out = super().collect(slot)
        if self._budget[slot] == 0:
            self._release_pages(slot)
        return out

    # -- device programs -----------------------------------------------------

    def _scatter_row_pages(self, pool_raw, row, trow, dt):
        """Write a dense one-row cache (1, kv, L, hd) into the pool page by
        page: logical page j lands in pool page trow[j] (0 = garbage page
        for beyond-length pages)."""
        import jax
        import jax.numpy as jnp

        z = jnp.zeros((), trow.dtype)
        out = pool_raw
        for j in range(self._maxp):
            blk = row[:, :, j * PAGE:(j + 1) * PAGE, :].astype(dt)
            out = jax.lax.dynamic_update_slice(out, blk, (trow[j], z, z, z))
        return out

    def _build_prefill(self, sb: int):
        """(params, state, toks (1, sb), length, slot, key) ->
        (state', first token (1,)): one-row parallel prefill whose KV
        lands in the slot's pre-allocated pool pages by per-page
        dynamic-update-slice."""
        import jax
        import jax.numpy as jnp

        model = self.model
        npg = sb // PAGE

        @jax.jit
        def prefill(raw_p, state_raw, toks, length, slot, key):
            with md.no_grad():
                p = jax.tree.map(md.Tensor, raw_p)
                table = state_raw["table"]
                toks_t = md.Tensor(toks)
                pos = md.arange(sb)
                x = p["tok_emb"][toks_t]
                if not model.rope:
                    x = x + p["pos_emb"][:sb]
                trow = jax.lax.dynamic_index_in_dim(
                    table, slot, axis=0, keepdims=False)   # (maxp,) ids
                z = jnp.zeros((), trow.dtype)
                new_pools = []
                for blk, bp, pool in zip(model.blocks, p["blocks"],
                                         state_raw["pools"]):
                    attn = blk.attn
                    q, kk, vv = F.block_qkv(blk, bp, x, pos)
                    dt = pool["k"].dtype
                    pk, pv = pool["k"], pool["v"]
                    for j in range(npg):
                        sl = slice(j * PAGE, (j + 1) * PAGE)
                        pk = jax.lax.dynamic_update_slice(
                            pk, kk._data[:, :, sl, :].astype(dt),
                            (trow[j], z, z, z))
                        pv = jax.lax.dynamic_update_slice(
                            pv, vv._data[:, :, sl, :].astype(dt),
                            (trow[j], z, z, z))
                    new_pools.append({"k": pk, "v": pv})
                    o = md.sdpa(q, attn.expand_kv(kk), attn.expand_kv(vv),
                                causal=True, window=model.window,
                                sinks=model.sinks)
                    x = F.block_finish(blk, bp, x, o)
                x = model.ln_f.apply(p["ln_f"], x)
                logits = model.lm_head(p, x)           # (1, sb, V)
                last = (md.arange(sb) == (md.Tensor(length) - 1)).astype(
                    logits.dtype)
                lg = md.einsum("j,bjv->bv", last, logits)
                nxt = self._select(lg, md.Tensor(key).reshape((1, 2)))
                return ({"pools": new_pools, "table": table}, nxt._data)

        return prefill

    def _build_prefix_submit(self, sb: int):
        """(params, state, prefix rows, toks (1, sb), p0, s0, slot, key) ->
        (state', first token (1,)): the suffix runs as ONE chunk step over
        the dense prefix row (identical compute to the dense server), then
        the combined row's pages scatter into the slot's pool pages."""
        import jax

        model, L = self.model, self.window

        @jax.jit
        def prefill(raw_p, state_raw, rows_raw, toks, p0, s0, slot, key):
            with md.no_grad():
                p = jax.tree.map(md.Tensor, raw_p)
                rows = jax.tree.map(md.Tensor, rows_raw)
                table = state_raw["table"]
                new_rows, logits = _chunk_step(
                    model, p, rows, md.Tensor(toks),
                    md.Tensor(p0).reshape((1,)), L)     # (1, sb, V)
                trow = jax.lax.dynamic_index_in_dim(
                    table, slot, axis=0, keepdims=False)
                new_pools = []
                for pool, row in zip(state_raw["pools"], new_rows):
                    dt = pool["k"].dtype
                    new_pools.append({
                        "k": self._scatter_row_pages(
                            pool["k"], row["k"]._data, trow, dt),
                        "v": self._scatter_row_pages(
                            pool["v"], row["v"]._data, trow, dt),
                    })
                last = (md.arange(sb) == (md.Tensor(s0) - 1)).astype(
                    logits.dtype)
                lg = md.einsum("j,bjv->bv", last, logits)
                nxt = self._select(lg, md.Tensor(key).reshape((1, 2)))
                return ({"pools": new_pools, "table": table}, nxt._data)

        return prefill

    def _build_step(self):
        """(params, state, toks (B,), pos (B,), keys) -> (state', next
        tokens (B,)): per-row DUS KV append into the slot's current page,
        then the fused page-walk attention kernel over the pool."""
        import jax
        import jax.numpy as jnp

        from minidiff_tpu.kernels import paged as PK

        model, B = self.model, self.max_batch

        @jax.jit
        def step(raw_p, state_raw, toks, pos, keys):
            with md.no_grad():
                p = jax.tree.map(md.Tensor, raw_p)
                table = state_raw["table"]             # (B, maxp) int32
                pos_i = pos.astype(jnp.int32)
                pidx = jnp.maximum(pos_i, 0) // PAGE
                off = pos_i % PAGE
                p_b = jnp.take_along_axis(table, pidx[:, None], axis=1)[:, 0]

                pos2d = md.Tensor(pos).reshape((B, 1))
                x = p["tok_emb"][md.Tensor(toks).reshape((B, 1))]
                if not model.rope:
                    x = x + p["pos_emb"][pos2d]
                new_pools = []
                for blk, bp, pool in zip(model.blocks, p["blocks"],
                                         state_raw["pools"]):
                    attn = blk.attn
                    kvh, hd = attn.num_kv_heads, attn.head_dim
                    g = attn.num_heads // kvh
                    q, kk, vv = F.block_qkv(blk, bp, x, pos2d)
                    pk = PK.append_kv(pool["k"],
                                      kk._data.reshape(B, kvh, hd), p_b, off)
                    pv = PK.append_kv(pool["v"],
                                      vv._data.reshape(B, kvh, hd), p_b, off)
                    new_pools.append({"k": pk, "v": pv})
                    q4 = q._data.reshape(B, kvh, g, hd).astype(pk.dtype)
                    o = PK.paged_attention(
                        q4, pk, pv, table, pos_i,
                        window=model.window, sinks=model.sinks)
                    o_md = md.Tensor(
                        o.reshape(B, attn.num_heads, 1, hd).astype(
                            q._data.dtype))
                    x = F.block_finish(blk, bp, x, o_md)
                x = model.ln_f.apply(p["ln_f"], x)
                logits = model.lm_head(p, x)           # (B, 1, V)
                nxt = self._select(logits[:, 0], md.Tensor(keys))
                return ({"pools": new_pools, "table": table}, nxt._data)

        return step
