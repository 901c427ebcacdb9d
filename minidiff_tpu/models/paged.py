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
- decode-step KV writes scatter into the pool by a (batch one-hot page,
  one-hot offset) contraction — the same static-shape idiom as
  ``speculative._write_rows``, over pool pages instead of cache rows;
- attention gathers each slot's pages ``pool[table]`` into the logical
  ``(B, kv, window, hd)`` view and applies the identical mask predicate
  (``l <= pos`` plus the optional sliding-window band and sink rows) as
  the dense server, so greedy outputs are token-identical to
  ``generate_compiled`` (the tests' contract);
- unallocated table entries point at page 0: reads beyond a slot's length
  are masked out by the position predicate, and writes only ever target
  allocated pages, so aliasing is harmless by construction.

No reference counterpart: /root/reference has no serving layer.
"""

from __future__ import annotations

from typing import TYPE_CHECKING

import numpy as np

import minidiff_tpu as md
from minidiff_tpu.models import functional as F
from minidiff_tpu.models.server import _BUCKET, _ServerBase, _is_tensor

if TYPE_CHECKING:
    from typing import Dict, List, Optional, Sequence

__all__ = ["PagedDecodeServer", "PAGE"]

PAGE = 128  # tokens per KV page (= the server's prompt bucket)


class PagedDecodeServer(_ServerBase):
    """Continuous batching over a paged KV cache (transformer family).

    >>> srv = PagedDecodeServer(model, params, max_batch=8, window=2048,
    ...                         num_pages=64)   # 64*128 pooled KV tokens,
    ...                                         # vs 8*2048/128 = 128 dense
    >>> slot = srv.submit([1, 2, 3], max_new_tokens=64)
    >>> while srv.active():
    ...     srv.step()
    >>> tokens = srv.collect(slot)              # pages return to the pool

    Same host API and token-identical outputs as ``DecodeServer``; the
    difference is purely the memory model.  ``num_pages`` defaults to the
    dense-equivalent capacity (``max_batch * window / 128``).
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
        if prefix is not None:
            raise NotImplementedError(
                "PagedDecodeServer does not support prefix caching yet — "
                "use DecodeServer.register_prefix")
        # the bucketed prefill writes sb/PAGE whole pages (pad positions
        # land past the request's length: masked on read, overwritten by
        # decode before pos reaches them — the dense server's argument)
        s0 = len(prompt)
        assert s0 >= 1
        sb = -(-s0 // _BUCKET) * _BUCKET
        if self.window is not None:
            assert s0 + max_new_tokens <= self.window
        # reserve a slot id WITHOUT popping (base submit pops): peek
        if not self._free:
            raise RuntimeError(
                "no free slots — step() until a request finishes and "
                "collect() it (collect releases the slot)")
        slot = self._free[0]
        self._release_pages(slot)  # stale pages from an uncollected past
        for _ in range(sb // PAGE):
            self._take_page(slot)
        self._sync_table()
        return super().submit(prompt, max_new_tokens, seed=seed)

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

    def _logical_view(self, pool, table):
        """Gather one layer's pages into the (B, kv, window, hd) logical
        cache the mask predicate addresses."""
        b, maxp = table.shape
        kv, hd = pool.shape[1], pool.shape[3]
        pages = pool[table]                       # (B, maxp, kv, PAGE, hd)
        return pages.transpose((0, 2, 1, 3, 4)).reshape(
            (b, kv, maxp * PAGE, hd))

    def _build_prefill(self, sb: int):
        """(params, state, toks (1, sb), length, slot, key) ->
        (state', first token (1,)): one-row parallel prefill whose KV
        lands in the slot's pre-allocated pool pages."""
        import jax

        model, L, B, P = self.model, self.window, self.max_batch, \
            self._num_pages
        npg = sb // PAGE

        @jax.jit
        def prefill(raw_p, state_raw, toks, length, slot, key):
            with md.no_grad():
                p = jax.tree.map(md.Tensor, raw_p)
                pools = jax.tree.map(md.Tensor, state_raw["pools"])
                table = md.Tensor(state_raw["table"])
                toks_t = md.Tensor(toks)
                pos = md.arange(sb)
                x = p["tok_emb"][toks_t]
                if not model.rope:
                    x = x + p["pos_emb"][:sb]
                trow = table[md.Tensor(slot)]          # (maxp,) page ids
                w = (md.arange(P).reshape((1, P))
                     == trow[:npg].reshape((npg, 1))).astype(
                    md.float32)                        # (npg, P)
                keep = (1.0 - md.sum(w, axis=0)).reshape((P, 1, 1, 1))
                new_pools = []
                for blk, bp, pool in zip(model.blocks, p["blocks"], pools):
                    attn = blk.attn
                    kvh, hd = attn.num_kv_heads, attn.head_dim
                    q, kk, vv = F.block_qkv(blk, bp, x, pos)
                    dt = pool["k"].dtype
                    ck = kk.astype(dt).reshape(
                        (kvh, npg, PAGE, hd)).transpose((1, 0, 2, 3))
                    cv = vv.astype(dt).reshape(
                        (kvh, npg, PAGE, hd)).transpose((1, 0, 2, 3))
                    keep_d = keep.astype(dt)
                    new_pools.append({
                        "k": pool["k"] * keep_d
                        + md.einsum("np,nkld->pkld", w.astype(dt), ck),
                        "v": pool["v"] * keep_d
                        + md.einsum("np,nkld->pkld", w.astype(dt), cv),
                    })
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
                raw_pools = jax.tree.map(lambda t: t._data, new_pools,
                                         is_leaf=_is_tensor)
                return ({"pools": raw_pools, "table": state_raw["table"]},
                        nxt._data)

        return prefill

    def _build_step(self):
        """(params, state, toks (B,), pos (B,), keys) -> (state', next
        tokens (B,)): write each live token's KV into its slot's current
        page, then attend over the gathered logical view under the dense
        server's exact mask predicate."""
        import jax

        model, L, B, P = self.model, self.window, self.max_batch, \
            self._num_pages
        maxp = self._maxp

        @jax.jit
        def step(raw_p, state_raw, toks, pos, keys):
            with md.no_grad():
                p = jax.tree.map(md.Tensor, raw_p)
                pools = jax.tree.map(md.Tensor, state_raw["pools"])
                table = md.Tensor(state_raw["table"])  # (B, maxp)
                pos_t = md.Tensor(pos)                 # (B,)
                pidx = pos_t // PAGE
                off = pos_t % PAGE
                sel_m = (md.arange(maxp).reshape((1, maxp))
                         == pidx.reshape((B, 1)))
                p_b = md.sum(table * sel_m.astype(table.dtype),
                             axis=1)                   # (B,) page ids
                w = md.logical_and(
                    md.arange(P).reshape((1, P, 1))
                    == p_b.reshape((B, 1, 1)),
                    md.arange(PAGE).reshape((1, 1, PAGE))
                    == off.reshape((B, 1, 1))).astype(
                    md.float32)                        # (B, P, PAGE)
                keep = 1.0 - md.sum(w, axis=0)         # (P, PAGE)

                pos2d = pos_t.reshape((B, 1))
                x = p["tok_emb"][md.Tensor(toks).reshape((B, 1))]
                if not model.rope:
                    x = x + p["pos_emb"][pos2d]
                lid = md.arange(L).reshape((1, 1, 1, L))
                qpos = pos2d.reshape((B, 1, 1, 1))
                mask = lid <= qpos
                if getattr(model, "window", None) is not None:
                    band = lid > (qpos - model.window)
                    if model.sinks:
                        band = md.logical_or(band, lid < model.sinks)
                    mask = md.logical_and(mask, band)

                new_pools = []
                for blk, bp, pool in zip(model.blocks, p["blocks"], pools):
                    attn = blk.attn
                    kvh, hd = attn.num_kv_heads, attn.head_dim
                    q, kk, vv = F.block_qkv(blk, bp, x, pos2d)
                    dt = pool["k"].dtype
                    keep_d = keep.reshape((P, 1, PAGE, 1)).astype(dt)
                    w_d = w.astype(dt)
                    pk = pool["k"] * keep_d + md.einsum(
                        "bpl,bkd->pkld", w_d,
                        kk.reshape((B, kvh, hd)).astype(dt))
                    pv = pool["v"] * keep_d + md.einsum(
                        "bpl,bkd->pkld", w_d,
                        vv.reshape((B, kvh, hd)).astype(dt))
                    new_pools.append({"k": pk, "v": pv})
                    ck = self._logical_view(pk, table).astype(q.dtype)
                    cv2 = self._logical_view(pv, table).astype(q.dtype)
                    scores = md.matmul_nt(
                        q, attn.expand_kv(ck)) * (1.0 / (hd ** 0.5))
                    scores = scores.astype(md.float32)
                    scores = md.where(mask, scores,
                                      md.full_like(scores, -1e30))
                    o = md.matmul(F.softmax(scores, axis=-1).astype(q.dtype),
                                  attn.expand_kv(cv2))
                    x = F.block_finish(blk, bp, x, o)
                x = model.ln_f.apply(p["ln_f"], x)
                logits = model.lm_head(p, x)           # (B, 1, V)
                nxt = self._select(logits[:, 0], md.Tensor(keys))
                raw_pools = jax.tree.map(lambda t: t._data, new_pools,
                                         is_leaf=_is_tensor)
                return ({"pools": raw_pools, "table": state_raw["table"]},
                        nxt._data)

        return step
