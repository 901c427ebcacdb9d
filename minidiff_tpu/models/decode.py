"""Compiled autoregressive decoding: the serving path as ONE XLA program.

``transformer.generate`` re-runs a full forward per token (O(S^2) each) and
``generate_cached`` is O(S) per token but dispatches every op eagerly from
Python — hundreds of device round-trips per generated token.  This module is
the TPU-native serving path: the whole decode loop lowers into a single
``lax.scan`` program, so generating N tokens is ONE device dispatch.

TPU-idiomatic choices:
* fixed-size KV cache (max_seq_len) updated in place per step via
  ``Tensor.__setitem__`` with a *traced* position — lowering to
  dynamic-update-slice, no reallocating concat;
* attention reads the full cache each step under a ``position <= pos`` mask
  (static shapes; the masked tail is dead lanes, not dynamic slicing);
* prefill and decode share one scan: for the first ``s0`` steps the input
  token comes from the prompt, afterwards from the previous argmax
  (``lax.select`` on the step index — no Python branching in the trace).

Everything inside the scan body is framework ops under ``md.no_grad()`` —
the same `md.*` calls as the eager path, traced once.
"""

from __future__ import annotations

import math
from typing import TYPE_CHECKING

import jax
import jax.numpy as jnp

import minidiff_tpu as md
from minidiff_tpu.models import functional as F

if TYPE_CHECKING:
    from typing import Any, Tuple

    from minidiff_tpu.models.transformer import TransformerLM


def _is_tensor(x):
    return isinstance(x, md.Tensor)


# (model id, batch, prompt len, new tokens, dtypes) -> jitted decode program.
# LRU-bounded: each compiled program pins its model (the scan body closes
# over the layer objects) plus an XLA executable, so an unbounded cache leaks
# in long-running serving with varied shapes/configs.  32 distinct
# (model, shape, sampling) combinations is far beyond a normal server's
# working set; eviction just means a re-trace on the next call.
from collections import OrderedDict

_DECODE_CACHE_MAX = 32
_decode_cache: "OrderedDict" = OrderedDict()


_DECODE_BLOCK = 128


def _block_decode_step(blk, params, x, cache, pos_t, mask):
    """One-token pre-LN block step against the fixed-size cache.

    x (b, 1, d); cache {"k","v"} (b, kv, W, hd); pos_t scalar Tensor; mask
    (W,) bool Tensor of positions <= pos.  Mirrors transformer._block_step
    but with traced positions and masked window attention — W is the
    program's STATIC cache window (see ``generate_compiled``), not the
    model's max_seq_len, so short decodes never move dead cache slots
    through HBM.
    """
    attn = blk.attn
    b = x.shape[0]
    hd = attn.head_dim

    q, k, v = F.block_qkv(blk, params, x, pos_t)  # (b,h,1,hd)/(b,kv,1,hd)

    if "k8" in cache:
        # int8 KV cache: quantize the fresh row per (batch, head) over hd,
        # store int8 line + f32 scale; attention reads int8 cache lines
        # through the fused kernel (HBM never sees a dequantized cache)
        import minidiff_tpu.backend as _backend

        be = _backend.get_backend()
        k8r, ksr = be.quantize_int8_rows(md.squeeze(k, axis=2)._data)
        v8r, vsr = be.quantize_int8_rows(md.squeeze(v, axis=2)._data)
        cache["k8"][:, :, pos_t, :] = md.Tensor(k8r)
        cache["ks"][:, :, pos_t] = md.Tensor(ksr)
        cache["v8"][:, :, pos_t, :] = md.Tensor(v8r)
        cache["vs"][:, :, pos_t] = md.Tensor(vsr)
        posb = md.broadcast_to(
            pos_t.astype(md.int32).reshape((1,)), (b,))
        o = md.sdpa_int8_cache(
            q, cache["k8"], cache["ks"], cache["v8"], cache["vs"], posb)
    else:
        cache["k"][:, :, pos_t, :] = md.squeeze(k, axis=2).astype(
            cache["k"].dtype)
        cache["v"][:, :, pos_t, :] = md.squeeze(v, axis=2).astype(
            cache["v"].dtype)

        keys = attn.expand_kv(cache["k"].astype(q.dtype))  # (b, h, W, hd)
        vals = attn.expand_kv(cache["v"].astype(q.dtype))
        scores = md.matmul_nt(q, keys) * (1.0 / math.sqrt(hd))  # (b,h,1,W)
        # scores/softmax in f32 regardless of model dtype (matching
        # md.sdpa's internal precision, so bf16 decode agrees with the
        # eager paths)
        scores = scores.astype(md.float32)
        scores = md.where(mask, scores, md.full_like(scores, -1e30))
        attn_w = F.softmax(scores, axis=-1).astype(q.dtype)
        o = md.matmul(attn_w, vals)  # (b, h, 1, hd)
    return F.block_finish(blk, params, x, o)


def decode_program(model: "TransformerLM", params, prompt: "md.Tensor",
                   max_new_tokens: int, greedy: bool = True,
                   temperature: float = 1.0, top_k: "Any" = None,
                   top_p: "Any" = None, min_p: "Any" = None,
                   kv_quant: bool = False):
    """The jitted ``(raw_params, prompt_raw, seed_uint32) -> (B, new)``
    program behind ``generate_compiled``, cached per (model, shapes,
    sampling config).  Exposed so utils/export.py can AOT-serialize the
    exact serving program (jax.export) for deployment without model code.

    Original serving semantics documented on ``generate_compiled``:

    Greedy mode is token-for-token identical to
    ``transformer.generate(greedy=True)`` / ``generate_cached``.  With
    ``greedy=False``, each step draws a Gumbel-max sample at ``temperature``
    (optionally truncated to the ``top_k`` highest logits via ``md.topk``)
    from a per-step key folded out of ``seed`` — deterministic per seed,
    still ONE compiled program.  prompt (B, S0) int ->
    (B, S0 + max_new_tokens).

    ``kv_quant=True`` stores the KV cache as int8 lines with per-row f32
    scales and reads it through the fused ``md.sdpa_int8_cache`` kernel —
    halves the cache's HBM stream (decode's second-largest read after the
    weights) at the cost of quantization error in the attention inputs
    (tokens may differ from the full-precision decode near logit ties).
    """
    b, s0 = prompt.shape
    assert s0 >= 1, "generate_compiled needs a non-empty prompt to prefill"
    assert max_new_tokens >= 1, "max_new_tokens must be >= 1"
    if kv_quant and model.window is not None:
        raise NotImplementedError(
            "kv_quant decode does not support sliding-window models yet "
            "(sdpa_int8_cache masks by position only)")
    total = s0 + max_new_tokens - 1
    assert total <= model.max_seq_len, "prompt + new tokens exceed max_seq_len"
    # STATIC cache window: this program only ever touches positions
    # [0, total], so allocate and read ceil-to-block of that instead of
    # max_seq_len.  Decode is HBM-bound and the K/V read dominates — a
    # 144-token request against a 512-slot model reads 2x less cache per
    # step (the compiled-serving edge over naive fixed-size caches).
    L = min(model.max_seq_len,
            -(-(total + 1) // _DECODE_BLOCK) * _DECODE_BLOCK)

    # only the dtype enters the cache key — the full tree unwrap happens
    # once per CALL in generate_compiled, not here (hot-path cost)
    p_dtype = params["tok_emb"]._data.dtype
    prompt_raw = prompt._data

    # One compiled program per (model, shapes): rebuilding the jitted
    # closure on every call would recompile every call — ~1.6 s fixed cost
    # that dwarfs the 128-token decode itself.
    # seed is a RUNTIME argument (traced into the program), so a serving
    # loop varying seeds reuses one compiled program instead of paying a
    # fresh trace+compile per request
    key = (id(model), b, s0, max_new_tokens, str(p_dtype),
           str(prompt_raw.dtype), greedy, float(temperature), top_k,
           None if top_p is None else float(top_p),
           None if min_p is None else float(min_p),
           kv_quant)
    cached = _decode_cache.get(key)
    if cached is not None:
        _decode_cache.move_to_end(key)
        return cached

    def prefill(p, x_tok):
        """Whole-prompt forward in ONE pass: fills caches[:, :, :s0) and
        returns the last position's logits.  This is where long prompts win:
        s0 sequential scan steps collapse into one parallel (flash-eligible)
        attention forward."""
        bb, ss = x_tok.shape
        pos = md.arange(ss)
        xh = p["tok_emb"][x_tok]
        if not model.rope:
            xh = xh + p["pos_emb"][:ss]
        caches = []
        for blk, bp in zip(model.blocks, p["blocks"]):
            attn = blk.attn
            qq, kk, vv = F.block_qkv(blk, bp, xh, pos)
            if kv_quant:
                import minidiff_tpu.backend as _backend

                be = _backend.get_backend()
                kvh, hdim = attn.num_kv_heads, attn.head_dim
                k8p, ksp = be.quantize_int8_rows(kk._data)
                v8p, vsp = be.quantize_int8_rows(vv._data)
                k8 = md.zeros((bb, kvh, L, hdim)).astype(md.int8)
                v8 = md.zeros_like(k8)
                ks = md.ones((bb, kvh, L)).astype(md.float32)
                vs = md.ones_like(ks)
                k8[:, :, :ss, :] = md.Tensor(k8p)
                v8[:, :, :ss, :] = md.Tensor(v8p)
                ks[:, :, :ss] = md.Tensor(ksp)
                vs[:, :, :ss] = md.Tensor(vsp)
                caches.append({"k8": k8, "ks": ks, "v8": v8, "vs": vs})
            else:
                ck = md.zeros(
                    (bb, attn.num_kv_heads, L, attn.head_dim)).astype(p_dtype)
                cv = md.zeros(
                    (bb, attn.num_kv_heads, L, attn.head_dim)).astype(p_dtype)
                ck[:, :, :ss, :] = kk.astype(p_dtype)
                cv[:, :, :ss, :] = vv.astype(p_dtype)
                caches.append({"k": ck, "v": cv})
            o = md.sdpa(qq, attn.expand_kv(kk), attn.expand_kv(vv),
                        causal=True, window=model.window, sinks=model.sinks)
            xh = F.block_finish(blk, bp, xh, o)
        xh = model.ln_f.apply(p["ln_f"], xh)
        logits = model.lm_head(p, xh[:, -1:, :])[:, 0, :]  # (B, V)
        return caches, logits

    def step(raw_p, caches_raw, tok_raw, i):
        """One decode position: token (B,) at position i -> next (B,)."""
        with md.no_grad():
            p = jax.tree.map(md.Tensor, raw_p)
            caches = jax.tree.map(md.Tensor, caches_raw)
            tok = md.Tensor(tok_raw).reshape((b, 1))
            pos_t = md.Tensor(i)
            idx = md.Tensor(jnp.arange(L))
            mask = idx <= pos_t  # (L,) bool
            if model.window is not None:
                # sliding window: only the last `window` cache rows (plus
                # the sink rows) stay visible — matches the training mask
                vis = md.greater(idx, pos_t - model.window)
                if model.sinks:
                    vis = md.logical_or(vis, md.less(idx, model.sinks))
                mask = md.logical_and(mask, vis)

            x = p["tok_emb"][tok]
            if not model.rope:
                x = x + p["pos_emb"][pos_t]
            for blk, bp, cache in zip(model.blocks, p["blocks"], caches):
                x = _block_decode_step(blk, bp, x, cache, pos_t, mask)
            x = model.ln_f.apply(p["ln_f"], x)
            logits = model.lm_head(p, x)[:, 0, :]  # (B, V)
            return (
                jax.tree.map(lambda t: t._data, caches, is_leaf=_is_tensor),
                logits,
            )

    def select(logits, i, seed_arr):
        """Next token from (B, V) logits at scan position i (md ops)."""
        with md.no_grad():
            if greedy:
                nxt = md.argmax(logits, axis=-1)
            else:
                scaled = logits / max(float(temperature), 1e-6)
                scaled = F.truncate_logits(scaled, top_k=top_k,
                                           top_p=top_p, min_p=min_p)
                # Gumbel-max draw from a per-position key: deterministic in
                # (seed, i), independent across steps
                step_key = jax.random.fold_in(
                    jax.random.PRNGKey(seed_arr), i)
                u = jax.random.uniform(
                    step_key, scaled.shape, jnp.float32, 1e-9, 1.0
                )
                gumbel = md.Tensor(-jnp.log(-jnp.log(u))).astype(scaled.dtype)
                nxt = md.argmax(scaled + gumbel, axis=-1)
            return nxt._data.astype(prompt_raw.dtype)

    @jax.jit
    def decode(raw_p, prompt_raw, seed_arr):
        # one-shot prefill: the whole prompt in a single parallel forward
        # (flash-eligible attention) instead of s0 sequential scan steps
        with md.no_grad():
            p = jax.tree.map(md.Tensor, raw_p)
            caches_t, logits0 = prefill(p, md.Tensor(prompt_raw))
            caches0 = jax.tree.map(
                lambda t: t._data, caches_t, is_leaf=_is_tensor
            )
            nxt0 = select(logits0, s0 - 1, seed_arr)

        def body(carry, j):
            caches_raw, prev = carry
            i = s0 + j  # position being fed
            caches_raw, logits = step(raw_p, caches_raw, prev, i)
            nxt = select(logits, i, seed_arr)
            return (caches_raw, nxt), nxt

        if max_new_tokens > 1:
            _, nexts = jax.lax.scan(
                body, (caches0, nxt0), jnp.arange(max_new_tokens - 1)
            )
            gen = jnp.concatenate([nxt0[None], nexts], axis=0)
        else:
            gen = nxt0[None]
        return jnp.swapaxes(gen, 0, 1)  # (B, max_new)

    _decode_cache[key] = decode
    while len(_decode_cache) > _DECODE_CACHE_MAX:
        _decode_cache.popitem(last=False)
    return decode


def generate_compiled(model: "TransformerLM", params, prompt: "md.Tensor",
                      max_new_tokens: int, greedy: bool = True,
                      temperature: float = 1.0, top_k: "Any" = None,
                      top_p: "Any" = None, min_p: "Any" = None,
                      seed: int = 0, kv_quant: bool = False) -> "md.Tensor":
    """KV-cached decoding, the whole loop as one lax.scan program.

    Greedy mode is token-for-token identical to
    ``transformer.generate(greedy=True)`` / ``generate_cached``.  With
    ``greedy=False``, each step draws a Gumbel-max sample at ``temperature``
    (optionally truncated by ``top_k`` / nucleus ``top_p`` / ``min_p`` via
    ``functional.truncate_logits``) from a per-step key folded out of
    ``seed`` — deterministic per seed, still ONE compiled program.
    prompt (B, S0) int -> (B, S0 + max_new_tokens).

    ``kv_quant=True`` stores the KV cache as int8 lines with per-row f32
    scales and reads it through the fused ``md.sdpa_int8_cache`` kernel —
    halves the cache's HBM stream (decode's second-largest read after the
    weights) at the cost of quantization error in the attention inputs
    (tokens may differ from the full-precision decode near logit ties).
    """
    program = decode_program(model, params, prompt, max_new_tokens,
                             greedy=greedy, temperature=temperature,
                             top_k=top_k, top_p=top_p, min_p=min_p,
                             kv_quant=kv_quant)
    raw_params = jax.tree.map(lambda t: t._data, params, is_leaf=_is_tensor)
    # mask into uint32 range: PRNGKey folding only uses 32 bits, and
    # negative / 64-bit seeds (request hashes) must not crash
    seed_raw = jnp.asarray(int(seed) & 0xFFFFFFFF, jnp.uint32)
    generated = program(raw_params, prompt._data, seed_raw)
    return md.concatenate(
        [prompt, md.Tensor(generated).astype(prompt.dtype)], axis=-1
    )
