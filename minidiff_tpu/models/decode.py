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


def _bounded_cache_attention(q_raw, ck_raw, cv_raw, pos_raw, scale,
                             num_heads: int, block: int = _DECODE_BLOCK):
    """Single-token attention reading ONLY the live prefix of the KV cache.

    q (b, h, 1, hd) raw array; ck/cv (b, kv, L, hd); pos traced scalar.
    The fixed-size cache makes shapes static, but a full-cache masked read
    moves L slots of dead K/V through HBM every step.  Decode is
    bandwidth-bound, so this runs an online-softmax ``lax.fori_loop`` over
    ``ceil((pos+1)/block)`` cache blocks — the masked tail is never read.
    At L=512 and a 144-token working set that is ~2.6x less cache traffic
    than the handwritten full-read twin (the framework's serving edge).
    Scores/normalizer accumulate in f32, matching md.sdpa's precision.
    """
    b, kv, L, hd = ck_raw.shape
    g = num_heads // kv  # query heads per kv head (GQA groups)
    q3 = q_raw[:, :, 0, :].reshape(b, kv, g, hd).astype(jnp.float32)
    nb = jax.lax.div(pos_raw, block) + 1

    def body(i, carry):
        m, l, o = carry
        start = i * block
        kb = jax.lax.dynamic_slice(
            ck_raw, (0, 0, start, 0), (b, kv, block, hd)).astype(jnp.float32)
        vb = jax.lax.dynamic_slice(
            cv_raw, (0, 0, start, 0), (b, kv, block, hd)).astype(jnp.float32)
        s = jnp.einsum("bkgd,bkld->bkgl", q3, kb) * scale  # (b, kv, g, blk)
        idx = start + jnp.arange(block)
        s = jnp.where(idx[None, None, None, :] <= pos_raw, s, -1e30)
        bm = jnp.max(s, axis=-1, keepdims=True)
        m_new = jnp.maximum(m, bm)
        p = jnp.exp(s - m_new)
        alpha = jnp.exp(m - m_new)
        l_new = l * alpha + jnp.sum(p, axis=-1, keepdims=True)
        o_new = o * alpha + jnp.einsum("bkgl,bkld->bkgd", p, vb)
        return m_new, l_new, o_new

    m0 = jnp.full((b, kv, g, 1), -1e30, jnp.float32)
    l0 = jnp.zeros((b, kv, g, 1), jnp.float32)
    o0 = jnp.zeros((b, kv, g, hd), jnp.float32)
    m, l, o = jax.lax.fori_loop(0, nb, body, (m0, l0, o0))
    out = (o / l).reshape(b, num_heads, 1, hd)
    return out.astype(q_raw.dtype)


def _block_decode_step(blk, params, x, cache, pos_t, mask):
    """One-token pre-LN block step against the fixed-size cache.

    x (b, 1, d); cache {"k","v"} (b, kv, L, hd); pos_t scalar Tensor; mask
    (L,) bool Tensor of positions <= pos.  Mirrors transformer._block_step
    with traced positions; the attention core is the bandwidth-bounded
    block read (``_bounded_cache_attention``).
    """
    attn = blk.attn
    b, _, d = x.shape
    hd = attn.head_dim

    xa = blk.ln1.apply(params["ln1"], x)
    q, k, v = attn.project_qkv(params["attn"], xa)  # (b,h,1,hd)/(b,kv,1,hd)
    if attn.rope:
        from minidiff_tpu.models import functional as _F

        q = _F.apply_rope(q, pos_t, attn.rope_base)
        k = _F.apply_rope(k, pos_t, attn.rope_base)

    cache["k"][:, :, pos_t, :] = md.squeeze(k, axis=2).astype(cache["k"].dtype)
    cache["v"][:, :, pos_t, :] = md.squeeze(v, axis=2).astype(cache["v"].dtype)

    L = int(cache["k"].shape[2])
    if L % _DECODE_BLOCK == 0 and L > _DECODE_BLOCK:
        o_raw = _bounded_cache_attention(
            q._data, cache["k"]._data, cache["v"]._data, pos_t._data,
            1.0 / math.sqrt(hd), attn.num_heads)
        o = md.Tensor(o_raw)
    else:
        keys = attn.expand_kv(cache["k"].astype(q.dtype))  # (b, h, L, hd)
        vals = attn.expand_kv(cache["v"].astype(q.dtype))
        scores = md.matmul_nt(q, keys) * (1.0 / math.sqrt(hd))  # (b,h,1,L)
        # scores/softmax in f32 regardless of model dtype (matching
        # md.sdpa's internal precision)
        scores = scores.astype(md.float32)
        scores = md.where(mask, scores, md.full_like(scores, -1e30))
        attn_w = F.softmax(scores, axis=-1).astype(q.dtype)
        o = md.matmul(attn_w, vals)  # (b, h, 1, hd)
    o = md.transpose(o, axes=(0, 2, 1, 3)).reshape((b, 1, d))
    x = x + attn.out.apply(params["attn"]["out"], o)

    hdn = F.gelu(blk.fc1.apply(params["fc1"], blk.ln2.apply(params["ln2"], x)))
    return x + blk.fc2.apply(params["fc2"], hdn)


def generate_compiled(model: "TransformerLM", params, prompt: "md.Tensor",
                      max_new_tokens: int, greedy: bool = True,
                      temperature: float = 1.0, top_k: "Any" = None,
                      seed: int = 0) -> "md.Tensor":
    """KV-cached decoding, the whole loop as one lax.scan program.

    Greedy mode is token-for-token identical to
    ``transformer.generate(greedy=True)`` / ``generate_cached``.  With
    ``greedy=False``, each step draws a Gumbel-max sample at ``temperature``
    (optionally truncated to the ``top_k`` highest logits via ``md.topk``)
    from a per-step key folded out of ``seed`` — deterministic per seed,
    still ONE compiled program.  prompt (B, S0) int ->
    (B, S0 + max_new_tokens).
    """
    b, s0 = prompt.shape
    assert s0 >= 1, "generate_compiled needs a non-empty prompt to prefill"
    assert max_new_tokens >= 1, "max_new_tokens must be >= 1"
    total = s0 + max_new_tokens - 1
    assert total <= model.max_seq_len, "prompt + new tokens exceed max_seq_len"
    L = model.max_seq_len

    raw_params = jax.tree.map(lambda t: t._data, params, is_leaf=_is_tensor)
    p_dtype = raw_params["tok_emb"].dtype
    prompt_raw = prompt._data

    # One compiled program per (model, shapes): rebuilding the jitted
    # closure on every call would recompile every call — ~1.6 s fixed cost
    # that dwarfs the 128-token decode itself.
    # seed is a RUNTIME argument (traced into the program), so a serving
    # loop varying seeds reuses one compiled program instead of paying a
    # fresh trace+compile per request
    key = (id(model), b, s0, max_new_tokens, str(p_dtype),
           str(prompt_raw.dtype), greedy, float(temperature), top_k)
    # mask into uint32 range: PRNGKey folding only uses 32 bits, and
    # negative / 64-bit seeds (request hashes) must not crash
    seed_raw = jnp.asarray(int(seed) & 0xFFFFFFFF, jnp.uint32)
    cached = _decode_cache.get(key)
    if cached is not None:
        _decode_cache.move_to_end(key)
        generated = cached(raw_params, prompt_raw, seed_raw)
        return md.concatenate(
            [prompt, md.Tensor(generated).astype(prompt.dtype)], axis=-1
        )

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
            xa = blk.ln1.apply(bp["ln1"], xh)
            qq, kk, vv = attn.project_qkv(bp["attn"], xa)
            if attn.rope:
                qq = F.apply_rope(qq, pos, attn.rope_base)
                kk = F.apply_rope(kk, pos, attn.rope_base)
            ck = md.zeros((bb, attn.num_kv_heads, L, attn.head_dim)).astype(
                p_dtype)
            cv = md.zeros((bb, attn.num_kv_heads, L, attn.head_dim)).astype(
                p_dtype)
            ck[:, :, :ss, :] = kk.astype(p_dtype)
            cv[:, :, :ss, :] = vv.astype(p_dtype)
            caches.append({"k": ck, "v": cv})
            o = md.sdpa(qq, attn.expand_kv(kk), attn.expand_kv(vv),
                        causal=True)
            o = md.transpose(o, axes=(0, 2, 1, 3)).reshape((bb, ss, -1))
            xh = xh + attn.out.apply(bp["attn"]["out"], o)
            hdn = F.gelu(blk.fc1.apply(bp["fc1"],
                                       blk.ln2.apply(bp["ln2"], xh)))
            xh = xh + blk.fc2.apply(bp["fc2"], hdn)
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
            mask = md.Tensor(jnp.arange(L)) <= pos_t  # (L,) bool

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
                if top_k is not None and top_k < logits.shape[-1]:
                    vals, _ = md.topk(scaled, top_k, axis=-1)
                    scaled = md.where(scaled >= vals[:, -1:], scaled,
                                      md.full_like(scaled, -1e30))
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
    generated = decode(raw_params, prompt_raw, seed_raw)
    return md.concatenate(
        [prompt, md.Tensor(generated).astype(prompt.dtype)], axis=-1
    )
