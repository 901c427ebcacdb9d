"""Speculative decoding: a small draft model proposes, the target verifies.

Greedy speculative decoding is EXACT: the emitted sequence is identical to
the target model's own greedy decode (each round emits the draft's longest
target-agreeing prefix plus one target-chosen bonus token), but the target
runs ONE parallel (k+1)-token verification forward per round instead of one
forward per token — fewer, fatter matmuls, which is exactly what the MXU
wants, and k+1 tokens of weight-stream HBM traffic amortized into one read.

Two implementations:

* ``generate_speculative`` — eager reference: per-row Python loop with full
  re-forwards.  Slow; exists to pin the algorithm for tests.
* ``generate_speculative_compiled`` — the serving path: ONE compiled XLA
  program (jax.lax.while_loop).  Every round drafts k tokens with the draft
  model's KV cache, verifies them in a single chunk forward against the
  target's KV cache, and accepts per batch row.  Rows advance at their own
  pace, so all row-dependent state (positions, counts, cache writes, output
  writes) is data, not control flow:

  - KV-cache writes at per-row positions lower to a one-hot contraction
    (``md.einsum('blj,bhjd->bhld')``) — a static-shape MXU op, not a
    scatter;
  - chunk attention masks are per-row position tables
    (``cache_pos <= row_pos + i``);
  - output tokens land in a margin-padded buffer through the same one-hot
    trick; finished rows freeze their pointers and write only margin.

No reference counterpart (/root/reference has no serving layer); extends
the SURVEY §8 serving row.
"""

from __future__ import annotations

from collections import OrderedDict
from typing import TYPE_CHECKING

import jax
import jax.numpy as jnp

import minidiff_tpu as md
from minidiff_tpu.models import functional as F

if TYPE_CHECKING:
    from typing import Any, Tuple

    from minidiff_tpu.models.transformer import TransformerLM

__all__ = ["generate_speculative", "generate_speculative_compiled"]


def _is_tensor(x):
    return isinstance(x, md.Tensor)


# ---------------------------------------------------------------------------
# eager reference
# ---------------------------------------------------------------------------


def generate_speculative(target: "TransformerLM", target_params,
                         draft: "TransformerLM", draft_params,
                         prompt: "md.Tensor", max_new_tokens: int,
                         k: int = 4) -> "md.Tensor":
    """Reference implementation; output == target greedy decode exactly."""
    import numpy as np

    import minidiff_tpu.backend as backend

    be = backend.get_backend()
    prompt_np = np.asarray(be.as_numpy(prompt._data))
    b, s0 = prompt_np.shape
    # non-RoPE models index a fixed pos_emb table, so no forward (draft
    # chain or verification chunk) may exceed it; near the budget the draft
    # shrinks (k_r < k) and at the edge degenerates to plain greedy (k_r=0)
    limit = min((m.max_seq_len for m in (target, draft) if not m.rope),
                default=None)
    rows = []
    with md.no_grad():
        for r in range(b):
            seq = [int(t) for t in prompt_np[r]]
            new = 0
            while new < max_new_tokens:
                k_r = k if limit is None else max(0, min(k, limit - len(seq)))
                dseq = list(seq)
                for _ in range(k_r):
                    dl = draft.apply(draft_params, md.Tensor([dseq]))
                    dseq.append(int(np.asarray(
                        be.as_numpy(md.argmax(dl[0, -1])._data))))
                d_toks = dseq[len(seq):]
                tl = target.apply(target_params, md.Tensor([dseq]))
                g_np = np.asarray(be.as_numpy(
                    md.argmax(tl[0, len(seq) - 1:], axis=-1)._data))
                acc = 0
                while acc < k_r and d_toks[acc] == int(g_np[acc]):
                    acc += 1
                seq += d_toks[:acc] + [int(g_np[acc])]
                new += acc + 1
            rows.append(seq[:s0 + max_new_tokens])
    return md.Tensor(np.asarray(rows, prompt_np.dtype))


# ---------------------------------------------------------------------------
# compiled serving path
# ---------------------------------------------------------------------------

_SPEC_BLOCK = 128
_SPEC_CACHE_MAX = 16
_spec_cache: "OrderedDict" = OrderedDict()


def _write_rows(cache: "md.Tensor", chunk: "md.Tensor",
                pos: "md.Tensor", L: int) -> "md.Tensor":
    """Scatter chunk (B, kv, c, hd) into cache (B, kv, L, hd) at per-row
    positions pos..pos+c-1, as a one-hot contraction (static shapes)."""
    b, _, c, _ = chunk.shape
    lid = md.arange(L).reshape((1, L, 1))
    tgt = pos.reshape((b, 1, 1)) + md.arange(c).reshape((1, 1, c))
    w = (lid == tgt).astype(cache.dtype)  # (B, L, c): at most one hit per l
    keep = 1.0 - md.sum(w, axis=-1)  # (B, L)
    return (cache * keep.reshape((b, 1, L, 1))
            + md.einsum("blj,bhjd->bhld", w, chunk.astype(cache.dtype)))


def _chunk_step(model: "TransformerLM", p, caches, chunk: "md.Tensor",
                pos: "md.Tensor", L: int):
    """Process c tokens per row at per-row global positions pos..pos+c-1.

    chunk (B, c) int; caches: list per layer of {"k","v"} (B, kv, L, hd).
    Returns (new caches, logits (B, c, V)).  Attention covers the full
    cache window under the per-row mask ``l <= pos + i`` (earlier positions
    plus in-chunk causality in one predicate).  Sliding-window models
    (``model.window``) tighten the same predicate to the causal band
    ``pos + i - window < l`` plus the ``sinks`` head rows — one mask, no
    extra program structure.
    """
    b, c = chunk.shape
    pos2d = pos.reshape((b, 1)) + md.arange(c).reshape((1, c))  # (B, c)
    x = p["tok_emb"][chunk]
    if not model.rope:
        x = x + p["pos_emb"][pos2d]
    lid = md.arange(L).reshape((1, 1, 1, L))
    qpos = pos2d.reshape((b, 1, c, 1))
    mask = lid <= qpos  # (B, 1, c, L)
    if getattr(model, "window", None) is not None:
        band = lid > (qpos - model.window)
        if model.sinks:
            band = md.logical_or(band, lid < model.sinks)
        mask = md.logical_and(mask, band)
    new_caches = []
    for blk, bp, cache in zip(model.blocks, p["blocks"], caches):
        attn = blk.attn
        q, kk, vv = F.block_qkv(blk, bp, x, pos2d)
        ck = _write_rows(cache["k"], kk, pos, L)
        cv = _write_rows(cache["v"], vv, pos, L)
        new_caches.append({"k": ck, "v": cv})
        keys = attn.expand_kv(ck.astype(q.dtype))
        vals = attn.expand_kv(cv.astype(q.dtype))
        scores = md.matmul_nt(q, keys) * (1.0 / (attn.head_dim ** 0.5))
        scores = scores.astype(md.float32)
        scores = md.where(mask, scores, md.full_like(scores, -1e30))
        o = md.matmul(F.softmax(scores, axis=-1).astype(q.dtype), vals)
        x = F.block_finish(blk, bp, x, o)
    x = model.ln_f.apply(p["ln_f"], x)
    return new_caches, model.lm_head(p, x)


def _prefill(model: "TransformerLM", p, toks: "md.Tensor", L: int,
             cache_dtype):
    """Whole-prompt parallel forward -> (caches for positions < s0,
    last-position logits (B, V))."""
    b, s = toks.shape
    pos = md.arange(s)
    x = p["tok_emb"][toks]
    if not model.rope:
        x = x + p["pos_emb"][:s]
    caches = []
    for blk, bp in zip(model.blocks, p["blocks"]):
        attn = blk.attn
        q, kk, vv = F.block_qkv(blk, bp, x, pos)
        ck = md.zeros((b, attn.num_kv_heads, L, attn.head_dim)).astype(
            cache_dtype)
        cv = md.zeros_like(ck)
        ck[:, :, :s, :] = kk.astype(cache_dtype)
        cv[:, :, :s, :] = vv.astype(cache_dtype)
        caches.append({"k": ck, "v": cv})
        o = md.sdpa(q, attn.expand_kv(kk), attn.expand_kv(vv), causal=True,
                    window=model.window, sinks=model.sinks)
        x = F.block_finish(blk, bp, x, o)
    x = model.ln_f.apply(p["ln_f"], x)
    return caches, model.lm_head(p, x[:, -1:, :])[:, 0, :]


def generate_speculative_compiled(
        target: "TransformerLM", target_params,
        draft: "TransformerLM", draft_params,
        prompt: "md.Tensor", max_new_tokens: int,
        k: int = 4) -> "Tuple[md.Tensor, md.Tensor]":
    """One compiled program; returns (tokens (B, s0+max_new), rounds (B,)).

    ``rounds`` counts verification rounds per row — acceptance telemetry
    (mean tokens per round = max_new / rounds; k+1 means the draft always
    agreed).  Token output is bit-identical to the target's own greedy
    decode.
    """
    b, s0 = prompt.shape
    assert s0 >= 1 and max_new_tokens >= 1 and k >= 1
    c = k + 1
    # chunks overhang up to k positions past the last emitted token, so the
    # cache window and (for non-RoPE models) the pos_emb table must cover it
    need = s0 + max_new_tokens + k
    L = -(-need // _SPEC_BLOCK) * _SPEC_BLOCK
    if not target.rope:
        assert need <= target.max_seq_len, "target pos_emb too small (+k overhang)"
    if not draft.rope:
        assert need <= draft.max_seq_len, "draft pos_emb too small (+k overhang)"

    tp_raw = jax.tree.map(lambda t: t._data, target_params, is_leaf=_is_tensor)
    dp_raw = jax.tree.map(lambda t: t._data, draft_params, is_leaf=_is_tensor)
    t_dtype = tp_raw["tok_emb"].dtype
    d_dtype = dp_raw["tok_emb"].dtype
    prompt_raw = prompt._data
    width = max_new_tokens + c  # margin: final rounds overshoot past max_new

    key = (id(target), id(draft), b, s0, max_new_tokens, k,
           str(t_dtype), str(d_dtype), str(prompt_raw.dtype))
    cached = _spec_cache.get(key)
    if cached is None:

        @jax.jit
        def run(tp, dp, prompt_j):
            with md.no_grad():
                p_t = jax.tree.map(md.Tensor, tp)
                p_d = jax.tree.map(md.Tensor, dp)
                toks = md.Tensor(prompt_j)
                tc, logits0 = _prefill(target, p_t, toks, L, t_dtype)
                dc, _ = _prefill(draft, p_d, toks, L, d_dtype)
                last0 = md.argmax(logits0, axis=-1).astype(md.int32)
                out0 = md.zeros((b, width)).astype(md.int32)
                out0[:, 0] = last0
                state0 = (
                    jax.tree.map(lambda t: t._data, tc, is_leaf=_is_tensor),
                    jax.tree.map(lambda t: t._data, dc, is_leaf=_is_tensor),
                    jnp.full((b,), s0, jnp.int32),      # pos of `last`
                    jnp.ones((b,), jnp.int32),          # emitted count
                    last0._data,
                    out0._data,
                    jnp.zeros((b,), jnp.int32),         # rounds taken
                )

            def cond(state):
                return jnp.any(state[3] < max_new_tokens)

            def body(state):
                tc_raw, dc_raw, pos_r, n_r, last_r, out_r, rounds_r = state
                with md.no_grad():
                    t_caches = jax.tree.map(md.Tensor, tc_raw)
                    d_caches = jax.tree.map(md.Tensor, dc_raw)
                    p_t = jax.tree.map(md.Tensor, tp)
                    p_d = jax.tree.map(md.Tensor, dp)
                    pos = md.Tensor(pos_r)
                    n = md.Tensor(n_r)
                    tok = md.Tensor(last_r)

                    # ---- draft k tokens (per-row positions pos+j) ----
                    drafts = []
                    cur = tok
                    for j in range(k):
                        d_caches, dl = _chunk_step(
                            draft, p_d, d_caches, cur.reshape((b, 1)),
                            pos + j, L)
                        cur = md.argmax(dl[:, 0, :], axis=-1).astype(md.int32)
                        drafts.append(cur)
                    # cache-fill d_k at pos+k (logits discarded): with full
                    # acceptance the next round starts at pos+k+1, so the
                    # draft cache must already hold d_k's K/V — the drafting
                    # loop itself only ever feeds back k-1 tokens
                    d_caches, _ = _chunk_step(
                        draft, p_d, d_caches, cur.reshape((b, 1)),
                        pos + k, L)
                    d_toks = md.transpose(md.stack(drafts), axes=(1, 0))

                    # ---- verify in one chunk forward ----
                    chunk = md.concat(
                        [tok.reshape((b, 1)), d_toks], axis=1)  # (B, c)
                    t_caches, t_logits = _chunk_step(
                        target, p_t, t_caches, chunk, pos, L)
                    g = md.argmax(t_logits, axis=-1).astype(md.int32)  # (B,c)

                    # ---- accept the longest agreeing prefix ----
                    match = (d_toks == g[:, :k]).astype(md.int32)
                    pref = md.cumsum(match, axis=1)
                    steps = md.arange(1, k + 1).astype(md.int32)
                    acc = md.sum(
                        (pref == steps.reshape((1, k))).astype(md.int32),
                        axis=1)  # (B,) in 0..k

                    jvec = md.arange(c).astype(md.int32).reshape((1, c))
                    acc_col = acc.reshape((b, 1))
                    bonus = md.sum(
                        g * (jvec == acc_col).astype(md.int32), axis=1)
                    d_pad = md.concat(
                        [d_toks, md.zeros((b, 1)).astype(md.int32)], axis=1)
                    emit = md.where(jvec < acc_col, d_pad,
                                    md.broadcast_to(
                                        bonus.reshape((b, 1)), (b, c)))

                    # ---- write emitted tokens at per-row columns n+j ----
                    fin = (n >= max_new_tokens).astype(md.int32)  # frozen
                    col = n.reshape((b, 1)) + jvec  # (B, c)
                    wid = md.arange(width).astype(md.int32).reshape(
                        (1, width, 1))
                    hit = (wid == col.reshape((b, 1, c))).astype(md.int32)
                    keep_j = (jvec.reshape((1, 1, c))
                              <= acc.reshape((b, 1, 1))).astype(md.int32)
                    w3 = hit * keep_j  # (B, width, c)
                    out_t = md.Tensor(out_r)
                    out_t = (out_t * (1 - md.sum(w3, axis=-1))
                             + md.einsum("bwj,bj->bw", w3, emit))

                    adv = (acc + 1) * (1 - fin)
                    # python-int arithmetic promotes to int64 under x64;
                    # the while_loop carry must stay int32
                    new_pos = (pos + adv).astype(md.int32)
                    new_n = (n + adv).astype(md.int32)
                    new_last = (tok * fin + bonus * (1 - fin)).astype(md.int32)
                    out_t = out_t.astype(md.int32)
                    rounds = (md.Tensor(rounds_r) + (1 - fin)).astype(md.int32)

                    return (
                        jax.tree.map(lambda t: t._data, t_caches,
                                     is_leaf=_is_tensor),
                        jax.tree.map(lambda t: t._data, d_caches,
                                     is_leaf=_is_tensor),
                        new_pos._data, new_n._data, new_last._data,
                        out_t._data, rounds._data,
                    )

            final = jax.lax.while_loop(cond, body, state0)
            return final[5][:, :max_new_tokens], final[6]

        _spec_cache[key] = run
        while len(_spec_cache) > _SPEC_CACHE_MAX:
            _spec_cache.popitem(last=False)
        cached = run

    _spec_cache.move_to_end(key)
    gen, rounds = cached(tp_raw, dp_raw, prompt_raw)
    toks = md.concatenate(
        [prompt, md.Tensor(gen).astype(prompt.dtype)], axis=-1)
    return toks, md.Tensor(rounds)
