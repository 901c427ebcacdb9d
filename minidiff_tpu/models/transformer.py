"""Decoder-only transformer LM — the attention-bearing model family.

Everything is built from framework ops, so the whole model trains through the
engine's tape backward (and compiles to one XLA program under md.jit).  The
attention core is ``md.sdpa``, whose XLA-backend forward is the flash
attention Pallas kernel (kernels/attention.py) when shapes are TPU-eligible.

The reference has no models layer at all (SURVEY.md §1 "no L6"); this module
extends the framework the same way models/mlp.py does for the MLP flagship.
"""

from __future__ import annotations

import math
from builtins import max as py_max
from typing import TYPE_CHECKING

import numpy as np

import minidiff_tpu as md
from minidiff_tpu.models import functional as F
from minidiff_tpu.models.layers import Linear, Module

if TYPE_CHECKING:
    from typing import Any, Dict, Optional


class LayerNorm(Module):
    """y = (x - mean) / sqrt(var + eps) * g + b over the last axis."""

    def __init__(self, dim: int, eps: float = 1e-5, dtype: "Optional[Any]" = None):
        self.dim = dim
        self.eps = eps
        self.dtype = dtype

    def init(self) -> "Dict[str, md.Tensor]":
        return {
            "g": md.Tensor(np.ones(self.dim), allow_grad=True, dtype=self.dtype),
            "b": md.Tensor(np.zeros(self.dim), allow_grad=True, dtype=self.dtype),
        }

    def apply(self, params, x):
        # md.layernorm: fused one-pass Pallas kernel on TPU when the
        # autotune race picks it; composed (f32-stat for bf16) elsewhere
        return md.layernorm(x, params["g"], params["b"], eps=self.eps)


class RMSNorm(Module):
    """y = x / sqrt(mean(x^2) + eps) * g over the last axis (LLaMA-style:
    no centering, no bias — one fewer reduction and parameter vector than
    LayerNorm)."""

    def __init__(self, dim: int, eps: float = 1e-6,
                 dtype: "Optional[Any]" = None):
        self.dim = dim
        self.eps = eps
        self.dtype = dtype

    def init(self) -> "Dict[str, md.Tensor]":
        return {
            "g": md.Tensor(np.ones(self.dim), allow_grad=True,
                           dtype=self.dtype),
        }

    def apply(self, params, x):
        return md.rmsnorm(x, params["g"], eps=self.eps)


def _make_norm(kind: str, dim: int, dtype, eps: "Optional[float]" = None):
    if kind == "layer":
        return LayerNorm(dim, dtype=dtype, **({} if eps is None else {"eps": eps}))
    if kind == "rms":
        return RMSNorm(dim, dtype=dtype, **({} if eps is None else {"eps": eps}))
    raise ValueError(f"unknown norm kind {kind!r} (expected 'layer'/'rms')")


class MultiHeadAttention(Module):
    """Self-attention: fused QKV projection, md.sdpa core, output projection.

    Extensions over the baseline (both off by default, so the fused head-
    major TP layout and existing checkpoints are untouched):

    * ``num_kv_heads < num_heads`` — grouped-query attention: K/V use fewer
      heads (separate wq/wkv projections) and broadcast across each query
      group; shrinks the KV cache by heads/kv_heads for serving.
    * ``rope=True`` — rotary position embeddings applied to q/k with GLOBAL
      positions (so cached decode and sequence-parallel chunks are exact).
    """

    def __init__(self, dim: int, num_heads: int, causal: bool = True,
                 dtype: "Optional[Any]" = None,
                 num_kv_heads: "Optional[int]" = None,
                 rope: bool = False, rope_base: float = 10000.0,
                 window: "Optional[int]" = None, sinks: int = 0,
                 bias: bool = False, rope_dim: "Optional[int]" = None):
        assert dim % num_heads == 0, (dim, num_heads)
        self.dim = dim
        self.num_heads = num_heads
        self.head_dim = dim // num_heads
        self.causal = causal
        self.num_kv_heads = num_kv_heads or num_heads
        assert num_heads % self.num_kv_heads == 0, (num_heads, num_kv_heads)
        self.rope = rope
        self.rope_base = rope_base
        # rope_dim: PARTIAL rotary (Phi-style) — only the first rope_dim
        # channels of each head rotate (None = full head_dim)
        self.rope_dim = rope_dim
        # sliding-window attention (Mistral-style, requires causal) with
        # optional StreamingLLM attention sinks: each query sees the last
        # `window` positions plus the first `sinks` tokens.  The flash
        # kernels skip dead blocks, so long-context training costs
        # O(S*window) score FLOPs instead of O(S^2).
        if window is not None:
            assert causal, "sliding-window attention requires causal=True"
            assert int(window) >= 1, window
        self.window = None if window is None else int(window)
        self.sinks = int(sinks)
        # bias=True adds biases to every attention projection (GPT-2-style
        # checkpoints; see models/hf.py) — default off keeps existing
        # checkpoints and the bias-free TP layout untouched
        if self.num_kv_heads == num_heads:
            self.qkv = Linear(dim, 3 * dim, bias=bias, dtype=dtype)
        else:
            self.wq = Linear(dim, dim, bias=bias, dtype=dtype)
            self.wkv = Linear(dim, 2 * self.num_kv_heads * self.head_dim,
                              bias=bias, dtype=dtype)
        self.out = Linear(dim, dim, bias=bias, dtype=dtype)

    def init(self):
        if self.num_kv_heads == self.num_heads:
            return {"qkv": self.qkv.init(), "out": self.out.init()}
        return {"wq": self.wq.init(), "wkv": self.wkv.init(),
                "out": self.out.init()}

    def project_qkv(self, params, x):
        """x (b, s, d) -> q (b, h, s, hd), k/v (b, kv, s, hd)."""
        b, s, d = x.shape
        h, hd, kv = self.num_heads, self.head_dim, self.num_kv_heads
        if kv == h:
            qkv = self.qkv.apply(params["qkv"], x)  # (b, s, 3d)
            # HEAD-major column layout (h, 3, hd): a tp shard of the fused
            # weight then holds whole heads, so XLA SPMD propagates the
            # sharding through this reshape instead of all-gathering the qkv
            # activation (qkv-major would split across the q/k/v boundary:
            # tp never divides the leading factor 3)
            qkv = qkv.reshape((b, s, h, 3, hd))
            qkv = md.transpose(qkv, axes=(3, 0, 2, 1, 4))  # (3, b, h, s, hd)
            return qkv[0], qkv[1], qkv[2]
        q = self.wq.apply(params["wq"], x).reshape((b, s, h, hd))
        q = md.transpose(q, axes=(0, 2, 1, 3))  # (b, h, s, hd)
        kvp = self.wkv.apply(params["wkv"], x).reshape((b, s, kv, 2, hd))
        kvp = md.transpose(kvp, axes=(3, 0, 2, 1, 4))  # (2, b, kv, s, hd)
        return q, kvp[0], kvp[1]

    def expand_kv(self, t):
        """(b, kv, s, hd) -> (b, h, s, hd): broadcast each KV head over its
        query group (free under XLA — a broadcast + reshape, no copy)."""
        if self.num_kv_heads == self.num_heads:
            return t
        b, kv, s, hd = t.shape
        g = self.num_heads // kv
        t = md.expand_dims(t, 2)  # (b, kv, 1, s, hd)
        t = md.broadcast_to(t, (b, kv, g, s, hd))
        return t.reshape((b, self.num_heads, s, hd))

    def apply(self, params, x, positions: "Optional[md.Tensor]" = None,
              segment_ids: "Optional[md.Tensor]" = None):
        """``segment_ids`` ((B, S) int, -1 = padding): sequence packing —
        attention stays within a document (rides into the flash kernels as
        id rows, kernels/attention.py).  With RoPE, pass per-document
        ``positions`` too (models/pack.py computes both)."""
        b, s, d = x.shape
        q, k, v = self.project_qkv(params, x)
        if self.rope:
            pos = positions if positions is not None else md.arange(s)
            q = F.apply_rope(q, pos, self.rope_base, rot_dim=self.rope_dim)
            k = F.apply_rope(k, pos, self.rope_base, rot_dim=self.rope_dim)
        o = md.sdpa(q, self.expand_kv(k), self.expand_kv(v),
                    causal=self.causal, window=self.window,
                    sinks=self.sinks,
                    segment_ids=segment_ids)  # (b, h, s, hd)
        o = md.transpose(o, axes=(0, 2, 1, 3)).reshape((b, s, d))
        return self.out.apply(params["out"], o)


class TransformerBlock(Module):
    """Pre-LN block: x + MHA(LN(x)); x + MLP(LN(x)) with GELU."""

    def __init__(self, dim: int, num_heads: int, mlp_ratio: int = 4,
                 causal: bool = True, dtype: "Optional[Any]" = None,
                 num_kv_heads: "Optional[int]" = None, rope: bool = False,
                 dropout: float = 0.0, norm: str = "layer",
                 mlp: str = "gelu", window: "Optional[int]" = None,
                 sinks: int = 0, rope_base: float = 10000.0,
                 attn_bias: bool = False, mlp_bias: bool = True,
                 norm_eps: "Optional[float]" = None,
                 mlp_hidden: "Optional[int]" = None,
                 rope_dim: "Optional[int]" = None,
                 parallel_block: bool = False):
        self.ln1 = _make_norm(norm, dim, dtype, eps=norm_eps)
        self.attn = MultiHeadAttention(dim, num_heads, causal=causal,
                                       dtype=dtype, num_kv_heads=num_kv_heads,
                                       rope=rope, rope_base=rope_base,
                                       window=window, sinks=sinks,
                                       bias=attn_bias, rope_dim=rope_dim)
        # parallel_block (Phi-style): ONE shared pre-norm feeds both the
        # attention and MLP branches, x + attn(ln(x)) + mlp(ln(x)) — no ln2
        self.parallel = bool(parallel_block)
        self.ln2 = None if self.parallel else _make_norm(
            norm, dim, dtype, eps=norm_eps)
        if mlp not in ("gelu", "gelu_erf", "swiglu", "geglu", "geglu_erf"):
            raise ValueError(
                f"unknown mlp kind {mlp!r} (expected 'gelu'/'gelu_erf'/"
                "'swiglu'/'geglu'/'geglu_erf')")
        self.mlp = mlp
        # mlp_hidden overrides the ratio for checkpoints whose intermediate
        # size is not an integer multiple of dim (LLaMA-style)
        hidden = mlp_hidden if mlp_hidden is not None else mlp_ratio * dim
        # Gated kinds (SwiGLU / Gemma's GeGLU): fc1 projects to gate+value
        # (2*hidden, fused column-wise so a tp shard holds matching
        # gate/value columns), h = act(a) * b
        gated = mlp in ("swiglu", "geglu", "geglu_erf")
        self.fc1 = Linear(dim, (2 if gated else 1) * hidden,
                          bias=mlp_bias, dtype=dtype)
        self._gated = gated
        self.fc2 = Linear(hidden, dim, bias=mlp_bias, dtype=dtype)
        self.hidden = hidden
        self.dropout = float(dropout)

    def init(self):
        out = {
            "ln1": self.ln1.init(),
            "attn": self.attn.init(),
            "fc1": self.fc1.init(),
            "fc2": self.fc2.init(),
        }
        if not self.parallel:
            out["ln2"] = self.ln2.init()
        return out

    def apply_mlp(self, params, x):
        """The MLP residual BRANCH (callers add it to x): norm -> fc1 ->
        activation -> fc2.  The one home for this math — the eager step,
        compiled decode, speculative, and ring paths all call it."""
        return self.apply_mlp_normed(
            params,
            x if self.parallel else self.ln2.apply(params["ln2"], x))

    def apply_mlp_normed(self, params, z):
        """The MLP branch on an ALREADY-normed input ``z`` — the entry
        point for the fused residual-add+norm path (F.residual_norm hands
        back norm(x + a) directly, so ln2 must not run again).

        SwiGLU keeps fc1's columns PAIR-major ((hidden, 2): gate and value
        for the same hidden unit adjacent), so a tp column shard holds
        matching gate/value pairs and the elementwise silu(a)*b needs no
        collective (same trick as the qkv head-major layout)."""
        h = self.fc1.apply(params["fc1"], z)
        if self._gated:
            gate_act = {"swiglu": F.silu, "geglu": F.gelu,
                        "geglu_erf": F.gelu_erf}[self.mlp]
            hp = h.reshape(h.shape[:-1] + (self.hidden, 2))
            h = gate_act(hp[..., 0]) * hp[..., 1]
        elif self.mlp == "gelu_erf":
            h = F.gelu_erf(h)
        else:
            h = F.gelu(h)
        return self.fc2.apply(params["fc2"], h)

    def apply(self, params, x, rng: "Optional[md.Tensor]" = None,
              positions: "Optional[md.Tensor]" = None,
              segment_ids: "Optional[md.Tensor]" = None):
        """``rng``: a PRNG key Tensor (md.random_key / md.fold_in).  When
        given and ``dropout > 0``, residual-branch dropout is applied with
        masks that are pure functions of the key — so the block stays
        correctly random per step under md.jit.  ``rng=None`` = eval mode
        (no dropout), matching the functional-RNG convention.
        ``positions``/``segment_ids``: sequence packing (see
        MultiHeadAttention.apply / models/pack.py)."""
        xa = self.ln1.apply(params["ln1"], x)
        a = self.attn.apply(params["attn"], xa,
                            positions=positions, segment_ids=segment_ids)
        if self.dropout > 0.0 and rng is not None:
            a = F.dropout(a, self.dropout, key=md.fold_in(rng, 1))
        if self.parallel:
            h = self.apply_mlp(params, xa)
            if self.dropout > 0.0 and rng is not None:
                h = F.dropout(h, self.dropout, key=md.fold_in(rng, 2))
            return x + a + h
        # fused residual-add + ln2: t = x + a and norm(t) in one HBM pass
        # on TPU (md.add_layernorm / md.add_rmsnorm)
        t, z = F.residual_norm(self.ln2, params["ln2"], x, a)
        h = self.apply_mlp_normed(params, z)
        if self.dropout > 0.0 and rng is not None:
            h = F.dropout(h, self.dropout, key=md.fold_in(rng, 2))
        return t + h


class TransformerLM(Module):
    """Decoder-only LM: token + learned positional embeddings, N pre-LN
    blocks, final LayerNorm, tied-untied linear head to vocab logits."""

    def __init__(self, vocab_size: int = 256, dim: int = 128, num_heads: int = 4,
                 num_layers: int = 2, max_seq_len: int = 256, mlp_ratio: int = 4,
                 dtype: "Optional[Any]" = None, remat_blocks: bool = False,
                 num_kv_heads: "Optional[int]" = None, rope: bool = False,
                 tie_embeddings: bool = False, dropout: float = 0.0,
                 norm: str = "layer", mlp: str = "gelu",
                 window: "Optional[int]" = None, sinks: int = 0,
                 rope_base: float = 10000.0, attn_bias: bool = False,
                 mlp_bias: bool = True, norm_eps: "Optional[float]" = None,
                 mlp_hidden: "Optional[int]" = None,
                 rope_dim: "Optional[int]" = None,
                 parallel_block: bool = False, head_bias: bool = False):
        self.vocab_size = vocab_size
        self.dim = dim
        self.max_seq_len = max_seq_len
        # md.remat per block: block activations are recomputed in the VJP
        # instead of stored (gradient checkpointing at block granularity)
        self.remat_blocks = remat_blocks
        # rope=True replaces the learned absolute pos_emb with rotary
        # embeddings inside attention (no pos_emb parameter at all)
        self.rope = rope
        self.dropout = float(dropout)
        # sliding-window attention + attention sinks (see
        # MultiHeadAttention): every block shares one (window, sinks) config
        self.window = None if window is None else int(window)
        self.sinks = int(sinks)
        self.blocks = [
            TransformerBlock(dim, num_heads, mlp_ratio, causal=True,
                             dtype=dtype, num_kv_heads=num_kv_heads, rope=rope,
                             dropout=dropout, norm=norm, mlp=mlp,
                             window=window, sinks=sinks, rope_base=rope_base,
                             attn_bias=attn_bias, mlp_bias=mlp_bias,
                             norm_eps=norm_eps, mlp_hidden=mlp_hidden,
                             rope_dim=rope_dim,
                             parallel_block=parallel_block)
            for _ in range(num_layers)
        ]
        self.ln_f = _make_norm(norm, dim, dtype, eps=norm_eps)
        # tie_embeddings: logits = x @ tok_emb^T — no separate head weight;
        # the embedding gets gradient from both its uses through the tape
        self.tie_embeddings = tie_embeddings
        if tie_embeddings and head_bias:
            raise ValueError(
                "head_bias requires an untied head (tie_embeddings=False)")
        if not tie_embeddings:
            self.head = Linear(dim, vocab_size, bias=head_bias, dtype=dtype)
        self.dtype = dtype

    def lm_head(self, params, x):
        """Hidden states (..., d) -> vocab logits (..., V)."""
        if self.tie_embeddings:
            return md.matmul_nt(x, params["tok_emb"])
        return self.head.apply(params["head"], x)

    def init(self):
        scale = 1.0 / math.sqrt(self.dim)
        tok = np.random.normal(0.0, scale, (self.vocab_size, self.dim))
        params = {
            "tok_emb": md.Tensor(tok, allow_grad=True, dtype=self.dtype),
            "blocks": [blk.init() for blk in self.blocks],
            "ln_f": self.ln_f.init(),
        }
        if not self.tie_embeddings:
            params["head"] = self.head.init()
        if not self.rope:
            pos = np.random.normal(0.0, scale, (self.max_seq_len, self.dim))
            params["pos_emb"] = md.Tensor(pos, allow_grad=True,
                                          dtype=self.dtype)
        return params

    def apply(self, params, tokens, rng: "Optional[md.Tensor]" = None,
              segment_ids: "Optional[md.Tensor]" = None,
              positions: "Optional[md.Tensor]" = None):
        """tokens (B, S) int -> logits (B, S, V).

        ``rng``: PRNG key Tensor enabling dropout (train mode); each block
        folds its index off the key.  ``rng=None`` = eval (no dropout).

        ``segment_ids``/``positions`` ((B, S) int): sequence packing —
        multiple documents per row, attention confined to each document,
        positional encoding (learned or RoPE) restarting per document.
        Build both with models/pack.py::pack_documents."""
        b, s = tokens.shape
        # embedding lookups are differentiable getitem (VJP = scatter_add)
        x = params["tok_emb"][tokens]
        if not self.rope:
            if positions is not None:
                x = x + params["pos_emb"][positions]   # (B, S, d) gather
            else:
                x = x + params["pos_emb"][:s]
        for i, (blk, p) in enumerate(zip(self.blocks, params["blocks"])):
            blk_rng = None if rng is None else md.fold_in(rng, i)
            if self.remat_blocks:
                import jax as _jax

                flat, treedef = _jax.tree.flatten(
                    p, is_leaf=lambda t: isinstance(t, md.Tensor))

                if blk_rng is None:
                    def _seg(x, *leaves, _blk=blk, _treedef=treedef):
                        return _blk.apply(
                            _jax.tree.unflatten(_treedef, list(leaves)), x,
                            positions=positions, segment_ids=segment_ids)

                    x = md.remat(_seg)(x, *flat)
                else:
                    # the key rides as a tensor input, so the VJP's recompute
                    # draws the SAME mask (pure function of the key value)
                    def _seg_r(x, key, *leaves, _blk=blk, _treedef=treedef):
                        return _blk.apply(
                            _jax.tree.unflatten(_treedef, list(leaves)), x,
                            rng=key, positions=positions,
                            segment_ids=segment_ids)

                    x = md.remat(_seg_r)(x, blk_rng, *flat)
            else:
                x = blk.apply(p, x, rng=blk_rng, positions=positions,
                              segment_ids=segment_ids)
        x = self.ln_f.apply(params["ln_f"], x)
        return self.lm_head(params, x)


def lm_loss(logits: "md.Tensor", targets: "md.Tensor",
            mask: "Optional[md.Tensor]" = None) -> "md.Tensor":
    """Mean SAME-POSITION cross-entropy over (B, S, V) logits / (B, S) ids.

    For next-token training, shift at the call site:
    ``lm_loss(logits[:, :-1], tokens[:, 1:])`` — the synthetic identity task
    in this repo deliberately scores position t against token t.

    ``mask`` ((B, S), nonzero = scored): masked mean for packed/padded
    batches — positions whose next token crosses a document boundary (or is
    padding) contribute nothing (models/pack.py emits this mask).
    """
    b, s, v = logits.shape
    if mask is None:
        return F.cross_entropy(logits.reshape((b * s, v)),
                               targets.reshape((b * s,)))
    per_tok = F.cross_entropy(logits.reshape((b * s, v)),
                              targets.reshape((b * s,)), reduce=False)
    m = mask.reshape((b * s,)).astype(per_tok.dtype)
    return md.sum(per_tok * m) / md.maximum(md.sum(m),
                                            md.Tensor(1).astype(per_tok.dtype))


def perplexity(model: "TransformerLM", params, tokens: "md.Tensor",
               batch_size: int = 16) -> float:
    """exp(mean next-token NLL) of (N, S) token sequences under the model.

    Evaluates ``logits[:, :-1]`` against ``tokens[:, 1:]`` in no-grad
    minibatches; the standard held-out LM metric.
    """
    n = tokens.shape[0]
    total, count = 0.0, 0
    with md.no_grad():
        for start in range(0, n, batch_size):
            chunk = tokens[start:start + batch_size]
            logits = model.apply(params, chunk)
            nll = lm_loss(logits[:, :-1], chunk[:, 1:])
            m = chunk.shape[0]
            total += float(nll.item()) * m
            count += m
    return float(np.exp(total / py_max(count, 1)))


def synthetic_lm_batches(batch: int, seq_len: int, vocab: int, steps: int,
                         seed: int = 0):
    """Deterministic identity-task batches (targets = inputs): learnable by
    any causal LM (position t sees token t), so training-loss descent is a
    meaningful smoke signal."""
    rng = np.random.RandomState(seed)
    for _ in range(steps):
        toks = rng.randint(1, vocab, size=(batch, seq_len))
        yield md.Tensor(toks), md.Tensor(toks)


def _sample_next(last: "md.Tensor", greedy: bool, temperature: float,
                 top_k: "Optional[int]",
                 top_p: "Optional[float]" = None,
                 min_p: "Optional[float]" = None) -> "md.Tensor":
    """Next-token choice from (B, V) logits: argmax, or Gumbel-max sampling
    with temperature and optional top-k / top-p / min-p truncation (shared
    ``functional.truncate_logits`` — the same masks the compiled decode scan
    and the continuous-batching server apply)."""
    if greedy:
        return md.argmax(last, axis=-1)
    logits = last / py_max(float(temperature), 1e-6)
    logits = F.truncate_logits(logits, top_k=top_k, top_p=top_p, min_p=min_p)
    noise = -md.log(-md.log(md.rand(*logits.shape) + 1e-9) + 1e-9)
    return md.argmax(logits + noise.astype(logits.dtype), axis=-1)


def generate(model: "TransformerLM", params, prompt: "md.Tensor",
             max_new_tokens: int, greedy: bool = True,
             temperature: float = 1.0,
             top_k: "Optional[int]" = None,
             top_p: "Optional[float]" = None,
             min_p: "Optional[float]" = None) -> "md.Tensor":
    """Autoregressive decoding: append argmax (or sampled) next tokens.

    Runs the full forward per step under no_grad (each step is one
    md.jit-able forward; use ``generate_cached`` for O(S)-per-token decode).
    ``prompt`` is (B, S0) int; returns (B, S0 + max_new_tokens).
    Sampling: ``greedy=False`` draws Gumbel-max samples at ``temperature``,
    optionally truncated by top-k / nucleus top-p / min-p.
    """
    tokens = prompt
    with md.no_grad():
        for _ in range(max_new_tokens):
            window = tokens
            if window.shape[1] > model.max_seq_len:
                window = window[:, -model.max_seq_len:]
            logits = model.apply(params, window)  # (B, S, V)
            nxt = _sample_next(logits[:, -1, :], greedy, temperature, top_k,
                               top_p=top_p, min_p=min_p)
            tokens = md.concatenate(
                [tokens, md.expand_dims(nxt, -1).astype(tokens.dtype)], axis=-1
            )
    return tokens


# ---------------------------------------------------------------------------
# KV-cached decoding: O(S) per generated token instead of re-running the
# full O(S^2) forward.  Caches are plain Tensors updated through setitem
# (rebind on untracked tensors), so the step stays traceable per position.
# ---------------------------------------------------------------------------


def init_kv_cache(model: "TransformerLM", batch: int,
                  max_len: "Optional[int]" = None, dtype=None):
    """Per-block {"k","v"} buffers of shape (B, KV_HEADS, max_len, head_dim)
    (GQA caches only the kv heads — the whole point of grouped queries)."""
    max_len = max_len or model.max_seq_len
    caches = []
    for blk in model.blocks:
        kv, hd = blk.attn.num_kv_heads, blk.attn.head_dim
        zeros = md.zeros((batch, kv, max_len, hd))
        if dtype is not None:
            zeros = zeros.astype(dtype)
        caches.append({"k": zeros, "v": zeros.copy()})
    return caches


def _mha_step(attn: "MultiHeadAttention", params, x, cache, pos: int):
    """One-token attention: append k/v at ``pos``, attend over cache[:pos+1]."""
    b, one, d = x.shape
    q, k, v = attn.project_qkv(params, x)  # q (b,h,1,hd); k/v (b,kv,1,hd)
    if attn.rope:
        pos_t = md.Tensor(np.asarray(pos))
        q = F.apply_rope(q, pos_t, attn.rope_base, rot_dim=attn.rope_dim)
        k = F.apply_rope(k, pos_t, attn.rope_base, rot_dim=attn.rope_dim)
    cache["k"][:, :, pos:pos + 1, :] = k.astype(cache["k"].dtype)
    cache["v"][:, :, pos:pos + 1, :] = v.astype(cache["v"].dtype)
    keys = attn.expand_kv(cache["k"][:, :, : pos + 1, :].astype(q.dtype))
    vals = attn.expand_kv(cache["v"][:, :, : pos + 1, :].astype(q.dtype))
    # q attends over all cached positions <= pos: plain softmax attention
    # (q-length 1 — the flash kernel has nothing to tile here).  Sliding
    # window: drop cached keys older than `window` except the sink tokens.
    vis = None
    if attn.window is not None and pos + 1 > attn.window:
        idx = md.arange(pos + 1)
        vis = md.greater(idx, pos - attn.window)
        if attn.sinks:
            vis = md.logical_or(vis, md.less(idx, attn.sinks))
    o = md.sdpa(q, keys, vals, causal=False, mask=vis)
    o = md.transpose(o, axes=(0, 2, 1, 3)).reshape((b, 1, d))
    return attn.out.apply(params["out"], o)


def _block_step(blk: "TransformerBlock", params, x, cache, pos: int):
    xa = blk.ln1.apply(params["ln1"], x)
    a = _mha_step(blk.attn, params["attn"], xa, cache, pos)
    if blk.parallel:  # Phi-style: both branches read the shared pre-norm
        return x + a + blk.apply_mlp(params, xa)
    x = x + a
    return x + blk.apply_mlp(params, x)


def apply_step(model: "TransformerLM", params, token: "md.Tensor",
               caches, pos: int) -> "md.Tensor":
    """One decode step: token (B, 1) int at position ``pos`` -> logits (B, V)."""
    assert pos < model.max_seq_len, (pos, model.max_seq_len)
    x = params["tok_emb"][token]
    if not model.rope:
        x = x + params["pos_emb"][pos:pos + 1]
    for blk, p, cache in zip(model.blocks, params["blocks"], caches):
        x = _block_step(blk, p, x, cache, pos)
    x = model.ln_f.apply(params["ln_f"], x)
    return model.lm_head(params, x)[:, 0, :]


def generate_cached(model: "TransformerLM", params, prompt: "md.Tensor",
                    max_new_tokens: int) -> "md.Tensor":
    """Greedy decoding with a KV cache; matches ``generate`` token-for-token."""
    b, s0 = prompt.shape
    assert s0 >= 1, "generate_cached needs a non-empty prompt to prefill"
    assert s0 + max_new_tokens <= model.max_seq_len + 1, "cache too small"
    caches = init_kv_cache(model, b)
    tokens = prompt
    with md.no_grad():
        logits = None
        for pos in range(s0):  # prefill one token at a time
            logits = apply_step(model, params, tokens[:, pos:pos + 1], caches, pos)
        for step in range(max_new_tokens):
            nxt = md.argmax(logits, axis=-1)
            tokens = md.concatenate(
                [tokens, md.expand_dims(nxt, -1).astype(tokens.dtype)], axis=-1
            )
            if step == max_new_tokens - 1:
                break
            logits = apply_step(
                model, params, tokens[:, -1:], caches, s0 + step
            )
    return tokens
