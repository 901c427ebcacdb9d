"""Mixture-of-Experts transformer — the expert-parallel model family.

The reference has no models layer at all (SURVEY.md §1 "no L6"); this module
extends the framework the way models/transformer.py does, adding the one model
shape that exercises *expert parallelism* (the ``ep`` mesh axis).

TPU-first routing design (Switch/GShard style, static shapes throughout):

* top-k routing with a fixed per-expert **capacity** C, so every shape is
  known at trace time — no dynamic gather/scatter, nothing XLA can't tile.
* dispatch and combine are one-hot **tensordot contractions** (MXU work),
  not scatter ops: ``expert_in = tensordot(dispatch, tokens)`` and
  ``y = tensordot(combine, expert_out)``.
* per-token queue positions come from ``md.cumsum`` over the one-hot
  assignment matrix — a parallel prefix scan, not a Python loop.
* all experts run as ONE batched matmul pair ``(E, C, d) @ (E, d, ff)`` —
  stacked expert weights keep the MXU busy and shard cleanly on ``ep``
  (PartitionSpec("ep", None, None)); XLA SPMD inserts the all-to-all-shaped
  collectives from the shardings alone.

Gradient flow matches the standard router formulation: the one-hot dispatch
masks are non-differentiable (built from argmax/equal, which the op registry
marks non-diff), while the combine weights carry the softmax gate so the
router learns through the tape like any other parameter.
"""

from __future__ import annotations

import math
from typing import TYPE_CHECKING

import numpy as np

import minidiff_tpu as md
from minidiff_tpu.models import functional as F
from minidiff_tpu.models.layers import Module
from minidiff_tpu.models.transformer import (
    LayerNorm,
    MultiHeadAttention,
    _make_norm,
    lm_loss,
)

if TYPE_CHECKING:
    from typing import Any, Dict, Optional, Tuple


class MoEFeedForward(Module):
    """Top-k routed expert FFNs replacing a transformer block's dense MLP.

    ``apply_with_aux`` returns ``(y, aux)`` where ``aux`` is the Switch
    load-balancing loss ``E * sum_e f_e * P_e`` (f_e = fraction of tokens
    whose first choice is expert e, P_e = mean router probability); ``apply``
    drops the aux term for inference call sites.
    """

    def __init__(self, dim: int, num_experts: int, mlp_ratio: int = 4,
                 k: int = 1, capacity_factor: float = 1.25,
                 dtype: "Optional[Any]" = None,
                 grouped: "Optional[bool]" = None,
                 mlp: str = "gelu", mlp_hidden: "Optional[int]" = None,
                 bias: bool = True, renorm_gates: bool = False):
        assert 1 <= k <= num_experts, (k, num_experts)
        if mlp not in ("gelu", "swiglu"):
            raise ValueError(
                f"unknown expert mlp kind {mlp!r} (expected 'gelu'/'swiglu')")
        self.dim = dim
        self.num_experts = num_experts
        self.ff = mlp_hidden if mlp_hidden is not None else mlp_ratio * dim
        self.k = k
        self.capacity_factor = capacity_factor
        self.dtype = dtype
        # swiglu experts (Mixtral-style): w1 projects to gate+value pairs
        # (PAIR-major fused columns, the dense-block trick that keeps
        # silu(a)*b collective-free under tp); bias=False drops b1/b2.
        self.mlp = mlp
        self.bias = bool(bias)
        # renorm_gates (Mixtral routing): the k selected gates are divided
        # by their sum, so combine weights sum to 1 per token — HF's
        # softmax-all -> top-k -> renormalize is algebraically the same.
        self.renorm_gates = bool(renorm_gates)
        # grouped=True routes by gather/scatter tables instead of the
        # (T, E, C) one-hot tensordots: the dense dispatch costs
        # 2*T*(E*C)*d ≈ 2.5*k*T^2*d FLOPs — at T ≈ 8d it matches the
        # experts themselves and grows with E*C regardless of sparsity.
        # The gather path moves O(k*T*d) bytes and adds zero matmul FLOPs.
        # None = auto: grouped once the expert count is large enough for
        # the dense masks to matter; the one-hot path stays as the oracle.
        self.grouped = bool(num_experts >= 8) if grouped is None else grouped

    def init(self) -> "Dict[str, Any]":
        d, e, ff = self.dim, self.num_experts, self.ff
        b1 = 1.0 / math.sqrt(d)
        b2 = 1.0 / math.sqrt(ff)
        w1_cols = 2 * ff if self.mlp == "swiglu" else ff
        experts: "Dict[str, Any]" = {
            "w1": md.Tensor(np.random.uniform(-b1, b1, (e, d, w1_cols)),
                            allow_grad=True, dtype=self.dtype),
            "w2": md.Tensor(np.random.uniform(-b2, b2, (e, ff, d)),
                            allow_grad=True, dtype=self.dtype),
        }
        if self.bias:
            experts["b1"] = md.Tensor(np.zeros((e, w1_cols)),
                                      allow_grad=True, dtype=self.dtype)
            experts["b2"] = md.Tensor(np.zeros((e, d)), allow_grad=True,
                                      dtype=self.dtype)
        return {
            "router": {"w": md.Tensor(
                np.random.uniform(-b1, b1, (d, e)), allow_grad=True,
                dtype=self.dtype)},
            "experts": experts,
        }

    def capacity(self, tokens: int) -> int:
        return max(1, math.ceil(self.capacity_factor * self.k * tokens
                                / self.num_experts))

    def _routing_choices(self, params, xt, c):
        """Shared top-k queue arithmetic.

        Returns ``(choices, aux)``: a list of per-choice tuples
        ``(idx (T,), oh (T, E) f32, gate (T, 1), pos_tok (T,), keep (T,))``
        and the load-balancing aux loss.  ALL position/queue arithmetic
        runs in f32 regardless of
        model dtype (a bf16 cumsum loses integer exactness past 256,
        silently colliding tokens onto the same capacity slot).
        """
        e = self.num_experts
        probs = F.softmax(xt @ params["router"]["w"], axis=-1)  # (T, E)
        f32 = md.float32
        remaining = probs
        counts = md.zeros((1, e)).astype(f32)  # tokens queued per expert
        choices = []
        first_choice = None
        for _ in range(self.k):
            idx = md.argmax(remaining, axis=-1)
            oh = F.one_hot(idx, e).astype(f32)  # (T, E) non-diff
            if first_choice is None:
                first_choice = oh
            gate = md.sum(probs * oh.astype(probs.dtype), axis=-1,
                          keepdims=True)  # (T, 1)
            # queue position of each token within its expert (prefix count of
            # earlier tokens routed to the same expert, + prior choices' load)
            pos = md.cumsum(oh, axis=0) - oh + counts  # (T, E)
            counts = counts + md.sum(oh, axis=0, keepdims=True)
            pos_tok = md.sum(pos * oh, axis=-1)  # (T,)
            keep = md.less(pos_tok, float(c)).astype(f32)  # capacity drop
            choices.append((idx, oh, gate, pos_tok, keep))
            remaining = remaining * (1 - oh.astype(probs.dtype))

        if self.renorm_gates:
            # Mixtral routing: the k selected probabilities renormalize to
            # sum 1 per token (BEFORE capacity-keep masking — drops zero a
            # term but never rescale the survivors, matching HF's
            # no-capacity formulation when nothing drops)
            total = choices[0][2]
            for ch in choices[1:]:
                total = total + ch[2]
            choices = [(idx, oh, gate / total, pos_tok, keep)
                       for idx, oh, gate, pos_tok, keep in choices]

        frac = md.mean(first_choice, axis=0).astype(probs.dtype)  # f_e
        mean_prob = md.mean(probs, axis=0)    # P_e
        aux = md.sum(frac * mean_prob) * float(e)
        return choices, aux

    def compute_routing(self, params, xt, c):
        """Route flat tokens ``xt`` (T, d) into capacity slots.

        Returns ``(dispatch, combine, aux)``: the (T, E, C) one-hot dispatch
        mask (f32, non-diff), the gate-weighted (T, E, C) combine weights
        (diff through the router softmax), and the Switch load-balancing
        aux loss.  Shared by the single-device ``apply_with_aux`` and the
        expert-parallel all_to_all path (parallel/moe_ep.py), which differ
        only in where the dispatched slots are contracted.
        """
        t = xt.shape[0]
        choices, aux = self._routing_choices(params, xt, c)
        dispatch = None  # (T, E, C) one-hot, non-diff
        combine = None   # (T, E, C) gate-weighted, diff through probs
        for _, oh, gate, pos_tok, keep in choices:
            poh = F.one_hot(pos_tok, c).astype(md.float32)  # (T, C)
            disp = (md.expand_dims(oh, -1) * md.expand_dims(poh, 1)
                    * keep.reshape((t, 1, 1)))  # (T, E, C) in f32
            dispatch = disp if dispatch is None else dispatch + disp
            comb = disp.astype(gate.dtype) * gate.reshape((t, 1, 1))
            combine = comb if combine is None else combine + comb
        return dispatch, combine, aux

    def compute_routing_sparse(self, params, xt, c):
        """Route into SLOT IDS instead of one-hot masks (the grouped path).

        Returns ``(choices, aux)`` with one ``(slot (T,) int, gatekeep
        (T, 1))`` pair per top-k choice: ``slot = expert * C + queue_pos``
        for kept tokens, or the dump slot ``E * C`` for capacity-dropped
        ones; ``gatekeep`` is the router gate zeroed for drops.  Slots of
        kept tokens are globally unique across choices (the queue counts
        carry over), which is what makes the gather/scatter dispatch
        exact.
        """
        choices, aux = self._routing_choices(params, xt, c)
        e = self.num_experts
        out = []
        for idx, _, gate, pos_tok, keep in choices:
            slot = (idx.astype(md.float32) * float(c) + pos_tok)
            slot = md.where(keep > 0.5, slot, md.full_like(slot,
                                                           float(e * c)))
            out.append((slot.astype(md.int32),
                        gate * keep.reshape(gate.shape).astype(gate.dtype)))
        return out, aux

    def _experts_forward(self, params, expert_in):
        """Stacked expert FFNs: (E, C, d) -> (E, C, d), one batched matmul
        pair on the MXU.  swiglu kind: w1's columns are PAIR-major
        gate/value (h = silu(a) * b), matching the dense SwiGLU layout."""
        ep = params["experts"]
        if "w1_q" in ep:
            # int8-quantized bank (models.quant.quantize_for_serving):
            # HBM streams int8 expert slices through the batched dequant
            # kernel — the bank IS the dominant MoE serving stream
            h = md.dequant_matmul_bmm(expert_in, ep["w1_q"], ep["w1_s"])
        else:
            h = md.matmul(expert_in, ep["w1"])
        if "b1" in ep:
            h = h + md.expand_dims(ep["b1"], 1)
        if self.mlp == "swiglu":
            hp = h.reshape(h.shape[:-1] + (self.ff, 2))
            h = F.silu(hp[..., 0]) * hp[..., 1]
        else:
            h = F.gelu(h)
        if "w2_q" in ep:
            out = md.dequant_matmul_bmm(h, ep["w2_q"], ep["w2_s"])
        else:
            out = md.matmul(h, ep["w2"])
        if "b2" in ep:
            out = out + md.expand_dims(ep["b2"], 1)
        return out

    def apply_with_aux(self, params, x) -> "Tuple[md.Tensor, md.Tensor]":
        b, s, d = x.shape
        t = b * s
        c = self.capacity(t)
        xt = x.reshape((t, d))
        if self.grouped:
            y, aux = self._apply_grouped(params, xt, c)
            return y.reshape((b, s, d)), aux
        dispatch, combine, aux = self.compute_routing(params, xt, c)

        # dispatch: (T, E, C) x (T, d) -> (E, C, d); one MXU contraction
        dispatch = dispatch.astype(xt.dtype)
        expert_in = md.tensordot(dispatch, xt, axes=([0], [0]))
        out = self._experts_forward(params, expert_in)  # (E, C, d)
        # combine: (T, E, C) x (E, C, d) -> (T, d)
        y = md.tensordot(combine, out, axes=([1, 2], [0, 1]))
        return y.reshape((b, s, d)), aux

    def dispatch_grouped(self, params, xt, c):
        """Gather-based dispatch: ``(expert_in (E, C, d), choices, aux)``.

        A slot-to-token table sends each capacity slot to the row that
        fills it (or to an appended zero row for empty slots), so the
        expert input is ONE differentiable row gather.  Bit-identical to
        the one-hot dispatch (each kept slot is hit by exactly one token)
        at O(k*T*d) moved bytes and zero dispatch FLOPs — vs the dense
        masks' 2.5*k*T^2*d.  The int tables are non-differentiable;
        gradients flow through the gather (scatter-add transpose) exactly
        as in the dense formulation.  Shared by the single-device grouped
        path and the expert-parallel all_to_all path (parallel/moe_ep.py).
        """
        t, d = xt.shape
        e = self.num_experts
        choices, aux = self.compute_routing_sparse(params, xt, c)
        # token-for-slot table: full(T) marks empty -> appended zero row
        tfs = md.full((e * c + 1,), float(t)).astype(md.int32)
        tok_ids = md.arange(t).astype(md.int32)
        for slot, _ in choices:
            # each kept slot is hit once; dump-slot collisions are sliced
            # off below
            md.index_add(tfs, slot, tok_ids - t)
        xz = md.concat([xt, md.zeros((1, d)).astype(xt.dtype)], axis=0)
        expert_in = xz[tfs[:e * c]].reshape((e, c, d))
        return expert_in, choices, aux

    def combine_grouped(self, choices, out):
        """Gather-based combine: one expert-output gather per top-k choice,
        weighted by the gate; ``out`` is the (E, C, d) expert outputs."""
        e, c, d = out.shape
        out_flat = md.concat([out.reshape((e * c, d)),
                              md.zeros((1, d)).astype(out.dtype)], axis=0)
        y = None
        for slot, gatekeep in choices:
            contrib = out_flat[slot] * gatekeep.astype(out.dtype)
            y = contrib if y is None else y + contrib
        return y

    def _apply_grouped(self, params, xt, c):
        """Grouped routing: gather dispatch -> stacked experts -> gather
        combine (see dispatch_grouped for the cost argument)."""
        expert_in, choices, aux = self.dispatch_grouped(params, xt, c)
        out = self._experts_forward(params, expert_in)   # (E, C, d)
        return self.combine_grouped(choices, out), aux

    def apply(self, params, x):
        y, _ = self.apply_with_aux(params, x)
        return y


class MoETransformerBlock(Module):
    """Pre-LN block: x + MHA(LN(x)); x + MoE(LN(x)).

    Duck-types the dense ``TransformerBlock`` serving contract (``ln1`` /
    ``attn`` / ``ln2`` / ``apply_mlp`` / ``apply_mlp_normed``), so every
    cached-decode path — ``functional.block_qkv`` + ``block_finish``,
    eager KV steps, the compiled decode scan, DecodeServer — runs MoE
    blocks unchanged; the MoE FFN simply replaces the dense MLP branch.
    The dense-block attention options (GQA, RoPE, RMSNorm, sliding
    window, biases) pass straight through to ``MultiHeadAttention``.
    """

    def __init__(self, dim: int, num_heads: int, num_experts: int,
                 mlp_ratio: int = 4, k: int = 1,
                 capacity_factor: float = 1.25, causal: bool = True,
                 dtype: "Optional[Any]" = None,
                 grouped: "Optional[bool]" = None,
                 norm: str = "layer", norm_eps: "Optional[float]" = None,
                 num_kv_heads: "Optional[int]" = None, rope: bool = False,
                 rope_base: float = 10000.0,
                 window: "Optional[int]" = None, sinks: int = 0,
                 attn_bias: bool = False, mlp: str = "gelu",
                 mlp_hidden: "Optional[int]" = None, mlp_bias: bool = True,
                 renorm_gates: bool = False):
        self.ln1 = _make_norm(norm, dim, dtype, eps=norm_eps)
        self.attn = MultiHeadAttention(dim, num_heads, causal=causal,
                                       dtype=dtype,
                                       num_kv_heads=num_kv_heads, rope=rope,
                                       rope_base=rope_base, window=window,
                                       sinks=sinks, bias=attn_bias)
        self.ln2 = _make_norm(norm, dim, dtype, eps=norm_eps)
        self.parallel = False  # serving-contract attr (no Phi-style MoE)
        self.moe = MoEFeedForward(dim, num_experts, mlp_ratio, k,
                                  capacity_factor, dtype=dtype,
                                  grouped=grouped, mlp=mlp,
                                  mlp_hidden=mlp_hidden, bias=mlp_bias,
                                  renorm_gates=renorm_gates)

    def init(self):
        return {
            "ln1": self.ln1.init(),
            "attn": self.attn.init(),
            "ln2": self.ln2.init(),
            "moe": self.moe.init(),
        }

    def apply_mlp_normed(self, params, z):
        """The MoE residual branch on an already-normed (b, s, d) input —
        the ``block_finish`` entry point (aux dropped: inference sites)."""
        return self.moe.apply(params["moe"], z)

    def apply_mlp(self, params, x):
        return self.apply_mlp_normed(params,
                                     self.ln2.apply(params["ln2"], x))

    def apply_with_aux(self, params, x):
        xa = self.ln1.apply(params["ln1"], x)
        a = self.attn.apply(params["attn"], xa)
        # fused residual-add + ln2 (one HBM pass on TPU), mirroring the
        # dense TransformerBlock.apply
        t, z = F.residual_norm(self.ln2, params["ln2"], x, a)
        y, aux = self.moe.apply_with_aux(params["moe"], z)
        return t + y, aux

    def apply(self, params, x):
        y, _ = self.apply_with_aux(params, x)
        return y


class MoETransformerLM(Module):
    """Decoder-only LM with MoE feed-forward blocks (expert-parallel ready).

    ``apply`` returns logits (decode path, reuses transformer.generate's
    contract); ``apply_with_aux`` returns (logits, total_aux) for training
    with the load-balancing term (see ``make_moe_loss``).
    """

    def __init__(self, vocab_size: int = 256, dim: int = 128,
                 num_heads: int = 4, num_layers: int = 2,
                 num_experts: int = 4, max_seq_len: int = 256,
                 mlp_ratio: int = 4, k: int = 1,
                 capacity_factor: float = 1.25,
                 dtype: "Optional[Any]" = None,
                 grouped: "Optional[bool]" = None,
                 norm: str = "layer", norm_eps: "Optional[float]" = None,
                 num_kv_heads: "Optional[int]" = None, rope: bool = False,
                 rope_base: float = 10000.0,
                 window: "Optional[int]" = None, sinks: int = 0,
                 attn_bias: bool = False, mlp: str = "gelu",
                 mlp_hidden: "Optional[int]" = None, mlp_bias: bool = True,
                 renorm_gates: bool = False):
        self.vocab_size = vocab_size
        self.dim = dim
        self.max_seq_len = max_seq_len
        self.num_experts = num_experts
        # serving-contract attributes (decode_program / DecodeServer read
        # these off the model exactly as for TransformerLM)
        self.rope = rope
        self.window = None if window is None else int(window)
        self.sinks = int(sinks)
        self.tie_embeddings = False
        self.blocks = [
            MoETransformerBlock(dim, num_heads, num_experts, mlp_ratio, k,
                                capacity_factor, causal=True, dtype=dtype,
                                grouped=grouped, norm=norm,
                                norm_eps=norm_eps,
                                num_kv_heads=num_kv_heads, rope=rope,
                                rope_base=rope_base, window=window,
                                sinks=sinks, attn_bias=attn_bias, mlp=mlp,
                                mlp_hidden=mlp_hidden, mlp_bias=mlp_bias,
                                renorm_gates=renorm_gates)
            for _ in range(num_layers)
        ]
        self.ln_f = _make_norm(norm, dim, dtype, eps=norm_eps)
        from minidiff_tpu.models.layers import Linear

        self.head = Linear(dim, vocab_size, bias=False, dtype=dtype)
        self.dtype = dtype

    def lm_head(self, params, x):
        """Hidden states (..., d) -> vocab logits (..., V)."""
        return self.head.apply(params["head"], x)

    def init(self):
        scale = 1.0 / math.sqrt(self.dim)
        tok = np.random.normal(0.0, scale, (self.vocab_size, self.dim))
        params = {
            "tok_emb": md.Tensor(tok, allow_grad=True, dtype=self.dtype),
            "blocks": [blk.init() for blk in self.blocks],
            "ln_f": self.ln_f.init(),
            "head": self.head.init(),
        }
        if not self.rope:
            pos = np.random.normal(0.0, scale,
                                   (self.max_seq_len, self.dim))
            params["pos_emb"] = md.Tensor(pos, allow_grad=True,
                                          dtype=self.dtype)
        return params

    def apply_with_aux(self, params, tokens):
        b, s = tokens.shape
        x = params["tok_emb"][tokens]
        if not self.rope:
            x = x + params["pos_emb"][:s]
        aux_total = None
        for blk, p in zip(self.blocks, params["blocks"]):
            x, aux = blk.apply_with_aux(p, x)
            aux_total = aux if aux_total is None else aux_total + aux
        x = self.ln_f.apply(params["ln_f"], x)
        return self.lm_head(params, x), aux_total

    def apply(self, params, tokens):
        logits, _ = self.apply_with_aux(params, tokens)
        return logits


def make_moe_loss(aux_coef: float = 0.01):
    """Loss for apply_with_aux outputs: lm_loss(logits) + aux_coef * aux.

    Pass as ``loss_fn`` together with ``apply_fn=model.apply_with_aux`` to
    models.make_train_step / parallel.make_sharded_train_step.
    """

    def loss(output, targets):
        logits, aux = output
        return lm_loss(logits, targets) + aux.astype(logits.dtype) * aux_coef

    return loss
