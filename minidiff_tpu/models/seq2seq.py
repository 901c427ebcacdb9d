"""Encoder-decoder transformer (seq2seq) — the cross-attention family.

Completes the architecture coverage next to the decoder-only LM: a
bidirectional encoder over the source sequence, a causal decoder whose
blocks interleave self-attention with **cross-attention** into the encoder
memory (``md.sdpa`` with q from the decoder, k/v from the encoder — the
same differentiable core, so the whole model trains through the tape and
compiles under md.jit).
"""

from __future__ import annotations

import math
from typing import TYPE_CHECKING

import numpy as np

import minidiff_tpu as md
from minidiff_tpu.models import functional as F
from minidiff_tpu.models.layers import Linear, Module
from minidiff_tpu.models.transformer import (LayerNorm, MultiHeadAttention,
                                              TransformerBlock)

if TYPE_CHECKING:
    from typing import Any, Dict, Optional


class CrossAttention(Module):
    """Queries from x, keys/values from an encoder memory."""

    def __init__(self, dim: int, num_heads: int, dtype: "Optional[Any]" = None):
        assert dim % num_heads == 0
        self.dim = dim
        self.num_heads = num_heads
        self.head_dim = dim // num_heads
        self.wq = Linear(dim, dim, bias=False, dtype=dtype)
        self.wkv = Linear(dim, 2 * dim, bias=False, dtype=dtype)
        self.out = Linear(dim, dim, bias=False, dtype=dtype)

    def init(self):
        return {"wq": self.wq.init(), "wkv": self.wkv.init(),
                "out": self.out.init()}

    def apply(self, params, x, memory):
        b, sq, d = x.shape
        sk = memory.shape[1]
        h, hd = self.num_heads, self.head_dim
        q = self.wq.apply(params["wq"], x).reshape((b, sq, h, hd))
        q = md.transpose(q, axes=(0, 2, 1, 3))  # (b, h, sq, hd)
        kv = self.wkv.apply(params["wkv"], memory).reshape((b, sk, h, 2, hd))
        kv = md.transpose(kv, axes=(3, 0, 2, 1, 4))  # (2, b, h, sk, hd)
        o = md.sdpa(q, kv[0], kv[1], causal=False)  # every q sees all memory
        o = md.transpose(o, axes=(0, 2, 1, 3)).reshape((b, sq, d))
        return self.out.apply(params["out"], o)


class EncoderBlock(TransformerBlock):
    """Pre-LN bidirectional block: exactly TransformerBlock(causal=False)
    (subclass, not a copy, so the block math exists once)."""

    def __init__(self, dim: int, num_heads: int, mlp_ratio: int = 4,
                 dtype: "Optional[Any]" = None):
        super().__init__(dim, num_heads, mlp_ratio, causal=False, dtype=dtype)


class DecoderBlock(Module):
    """Pre-LN: causal self-attn, cross-attn into memory, MLP."""

    def __init__(self, dim: int, num_heads: int, mlp_ratio: int = 4,
                 dtype: "Optional[Any]" = None):
        self.ln1 = LayerNorm(dim, dtype=dtype)
        self.self_attn = MultiHeadAttention(dim, num_heads, causal=True,
                                            dtype=dtype)
        self.ln2 = LayerNorm(dim, dtype=dtype)
        self.cross = CrossAttention(dim, num_heads, dtype=dtype)
        self.ln3 = LayerNorm(dim, dtype=dtype)
        self.fc1 = Linear(dim, mlp_ratio * dim, dtype=dtype)
        self.fc2 = Linear(mlp_ratio * dim, dim, dtype=dtype)

    def init(self):
        return {"ln1": self.ln1.init(), "self_attn": self.self_attn.init(),
                "ln2": self.ln2.init(), "cross": self.cross.init(),
                "ln3": self.ln3.init(), "fc1": self.fc1.init(),
                "fc2": self.fc2.init()}

    def apply(self, params, x, memory):
        x = x + self.self_attn.apply(params["self_attn"],
                                     self.ln1.apply(params["ln1"], x))
        x = x + self.cross.apply(params["cross"],
                                 self.ln2.apply(params["ln2"], x), memory)
        h = F.gelu(self.fc1.apply(params["fc1"], self.ln3.apply(params["ln3"], x)))
        return x + self.fc2.apply(params["fc2"], h)


class Seq2SeqTransformer(Module):
    """Encoder-decoder: encode(src) -> memory; decode(tgt | memory) -> logits.

    ``apply(params, (src, tgt))`` returns (B, S_tgt, V_tgt) logits for
    teacher-forced training; ``greedy_decode`` runs inference.
    """

    def __init__(self, src_vocab: int, tgt_vocab: int, dim: int = 64,
                 num_heads: int = 4, enc_layers: int = 2, dec_layers: int = 2,
                 max_src_len: int = 64, max_tgt_len: int = 64,
                 mlp_ratio: int = 4, dtype: "Optional[Any]" = None):
        self.src_vocab = src_vocab
        self.tgt_vocab = tgt_vocab
        self.dim = dim
        self.max_src_len = max_src_len
        self.max_tgt_len = max_tgt_len
        self.enc_blocks = [EncoderBlock(dim, num_heads, mlp_ratio, dtype)
                           for _ in range(enc_layers)]
        self.dec_blocks = [DecoderBlock(dim, num_heads, mlp_ratio, dtype)
                           for _ in range(dec_layers)]
        self.enc_ln = LayerNorm(dim, dtype=dtype)
        self.dec_ln = LayerNorm(dim, dtype=dtype)
        self.head = Linear(dim, tgt_vocab, bias=False, dtype=dtype)
        self.dtype = dtype

    def init(self) -> "Dict[str, Any]":
        s = 1.0 / math.sqrt(self.dim)

        def emb(n):
            return md.Tensor(np.random.normal(0.0, s, (n, self.dim)),
                             allow_grad=True, dtype=self.dtype)

        return {
            "src_emb": emb(self.src_vocab),
            "src_pos": emb(self.max_src_len),
            "tgt_emb": emb(self.tgt_vocab),
            "tgt_pos": emb(self.max_tgt_len),
            "enc": [b.init() for b in self.enc_blocks],
            "dec": [b.init() for b in self.dec_blocks],
            "enc_ln": self.enc_ln.init(),
            "dec_ln": self.dec_ln.init(),
            "head": self.head.init(),
        }

    def encode(self, params, src):
        b, s = src.shape
        x = params["src_emb"][src] + params["src_pos"][:s]
        for blk, p in zip(self.enc_blocks, params["enc"]):
            x = blk.apply(p, x)
        return self.enc_ln.apply(params["enc_ln"], x)

    def decode(self, params, tgt, memory):
        b, s = tgt.shape
        x = params["tgt_emb"][tgt] + params["tgt_pos"][:s]
        for blk, p in zip(self.dec_blocks, params["dec"]):
            x = blk.apply(p, x, memory)
        x = self.dec_ln.apply(params["dec_ln"], x)
        return self.head.apply(params["head"], x)

    def apply(self, params, batch):
        src, tgt = batch
        return self.decode(params, tgt, self.encode(params, src))


def seq2seq_loss(logits: "md.Tensor", tgt_out: "md.Tensor") -> "md.Tensor":
    b, s, v = logits.shape
    return F.cross_entropy(logits.reshape((b * s, v)), tgt_out.reshape((b * s,)))


def greedy_decode(model: "Seq2SeqTransformer", params, src: "md.Tensor",
                  max_len: int, bos_id: int = 1,
                  eos_id: "Optional[int]" = None) -> "md.Tensor":
    """Greedy seq2seq inference: encode once, grow the target left to right."""
    b = src.shape[0]
    with md.no_grad():
        memory = model.encode(params, src)
        tgt = md.Tensor(np.full((b, 1), bos_id, dtype=np.int64))
        for _ in range(max_len):
            logits = model.decode(params, tgt, memory)
            nxt = md.argmax(logits[:, -1, :], axis=-1)
            tgt = md.concatenate(
                [tgt, md.expand_dims(nxt, -1).astype(tgt.dtype)], axis=-1
            )
            if eos_id is not None:
                arr = np.asarray(nxt.detach())
                if (arr == eos_id).all():
                    break
    return tgt
