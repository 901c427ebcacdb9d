"""Vision Transformer (ViT) classification family.

Reuses the transformer stack (pre-LN blocks, md.sdpa flash attention) with a
vision front end: images are cut into non-overlapping patches, linearly
embedded, prefixed with a learned [CLS] token, and offset by learned
positional embeddings; the final [CLS] state feeds the classification head.

TPU-first choices:
* Patchify is pure data movement — reshape + transpose that XLA folds into
  the embedding matmul's input layout (no conv, no gather): an (B, H, W, C)
  image becomes (B, N_patches, P*P*C) with two reshapes and one transpose.
* Attention is non-causal md.sdpa, so the flash Pallas kernels apply as-is
  for flash-eligible head dims.
* Everything differentiable through the tape; trains with the same
  make_train_step / optimizers / mixed precision as the LM family.

No reference counterpart: /root/reference has no models layer (SURVEY §2.2);
this extends the beyond-reference model zoo of SURVEY §8.
"""

from __future__ import annotations

import math
from typing import TYPE_CHECKING

import numpy as np

import minidiff_tpu as md
from minidiff_tpu.models import functional as F
from minidiff_tpu.models.layers import Linear, Module
from minidiff_tpu.models.transformer import LayerNorm, TransformerBlock

if TYPE_CHECKING:
    from typing import Any, Dict, Optional

__all__ = ["ViT", "patchify"]


def patchify(images: "md.Tensor", patch: int) -> "md.Tensor":
    """(B, H, W, C) -> (B, H/p * W/p, p*p*C) non-overlapping patches.

    Pure reshape/transpose — lowers to a layout change XLA fuses into the
    consuming matmul rather than a materialized copy.
    """
    b, h, w, c = images.shape
    if h % patch or w % patch:
        raise ValueError(
            f"image size {(h, w)} not divisible by patch size {patch}")
    gh, gw = h // patch, w // patch
    x = images.reshape((b, gh, patch, gw, patch, c))
    x = md.transpose(x, axes=(0, 1, 3, 2, 4, 5))  # (b, gh, gw, p, p, c)
    return x.reshape((b, gh * gw, patch * patch * c))


class ViT(Module):
    """ViT-style classifier: patch embed + [CLS] + pre-LN encoder blocks."""

    def __init__(self, image_size: int = 32, patch_size: int = 4,
                 in_channels: int = 3, num_classes: int = 10,
                 dim: int = 192, num_heads: int = 3, num_layers: int = 6,
                 mlp_ratio: int = 4, dropout: float = 0.0,
                 dtype: "Optional[Any]" = None):
        if image_size % patch_size:
            raise ValueError("image_size must be divisible by patch_size")
        self.image_size = image_size
        self.patch_size = patch_size
        self.in_channels = in_channels
        self.num_classes = num_classes
        self.dim = dim
        self.num_patches = (image_size // patch_size) ** 2
        self.patch_embed = Linear(patch_size * patch_size * in_channels, dim,
                                  dtype=dtype)
        self.blocks = [
            TransformerBlock(dim, num_heads, mlp_ratio, causal=False,
                             dtype=dtype, dropout=dropout)
            for _ in range(num_layers)
        ]
        self.ln_f = LayerNorm(dim, dtype=dtype)
        self.head = Linear(dim, num_classes, dtype=dtype)
        self.dropout = float(dropout)
        self.dtype = dtype

    def init(self) -> "Dict[str, Any]":
        scale = 1.0 / math.sqrt(self.dim)
        return {
            "patch_embed": self.patch_embed.init(),
            "cls": md.Tensor(
                np.random.normal(0.0, scale, (1, 1, self.dim)),
                allow_grad=True, dtype=self.dtype),
            "pos_emb": md.Tensor(
                np.random.normal(
                    0.0, scale, (1, self.num_patches + 1, self.dim)),
                allow_grad=True, dtype=self.dtype),
            "blocks": [blk.init() for blk in self.blocks],
            "ln_f": self.ln_f.init(),
            "head": self.head.init(),
        }

    def apply(self, params: "Dict[str, Any]", images: "md.Tensor",
              rng: "Optional[md.Tensor]" = None) -> "md.Tensor":
        """images (B, H, W, C) -> class logits (B, num_classes).

        ``rng``: PRNG key Tensor for dropout (functional-RNG convention —
        None = eval mode), forwarded per block via md.fold_in.
        """
        b = images.shape[0]
        x = self.patch_embed.apply(params["patch_embed"],
                                   patchify(images, self.patch_size))
        cls = md.broadcast_to(params["cls"], (b, 1, self.dim))
        x = md.concat([cls, x], axis=1) + params["pos_emb"]
        if self.dropout > 0.0 and rng is not None:
            x = F.dropout(x, self.dropout, key=md.fold_in(rng, 0))
        for i, blk in enumerate(self.blocks):
            r = md.fold_in(rng, i + 1) if rng is not None else None
            x = blk.apply(params["blocks"][i], x, rng=r)
        x = self.ln_f.apply(params["ln_f"], x)
        return self.head.apply(params["head"], x[:, 0, :])
