"""UNet2D: the convolutional diffusion backbone.

Complements ``models/dit.py`` (the transformer backbone) so both standard
denoiser families exist: time-conditioned residual conv blocks over an
encoder/decoder with skip connections, GroupNorm, and spatial
self-attention at the bottleneck.  The model exposes the same
``apply(params, x_t, t, labels=None)`` contract plus ``image_size`` /
``in_channels`` / ``dtype`` attributes as DiT, so ``flow_matching_loss``
and ``sample_flow`` drive it unchanged (rectified-flow training and the
one-``md.scan`` compiled Euler sampler).

TPU-idiomatic choices:
- NHWC layout throughout (``md.conv2d``'s native layout — channels on the
  128-lane axis);
- downsample = stride-2 conv, upsample = nearest-neighbor via
  reshape+concat+reshape (pure differentiable framework ops, no gather);
- GroupNorm as a reshape + mean/var over (H, W, C/G) — two reductions XLA
  fuses with the surrounding elementwise work;
- FiLM time conditioning: each ResBlock regresses a per-channel
  (scale, shift) from the time embedding, zero-init so conditioning
  starts as identity (the adaLN-Zero discipline from DiT).

No reference counterpart: /root/reference has no models layer; extends
SURVEY §8's model families (generative vision row).
"""

from __future__ import annotations

import math
from typing import TYPE_CHECKING

import numpy as np

import minidiff_tpu as md
from minidiff_tpu.models.cnn import Conv2d
from minidiff_tpu.models.dit import timestep_embedding
from minidiff_tpu.models.functional import silu
from minidiff_tpu.models.layers import Linear, Module
from minidiff_tpu.models.transformer import MultiHeadAttention

if TYPE_CHECKING:
    from typing import Any, Dict, Optional

__all__ = ["UNet2D", "group_norm", "upsample2x"]


def group_norm(x: "md.Tensor", g: "md.Tensor", b: "md.Tensor",
               groups: int, eps: float = 1e-5) -> "md.Tensor":
    """GroupNorm over NHWC: normalize each of ``groups`` channel groups
    over (H, W, C/G), then per-channel affine."""
    bsz, h, w, c = x.shape
    cg = c // groups
    xg = x.reshape((bsz, h, w, groups, cg))
    mu = md.mean(xg, axis=(1, 2, 4), keepdims=True)
    var = md.mean((xg - mu) ** 2, axis=(1, 2, 4), keepdims=True)
    xn = ((xg - mu) / md.sqrt(var + eps)).reshape((bsz, h, w, c))
    return xn * g + b


def upsample2x(x: "md.Tensor") -> "md.Tensor":
    """Nearest-neighbor 2x spatial upsample in framework ops (NHWC)."""
    bsz, h, w, c = x.shape
    r = x.reshape((bsz, h, 1, w, 1, c))
    r = md.concat((r, r), axis=2)
    r = md.concat((r, r), axis=4)
    return r.reshape((bsz, 2 * h, 2 * w, c))


def _pick_groups(c: int, want: int = 8) -> int:
    """Largest divisor of ``c`` that is <= ``want`` (GroupNorm's reshape
    needs groups | channels; min(want, c) alone breaks e.g. c=12, want=8)."""
    g = min(want, c)
    while c % g:
        g -= 1
    return g


def _norm_params(c: int, dtype) -> "Dict[str, md.Tensor]":
    return {
        "g": md.Tensor(np.ones(c), allow_grad=True, dtype=dtype),
        "b": md.Tensor(np.zeros(c), allow_grad=True, dtype=dtype),
    }


class ResBlock(Module):
    """GN -> silu -> conv, FiLM time conditioning, GN -> silu -> conv,
    residual (1x1 projection when the channel count changes)."""

    def __init__(self, in_ch: int, out_ch: int, t_dim: int, groups: int = 8,
                 dtype: "Optional[Any]" = None):
        self.in_ch, self.out_ch = in_ch, out_ch
        self.groups_in = _pick_groups(in_ch, groups)
        self.groups_out = _pick_groups(out_ch, groups)
        self.conv1 = Conv2d(in_ch, out_ch, 3, padding=1, dtype=dtype)
        self.conv2 = Conv2d(out_ch, out_ch, 3, padding=1, dtype=dtype)
        self.time = Linear(t_dim, 2 * out_ch, dtype=dtype)
        self.skip = (Conv2d(in_ch, out_ch, 1, dtype=dtype)
                     if in_ch != out_ch else None)
        self.dtype = dtype

    def init(self) -> "Dict[str, Any]":
        p = {
            "gn1": _norm_params(self.in_ch, self.dtype),
            "conv1": self.conv1.init(),
            "time": self.time.init(),
            "gn2": _norm_params(self.out_ch, self.dtype),
            "conv2": self.conv2.init(),
        }
        # zero-init FiLM: conditioning starts as identity (adaLN-Zero
        # discipline), so the untrained block is a plain res block
        p["time"]["w"] = md.Tensor(
            np.zeros((self.time.in_features, 2 * self.out_ch)),
            allow_grad=True, dtype=self.dtype)
        p["time"]["b"] = md.Tensor(np.zeros(2 * self.out_ch),
                                   allow_grad=True, dtype=self.dtype)
        if self.skip is not None:
            p["skip"] = self.skip.init()
        return p

    def apply(self, params, x, temb):
        h = group_norm(x, params["gn1"]["g"], params["gn1"]["b"],
                       self.groups_in)
        h = self.conv1.apply(params["conv1"], silu(h))
        ss = self.time.apply(params["time"], silu(temb))  # (B, 2*out_ch)
        scale = md.expand_dims(md.expand_dims(ss[:, :self.out_ch], 1), 1)
        shift = md.expand_dims(md.expand_dims(ss[:, self.out_ch:], 1), 1)
        h = group_norm(h, params["gn2"]["g"], params["gn2"]["b"],
                       self.groups_out)
        h = h * (1.0 + scale) + shift
        h = self.conv2.apply(params["conv2"], silu(h))
        if self.skip is not None:
            x = self.skip.apply(params["skip"], x)
        return x + h


class SpatialAttention(Module):
    """Self-attention over flattened (H*W) positions — the bottleneck
    global mixer; rides md.sdpa (flash-eligible on TPU)."""

    def __init__(self, ch: int, num_heads: int = 4, groups: int = 8,
                 dtype: "Optional[Any]" = None):
        self.ch = ch
        self.groups = _pick_groups(ch, groups)
        self.attn = MultiHeadAttention(ch, num_heads, causal=False,
                                       dtype=dtype)
        self.dtype = dtype

    def init(self) -> "Dict[str, Any]":
        return {"gn": _norm_params(self.ch, self.dtype),
                "attn": self.attn.init()}

    def apply(self, params, x):
        bsz, h, w, c = x.shape
        xn = group_norm(x, params["gn"]["g"], params["gn"]["b"], self.groups)
        tokens = xn.reshape((bsz, h * w, c))
        out = self.attn.apply(params["attn"], tokens)
        return x + out.reshape((bsz, h, w, c))


class UNet2D(Module):
    """Encoder/decoder denoiser: stem conv, per-resolution ResBlocks with
    stride-2 downsampling, ResBlock+attention+ResBlock bottleneck, skip
    concatenation on the way up, GN+conv head (zero-init: the untrained
    model predicts zero velocity)."""

    def __init__(self, image_size: int = 32, in_channels: int = 3,
                 base: int = 32, channel_mults=(1, 2), t_dim: int = 128,
                 num_classes: int = 0, attn_heads: int = 4,
                 dtype: "Optional[Any]" = None):
        assert image_size % (2 ** (len(channel_mults) - 1)) == 0
        self.image_size = image_size
        self.in_channels = in_channels
        self.num_classes = num_classes
        self.t_dim = t_dim
        self.dtype = dtype
        chans = [base * m for m in channel_mults]
        self.stem = Conv2d(in_channels, chans[0], 3, padding=1, dtype=dtype)
        self.t1 = Linear(t_dim, t_dim, dtype=dtype)
        self.t2 = Linear(t_dim, t_dim, dtype=dtype)
        self.down_res = []
        self.down_conv = []
        for i, ch in enumerate(chans):
            prev = chans[max(i - 1, 0)]
            self.down_res.append(ResBlock(prev if i else chans[0], ch,
                                          t_dim, dtype=dtype))
            if i < len(chans) - 1:
                self.down_conv.append(
                    Conv2d(ch, ch, 3, stride=2, padding=1, dtype=dtype))
        mid = chans[-1]
        self.mid1 = ResBlock(mid, mid, t_dim, dtype=dtype)
        self.mid_attn = SpatialAttention(mid, attn_heads, dtype=dtype)
        self.mid2 = ResBlock(mid, mid, t_dim, dtype=dtype)
        self.up_res = []
        self.up_conv = []
        for i in reversed(range(len(chans))):
            # input = upsampled features + same-resolution skip
            self.up_res.append(ResBlock(chans[i] * 2, chans[i], t_dim,
                                        dtype=dtype))
            if i > 0:
                self.up_conv.append(Conv2d(chans[i], chans[i - 1], 3,
                                           padding=1, dtype=dtype))
        self.head = Conv2d(chans[0], in_channels, 3, padding=1, dtype=dtype)
        self.chans = chans

    def init(self) -> "Dict[str, Any]":
        p: dict = {
            "stem": self.stem.init(),
            "t1": self.t1.init(),
            "t2": self.t2.init(),
            "down_res": [r.init() for r in self.down_res],
            "down_conv": [c.init() for c in self.down_conv],
            "mid1": self.mid1.init(),
            "mid_attn": self.mid_attn.init(),
            "mid2": self.mid2.init(),
            "up_res": [r.init() for r in self.up_res],
            "up_conv": [c.init() for c in self.up_conv],
            "gn_out": _norm_params(self.chans[0], self.dtype),
            "head": self.head.init(),
        }
        # zero-init head: untrained velocity prediction is exactly zero
        k = self.head.kernel_size
        p["head"]["w"] = md.Tensor(
            np.zeros((k, k, self.chans[0], self.in_channels)),
            allow_grad=True, dtype=self.dtype)
        p["head"]["b"] = md.Tensor(np.zeros(self.in_channels),
                                   allow_grad=True, dtype=self.dtype)
        if self.num_classes:
            scale = 1.0 / math.sqrt(self.t_dim)
            p["cls_emb"] = md.Tensor(
                np.random.normal(0.0, scale, (self.num_classes, self.t_dim)),
                allow_grad=True, dtype=self.dtype)
        return p

    def apply(self, params, x_t, t, labels=None):
        """x_t (B, S, S, C) at times t (B,) in [0, 1] -> velocity field."""
        temb = timestep_embedding(t, self.t_dim)
        if self.dtype is not None:
            temb = temb.astype(self.dtype)
        temb = self.t2.apply(params["t2"],
                             silu(self.t1.apply(params["t1"], temb)))
        if self.num_classes:
            if labels is None:
                raise ValueError("class-conditional UNet2D needs labels")
            temb = temb + params["cls_emb"][labels]

        h = self.stem.apply(params["stem"], x_t)
        skips = []
        for i, res in enumerate(self.down_res):
            h = res.apply(params["down_res"][i], h, temb)
            skips.append(h)
            if i < len(self.down_conv):
                h = self.down_conv[i].apply(params["down_conv"][i], h)
        h = self.mid1.apply(params["mid1"], h, temb)
        h = self.mid_attn.apply(params["mid_attn"], h)
        h = self.mid2.apply(params["mid2"], h, temb)
        for j, res in enumerate(self.up_res):
            skip = skips[len(skips) - 1 - j]
            if h.shape[1] != skip.shape[1]:
                h = upsample2x(h)
            h = res.apply(params["up_res"][j],
                          md.concat((h, skip), axis=-1), temb)
            if j < len(self.up_conv):
                h = self.up_conv[j].apply(params["up_conv"][j], h)
        h = group_norm(h, params["gn_out"]["g"], params["gn_out"]["b"],
                       _pick_groups(self.chans[0]))
        return self.head.apply(params["head"], silu(h))
