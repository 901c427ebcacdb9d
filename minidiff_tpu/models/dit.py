"""Diffusion Transformer (DiT) with rectified-flow training and sampling.

A generative-vision family over the shared attention stack: images
patchify into tokens (reusing vit.patchify — a pure layout change), run
through **adaLN-Zero** DiT blocks (Peebles & Xie's conditioning: each
block modulates a parameter-free LayerNorm with shift/scale/gate vectors
regressed from the conditioning embedding, gates initialized to ZERO so
every block starts as identity), and project back to patch pixels.

Training is **rectified flow** (flow matching): draw t ~ U(0,1), noise
eps ~ N(0,1), interpolate x_t = (1-t)·x0 + t·eps, and regress the
constant-velocity field v = eps − x0 with MSE.  Straight-path flow
matching needs no noise schedule and samples with a plain ODE
integrator.

Sampling integrates dx/dt = −v̂(x, t) from t=1 (noise) to t=0 (data) by
Euler steps — on the xla backend as ONE compiled ``jax.lax.scan``
program (the serving-path discipline of models/decode.py), eagerly
elsewhere.

No reference counterpart (/root/reference has no models layer); extends
the SURVEY §8 model-family rows.  TPU-first choices: everything is
static-shape framework ops (the timestep embedding is a fixed sinusoid
table contraction, conditioning is data not control flow), so the whole
sampler lowers to one XLA program; normalization rides the fused
md.layernorm kernel.
"""

from __future__ import annotations

import math
from typing import TYPE_CHECKING

import numpy as np

import minidiff_tpu as md
from minidiff_tpu.models import functional as F
from minidiff_tpu.models.layers import Linear, Module
from minidiff_tpu.models.transformer import MultiHeadAttention
from minidiff_tpu.models.vit import patchify

if TYPE_CHECKING:
    from typing import Any, Dict, Optional

__all__ = ["DiT", "unpatchify", "flow_matching_loss", "sample_flow",
           "timestep_embedding"]


def unpatchify(tokens: "md.Tensor", patch: int, h: int, w: int,
               c: int) -> "md.Tensor":
    """(B, H/p * W/p, p*p*C) -> (B, H, W, C): inverse of vit.patchify."""
    b = tokens.shape[0]
    gh, gw = h // patch, w // patch
    x = tokens.reshape((b, gh, gw, patch, patch, c))
    x = md.transpose(x, axes=(0, 1, 3, 2, 4, 5))  # (b, gh, p, gw, p, c)
    return x.reshape((b, h, w, c))


def timestep_embedding(t: "md.Tensor", dim: int,
                       max_period: float = 10000.0) -> "md.Tensor":
    """Sinusoidal features of t (B,) in [0, 1] -> (B, dim).

    Static frequency table contracted against the traced t — no
    data-dependent shapes, so samplers jit cleanly.
    """
    half = dim // 2
    freqs = md.Tensor(
        np.exp(-math.log(max_period) * np.arange(half) / half))
    args = md.expand_dims(t.astype(freqs.dtype), -1) * freqs  # (B, half)
    emb = md.concat([md.cos(args), md.sin(args)], axis=-1)
    if dim % 2:
        emb = md.concat([emb, md.zeros((t.shape[0], 1))], axis=-1)
    return emb


def _modulate(x: "md.Tensor", shift: "md.Tensor",
              scale: "md.Tensor") -> "md.Tensor":
    """adaLN: parameter-free LayerNorm then x̂·(1+scale)+shift, with the
    per-sample (B, d) modulation broadcast over tokens."""
    ones = md.ones((x.shape[-1],)).astype(x.dtype)
    zeros = md.zeros((x.shape[-1],)).astype(x.dtype)
    xn = md.layernorm(x, ones, zeros)
    return xn * (1.0 + md.expand_dims(scale, 1)) + md.expand_dims(shift, 1)


class DiTBlock(Module):
    """Pre-LN block with adaLN-Zero conditioning: the conditioning vector
    regresses (shift, scale, gate) for both the attention and MLP halves;
    gates start at zero, so an untrained block is the identity map."""

    def __init__(self, dim: int, num_heads: int, mlp_ratio: int = 4,
                 dtype: "Optional[Any]" = None):
        self.dim = dim
        self.attn = MultiHeadAttention(dim, num_heads, causal=False,
                                       dtype=dtype)
        self.fc1 = Linear(dim, mlp_ratio * dim, dtype=dtype)
        self.fc2 = Linear(mlp_ratio * dim, dim, dtype=dtype)
        self.mod = Linear(dim, 6 * dim, dtype=dtype)

    def init(self) -> "Dict[str, Any]":
        p = {
            "attn": self.attn.init(),
            "fc1": self.fc1.init(),
            "fc2": self.fc2.init(),
            "mod": self.mod.init(),
        }
        # adaLN-Zero: zero the modulation head so shift=scale=gate=0 at
        # init — each residual branch starts disabled
        p["mod"]["w"] = md.zeros_like(p["mod"]["w"]).detach(allow_grad=True)
        p["mod"]["b"] = md.zeros_like(p["mod"]["b"]).detach(allow_grad=True)
        return p

    def apply(self, params, x, c):
        """x (B, T, d) tokens; c (B, d) conditioning."""
        b, _, d = x.shape
        mod = self.mod.apply(params["mod"], F.silu(c))  # (B, 6d)
        mod = mod.reshape((b, 6, d))
        sh1, sc1, g1 = mod[:, 0], mod[:, 1], mod[:, 2]
        sh2, sc2, g2 = mod[:, 3], mod[:, 4], mod[:, 5]
        a = self.attn.apply(params["attn"], _modulate(x, sh1, sc1))
        x = x + md.expand_dims(g1, 1) * a
        h = F.gelu(self.fc1.apply(params["fc1"], _modulate(x, sh2, sc2)))
        h = self.fc2.apply(params["fc2"], h)
        return x + md.expand_dims(g2, 1) * h


class DiT(Module):
    """Class-conditional (optional) rectified-flow image model."""

    def __init__(self, image_size: int = 32, patch_size: int = 4,
                 in_channels: int = 3, dim: int = 192, num_heads: int = 3,
                 num_layers: int = 6, mlp_ratio: int = 4,
                 num_classes: int = 0, dtype: "Optional[Any]" = None):
        if image_size % patch_size:
            raise ValueError("image_size must be divisible by patch_size")
        self.image_size = image_size
        self.patch_size = patch_size
        self.in_channels = in_channels
        self.dim = dim
        self.num_classes = num_classes
        self.num_patches = (image_size // patch_size) ** 2
        self.patch_dim = patch_size * patch_size * in_channels
        self.embed = Linear(self.patch_dim, dim, dtype=dtype)
        self.t_mlp1 = Linear(dim, dim, dtype=dtype)
        self.t_mlp2 = Linear(dim, dim, dtype=dtype)
        self.blocks = [DiTBlock(dim, num_heads, mlp_ratio, dtype=dtype)
                       for _ in range(num_layers)]
        self.final_mod = Linear(dim, 2 * dim, dtype=dtype)
        self.final = Linear(dim, self.patch_dim, dtype=dtype)
        self.dtype = dtype

    def init(self) -> "Dict[str, Any]":
        scale = 1.0 / math.sqrt(self.dim)
        p = {
            "embed": self.embed.init(),
            "pos_emb": md.Tensor(
                np.random.normal(0.0, scale,
                                 (self.num_patches, self.dim)),
                allow_grad=True, dtype=self.dtype),
            "t_mlp1": self.t_mlp1.init(),
            "t_mlp2": self.t_mlp2.init(),
            "blocks": [blk.init() for blk in self.blocks],
            "final_mod": self.final_mod.init(),
            "final": self.final.init(),
        }
        if self.num_classes:
            p["cls_emb"] = md.Tensor(
                np.random.normal(0.0, scale,
                                 (self.num_classes, self.dim)),
                allow_grad=True, dtype=self.dtype)
        # zero-init the final projection and its modulation: the model
        # starts by predicting v=0 everywhere (adaLN-Zero discipline)
        p["final"]["w"] = md.zeros_like(p["final"]["w"]).detach(
            allow_grad=True)
        p["final"]["b"] = md.zeros_like(p["final"]["b"]).detach(
            allow_grad=True)
        p["final_mod"]["w"] = md.zeros_like(p["final_mod"]["w"]).detach(
            allow_grad=True)
        p["final_mod"]["b"] = md.zeros_like(p["final_mod"]["b"]).detach(
            allow_grad=True)
        return p

    def apply(self, params, x_t, t, labels=None):
        """x_t (B, H, W, C) noisy images; t (B,) times in [0, 1];
        labels (B,) int (required iff num_classes > 0).  Returns the
        predicted velocity field, same shape as x_t."""
        b, h, w, c = x_t.shape
        tok = self.embed.apply(params["embed"],
                               patchify(x_t, self.patch_size))
        tok = tok + params["pos_emb"]
        cond = self.t_mlp2.apply(
            params["t_mlp2"],
            F.silu(self.t_mlp1.apply(
                params["t_mlp1"],
                timestep_embedding(t, self.dim).astype(tok.dtype))))
        if self.num_classes:
            if labels is None:
                raise ValueError("class-conditional DiT needs labels")
            cond = cond + params["cls_emb"][labels]
        for blk, bp in zip(self.blocks, params["blocks"]):
            tok = blk.apply(bp, tok, cond)
        fm = self.final_mod.apply(params["final_mod"], F.silu(cond))
        fm = fm.reshape((b, 2, self.dim))
        tok = _modulate(tok, fm[:, 0], fm[:, 1])
        out = self.final.apply(params["final"], tok)
        return unpatchify(out, self.patch_size, h, w, c)


def flow_matching_loss(model: "DiT", params, x0: "md.Tensor",
                       key: "md.Tensor", labels=None) -> "md.Tensor":
    """Rectified-flow objective: E ||v̂((1−t)x0 + t·eps, t) − (eps − x0)||².

    ``key`` is a PRNG key Tensor (md.random_key / md.fold_in), so the
    noise/time draws are pure functions of it — correct under md.jit
    (the functional-RNG convention of models/functional.dropout).
    """
    from minidiff_tpu.random import random_normal, random_uniform

    b = x0.shape[0]
    k_t, k_e = md.split_key(key, 2)
    t = random_uniform(k_t, (b,)).astype(x0.dtype)
    eps = random_normal(k_e, x0.shape).astype(x0.dtype)
    t4 = t.reshape((b, 1, 1, 1))
    x_t = (1.0 - t4) * x0 + t4 * eps
    v = model.apply(params, x_t, t, labels=labels)
    return F.mse(v, eps - x0)


def sample_flow(model: "DiT", params, key: "md.Tensor", n: int,
                steps: int = 50, labels=None) -> "md.Tensor":
    """Euler-integrate dx/dt = −v̂ from t=1 (noise) to t=0: n samples.

    On the xla backend the whole integration is ONE ``md.scan`` program —
    ``steps`` sequential model forwards in a single dispatch; eager loop
    on other backends.
    """
    import minidiff_tpu.backend as backend

    from minidiff_tpu.random import random_normal

    s = model.image_size
    shape = (n, s, s, model.in_channels)
    x = random_normal(key, shape)
    if model.dtype is not None:
        x = x.astype(model.dtype)
    dt = 1.0 / steps
    ts = md.Tensor(np.linspace(1.0, dt, steps))  # t at each Euler step

    def euler(p, x, t_scalar):
        tb = md.broadcast_to(t_scalar.reshape((1,)), (n,)).astype(x.dtype)
        return x - dt * model.apply(p, x, tb, labels=labels)

    with md.no_grad():
        if backend.backend_name() == "xla":
            import jax

            leaves, treedef = jax.tree.flatten(
                params, is_leaf=lambda t: isinstance(t, md.Tensor))

            def scan_step(carry, t_scalar, *flat):
                p = jax.tree.unflatten(treedef, flat)
                nxt = euler(p, carry, t_scalar)
                return nxt, t_scalar  # ys unused (scalar, negligible)

            x, _ = md.scan(scan_step)(x, ts, *leaves)
        else:
            for i in range(steps):
                x = euler(params, x, ts[i])
    return x
