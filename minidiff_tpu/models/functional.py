"""NN functional ops composed from the base op registry.

Everything here is built from differentiable framework ops, so gradients
(including higher-order) come from the tape with no extra VJP rules, and the
whole thing fuses under md.jit.
"""

from __future__ import annotations

from typing import TYPE_CHECKING

import minidiff_tpu as md

if TYPE_CHECKING:
    from typing import Optional, Union


def relu(x: "md.Tensor") -> "md.Tensor":
    return md.clip(x, 0.0, None)


def sigmoid(x: "md.Tensor") -> "md.Tensor":
    # tanh form: stable in forward AND backward for any |x| (1/(1+exp(-x))
    # overflows exp at x < -88 in f32 and its VJP produces 0 * inf = NaN)
    return 0.5 * (md.tanh(x * 0.5) + 1.0)


def silu(x: "md.Tensor") -> "md.Tensor":
    """x * sigmoid(x) (a.k.a. swish) — the SwiGLU gate activation."""
    return x * sigmoid(x)


def gelu(x: "md.Tensor") -> "md.Tensor":
    # tanh approximation (HF "gelu_new"/"gelu_pytorch_tanh")
    c = 0.7978845608028654  # sqrt(2/pi)
    return 0.5 * x * (1.0 + md.tanh(c * (x + 0.044715 * x**3)))


def gelu_erf(x: "md.Tensor") -> "md.Tensor":
    """Exact GELU 0.5*x*(1+erf(x/sqrt(2))) — Gemma/original-BERT variant."""
    return 0.5 * x * (1.0 + md.erf(x * 0.7071067811865476))


def logsumexp(z: "md.Tensor", axis: int = -1, keepdims: bool = False) -> "md.Tensor":
    m = md.max(z, axis=axis, keepdims=True)
    out = md.log(md.sum(md.exp(z - m), axis=axis, keepdims=True)) + m
    if not keepdims:
        out = md.squeeze(out, axis=axis)
    return out


def softmax(z: "md.Tensor", axis: int = -1) -> "md.Tensor":
    m = md.max(z, axis=axis, keepdims=True)
    e = md.exp(z - m)
    return e / md.sum(e, axis=axis, keepdims=True)


def log_softmax(z: "md.Tensor", axis: int = -1) -> "md.Tensor":
    return z - logsumexp(z, axis=axis, keepdims=True)


def one_hot(labels: "md.Tensor", num_classes: int) -> "md.Tensor":
    classes = md.arange(num_classes)
    return md.equal(md.expand_dims(labels, -1), classes).astype(md.float32)


def cross_entropy(logits: "md.Tensor", labels: "md.Tensor",
                  reduce: bool = True) -> "md.Tensor":
    """Mean softmax cross-entropy (``reduce=False``: per-example losses).

    ``labels`` may be integer class ids — routed through ``md.softmax_xent``
    (the fused one-pass loss kernel on TPU) — or a one-hot / soft-label
    matrix (composed log-softmax path).
    """
    if labels.ndim == logits.ndim:
        logp = log_softmax(logits, axis=-1)
        per = -md.sum(labels * logp, axis=-1)
    else:
        per = md.softmax_xent(logits, labels)
    return md.mean(per) if reduce else per


def apply_rope(x: "md.Tensor", positions: "md.Tensor",
               base: float = 10000.0,
               rot_dim: "Optional[int]" = None) -> "md.Tensor":
    """Rotary position embedding over the last axis of x (b, h, s, hd).

    ``positions`` is an int Tensor of shape (s,) (or a scalar for one-token
    decode steps, or (b, s) when rows sit at different global positions —
    speculative verification, packed sequences) giving each slot's GLOBAL
    position — which is what makes RoPE work unchanged for KV-cached decode
    and ring/sequence-parallel chunks.  Pairs (x[2i], x[2i+1]) rotate by
    positions * base^(-2i/hd); built from differentiable framework ops, so
    it backprops through the tape like everything else.

    ``rot_dim``: PARTIAL rotary (Phi-style) — only the first ``rot_dim``
    channels of each head rotate, the rest pass through unchanged.  The
    rotation frequencies span ``rot_dim`` (not hd), matching the HF
    convention ``inv_freq = base^(-2i/rot_dim)``.
    """
    b, h, s, hd = x.shape
    if rot_dim is not None and rot_dim != hd:
        assert 0 < rot_dim < hd and rot_dim % 2 == 0, (rot_dim, hd)
        xr = apply_rope(x[..., :rot_dim], positions, base)
        return md.concat([xr, x[..., rot_dim:]], axis=-1)
    assert hd % 2 == 0, "RoPE needs an even head dim"
    half = hd // 2
    # inv_freq: (half,); angles: (s, half) (scalar positions broadcast)
    inv_freq = md.power(float(base), md.arange(half).astype(x.dtype)
                        * (-2.0 / hd))
    pos = positions.astype(x.dtype)
    if pos.ndim == 0:
        pos = pos.reshape((1,))
    angles = md.expand_dims(pos, -1) * inv_freq  # (s, half) or (b, s, half)
    if angles.ndim == 3:
        cos = md.cos(angles).reshape((b, 1, s, half))
        sin = md.sin(angles).reshape((b, 1, s, half))
    else:
        cos = md.cos(angles).reshape((1, 1, s, half))
        sin = md.sin(angles).reshape((1, 1, s, half))
    xr = x.reshape((b, h, s, half, 2))
    x1 = xr[..., 0]
    x2 = xr[..., 1]
    o1 = x1 * cos - x2 * sin
    o2 = x1 * sin + x2 * cos
    out = md.concat([md.expand_dims(o1, -1), md.expand_dims(o2, -1)], axis=-1)
    return out.reshape((b, h, s, hd))


def truncate_logits(logits: "md.Tensor",
                    top_k: "Optional[int]" = None,
                    top_p: "Optional[float]" = None,
                    min_p: "Optional[float]" = None) -> "md.Tensor":
    """Sampling truncation over (..., V) logits in framework ops.

    Applies, in order (HuggingFace's processor order): top-k (keep the k
    highest logits), top-p / nucleus (keep the smallest prefix of the
    probability-sorted vocabulary whose mass reaches ``top_p``), and min-p
    (keep tokens whose probability is at least ``min_p`` times the max
    token's).  Removed entries become -1e30, so a Gumbel-max or softmax draw
    downstream never selects them.  Every branch is trace-friendly (static
    shapes, no host sync): the per-row thresholds are reductions, the masks
    are ``md.where`` — the same code serves the eager samplers, the compiled
    decode scan, and the continuous-batching server.

    The argmax token always survives (top-p keeps the first sorted token
    unconditionally; min-p's threshold is <= the max probability), so the
    result always has at least one finite entry per row.
    """
    neg = None
    if top_k is not None and top_k < logits.shape[-1]:
        vals, _ = md.topk(logits, top_k, axis=-1)
        neg = md.full_like(logits, -1e30)
        logits = md.where(logits >= vals[..., -1:], logits, neg)
    if top_p is not None and float(top_p) < 1.0:
        probs = softmax(logits.astype(md.float32), axis=-1)
        desc = md.flip(md.sort(probs, axis=-1), axis=-1)
        cum = md.cumsum(desc, axis=-1)
        # keep sorted position j iff the mass strictly BEFORE it is < top_p;
        # position 0 has zero mass before it, so the argmax always survives
        keep = (cum - desc) < float(top_p)
        # per-row probability threshold = smallest kept probability (probs
        # are <= 1, so 2.0 marks dropped slots out of the min)
        thresh = md.min(md.where(keep, desc, md.full_like(desc, 2.0)),
                        axis=-1, keepdims=True)
        neg = md.full_like(logits, -1e30) if neg is None else neg
        logits = md.where(probs >= thresh, logits, neg)
    if min_p is not None and float(min_p) > 0.0:
        probs = softmax(logits.astype(md.float32), axis=-1)
        mx = md.max(probs, axis=-1, keepdims=True)
        neg = md.full_like(logits, -1e30) if neg is None else neg
        logits = md.where(probs >= float(min_p) * mx, logits, neg)
    return logits


def mse(pred: "md.Tensor", target: "md.Tensor") -> "md.Tensor":
    return md.mean((pred - target) ** 2)


def accuracy(logits: "md.Tensor", labels: "md.Tensor") -> float:
    pred = md.argmax(logits, axis=-1)
    return float(md.mean(md.equal(pred, labels).astype(md.float32)).item())


def max_pool2d(x: "md.Tensor", window: int = 2) -> "md.Tensor":
    """Non-overlapping max pooling over NHWC via reshape + md.max.

    Composed entirely from existing differentiable ops (no pooling primitive
    needed): (B, H, W, C) -> (B, H/w, w, W/w, w, C) -> max over the two
    window axes.  H and W must be divisible by ``window``.
    """
    b, h, w, c = x.shape
    assert h % window == 0 and w % window == 0, (x.shape, window)
    x = x.reshape((b, h // window, window, w // window, window, c))
    return md.max(x, axis=(2, 4))


def avg_pool2d(x: "md.Tensor", window: int = 2) -> "md.Tensor":
    b, h, w, c = x.shape
    assert h % window == 0 and w % window == 0, (x.shape, window)
    x = x.reshape((b, h // window, window, w // window, window, c))
    return md.mean(x, axis=(2, 4))


def dropout(x: "md.Tensor", rate: float,
            key: "Optional[Union[md.Tensor, int]]" = None,
            deterministic: bool = False,
            mask: "Optional[md.Tensor]" = None) -> "md.Tensor":
    """Inverted dropout built from framework ops.

    Randomness sources, in priority order:
    * ``mask``: a caller-supplied boolean keep-mask Tensor.
    * ``key``: a **PRNG key Tensor** (``md.random_key`` / ``md.fold_in``) —
      the jit-correct form: the mask is a pure function of the key, so a
      compiled train step that takes the key as an input draws a fresh mask
      every call.  An ``int`` key is also accepted for a reproducible eager
      mask (NOTE: under md.jit an int key bakes ONE mask into the trace).
    * neither: a draw from the stateful library RNG (eager use only — under
      md.jit this also becomes a trace-time constant).
    """
    if deterministic or rate <= 0.0:
        return x
    if rate >= 1.0:
        return md.zeros_like(x)
    if mask is None:
        if isinstance(key, md.Tensor):
            from minidiff_tpu.random import random_uniform

            mask = random_uniform(key, x.shape) >= rate
        elif key is None:
            mask = md.rand(*x.shape) >= rate
        else:
            import numpy as _np

            bits = _np.random.RandomState(key).random_sample(x.shape)
            mask = md.Tensor(bits) >= rate
    return x * mask.astype(x.dtype) / (1.0 - rate)


def block_qkv(blk, params, x, positions=None):
    """Pre-LN QKV projection for one TransformerBlock: ln1 -> fused qkv
    projection (+RoPE at ``positions``).  The one home for this math —
    shared by the eager KV-cache step, compiled decode, and speculative
    chunk forwards, which differ only in how they store/read the cache.

    ``positions``: None (parallel forward over ``arange(s)``), a scalar or
    1-D position Tensor, or a (b, s) per-row table — whatever
    ``apply_rope`` accepts.  Returns q (b, h, s, hd), k/v (b, kv, s, hd).
    """
    attn = blk.attn
    xa = blk.ln1.apply(params["ln1"], x)
    q, k, v = attn.project_qkv(params["attn"], xa)
    if attn.rope:
        pos = positions if positions is not None else md.arange(x.shape[1])
        q = apply_rope(q, pos, attn.rope_base, rot_dim=attn.rope_dim)
        k = apply_rope(k, pos, attn.rope_base, rot_dim=attn.rope_dim)
    return q, k, v


def residual_norm(norm, params, x, a):
    """``(t, z) = (x + a, norm(x + a))`` via the fused add+norm op.

    On TPU the fused Pallas kernel writes both the summed residual stream
    and its norm in ONE pass (the separate add's write + norm's re-read of
    the stream was the LN sites' measured bandwidth overhang); elsewhere
    the backend computes the same stacked pair composed.  ``norm`` is a
    LayerNorm or RMSNorm module; higher-order grads re-tape through the
    composed VJPs like every other op."""
    from minidiff_tpu.models.transformer import RMSNorm

    if isinstance(norm, RMSNorm):
        pair = md.add_rmsnorm(x, a, params["g"], eps=norm.eps)
    else:
        pair = md.add_layernorm(x, a, params["g"], params["b"],
                                eps=norm.eps)
    return pair[0], pair[1]


def block_finish(blk, params, x, o):
    """Close a TransformerBlock around attention output ``o`` (b, h, s, hd):
    merge heads, out-projection residual, then the block's MLP residual
    (GELU or SwiGLU — ``blk.apply_mlp`` owns that choice).  Counterpart of
    ``block_qkv`` for the cached forwards."""
    b, h, s, hd = o.shape
    o = md.transpose(o, axes=(0, 2, 1, 3)).reshape((b, s, h * hd))
    a = blk.attn.out.apply(params["attn"]["out"], o)
    if getattr(blk, "parallel", False):
        # Phi-style parallel residual: both branches read the SAME ln1(x);
        # recomputing the norm here keeps block_qkv's signature shared by
        # every cached-decode path (one extra LN per block, negligible)
        xa = blk.ln1.apply(params["ln1"], x)
        return x + a + blk.apply_mlp(params, xa)
    t, z = residual_norm(blk.ln2, params["ln2"], x, a)
    return t + blk.apply_mlp_normed(params, z)
