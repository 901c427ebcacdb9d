"""Post-training weight-only int8 quantization for serving.

Decode on TPU is HBM-bound: every generated token re-reads every weight
matrix, so serving latency tracks the weight stream's byte count.
``quantize_for_serving`` rewrites a trained parameter tree so each large
2-D Linear weight ``{"w": (K, N)}`` becomes ``{"w_q": int8, "w_s": f32}``
(symmetric per-output-channel scales), which ``layers.Linear.apply``
dispatches through the fused ``md.dequant_matmul`` op — int8 HBM reads,
in-VMEM dequantize, f32 MXU accumulation (kernels/quant.py).

What gets quantized: 2-D ``"w"`` entries with at least ``min_elements``
parameters — the attention qkv/out projections, the MLP fc1/fc2, and the
untied lm head of models.TransformerLM.  What stays full precision:
LayerNorm gains/biases, Linear biases, embeddings (the gather reads one
row per token — quantizing the table saves nothing on the serving path
and would perturb the tied-head logits), and anything not a 2-D matmul
weight — EXCEPT stacked MoE expert banks: 3-D ``w1``/``w2`` leaves
quantize per (expert, output-column) and stream through the batched
``md.dequant_matmul_bmm`` kernel (the bank is a Mixtral-class model's
dominant serving bytes).  The MoE router stays full precision (tiny,
and int8 rounding there flips top-k routing decisions).

The quantized tree drives every existing path unchanged: eager
``model.apply``, ``generate``/``generate_cached``, and the compiled
``generate_compiled`` scan — they all reach weights through
``Linear.apply``.

No reference counterpart: /root/reference is an autodiff engine with no
serving layer; this module extends SURVEY §8's serving row.
"""

from __future__ import annotations

from typing import TYPE_CHECKING

import minidiff_tpu as md
import minidiff_tpu.backend as backend

if TYPE_CHECKING:
    from typing import Any

__all__ = ["quantize_int8", "quantize_int4", "quantize_int8_stacked",
           "quantize_for_serving", "quantized_bytes"]


def quantize_int8(w: "md.Tensor") -> "tuple[md.Tensor, md.Tensor]":
    """(K, N) float Tensor -> (q int8 Tensor, s f32 Tensor (N,)).

    Symmetric per-output-channel: s[n] = max|w[:, n]| / 127 (1.0 for
    all-zero columns), q = round(w / s) clipped to [-127, 127].
    """
    with md.no_grad():
        q, s = backend.get_backend().quantize_int8(w._data)
        return md.Tensor(q), md.Tensor(s)


def quantize_int4(w: "md.Tensor", group: int = 128):
    """(K, N) float -> (packed int8 (K/2, N), s f32 (K/group, N)).

    4-bit symmetric with GROUP-wise scales (per-column is too coarse at
    4 bits); two K-rows pack per byte split-half.  See kernels/quant.py.
    """
    with md.no_grad():
        p, s = backend.get_backend().quantize_int4(w._data, group=group)
        return md.Tensor(p), md.Tensor(s)


def quantize_int8_stacked(w: "md.Tensor"):
    """(E, K, N) float expert bank -> (q int8, s f32 (E, N)) symmetric
    per (expert, output-column) — the MoE sibling of quantize_int8."""
    with md.no_grad():
        q, s = backend.get_backend().quantize_int8_stacked(w._data)
        return md.Tensor(q), md.Tensor(s)


def _is_quantizable(key: str, value: "Any", min_elements: int) -> bool:
    if key != "w" or not isinstance(value, md.Tensor):
        return False
    if value.ndim != 2:
        return False
    return value.size >= min_elements


def quantize_for_serving(params: "Any", min_elements: int = 128 * 128,
                         bits: int = 8, group: int = 128) -> "Any":
    """Rewrite a parameter tree for int8/int4 weight-only serving.

    Every dict holding a quantizable ``"w"`` (2-D, >= ``min_elements``
    params) gets it replaced by ``"w_q"``/``"w_s"`` (int8) or
    ``"w_q4"``/``"w_s4"`` (``bits=4``: packed nibbles + ``group``-wise
    scales — half the int8 stream again); all other leaves pass through
    untouched (biases, norms, embeddings).  A weight whose K dimension
    int4 cannot tile (odd or not divisible by ``group``) falls back to
    int8 in the same tree.  Returns a new tree — the input is not mutated,
    so the full-precision parameters remain usable.
    """
    assert bits in (8, 4), bits
    if isinstance(params, dict):
        out = {}
        for k, v in params.items():
            if k == "router":
                # the MoE router stays full precision: its (d, E) matmul
                # is tiny, it is consumed as a bare "w" (not Linear.apply),
                # and int8 rounding there flips top-k routing decisions
                out[k] = v
            elif _is_quantizable(k, v, min_elements):
                kdim = v.shape[0]
                if bits == 4 and kdim % 2 == 0 and kdim % group == 0:
                    p, s = quantize_int4(v, group=group)
                    out["w_q4"], out["w_s4"] = p, s
                else:
                    q, s = quantize_int8(v)
                    out["w_q"], out["w_s"] = q, s
            elif (k in ("w1", "w2") and isinstance(v, md.Tensor)
                    and v.ndim == 3 and v.size >= min_elements):
                # stacked MoE expert bank (E, K, N): per-(expert, column)
                # int8 through the batched dequant kernel — the bank is a
                # Mixtral-class model's dominant serving stream.  (int4
                # stays a 2-D tier; banks take int8 at either bits.)
                q, s = quantize_int8_stacked(v)
                out[k + "_q"], out[k + "_s"] = q, s
            else:
                out[k] = quantize_for_serving(v, min_elements, bits=bits,
                                              group=group)
        return out
    if isinstance(params, (list, tuple)):
        return type(params)(
            quantize_for_serving(v, min_elements, bits=bits, group=group)
            for v in params)
    return params


def _leaf_bytes(t: "md.Tensor") -> int:
    data = t._data
    if hasattr(data, "element_size"):  # torch
        return int(t.size) * int(data.element_size())
    return int(t.size) * int(data.dtype.itemsize)


def quantized_bytes(params: "Any") -> int:
    """Total parameter bytes of a (possibly quantized) tree — the serving
    weight stream per decoded token."""
    if isinstance(params, dict):
        return sum(quantized_bytes(v) for v in params.values())
    if isinstance(params, (list, tuple)):
        return sum(quantized_bytes(v) for v in params)
    if isinstance(params, md.Tensor):
        return _leaf_bytes(params)
    return 0
