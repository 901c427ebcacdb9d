"""Recurrent family: GRU built from framework ops.

The sequence loop is a Python unroll over the tape (eager semantics match
the reference's define-by-run style); under md.jit the unrolled steps compile
into one XLA program.  Sequence lengths here are model-scale (tens to a few
hundred steps) — for very long sequences prefer the transformer family.
"""

from __future__ import annotations

import math
from typing import TYPE_CHECKING

import numpy as np

import minidiff_tpu as md
from minidiff_tpu.models import functional as F
from minidiff_tpu.models.layers import Linear, Module

if TYPE_CHECKING:
    from typing import Any, Dict, Optional


class GRUCell(Module):
    """Standard GRU: z/r gates + candidate, acting on (B, D) -> (B, H)."""

    def __init__(self, in_features: int, hidden: int,
                 dtype: "Optional[Any]" = None):
        self.in_features = in_features
        self.hidden = hidden
        self.dtype = dtype

    def init(self) -> "Dict[str, md.Tensor]":
        bound = 1.0 / math.sqrt(self.hidden)

        def mat(rows):
            return md.Tensor(
                np.random.uniform(-bound, bound, (rows, self.hidden)),
                allow_grad=True, dtype=self.dtype,
            )

        def vec():
            return md.Tensor(np.zeros(self.hidden), allow_grad=True,
                             dtype=self.dtype)

        # split input/hidden weights (no concat in the hot path)
        return {
            "wxz": mat(self.in_features), "whz": mat(self.hidden), "bz": vec(),
            "wxr": mat(self.in_features), "whr": mat(self.hidden), "br": vec(),
            "wxh": mat(self.in_features), "whh": mat(self.hidden), "bh": vec(),
        }

    def step(self, params, x, h):
        z = F.sigmoid(x @ params["wxz"] + h @ params["whz"] + params["bz"])
        r = F.sigmoid(x @ params["wxr"] + h @ params["whr"] + params["br"])
        cand = md.tanh(x @ params["wxh"] + (r * h) @ params["whh"] + params["bh"])
        return (1.0 - z) * h + z * cand

    _PARAM_ORDER = ("wxz", "whz", "bz", "wxr", "whr", "br", "wxh", "whh", "bh")

    def apply(self, params, x, use_scan: bool = False):
        """x (B, S, D) -> final hidden state (B, H).

        ``use_scan=True`` rolls the recurrence into ONE ``lax.scan`` via
        ``md.scan`` — program size and compile time become independent of S
        (the unrolled tape grows linearly); gradients flow through jax's
        reverse-scan transpose.  Identical numerics either way.
        """
        b, s, _ = x.shape
        h = md.zeros((b, self.hidden))
        h = h.astype(self.dtype if self.dtype is not None else x.dtype)
        if not use_scan:
            for t in range(s):
                h = self.step(params, x[:, t, :], h)
            return h
        flat = [params[k] for k in self._PARAM_ORDER]

        def scan_step(carry, xt, *flat_params):
            p = dict(zip(self._PARAM_ORDER, flat_params))
            h2 = self.step(p, xt, carry)
            return h2, h2  # ys = all hidden states (BPTT residuals anyway)

        xs_t = md.transpose(x, axes=(1, 0, 2))  # (S, B, D)
        h_final, _ = md.scan(scan_step)(h, xs_t, *flat)
        return h_final


class GRUClassifier(Module):
    """GRU encoder + linear head over the final hidden state."""

    def __init__(self, in_features: int, hidden: int, num_classes: int,
                 dtype: "Optional[Any]" = None, use_scan: bool = False):
        self.cell = GRUCell(in_features, hidden, dtype=dtype)
        self.head = Linear(hidden, num_classes, dtype=dtype)
        self.use_scan = use_scan

    def init(self):
        return {"cell": self.cell.init(), "head": self.head.init()}

    def apply(self, params, x):
        h = self.cell.apply(params["cell"], x, use_scan=self.use_scan)
        return self.head.apply(params["head"], h)


def synthetic_sequence_classification(batch: int, seq_len: int, dim: int,
                                      classes: int, seed: int = 0):
    """Class = argmax over per-class signature directions summed over time."""
    rng = np.random.RandomState(seed)
    protos = rng.randn(classes, dim)
    ys = rng.randint(0, classes, batch)
    xs = rng.randn(batch, seq_len, dim) * 0.3 + protos[ys][:, None, :]
    return md.Tensor(xs), md.Tensor(ys)
