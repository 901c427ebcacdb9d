"""Training metrics: structured step logging, throughput, and MFU.

The reference has no metrics/observability layer at all (SURVEY.md §5.5 —
one print statement); serious TPU training needs three small things:

* ``MetricsLogger`` — append-only JSONL step records (the format every
  dashboard ingests) plus an in-memory history for in-process plotting and
  a windowed ``summary()``;
* ``MFUMeter`` — model-FLOPs-utilization from measured step times: the ONE
  number that says how far a train step is from the hardware roofline;
* ``transformer_train_flops`` — the standard 6*N*T (+attention) FLOP
  estimate for decoder LMs, so MFU needs no hand-derived FLOP counts.

Everything is host-side and backend-agnostic: scalars are pulled with
``float()`` (device sync), nothing here enters a trace.
"""

from __future__ import annotations

import json
import time
from typing import TYPE_CHECKING

if TYPE_CHECKING:
    from typing import Any, Dict, List, Optional

# bf16 peak TFLOP/s per chip for common TPU generations (public figures);
# pass peak_tflops explicitly for other hardware or dtypes.
TPU_PEAK_BF16_TFLOPS = {
    "v4": 275.0,
    "v5e": 197.0,
    "v5p": 459.0,
    "v6e": 918.0,
}


def _scalar(v: "Any") -> float:
    """Pull any Tensor/array/number to a host float (device sync point)."""
    item = getattr(v, "item", None)
    return float(item()) if callable(item) else float(v)


class MetricsLogger:
    """Append-only JSONL step logging with an in-memory history.

    >>> log = MetricsLogger("run.jsonl")
    >>> log.log(step=1, loss=loss, lr=3e-4)       # Tensors auto-convert
    >>> log.summary(window=100)["loss"]           # windowed means
    """

    def __init__(self, path: "Optional[Any]" = None, flush_every: int = 1):
        self.path = path
        self.history: "List[Dict[str, float]]" = []
        self._fh = open(path, "a") if path is not None else None
        self._flush_every = max(1, flush_every)
        self._since_flush = 0
        self._t0 = time.perf_counter()

    def log(self, step: int, **scalars: "Any") -> "Dict[str, float]":
        rec = {"step": int(step),
               "time_s": round(time.perf_counter() - self._t0, 6)}
        for k, v in scalars.items():
            rec[k] = _scalar(v)
        self.history.append(rec)
        if self._fh is not None:
            self._fh.write(json.dumps(rec) + "\n")
            self._since_flush += 1
            if self._since_flush >= self._flush_every:
                self._fh.flush()
                self._since_flush = 0
        return rec

    def summary(self, window: int = 0) -> "Dict[str, float]":
        """Mean of every logged key over the last ``window`` records
        (0 = all).  Keys missing from some records average over the records
        that have them."""
        recs = self.history[-window:] if window else self.history
        sums: "Dict[str, float]" = {}
        counts: "Dict[str, int]" = {}
        for rec in recs:
            for k, v in rec.items():
                if k in ("step", "time_s"):
                    continue
                sums[k] = sums.get(k, 0.0) + v
                counts[k] = counts.get(k, 0) + 1
        return {k: sums[k] / counts[k] for k in sums}

    def close(self) -> None:
        if self._fh is not None:
            self._fh.flush()
            self._fh.close()
            self._fh = None

    def __enter__(self) -> "MetricsLogger":
        return self

    def __exit__(self, *exc: "Any") -> None:
        self.close()


def transformer_train_flops(
    n_params: int,
    tokens_per_step: int,
    num_layers: int = 0,
    dim: int = 0,
    seq_len: int = 0,
) -> float:
    """FLOPs for ONE train step of a dense decoder LM.

    The standard estimate: 6 FLOPs per parameter per token (2 forward +
    4 backward, matmuls only) plus the attention-score term
    12 * L * d * S per token (6 * 2*S*d per layer fwd+bwd) when layer
    geometry is given.  Matches the bench.py accounting.
    """
    flops = 6.0 * float(n_params) * float(tokens_per_step)
    if num_layers and dim and seq_len:
        flops += 12.0 * num_layers * dim * seq_len * float(tokens_per_step)
    return flops


class MFUMeter:
    """Model-FLOPs-utilization from wall-clock step times.

    >>> meter = MFUMeter(flops_per_step=transformer_train_flops(...),
    ...                  peak_tflops=TPU_PEAK_BF16_TFLOPS["v5e"])
    >>> meter.start(); step(...); loss.item()   # sync before stop!
    >>> meter.stop()
    >>> meter.mfu(), meter.tflops()

    ``stop()`` must run after a device sync (e.g. pulling the loss), or the
    async dispatch makes steps look instant.
    """

    def __init__(self, flops_per_step: float, peak_tflops: float,
                 n_devices: int = 1):
        assert flops_per_step > 0 and peak_tflops > 0
        self.flops_per_step = float(flops_per_step)
        self.peak_flops = float(peak_tflops) * 1e12 * n_devices
        self.times: "List[float]" = []
        self._t: "Optional[float]" = None

    def start(self) -> None:
        self._t = time.perf_counter()

    def stop(self) -> float:
        assert self._t is not None, "stop() without start()"
        dt = time.perf_counter() - self._t
        self._t = None
        self.times.append(dt)
        return dt

    def _mean_time(self, window: int = 0) -> float:
        ts = self.times[-window:] if window else self.times
        assert ts, "no measured steps"
        return sum(ts) / len(ts)

    def tflops(self, window: int = 0) -> float:
        return self.flops_per_step / self._mean_time(window) / 1e12

    def mfu(self, window: int = 0) -> float:
        return (self.flops_per_step / self._mean_time(window)
                / self.peak_flops)

    def tokens_per_sec(self, tokens_per_step: int, window: int = 0) -> float:
        return tokens_per_step / self._mean_time(window)
