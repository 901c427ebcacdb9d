"""Functional RNG: explicit PRNG keys that survive ``md.jit`` compilation.

The reference's randomness is stateful module-level draws
(minidiff/backend/__init__.py random fns) — fine eagerly, but under tracing a
stateful draw executes ONCE and bakes a constant into the compiled program
(the dropout footgun: one mask reused every step is pruning, not dropout).

The TPU-native answer is jax's: randomness is a pure function of an explicit
counter-based key.  A key here is a ``(2,)`` uint32 Tensor; because it is
*data*, it can be a traced input to a jitted train step — pass a freshly
folded key each call and one compiled program produces fresh randomness every
step.  On the numpy oracle the same API is deterministic per key via
splitmix64 mixing + Philox generation (streams are backend-specific, like the
reference's numpy/cupy/mlx streams; determinism per key is the contract).

Typical jit-safe dropout training::

    key = md.random_key(0)
    step = make_train_step(model, opt, loss_fn=lm_loss)   # model has dropout
    for i in range(n_steps):
        params, state, loss = step(params, state, x, y,
                                   rng=md.fold_in(key, i))
"""

from __future__ import annotations

from typing import TYPE_CHECKING

import minidiff_tpu as md
import minidiff_tpu.backend as backend

if TYPE_CHECKING:
    from typing import Any, Optional, Union


def _b():
    return backend.get_backend()


def _raw_key(key: "Union[md.Tensor, Any]"):
    return key._data if isinstance(key, md.Tensor) else key


def random_key(seed: int = 0) -> "md.Tensor":
    """A fresh (2,) uint32 PRNG key Tensor from an integer seed."""
    return md.Tensor(_b().key_from_seed(int(seed)))


def fold_in(key: "md.Tensor", data: "Any") -> "md.Tensor":
    """Derive a new key from ``key`` and an integer (or scalar int Tensor).

    The workhorse for step-wise randomness: ``fold_in(key, step)`` is cheap,
    collision-resistant, and traceable (``data`` may be a traced scalar, so
    folding can also happen *inside* a compiled program, e.g. per scan step).
    """
    if isinstance(data, md.Tensor):
        data = data._data
    return md.Tensor(_b().key_fold_in(_raw_key(key), data))


def split_key(key: "md.Tensor", num: int = 2) -> "md.Tensor":
    """Split one key into ``num`` independent keys, shape (num, 2)."""
    return md.Tensor(_b().key_split(_raw_key(key), int(num)))


def random_uniform(key: "md.Tensor", shape: "Any" = (),
                   dtype: "Optional[Any]" = None,
                   minval: float = 0.0, maxval: float = 1.0) -> "md.Tensor":
    """Uniform [minval, maxval) draw — a pure function of ``key``."""
    shape = (shape,) if isinstance(shape, int) else tuple(shape)
    u = md.Tensor(_b().key_uniform(_raw_key(key), shape, dtype))
    if minval != 0.0 or maxval != 1.0:
        u = u * (maxval - minval) + minval
    return u


def random_normal(key: "md.Tensor", shape: "Any" = (),
                  dtype: "Optional[Any]" = None) -> "md.Tensor":
    """Standard-normal draw — a pure function of ``key``."""
    shape = (shape,) if isinstance(shape, int) else tuple(shape)
    return md.Tensor(_b().key_normal(_raw_key(key), shape, dtype))


def random_bernoulli(key: "md.Tensor", p: float = 0.5,
                     shape: "Any" = ()) -> "md.Tensor":
    """Boolean draw: True with probability ``p`` — pure function of ``key``."""
    return random_uniform(key, shape) < float(p)


__all__ = [
    "random_key",
    "fold_in",
    "split_key",
    "random_uniform",
    "random_normal",
    "random_bernoulli",
]
