"""MLP classifier — the flagship model (BASELINE config 2).

A 2-layer (or deeper) MLP whose training loop is driven entirely by the
framework's own tape backward: ``make_train_step`` wires loss → engine
value_and_grad → optimizer update into one function, which md.jit compiles
into a single fused XLA step.
"""

from __future__ import annotations

from typing import TYPE_CHECKING

import jax

import minidiff_tpu as md
from minidiff_tpu.models import functional as F
from minidiff_tpu.models.layers import Activation, Linear, Module, Sequential
from minidiff_tpu.models.optim import SGD, Optimizer

if TYPE_CHECKING:
    from typing import Any, Callable, Optional, Sequence, Tuple


class MLP(Module):
    def __init__(
        self,
        in_features: int = 784,
        hidden: "Sequence[int]" = (256,),
        num_classes: int = 10,
        activation: str = "relu",
        dtype: "Optional[Any]" = None,
    ):
        sizes = [in_features, *hidden]
        layers: list = []
        for a, b in zip(sizes[:-1], sizes[1:]):
            layers.append(Linear(a, b, dtype=dtype))
            layers.append(Activation(activation))
        layers.append(Linear(sizes[-1], num_classes, dtype=dtype))
        self.net = Sequential(layers)

    def init(self):
        return self.net.init()

    def apply(self, params, x):
        return self.net.apply(params, x)


def make_train_step(
    model: Module,
    optimizer: "Optional[Optimizer]" = None,
    loss_fn: "Callable" = F.cross_entropy,
    jit: bool = True,
    apply_fn: "Optional[Callable]" = None,
    grad_accum: int = 1,
    donate: bool = False,
    trainable: "Optional[Callable[[str], bool]]" = None,
):
    """Build ``step(params, opt_state, x, y) -> (params, opt_state, loss)``.

    The whole step — tape forward, engine backward, optimizer update — is one
    pure function; with jit=True it compiles into a single XLA executable.
    ``apply_fn`` overrides ``model.apply`` for models whose training forward
    returns extra outputs (e.g. MoE's ``apply_with_aux``); ``loss_fn`` then
    receives whatever it returns.  ``donate=True`` donates the input buffers
    to XLA so old params/opt-state are updated in place instead of
    double-buffered — halves parameter+state HBM for big models; the caller
    must not touch pre-step params afterwards (the training-loop pattern
    ``params, state, loss = step(params, state, x, y)`` is safe).
    ``grad_accum > 1`` splits the batch into
    that many microbatches, runs fwd+bwd per microbatch, and applies ONE
    update with the averaged gradients — activation memory scales with the
    microbatch, so batch sizes that do not fit in HBM still train (the
    statically-unrolled microbatch loop compiles into the same executable).

    ``trainable`` (a predicate on ``"blocks/0/attn/qkv/w"``-style tree
    paths) restricts differentiation AND the optimizer update to the
    matching leaves — parameter-efficient fine-tuning (pass
    ``lora.lora_predicate`` for LoRA); everything else is frozen,
    bit-identical across steps, and ``opt_state`` must be initialised from
    ``lora.trainable_params(params, trainable)``.

    Stochastic-layer models (dropout): pass a PRNG key per call,
    ``step(params, opt_state, x, y, rng=md.fold_in(key, step_no))`` — the
    key is a traced *input* to the compiled program, so ONE executable
    draws fresh dropout masks every step (each microbatch under grad_accum
    folds its index off the step key).
    """
    optimizer = optimizer or SGD(0.1)
    apply = apply_fn or model.apply

    def _apply(p, xb, rng):
        return apply(p, xb) if rng is None else apply(p, xb, rng=rng)

    if trainable is None:
        def split(p):
            return p, None

        def rejoin(t, f):
            return t
    else:
        # parameter-efficient fine-tuning (e.g. LoRA): differentiate and
        # update only the leaves whose tree path satisfies the predicate;
        # the frozen subtree crosses the step untouched and opt_state
        # covers the trainable subtree only (init with
        # lora.trainable_params(params, trainable))
        from minidiff_tpu.models.lora import combine_params, partition_params

        def split(p):
            return partition_params(p, trainable)

        rejoin = combine_params

    def step(params, opt_state, x, y, rng=None):
        params, frozen = split(params)
        if grad_accum == 1:
            def objective(p):
                return loss_fn(_apply(rejoin(p, frozen), x, rng), y)

            loss, grads = md.value_and_grad(objective)(params)
        else:
            assert x.shape[0] % grad_accum == 0, (x.shape[0], grad_accum)
            n = x.shape[0] // grad_accum
            loss = None
            grads = None
            for i in range(grad_accum):
                xi = x[i * n:(i + 1) * n]
                yi = y[i * n:(i + 1) * n]
                ri = None if rng is None else md.fold_in(rng, i)

                def objective(p, xi=xi, yi=yi, ri=ri):
                    return loss_fn(_apply(rejoin(p, frozen), xi, ri), yi)

                li, gi = md.value_and_grad(objective)(params)
                loss = li if loss is None else loss + li
                if grads is None:
                    grads = gi
                else:
                    grads = jax.tree.map(
                        lambda a, b: a + b, grads, gi,
                        is_leaf=lambda t: isinstance(t, md.Tensor),
                    )
            scale = 1.0 / grad_accum
            with md.no_grad():
                loss = loss * scale
                grads = jax.tree.map(
                    lambda g: g * scale, grads,
                    is_leaf=lambda t: isinstance(t, md.Tensor),
                )
        params, opt_state = optimizer.update(params, grads, opt_state)
        return rejoin(params, frozen), opt_state, loss

    if jit and md.backend_name() == "xla":
        # donate only params (arg 0) and optimizer state (arg 1): donating
        # the batch tensors would delete buffers callers legitimately reuse
        # across steps (and x/y can alias params when shapes/dtypes match)
        return md.jit(step, donate_argnums=(0, 1) if donate else None)
    return step


def train(
    model: Module,
    batches: "Any",
    optimizer: "Optional[Optimizer]" = None,
    jit: bool = True,
) -> "Tuple[Any, list]":
    """Train over an iterable of (x, y) batches; returns (params, losses)."""
    optimizer = optimizer or SGD(0.1)
    params = model.init()
    opt_state = optimizer.init(params)
    step = make_train_step(model, optimizer, jit=jit)
    losses = []
    for x, y in batches:
        params, opt_state, loss = step(params, opt_state, x, y)
        losses.append(loss)  # device values: no per-step host sync
    return params, [float(l.item()) for l in losses]
