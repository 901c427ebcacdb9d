"""Knowledge distillation: soft-target training against a frozen teacher.

``kd_loss`` is the Hinton objective: KL(teacher_T || student_T) at
temperature ``T`` (scaled by T^2 so its gradient magnitude is independent
of T), optionally blended with the hard-label cross-entropy.
``make_distill_step`` wires it into the standard train-step shape — the
teacher forward runs inside the same compiled program under ``no_grad``
(XLA sees one fused step; the teacher contributes no backward), so
distillation costs one extra forward, not a separate dispatch.

Composes with the rest of the toolkit: the student can be LoRA-adapted
(``trainable=``), quantize after training, and the teacher can itself be
an int8-quantized tree (cheap soft labels).

No reference counterpart: /root/reference has no models/training layer;
extends SURVEY §8's training-toolkit row.
"""

from __future__ import annotations

from typing import TYPE_CHECKING

import minidiff_tpu as md
from minidiff_tpu.models import functional as F
from minidiff_tpu.models.optim import SGD

if TYPE_CHECKING:
    from typing import Any, Callable, Optional

    from minidiff_tpu.models.layers import Module

__all__ = ["kd_loss", "log_softmax", "make_distill_step"]


def log_softmax(logits: "md.Tensor", axis: int = -1) -> "md.Tensor":
    """Numerically stable log softmax in framework ops."""
    with md.no_grad():
        m = md.max(logits, axis=axis, keepdims=True)
    shifted = logits - m
    return shifted - md.log(md.sum(md.exp(shifted), axis=axis,
                                   keepdims=True))


def kd_loss(student_logits: "md.Tensor", teacher_logits: "md.Tensor",
            labels: "Optional[md.Tensor]" = None, temperature: float = 2.0,
            alpha: float = 0.5) -> "md.Tensor":
    """alpha * CE(student, labels) + (1-alpha) * T^2 * KL(p_T || p_S).

    ``p_T``/``p_S`` are the teacher/student distributions at temperature
    ``T``; the T^2 factor keeps the soft gradient scale T-independent
    (Hinton et al.).  ``labels=None`` (or ``alpha=0``) is pure soft
    distillation.  Logits are (N, V); labels (N,) int.
    """
    t = float(temperature)
    log_ps = log_softmax(student_logits / t)
    with md.no_grad():
        log_pt = log_softmax(teacher_logits / t)
        pt = md.exp(log_pt)
    soft = md.mean(md.sum(pt * (log_pt - log_ps), axis=-1)) * (t * t)
    if labels is None or alpha == 0.0:
        return soft
    hard = F.cross_entropy(student_logits, labels)
    return alpha * hard + (1.0 - alpha) * soft


def make_distill_step(
    student: "Module",
    teacher: "Module",
    teacher_params: "Any",
    optimizer: "Optional[Any]" = None,
    temperature: float = 2.0,
    alpha: float = 0.5,
    jit: bool = True,
    trainable: "Optional[Callable[[str], bool]]" = None,
):
    """``step(params, opt_state, x, y) -> (params, opt_state, loss)``.

    The teacher forward runs inside the same compiled objective under
    ``no_grad`` (one XLA program; the teacher contributes no backward),
    and the teacher parameters enter the jitted program as TRACED inputs
    — closed-over concrete arrays would be baked into the executable as
    constants, doubling its size and forcing a retrace per teacher
    checkpoint.  For sequence models whose apply returns (B, S, V),
    logits and labels flatten to (B*S, V)/(B*S,) before the loss.
    ``trainable`` freezes everything else (e.g. LoRA-distillation)."""
    optimizer = optimizer or SGD(0.1)

    if trainable is None:
        def split(p):
            return p, None

        def rejoin(t, f):
            return t
    else:
        from minidiff_tpu.models.lora import combine_params, partition_params

        def split(p):
            return partition_params(p, trainable)

        rejoin = combine_params

    def _loss(student_logits, teacher_logits, y):
        sl, tl = student_logits, teacher_logits
        if sl.ndim == 3:
            b, s, v = sl.shape
            sl = sl.reshape((b * s, v))
            tl = tl.reshape((b * s, v))
            y = y.reshape((b * s,))
        return kd_loss(sl, tl, labels=y, temperature=temperature,
                       alpha=alpha)

    def full_step(params, opt_state, x, y, tp):
        train, frozen = split(params)

        def objective(t):
            logits = student.apply(rejoin(t, frozen), x)
            with md.no_grad():
                teacher_logits = teacher.apply(tp, x)
            return _loss(logits, teacher_logits, y)

        loss, grads = md.value_and_grad(objective)(train)
        train, opt_state = optimizer.update(train, grads, opt_state)
        return rejoin(train, frozen), opt_state, loss

    import minidiff_tpu.backend as backend

    compiled = (md.jit(full_step)
                if jit and backend.backend_name() == "xla" else full_step)

    def step(params, opt_state, x, y):
        return compiled(params, opt_state, x, y, teacher_params)

    return step
