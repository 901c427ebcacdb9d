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
from minidiff_tpu.models.mlp import make_train_step
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

    The teacher's logits are recomputed inside the step under ``no_grad``
    (constants to the tape), so the whole thing compiles into ONE XLA
    program.  For sequence models whose apply returns (B, S, V), logits
    and labels are flattened to (B*S, V)/(B*S,) before the loss.
    ``trainable`` freezes everything else (e.g. LoRA-distillation)."""
    optimizer = optimizer or SGD(0.1)

    def apply_fn(p, x):
        # the make_train_step contract: apply_fn may return extra outputs,
        # which loss_fn receives whole — thread the batch through so the
        # teacher forward happens INSIDE the objective (one XLA program)
        return student.apply(p, x), x

    def loss_fn(out, y):
        student_logits, x = out
        with md.no_grad():
            teacher_logits = teacher.apply(teacher_params, x)
        sl, tl = student_logits, teacher_logits
        if sl.ndim == 3:
            b, s, v = sl.shape
            sl = sl.reshape((b * s, v))
            tl = tl.reshape((b * s, v))
            y = y.reshape((b * s,))
        return kd_loss(sl, tl, labels=y, temperature=temperature,
                       alpha=alpha)

    return make_train_step(student, optimizer, loss_fn=loss_fn, jit=jit,
                           apply_fn=apply_fn, trainable=trainable)
