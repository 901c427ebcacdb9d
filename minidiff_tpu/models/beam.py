"""Beam-search decoding over the KV-cached transformer.

Serving-side companion to greedy/sampled decode: beams ride the batch axis
(B*W sequences share one KV cache), device work per step is one
``apply_step`` over all beams, and the beam bookkeeping (scores, parents,
finished flags) is small host-side numpy — the standard split for
variable-control-flow search on an accelerator.

``beam_width=1`` reproduces ``generate_cached`` token for token; wider
beams maximize sum-of-log-probs with an optional GNMT-style length penalty
and early EOS termination.
"""

from __future__ import annotations

from typing import TYPE_CHECKING

import numpy as np

import minidiff_tpu as md
from minidiff_tpu.models.transformer import apply_step, init_kv_cache

if TYPE_CHECKING:
    from typing import Optional, Tuple

    from minidiff_tpu.models.transformer import TransformerLM


def _log_softmax_np(logits: np.ndarray) -> np.ndarray:
    m = logits.max(axis=-1, keepdims=True)
    z = logits - m
    return z - np.log(np.exp(z).sum(axis=-1, keepdims=True))


def beam_search(
    model: "TransformerLM",
    params,
    prompt: "md.Tensor",
    max_new_tokens: int,
    beam_width: int = 4,
    eos_id: "Optional[int]" = None,
    length_penalty: float = 0.0,
) -> "Tuple[md.Tensor, np.ndarray]":
    """Returns (sequences (B, S0+N) of the best beam, scores (B,)).

    Scores are sum of next-token log-probs, divided by
    ``(length)**length_penalty`` (0.0 = pure log-prob).  With ``eos_id``,
    beams ending in EOS freeze (further steps pad with EOS and add 0).
    """
    b, s0 = prompt.shape
    w = beam_width
    assert s0 >= 1
    assert s0 + max_new_tokens <= model.max_seq_len + 1, "cache too small"

    prompt_np = np.asarray(prompt.detach())
    # beams ride the batch axis: rows [i*w, (i+1)*w) are batch i's beams
    expanded = np.repeat(prompt_np, w, axis=0)  # (B*W, S0)
    caches = init_kv_cache(model, b * w)

    with md.no_grad():
        logits = None
        for pos in range(s0):  # prefill (identical across beams)
            step_tok = md.Tensor(expanded[:, pos:pos + 1])
            logits = apply_step(model, params, step_tok, caches, pos)
        logp = _log_softmax_np(np.asarray(logits.detach(), dtype=np.float64))

        # first expansion: all beams are clones, so only beam 0 may seed
        # candidates (else the top-w picks would be w copies of the argmax)
        scores = np.full((b, w), -np.inf)
        scores[:, 0] = 0.0
        seqs = expanded  # (B*W, S0)
        finished = np.zeros((b, w), dtype=bool)
        # per-beam generated length (counting up to and including EOS) — the
        # quantity the GNMT length penalty normalizes by
        lengths = np.zeros((b, w), dtype=np.int64)

        for step in range(max_new_tokens):
            v = logp.shape[-1]
            logp_b = logp.reshape(b, w, v)
            total = scores[:, :, None] + logp_b  # (B, W, V)
            if eos_id is not None:
                # a finished beam contributes exactly one continuation (EOS)
                # at its frozen score
                for i in range(b):
                    for j in range(w):
                        if finished[i, j]:
                            total[i, j, :] = -np.inf
                            total[i, j, eos_id] = scores[i, j]
            flat = total.reshape(b, w * v)
            top = np.argsort(-flat, axis=-1)[:, :w]  # (B, W)
            parent = top // v
            token = top % v
            scores = np.take_along_axis(flat, top, axis=-1)

            # reorder sequences + caches by parent beam (device-side gather)
            sel = (np.arange(b)[:, None] * w + parent).reshape(-1)
            seqs = np.concatenate(
                [seqs[sel], token.reshape(-1, 1)], axis=1
            )
            sel_t = md.Tensor(sel)
            for cache in caches:
                cache["k"] = cache["k"][sel_t]
                cache["v"] = cache["v"][sel_t]
            lengths = np.take_along_axis(lengths, parent, axis=-1)
            if eos_id is not None:
                finished = np.take_along_axis(finished, parent, axis=-1)
                lengths += ~finished  # frozen beams stop growing
                finished |= token == eos_id
                if finished.all():
                    break
            else:
                lengths += 1
            if step == max_new_tokens - 1:
                break
            logits = apply_step(
                model, params, md.Tensor(seqs[:, -1:]), caches, s0 + step
            )
            logp = _log_softmax_np(
                np.asarray(logits.detach(), dtype=np.float64)
            )

    if length_penalty:
        # per-beam lengths: with EOS, finished beams keep their own (shorter)
        # length, so the penalty genuinely reranks hypotheses
        norm = scores / np.maximum(lengths, 1) ** length_penalty
    else:
        norm = scores
    best = norm.argmax(axis=-1)  # (B,)
    picked = seqs.reshape(b, w, -1)[np.arange(b), best]
    return md.Tensor(picked), norm[np.arange(b), best]
