"""Sequence packing: train on many documents per row without cross-talk.

Pretraining corpora are mostly short documents; padding each to the model's
sequence length wastes the MXU on dead tokens.  Packing concatenates
documents into full rows and keeps them independent with three per-token
tables, all computed host-side here and consumed as data by the compiled
step (static shapes, no recompiles):

* ``segment_ids`` (B, S): document index per token (-1 = padding).  The
  attention op confines visibility to equal ids — rides into the flash
  kernels as id rows, never a dense (S, S) mask in HBM
  (kernels/attention.py `_apply_seg_mask`).
* ``positions`` (B, S): position WITHIN the document, so learned positional
  embeddings index correctly and RoPE restarts per document.
* ``targets`` / ``loss_mask`` (B, S): next-token labels, with positions
  whose next token crosses a document boundary (or is padding) masked out
  of the loss.

No reference counterpart: /root/reference has no models layer (SURVEY §2.2);
this is the TPU-native packed-pretraining path every production LM stack
ships.
"""

from __future__ import annotations

from typing import TYPE_CHECKING

import numpy as np

import minidiff_tpu as md

if TYPE_CHECKING:
    from typing import Callable, Dict, List, Optional, Sequence

__all__ = ["pack_documents", "segment_positions", "make_packed_train_step"]


def segment_positions(segment_ids: np.ndarray) -> np.ndarray:
    """Within-document positions for contiguous-run segment ids.

    (B, S) or (S,) int array -> same-shape int array: 0, 1, 2, ... restarting
    wherever the id changes; padding (-1) runs get positions too (masked out
    of everything downstream, so their value never matters).
    """
    seg = np.asarray(segment_ids)
    one = seg.reshape(1, -1) if seg.ndim == 1 else seg
    b, s = one.shape
    idx = np.arange(s)
    out = np.zeros_like(one)
    for r in range(b):
        starts = np.ones(s, bool)
        starts[1:] = one[r, 1:] != one[r, :-1]
        # last start at or before each position
        last_start = np.maximum.accumulate(np.where(starts, idx, -1))
        out[r] = idx - last_start
    return out.reshape(seg.shape)


def pack_documents(docs: "Sequence[Sequence[int]]", seq_len: int,
                   pad_id: int = 0) -> "Dict[str, np.ndarray]":
    """Greedy first-fit packing of token documents into (B, S) rows.

    Documents longer than ``seq_len`` are split into ``seq_len``-sized
    pieces (each piece its own segment).  Returns a dict of equal-shape
    (B, S) numpy arrays: ``tokens``, ``segment_ids`` (-1 on padding),
    ``positions``, ``targets`` and ``loss_mask`` (next-token labels inside
    each document; the final token of every document is unscored).
    """
    pieces: "List[List[int]]" = []
    for doc in docs:
        doc = list(doc)
        if not doc:
            continue
        for i in range(0, len(doc), seq_len):
            pieces.append(doc[i:i + seq_len])
    # first-fit over open rows
    rows: "List[List[List[int]]]" = []
    space: "List[int]" = []
    for piece in pieces:
        for r, free in enumerate(space):
            if len(piece) <= free:
                rows[r].append(piece)
                space[r] -= len(piece)
                break
        else:
            rows.append([piece])
            space.append(seq_len - len(piece))
    b = len(rows)
    tokens = np.full((b, seq_len), pad_id, np.int64)
    seg = np.full((b, seq_len), -1, np.int64)
    targets = np.full((b, seq_len), pad_id, np.int64)
    loss_mask = np.zeros((b, seq_len), np.int64)
    for r, row in enumerate(rows):
        at = 0
        for d, piece in enumerate(row):
            n = len(piece)
            tokens[r, at:at + n] = piece
            seg[r, at:at + n] = d
            targets[r, at:at + n - 1] = piece[1:]
            loss_mask[r, at:at + n - 1] = 1
            at += n
    return {
        "tokens": tokens,
        "segment_ids": seg,
        "positions": segment_positions(seg),
        "targets": targets,
        "loss_mask": loss_mask,
    }


def make_packed_train_step(model, optimizer=None, jit: bool = True,
                           donate: bool = False):
    """Build ``step(params, opt_state, batch, rng=None) ->
    (params, opt_state, loss)`` for packed batches.

    ``batch`` is the ``pack_documents`` dict (numpy or md.Tensor leaves) —
    every table is a traced INPUT to the one compiled program, so new
    batches never recompile.  The loss is the masked mean next-token
    cross-entropy (``lm_loss(..., mask=)``); attention isolation and
    per-document positions ride through ``model.apply(segment_ids=,
    positions=)``.
    """
    from minidiff_tpu.models.optim import SGD
    from minidiff_tpu.models.transformer import lm_loss

    optimizer = optimizer or SGD(0.1)

    def step(params, opt_state, batch, rng=None):
        bt = {k: (v if isinstance(v, md.Tensor) else md.Tensor(v))
              for k, v in batch.items()}

        def objective(p):
            logits = model.apply(p, bt["tokens"], rng=rng,
                                 segment_ids=bt["segment_ids"],
                                 positions=bt["positions"])
            return lm_loss(logits, bt["targets"], mask=bt["loss_mask"])

        loss, grads = md.value_and_grad(objective)(params)
        params, opt_state = optimizer.update(params, grads, opt_state)
        return params, opt_state, loss

    if jit:
        step = md.jit(step, donate_argnums=(0, 1) if donate else ())
    return step
