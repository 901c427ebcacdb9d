"""Parameter-efficient fine-tuning with LoRA.

Pretrains a small TransformerLM on one corpus, then adapts it to a second
style with rank-r LoRA adapters: the base weights stay bit-frozen (one
could serve many adapters off one base checkpoint), only the adapter
matrices train, and the result merges back into plain weights (optionally
int8-quantized) for zero-overhead serving.

    python examples/finetune_lora.py [--steps N]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import minidiff_tpu as md
from minidiff_tpu.models import (
    Adam,
    TransformerLM,
    lm_loss,
    lora_init,
    lora_predicate,
    make_train_step,
    merge_lora,
    perplexity,
    quantize_for_serving,
    trainable_params,
)

BASE = ("the quick brown fox jumps over the lazy dog. "
        "pack my box with five dozen liquor jugs. ") * 30
STYLE = ("colorless green ideas sleep furiously. "
         "furiously sleep ideas green colorless. ") * 30
SEQ = 32


def batches(ids, batch, seq, steps, seed=0):
    rng = np.random.default_rng(seed)
    ids = np.asarray(ids, dtype=np.int64)
    for _ in range(steps):
        starts = rng.integers(0, len(ids) - seq - 1, batch)
        x = np.stack([ids[s:s + seq] for s in starts])
        y = np.stack([ids[s + 1:s + seq + 1] for s in starts])
        yield md.Tensor(x), md.Tensor(y)


def count(tree):
    n = 0

    def walk(t):
        nonlocal n
        if isinstance(t, dict):
            [walk(v) for v in t.values()]
        elif isinstance(t, (list, tuple)):
            [walk(v) for v in t]
        elif t is not None:
            n += t.size
    walk(tree)
    return n


def main(steps: int = 150) -> None:
    md.set_backend("xla")
    np.random.seed(0)
    tok = md.BPETokenizer.train(BASE + STYLE, vocab_size=300)
    base_ids, style_ids = tok.encode(BASE), tok.encode(STYLE)

    model = TransformerLM(vocab_size=300, dim=64, num_heads=4, num_layers=2,
                          max_seq_len=SEQ, rope=True)
    params = model.init()

    # --- pretrain on the base corpus (full fine-tuning) -------------------
    opt = Adam(3e-3)
    step = make_train_step(model, opt, loss_fn=lm_loss)
    state = opt.init(params)
    for x, y in batches(base_ids, 8, SEQ, steps, seed=1):
        params, state, loss = step(params, state, x, y)
    print(f"pretrain loss {float(loss.item()):.3f}")

    xs, ys = next(batches(style_ids, 8, SEQ, 1, seed=2))
    print(f"style ppl before adaptation: "
          f"{perplexity(model, params, xs):.1f}")

    # --- LoRA adaptation: train ~1-2% of the parameters -------------------
    adapted = lora_init(params, rank=8, alpha=16.0)
    print(f"trainable {count(trainable_params(adapted)):,} / "
          f"{count(params):,} params")
    lopt = Adam(1e-3)
    lstate = lopt.init(trainable_params(adapted))
    lstep = make_train_step(model, lopt, loss_fn=lm_loss,
                            trainable=lora_predicate)
    for x, y in batches(style_ids, 8, SEQ, steps, seed=3):
        adapted, lstate, loss = lstep(adapted, lstate, x, y)
    print(f"lora loss {float(loss.item()):.3f}")
    print(f"style ppl after adaptation:  "
          f"{perplexity(model, adapted, xs):.1f}")

    # --- merge for serving (optionally int8) ------------------------------
    merged = merge_lora(adapted)
    served = quantize_for_serving(merged)
    full = model.apply(merged, xs)
    print(f"merged==adapter logits max-delta "
          f"{float(md.max(md.absolute(full - model.apply(adapted, xs))).item()):.2e}; "
          f"int8 ppl {perplexity(model, served, xs):.1f}")


if __name__ == "__main__":
    steps = 150
    if "--steps" in sys.argv:
        steps = int(sys.argv[sys.argv.index("--steps") + 1])
    main(steps)
