"""End-to-end language modeling: text -> BPE -> DataLoader -> LM -> generate.

Runs the full production path on whatever device jax finds (TPU if
available):

    python examples/char_lm.py [--steps N]

* trains a byte-level BPE vocabulary (native C++ tokenizer),
* packs next-token training pairs into an mmap'd dataset served by the
  native prefetching DataLoader,
* trains a RoPE TransformerLM with Adam under one md.jit'd train step,
* checkpoints and resumes exactly,
* decodes a sample with the compiled (single lax.scan) serving path.
"""

from __future__ import annotations

import io
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import minidiff_tpu as md
from minidiff_tpu.models import (
    Adam,
    TransformerLM,
    generate_compiled,
    lm_loss,
    make_train_step,
    perplexity,
)
from minidiff_tpu.utils import load_train_state, save_train_state

CORPUS = (
    "the quick brown fox jumps over the lazy dog. "
    "pack my box with five dozen liquor jugs. "
    "how vexingly quick daft zebras jump! "
) * 40
SEQ = 32


def main(steps: int = 120, arch: str = "transformer") -> None:
    md.set_backend("xla")
    np.random.seed(0)

    tok = md.BPETokenizer.train(CORPUS, vocab_size=300)
    ids = tok.encode(CORPUS)
    n = (len(ids) - 1) // SEQ
    x = np.asarray(ids[: n * SEQ]).reshape(n, SEQ).astype(np.int32)
    y = np.asarray(ids[1 : n * SEQ + 1]).reshape(n, SEQ).astype(np.int32)
    print(f"tokenizer: vocab {tok.vocab_size}, corpus {len(ids)} tokens, "
          f"{n} sequences")

    if arch == "mamba":
        from minidiff_tpu.models import MambaLM

        # same pipeline, attention-free: the sequence mixer is the
        # md.linear_scan selective state space (O(1)-state decode)
        model = MambaLM(vocab_size=tok.vocab_size, dim=64, num_layers=2,
                        d_state=8)
    else:
        model = TransformerLM(vocab_size=tok.vocab_size, dim=64, num_heads=4,
                              num_layers=2, max_seq_len=32, rope=True,
                              tie_embeddings=True)
    params = model.init()
    opt = Adam(3e-3)
    state = opt.init(params)
    step = make_train_step(model, opt, loss_fn=lm_loss)

    done = 0
    with md.DataLoader({"x": x, "y": y}, batch_size=16, shuffle=True,
                       seed=0) as loader:
        print(f"loader: native={loader.native}, {len(loader)} batches/epoch")
        while done < steps:
            for batch in loader:
                params, state, loss = step(params, state, batch["x"],
                                           batch["y"])
                done += 1
                if done % 40 == 0:
                    print(f"step {done:4d}  loss {float(loss.item()):.4f}")
                if done >= steps:
                    break

    # exact checkpoint/resume round-trip
    buf = io.BytesIO()
    save_train_state(buf, params, state, step=done)
    buf.seek(0)
    params, state, at, _ = load_train_state(buf, params, state)
    print(f"checkpoint round-trip at step {at}")

    # prompt with corpus tokenization: encoding a standalone fragment can
    # produce token boundaries the model never saw (e.g. "brown" without
    # its following space) — take the first corpus tokens instead
    pids = np.asarray(ids[:6])[None, :].astype(np.int32)
    prompt = tok.decode(pids[0])
    if arch == "mamba":
        from minidiff_tpu.models import generate_compiled_ssm

        out = generate_compiled_ssm(model, params, md.Tensor(pids), 12)
    else:
        ppl = perplexity(model, params, md.Tensor(x[:32]), batch_size=16)
        print(f"train perplexity: {ppl:.2f}")
        out = generate_compiled(model, params, md.Tensor(pids), 12)
    print(f"prompt:    {prompt!r}")
    print(f"generated: {tok.decode(out[0])!r}")


if __name__ == "__main__":
    n = int(sys.argv[sys.argv.index("--steps") + 1]) if "--steps" in sys.argv else 120
    arch = (sys.argv[sys.argv.index("--model") + 1]
            if "--model" in sys.argv else "transformer")
    main(n, arch)
