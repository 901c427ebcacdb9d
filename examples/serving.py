"""The serving toolbox on one model: compiled decode, sampling, beam search,
int8 weights, int8 KV cache, and speculative decoding.

    python examples/serving.py [--steps N]

Trains a small TransformerLM (and a 1-layer draft) on the synthetic identity
task just long enough to make decoding non-trivial, then walks every serving
path the framework ships and prints tokens + timings.  Runs on whatever
device jax finds (TPU if available; CPU works).
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import minidiff_tpu as md  # noqa: E402
from minidiff_tpu.models import (SGD, TransformerLM, beam_search,
                                 generate_compiled,
                                 generate_speculative_compiled, lm_loss,
                                 make_train_step, quantize_for_serving,
                                 quantized_bytes)

STEPS = int(sys.argv[sys.argv.index("--steps") + 1]) if "--steps" in sys.argv else 40
VOCAB, DIM, HEADS, LAYERS, SEQ = 128, 256, 4, 2, 256
BATCH, PROMPT, NEW = 4, 8, 24


def train(model, steps, seed=0):
    np.random.seed(seed)
    params = model.init()
    step = make_train_step(model, SGD(3e-3), loss_fn=lm_loss)
    state = None
    rng = np.random.RandomState(seed)
    for i in range(steps):
        toks = md.Tensor(rng.randint(1, VOCAB, size=(BATCH, 64)))
        params, state, loss = step(params, state, toks, toks)
    return params, float(np.asarray(md.Tensor(loss._data)._data, np.float64))


def main() -> None:
    md.set_backend("xla")
    target = TransformerLM(vocab_size=VOCAB, dim=DIM, num_heads=HEADS,
                           num_layers=LAYERS, max_seq_len=SEQ,
                           dtype=md.float32)
    draft = TransformerLM(vocab_size=VOCAB, dim=64, num_heads=2,
                          num_layers=1, max_seq_len=SEQ, dtype=md.float32)
    params, t_loss = train(target, STEPS)
    dparams, d_loss = train(draft, STEPS, seed=1)
    print(f"trained: target loss {t_loss:.3f}, draft loss {d_loss:.3f}")

    prompt = md.Tensor(np.random.RandomState(3).randint(
        1, VOCAB, size=(2, PROMPT)))

    def show(name, fn):
        t0 = time.perf_counter()
        out = fn()
        toks = np.asarray(out._data) if isinstance(out, md.Tensor) else out
        dt = time.perf_counter() - t0
        print(f"{name:28s} {dt*1e3:8.1f} ms   {toks[0][:12].tolist()}...")
        return toks

    # 1) compiled greedy decode (prefill + lax.scan in ONE program)
    base = show("compiled greedy",
                lambda: generate_compiled(target, params, prompt, NEW))
    # 2) compiled sampling (temperature / top-k; seed is a runtime arg)
    show("compiled top-k sampling",
         lambda: generate_compiled(target, params, prompt, NEW, greedy=False,
                                   temperature=0.8, top_k=8, seed=123))
    # 3) beam search
    show("beam search (width 4)",
         lambda: beam_search(target, params, prompt, NEW, beam_width=4)[0])

    # 4) int8 weight-only serving
    qp = quantize_for_serving(params)
    print(f"weights: {quantized_bytes(params)/1e6:.1f} MB -> "
          f"{quantized_bytes(qp)/1e6:.1f} MB int8")
    show("compiled greedy, int8 W",
         lambda: generate_compiled(target, qp, prompt, NEW))
    qp4 = quantize_for_serving(params, bits=4)
    print(f"int4: {quantized_bytes(qp4)/1e6:.1f} MB (packed nibbles, "
          f"group-128 scales)")
    show("compiled greedy, int4 W",
         lambda: generate_compiled(target, qp4, prompt, NEW))
    # 5) ... plus int8 KV cache: the whole decode HBM stream is int8
    show("compiled greedy, int8 W+KV",
         lambda: generate_compiled(target, qp, prompt, NEW, kv_quant=True))

    # 6) speculative decoding: draft proposes, target verifies — output is
    # bit-identical to plain greedy
    def spec():
        toks, rounds = generate_speculative_compiled(
            target, params, draft, dparams, prompt, NEW, k=4)
        r = np.asarray(rounds._data)
        print(f"    acceptance: {NEW / r.mean():.2f} tokens/round "
              f"(rounds {r.tolist()})")
        return toks

    spec_toks = show("speculative (k=4)", spec)
    assert (spec_toks == base).all(), "speculative must equal greedy"
    print("speculative == greedy: verified")

    # 7) continuous batching: staggered requests share one slot pool and
    # decode token-identical to their solo runs
    from minidiff_tpu.models import DecodeServer

    srv = DecodeServer(target, params, max_batch=4, window=SEQ)
    rng = np.random.RandomState(4)
    reqs = [list(rng.randint(1, VOCAB, size=n)) for n in (5, 11, 8)]
    slots = [srv.submit(p, max_new_tokens=NEW) for p in reqs]
    t0 = time.perf_counter()
    while srv.active():
        srv.step()
    dt = time.perf_counter() - t0
    for p, s in zip(reqs, slots):
        solo = generate_compiled(target, params,
                                 md.Tensor(np.asarray([p])), NEW)
        assert srv.collect(s) == list(np.asarray(solo._data)[0, len(p):])
    print(f"continuous batching         {dt*1e3:8.1f} ms   "
          f"3 staggered requests == solo decodes")


if __name__ == "__main__":
    main()
