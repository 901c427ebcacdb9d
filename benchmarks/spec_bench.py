"""Speculative decoding end-to-end benchmark.

Trains a 4-layer target and a 1-layer draft on the same synthetic identity
task (both learn "predict the prompt's repeating token"), so the draft
agrees with the target at a realistic rate, then paired-chain-times the
compiled speculative path against plain compiled greedy decode.  Reports
tokens/s both ways, the speedup, and the measured acceptance (tokens per
verification round).

The outputs of the two paths are asserted identical — speculative decoding
is an exactness-preserving optimization, so any token mismatch fails the
bench before timing.

Run from the repo root: `python -m benchmarks.spec_bench`.
"""

from __future__ import annotations

import json
import time

import jax
import jax.numpy as jnp
import numpy as np

import minidiff_tpu as md
from minidiff_tpu.models import (SGD, TransformerLM, generate_compiled,
                                 generate_speculative_compiled, lm_loss,
                                 make_train_step)

VOCAB, DIM, HEADS, LAYERS, CACHE = 512, 1024, 8, 4, 1024
D_DIM, D_LAYERS = 256, 1
BATCH, PROMPT, NEW, K = 8, 16, 128, 4
TRAIN_STEPS = 60


def _train(model, steps, lr=3e-3):
    params = model.init()
    step = make_train_step(model, SGD(lr), loss_fn=lm_loss)
    state = None
    rng = np.random.RandomState(0)
    for _ in range(steps):
        toks = md.Tensor(rng.randint(1, VOCAB, size=(BATCH, 64)))
        params, state, loss = step(params, state, toks, toks)
    return params, float(jnp.asarray(loss._data, jnp.float32))


def main() -> None:
    from benchmarks.decode_twin import chain_time_pair

    md.set_backend("xla")
    t0 = time.time()
    float(jnp.sum(jnp.ones((8, 128))))
    print(json.dumps({"warmup_pull_s": round(time.time() - t0, 1)}), flush=True)

    np.random.seed(0)
    target = TransformerLM(vocab_size=VOCAB, dim=DIM, num_heads=HEADS,
                           num_layers=LAYERS, max_seq_len=CACHE,
                           dtype=md.bfloat16)
    np.random.seed(1)
    draft = TransformerLM(vocab_size=VOCAB, dim=D_DIM, num_heads=4,
                          num_layers=D_LAYERS, max_seq_len=CACHE,
                          dtype=md.bfloat16)
    tp, t_loss = _train(target, TRAIN_STEPS)
    dp, d_loss = _train(draft, TRAIN_STEPS)
    print(json.dumps({"target_loss": round(t_loss, 3),
                      "draft_loss": round(d_loss, 3)}), flush=True)

    prompt_np = np.random.RandomState(3).randint(
        1, VOCAB, size=(BATCH, PROMPT))

    def run_plain(prompt_j):
        return generate_compiled(target, tp, md.Tensor(prompt_j), NEW)._data

    rounds_seen = []

    def run_spec(prompt_j):
        toks, rounds = generate_speculative_compiled(
            target, tp, draft, dp, md.Tensor(prompt_j), NEW, k=K)
        rounds_seen.append(rounds._data)
        return toks._data

    # exactness gate before timing
    pj = jnp.asarray(prompt_np)
    a, b = np.asarray(run_plain(pj)), np.asarray(run_spec(pj))
    assert (a == b).all(), "speculative output diverged from greedy"

    t_spec, t_plain, ratio = chain_time_pair(run_spec, run_plain, prompt_np)
    rounds = np.asarray(jnp.mean(rounds_seen[-1].astype(jnp.float32)))
    print(json.dumps({
        "metric": "speculative_decode_speedup_vs_plain_greedy",
        "value": round(float(ratio), 4),
        "unit": "x",
        "vs_baseline": round(float(ratio), 4),
        "detail": {
            "plain_tok_per_s": round(BATCH * NEW / t_plain, 1),
            "spec_tok_per_s": round(BATCH * NEW / t_spec, 1),
            "k": K,
            "mean_rounds": round(float(rounds), 2),
            "mean_tokens_per_round": round(NEW / float(rounds), 2),
        },
    }))


if __name__ == "__main__":
    main()
