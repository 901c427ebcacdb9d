"""Sparse-MoE serving end to end: train a small grouped-routing MoE LM,
quantize its expert banks to int8, and serve it through the compiled
decode scan and the continuous-batching server.

    python examples/moe_serving.py [--steps N]

The same flow lifts a real Mixtral checkpoint instead of the toy model:

    from minidiff_tpu.models.hf import from_hf_mixtral
    model, params = from_hf_mixtral(hf_model)   # then everything below

Runs on whatever device jax finds (TPU if available; CPU works).
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import minidiff_tpu as md  # noqa: E402
from minidiff_tpu.models import (SGD, MoETransformerLM, generate_compiled,
                                 make_moe_loss, make_train_step,
                                 quantize_for_serving, quantized_bytes,
                                 synthetic_lm_batches)
from minidiff_tpu.models.server import DecodeServer  # noqa: E402

STEPS = int(sys.argv[sys.argv.index("--steps") + 1]) \
    if "--steps" in sys.argv else 40
VOCAB, DIM, HEADS, LAYERS, EXPERTS, K = 128, 128, 4, 2, 8, 2


def main() -> None:
    model = MoETransformerLM(
        vocab_size=VOCAB, dim=DIM, num_heads=HEADS, num_layers=LAYERS,
        num_experts=EXPERTS, k=K, max_seq_len=256, grouped=True,
        norm="rms", rope=True, mlp="swiglu", mlp_hidden=2 * DIM,
        mlp_bias=False, renorm_gates=True,
        capacity_factor=float(EXPERTS) / K,  # no-drop: batch-independent
    )
    np.random.seed(0)
    params = model.init()
    step = make_train_step(model, SGD(3e-3), loss_fn=make_moe_loss(0.01),
                           apply_fn=model.apply_with_aux)
    state = None
    for i, (x, y) in enumerate(
            synthetic_lm_batches(8, 64, VOCAB, STEPS, seed=1)):
        params, state, loss = step(params, state, x, y)
        if i % 10 == 0:
            print(f"step {i:3d}  loss {float(loss.item()):.4f}")

    prompt = md.Tensor(np.random.RandomState(2).randint(1, VOCAB, (2, 8)))

    # --- compiled greedy decode (bf16/f32 banks) ---
    t0 = time.perf_counter()
    full = generate_compiled(model, params, prompt, 24)
    print(f"\nfull-precision decode: {np.asarray(full)[0, 8:].tolist()}"
          f"  ({time.perf_counter() - t0:.2f}s incl. compile)")

    # --- int8 expert banks (md.dequant_matmul_bmm) + int8 projections ---
    qparams = quantize_for_serving(params)
    shrink = quantized_bytes(qparams) / quantized_bytes(params)
    q_out = generate_compiled(model, qparams, prompt, 24)
    print(f"int8-bank decode ({shrink:.2f}x the bytes): "
          f"{np.asarray(q_out)[0, 8:].tolist()}")

    # --- continuous batching: staggered requests, one batched program ---
    srv = DecodeServer(model, qparams, max_batch=4, window=128)
    slots = [srv.submit(list(np.asarray(prompt)[i % 2][:5 + i]), 12)
             for i in range(3)]
    while not all(srv.done(s) for s in slots):
        srv.step()
    for i, s in enumerate(slots):
        print(f"server slot {i}: {srv.collect(s)}")


if __name__ == "__main__":
    main()
