"""Every parallelism axis in one script, on an 8-virtual-device CPU mesh.

    python examples/distributed_training.py

Demonstrates (each training a real model for a few steps):
  dp x tp   — Megatron tensor parallelism + data parallelism
  fsdp      — ZeRO-3 parameter sharding on the dp axis
  dp x ep   — expert parallelism for the MoE LM
  pp        — GPipe pipeline (tape backward through md.ppermute)
  sp (ring) — sequence-parallel ring attention, plain and zig-zag

No TPU pod needed: the script forces 8 virtual CPU devices, exactly like
the test suite; on a real slice the same code runs unchanged.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
)

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np

import minidiff_tpu as md
from minidiff_tpu import parallel
from minidiff_tpu.models import (
    MLP,
    SGD,
    MoETransformerLM,
    TransformerLM,
    lm_loss,
    make_moe_loss,
)
from minidiff_tpu.models.data import synthetic_classification
from minidiff_tpu.models.transformer import synthetic_lm_batches


def run(title, step, params, state, batches, n=4):
    losses = []
    for _ in range(n):
        for x, y in [batches]:
            params, state, loss = step(params, state, x, y)
            losses.append(float(loss.item()))
    print(f"{title:28s} loss {losses[0]:.3f} -> {losses[-1]:.3f}")


def main() -> None:
    md.set_backend("xla")
    np.random.seed(0)
    assert len(jax.devices()) >= 8, "needs the 8-virtual-device CPU mesh"

    # --- dp x tp: Megatron transformer ---
    mesh = parallel.make_mesh({"dp": 2, "tp": 4})
    lm = TransformerLM(vocab_size=32, dim=32, num_heads=4, num_layers=2,
                       max_seq_len=16)
    init = lm.init()
    step, place_p, place_b = parallel.make_sharded_train_step(
        lm, mesh, SGD(0.5), loss_fn=lm_loss,
        param_specs=parallel.transformer_sharding_rules(init))
    x, y = next(synthetic_lm_batches(8, 16, 32, 1))
    run("dp2 x tp4 transformer", step, place_p(init), None, place_b(x, y))

    # --- FSDP / ZeRO-3 on dp ---
    mesh = parallel.make_mesh({"dp": 8})
    mlp = MLP(64, (128,), 8)
    init = mlp.init()
    rules = parallel.fsdp_sharding_rules(init, mesh, min_size=2**10)
    step, place_p, place_b = parallel.make_sharded_train_step(
        mlp, mesh, SGD(0.2), param_specs=rules)
    xs, ys = synthetic_classification(64, 64, 8)
    run("fsdp(dp8) MLP", step, place_p(init),
        None, place_b(md.Tensor(xs), md.Tensor(ys)))

    # --- dp x ep: MoE ---
    mesh = parallel.make_mesh({"dp": 2, "ep": 4})
    moe = MoETransformerLM(vocab_size=32, dim=16, num_heads=2, num_layers=1,
                           num_experts=4, max_seq_len=8, k=1)
    init = moe.init()
    step, place_p, place_b = parallel.make_sharded_train_step(
        moe, mesh, SGD(0.5), loss_fn=make_moe_loss(0.01),
        param_specs=parallel.moe_sharding_rules(init),
        apply_fn=moe.apply_with_aux)
    x, y = next(synthetic_lm_batches(4, 8, 32, 1))
    run("dp2 x ep4 MoE", step, place_p(init), None, place_b(x, y))

    # --- pp: GPipe pipeline ---
    mesh = parallel.make_mesh({"pp": 4})
    plm = TransformerLM(vocab_size=32, dim=16, num_heads=2, num_layers=4,
                        max_seq_len=8)
    step, params, state = parallel.make_pipeline_train_step(
        plm, mesh, n_micro=4, optimizer=SGD(0.5))
    x, y = next(synthetic_lm_batches(8, 8, 32, 1))
    run("pp4 GPipe pipeline", step, params, state, (x, y))

    # --- sp: ring attention, plain and zig-zag ---
    mesh = parallel.make_mesh({"sp": 4})
    rlm = TransformerLM(vocab_size=32, dim=16, num_heads=2, num_layers=1,
                        max_seq_len=16, rope=True)
    for zz in (False, True):
        step, params, state = parallel.make_ring_train_step(
            rlm, mesh, SGD(0.5), zigzag=zz)
        x, y = next(synthetic_lm_batches(2, 16, 32, 1))
        run(f"sp4 ring (zigzag={zz})", step, params, state, (x, y))


if __name__ == "__main__":
    main()
