"""Flagship train-step decomposition by ablation.

Where do the ~21 ms of the bench.py TransformerLM train step go?  The
tunnel's profiler round-trips are unreliable, so this measures by ABLATION:
time the full compiled step, then variants with one component short-
circuited (attention -> identity, MLP -> identity, LayerNorm -> identity,
full loss -> mean(logits)), using the paired-chain protocol.  The time drop
of a variant ~ that component's fwd+bwd share (interactions like changed
fusion boundaries make this approximate, but it is drift-proof and directly
answers "what should the next kernel be").

Diagnostic tool: monkeypatches model internals on purpose.

Run from the repo root: `python -m benchmarks.train_profile`.
"""

from __future__ import annotations

import json
import time

import jax
import jax.numpy as jnp
import numpy as np

import minidiff_tpu as md
from minidiff_tpu.models import TransformerLM, lm_loss
from minidiff_tpu.models import functional as F
from minidiff_tpu.models import transformer as T

VOCAB, DIM, HEADS, LAYERS, SEQ, BATCH = 512, 1024, 8, 4, 1024, 8
CHAIN = 16
REPEATS = 3


def _pull(x) -> float:
    return float(jnp.sum(x).astype(jnp.float32))


def _pull_latency(probe) -> float:
    ts = []
    for _ in range(5):
        t0 = time.perf_counter()
        _pull(probe)
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts))


def _time_step(step, params0, lat) -> float:
    best = None
    for _ in range(REPEATS):
        params = params0
        t0 = time.perf_counter()
        for _ in range(CHAIN):
            params, loss = step(params)
        _pull(loss)
        dt = max(time.perf_counter() - t0 - lat, 1e-9) / CHAIN
        best = dt if best is None else min(best, dt)
    return best


def main() -> None:
    md.set_backend("xla")
    t0 = time.time()
    float(jnp.sum(jnp.ones((8, 128))))
    print(json.dumps({"warmup_pull_s": round(time.time() - t0, 1)}), flush=True)

    model = TransformerLM(vocab_size=VOCAB, dim=DIM, num_heads=HEADS,
                          num_layers=LAYERS, max_seq_len=SEQ,
                          dtype=md.bfloat16)
    np.random.seed(0)
    params0 = model.init()
    toks = md.Tensor(np.random.RandomState(1).randint(0, VOCAB, (BATCH, SEQ)))
    probe = jnp.ones((8, 128), jnp.float32)

    orig_mha_apply = T.MultiHeadAttention.apply
    orig_blk_apply = T.TransformerBlock.apply
    orig_ln_apply = T.LayerNorm.apply

    def no_attn(self, params, x, positions=None, segment_ids=None):
        # keep ONE projection so shapes/params stay live, drop sdpa+qkv cost?
        # no: drop everything — the residual stream passes through
        return x

    def no_mlp_block(self, params, x, rng=None, positions=None,
                     segment_ids=None):
        a = self.attn.apply(params["attn"], self.ln1.apply(params["ln1"], x))
        return x + a

    def no_ln(self, params, x):
        return x

    def mean_loss(logits, targets):
        return md.mean(logits)

    def no_sdpa_core(self, params, x, positions=None, segment_ids=None):
        # projections + reshapes/transposes intact; the flash fwd+bwd core
        # replaced by identity — isolates kernel cost from glue cost
        b, s, d = x.shape
        q, k, v = self.project_qkv(params, x)
        o = q + 0.0 * (k + v)
        o = md.transpose(o, axes=(0, 2, 1, 3)).reshape((b, s, d))
        return self.out.apply(params["out"], o)

    variants = {
        "full": {},
        "no_attention": {"mha": no_attn},
        "no_sdpa_core": {"mha": no_sdpa_core},
        "no_mlp": {"blk": no_mlp_block},
        "no_layernorm": {"ln": no_ln},
        "mean_loss": {"loss": mean_loss},
    }

    results = {}
    lat = _pull_latency(probe)
    for name, mods in variants.items():
        try:
            if "mha" in mods:
                T.MultiHeadAttention.apply = mods["mha"]
            if "blk" in mods:
                T.TransformerBlock.apply = mods["blk"]
            if "ln" in mods:
                T.LayerNorm.apply = mods["ln"]
            loss_fn = mods.get("loss", lm_loss)

            # manual SGD step: ablated variants leave some params unused
            # (grad None), which the real optimizer rightly rejects — here
            # they just pass through
            vag = md.value_and_grad(
                lambda p: loss_fn(model.apply(p, toks), toks))

            def tree_sgd(p, g):
                if isinstance(p, md.Tensor):
                    if g is None:
                        return p.detach(allow_grad=True)
                    return (p - 1e-3 * g).detach(allow_grad=True)
                if isinstance(p, dict):
                    return {k: tree_sgd(v, None if g is None else g[k])
                            for k, v in p.items()}
                if isinstance(p, (list, tuple)):
                    gs = g if g is not None else [None] * len(p)
                    return type(p)(tree_sgd(a, b) for a, b in zip(p, gs))
                return p

            @md.jit
            def step_c(params):
                loss, grads = vag(params)
                return tree_sgd(params, grads), loss

            def md_step(params):
                params, loss = step_c(params)
                return params, loss._data

            p, l = md_step(params0)  # compile
            _pull(l)
            results[name] = _time_step(md_step, params0, lat)
            print(json.dumps({
                "variant": name,
                "ms_per_step": round(results[name] * 1e3, 3),
                "delta_vs_full_ms": round(
                    (results["full"] - results[name]) * 1e3, 3)
                if name != "full" else 0.0,
            }), flush=True)
        finally:
            T.MultiHeadAttention.apply = orig_mha_apply
            T.TransformerBlock.apply = orig_blk_apply
            T.LayerNorm.apply = orig_ln_apply

    full = results["full"]
    print(json.dumps({
        "metric": "train_step_component_shares",
        "full_ms": round(full * 1e3, 3),
        "attention_ms": round((full - results["no_attention"]) * 1e3, 3),
        "sdpa_core_ms": round((full - results["no_sdpa_core"]) * 1e3, 3),
        "attn_proj_glue_ms": round(
            (results["no_sdpa_core"] - results["no_attention"]) * 1e3, 3),
        "mlp_ms": round((full - results["no_mlp"]) * 1e3, 3),
        "layernorm_ms": round((full - results["no_layernorm"]) * 1e3, 3),
        "loss_block_ms": round((full - results["mean_loss"]) * 1e3, 3),
    }))


if __name__ == "__main__":
    main()
