"""Headline benchmark: flagship TransformerLM train step vs jax.grad baseline.

The framework side is the real product path: models.TransformerLM (flash
attention Pallas kernels + autotuned matmuls) trained through the tape
engine's backward, everything compiled by md.jit into one XLA program.  The
baseline is an architecturally identical transformer written directly in jax
(composed softmax attention — jax's natural formulation) with
jax.value_and_grad and the same SGD update, in one jax.jit program.

vs_baseline > 1.0 means the framework trains the same model FASTER than the
handwritten jax.grad implementation (the flash backward is where it wins).

Prints the headline JSON line TWICE: once immediately after the train-step
measurement (so a driver timeout still captures the number — rounds 2 and 4
lost their perf evidence to rc!=0 runs that died before the single print),
and once enriched with the detail sections at the end.  Both lines carry the
same metric/value; parse either.  Detail rows run under a wall-clock budget
(``MINIDIFF_BENCH_BUDGET_S``, default 350 s measured from process start);
rows that would start past the budget are skipped and named in
``detail["budget_exhausted"]``.

Timing protocol: the device sits behind an async tunnel, so each measurement
chains K data-dependent steps (params feed back in) closed by a scalar host
pull, subtracts the separately measured pull latency, and divides by K.
"""

from __future__ import annotations

import json
import os
import time

import jax
import jax.numpy as jnp
import numpy as np

# Persistent XLA compilation cache: ~10 programs x 20-40s compile through the
# tunnel dominate bench wall-time; cached reruns skip all of it.  Guarded —
# the experimental platform may not support it, and the bench must never die
# on a cache failure.
try:
    _cache_dir = os.environ.get(
        "MINIDIFF_TPU_COMPILE_CACHE", "/tmp/minidiff_tpu_xla_cache")
    os.makedirs(_cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", _cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
except Exception:
    pass

# Wall-clock budget for the EXPENDABLE detail rows, measured from process
# start.  The headline is never skipped; each detail row checks the clock
# before starting and is dropped (by name) once the budget is spent, so a
# driver with a hard timeout always gets a parseable line well before it.
# The default sits WELL below the 480 s gate cap: the check runs between
# rows, so the last admitted row (which can compile for 60-100 s through
# the tunnel) plus the final print must still fit under the cap.
_T0 = time.monotonic()
_BUDGET_S = float(os.environ.get("MINIDIFF_BENCH_BUDGET_S", "350"))
_SKIPPED: list = []


def _row_allowed(name: str) -> bool:
    if time.monotonic() - _T0 > _BUDGET_S:
        _SKIPPED.append(name)
        return False
    return True


# ordered gate names of the _decode_throughput section: an early return on
# budget exhaustion must name EVERY row it forfeits, not just the first
# (r5 self-review: a timeout at decode_int8 silently dropped ten rows)
_DECODE_ROWS = ("decode", "decode_int8", "decode_int8kv", "decode_int4",
                "decode_int8kv_4k", "decode_big", "decode_moe_int8",
                "paged_bench", "spec_server", "spec_server_draft",
                "packed_bench", "moe_bench", "moe_crossover", "decode_ssm")


def _section_stopped(name: str) -> bool:
    """True when the budget is spent — records ``name`` AND every later
    row in the section, so the caller's early return under-reports
    nothing."""
    if _row_allowed(name):
        return False
    for later in _DECODE_ROWS[_DECODE_ROWS.index(name) + 1:]:
        if later not in _SKIPPED:
            _SKIPPED.append(later)
    return True


# flagship config: head_dim 128 (flash-eligible), bf16 compute
VOCAB, DIM, HEADS, LAYERS, SEQ, BATCH = 512, 1024, 8, 4, 1024, 8
LR = 1e-3
CHAIN = 16
REPEATS = 3

N_MM = 4096  # secondary matmul-parity check


def _pull(x) -> float:
    return float(jnp.sum(x).astype(jnp.float32))


def _pull_latency(probe) -> float:
    ts = []
    for _ in range(5):
        t0 = time.perf_counter()
        _pull(probe)
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts))


def _one_param_chain(step, params0, chain, lat) -> float:
    params = params0
    t0 = time.perf_counter()
    for _ in range(chain):
        params, loss = step(params)
    _pull(loss)
    return max(time.perf_counter() - t0 - lat, 1e-9) / chain


def _time_param_pair(step_a, pa0, step_b, pb0, probe, chain: int = CHAIN):
    """(s/step A, s/step B, ratio B/A) over paired param-feedback chains.

    Each measurement chains `chain` data-dependent steps closed by one
    scalar pull (the tunnel pipelines independent dispatches and fakes the
    timing otherwise), subtracting the separately measured pull latency.
    Rounds of A and B are PAIRED back-to-back because device throughput
    drifts 20-40% over minutes — the per-round ratio cancels the drift
    (median reported); absolute times are min-over-rounds.
    """
    for step, p0 in ((step_a, pa0), (step_b, pb0)):
        params, loss = step(p0)
        _pull(loss)
    lat = _pull_latency(probe)
    pairs = [
        (_one_param_chain(step_a, pa0, chain, lat),
         _one_param_chain(step_b, pb0, chain, lat))
        for _ in range(REPEATS)
    ]
    t_a = min(p[0] for p in pairs)
    t_b = min(p[1] for p in pairs)
    ratio = sorted(pb / pa for pa, pb in pairs)[len(pairs) // 2]
    return t_a, t_b, ratio


# --------------------------------------------------------------------------
# jax twin of models.TransformerLM (same math, composed attention)
# --------------------------------------------------------------------------


def _ln(x, p):
    mu = jnp.mean(x, axis=-1, keepdims=True)
    xc = x - mu
    var = jnp.mean(xc * xc, axis=-1, keepdims=True)
    return xc / jnp.sqrt(var + 1e-5) * p["g"] + p["b"]


def _gelu(x):
    c = 0.7978845608028654
    return 0.5 * x * (1.0 + jnp.tanh(c * (x + 0.044715 * x**3)))


def _attn(x, p):
    b, s, d = x.shape
    h, hd = HEADS, DIM // HEADS
    # head-major fused layout, matching models.MultiHeadAttention
    qkv = jnp.matmul(x, p["qkv"]["w"]).reshape(b, s, h, 3, hd)
    qkv = jnp.transpose(qkv, (3, 0, 2, 1, 4))
    q, k, v = qkv[0], qkv[1], qkv[2]
    scale = 1.0 / np.sqrt(hd)
    sc = jnp.einsum("bhqd,bhkd->bhqk", q, k).astype(jnp.float32) * scale
    rows = jax.lax.broadcasted_iota(jnp.int32, (s, s), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (s, s), 1)
    sc = jnp.where(rows >= cols, sc, -1e30)
    pr = jax.nn.softmax(sc, axis=-1).astype(v.dtype)
    o = jnp.einsum("bhqk,bhkd->bhqd", pr, v)
    o = jnp.transpose(o, (0, 2, 1, 3)).reshape(b, s, d)
    return jnp.matmul(o, p["out"]["w"])


def _twin_loss(p, toks):
    b, s = toks.shape
    x = p["tok_emb"][toks] + p["pos_emb"][:s]
    for blk in p["blocks"]:
        x = x + _attn(_ln(x, blk["ln1"]), blk["attn"])
        h = _gelu(jnp.matmul(_ln(x, blk["ln2"]), blk["fc1"]["w"]) + blk["fc1"]["b"])
        x = x + jnp.matmul(h, blk["fc2"]["w"]) + blk["fc2"]["b"]
    x = _ln(x, p["ln_f"])
    logits = jnp.matmul(x, p["head"]["w"])
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    flat = logp.reshape(b * s, VOCAB)
    picked = flat[jnp.arange(b * s), toks.reshape(b * s)]
    return -jnp.mean(picked)


def _matmul_parity() -> dict:
    """BASELINE config 4: 4096^2 bf16 matmul fwd+bwd, tape vs jax.grad."""
    import minidiff_tpu as md

    rng = np.random.RandomState(0)
    x0 = jnp.asarray(rng.randn(N_MM, N_MM), jnp.bfloat16)
    w0 = jnp.asarray(rng.randn(N_MM, N_MM) / np.sqrt(N_MM), jnp.bfloat16)
    lr = jnp.asarray(1e-6, jnp.bfloat16)
    lr_t = md.Tensor(lr)
    md_vag = md.value_and_grad(lambda x, w: md.sum(md.tanh(x @ w)), argnums=(0, 1))

    @md.jit
    def md_step_c(x, w):
        out, (gx, gw) = md_vag(x, w)
        return x.detach() - lr_t * gx, w.detach() - lr_t * gw

    def md_step(args):
        a, b = md_step_c(md.Tensor(args[0]), md.Tensor(args[1]))
        return (a._data, b._data), a._data

    @jax.jit
    def jax_step_c(x, w):
        out, (gx, gw) = jax.value_and_grad(
            lambda x, w: jnp.sum(jnp.tanh(jnp.matmul(x, w))), argnums=(0, 1)
        )(x, w)
        return x - lr * gx, w - lr * gw

    def jax_step(args):
        a, b = jax_step_c(*args)
        return (a, b), a

    # ~2 ms/step: needs a long chain to drown the ~27 ms pull latency
    t_md, t_jax, ratio = _time_param_pair(
        md_step, (x0, w0), jax_step, (x0, w0), x0, chain=80)
    flops = 3 * 2 * N_MM**3
    return {
        "matmul4096_bf16_fwdbwd_tflops": round(flops / t_md / 1e12, 2),
        "matmul_vs_jax_grad": round(ratio, 4),
    }


def _higher_order_cycle() -> dict:
    """README second-order cycle under reuse_graph: compiled vs eager.

    The compiled path serves f.backward(allow_higher_order=True) as a
    first-order replay and x.grad.backward() as ONE forward+sweep1+sweep2
    executable (compiled_backward); the eager path re-tapes every VJP with
    a separate device dispatch each.  Paired rounds cancel tunnel drift.
    """
    import minidiff_tpu as md
    import minidiff_tpu.compiled_backward as mcb

    n = 128
    rng = np.random.RandomState(11)
    xv = jnp.asarray(rng.randn(n, n), jnp.float32)

    def cycle():
        x = md.Tensor(xv, allow_grad=True)
        t = md.sin(x)
        for _ in range(6):
            t = md.tanh(t * x + 0.1)
        f = md.sum(t * t)
        f.backward(allow_higher_order=True)
        x.grad.backward()
        return x.grad._data

    def run_k(k):
        out = None
        for _ in range(k):
            out = cycle()
        return float(jnp.sum(out).astype(jnp.float32))

    probe = jnp.ones((8, 128), jnp.float32)
    lat = _pull_latency(probe)
    k = 8
    pairs = []
    val_c = val_e = None
    for _ in range(3):
        mcb._HO_CYCLES.clear()
        with md.reuse_graph():
            run_k(2)  # trace/warm
            t0 = time.perf_counter()
            val_c = run_k(k)
            t_comp = max(time.perf_counter() - t0 - lat, 1e-9) / k
        os.environ["MINIDIFF_TPU_COMPILED_BACKWARD"] = "0"
        try:
            with md.reuse_graph():
                run_k(1)
                t0 = time.perf_counter()
                val_e = run_k(k)
                t_eager = max(time.perf_counter() - t0 - lat, 1e-9) / k
        finally:
            os.environ.pop("MINIDIFF_TPU_COMPILED_BACKWARD", None)
        pairs.append((t_comp, t_eager))
    assert val_c is not None and abs(val_c - val_e) < 1e-2 * max(
        1.0, abs(val_e)), (val_c, val_e)
    t_c = min(p[0] for p in pairs)
    ratio = sorted(pe / pc for pc, pe in pairs)[len(pairs) // 2]
    return {
        "ho_cycle_ms": round(t_c * 1e3, 3),
        "ho_cycle_speedup_vs_eager": round(ratio, 4),
    }


def _decode_throughput() -> dict:
    """Serving path vs the handwritten jax.lax.scan twin (chained timing).

    Every row checks the wall-clock budget before starting (``_row_allowed``)
    and is individually exception-guarded, so a slow or broken row can never
    cost the driver the rows that already ran.
    """
    import minidiff_tpu as md
    from benchmarks import decode_twin as T
    from minidiff_tpu.models import TransformerLM, generate_compiled

    model = TransformerLM(vocab_size=T.VOCAB, dim=T.DIM, num_heads=T.HEADS,
                          num_layers=T.LAYERS, max_seq_len=T.CACHE,
                          dtype=md.bfloat16)
    np.random.seed(2)
    params = model.init()
    raw = jax.tree.map(lambda t: t._data, params,
                       is_leaf=lambda t: isinstance(t, md.Tensor))
    prompt_np = np.random.RandomState(3).randint(
        1, T.VOCAB, size=(T.BATCH, T.PROMPT))

    def run_fw(prompt_j):
        return generate_compiled(model, params, md.Tensor(prompt_j),
                                 T.NEW)._data

    def run_twin(prompt_j):
        return jnp.concatenate(
            [prompt_j,
             T.twin_decode(raw, prompt_j, T.NEW).astype(prompt_j.dtype)],
            axis=-1)

    # EVERY row below is individually guarded: VERDICT r2 lost the entire
    # round's perf evidence because one unguarded detail row (int8-KV)
    # crashed before the single json print.  A row that fails reports its
    # error string and the rest still run.
    out: dict = {}
    if _section_stopped("decode"):
        return out
    try:
        t_fw, t_twin, ratio = T.chain_time_pair(run_fw, run_twin, prompt_np)
        out.update({
            "decode_tok_per_s": round(T.BATCH * T.NEW / t_fw, 1),
            "decode_ms_per_token": round(t_fw / T.NEW * 1e3, 3),
            "decode_twin_ms_per_token": round(t_twin / T.NEW * 1e3, 3),
            "decode_speedup_vs_jax_twin": round(ratio, 4),
        })
    except Exception as e:
        out["decode_error"] = str(e)[:120]
        return out  # every later row compares against run_fw/run_int8

    # int8 weight-only serving: same model, matmul weights quantized to
    # int8 + per-channel scales, read through the fused dequant kernel
    # (kernels/quant.py) — decode is HBM-bound so halving the weight
    # stream should show directly.  Paired against the bf16 framework
    # decode so throughput drift cancels.
    from minidiff_tpu.models import quantize_for_serving

    if _section_stopped("decode_int8"):
        return out
    try:
        qparams = quantize_for_serving(params)

        def run_int8(prompt_j):
            return generate_compiled(model, qparams, md.Tensor(prompt_j),
                                     T.NEW)._data

        t_q, t_bf16, q_ratio = T.chain_time_pair(run_int8, run_fw, prompt_np)
        out["decode_int8_tok_per_s"] = round(T.BATCH * T.NEW / t_q, 1)
        # chain_time_pair ratio is B/A = bf16_time / int8_time
        out["decode_int8_speedup_vs_bf16"] = round(q_ratio, 4)
    except Exception as e:
        out["decode_int8_error"] = str(e)[:120]
        run_int8 = run_fw  # keep later comparisons alive vs bf16

    # int8 weights + int8 KV cache (fused sdpa_int8_cache kernel): the
    # remaining HBM stream is the quantized weights plus int8 cache lines
    if _section_stopped("decode_int8kv"):
        return out
    try:
        def run_int8kv(prompt_j):
            return generate_compiled(model, qparams, md.Tensor(prompt_j),
                                     T.NEW, kv_quant=True)._data

        t_qkv, _, qkv_ratio = T.chain_time_pair(run_int8kv, run_int8,
                                                prompt_np)
        out["decode_int8kv_tok_per_s"] = round(T.BATCH * T.NEW / t_qkv, 1)
        out["decode_int8kv_speedup_vs_int8"] = round(qkv_ratio, 4)
        # int8-KV is a CAPACITY feature at this cache size (the speed win
        # needs the KV stream to dominate — see the 4k row): lead with
        # the cache-residency ratio (int8 line + f32 scale per hd row)
        out["int8kv_cache_bytes_vs_bf16"] = round(
            (T.HD + 4) / (2 * T.HD), 4) if hasattr(T, "HD") else round(
            (128 + 4) / 256, 4)
    except Exception as e:
        out["decode_int8kv_error"] = str(e)[:120]

    # int4 weight-only (packed nibbles + group scales, dequant_matmul4):
    # half the int8 weight stream again; paired against int8
    if _section_stopped("decode_int4"):
        return out
    try:
        q4params = quantize_for_serving(params, bits=4)

        def run_int4(prompt_j):
            return generate_compiled(model, q4params, md.Tensor(prompt_j),
                                     T.NEW)._data

        t_q4, _, q4_ratio = T.chain_time_pair(run_int4, run_int8, prompt_np)
        out["decode_int4_tok_per_s"] = round(T.BATCH * T.NEW / t_q4, 1)
        out["decode_int4_speedup_vs_int8"] = round(q4_ratio, 4)
    except Exception as e:  # never let a detail row sink the headline
        out["decode_int4_error"] = str(e)[:120]

    # int8 KV at LONG context: the bench-size cache (512) is too small for
    # the halved KV stream to beat the dequant overhead (BENCH_r03 showed
    # 0.62x there); at a 4k cache the KV lines dominate the step's HBM
    # traffic and int8-KV must win.  b4 keeps prefill tractable.
    if _section_stopped("decode_int8kv_4k"):
        return out
    try:
        model_lc = TransformerLM(vocab_size=T.VOCAB, dim=T.DIM,
                                 num_heads=T.HEADS, num_layers=T.LAYERS,
                                 max_seq_len=4096, dtype=md.bfloat16)
        np.random.seed(4)
        params_lc = model_lc.init()
        qparams_lc = quantize_for_serving(params_lc)
        prompt_lc = np.random.RandomState(5).randint(
            1, T.VOCAB, size=(4, 3968))

        def run_lc_int8(prompt_j):
            return generate_compiled(model_lc, qparams_lc,
                                     md.Tensor(prompt_j), 64)._data

        def run_lc_int8kv(prompt_j):
            return generate_compiled(model_lc, qparams_lc,
                                     md.Tensor(prompt_j), 64,
                                     kv_quant=True)._data

        t_kv, t_8, kv_ratio = T.chain_time_pair(
            run_lc_int8kv, run_lc_int8, prompt_lc, chain=4)
        out["decode_int8kv_4k_tok_per_s"] = round(4 * 64 / t_kv, 1)
        out["decode_int8kv_4k_speedup_vs_int8"] = round(kv_ratio, 4)
    except Exception as e:
        out["decode_int8kv_4k_error"] = str(e)[:120]

    # quantized decode at a weight set FAR above VMEM (534 MB bf16): the
    # small bench model's whole int8 weight set (~52 MB) flirts with
    # on-chip residency, making its quant ratios bimodal run to run; at
    # 267M params the streams are physical.  int8 must win ~HBM-linearly;
    # int4 ties int8 on speed (the i32-lane unpack VPU ceiling sits at
    # int8's HBM rate — see kernels/quant.py roofline note) and wins on
    # capacity.
    if _section_stopped("decode_big"):
        return out
    try:
        model_big = TransformerLM(vocab_size=T.VOCAB, dim=2048,
                                  num_heads=16, num_kv_heads=4,
                                  num_layers=6, max_seq_len=256,
                                  dtype=md.bfloat16)
        np.random.seed(7)
        params_big = model_big.init()
        q8_big = quantize_for_serving(params_big)
        q4_big = quantize_for_serving(params_big, bits=4)
        prompt_big = np.random.RandomState(8).randint(
            1, T.VOCAB, size=(8, 16))

        def run_big_bf(p):
            return generate_compiled(model_big, params_big, md.Tensor(p),
                                     64)._data

        def run_big_i8(p):
            return generate_compiled(model_big, q8_big, md.Tensor(p),
                                     64)._data

        def run_big_i4(p):
            return generate_compiled(model_big, q4_big, md.Tensor(p),
                                     64)._data

        t8b, _, r8b = T.chain_time_pair(run_big_i8, run_big_bf, prompt_big,
                                        chain=4)
        out["decode_big_int8_tok_per_s"] = round(8 * 64 / t8b, 1)
        out["decode_big_int8_speedup_vs_bf16"] = round(r8b, 4)
        t4b, _, r4b = T.chain_time_pair(run_big_i4, run_big_i8, prompt_big,
                                        chain=4)
        out["decode_big_int4_tok_per_s"] = round(8 * 64 / t4b, 1)
        out["decode_big_int4_speedup_vs_int8"] = round(r4b, 4)
        # int4 is a CAPACITY tier on this hardware (the i32-lane nibble
        # unpack's VPU ceiling sits at int8's HBM rate, so speed at best
        # ties — kernels/quant.py roofline): report the weight-residency
        # win that is its actual product value
        from minidiff_tpu.models.quant import quantized_bytes

        out["decode_big_int4_weight_bytes_vs_int8"] = round(
            quantized_bytes(q4_big) / quantized_bytes(q8_big), 4)
        out["decode_big_int4_weight_bytes_vs_bf16"] = round(
            quantized_bytes(q4_big) / quantized_bytes(params_big), 4)
    except Exception as e:
        out["decode_big_error"] = str(e)[:120]

    # quantized MoE serving: the expert bank dominates a sparse model's
    # per-token weight stream; int8 banks through the batched dequant
    # kernel (md.dequant_matmul_bmm) should track the int8 dense win
    if _section_stopped("decode_moe_int8"):
        return out
    try:
        from minidiff_tpu.models import MoETransformerLM

        moe_m = MoETransformerLM(vocab_size=T.VOCAB, dim=1024,
                                 num_heads=8, num_kv_heads=4,
                                 num_layers=4, num_experts=8, k=2,
                                 capacity_factor=4.0, grouped=True,
                                 max_seq_len=256, norm="rms", rope=True,
                                 mlp="swiglu", mlp_hidden=2048,
                                 mlp_bias=False, renorm_gates=True,
                                 dtype=md.bfloat16)
        np.random.seed(9)
        moe_p = moe_m.init()
        moe_q = quantize_for_serving(moe_p)
        prompt_moe = np.random.RandomState(10).randint(
            1, T.VOCAB, size=(8, 16))

        def run_moe_bf(p):
            return generate_compiled(moe_m, moe_p, md.Tensor(p), 64)._data

        def run_moe_i8(p):
            return generate_compiled(moe_m, moe_q, md.Tensor(p), 64)._data

        tmq, _, rmq = T.chain_time_pair(run_moe_i8, run_moe_bf, prompt_moe,
                                        chain=4)
        out["decode_moe_int8_tok_per_s"] = round(8 * 64 / tmq, 1)
        out["decode_moe_int8_speedup_vs_bf16"] = round(rmq, 4)
    except Exception as e:
        out["decode_moe_int8_error"] = str(e)[:120]

    # paged vs dense continuous-batching step programs + sequence packing
    if _section_stopped("paged_bench"):
        return out
    try:
        from benchmarks import serving_bench as SB
        from minidiff_tpu.models import TransformerLM as _TLM

        model_srv = _TLM(vocab_size=T.VOCAB, dim=T.DIM, num_heads=T.HEADS,
                         num_layers=T.LAYERS, max_seq_len=1024,
                         dtype=md.bfloat16)
        np.random.seed(6)
        params_srv = model_srv.init()
        out.update(SB.paged_vs_dense(model_srv, params_srv))
    except Exception as e:
        out["paged_bench_error"] = str(e)[:120]
    # speculative x continuous batching: self-draft ceiling (acceptance
    # 1.0) — prices the round mechanism against k+1 dense steps
    if _section_stopped("spec_server"):
        return out
    try:
        from benchmarks import serving_bench as SBS

        out.update(SBS.speculative_server(model_srv, params_srv))
    except Exception as e:
        out["spec_server_error"] = str(e)[:120]
    # ... and the production shape: a 16x-smaller TRAINED draft, real
    # acceptance (both models briefly trained on the synthetic task)
    if _section_stopped("spec_server_draft"):
        return out
    try:
        from benchmarks import serving_bench as SBD

        out.update(SBD.speculative_server_trained_draft())
    except Exception as e:
        out["spec_server_draft_error"] = str(e)[:120]
    if _section_stopped("packed_bench"):
        return out
    try:
        from benchmarks import serving_bench as SB2
        from minidiff_tpu.models import TransformerLM as _TLM2

        model_pack = _TLM2(vocab_size=T.VOCAB, dim=T.DIM,
                           num_heads=T.HEADS, num_layers=T.LAYERS,
                           max_seq_len=1024, dtype=md.bfloat16)
        out.update(SB2.packed_vs_padded(model_pack, seq_len=1024))
    except Exception as e:
        out["packed_bench_error"] = str(e)[:120]

    # grouped-dispatch MoE step vs the dense-FFN step at equal FLOPs
    if _section_stopped("moe_bench"):
        return out
    try:
        from benchmarks import moe_bench as MB

        out.update(MB.moe_vs_dense())
    except Exception as e:
        out["moe_bench_error"] = str(e)[:120]
    # grouped-vs-one-hot crossover at the scale the grouped design is FOR
    # (E=64: the one-hot dispatch tensordots cost ~2.5*T^2*d FLOPs there)
    if _section_stopped("moe_crossover"):
        return out
    try:
        from benchmarks import moe_bench as MB3

        out.update(MB3.grouped_crossover(64))
    except Exception as e:
        out["moe_crossover_error"] = str(e)[:120]

    # Mamba SSM compiled decode (O(1) state, no KV cache) at the same
    # d/L/batch — absolute throughput, not a ratio (different model class)
    if _section_stopped("decode_ssm"):
        return out
    try:
        from minidiff_tpu.models import MambaLM, generate_compiled_ssm

        ssm = MambaLM(vocab_size=T.VOCAB, dim=T.DIM, num_layers=T.LAYERS,
                      d_state=16, dtype=md.bfloat16)
        sparams = ssm.init()
        sp = md.Tensor(prompt_np)
        o = generate_compiled_ssm(ssm, sparams, sp, T.NEW)  # compile
        import time as _time

        lats = []
        for _ in range(5):
            t0 = _time.perf_counter()
            float(jnp.sum(o._data).astype(jnp.float32))
            lats.append(_time.perf_counter() - t0)
        lat = sorted(lats)[2]

        best = None
        for _ in range(3):
            t0 = _time.perf_counter()
            o = generate_compiled_ssm(ssm, sparams, sp, T.NEW)
            float(jnp.sum(o._data).astype(jnp.float32))
            dt = max(_time.perf_counter() - t0 - lat, 1e-9)
            best = dt if best is None else min(best, dt)
        out["decode_ssm_tok_per_s"] = round(T.BATCH * T.NEW / best, 1)
    except Exception as e:
        out["decode_ssm_error"] = str(e)[:120]
    return out


def main() -> None:
    import minidiff_tpu as md
    from minidiff_tpu.models import SGD, TransformerLM, lm_loss, make_train_step

    md.set_backend("xla")

    model = TransformerLM(
        vocab_size=VOCAB, dim=DIM, num_heads=HEADS, num_layers=LAYERS,
        max_seq_len=SEQ, dtype=md.bfloat16,
    )
    np.random.seed(0)
    params0 = model.init()
    raw0 = jax.tree.map(
        lambda t: t._data, params0, is_leaf=lambda t: isinstance(t, md.Tensor)
    )
    toks_np = np.random.RandomState(1).randint(0, VOCAB, size=(BATCH, SEQ))
    toks = md.Tensor(toks_np)
    toks_j = jnp.asarray(toks_np)

    # --- framework path: tape engine + SGD, one md.jit program ---
    opt = SGD(LR)
    step_fn = make_train_step(model, opt, loss_fn=lm_loss)

    def md_step(params):
        params, _, loss = step_fn(params, None, toks, toks)
        return params, loss._data

    # --- jax.grad twin ---
    @jax.jit
    def jax_step_c(p):
        loss, g = jax.value_and_grad(_twin_loss)(p, toks_j)
        return jax.tree.map(lambda w, gw: w - LR * gw.astype(w.dtype), p, g), loss

    def jax_step(p):
        return jax_step_c(p)

    # correctness gate: identical initial loss (bf16 tolerance)
    _, l_md = md_step(params0)
    _, l_jax = jax_step(raw0)
    l1, l2 = float(jnp.asarray(l_md, jnp.float32)), float(l_jax)
    assert np.isfinite(l1) and np.isfinite(l2), (l1, l2)
    assert abs(l1 - l2) / max(abs(l2), 1e-6) < 0.05, (l1, l2)

    probe = jnp.ones((8, 128), jnp.float32)
    t_md, t_jax, train_ratio = _time_param_pair(
        md_step, params0, jax_step, raw0, probe)

    n_params = sum(int(np.prod(t.shape)) for t in jax.tree.leaves(raw0))
    # 6*P*T covers fwd (2PT) + bwd (4PT) for the matmul params; attention
    # adds 4*b*h*s^2*hd fwd (x3.5 with bwd, /2 causal)
    tok_per_step = BATCH * SEQ
    flops = int(
        6 * n_params * tok_per_step
        + 3.5 * 4 * BATCH * HEADS * SEQ * SEQ * (DIM // HEADS) / 2
    )
    headline = {
        "metric": "transformer_lm_train_step_speedup_vs_jax_grad",
        "value": round(train_ratio, 4),
        "unit": "x (jax_grad_time / framework_time)",
        "vs_baseline": round(train_ratio, 4),
        "detail": {
            "model": f"TransformerLM d{DIM} h{HEADS} L{LAYERS} S{SEQ} "
                     f"V{VOCAB} b{BATCH} bf16 ({n_params/1e6:.1f}M params)",
            "framework_ms_per_step": round(t_md * 1e3, 3),
            "jax_grad_ms_per_step": round(t_jax * 1e3, 3),
            "framework_tflops": round(flops / t_md / 1e12, 2),
            "initial_loss_framework": round(l1, 4),
            "initial_loss_jax": round(l2, 4),
        },
    }
    # Headline secured: print it NOW (flushed — stdout may be a pipe whose
    # buffer a timeout-kill would discard) so a driver timeout during the
    # expendable detail sections still captures the number.
    print(json.dumps(headline), flush=True)

    if _row_allowed("matmul_parity"):
        try:
            mm = _matmul_parity()
        except Exception as e:
            mm = {"matmul_parity_error": str(e)[:120]}
    else:
        mm = {}
    if _row_allowed("ho_cycle"):
        try:
            mm.update(_higher_order_cycle())
        except Exception as e:
            mm["ho_cycle_error"] = str(e)[:120]
    try:
        decode = _decode_throughput()
    except Exception as e:
        decode = {"decode_section_error": str(e)[:120]}

    # any Pallas compile failure seen anywhere in this run is evidence the
    # driver should record (empty in a healthy build)
    from minidiff_tpu.kernels.matmul import kernel_failures

    failures = sorted(f"{fam} @ {key}" for fam, key in kernel_failures())

    headline["detail"].update({
        "kernel_compile_failures": failures,
        **mm,
        **decode,
        "budget_exhausted": list(_SKIPPED),
        "device": str(jax.devices()[0]),
    })
    print(json.dumps(headline), flush=True)


if __name__ == "__main__":
    main()
