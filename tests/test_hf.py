"""HuggingFace checkpoint conversion (models/hf.py).

Builds tiny randomly-initialized ``transformers`` models OFFLINE (from
configs — no hub access), converts them with from_hf_*, and pins our
logits against the torch forward in float64.  This exercises the exact
same weight mapping a real pretrained checkpoint would take: fused QKV
column reorder, torch-Linear transposes, the rotate-half -> interleaved
RoPE permutation, GQA interleaving, and SwiGLU pair-major fusion.
"""

from __future__ import annotations

import numpy as np
import pytest

import minidiff_tpu as md
from minidiff_tpu.models.hf import (from_hf, from_hf_gpt2, from_hf_llama,
                                    to_hf_state_dict)
from minidiff_tpu.models.transformer import generate, generate_cached

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

from transformers import GPT2Config, GPT2LMHeadModel  # noqa: E402
from transformers import LlamaConfig, LlamaForCausalLM  # noqa: E402


def _gpt2_tiny():
    cfg = GPT2Config(
        vocab_size=97, n_positions=64, n_embd=32, n_layer=2, n_head=4,
        resid_pdrop=0.0, embd_pdrop=0.0, attn_pdrop=0.0,
    )
    torch.manual_seed(0)
    return GPT2LMHeadModel(cfg).double().eval()


def _llama_tiny(kv_heads=2, attention_bias=False, tie=False):
    cfg = LlamaConfig(
        vocab_size=97, hidden_size=32, intermediate_size=56,
        num_hidden_layers=2, num_attention_heads=4,
        num_key_value_heads=kv_heads, max_position_embeddings=64,
        rms_norm_eps=1e-5, rope_theta=10000.0,
        attention_bias=attention_bias, tie_word_embeddings=tie,
    )
    torch.manual_seed(1)
    return LlamaForCausalLM(cfg).double().eval()


def _hf_logits(hf_model, ids: np.ndarray) -> np.ndarray:
    with torch.no_grad():
        out = hf_model(torch.tensor(ids, dtype=torch.long)).logits
    return out.numpy()


def _our_logits(model, params, ids: np.ndarray) -> np.ndarray:
    with md.no_grad():
        return np.asarray(model.apply(params, md.Tensor(ids)))


def test_gpt2_logits_exact(backend):
    hf = _gpt2_tiny()
    model, params = from_hf_gpt2(hf)
    ids = np.random.RandomState(0).randint(0, 97, size=(2, 17))
    ref = _hf_logits(hf, ids)
    got = _our_logits(model, params, ids)
    # identical math in f64: pre-LN, tanh-GELU, learned positions, tied head
    np.testing.assert_allclose(got, ref, rtol=1e-10, atol=1e-10)


@pytest.mark.parametrize("kv_heads,attention_bias,tie", [
    (2, False, False),   # GQA, separate wq/wkv
    (4, False, True),    # MHA -> fused qkv; tied head
    (2, True, False),    # biased attention projections
])
def test_llama_logits(backend, kv_heads, attention_bias, tie):
    hf = _llama_tiny(kv_heads=kv_heads, attention_bias=attention_bias, tie=tie)
    model, params = from_hf_llama(hf)
    ids = np.random.RandomState(1).randint(0, 97, size=(2, 23))
    ref = _hf_logits(hf, ids)
    got = _our_logits(model, params, ids)
    # HF computes RoPE inv_freq in float32 even on double models; the
    # residual disagreement is that cast, not the mapping
    np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-6)


def test_from_hf_dispatch():
    gm, _ = from_hf(_gpt2_tiny())
    assert not gm.rope and gm.tie_embeddings
    lm, _ = from_hf(_llama_tiny())
    assert lm.rope and lm.blocks[0].mlp == "swiglu"


def test_gpt2_greedy_generate_matches_hf(backend):
    hf = _gpt2_tiny()
    model, params = from_hf_gpt2(hf)
    prompt = np.random.RandomState(2).randint(0, 97, size=(1, 5))
    with torch.no_grad():
        ref = hf.generate(
            torch.tensor(prompt, dtype=torch.long), max_new_tokens=8,
            do_sample=False, pad_token_id=0,
        ).numpy()
    got = np.asarray(generate(model, params, md.Tensor(prompt), 8))
    np.testing.assert_array_equal(got, ref)


def test_converted_llama_cached_decode(backend):
    """The converted tree (rope + GQA + biases off + SwiGLU) drives the
    KV-cached decode path and agrees with the full-forward generate."""
    hf = _llama_tiny(kv_heads=2)
    model, params = from_hf_llama(hf)
    prompt = np.random.RandomState(3).randint(0, 97, size=(2, 4))
    full = np.asarray(generate(model, params, md.Tensor(prompt), 6))
    cached = np.asarray(generate_cached(model, params, md.Tensor(prompt), 6))
    np.testing.assert_array_equal(full, cached)


@pytest.mark.parametrize("family,kwargs", [
    ("gpt2", {}),
    ("llama", {"kv_heads": 2}),
    ("llama", {"kv_heads": 4, "tie": True}),
    ("llama", {"kv_heads": 2, "attention_bias": True}),
])
def test_roundtrip_export(family, kwargs):
    """to_hf_state_dict inverts from_hf bitwise: every weight in the
    original HF state dict is reproduced exactly."""
    md.set_backend("numpy")
    hf = _gpt2_tiny() if family == "gpt2" else _llama_tiny(**kwargs)
    model, params = from_hf(hf)
    sd = to_hf_state_dict(model, params)
    ref = hf.state_dict()
    for k, v in sd.items():
        np.testing.assert_array_equal(
            v.numpy(), ref[k].numpy(), err_msg=k)
    # every WEIGHT key round-trips (what's absent is only non-persistent
    # buffers / duplicated tied heads, which load_state_dict tolerates)
    missing = {k for k in ref if k not in sd}
    assert all(".attn.bias" in k or ".attn.masked_bias" in k
               or "rotary" in k for k in missing), missing


def test_export_loads_into_fresh_hf_model(backend):
    """Full circle: import -> perturb nothing -> export -> load into a fresh
    torch model -> logits still agree."""
    hf = _llama_tiny(kv_heads=2)
    model, params = from_hf_llama(hf)
    fresh = _llama_tiny(kv_heads=2)  # same shapes, different random seed use
    sd = {k: v.to(torch.float64) for k, v in
          to_hf_state_dict(model, params).items()}
    fresh.load_state_dict(sd, strict=False)
    ids = np.random.RandomState(5).randint(0, 97, size=(2, 11))
    np.testing.assert_allclose(
        _hf_logits(fresh, ids), _hf_logits(hf, ids), rtol=1e-12, atol=1e-12)


def test_converted_gpt2_trains():
    """Converted params are live Tensor leaves: one SGD step through the
    tape backward lowers the loss (fine-tuning a lifted checkpoint)."""
    md.set_backend("xla")
    hf = _gpt2_tiny()
    model, params = from_hf_gpt2(hf)
    from minidiff_tpu.models.optim import SGD
    from minidiff_tpu.models.transformer import lm_loss

    toks = md.Tensor(np.random.RandomState(4).randint(0, 97, size=(4, 16)))

    def loss_fn(p):
        return lm_loss(model.apply(p, toks)[:, :-1], toks[:, 1:])

    opt = SGD(lr=0.1)
    state = opt.init(params)
    l0 = float(loss_fn(params).item())
    g = md.grad(loss_fn)(params)
    params2, _ = opt.update(params, g, state)
    l1 = float(loss_fn(params2).item())
    assert l1 < l0


# ---------------------------------------------------------------------------
# round-3 regressions: config validation + state-dict bias detection
# (ADVICE r2) and Mistral/Qwen2 family coverage (VERDICT r2 item 9)
# ---------------------------------------------------------------------------

from transformers import MistralConfig, MistralForCausalLM  # noqa: E402
from transformers import Qwen2Config, Qwen2ForCausalLM  # noqa: E402


def _mistral_tiny(window=8):
    cfg = MistralConfig(
        vocab_size=97, hidden_size=32, intermediate_size=56,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=64, rms_norm_eps=1e-5, rope_theta=10000.0,
        sliding_window=window, attn_implementation="eager",
    )
    torch.manual_seed(2)
    return MistralForCausalLM(cfg).double().eval()


def _qwen2_tiny():
    cfg = Qwen2Config(
        vocab_size=97, hidden_size=32, intermediate_size=56,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=64, rms_norm_eps=1e-5, rope_theta=10000.0,
        attn_implementation="eager",
    )
    torch.manual_seed(3)
    m = Qwen2ForCausalLM(cfg).double().eval()
    # HF _init_weights zeroes biases on random models, which is exactly how
    # the config-flag bias probe shipped broken (ADVICE r2 high) — put real
    # values in the q/k/v biases the way a trained checkpoint has them
    g = torch.Generator().manual_seed(7)
    with torch.no_grad():
        for layer in m.model.layers:
            for proj in (layer.self_attn.q_proj, layer.self_attn.k_proj,
                         layer.self_attn.v_proj):
                proj.bias.copy_(torch.randn(
                    proj.bias.shape, generator=g, dtype=torch.float64) * 0.3)
    return m


def test_qwen2_biases_detected_from_state_dict(backend):
    """Qwen2 configs carry no attention_bias attribute but the checkpoint
    has q/k/v biases; they must survive conversion (detected from the
    state dict, not the config)."""
    hf = _qwen2_tiny()
    model, params = from_hf(hf)
    assert "b" in params["blocks"][0]["attn"]["wq"], \
        "q/k/v biases must survive conversion"
    ids = np.random.RandomState(6).randint(0, 97, size=(2, 23))
    np.testing.assert_allclose(
        _our_logits(model, params, ids), _hf_logits(hf, ids),
        rtol=1e-5, atol=1e-6)


def test_mistral_sliding_window_maps(backend):
    """Mistral's sliding_window becomes TransformerLM(window=...) and the
    logits match torch's eager sliding-window attention at seq > window
    (full attention would diverge here)."""
    hf = _mistral_tiny(window=8)
    model, params = from_hf(hf)
    assert model.window == 8
    ids = np.random.RandomState(7).randint(0, 97, size=(2, 23))
    np.testing.assert_allclose(
        _our_logits(model, params, ids), _hf_logits(hf, ids),
        rtol=1e-5, atol=1e-6)


def test_mistral_no_window_when_none():
    md.set_backend("numpy")
    hf = _mistral_tiny(window=None)
    model, _ = from_hf(hf)
    assert model.window is None


def test_rope_scaling_refused():
    md.set_backend("numpy")
    hf = _llama_tiny()
    hf.config.rope_scaling = {"rope_type": "linear", "factor": 2.0}
    with pytest.raises(ValueError, match="rope_scaling"):
        from_hf_llama(hf)


def test_non_silu_act_refused():
    md.set_backend("numpy")
    hf = _llama_tiny()
    hf.config.hidden_act = "gelu"
    with pytest.raises(ValueError, match="hidden_act"):
        from_hf_llama(hf)


def test_gpt2_exact_gelu_refused():
    md.set_backend("numpy")
    hf = _gpt2_tiny()
    hf.config.activation_function = "gelu"
    with pytest.raises(ValueError, match="activation_function"):
        from_hf_gpt2(hf)


def test_gpt2_nonstandard_attn_scaling_refused():
    md.set_backend("numpy")
    hf = _gpt2_tiny()
    hf.config.scale_attn_by_inverse_layer_idx = True
    with pytest.raises(ValueError, match="scale_attn_by_inverse_layer_idx"):
        from_hf_gpt2(hf)


# -- Phi family: parallel residual block + partial rotary -------------------


def _phi_tiny(partial=0.5):
    from transformers import PhiConfig, PhiForCausalLM

    cfg = PhiConfig(
        vocab_size=97, hidden_size=32, intermediate_size=72,
        num_hidden_layers=2, num_attention_heads=2,
        partial_rotary_factor=partial, max_position_embeddings=64,
        layer_norm_eps=1e-5, rope_theta=10000.0,
        resid_pdrop=0.0, embd_pdrop=0.0, attention_dropout=0.0,
    )
    torch.manual_seed(3)
    return PhiForCausalLM(cfg).double().eval()


@pytest.mark.parametrize("partial", [0.5, 1.0])
def test_phi_logits(backend, partial):
    hf = _phi_tiny(partial)
    model, params = from_hf(hf)  # dispatcher detects self_attn.dense
    assert model.blocks[0].parallel
    if partial < 1.0:
        assert model.blocks[0].attn.rope_dim == int(partial * 16)
    ids = np.random.RandomState(4).randint(0, 97, size=(2, 11))
    ours = _our_logits(model, params, ids)
    want = _hf_logits(hf, ids)
    np.testing.assert_allclose(ours, want, rtol=1e-9, atol=1e-9)


def test_phi_greedy_generate_matches_hf(backend):
    hf = _phi_tiny()
    model, params = from_hf(hf)
    ids = np.random.RandomState(5).randint(0, 97, size=(1, 6))
    with torch.no_grad():
        want = hf.generate(
            torch.tensor(ids, dtype=torch.long), max_new_tokens=8,
            do_sample=False, pad_token_id=0).numpy()
    got = generate(model, params, md.Tensor(ids), max_new_tokens=8,
                   greedy=True)
    np.testing.assert_array_equal(np.asarray(got.detach()), want)


def test_phi_cached_decode_matches_parallel_forward(backend):
    # the KV-cached paths recompute ln1 inside block_finish for the
    # parallel block — must agree with the one-shot parallel forward
    hf = _phi_tiny()
    model, params = from_hf(hf)
    ids = np.random.RandomState(6).randint(0, 97, size=(1, 5))
    a = generate(model, params, md.Tensor(ids), max_new_tokens=6,
                 greedy=True)
    b = generate_cached(model, params, md.Tensor(ids), 6)
    np.testing.assert_array_equal(np.asarray(a.detach()),
                                  np.asarray(b.detach()))


def test_phi_qk_layernorm_refused():
    from transformers import PhiConfig, PhiForCausalLM

    cfg = PhiConfig(vocab_size=97, hidden_size=32, intermediate_size=72,
                    num_hidden_layers=1, num_attention_heads=2,
                    qk_layernorm=True)
    torch.manual_seed(7)
    with pytest.raises(ValueError, match="qk_layernorm"):
        from_hf(PhiForCausalLM(cfg))


def test_phi_converted_trains(backend):
    from minidiff_tpu.models import SGD, lm_loss, make_train_step

    hf = _phi_tiny()
    model, params = from_hf(hf)
    toks = md.Tensor(np.random.RandomState(8).randint(0, 97, size=(4, 12)))
    step = make_train_step(model, SGD(5e-2), loss_fn=lm_loss)
    state = None
    losses = []
    for _ in range(8):
        params, state, loss = step(params, state, toks, toks)
        losses.append(float(loss.item()))
    assert losses[-1] < losses[0], losses


def test_phi_compiled_decode_matches_eager():
    from minidiff_tpu.models import generate_compiled

    md.set_backend("xla")
    hf = _phi_tiny()
    model, params = from_hf(hf)
    ids = np.random.RandomState(9).randint(0, 97, size=(2, 5))
    want = generate_cached(model, params, md.Tensor(ids), 7)
    got = generate_compiled(model, params, md.Tensor(ids), 7)
    np.testing.assert_array_equal(np.asarray(got.detach()),
                                  np.asarray(want.detach()))


# -- Gemma family: GeGLU + (1+w) RMSNorm + folded sqrt(d) embeddings -------


def _gemma_tiny(kv_heads=2, act="gelu_pytorch_tanh"):
    from transformers import GemmaConfig, GemmaForCausalLM

    cfg = GemmaConfig(
        vocab_size=97, hidden_size=32, intermediate_size=64,
        num_hidden_layers=2, num_attention_heads=4,
        num_key_value_heads=kv_heads, head_dim=8,
        max_position_embeddings=64, rms_norm_eps=1e-6,
        rope_theta=10000.0, hidden_act=act,
        attention_dropout=0.0,
    )
    torch.manual_seed(11)
    return GemmaForCausalLM(cfg).double().eval()


@pytest.mark.parametrize("kv_heads", [4, 2, 1])
def test_gemma_logits(backend, kv_heads):
    hf = _gemma_tiny(kv_heads)
    model, params = from_hf(hf)  # dispatcher keys on config.model_type
    assert model.blocks[0].mlp == "geglu"
    ids = np.random.RandomState(12).randint(0, 97, size=(2, 9))
    ours = _our_logits(model, params, ids)
    want = _hf_logits(hf, ids)
    # HF GemmaRMSNorm hard-codes float32 stats even for double models;
    # 1e-5/1e-7 is the same tolerance class as the LLaMA f32-cast tests
    np.testing.assert_allclose(ours, want, rtol=1e-5, atol=1e-7)


def test_gemma_exact_erf_gelu(backend):
    # original-release checkpoints use the EXACT erf GELU -> md.erf path
    hf = _gemma_tiny(act="gelu")
    model, params = from_hf(hf)
    assert model.blocks[0].mlp == "geglu_erf"
    ids = np.random.RandomState(13).randint(0, 97, size=(1, 7))
    np.testing.assert_allclose(_our_logits(model, params, ids),
                               _hf_logits(hf, ids), rtol=1e-5, atol=1e-7)


def test_gemma_greedy_generate_matches_hf(backend):
    hf = _gemma_tiny()
    model, params = from_hf(hf)
    ids = np.random.RandomState(14).randint(0, 97, size=(1, 5))
    with torch.no_grad():
        want = hf.generate(
            torch.tensor(ids, dtype=torch.long), max_new_tokens=8,
            do_sample=False, pad_token_id=0).numpy()
    got = generate(model, params, md.Tensor(ids), max_new_tokens=8,
                   greedy=True)
    np.testing.assert_array_equal(np.asarray(got.detach()), want)


def test_gemma_cached_decode_agrees(backend):
    hf = _gemma_tiny()
    model, params = from_hf(hf)
    ids = np.random.RandomState(15).randint(0, 97, size=(1, 6))
    a = generate(model, params, md.Tensor(ids), max_new_tokens=6,
                 greedy=True)
    b = generate_cached(model, params, md.Tensor(ids), 6)
    np.testing.assert_array_equal(np.asarray(a.detach()),
                                  np.asarray(b.detach()))


def test_gemma_softcap_refused():
    from transformers import GemmaConfig, GemmaForCausalLM

    cfg = GemmaConfig(vocab_size=97, hidden_size=32, intermediate_size=64,
                      num_hidden_layers=1, num_attention_heads=4,
                      head_dim=8)
    cfg.attn_logit_softcapping = 50.0
    torch.manual_seed(16)
    with pytest.raises(ValueError, match="soft-capping"):
        from_hf(GemmaForCausalLM(cfg))


def test_gemma_nonstandard_head_dim_refused():
    from transformers import GemmaConfig, GemmaForCausalLM

    cfg = GemmaConfig(vocab_size=97, hidden_size=32, intermediate_size=64,
                      num_hidden_layers=1, num_attention_heads=4,
                      head_dim=16)  # != hidden // heads
    torch.manual_seed(17)
    with pytest.raises(ValueError, match="head_dim"):
        from_hf(GemmaForCausalLM(cfg))


def test_phi_roundtrip_export(backend):
    hf = _phi_tiny()
    model, params = from_hf(hf)
    sd = to_hf_state_dict(model, params)
    want = hf.state_dict()
    assert set(sd) == set(want)
    for k in want:
        np.testing.assert_array_equal(sd[k].numpy(), want[k].numpy(),
                                      err_msg=k)


def test_gemma_roundtrip_export(backend):
    hf = _gemma_tiny(kv_heads=2)
    model, params = from_hf(hf)
    sd = to_hf_state_dict(model, params)
    want = hf.state_dict()
    assert set(sd) == set(want)
    for k in want:
        np.testing.assert_allclose(sd[k].numpy(), want[k].numpy(),
                                   rtol=1e-14, atol=1e-15, err_msg=k)


def test_gemma_export_loads_into_fresh_hf_model(backend):
    hf = _gemma_tiny()
    model, params = from_hf(hf)
    sd = to_hf_state_dict(model, params)
    fresh = _gemma_tiny()  # same seed/config, then overwrite
    with torch.no_grad():
        for k, v in fresh.state_dict().items():
            v.zero_()
    missing, unexpected = fresh.load_state_dict(sd, strict=False)
    assert not unexpected, unexpected
    ids = np.random.RandomState(18).randint(0, 97, size=(1, 6))
    np.testing.assert_allclose(_hf_logits(fresh, ids), _hf_logits(hf, ids),
                               rtol=1e-12, atol=1e-12)


def test_phi_sharding_rules_and_tp_step():
    # parallel blocks have no ln2 and a biased head: the sharding rules
    # must mirror the actual tree (review finding: KeyError 'ln2')
    import jax as _jax

    if len(_jax.devices()) < 8:
        pytest.skip("needs 8 devices")
    from transformers import PhiConfig, PhiForCausalLM

    from minidiff_tpu import parallel
    from minidiff_tpu.models import SGD, lm_loss

    md.set_backend("xla")
    cfg = PhiConfig(
        vocab_size=96, hidden_size=32, intermediate_size=64,
        num_hidden_layers=2, num_attention_heads=2,
        partial_rotary_factor=0.5, max_position_embeddings=64,
        resid_pdrop=0.0, embd_pdrop=0.0, attention_dropout=0.0)
    torch.manual_seed(22)
    hf = PhiForCausalLM(cfg).double().eval()
    model, params = from_hf(hf)
    rules = parallel.transformer_sharding_rules(params)
    assert "ln2" not in rules["blocks"][0]
    assert "b" in rules["head"]
    mesh = parallel.make_mesh({"dp": 4, "tp": 2})
    step, place_params, place_batch = parallel.make_sharded_train_step(
        model, mesh, SGD(0.01), loss_fn=lm_loss, param_specs=rules)
    x = md.Tensor(np.random.RandomState(20).randint(0, 96, size=(8, 8)))
    xb, yb = place_batch(x, x)
    p = place_params(params)
    p, s, loss = step(p, None, xb, yb)
    assert np.isfinite(float(loss.item()))


def test_phi_ring_attention_parity():
    # review finding: the ring block ignored parallel residuals — the
    # sequence-parallel step must match the single-device step exactly
    import jax as _jax

    if len(_jax.devices()) < 4:
        pytest.skip("needs 4 devices")
    from minidiff_tpu import parallel
    from minidiff_tpu.models import SGD, lm_loss, make_train_step

    md.set_backend("xla")
    hf = _phi_tiny()
    model, params = from_hf(hf)
    x = md.Tensor(np.random.RandomState(21).randint(0, 97, size=(2, 16)))

    step1 = make_train_step(model, SGD(0.05), loss_fn=lm_loss)
    p1, _, loss1 = step1(params, None, x, x)

    mesh = parallel.make_mesh({"sp": 4})
    ring_step, ring_params, ring_state = parallel.make_ring_train_step(
        model, mesh, SGD(0.05), init_params=params)
    ring_params, ring_state, loss4 = ring_step(ring_params, ring_state, x, x)
    np.testing.assert_allclose(float(loss4.item()), float(loss1.item()),
                               rtol=1e-9)
    np.testing.assert_allclose(
        np.asarray(ring_params["blocks"][0]["fc1"]["w"]),
        np.asarray(p1["blocks"][0]["fc1"]["w"]), rtol=1e-8, atol=1e-10)


def test_tied_head_bias_refused():
    from minidiff_tpu.models import TransformerLM

    with pytest.raises(ValueError, match="head_bias"):
        TransformerLM(vocab_size=16, dim=8, num_heads=2,
                      tie_embeddings=True, head_bias=True)


# ---------------------------------------------------------------------------
# Mixtral (MoE family import, VERDICT r4 item 6)
# ---------------------------------------------------------------------------

from transformers import MixtralConfig, MixtralForCausalLM  # noqa: E402

from minidiff_tpu.models.hf import from_hf_mixtral  # noqa: E402


def _mixtral_tiny(kv_heads=2, k=2, experts=4, window=None):
    cfg = MixtralConfig(
        vocab_size=97, hidden_size=32, intermediate_size=56,
        num_hidden_layers=2, num_attention_heads=4,
        num_key_value_heads=kv_heads, max_position_embeddings=256,
        rms_norm_eps=1e-5, rope_theta=10000.0,
        num_local_experts=experts, num_experts_per_tok=k,
        sliding_window=window,
    )
    torch.manual_seed(3)
    return MixtralForCausalLM(cfg).double().eval()


@pytest.mark.parametrize("kv_heads,k,experts", [
    (2, 2, 4),   # GQA + top-2 of 4 (the Mixtral shape)
    (4, 1, 4),   # MHA, switch-style top-1
    (2, 3, 8),   # wider expert pool, k=3 renormalization
])
def test_mixtral_logits(backend, kv_heads, k, experts):
    hf = _mixtral_tiny(kv_heads=kv_heads, k=k, experts=experts)
    model, params = from_hf_mixtral(hf)
    assert model.blocks[0].moe.grouped  # the gather/scatter dispatch path
    ids = np.random.RandomState(4).randint(0, 97, size=(2, 17))
    ref = _hf_logits(hf, ids)
    got = _our_logits(model, params, ids)
    # attention/norm/expert math agrees in f64; HF hard-codes the router
    # softmax (and its top-k renormalization) to float32 even on double
    # models (MixtralSparseMoeBlock: softmax(..., dtype=torch.float)), so
    # the residual disagreement is f32 gate resolution, not the mapping
    np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-6)


def test_mixtral_auto_detect_and_config():
    hf = _mixtral_tiny()
    model, params = from_hf(hf)
    blk = model.blocks[0]
    assert model.rope and blk.moe.mlp == "swiglu" and blk.moe.renorm_gates
    # no-drop capacity: C = T regardless of routing (HF has no capacity)
    assert blk.moe.capacity(34) == 34
    # expert stacks carry no biases; router transposed to (d, E)
    assert set(params["blocks"][0]["moe"]["experts"]) == {"w1", "w2"}


def test_mixtral_refusals():
    hf = _mixtral_tiny()
    hf.config.rope_scaling = {"type": "linear", "factor": 2.0}
    with pytest.raises(ValueError, match="rope_scaling"):
        from_hf_mixtral(hf)
    hf.config.rope_scaling = None
    hf.config.hidden_act = "gelu"
    with pytest.raises(ValueError, match="hidden_act"):
        from_hf_mixtral(hf)


def test_mixtral_greedy_generate_matches_hf(backend):
    hf = _mixtral_tiny()
    model, params = from_hf_mixtral(hf)
    prompt = np.random.RandomState(5).randint(3, 97, size=(1, 6))
    with torch.no_grad():
        ref = hf.generate(
            torch.tensor(prompt, dtype=torch.long), max_new_tokens=8,
            do_sample=False, pad_token_id=0,
        ).numpy()
    got = np.asarray(generate(model, params, md.Tensor(prompt), 8))
    np.testing.assert_array_equal(got, ref)


def test_mixtral_compiled_decode_matches_generate():
    """The MoE blocks duck-type the dense serving contract: the compiled
    lax.scan decode (grouped dispatch inside the scan body) reproduces
    the full-forward greedy generate token-for-token."""
    from minidiff_tpu.models.decode import generate_compiled

    md.set_backend("xla")
    hf = _mixtral_tiny()
    model, params = from_hf_mixtral(hf)
    prompt = np.random.RandomState(6).randint(3, 97, size=(2, 5))
    ref = np.asarray(generate(model, params, md.Tensor(prompt), 7))
    got = np.asarray(generate_compiled(model, params, md.Tensor(prompt), 7))
    np.testing.assert_array_equal(got, ref)


def test_mixtral_decode_server_matches_solo():
    """Continuous batching serves the imported MoE model: per-request
    outputs are identical to solo compiled decode (no-drop capacity makes
    per-token routing independent of batch composition — the property
    that makes MoE continuous batching sound)."""
    from minidiff_tpu.models.decode import generate_compiled
    from minidiff_tpu.models.server import DecodeServer

    md.set_backend("xla")
    hf = _mixtral_tiny()
    model, params = from_hf_mixtral(hf)
    srv = DecodeServer(model, params, max_batch=3, window=128)
    rng = np.random.default_rng(7)
    prompts = [list(rng.integers(3, 97, n)) for n in (3, 6, 4)]
    slots = [srv.submit(p, max_new_tokens=5) for p in prompts]
    while not all(srv.done(s) for s in slots):
        srv.step()
    for p, s in zip(prompts, slots):
        solo = generate_compiled(
            model, params, md.Tensor(np.asarray([p])), 5)
        np.testing.assert_array_equal(
            np.asarray(srv.collect(s)), np.asarray(solo)[0, len(p):])
