"""HuggingFace checkpoint interop: convert ``transformers`` causal-LM
weights into ``TransformerLM`` parameter trees.

A user of a torch-based stack can lift a GPT-2 or LLaMA-family checkpoint
straight onto this framework's TPU-native serving/training paths (compiled
decode, int8/int4 quantization, LoRA, speculative decoding, tensor-parallel
sharding rules) with one call:

    model, params = from_hf(hf_model)          # auto-detects the family
    out = generate_compiled(model, params, prompt, 64)

The conversions are exact (logits match the torch forward to numerical
precision; tests pin float64 agreement at 1e-10):

* **GPT-2** maps 1:1 — learned positional embeddings, pre-LN LayerNorm with
  bias, biased fused c_attn/c_proj projections, tanh-approximate GELU
  (``functional.gelu`` IS HF's ``gelu_new``), tied head.  HF's Conv1D
  stores weights (in, out), our Linear layout — no transpose.  Only the
  fused QKV column order changes: HF groups [q|k|v] each head-major, we
  keep HEAD-major (h, 3, hd) so TP shards hold whole heads
  (transformer.py project_qkv).
* **Phi** (parallel residual blocks + PARTIAL rotary + biased
  projections/head) and **Gemma** (GeGLU, (1+w) RMSNorm, sqrt(d)-scaled
  embeddings — all three folded exactly at conversion) map onto the same
  TransformerLM options; see their converters below.
* **LLaMA / Mistral / Qwen-style** (RMSNorm + SwiGLU + RoPE + GQA) maps
  with two layout moves: torch Linear weights (out, in) transpose to our
  (in, out), and q/k output columns permute per head from HF's rotate-half
  RoPE order (pairs (i, i+half)) to our interleaved order (pairs
  (2i, 2i+1)) — same frequencies, so attention is bit-equivalent.  Gate
  and up projections interleave PAIR-major into our fused fc1 (the layout
  that keeps silu(a)*b collective-free under TP).

The reference has no model zoo or checkpoint interop at all (SURVEY.md §1
"no L6"); this module is framework-completion beyond parity.  torch is
imported lazily so the module costs nothing unless used.
"""

from __future__ import annotations

from typing import TYPE_CHECKING

import numpy as np

import minidiff_tpu as md
from minidiff_tpu.models.transformer import TransformerLM

if TYPE_CHECKING:
    from typing import Any, Dict, Optional, Tuple

__all__ = ["from_hf", "from_hf_gpt2", "from_hf_llama",
           "from_hf_phi", "from_hf_gemma", "from_hf_mixtral",
           "to_hf_state_dict"]


def _np(t) -> np.ndarray:
    """torch tensor -> float64 numpy (conversions are exact in f64; the
    caller casts the finished tree to the serving dtype).

    Called lazily per tensor (ADVICE r2): materializing a whole checkpoint
    as f64 up front costs 8 bytes/param (~56 GB host RAM for a 7B model);
    fetching one tensor at a time keeps the peak at one tensor's worth.
    """
    return np.asarray(t.detach().cpu().to(dtype=_torch().float64).numpy())


def _torch():
    import torch

    return torch


def _tensor(a: np.ndarray, dtype) -> "md.Tensor":
    return md.Tensor(np.ascontiguousarray(a), allow_grad=True, dtype=dtype)


class _LazyF64:
    """Dict-like view over a torch state dict that converts ONE tensor to
    f64 numpy per access (ADVICE r2: an up-front ``{k: _np(v)}`` dict holds
    the entire checkpoint in f64 at once — ~56 GB host RAM at 7B)."""

    def __init__(self, sd):
        self._sd = sd

    def __getitem__(self, key: str) -> np.ndarray:
        return _np(self._sd[key])

    def __contains__(self, key: str) -> bool:
        return key in self._sd


# ---------------------------------------------------------------------------
# GPT-2
# ---------------------------------------------------------------------------


def _gpt2_qkv(w: np.ndarray, b: "Optional[np.ndarray]", h: int):
    """HF c_attn (d, 3d) columns are [q|k|v], each head-major (h, hd).
    Ours are HEAD-major (h, 3, hd).  Swap the (3, h) factors."""
    d = w.shape[0]
    hd = d // h
    w = w.reshape(d, 3, h, hd).transpose(0, 2, 1, 3).reshape(d, 3 * d)
    if b is not None:
        b = b.reshape(3, h, hd).transpose(1, 0, 2).reshape(3 * d)
    return w, b


def from_hf_gpt2(hf_model, dtype=None) -> "Tuple[TransformerLM, Any]":
    """GPT2LMHeadModel -> (TransformerLM, params).  Exact: same tanh-GELU,
    pre-LN, learned absolute positions, tied head.

    Refuses configs whose math this mapping does not reproduce (ADVICE r2:
    silently-wrong conversions are worse than errors): the exact-erf
    ``gelu`` activation and the nonstandard attention-scaling flags.
    """
    cfg = hf_model.config
    act = getattr(cfg, "activation_function", "gelu_new")
    if act not in ("gelu_new",):
        raise ValueError(
            f"from_hf_gpt2: activation_function={act!r} is not the tanh "
            "GELU this conversion maps exactly; refusing a silently-wrong "
            "model")
    for flag in ("scale_attn_by_inverse_layer_idx", "reorder_and_upcast_attn"):
        if bool(getattr(cfg, flag, False)):
            raise ValueError(
                f"from_hf_gpt2: config flag {flag}=True changes the "
                "attention math; this conversion does not reproduce it")
    raw = hf_model.state_dict()
    sd = _LazyF64(raw)
    h = cfg.n_head
    inner = cfg.n_inner if cfg.n_inner is not None else 4 * cfg.n_embd
    model = TransformerLM(
        vocab_size=cfg.vocab_size, dim=cfg.n_embd, num_heads=h,
        num_layers=cfg.n_layer, max_seq_len=cfg.n_positions,
        mlp_hidden=inner, tie_embeddings=True, attn_bias=True,
        mlp_bias=True, norm="layer", norm_eps=float(cfg.layer_norm_epsilon),
        dtype=dtype,
    )
    blocks = []
    for i in range(cfg.n_layer):
        p = f"transformer.h.{i}."
        qkv_w, qkv_b = _gpt2_qkv(sd[p + "attn.c_attn.weight"],
                                 sd[p + "attn.c_attn.bias"], h)
        blocks.append({
            "ln1": {"g": _tensor(sd[p + "ln_1.weight"], dtype),
                    "b": _tensor(sd[p + "ln_1.bias"], dtype)},
            "attn": {
                "qkv": {"w": _tensor(qkv_w, dtype), "b": _tensor(qkv_b, dtype)},
                "out": {"w": _tensor(sd[p + "attn.c_proj.weight"], dtype),
                        "b": _tensor(sd[p + "attn.c_proj.bias"], dtype)},
            },
            "ln2": {"g": _tensor(sd[p + "ln_2.weight"], dtype),
                    "b": _tensor(sd[p + "ln_2.bias"], dtype)},
            "fc1": {"w": _tensor(sd[p + "mlp.c_fc.weight"], dtype),
                    "b": _tensor(sd[p + "mlp.c_fc.bias"], dtype)},
            "fc2": {"w": _tensor(sd[p + "mlp.c_proj.weight"], dtype),
                    "b": _tensor(sd[p + "mlp.c_proj.bias"], dtype)},
        })
    params = {
        "tok_emb": _tensor(sd["transformer.wte.weight"], dtype),
        "pos_emb": _tensor(sd["transformer.wpe.weight"], dtype),
        "blocks": blocks,
        "ln_f": {"g": _tensor(sd["transformer.ln_f.weight"], dtype),
                 "b": _tensor(sd["transformer.ln_f.bias"], dtype)},
    }
    return model, params


# ---------------------------------------------------------------------------
# LLaMA family (also Mistral/Qwen-shaped state dicts)
# ---------------------------------------------------------------------------


def _rope_perm(hd: int) -> np.ndarray:
    """Column permutation taking HF rotate-half feature order to our
    interleaved-pair order: ours[2i] = hf[i], ours[2i+1] = hf[i + hd/2].
    Applying it to BOTH q and k projection columns leaves the attention
    scores invariant while making our interleaved RoPE compute exactly
    HF's rotate-half rotation (same per-pair frequencies)."""
    half = hd // 2
    perm = np.empty(hd, dtype=np.int64)
    perm[0::2] = np.arange(half)
    perm[1::2] = np.arange(half) + half
    return perm


def _permute_heads(w: np.ndarray, n_heads: int) -> np.ndarray:
    """Apply the RoPE column permutation per head to a (d, n_heads*hd)
    projection weight."""
    d, cols = w.shape
    hd = cols // n_heads
    perm = _rope_perm(hd)
    return w.reshape(d, n_heads, hd)[:, :, perm].reshape(d, cols)


def from_hf_llama(hf_model, dtype=None) -> "Tuple[TransformerLM, Any]":
    """LlamaForCausalLM (or any model with the same module names:
    Mistral, Qwen2, ...) -> (TransformerLM, params) with rope=True,
    RMSNorm, SwiGLU, GQA.

    Config fields that change the math are validated, not ignored
    (ADVICE r2): ``rope_scaling`` (Llama-3.x) and non-SiLU ``hidden_act``
    (Gemma-style checkpoints share these module names) raise; Mistral's
    ``sliding_window`` maps onto ``TransformerLM(window=...)`` — the
    framework's banded flash kernels compute exactly that mask.

    Attention biases are detected from the STATE DICT, not a config flag:
    Qwen2 configs have no ``attention_bias`` attribute but their
    checkpoints carry q/k/v biases (ADVICE r2 found the config-flag probe
    silently dropped them: 0.44 max logit error on a tiny Qwen2).
    """
    cfg = hf_model.config
    if getattr(cfg, "rope_scaling", None) is not None:
        raise ValueError(
            "from_hf_llama: rope_scaling is set (Llama-3.x style); this "
            "conversion maps plain RoPE only and the result would be "
            "silently wrong — refusing")
    act = getattr(cfg, "hidden_act", "silu")
    if act not in ("silu",):
        raise ValueError(
            f"from_hf_llama: hidden_act={act!r}; this conversion maps the "
            "SwiGLU (silu) MLP only — refusing a silently-wrong model")
    raw = hf_model.state_dict()
    sd = _LazyF64(raw)
    h = cfg.num_attention_heads
    kv = getattr(cfg, "num_key_value_heads", None) or h
    d = cfg.hidden_size
    hd = d // h
    # bias presence comes from the weights themselves (see docstring)
    attn_bias = "model.layers.0.self_attn.q_proj.bias" in sd
    tie = bool(getattr(cfg, "tie_word_embeddings", False))
    window = getattr(cfg, "sliding_window", None)
    if window is not None and not getattr(cfg, "use_sliding_window", True):
        window = None  # Qwen2 ships the field with the feature disabled
    model = TransformerLM(
        vocab_size=cfg.vocab_size, dim=d, num_heads=h,
        num_layers=cfg.num_hidden_layers,
        max_seq_len=cfg.max_position_embeddings,
        mlp_hidden=cfg.intermediate_size, num_kv_heads=kv, rope=True,
        rope_base=float(getattr(cfg, "rope_theta", 10000.0)),
        tie_embeddings=tie, attn_bias=attn_bias, mlp_bias=False,
        norm="rms", norm_eps=float(cfg.rms_norm_eps), mlp="swiglu",
        window=None if window is None else int(window),
        dtype=dtype,
    )
    blocks = []
    for i in range(cfg.num_hidden_layers):
        p = f"model.layers.{i}."
        # torch Linear stores (out, in): _llama_attn_params transposes to
        # our (in, out) and applies the RoPE/GQA head interleaves
        attn = _llama_attn_params(sd, p, d, h, kv, dtype,
                                  attn_bias=attn_bias)
        gate = sd[p + "mlp.gate_proj.weight"].T  # (d, I)
        up = sd[p + "mlp.up_proj.weight"].T
        inner = gate.shape[1]
        # PAIR-major fused fc1: gate/value columns adjacent per hidden unit
        fc1 = np.stack([gate, up], axis=2).reshape(d, 2 * inner)
        blocks.append({
            "ln1": {"g": _tensor(sd[p + "input_layernorm.weight"], dtype)},
            "attn": attn,
            "ln2": {"g": _tensor(sd[p + "post_attention_layernorm.weight"],
                                 dtype)},
            "fc1": {"w": _tensor(fc1, dtype)},
            "fc2": {"w": _tensor(sd[p + "mlp.down_proj.weight"].T, dtype)},
        })
    params: "Dict[str, Any]" = {
        "tok_emb": _tensor(sd["model.embed_tokens.weight"], dtype),
        "blocks": blocks,
        "ln_f": {"g": _tensor(sd["model.norm.weight"], dtype)},
    }
    if not tie:
        params["head"] = {"w": _tensor(sd["lm_head.weight"].T, dtype)}
    return model, params


# ---------------------------------------------------------------------------
# Mixtral (LLaMA attention + top-k routed SwiGLU experts)
# ---------------------------------------------------------------------------


def _llama_attn_params(sd, p: str, d: int, h: int, kv: int,
                       dtype, attn_bias: bool = False) -> "Dict[str, Any]":
    """Map one layer's HF q/k/v/o projections (LLaMA module names) onto
    our fused head-major attention tree — the ONE home for this mapping,
    shared by the LLaMA, Gemma, and Mixtral converters (same RoPE column
    permutation, same GQA interleave; ``attn_bias`` adds the Qwen2-style
    per-head-permuted projection biases)."""
    hd = d // h
    wq = _permute_heads(sd[p + "self_attn.q_proj.weight"].T, h)
    wk = _permute_heads(sd[p + "self_attn.k_proj.weight"].T, kv)
    wv = sd[p + "self_attn.v_proj.weight"].T
    attn: "Dict[str, Any]" = {
        "out": {"w": _tensor(sd[p + "self_attn.o_proj.weight"].T, dtype)},
    }
    if kv == h:
        qkv = np.stack(
            [wq.reshape(d, h, hd), wk.reshape(d, h, hd),
             wv.reshape(d, h, hd)], axis=2,
        ).reshape(d, 3 * d)
        attn["qkv"] = {"w": _tensor(qkv, dtype)}
    else:
        wkv = np.stack(
            [wk.reshape(d, kv, hd), wv.reshape(d, kv, hd)], axis=2,
        ).reshape(d, 2 * kv * hd)
        attn["wq"] = {"w": _tensor(wq, dtype)}
        attn["wkv"] = {"w": _tensor(wkv, dtype)}
    if attn_bias:
        perm = _rope_perm(hd)
        bq = sd[p + "self_attn.q_proj.bias"].reshape(h, hd)[:, perm]
        bk = sd[p + "self_attn.k_proj.bias"].reshape(kv, hd)[:, perm]
        bv = sd[p + "self_attn.v_proj.bias"].reshape(kv, hd)
        if kv == h:
            attn["qkv"]["b"] = _tensor(
                np.stack([bq, bk, bv], axis=1).reshape(3 * d), dtype)
        else:
            attn["wq"]["b"] = _tensor(bq.reshape(d), dtype)
            attn["wkv"]["b"] = _tensor(
                np.stack([bk, bv], axis=1).reshape(2 * kv * hd), dtype)
        attn["out"]["b"] = _tensor(
            sd[p + "self_attn.o_proj.bias"]
            if p + "self_attn.o_proj.bias" in sd else np.zeros(d), dtype)
    return attn


def from_hf_mixtral(hf_model, dtype=None):
    """MixtralForCausalLM -> (MoETransformerLM, params) — the MoE family
    import (VERDICT r4 item 6).

    Attention/norms map exactly like LLaMA (GQA + RoPE column permutation,
    RMSNorm, optional sliding window).  The sparse-MoE layer maps onto
    ``MoEFeedForward(mlp="swiglu", renorm_gates=True, grouped=True)``:

    * router: ``block_sparse_moe.gate.weight`` (E, d) transposes to our
      (d, E) router matmul;
    * experts: each expert's ``w1`` (gate) and ``w3`` (up) interleave
      PAIR-major into our fused (d, 2*ff) w1 — the same layout the dense
      SwiGLU uses so silu(a)*b stays collective-free under tp — and
      ``w2`` transposes to (ff, d); all E experts stack on a leading axis
      sharded by ``parallel.moe_sharding_rules`` (ep);
    * routing: HF softmaxes ALL router logits, takes top-k, and divides
      by their sum.  Our iterative-argmax router with
      ``renorm_gates=True`` computes exactly that (same selected set,
      same renormalized weights);
    * capacity: HF has NO expert capacity (every token reaches its top-k
      experts).  ``capacity_factor = E / k`` makes our static capacity
      C = T, so nothing ever drops — exact parity, and per-token outputs
      independent of batch composition (what continuous batching needs).
      Serving at scale may lower it and accept drops.

    Returns a serving-ready model: the MoE blocks duck-type the dense
    serving contract, so generate_compiled / DecodeServer run unchanged.
    """
    from minidiff_tpu.models.moe import MoETransformerLM

    cfg = hf_model.config
    act = getattr(cfg, "hidden_act", "silu")
    if act not in ("silu",):
        raise ValueError(
            f"from_hf_mixtral: hidden_act={act!r}; the SwiGLU expert "
            "mapping is exact for silu only — refusing")
    if getattr(cfg, "rope_scaling", None) is not None:
        raise ValueError("from_hf_mixtral: rope_scaling is unmapped")
    if bool(getattr(cfg, "tie_word_embeddings", False)):
        raise ValueError(
            "from_hf_mixtral: tied embeddings are unmapped (Mixtral "
            "checkpoints ship untied heads)")
    raw = hf_model.state_dict()
    sd = _LazyF64(raw)
    d = cfg.hidden_size
    h = cfg.num_attention_heads
    kv = getattr(cfg, "num_key_value_heads", None) or h
    e = cfg.num_local_experts
    k = cfg.num_experts_per_tok
    ff = cfg.intermediate_size
    window = getattr(cfg, "sliding_window", None)
    model = MoETransformerLM(
        vocab_size=cfg.vocab_size, dim=d, num_heads=h,
        num_layers=cfg.num_hidden_layers, num_experts=e, k=k,
        max_seq_len=cfg.max_position_embeddings,
        capacity_factor=float(e) / float(k), grouped=True,
        norm="rms", norm_eps=float(cfg.rms_norm_eps),
        num_kv_heads=kv, rope=True,
        rope_base=float(getattr(cfg, "rope_theta", 10000.0)),
        window=None if window is None else int(window),
        attn_bias=False, mlp="swiglu", mlp_hidden=ff, mlp_bias=False,
        renorm_gates=True, dtype=dtype,
    )
    blocks = []
    for i in range(cfg.num_hidden_layers):
        p = f"model.layers.{i}."
        mp = p + "block_sparse_moe."
        w1 = np.empty((e, d, 2 * ff))
        w2 = np.empty((e, ff, d))
        for j in range(e):
            gate = sd[mp + f"experts.{j}.w1.weight"].T    # (d, ff)
            up = sd[mp + f"experts.{j}.w3.weight"].T      # (d, ff)
            w1[j] = np.stack([gate, up], axis=2).reshape(d, 2 * ff)
            w2[j] = sd[mp + f"experts.{j}.w2.weight"].T   # (ff, d)
        blocks.append({
            "ln1": {"g": _tensor(sd[p + "input_layernorm.weight"], dtype)},
            "attn": _llama_attn_params(sd, p, d, h, kv, dtype),
            "ln2": {"g": _tensor(
                sd[p + "post_attention_layernorm.weight"], dtype)},
            "moe": {
                "router": {"w": _tensor(sd[mp + "gate.weight"].T, dtype)},
                "experts": {"w1": _tensor(w1, dtype),
                            "w2": _tensor(w2, dtype)},
            },
        })
    params = {
        "tok_emb": _tensor(sd["model.embed_tokens.weight"], dtype),
        "blocks": blocks,
        "ln_f": {"g": _tensor(sd["model.norm.weight"], dtype)},
        "head": {"w": _tensor(sd["lm_head.weight"].T, dtype)},
    }
    return model, params


# ---------------------------------------------------------------------------
# Export: our params -> HF state dict (train/fine-tune here, serve anywhere)
# ---------------------------------------------------------------------------


def _arr(t: "md.Tensor") -> np.ndarray:
    return np.asarray(t.detach() if hasattr(t, "detach") else t)


def to_hf_state_dict(model: "TransformerLM", params) -> "Dict[str, Any]":
    """Inverse of from_hf_*: a TransformerLM parameter tree -> torch state
    dict in the matching HF layout — GPT-2 (learned positions + LayerNorm),
    Phi (parallel blocks), Gemma (GeGLU + unfolded norm/embedding scales),
    or LLaMA-family (rope + RMSNorm + SwiGLU).  Exact inverse of the
    import mapping — ``to_hf_state_dict(*from_hf(m))`` reproduces
    ``m.state_dict()`` bitwise for GPT-2/LLaMA/Phi and to f64 rounding for
    Gemma (whose import folds multiply by sqrt(d)).  Load with
    ``hf_model.load_state_dict(sd, strict=False)`` (non-persistent HF
    buffers like GPT-2's causal-mask ``attn.bias`` are not weights)."""
    torch = _torch()

    def T(a):
        return torch.from_numpy(np.ascontiguousarray(np.asarray(a)))

    blk0 = model.blocks[0]
    h, hd = blk0.attn.num_heads, blk0.attn.head_dim
    kv = blk0.attn.num_kv_heads
    d = model.dim
    sd: "Dict[str, Any]" = {}
    if getattr(blk0, "parallel", False):  # Phi layout
        rot = blk0.attn.rope_dim or hd
        inv = np.argsort(_rope_perm_partial(hd, rot))
        sd["model.embed_tokens.weight"] = T(_arr(params["tok_emb"]))
        for i, bp in enumerate(params["blocks"]):
            p = f"model.layers.{i}."
            w = _arr(bp["attn"]["qkv"]["w"]).reshape(d, h, 3, hd)
            b = _arr(bp["attn"]["qkv"]["b"]).reshape(h, 3, hd)
            sd[p + "self_attn.q_proj.weight"] = T(
                w[:, :, 0][:, :, inv].reshape(d, d).T)
            sd[p + "self_attn.q_proj.bias"] = T(
                b[:, 0][:, inv].reshape(d))
            sd[p + "self_attn.k_proj.weight"] = T(
                w[:, :, 1][:, :, inv].reshape(d, d).T)
            sd[p + "self_attn.k_proj.bias"] = T(
                b[:, 1][:, inv].reshape(d))
            sd[p + "self_attn.v_proj.weight"] = T(
                w[:, :, 2].reshape(d, d).T)
            sd[p + "self_attn.v_proj.bias"] = T(b[:, 2].reshape(d))
            sd[p + "self_attn.dense.weight"] = T(_arr(bp["attn"]["out"]["w"]).T)
            sd[p + "self_attn.dense.bias"] = T(_arr(bp["attn"]["out"]["b"]))
            sd[p + "mlp.fc1.weight"] = T(_arr(bp["fc1"]["w"]).T)
            sd[p + "mlp.fc1.bias"] = T(_arr(bp["fc1"]["b"]))
            sd[p + "mlp.fc2.weight"] = T(_arr(bp["fc2"]["w"]).T)
            sd[p + "mlp.fc2.bias"] = T(_arr(bp["fc2"]["b"]))
            sd[p + "input_layernorm.weight"] = T(_arr(bp["ln1"]["g"]))
            sd[p + "input_layernorm.bias"] = T(_arr(bp["ln1"]["b"]))
        sd["model.final_layernorm.weight"] = T(_arr(params["ln_f"]["g"]))
        sd["model.final_layernorm.bias"] = T(_arr(params["ln_f"]["b"]))
        sd["lm_head.weight"] = T(_arr(params["head"]["w"]).T)
        sd["lm_head.bias"] = T(_arr(params["head"]["b"]))
        return sd
    if model.rope and blk0.mlp in ("geglu", "geglu_erf"):  # Gemma layout
        # unfold the conversion-time folds (see from_hf_gemma): the sqrt(d)
        # embedding scale divides back out, norm gains shed the (1 + w)
        # convention, the final norm regains the sqrt(d) the head fold
        # removed.  Exact to f64 rounding (one multiply+divide per value).
        scale = float(np.sqrt(d))
        inv = np.argsort(_rope_perm(hd))
        sd["model.embed_tokens.weight"] = T(_arr(params["tok_emb"]) / scale)
        for i, bp in enumerate(params["blocks"]):
            p = f"model.layers.{i}."
            ap = bp["attn"]
            if "qkv" in ap:
                w = _arr(ap["qkv"]["w"]).reshape(d, h, 3, hd)
                wq, wk, wv = w[:, :, 0], w[:, :, 1], w[:, :, 2]
            else:
                wq = _arr(ap["wq"]["w"]).reshape(d, h, hd)
                wkv = _arr(ap["wkv"]["w"]).reshape(d, kv, 2, hd)
                wk, wv = wkv[:, :, 0], wkv[:, :, 1]
            sd[p + "self_attn.q_proj.weight"] = T(
                wq[:, :, inv].reshape(d, h * hd).T)
            sd[p + "self_attn.k_proj.weight"] = T(
                wk[:, :, inv].reshape(d, kv * hd).T)
            sd[p + "self_attn.v_proj.weight"] = T(wv.reshape(d, kv * hd).T)
            sd[p + "self_attn.o_proj.weight"] = T(_arr(ap["out"]["w"]).T)
            fc1 = _arr(bp["fc1"]["w"])
            inner = fc1.shape[1] // 2
            pair = fc1.reshape(d, inner, 2)
            sd[p + "mlp.gate_proj.weight"] = T(pair[:, :, 0].T)
            sd[p + "mlp.up_proj.weight"] = T(pair[:, :, 1].T)
            sd[p + "mlp.down_proj.weight"] = T(_arr(bp["fc2"]["w"]).T)
            sd[p + "input_layernorm.weight"] = T(_arr(bp["ln1"]["g"]) - 1.0)
            sd[p + "post_attention_layernorm.weight"] = T(
                _arr(bp["ln2"]["g"]) - 1.0)
        sd["model.norm.weight"] = T(_arr(params["ln_f"]["g"]) * scale - 1.0)
        sd["lm_head.weight"] = sd["model.embed_tokens.weight"]
        return sd
    if not model.rope:  # GPT-2 layout
        sd["transformer.wte.weight"] = T(_arr(params["tok_emb"]))
        sd["transformer.wpe.weight"] = T(_arr(params["pos_emb"]))
        for i, bp in enumerate(params["blocks"]):
            p = f"transformer.h.{i}."
            sd[p + "ln_1.weight"] = T(_arr(bp["ln1"]["g"]))
            sd[p + "ln_1.bias"] = T(_arr(bp["ln1"]["b"]))
            # HEAD-major (h, 3, hd) -> HF's [q|k|v] grouping
            w = _arr(bp["attn"]["qkv"]["w"]).reshape(d, h, 3, hd)
            sd[p + "attn.c_attn.weight"] = T(
                w.transpose(0, 2, 1, 3).reshape(d, 3 * d))
            b = _arr(bp["attn"]["qkv"]["b"]).reshape(h, 3, hd)
            sd[p + "attn.c_attn.bias"] = T(
                b.transpose(1, 0, 2).reshape(3 * d))
            sd[p + "attn.c_proj.weight"] = T(_arr(bp["attn"]["out"]["w"]))
            sd[p + "attn.c_proj.bias"] = T(_arr(bp["attn"]["out"]["b"]))
            sd[p + "ln_2.weight"] = T(_arr(bp["ln2"]["g"]))
            sd[p + "ln_2.bias"] = T(_arr(bp["ln2"]["b"]))
            sd[p + "mlp.c_fc.weight"] = T(_arr(bp["fc1"]["w"]))
            sd[p + "mlp.c_fc.bias"] = T(_arr(bp["fc1"]["b"]))
            sd[p + "mlp.c_proj.weight"] = T(_arr(bp["fc2"]["w"]))
            sd[p + "mlp.c_proj.bias"] = T(_arr(bp["fc2"]["b"]))
        sd["transformer.ln_f.weight"] = T(_arr(params["ln_f"]["g"]))
        sd["transformer.ln_f.bias"] = T(_arr(params["ln_f"]["b"]))
        sd["lm_head.weight"] = sd["transformer.wte.weight"]
        return sd

    # LLaMA-family layout
    inv = np.argsort(_rope_perm(hd))
    sd["model.embed_tokens.weight"] = T(_arr(params["tok_emb"]))
    for i, bp in enumerate(params["blocks"]):
        p = f"model.layers.{i}."
        ap = bp["attn"]
        if "qkv" in ap:
            w = _arr(ap["qkv"]["w"]).reshape(d, h, 3, hd)
            wq, wk, wv = w[:, :, 0], w[:, :, 1], w[:, :, 2]
        else:
            wq = _arr(ap["wq"]["w"]).reshape(d, h, hd)
            wkv = _arr(ap["wkv"]["w"]).reshape(d, kv, 2, hd)
            wk, wv = wkv[:, :, 0], wkv[:, :, 1]
        sd[p + "self_attn.q_proj.weight"] = T(
            wq[:, :, inv].reshape(d, h * hd).T)
        sd[p + "self_attn.k_proj.weight"] = T(
            wk[:, :, inv].reshape(d, kv * hd).T)
        sd[p + "self_attn.v_proj.weight"] = T(wv.reshape(d, kv * hd).T)
        sd[p + "self_attn.o_proj.weight"] = T(_arr(ap["out"]["w"]).T)
        if ("qkv" in ap and "b" in ap["qkv"]) or (
                "wq" in ap and "b" in ap["wq"]):
            if "qkv" in ap:
                b = _arr(ap["qkv"]["b"]).reshape(h, 3, hd)
                bq, bk, bv = b[:, 0], b[:, 1], b[:, 2]
            else:
                bq = _arr(ap["wq"]["b"]).reshape(h, hd)
                bkv = _arr(ap["wkv"]["b"]).reshape(kv, 2, hd)
                bk, bv = bkv[:, 0], bkv[:, 1]
            sd[p + "self_attn.q_proj.bias"] = T(bq[:, inv].reshape(h * hd))
            sd[p + "self_attn.k_proj.bias"] = T(bk[:, inv].reshape(kv * hd))
            sd[p + "self_attn.v_proj.bias"] = T(bv.reshape(kv * hd))
            if "b" in ap["out"]:
                sd[p + "self_attn.o_proj.bias"] = T(_arr(ap["out"]["b"]))
        fc1 = _arr(bp["fc1"]["w"])
        inner = fc1.shape[1] // 2
        pair = fc1.reshape(d, inner, 2)
        sd[p + "mlp.gate_proj.weight"] = T(pair[:, :, 0].T)
        sd[p + "mlp.up_proj.weight"] = T(pair[:, :, 1].T)
        sd[p + "mlp.down_proj.weight"] = T(_arr(bp["fc2"]["w"]).T)
        sd[p + "input_layernorm.weight"] = T(_arr(bp["ln1"]["g"]))
        sd[p + "post_attention_layernorm.weight"] = T(_arr(bp["ln2"]["g"]))
    sd["model.norm.weight"] = T(_arr(params["ln_f"]["g"]))
    if model.tie_embeddings:
        sd["lm_head.weight"] = sd["model.embed_tokens.weight"]
    else:
        sd["lm_head.weight"] = T(_arr(params["head"]["w"]).T)
    return sd


# ---------------------------------------------------------------------------
# Gemma family (GeGLU + (1+w) RMSNorm + sqrt(d)-scaled embeddings)
# ---------------------------------------------------------------------------


def from_hf_gemma(hf_model, dtype=None) -> "Tuple[TransformerLM, Any]":
    """GemmaForCausalLM -> (TransformerLM, params).

    Three Gemma-isms map onto EXACT conversion-time folds, so the model
    class needs no new runtime switches beyond the GeGLU MLP kind:

    * RMSNorm computes ``x_hat * (1 + w)`` — fold ``g = 1 + w``.
    * The embedding stream is scaled by ``sqrt(hidden)`` once at the
      input.  RMSNorm is scale-invariant in x, so a sqrt(d)-scaled
      residual stream behaves identically through every block; folding
      ``tok_emb *= sqrt(d)`` reproduces it, and dividing the FINAL
      norm's gain by sqrt(d) cancels the scale at the (tied) head —
      algebraically exact, no per-step multiply.
    * ``hidden_act``: ``gelu_pytorch_tanh`` (current checkpoints) is our
      tanh GELU -> mlp="geglu"; plain ``gelu`` (original release) is the
      exact-erf GELU -> mlp="geglu_erf" over the md.erf op.

    GQA/MQA (gemma-2b kv=1) maps like LLaMA.  Checkpoints whose
    ``head_dim != hidden // heads`` are refused loudly (our fused
    projections assume the standard factorization), as are gemma-2 style
    soft-capping / query_pre_attn_scalar configs.
    """
    cfg = hf_model.config
    d = cfg.hidden_size
    h = cfg.num_attention_heads
    hd_cfg = getattr(cfg, "head_dim", d // h)
    if hd_cfg != d // h:
        raise ValueError(
            f"from_hf_gemma: head_dim={hd_cfg} != hidden//heads={d // h}; "
            "this conversion maps the standard factorization only")
    if getattr(cfg, "attn_logit_softcapping", None) or getattr(
            cfg, "final_logit_softcapping", None):
        raise ValueError("from_hf_gemma: gemma-2 soft-capping is unmapped")
    qpas = getattr(cfg, "query_pre_attn_scalar", None)
    if qpas is not None and int(qpas) != d // h:
        raise ValueError(
            "from_hf_gemma: query_pre_attn_scalar != head_dim is unmapped")
    act = getattr(cfg, "hidden_act", None) or getattr(
        cfg, "hidden_activation", None) or "gelu_pytorch_tanh"
    if act in ("gelu_pytorch_tanh", "gelu_new"):
        mlp_kind = "geglu"
    elif act == "gelu":
        mlp_kind = "geglu_erf"
    else:
        raise ValueError(
            f"from_hf_gemma: hidden_act={act!r}; GeGLU gelu variants only")
    raw = hf_model.state_dict()
    sd = _LazyF64(raw)
    kv = getattr(cfg, "num_key_value_heads", None) or h
    hd = d // h
    scale = float(np.sqrt(d))
    model = TransformerLM(
        vocab_size=cfg.vocab_size, dim=d, num_heads=h,
        num_layers=cfg.num_hidden_layers,
        max_seq_len=cfg.max_position_embeddings,
        mlp_hidden=cfg.intermediate_size, num_kv_heads=kv, rope=True,
        rope_base=float(getattr(cfg, "rope_theta", 10000.0)),
        tie_embeddings=True, attn_bias=False, mlp_bias=False,
        norm="rms", norm_eps=float(cfg.rms_norm_eps), mlp=mlp_kind,
        dtype=dtype,
    )
    blocks = []
    for i in range(cfg.num_hidden_layers):
        p = f"model.layers.{i}."
        attn = _llama_attn_params(sd, p, d, h, kv, dtype)
        gate = sd[p + "mlp.gate_proj.weight"].T
        up = sd[p + "mlp.up_proj.weight"].T
        inner = gate.shape[1]
        fc1 = np.stack([gate, up], axis=2).reshape(d, 2 * inner)
        blocks.append({
            "ln1": {"g": _tensor(
                1.0 + sd[p + "input_layernorm.weight"], dtype)},
            "attn": attn,
            "ln2": {"g": _tensor(
                1.0 + sd[p + "post_attention_layernorm.weight"], dtype)},
            "fc1": {"w": _tensor(fc1, dtype)},
            "fc2": {"w": _tensor(sd[p + "mlp.down_proj.weight"].T, dtype)},
        })
    params: "Dict[str, Any]" = {
        "tok_emb": _tensor(sd["model.embed_tokens.weight"] * scale, dtype),
        "blocks": blocks,
        # final norm gain divided by sqrt(d): cancels the folded embedding
        # scale at the tied head (see docstring)
        "ln_f": {"g": _tensor(
            (1.0 + sd["model.norm.weight"]) / scale, dtype)},
    }
    return model, params


# ---------------------------------------------------------------------------
# Phi family (parallel residual block + partial rotary)
# ---------------------------------------------------------------------------


def _rope_perm_partial(hd: int, rot: int) -> np.ndarray:
    """Per-head column permutation for PARTIAL rotary: rotate-half ->
    interleaved inside the first ``rot`` channels, identity on the rest."""
    perm = np.arange(hd, dtype=np.int64)
    perm[:rot] = _rope_perm(rot)
    return perm


def from_hf_phi(hf_model, dtype=None) -> "Tuple[TransformerLM, Any]":
    """PhiForCausalLM -> (TransformerLM, params).

    Exercises two code paths no other family does: the PARALLEL residual
    block (one shared pre-norm feeds both branches, x + attn(h) + mlp(h),
    no post-attention norm) and PARTIAL rotary embeddings (only the first
    ``partial_rotary_factor * head_dim`` channels rotate).  Everything
    else maps onto existing options: full LayerNorm with bias, biased
    attention/MLP/head projections, tanh-GELU (HF ``gelu_new`` IS our
    ``F.gelu``).  Config fields that change the math are validated, not
    ignored (the from_hf_llama discipline).
    """
    cfg = hf_model.config
    act = getattr(cfg, "hidden_act", "gelu_new")
    if act not in ("gelu_new", "gelu_pytorch_tanh"):
        raise ValueError(
            f"from_hf_phi: hidden_act={act!r}; this conversion maps the "
            "tanh-GELU MLP only — refusing a silently-wrong model")
    if getattr(cfg, "rope_scaling", None) is not None:
        raise ValueError("from_hf_phi: rope_scaling is not supported")
    if getattr(cfg, "qk_layernorm", False):
        raise ValueError("from_hf_phi: qk_layernorm is not supported")
    raw = hf_model.state_dict()
    sd = _LazyF64(raw)
    h = cfg.num_attention_heads
    kv = getattr(cfg, "num_key_value_heads", None) or h
    if kv != h:
        raise ValueError("from_hf_phi: GQA Phi checkpoints are unmapped")
    d = cfg.hidden_size
    hd = d // h
    rot = int(getattr(cfg, "partial_rotary_factor", 0.5) * hd)
    assert rot % 2 == 0, (rot, hd)
    model = TransformerLM(
        vocab_size=cfg.vocab_size, dim=d, num_heads=h,
        num_layers=cfg.num_hidden_layers,
        max_seq_len=cfg.max_position_embeddings,
        mlp_hidden=cfg.intermediate_size, rope=True,
        rope_base=float(getattr(cfg, "rope_theta", 10000.0)),
        rope_dim=None if rot == hd else rot,
        parallel_block=True, attn_bias=True, mlp_bias=True,
        head_bias=True, norm="layer",
        norm_eps=float(getattr(cfg, "layer_norm_eps", 1e-5)),
        mlp="gelu", dtype=dtype,
    )
    perm = _rope_perm_partial(hd, rot)
    blocks = []
    for i in range(cfg.num_hidden_layers):
        p = f"model.layers.{i}."
        wq = sd[p + "self_attn.q_proj.weight"].T.reshape(d, h, hd)[:, :, perm]
        wk = sd[p + "self_attn.k_proj.weight"].T.reshape(d, h, hd)[:, :, perm]
        wv = sd[p + "self_attn.v_proj.weight"].T.reshape(d, h, hd)
        qkv = np.stack([wq, wk, wv], axis=2).reshape(d, 3 * d)
        bq = sd[p + "self_attn.q_proj.bias"].reshape(h, hd)[:, perm]
        bk = sd[p + "self_attn.k_proj.bias"].reshape(h, hd)[:, perm]
        bv = sd[p + "self_attn.v_proj.bias"].reshape(h, hd)
        blocks.append({
            "ln1": {"g": _tensor(sd[p + "input_layernorm.weight"], dtype),
                    "b": _tensor(sd[p + "input_layernorm.bias"], dtype)},
            "attn": {
                "qkv": {"w": _tensor(qkv, dtype),
                        "b": _tensor(np.stack([bq, bk, bv], axis=1)
                                     .reshape(3 * d), dtype)},
                "out": {"w": _tensor(sd[p + "self_attn.dense.weight"].T,
                                     dtype),
                        "b": _tensor(sd[p + "self_attn.dense.bias"], dtype)},
            },
            "fc1": {"w": _tensor(sd[p + "mlp.fc1.weight"].T, dtype),
                    "b": _tensor(sd[p + "mlp.fc1.bias"], dtype)},
            "fc2": {"w": _tensor(sd[p + "mlp.fc2.weight"].T, dtype),
                    "b": _tensor(sd[p + "mlp.fc2.bias"], dtype)},
        })
    params = {
        "tok_emb": _tensor(sd["model.embed_tokens.weight"], dtype),
        "blocks": blocks,
        "ln_f": {"g": _tensor(sd["model.final_layernorm.weight"], dtype),
                 "b": _tensor(sd["model.final_layernorm.bias"], dtype)},
        "head": {"w": _tensor(sd["lm_head.weight"].T, dtype),
                 "b": _tensor(sd["lm_head.bias"], dtype)},
    }
    return model, params


def from_hf(hf_model, dtype=None) -> "Tuple[TransformerLM, Any]":
    """Auto-detecting converter: dispatches on the checkpoint's module
    names (GPT-2's ``transformer.h``, Phi's ``self_attn.dense``, or
    LLaMA-family ``model.layers``)."""
    keys = hf_model.state_dict().keys()
    if any(k.startswith("transformer.h.") for k in keys):
        return from_hf_gpt2(hf_model, dtype=dtype)
    if any(k.endswith("self_attn.dense.weight") for k in keys):
        return from_hf_phi(hf_model, dtype=dtype)
    if str(getattr(hf_model.config, "model_type", "")).startswith("gemma"):
        return from_hf_gemma(hf_model, dtype=dtype)
    if any(".block_sparse_moe." in k for k in keys):
        return from_hf_mixtral(hf_model, dtype=dtype)
    if any(k.startswith("model.layers.") for k in keys):
        return from_hf_llama(hf_model, dtype=dtype)
    raise ValueError(
        "unrecognized checkpoint layout: expected GPT-2 ('transformer.h.*'), "
        "Phi ('self_attn.dense'), or LLaMA-family ('model.layers.*') "
        "module names")
