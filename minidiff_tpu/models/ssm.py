"""Selective state-space models (Mamba-style) over ``md.linear_scan``.

The sequence mixer here is not attention but a per-channel linear recurrence
``h_t = Abar_t * h_{t-1} + Bbar_t x_t`` whose decay and input maps are
*functions of the input* (the "selective" part).  On TPU the natural
formulation is a parallel prefix scan: ``md.linear_scan`` lowers to
jax.lax.associative_scan (O(log T) depth on the VPU), and because its VJPs
are themselves reversed linear scans, the tape backward of a whole Mamba
block stays a parallel scan too — no sequential T-step loop anywhere in
training.  This is the TPU-native answer to the CUDA "selective scan"
kernel: the work is elementwise map + prefix scan + matmuls, exactly the
shapes XLA tiles well, so a custom kernel adds nothing a fusion pass
doesn't already do.

Components (faithful to the Mamba architecture, sized for clarity):

- causal depthwise conv over the sequence: K static shifted adds (K is 4),
  which XLA fuses into one elementwise pass — no gather, no conv lowering
- input-dependent dt/B/C projections; ``dt`` through softplus, ``A`` stored
  as ``A_log`` with A = -exp(A_log) (always-stable decay |Abar| < 1)
- discretization abar = exp(dt*A), bbar*x = dt*B*x (zero-order hold)
- gated output y * silu(z) and the usual pre-norm residual stack

``MambaLM`` mirrors ``TransformerLM``'s interface (init/apply -> logits,
``lm_loss`` compatible) so the training toolkit, LoRA, and the data
pipeline apply unchanged.

No reference counterpart: /root/reference (ahoynodnarb/minidiff) has no
models layer at all; this extends SURVEY §8's model families with a
state-space family.
"""

from __future__ import annotations

import math
from typing import TYPE_CHECKING

import numpy as np

import minidiff_tpu as md
from minidiff_tpu.models.functional import silu
from minidiff_tpu.models.layers import Linear, Module
from minidiff_tpu.models.transformer import RMSNorm

if TYPE_CHECKING:
    from typing import Any, Dict, Optional

__all__ = ["MambaBlock", "MambaLM", "softplus"]


def softplus(x: "md.Tensor") -> "md.Tensor":
    """log(1 + exp(x)), overflow-safe: relu(x) + log1p(exp(-|x|))."""
    return md.maximum(x, md.zeros_like(x)) + md.log(1.0 + md.exp(-md.absolute(x)))


class MambaBlock(Module):
    """One selective-SSM mixer: in-proj -> causal depthwise conv -> SSM scan
    -> gate -> out-proj.  Shapes follow the Mamba paper: d_inner = expand *
    dim, state size n = d_state per channel, dt bottleneck dt_rank."""

    def __init__(self, dim: int, d_state: int = 16, d_conv: int = 4,
                 expand: int = 2, dt_rank: "Optional[int]" = None,
                 dtype: "Optional[Any]" = None):
        self.dim = dim
        self.d_state = d_state
        self.d_conv = d_conv
        self.d_inner = expand * dim
        self.dt_rank = dt_rank if dt_rank is not None else max(1, math.ceil(dim / 16))
        self.dtype = dtype
        self.in_proj = Linear(dim, 2 * self.d_inner, bias=False, dtype=dtype)
        self.x_proj = Linear(self.d_inner, self.dt_rank + 2 * d_state,
                             bias=False, dtype=dtype)
        self.dt_proj = Linear(self.dt_rank, self.d_inner, bias=True,
                              dtype=dtype)
        self.out_proj = Linear(self.d_inner, dim, bias=False, dtype=dtype)

    def init(self) -> "Dict[str, Any]":
        di, n, k = self.d_inner, self.d_state, self.d_conv
        # A_log init: A = -(1..n) per channel (the S4D-real spectrum) keeps
        # the slowest mode near exp(-dt) and the fastest near exp(-n*dt)
        a = np.tile(np.arange(1, n + 1, dtype=np.float64), (di, 1))
        conv_w = np.random.uniform(-1.0, 1.0, (k, di)) / math.sqrt(k)
        dt_p = self.dt_proj.init()
        # dt bias init so softplus(dt_bias) spans ~[1e-3, 1e-1] (Mamba's
        # dt_init): random log-uniform, inverse-softplus'd
        dt = np.exp(np.random.uniform(math.log(1e-3), math.log(1e-1),
                                      (di,)))
        dt_p["b"] = md.Tensor(dt + np.log(-np.expm1(-dt)), allow_grad=True,
                              dtype=self.dtype)
        return {
            "in_proj": self.in_proj.init(),
            "conv_w": md.Tensor(conv_w, allow_grad=True, dtype=self.dtype),
            "conv_b": md.Tensor(np.zeros(di), allow_grad=True,
                                dtype=self.dtype),
            "x_proj": self.x_proj.init(),
            "dt_proj": dt_p,
            "A_log": md.Tensor(np.log(a), allow_grad=True, dtype=self.dtype),
            "D": md.Tensor(np.ones(di), allow_grad=True, dtype=self.dtype),
            "out_proj": self.out_proj.init(),
        }

    def _causal_conv(self, params, x):
        """Depthwise causal conv over seq: y_t = sum_j w_j x_{t-(K-1)+j}.
        K static shifted slices + weighted adds — one fused elementwise
        pass under XLA, and every shift is differentiable through the
        getitem/concat VJPs."""
        b, s, di = x.shape
        w = params["conv_w"]
        out = x * w[self.d_conv - 1]
        for j in range(self.d_conv - 1):
            shift = self.d_conv - 1 - j  # how far back this tap reaches
            if shift >= s:
                continue
            zeros = md.zeros_like(x[:, :shift])
            out = out + md.concat((zeros, x[:, :s - shift]), axis=1) * w[j]
        return out + params["conv_b"]

    def _dtbc(self, params, x):
        """Input-dependent dt (b, ..., di) and B/C (b, ..., n) — shared by
        the parallel forward and the recurrent step so they cannot drift."""
        dtr, n = self.dt_rank, self.d_state
        proj = self.x_proj.apply(params["x_proj"], x)
        dt = softplus(self.dt_proj.apply(params["dt_proj"],
                                         proj[..., :dtr]))
        return dt, proj[..., dtr:dtr + n], proj[..., dtr + n:]

    def apply(self, params, u):
        """(b, s, dim) -> (b, s, dim)."""
        return self._forward(params, u, collect_state=False)[0]

    def apply_with_state(self, params, u, lengths=None):
        """Parallel forward that also hands off the decode state after the
        last position — the prefill path: the whole prompt in one parallel
        scan, then O(1)-state ``step`` decoding continues from it.

        ``lengths`` (B,) int makes the batch RAGGED: rows are right-padded
        to u's length and each row's handoff state reflects exactly its
        own ``lengths[b]`` tokens.  Pad steps become identities inside the
        scan (dt masks to 0, so abar = exp(0) = 1 and the input term
        vanishes) and the conv window gathers each row's last K-1 VALID
        inputs by one-hot contraction — all static shapes."""
        return self._forward(params, u, collect_state=True, lengths=lengths)

    def _forward(self, params, u, collect_state, lengths=None):
        b, s, _ = u.shape
        di, n, k = self.d_inner, self.d_state, self.d_conv
        # in_proj columns are PAIR-major (x_j, z_j): a tp column shard then
        # holds matching x/z pairs, so this reshape-split propagates the
        # sharding instead of forcing a boundary reshard (same trick as the
        # fused qkv HEAD-major layout and SwiGLU's pair-major fc1)
        xz = self.in_proj.apply(params["in_proj"], u).reshape((b, s, di, 2))
        x_raw, z = xz[:, :, :, 0], xz[:, :, :, 1]
        x = silu(self._causal_conv(params, x_raw))

        dt, B, C = self._dtbc(params, x)   # (b,s,di), (b,s,n), (b,s,n)
        if lengths is not None:
            # ragged rows: zero dt at pad steps -> abar = exp(0) = 1 and
            # bx = 0, so the recurrence carries h through pads unchanged
            valid = (md.arange(s).reshape((1, s)) <
                     lengths.reshape((b, 1))).astype(dt.dtype)
            dt = dt * valid.reshape((b, s, 1))

        A = -md.exp(params["A_log"])                               # (di,n)
        dtA = dt.reshape((b, s, di, 1)) * A                        # (b,s,di,n)
        abar = md.exp(dtA)
        bx = (dt * x).reshape((b, s, di, 1)) * B.reshape((b, s, 1, n))
        h = md.linear_scan(abar, bx, axis=1)                       # (b,s,di,n)
        y = (h * C.reshape((b, s, 1, n))).sum(axis=-1)             # (b,s,di)
        y = y + x * params["D"]
        y = y * silu(z)
        out = self.out_proj.apply(params["out_proj"], y)
        if not collect_state:
            return out, None
        # decode handoff: last hidden + the last K-1 raw conv inputs
        # (zero-padded on the left when the prompt is shorter than the
        # window, matching init_state's zeros)
        state = {"h": h[:, -1]}
        if lengths is not None:
            # per-row window rows length-(K-1)+j gathered by one-hot over
            # positions; out-of-range rows (short prompts) hit nothing and
            # stay exactly zero, matching init_state
            tpos = md.arange(s).reshape((1, 1, s))
            tgt = (lengths.reshape((b, 1, 1)) - (k - 1)
                   + md.arange(k - 1).reshape((1, k - 1, 1)))
            w = (tpos == tgt).astype(x_raw.dtype)        # (b, k-1, s)
            state["conv"] = md.einsum("bjs,bsd->bjd", w, x_raw)
            return out, state
        take = min(k - 1, s)
        parts = [x_raw[:, :1] * 0] * (k - 1 - take)
        if take:
            parts.append(x_raw[:, s - take:])
        state["conv"] = (md.concat(parts, axis=1) if len(parts) > 1
                         else (parts[0] if parts
                               else md.Tensor(np.zeros((b, 0, di)))))
        return out, state

    # -- recurrent decode: O(1) state per token, no KV cache ---------------

    def init_state(self, batch: int):
        """Decode state: the SSM hidden h (b, di, n) plus the last K-1
        conv-tap inputs (b, K-1, di) — constant-size regardless of how many
        tokens have been consumed (the SSM serving advantage)."""
        di, n, k = self.d_inner, self.d_state, self.d_conv
        return {
            "h": md.Tensor(np.zeros((batch, di, n))),
            "conv": md.Tensor(np.zeros((batch, k - 1, di))),
        }

    def step(self, params, state, u_t):
        """One token: u_t (b, dim), state from ``init_state``/previous step
        -> (y_t (b, dim), new state).  Exactly the ``apply`` math at one
        position: the conv window comes from the state buffer and the scan
        collapses to a single recurrence update h = abar*h + bx."""
        b, _ = u_t.shape
        di, n, k = self.d_inner, self.d_state, self.d_conv
        xz = self.in_proj.apply(params["in_proj"], u_t).reshape((b, di, 2))
        x, z = xz[:, :, 0], xz[:, :, 1]
        x_raw = x  # pre-conv input, pushed into the rolling conv window

        # causal conv over [conv buffer | x]: tap j weights position
        # t-(K-1)+j, so the buffer rows are taps 0..K-2 and x is tap K-1
        w = params["conv_w"]
        conv = x * w[k - 1]
        for j in range(k - 1):
            conv = conv + state["conv"][:, j] * w[j]
        x = silu(conv + params["conv_b"])

        dt, B, C = self._dtbc(params, x)    # (b,di), (b,n), (b,n)
        A = -md.exp(params["A_log"])        # (di,n)
        abar = md.exp(dt.reshape((b, di, 1)) * A)
        bx = (dt * x).reshape((b, di, 1)) * B.reshape((b, 1, n))
        h = abar * state["h"] + bx
        y = (h * C.reshape((b, 1, n))).sum(axis=-1) + x * params["D"]
        y = y * silu(z)
        if k > 1:
            new_conv = md.concat((state["conv"][:, 1:],
                                  x_raw.reshape((b, 1, di))), axis=1)
        else:
            new_conv = state["conv"]  # K=1: no history needed
        return (self.out_proj.apply(params["out_proj"], y),
                {"h": h, "conv": new_conv})


class MambaLM(Module):
    """Decoder-only SSM LM: token embedding, N pre-RMSNorm Mamba blocks with
    residuals, final norm, (tied) vocab head.  Same init/apply contract as
    ``TransformerLM`` so ``lm_loss``, ``make_train_step``, LoRA, and the
    sharding rules compose unchanged."""

    def __init__(self, vocab_size: int = 256, dim: int = 128,
                 num_layers: int = 2, d_state: int = 16, d_conv: int = 4,
                 expand: int = 2, tie_embeddings: bool = True,
                 dtype: "Optional[Any]" = None):
        self.vocab_size = vocab_size
        self.dim = dim
        self.tie_embeddings = tie_embeddings
        self.blocks = [
            MambaBlock(dim, d_state=d_state, d_conv=d_conv, expand=expand,
                       dtype=dtype)
            for _ in range(num_layers)
        ]
        self.norms = [RMSNorm(dim, dtype=dtype) for _ in range(num_layers)]
        self.ln_f = RMSNorm(dim, dtype=dtype)
        if not tie_embeddings:
            self.head = Linear(dim, vocab_size, bias=False, dtype=dtype)
        self.dtype = dtype

    def init(self) -> "Dict[str, Any]":
        scale = 1.0 / math.sqrt(self.dim)
        tok = np.random.normal(0.0, scale, (self.vocab_size, self.dim))
        params = {
            "tok_emb": md.Tensor(tok, allow_grad=True, dtype=self.dtype),
            "blocks": [blk.init() for blk in self.blocks],
            "norms": [nm.init() for nm in self.norms],
            "ln_f": self.ln_f.init(),
        }
        if not self.tie_embeddings:
            params["head"] = self.head.init()
        return params

    def apply(self, params, tokens):
        """tokens (B, S) int -> logits (B, S, V)."""
        x = params["tok_emb"][tokens]
        for blk, nm, bp, np_ in zip(self.blocks, self.norms,
                                    params["blocks"], params["norms"]):
            x = x + blk.apply(bp, nm.apply(np_, x))
        x = self.ln_f.apply(params["ln_f"], x)
        if self.tie_embeddings:
            return md.matmul_nt(x, params["tok_emb"])
        return self.head.apply(params["head"], x)

    # -- recurrent decode ---------------------------------------------------

    def init_state(self, batch: int):
        return [blk.init_state(batch) for blk in self.blocks]

    def step(self, params, state, tokens_t):
        """One decode step: tokens_t (B,) int -> (logits (B, V), state).

        Unlike a transformer there is no KV cache growing with the
        sequence: per block the state is one (b, di, n) hidden + a
        (b, K-1, di) conv window, constant in tokens consumed."""
        x = params["tok_emb"][tokens_t]
        new_states = []
        for blk, nm, bp, np_, st in zip(self.blocks, self.norms,
                                        params["blocks"], params["norms"],
                                        state):
            y, st2 = blk.step(bp, st, nm.apply(np_, x))
            x = x + y
            new_states.append(st2)
        x = self.ln_f.apply(params["ln_f"], x)
        if self.tie_embeddings:
            logits = md.matmul_nt(x, params["tok_emb"])
        else:
            logits = self.head.apply(params["head"], x)
        return logits, new_states

    def prefill(self, params, tokens, lengths=None):
        """Whole-prompt forward in ONE parallel pass: tokens (B, S) ->
        (last-position logits (B, V), decode states).  This is where the
        SSM's serving shape shines: prefill is a parallel prefix scan (no
        S^2 attention), and the handed-off state is O(1) in S.

        ``lengths`` (B,) int serves a RAGGED batch (rows right-padded to
        S): pad steps are identities in the scan, per-row conv windows
        gather each row's own tail, and the logits come from each row's
        position ``lengths[b]-1``."""
        b, s = tokens.shape
        x = params["tok_emb"][tokens]
        states = []
        for blk, nm, bp, np_ in zip(self.blocks, self.norms,
                                    params["blocks"], params["norms"]):
            y, st = blk.apply_with_state(bp, nm.apply(np_, x),
                                         lengths=lengths)
            x = x + y
            states.append(st)
        if lengths is None:
            x = self.ln_f.apply(params["ln_f"], x[:, -1:])[:, 0]
        else:
            sel = (md.arange(s).reshape((1, s))
                   == (lengths.reshape((b, 1)) - 1)).astype(x.dtype)
            x = self.ln_f.apply(params["ln_f"],
                                md.einsum("bs,bsd->bd", sel, x))
        if self.tie_embeddings:
            logits = md.matmul_nt(x, params["tok_emb"])
        else:
            logits = self.head.apply(params["head"], x)
        return logits, states

    def generate(self, params, prompt, new_tokens: int):
        """Greedy decode: prompt (B, S) int -> (B, S + new_tokens).

        The prompt is consumed token-by-token through the same recurrent
        ``step`` the decode uses (a parallel-scan prefill that hands the
        final h/conv state to the step path is a natural optimization, but
        one code path keeps prefill and decode provably consistent)."""
        with md.no_grad():
            b, s = prompt.shape
            state = self.init_state(b)
            logits = None
            for t in range(s):
                logits, state = self.step(params, state, prompt[:, t])
            out = [prompt]
            tok = None
            for _ in range(new_tokens):
                tok = md.argmax(logits, axis=-1)
                out.append(tok.reshape((b, 1)))
                logits, state = self.step(params, state, tok)
            return md.concatenate(out, axis=1)


# ---------------------------------------------------------------------------
# compiled serving: prefill + decode loop as ONE XLA program
# ---------------------------------------------------------------------------

from collections import OrderedDict

_SSM_DECODE_CACHE: "OrderedDict" = OrderedDict()
_SSM_DECODE_CACHE_MAX = 32


def _is_tensor(x):
    return isinstance(x, md.Tensor)


def ssm_decode_program(model: "MambaLM", params, prompt: "md.Tensor",
                       max_new_tokens: int, greedy: bool = True,
                       temperature: float = 1.0, top_k=None):
    """The jitted ``(raw_params, prompt_raw, seed_uint32) -> (B, new)``
    program behind ``generate_compiled_ssm``, cached per (model, shapes,
    sampling config); exposed for AOT export (utils/export.py)."""
    import jax
    import jax.numpy as jnp

    b, s0 = prompt.shape
    assert s0 >= 1 and max_new_tokens >= 1
    prompt_raw = prompt._data

    key = (id(model), b, s0, max_new_tokens, greedy, float(temperature),
           top_k, str(prompt_raw.dtype))
    cached = _SSM_DECODE_CACHE.get(key)
    if cached is not None:
        _SSM_DECODE_CACHE.move_to_end(key)
        return cached

    def select(logits, i, seed_arr):
        with md.no_grad():
            if greedy:
                nxt = md.argmax(logits, axis=-1)
            else:
                scaled = logits / max(float(temperature), 1e-6)
                if top_k is not None and top_k < logits.shape[-1]:
                    vals, _ = md.topk(scaled, top_k, axis=-1)
                    scaled = md.where(scaled >= vals[:, -1:], scaled,
                                      md.full_like(scaled, -1e30))
                step_key = jax.random.fold_in(jax.random.PRNGKey(seed_arr), i)
                u = jax.random.uniform(step_key, scaled.shape, jnp.float32,
                                       1e-9, 1.0)
                gumbel = md.Tensor(-jnp.log(-jnp.log(u))).astype(scaled.dtype)
                nxt = md.argmax(scaled + gumbel, axis=-1)
            return nxt._data.astype(prompt_raw.dtype)

    def raw(tree):
        return jax.tree.map(lambda t: t._data, tree, is_leaf=_is_tensor)

    @jax.jit
    def decode(raw_p, prompt_r, seed_arr):
        with md.no_grad():
            p = jax.tree.map(md.Tensor, raw_p)
            logits0, states = model.prefill(p, md.Tensor(prompt_r))
            states0 = raw(states)
            nxt0 = select(logits0, s0 - 1, seed_arr)

        def body(carry, j):
            states_r, prev = carry
            with md.no_grad():
                pp = jax.tree.map(md.Tensor, raw_p)
                st = jax.tree.map(md.Tensor, states_r)
                logits, st2 = model.step(pp, st, md.Tensor(prev))
            nxt = select(logits, s0 + j, seed_arr)
            return (raw(st2), nxt), nxt

        if max_new_tokens > 1:
            _, nexts = jax.lax.scan(body, (states0, nxt0),
                                    jnp.arange(max_new_tokens - 1))
            gen = jnp.concatenate([nxt0[None], nexts], axis=0)
        else:
            gen = nxt0[None]
        return jnp.swapaxes(gen, 0, 1)

    _SSM_DECODE_CACHE[key] = decode
    while len(_SSM_DECODE_CACHE) > _SSM_DECODE_CACHE_MAX:
        _SSM_DECODE_CACHE.popitem(last=False)
    return decode


def generate_compiled_ssm(model: "MambaLM", params, prompt: "md.Tensor",
                          max_new_tokens: int, greedy: bool = True,
                          temperature: float = 1.0, top_k=None,
                          seed: int = 0) -> "md.Tensor":
    """Mamba decoding as one compiled program: parallel-scan prefill hands
    its O(1) state to a ``lax.scan`` token loop — generating N tokens is
    ONE device dispatch, and unlike the transformer path there is no KV
    cache: the per-step HBM traffic is the weights plus a constant-size
    (b, d_inner, n) state, independent of context length.

    Greedy mode is token-for-token identical to ``model.generate``.  With
    ``greedy=False`` each step draws a Gumbel-max sample at ``temperature``
    (optionally top-k truncated) from a per-step key folded out of ``seed``
    — a runtime argument, so a serving loop varying seeds reuses one
    compiled program.  Falls back to the eager ``model.generate`` on
    non-xla backends.
    """
    import minidiff_tpu.backend as backend

    if backend.backend_name() != "xla":
        assert greedy, "sampling decode requires the xla backend"
        return model.generate(params, prompt, max_new_tokens)

    import jax
    import jax.numpy as jnp

    program = ssm_decode_program(model, params, prompt, max_new_tokens,
                                 greedy=greedy, temperature=temperature,
                                 top_k=top_k)
    raw_params = jax.tree.map(lambda t: t._data, params, is_leaf=_is_tensor)
    seed_raw = jnp.asarray(int(seed) & 0xFFFFFFFF, jnp.uint32)
    gen = program(raw_params, prompt._data, seed_raw)
    return md.concatenate(
        [prompt, md.Tensor(gen).astype(prompt.dtype)], axis=-1)
