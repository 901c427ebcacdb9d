"""Ring attention: sequence-parallel attention over the ``sp`` mesh axis.

The reference has no attention at all, let alone long-context scaling
(SURVEY.md §5.7); this is the TPU-native long-context layer.  Each device
holds a contiguous sequence chunk of Q/K/V; K/V blocks rotate around the
ring of devices via the differentiable ``md.ppermute`` while each device
accumulates its queries' attention with the **online softmax** (the flash
recurrence: running max m, denominator l, numerator o).  After sp steps
every query has seen every key, but no device ever materializes more than
one (s_local x s_local) score block — attention memory stays O(S^2/sp^2)
per device, which is what unlocks sequence lengths a single chip cannot
hold.

Everything is framework ops, so the tape backward differentiates the ring
automatically: cotangents retrace the rotation through ppermute's
inverse-permutation VJP.  No custom backward, no jax.grad — and the
gradcheck/parity tests hold to f64 tolerances.

Causality across chunks is data-dependent (devices differ), so it is
handled with masks, not control flow: a K/V block strictly in the future is
fully suppressed, the diagonal block gets the intra-chunk triangular mask,
past blocks attend fully.  The fully-masked steps still run (SPMD programs
cannot skip per-device) — the classic ring-attention load imbalance, ~2x
FLOPs vs optimal for causal.  ``ring_attention_zigzag`` below removes that
waste with the balanced zig-zag chunk layout.
"""

from __future__ import annotations

import math
from typing import TYPE_CHECKING

import jax
import jax.numpy as jnp

import minidiff_tpu as md

if TYPE_CHECKING:
    from typing import Optional

_NEG = -1e30


def _acc_dtype(dt):
    """Accumulation dtype for the online softmax: at least f32.

    md.sdpa computes scores/softmax in >=f32 internally; running the ring's
    (m, l, o) recurrence in bf16 would drift well past the documented parity,
    so sub-f32 inputs accumulate in f32 (and cast back at the end) while
    f32/f64 inputs keep their own precision (bit-parity with md.sdpa).
    """
    import numpy as _np

    try:
        if _np.dtype(dt).itemsize < 4:
            return md.float32
    except TypeError:
        pass
    return dt


def _band_allowed(qpos, kpos, window, sinks):
    """Sliding-window + sinks allow-mask from GLOBAL positions (jnp bool).

    Key j is visible to query i iff j <= i AND (i - j < window OR
    j < sinks) — exactly ``md.sdpa(window=, sinks=)``'s mask
    (kernels/attention.py _causal_mask), evaluated blockwise from each
    chunk's traced global offsets so every ring step computes its own band
    slice.
    """
    ok = kpos <= qpos
    live = (qpos - kpos) < window
    if sinks:
        live = live | (kpos < sinks)
    return ok & live


def ring_attention(
    q: "md.Tensor",
    k: "md.Tensor",
    v: "md.Tensor",
    sp: int,
    axis_name: str = "sp",
    causal: bool = True,
    scale: "Optional[float]" = None,
    expand_kv=None,
    window: "Optional[int]" = None,
    sinks: int = 0,
) -> "md.Tensor":
    """Attention over ring-rotated K/V chunks; call inside shard_map.

    q/k/v are the LOCAL chunks (b, h, s_local, hd) of a sequence sharded
    over ``axis_name`` (chunk c holds global positions [c*s_local,
    (c+1)*s_local)).  Returns the local output chunk.  Matches
    ``md.sdpa(q_full, k_full, v_full, causal=causal)`` restricted to the
    local rows.

    ``expand_kv`` (e.g. MultiHeadAttention.expand_kv for GQA) broadcasts
    kv-head K/V to query heads AT USE — the ring rotates the narrow
    (b, kv, s, hd) buffers, so GQA's bandwidth/memory savings survive the
    ppermutes.

    ``window``/``sinks`` (requires causal): banded causal attention —
    parity with ``md.sdpa(causal=True, window=, sinks=)``.  The mask is
    positional, so the same rotation schedule runs; band-dead blocks are
    gated to zero (SPMD programs cannot skip per-device work whose
    liveness depends on the device index).
    """
    if expand_kv is None:
        expand_kv = lambda t: t  # noqa: E731
    if window is not None and not causal:
        raise ValueError("sliding-window ring attention requires causal=True")
    b, h, s, hd = q.shape
    if scale is None:
        scale = 1.0 / math.sqrt(hd)

    my = jax.lax.axis_index(axis_name)  # this device's chunk index (traced)
    rows = jnp.arange(s)[:, None]  # intra-chunk positions
    cols = jnp.arange(s)[None, :]
    tri = md.Tensor(rows >= cols)  # (s, s) lower-triangular allow-mask

    acc = _acc_dtype(q.dtype)
    m = md.full((b, h, s, 1), _NEG).astype(acc)
    l = md.zeros((b, h, s, 1)).astype(acc)
    o = md.zeros((b, h, s, hd)).astype(acc)

    shift = [(i, (i + 1) % sp) for i in range(sp)]
    kk, vv = k, v
    for r in range(sp):
        # kk/vv currently hold chunk (my - r) mod sp
        src = jnp.mod(my - r + sp, sp)
        # QK on the MXU in model dtype; softmax recurrence in acc dtype
        scores = (md.matmul_nt(q, expand_kv(kk)) * scale).astype(acc)
        if causal and window is not None:
            allowed = md.Tensor(
                _band_allowed(my * s + rows, src * s + cols, window, sinks))
            scores = md.where(allowed, scores, md.full_like(scores, _NEG))
            gate = allowed.astype(acc)
        elif causal:
            past = md.Tensor(my > src)  # whole block in the past: allow all
            diag = md.Tensor(my == src)  # same chunk: intra-chunk triangle
            allowed = md.logical_or(past, md.logical_and(diag, tri))
            scores = md.where(allowed, scores, md.full_like(scores, _NEG))
            gate = allowed.astype(acc)
        else:
            gate = None

        blockmax = md.max(scores, axis=-1, keepdims=True)
        m_new = md.maximum(m, blockmax)
        p = md.exp(scores - m_new)
        if gate is not None:
            # masked lanes: exp(NEG - m_new) can be exp(0)=1 while everything
            # is still masked (m_new == NEG) — the explicit gate zeroes them
            p = p * gate
        alpha = md.exp(m - m_new)
        l = l * alpha + md.sum(p, axis=-1, keepdims=True)
        # PV back on the MXU in model dtype (flash-kernel style: probs are
        # rounded once), accumulated in acc dtype
        o = o * alpha + md.matmul(p.astype(q.dtype), expand_kv(vv)).astype(acc)
        m = m_new
        if r < sp - 1:
            kk = md.ppermute(kk, axis_name=axis_name, perm=shift)
            vv = md.ppermute(vv, axis_name=axis_name, perm=shift)

    return (o / l).astype(q.dtype)


# ---------------------------------------------------------------------------
# Zig-zag ring attention: the balanced causal layout.
#
# Contiguous chunks make causal rings lopsided: device 0's queries attend
# almost nothing while device sp-1 attends everything, and since SPMD
# programs cannot skip per-device, EVERY device pays the worst case — the
# plain ring above computes all sp (s x s) score blocks and masks half of
# them away (~2x wasted FLOPs).
#
# The zig-zag layout gives device d the two half-chunks (d, 2sp-1-d) of the
# 2sp-way-split sequence.  Then the liveness pattern is uniform in a way a
# static program CAN exploit:
#   * r = 0 (local): q0 x k0 triangular, q1 x k0 full, q1 x k1 triangular
#   * r > 0: exactly TWO of the four half-pairs are live, and both are
#     FULLY unmasked: (q1 x k0) always, plus (q0 x k0) when d >= r else
#     (q1 x k1).  The data-dependent half is a scalar where-select of
#     operands — same ops on every device, half the score FLOPs.
# Total: 3 + 2(sp-1) half-blocks vs the plain ring's 4sp — ~2x fewer.
# ---------------------------------------------------------------------------


def zigzag_order(seq_len: int, sp: int):
    """Permutation putting the sequence into zig-zag shard layout.

    Split positions into 2*sp chunks; device d's contiguous shard of the
    PERMUTED sequence holds chunks (d, 2sp-1-d).  Apply to tokens before a
    P(None, 'sp') shard_map split; ``argsort`` of it restores order.
    """
    import numpy as np

    assert seq_len % (2 * sp) == 0, (seq_len, sp)
    s2 = seq_len // (2 * sp)
    order = []
    for d in range(sp):
        order.extend(range(d * s2, (d + 1) * s2))
        g = 2 * sp - 1 - d
        order.extend(range(g * s2, (g + 1) * s2))
    return np.asarray(order)


def ring_attention_zigzag(
    q: "md.Tensor",
    k: "md.Tensor",
    v: "md.Tensor",
    sp: int,
    axis_name: str = "sp",
    scale: "Optional[float]" = None,
    expand_kv=None,
    window: "Optional[int]" = None,
    sinks: int = 0,
) -> "md.Tensor":
    """Causal ring attention over zig-zag-sharded chunks (see module notes).

    q/k/v locals are (b, h, s, hd) where rows [0, s/2) are global chunk
    ``d`` and rows [s/2, s) are chunk ``2sp-1-d``.  Output rows match q's
    layout.  Equals the plain ring / md.sdpa after un-permuting.
    ``expand_kv`` broadcasts GQA kv heads at use (see ring_attention).

    ``window``/``sinks``: banded causal attention.  The zig-zag liveness
    schedule (which half-pairs carry any causal weight) is unchanged — the
    band only REMOVES keys — so the same half-block merges run with a
    positional band gate derived from each half-chunk's global offset.
    """
    if expand_kv is None:
        expand_kv = lambda t: t  # noqa: E731
    b, h, s, hd = q.shape
    assert s % 2 == 0
    s2 = s // 2
    if scale is None:
        scale = 1.0 / math.sqrt(hd)

    my = jax.lax.axis_index(axis_name)
    rows = jnp.arange(s2)[:, None]
    cols = jnp.arange(s2)[None, :]
    tri = md.Tensor(rows >= cols)  # (s2, s2)

    def band(qoff, koff):
        """Band allow-gate for a half-pair from global chunk offsets, or
        None when no window is set (gate=None = fully-live fast path).
        ``kpos <= qpos`` inside _band_allowed already yields the diagonal
        triangle when qoff == koff, so diagonal pairs need no extra mask.
        """
        if window is None:
            return None
        return md.Tensor(_band_allowed(
            qoff * s2 + rows, koff * s2 + cols, window, sinks))

    q0, q1 = q[:, :, :s2], q[:, :, s2:]
    acc = _acc_dtype(q.dtype)

    def fresh_state():
        return (
            md.full((b, h, s2, 1), _NEG).astype(acc),
            md.zeros((b, h, s2, 1)).astype(acc),
            md.zeros((b, h, s2, hd)).astype(acc),
        )

    st0, st1 = fresh_state(), fresh_state()

    def merge(state, scores, vals, gate=None):
        m, l, o = state
        scores = scores.astype(acc)
        if gate is not None:
            scores = md.where(gate, scores, md.full_like(scores, _NEG))
        bm = md.max(scores, axis=-1, keepdims=True)
        m_new = md.maximum(m, bm)
        p = md.exp(scores - m_new)
        if gate is not None:
            p = p * gate.astype(acc)
        alpha = md.exp(m - m_new)
        return (m_new, l * alpha + md.sum(p, axis=-1, keepdims=True),
                o * alpha
                + md.matmul(p.astype(q.dtype), expand_kv(vals)).astype(acc))

    gmy = 2 * sp - 1 - my  # global chunk index of the q1/k1 halves
    shift = [(i, (i + 1) % sp) for i in range(sp)]
    kk, vv = k, v
    for r in range(sp):
        k0, k1 = kk[:, :, :s2], kk[:, :, s2:]
        v0, v1 = vv[:, :, :s2], vv[:, :, s2:]
        src = jnp.mod(my - r + sp, sp)  # global chunk index of k0
        gsrc = 2 * sp - 1 - src
        if r == 0:
            st0 = merge(st0, md.matmul_nt(q0, expand_kv(k0)) * scale, v0,
                        gate=band(my, my) if window is not None else tri)
            st1 = merge(st1, md.matmul_nt(q1, expand_kv(k0)) * scale, v0,
                        gate=band(gmy, my))
            st1 = merge(st1, md.matmul_nt(q1, expand_kv(k1)) * scale, v1,
                        gate=band(gmy, gmy) if window is not None else tri)
        else:
            # always causally live: q1 x k0 (chunk 2sp-1-d > any src);
            # with a window the band gate trims it
            st1 = merge(st1, md.matmul_nt(q1, expand_kv(k0)) * scale, v0,
                        gate=band(gmy, src))
            # the select pair: (q0 x k0) -> state0 when d >= r, else
            # (q1 x k1) -> state1; both fully causally unmasked
            cond = md.Tensor(my >= r)
            qB = md.where(cond, q0, q1)
            kB = md.where(cond, k0, k1)
            vB = md.where(cond, v0, v1)
            mT = (md.where(cond, st0[0], st1[0]),
                  md.where(cond, st0[1], st1[1]),
                  md.where(cond, st0[2], st1[2]))
            gateB = band(jnp.where(my >= r, my, gmy),
                         jnp.where(my >= r, src, gsrc))
            mTn = merge(mT, md.matmul_nt(qB, expand_kv(kB)) * scale, vB,
                        gate=gateB)
            st0 = tuple(md.where(cond, n, o_) for n, o_ in zip(mTn, st0))
            st1 = tuple(md.where(cond, o_, n) for n, o_ in zip(mTn, st1))
        if r < sp - 1:
            kk = md.ppermute(kk, axis_name=axis_name, perm=shift)
            vv = md.ppermute(vv, axis_name=axis_name, perm=shift)

    out0 = (st0[2] / st0[1]).astype(q.dtype)
    out1 = (st1[2] / st1[1]).astype(q.dtype)
    return md.concat([out0, out1], axis=2)


# ---------------------------------------------------------------------------
# Sequence-parallel transformer training: tokens sharded on sp, attention via
# the ring, everything inside one shard_map (the pipeline.py pattern).
# ---------------------------------------------------------------------------


from minidiff_tpu.parallel._util import _is_tensor, _unwrap, _wrap  # noqa: E402


def _ring_block(blk, params, x, sp: int, axis_name: str, positions=None,
                zigzag: bool = False):
    """TransformerBlock.apply with the attention core swapped for the ring.

    ``positions`` (local GLOBAL positions, for RoPE models) rotates q/k
    before the ring — rotation commutes with the K/V rotation because RoPE
    only depends on each key's own global position.
    """
    from minidiff_tpu.models import functional as F

    b, s, d = x.shape
    attn = blk.attn

    xa = blk.ln1.apply(params["ln1"], x)
    q, k, v = attn.project_qkv(params["attn"], xa)
    if attn.rope:
        assert positions is not None
        q = F.apply_rope(q, positions, attn.rope_base,
                         rot_dim=attn.rope_dim)
        k = F.apply_rope(k, positions, attn.rope_base,
                         rot_dim=attn.rope_dim)
    # K/V stay at kv-head width through the ring (GQA's bandwidth saving
    # must survive the ppermutes); broadcast to query heads only at use
    if zigzag:
        assert attn.causal, "zig-zag layout only helps causal attention"
        o = ring_attention_zigzag(q, k, v, sp, axis_name=axis_name,
                                  expand_kv=attn.expand_kv,
                                  window=attn.window, sinks=attn.sinks)
    else:
        o = ring_attention(q, k, v, sp, axis_name=axis_name,
                           causal=attn.causal, expand_kv=attn.expand_kv,
                           window=attn.window, sinks=attn.sinks)
    o = md.transpose(o, axes=(0, 2, 1, 3)).reshape((b, s, d))
    a = attn.out.apply(params["attn"]["out"], o)
    if getattr(blk, "parallel", False):
        # Phi-style parallel residual: both branches read the SAME ln1(x)
        # (matching TransformerBlock.apply / functional.block_finish)
        return x + a + blk.apply_mlp(params, xa)
    x = x + a
    return x + blk.apply_mlp(params, x)


def make_ring_train_step(model, mesh, optimizer=None, init_params=None,
                         axis_name: str = "sp", zigzag: bool = False):
    """Sequence-parallel TransformerLM training over ``mesh``'s sp axis.

    Returns (step, params, opt_state); ``step(params, opt_state, x, y)``
    takes FULL-batch (B, S) token Tensors (sequence split across devices
    inside), returns the same replicated params tree.  Parity: identical to
    the single-device make_train_step(model, loss_fn=lm_loss) step.
    ``zigzag=True`` uses the balanced causal layout (~2x fewer attention
    FLOPs; tokens are permuted/unpermuted transparently inside the step).
    """
    from jax.sharding import PartitionSpec as P

    from minidiff_tpu.models import functional as F
    from minidiff_tpu.models.optim import SGD
    from minidiff_tpu.parallel.pipeline import _state_specs

    sp = mesh.shape[axis_name]
    optimizer = optimizer or SGD(0.1)
    params0 = init_params or model.init()
    opt_state = optimizer.init(params0)

    raw_params = _unwrap(params0)
    param_specs = jax.tree.map(lambda _: P(), raw_params)
    raw_state = _unwrap(opt_state) if opt_state is not None else None
    state_specs = _state_specs(raw_state, raw_params, param_specs)

    def body(raw_p, raw_s, raw_x, raw_y):
        params = _wrap(raw_p, allow_grad=True)
        state = _wrap(raw_s) if raw_s is not None else None
        my = jax.lax.axis_index(axis_name)
        b, s_loc = raw_x.shape

        def objective(p):
            x = md.Tensor(raw_x)
            y = md.Tensor(raw_y)
            if zigzag:
                # local rows are the device's zig-zag chunks of the (host-
                # permuted) sequence; global positions come from the order
                order_c = jnp.asarray(zigzag_order(sp * s_loc, sp))
                offs = order_c[my * s_loc + jnp.arange(s_loc)]
            else:
                offs = my * s_loc + jnp.arange(s_loc)  # global positions
            pos_local = md.Tensor(offs)
            hh = p["tok_emb"][x]
            if not getattr(model, "rope", False):
                hh = hh + p["pos_emb"][pos_local]
            for blk, bp in zip(model.blocks, p["blocks"]):
                hh = _ring_block(blk, bp, hh, sp, axis_name,
                                 positions=pos_local, zigzag=zigzag)
            hh = model.ln_f.apply(p["ln_f"], hh)
            logits = model.lm_head(p, hh)  # (b, s_loc, V)
            vdim = logits.shape[-1]
            local = F.cross_entropy(
                logits.reshape((b * s_loc, vdim)), y.reshape((b * s_loc,))
            )
            # chunks are equal-sized, so the global token mean is the mean
            # of the per-device means
            return md.psum(local, axis_name=axis_name) / sp

        loss, grads = md.value_and_grad(objective)(params)
        with md.no_grad():
            # every parameter is replicated; sum the per-chunk contributions
            grads = jax.tree.map(
                lambda g: md.psum(g, axis_name=axis_name), grads,
                is_leaf=_is_tensor,
            )
        new_params, new_state = optimizer.update(params, grads, state)
        new_raw_s = _unwrap(new_state) if new_state is not None else None
        return _unwrap(new_params), new_raw_s, loss._data

    jitted = jax.jit(
        jax.shard_map(
            body,
            mesh=mesh,
            in_specs=(param_specs, state_specs, P(None, axis_name),
                      P(None, axis_name)),
            out_specs=(param_specs, state_specs, P()),
            check_vma=False,
        )
    )

    def step(params, state, x, y):
        raw_x, raw_y = x._data, y._data
        if zigzag:
            order = zigzag_order(int(raw_x.shape[1]), sp)
            raw_x = raw_x[:, order]
            raw_y = raw_y[:, order]
        raw_p, new_raw_s, raw_loss = jitted(
            _unwrap(params),
            _unwrap(state) if state is not None else None,
            raw_x,
            raw_y,
        )
        return (
            _wrap(raw_p, allow_grad=True),
            _wrap(new_raw_s) if new_raw_s is not None else None,
            md.Tensor(raw_loss),
        )

    return step, params0, opt_state
