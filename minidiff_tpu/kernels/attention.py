"""Flash attention for TPU: online-softmax Pallas kernels, fwd + bwd.

The reference has no attention op at all (SURVEY.md §5.7) — this is a
TPU-native extension powering the transformer model family.  The kernel never
materializes the (S, S) score matrix in HBM:

* forward: one pass over K/V blocks per Q block, carrying the running row max
  ``m`` and normalizer ``l`` in VMEM scratch (online softmax), emitting the
  output block and the logsumexp residual.
* backward: the standard two-kernel flash split — a dK/dV kernel that loops Q
  blocks innermost, and a dQ kernel that loops K blocks innermost — each
  recomputing P = exp(S - lse) blockwise from the saved logsumexp instead of
  reading a stored S.

Dispatch (``sdpa``): Pallas on TPU for 4-D (B, H, S, D) with S a multiple of
the block size and D a multiple of 128; composed jnp softmax-attention
everywhere else.  ``jax.custom_vjp`` makes the fused path differentiable under
plain jax AD; the tape's own VJPs (ops/definitions.py sdpa grads) are written
in framework ops and re-enter this dispatcher for their matmuls.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from minidiff_tpu.kernels.matmul import _pallas_enabled

_LANES = 128
_BQ = 256
_BK = 256
# Preferred (bq, bk) per pass, best-first (measured on v5e, S=2048 D=128
# bf16 causal): the fwd online-softmax pass likes a small q tile with a wide
# k tile; the two bwd passes like square 512 tiles.  First pair that divides
# (S_q, S_k) wins; shapes that fit none fall back to the composed path.
_FWD_BLOCKS = ((1024, 1024), (512, 512), (1024, 512), (512, 1024),
               (256, 512), (256, 256), (128, 256), (128, 128))
_BWD_BLOCKS = ((512, 512), (1024, 512), (512, 1024), (256, 512),
               (256, 256), (128, 128))
# AUTOTUNE=0 static picks: conservative r3 tables.  The large candidates
# above are validated by the race's compile-or-lose-loudly path; the
# static path has no such fallback, so it must not lead with tiles whose
# VMEM footprint can overflow at untested (dtype, head-dim) combinations.
_STATIC_FWD = ((256, 512), (256, 256), (128, 256), (128, 128))
_STATIC_BWD = ((512, 512), (256, 512), (256, 256), (128, 128))
_NEG_INF = -1e30


def _pick_blocks(table, s, sk):
    for bq, bk in table:
        if s % bq == 0 and sk % bk == 0:
            return bq, bk
    return None


def _round128(x: int) -> int:
    return -(-x // 128) * 128


def _pad_flash_inputs(qf, kf, vf, kvm, b):
    """Zero-pad (B*H, S, D) flash operands so both sequence lengths are
    multiples of 128 (every block table divides those), extending/creating
    the (B, Sk) key mask so padded keys never receive attention.  Padded
    QUERY rows compute garbage the callers slice off; their backward
    contribution is exactly zero because the padded dO rows are zero.
    Returns (qf, kf, vf, kvm) — kvm padded to (B, Sk_pad) or None when no
    key padding and no user mask."""
    bh, s, d = qf.shape
    sk = kf.shape[1]
    sp, skp = _round128(s), _round128(sk)
    if sp != s:
        qf = jnp.pad(qf, ((0, 0), (0, sp - s), (0, 0)))
    if skp != sk:
        kf = jnp.pad(kf, ((0, 0), (0, skp - sk), (0, 0)))
        vf = jnp.pad(vf, ((0, 0), (0, skp - sk), (0, 0)))
        if kvm is None:
            kvm = jnp.broadcast_to(
                (jnp.arange(skp) < sk).astype(jnp.int32)[None, :], (b, skp)
            )
        else:
            kvm = jnp.concatenate(
                [kvm, jnp.zeros((b, skp - sk), jnp.int32)], axis=1
            )
    return qf, kf, vf, kvm


def _causal_mask(s, qi, ki, bq, bk, window=None, sinks=0):
    """Mask s (bq, bk) so query row r attends only to key cols <= global r.

    With ``window`` (sliding-window attention), col must also sit inside the
    last ``window`` positions (r - c < window) — except the first ``sinks``
    columns, which stay visible to every row (StreamingLLM attention sinks).
    """
    rows = qi * bq + jax.lax.broadcasted_iota(jnp.int32, s.shape, 0)
    cols = ki * bk + jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
    keep = rows >= cols
    if window is not None:
        live = rows - cols < window
        if sinks:
            live = live | (cols < sinks)
        keep = keep & live
    return jnp.where(keep, s, _NEG_INF)


def _masked_scores(s, qi, ki, bq, bk, window, sinks):
    """Apply the causal/window mask only on blocks it can actually bite.

    A live block strictly below the diagonal and entirely inside the
    window band is FULLY visible — running the iota/compare/select chain
    there burns VPU cycles for a no-op (the profile doc prices the mask
    at ~2 of the ~10 VPU ops per score element).  The edge predicate is a
    scalar, so Mosaic's scalar core steers around the mask branch for
    interior blocks.  Sinks only ADD visibility, so a block that is fully
    visible without sink help needs no mask either.
    """
    fully_visible = qi * bq >= ki * bk + bk - 1
    if window is not None:
        fully_visible = fully_visible & (
            (qi * bq + bq - 1) - ki * bk < window)
    return jax.lax.cond(
        fully_visible,
        lambda t: t,
        lambda t: _causal_mask(t, qi, ki, bq, bk, window=window,
                               sinks=sinks),
        s)


def _block_live(qi, ki, bq, bk, window, sinks):
    """Whether the (qi, ki) block holds ANY visible (row, col) pair under
    causal + window + sink masking — dead blocks skip their MXU work, which
    is where sliding-window attention's FLOP savings come from."""
    causal_live = ki * bk <= qi * bq + bq - 1
    if window is None:
        return causal_live
    band = ki * bk + bk - 1 >= qi * bq - (window - 1)
    if sinks:
        band = band | (ki * bk < sinks)
    return causal_live & band


def _apply_kv_mask(s, mask_ref):
    """Mask s (bq, bk) by the (1, 1, bk) key-padding row (nonzero = attend).

    The mask rides as a (B, 1, Sk) operand — NOT (B, Sk) — because the TPU
    lowering requires a block's last two dims to divide (8, 128) or equal
    the array's; a (1, bk) block over (B, Sk) violates that, while
    (1, 1, bk) over (B, 1, Sk) matches the unit dim exactly."""
    return jnp.where(mask_ref[0] != 0, s, _NEG_INF)


def _apply_seg_mask(s, qseg_ref, kseg_ref):
    """Sequence-packing mask: query row attends key col only within the
    same document.  Segment ids ride as (B, 1, S) i32 operands with
    (1, 1, bq)/(1, 1, bk) blocks — the same lowerable layout as the
    key-padding row (see ``_apply_kv_mask``); the (bq, 1) == (1, bk)
    broadcast compare happens in VMEM per tile."""
    qs = qseg_ref[0][0][:, None]   # (bq, 1)
    ks = kseg_ref[0][0][None, :]   # (1, bk)
    return jnp.where(qs == ks, s, _NEG_INF)


# ---------------------------------------------------------------------------
# forward
# ---------------------------------------------------------------------------


def _fwd_kernel(q_ref, k_ref, v_ref, *refs,
                scale, causal, bq, bk, has_mask=False, has_seg=False,
                window=None, sinks=0):
    refs = list(refs)
    mask_ref = refs.pop(0) if has_mask else None
    qseg_ref = refs.pop(0) if has_seg else None
    kseg_ref = refs.pop(0) if has_seg else None
    o_ref, lse_ref, m_scr, l_scr, acc_scr = refs
    qi = pl.program_id(1)
    ki = pl.program_id(2)

    @pl.when(ki == 0)
    def _init():
        m_scr[:] = jnp.full_like(m_scr, _NEG_INF)
        l_scr[:] = jnp.zeros_like(l_scr)
        acc_scr[:] = jnp.zeros_like(acc_scr)

    def _step():
        q = q_ref[0]  # (bq, d)
        k = k_ref[0]  # (bk, d)
        s = jax.lax.dot_general(
            q, k, dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) * jnp.float32(scale)  # (bq, bk)
        if causal:
            s = _masked_scores(s, qi, ki, bq, bk, window, sinks)
        if mask_ref is not None:
            s = _apply_kv_mask(s, mask_ref)
        if qseg_ref is not None:
            s = _apply_seg_mask(s, qseg_ref, kseg_ref)

        m_prev = m_scr[:]  # (bq, LANES), all lanes equal
        m_cur = jnp.max(s, axis=-1, keepdims=True)  # (bq, 1)
        m_new = jnp.maximum(m_prev, jax.lax.broadcast_in_dim(
            m_cur, m_prev.shape, (0, 1)))
        alpha = jnp.exp(m_prev - m_new)  # (bq, LANES)

        p = jnp.exp(s - m_new[:, :1])  # (bq, bk)
        l_cur = jnp.sum(p, axis=-1, keepdims=True)  # (bq, 1)
        l_scr[:] = alpha * l_scr[:] + jax.lax.broadcast_in_dim(
            l_cur, l_scr.shape, (0, 1))
        m_scr[:] = m_new

        pv = jax.lax.dot_general(
            p.astype(v_ref.dtype), v_ref[0],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (bq, d)
        acc_scr[:] = acc_scr[:] * alpha[:, :1] + pv

    if causal:
        # blocks strictly above the diagonal — and, under sliding-window
        # masking, blocks entirely below the (window | sink) band —
        # contribute nothing; skipping them is the window's FLOP savings
        @pl.when(_block_live(qi, ki, bq, bk, window, sinks))
        def _():
            _step()
    else:
        _step()

    @pl.when(ki == pl.num_programs(2) - 1)
    def _flush():
        # l is >= 1 wherever any key is visible (softmax includes the
        # diagonal under causal masking, and the diagonal is always inside
        # the sliding window), so the divide is safe.
        o_ref[0] = (acc_scr[:] / l_scr[:, :1]).astype(o_ref.dtype)
        lse_ref[0] = (m_scr[:, 0] + jnp.log(l_scr[:, 0]))[None, :]


@functools.partial(
    jax.jit,
    static_argnames=("scale", "causal", "bq", "bk", "h", "window", "sinks"))
def _flash_fwd(q, k, v, scale, causal, bq=_BQ, bk=_BK, mask=None, h=1,
               window=None, sinks=0, seg=None):
    """``mask``: optional (B, Sk) int32 key-padding rows (nonzero = attend),
    shared across the ``h`` heads folded into q's leading B*H axis.
    ``seg``: optional (B, S) int32 segment ids (sequence packing) — queries
    attend keys only within the same id; requires S_q == S_k."""
    bh, s, d = q.shape
    sk = k.shape[1]
    grid = (bh, s // bq, sk // bk)
    kernel = functools.partial(
        _fwd_kernel, scale=scale, causal=causal, bq=bq, bk=bk,
        has_mask=mask is not None, has_seg=seg is not None,
        window=window, sinks=sinks)
    in_specs = [
        pl.BlockSpec((1, bq, d), lambda b, i, j: (b, i, 0)),
        pl.BlockSpec((1, bk, d), lambda b, i, j: (b, j, 0)),
        pl.BlockSpec((1, bk, d), lambda b, i, j: (b, j, 0)),
    ]
    operands = [q, k, v]
    if mask is not None:
        in_specs.append(
            pl.BlockSpec((1, 1, bk), lambda b, i, j: (b // h, 0, j)))
        operands.append(mask[:, None, :])
    if seg is not None:
        seg3 = seg[:, None, :]
        in_specs.append(
            pl.BlockSpec((1, 1, bq), lambda b, i, j: (b // h, 0, i)))
        operands.append(seg3)
        in_specs.append(
            pl.BlockSpec((1, 1, bk), lambda b, i, j: (b // h, 0, j)))
        operands.append(seg3)
    o, lse = pl.pallas_call(
        kernel,
        out_shape=(
            jax.ShapeDtypeStruct((bh, s, d), q.dtype),
            jax.ShapeDtypeStruct((bh, 1, s), jnp.float32),
        ),
        grid=grid,
        in_specs=in_specs,
        out_specs=(
            pl.BlockSpec((1, bq, d), lambda b, i, j: (b, i, 0)),
            pl.BlockSpec((1, 1, bq), lambda b, i, j: (b, 0, i)),
        ),
        scratch_shapes=[
            pltpu.VMEM((bq, _LANES), jnp.float32),
            pltpu.VMEM((bq, _LANES), jnp.float32),
            pltpu.VMEM((bq, d), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=4 * bh * s * sk * d // (2 if causal else 1),
            bytes_accessed=(q.size + k.size + v.size + q.size)
            * q.dtype.itemsize,
            transcendentals=bh * s * sk,
        ),
    )(*operands)
    return o, lse[:, 0, :]


# ---------------------------------------------------------------------------
# backward: dK/dV kernel (Q innermost), then dQ kernel (K innermost)
# ---------------------------------------------------------------------------


def _recompute_p_ds(q, k, v, do, lse, delta, scale, causal, qi, ki, bq, bk,
                    mask_ref=None, window=None, sinks=0,
                    qseg_ref=None, kseg_ref=None):
    """Shared blockwise recompute: P from lse, then dS.

    The recompute dots take the operands at their STORED dtype with f32
    accumulation — the same contract as the forward kernel (so P here is
    bit-consistent with the saved lse).  Casting operands to f32 first
    would halve the MXU rate for bf16 models for no accuracy gain.
    Elementwise math stays f32.
    """
    s = jax.lax.dot_general(
        q, k, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) * jnp.float32(scale)  # (bq, bk)
    if causal:
        s = _masked_scores(s, qi, ki, bq, bk, window, sinks)
    if mask_ref is not None:
        s = _apply_kv_mask(s, mask_ref)
    if qseg_ref is not None:
        s = _apply_seg_mask(s, qseg_ref, kseg_ref)
    p = jnp.exp(s - lse[:, :1])  # (bq, bk) f32; masked entries exp(-inf)→0
    dp = jax.lax.dot_general(
        do, v, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # (bq, bk)
    ds = p * (dp - delta[:, :1]) * jnp.float32(scale)
    return p, ds


def _bwd_dkv_kernel(q_ref, k_ref, v_ref, do_ref, lse_ref, delta_ref, *refs,
                    scale, causal, bq, bk, has_mask=False, has_seg=False,
                    window=None, sinks=0):
    refs = list(refs)
    mask_ref = refs.pop(0) if has_mask else None
    qseg_ref = refs.pop(0) if has_seg else None
    kseg_ref = refs.pop(0) if has_seg else None
    dk_ref, dv_ref, dk_scr, dv_scr = refs
    ki = pl.program_id(1)
    qi = pl.program_id(2)

    @pl.when(qi == 0)
    def _init():
        dk_scr[:] = jnp.zeros_like(dk_scr)
        dv_scr[:] = jnp.zeros_like(dv_scr)

    def _step():
        q = q_ref[0]
        k = k_ref[0]
        v = v_ref[0]
        do = do_ref[0]
        lse = lse_ref[0][0][:, None]  # (bq, 1)
        delta = delta_ref[0][0][:, None]
        p, ds = _recompute_p_ds(
            q, k, v, do, lse, delta, scale, causal, qi, ki, bq, bk,
            mask_ref=mask_ref, window=window, sinks=sinks,
            qseg_ref=qseg_ref, kseg_ref=kseg_ref)
        # dv += P^T @ dO ; dk += dS^T @ Q  (contract over the q-block rows);
        # p/ds drop to the operand dtype for the MXU, f32 accumulation
        dv_scr[:] += jax.lax.dot_general(
            p.astype(do.dtype), do,
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        dk_scr[:] += jax.lax.dot_general(
            ds.astype(q.dtype), q,
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)

    if causal:
        @pl.when(_block_live(qi, ki, bq, bk, window, sinks))
        def _():
            _step()
    else:
        _step()

    @pl.when(qi == pl.num_programs(2) - 1)
    def _flush():
        dk_ref[0] = dk_scr[:].astype(dk_ref.dtype)
        dv_ref[0] = dv_scr[:].astype(dv_ref.dtype)


def _bwd_dq_kernel(q_ref, k_ref, v_ref, do_ref, lse_ref, delta_ref, *refs,
                   scale, causal, bq, bk, has_mask=False, has_seg=False,
                   window=None, sinks=0):
    refs = list(refs)
    mask_ref = refs.pop(0) if has_mask else None
    qseg_ref = refs.pop(0) if has_seg else None
    kseg_ref = refs.pop(0) if has_seg else None
    dq_ref, dq_scr = refs
    qi = pl.program_id(1)
    ki = pl.program_id(2)

    @pl.when(ki == 0)
    def _init():
        dq_scr[:] = jnp.zeros_like(dq_scr)

    def _step():
        q = q_ref[0]
        k = k_ref[0]
        v = v_ref[0]
        do = do_ref[0]
        lse = lse_ref[0][0][:, None]
        delta = delta_ref[0][0][:, None]
        _, ds = _recompute_p_ds(
            q, k, v, do, lse, delta, scale, causal, qi, ki, bq, bk,
            mask_ref=mask_ref, window=window, sinks=sinks,
            qseg_ref=qseg_ref, kseg_ref=kseg_ref)
        dq_scr[:] += jnp.dot(ds.astype(k.dtype), k,
                             preferred_element_type=jnp.float32)

    if causal:
        @pl.when(_block_live(qi, ki, bq, bk, window, sinks))
        def _():
            _step()
    else:
        _step()

    @pl.when(ki == pl.num_programs(2) - 1)
    def _flush():
        dq_ref[0] = dq_scr[:].astype(dq_ref.dtype)


@functools.partial(
    jax.jit,
    static_argnames=("scale", "causal", "bq", "bk", "h", "window", "sinks"))
def _flash_bwd(q, k, v, o, lse, do, scale, causal, bq=_BQ, bk=_BK,
               mask=None, h=1, window=None, sinks=0, seg=None):
    bh, s, d = q.shape
    sk = k.shape[1]
    delta = jnp.sum(do.astype(jnp.float32) * o.astype(jnp.float32), axis=-1)
    seg3 = None if seg is None else seg[:, None, :]

    kernel_kw = dict(scale=scale, causal=causal, bq=bq, bk=bk,
                     has_mask=mask is not None, has_seg=seg is not None,
                     window=window, sinks=sinks)
    dkv_in_specs = [
        pl.BlockSpec((1, bq, d), lambda b, j, i: (b, i, 0)),   # q
        pl.BlockSpec((1, bk, d), lambda b, j, i: (b, j, 0)),   # k
        pl.BlockSpec((1, bk, d), lambda b, j, i: (b, j, 0)),   # v
        pl.BlockSpec((1, bq, d), lambda b, j, i: (b, i, 0)),   # do
        pl.BlockSpec((1, 1, bq), lambda b, j, i: (b, 0, i)),   # lse
        pl.BlockSpec((1, 1, bq), lambda b, j, i: (b, 0, i)),   # delta
    ]
    dkv_operands = [q, k, v, do, lse[:, None, :], delta[:, None, :]]
    if mask is not None:
        dkv_in_specs.append(
            pl.BlockSpec((1, 1, bk), lambda b, j, i: (b // h, 0, j)))
        dkv_operands.append(mask[:, None, :])
    if seg is not None:
        dkv_in_specs.append(
            pl.BlockSpec((1, 1, bq), lambda b, j, i: (b // h, 0, i)))
        dkv_operands.append(seg3)
        dkv_in_specs.append(
            pl.BlockSpec((1, 1, bk), lambda b, j, i: (b // h, 0, j)))
        dkv_operands.append(seg3)
    dk, dv = pl.pallas_call(
        functools.partial(_bwd_dkv_kernel, **kernel_kw),
        out_shape=(
            jax.ShapeDtypeStruct((bh, sk, d), k.dtype),
            jax.ShapeDtypeStruct((bh, sk, d), v.dtype),
        ),
        grid=(bh, sk // bk, s // bq),
        in_specs=dkv_in_specs,
        out_specs=(
            pl.BlockSpec((1, bk, d), lambda b, j, i: (b, j, 0)),
            pl.BlockSpec((1, bk, d), lambda b, j, i: (b, j, 0)),
        ),
        scratch_shapes=[
            pltpu.VMEM((bk, d), jnp.float32),
            pltpu.VMEM((bk, d), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
    )(*dkv_operands)

    dq_in_specs = [
        pl.BlockSpec((1, bq, d), lambda b, i, j: (b, i, 0)),
        pl.BlockSpec((1, bk, d), lambda b, i, j: (b, j, 0)),
        pl.BlockSpec((1, bk, d), lambda b, i, j: (b, j, 0)),
        pl.BlockSpec((1, bq, d), lambda b, i, j: (b, i, 0)),
        pl.BlockSpec((1, 1, bq), lambda b, i, j: (b, 0, i)),
        pl.BlockSpec((1, 1, bq), lambda b, i, j: (b, 0, i)),
    ]
    dq_operands = [q, k, v, do, lse[:, None, :], delta[:, None, :]]
    if mask is not None:
        dq_in_specs.append(
            pl.BlockSpec((1, 1, bk), lambda b, i, j: (b // h, 0, j)))
        dq_operands.append(mask[:, None, :])
    if seg is not None:
        dq_in_specs.append(
            pl.BlockSpec((1, 1, bq), lambda b, i, j: (b // h, 0, i)))
        dq_operands.append(seg3)
        dq_in_specs.append(
            pl.BlockSpec((1, 1, bk), lambda b, i, j: (b // h, 0, j)))
        dq_operands.append(seg3)
    dq = pl.pallas_call(
        functools.partial(_bwd_dq_kernel, **kernel_kw),
        out_shape=jax.ShapeDtypeStruct((bh, s, d), q.dtype),
        grid=(bh, s // bq, sk // bk),
        in_specs=dq_in_specs,
        out_specs=pl.BlockSpec((1, bq, d), lambda b, i, j: (b, i, 0)),
        scratch_shapes=[pltpu.VMEM((bq, d), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
    )(*dq_operands)
    return dq, dk, dv


# ---------------------------------------------------------------------------
# custom-vjp wrapper over collapsed (B*H, S, D) operands
# ---------------------------------------------------------------------------


def _blocks_for(kind: str, q, k, causal: bool, window=None, sinks=0,
                seg=None):
    """Autotuned (bq, bk) for this shape if known, else static table pick."""
    key = _attn_key(q.shape[0], q.shape[1], k.shape[1], q.shape[2],
                    q.dtype, causal, window, sinks, packed=seg is not None)
    dec = _attn_cache.get(key)
    if dec is not None and dec != "composed":
        return dec[0] if kind == "fwd" else dec[1]
    table = _FWD_BLOCKS if kind == "fwd" else _BWD_BLOCKS
    return _pick_blocks(table, q.shape[1], k.shape[1])


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6, 7, 8, 9))
def _flash(q, k, v, mask, seg, scale, causal, h=1, window=None, sinks=0):
    bq, bk = _blocks_for("fwd", q, k, causal, window, sinks, seg=seg)
    o, _ = _flash_fwd(q, k, v, scale, causal, bq=bq, bk=bk, mask=mask, h=h,
                      window=window, sinks=sinks, seg=seg)
    return o


def _flash_vjp_fwd(q, k, v, mask, seg, scale, causal, h, window, sinks):
    bq, bk = _blocks_for("fwd", q, k, causal, window, sinks, seg=seg)
    o, lse = _flash_fwd(q, k, v, scale, causal, bq=bq, bk=bk, mask=mask, h=h,
                        window=window, sinks=sinks, seg=seg)
    return o, (q, k, v, mask, seg, o, lse)


def _flash_vjp_bwd(scale, causal, h, window, sinks, residuals, do):
    q, k, v, mask, seg, o, lse = residuals
    bq, bk = _blocks_for("bwd", q, k, causal, window, sinks, seg=seg)
    dq, dk, dv = _flash_bwd(q, k, v, o, lse, do, scale, causal,
                            bq=bq, bk=bk, mask=mask, h=h,
                            window=window, sinks=sinks, seg=seg)
    return dq, dk, dv, None, None


_flash.defvjp(_flash_vjp_fwd, _flash_vjp_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6, 7, 8, 9))
def _flash_aux(q, k, v, mask, seg, scale, causal, h=1, window=None, sinks=0):
    """Flash forward returning (o, lse) — lse is a non-differentiable aux
    residual the dispatcher stashes for the tape's backward.  Still a
    custom_vjp so jax AD through backend sdpa (e.g. md.scan's jax.vjp over
    a step built from md ops) keeps working; the lse cotangent is ignored."""
    bq, bk = _blocks_for("fwd", q, k, causal, window, sinks, seg=seg)
    return _flash_fwd(q, k, v, scale, causal, bq=bq, bk=bk, mask=mask, h=h,
                      window=window, sinks=sinks, seg=seg)


def _flash_aux_vjp_fwd(q, k, v, mask, seg, scale, causal, h, window, sinks):
    bq, bk = _blocks_for("fwd", q, k, causal, window, sinks, seg=seg)
    o, lse = _flash_fwd(q, k, v, scale, causal, bq=bq, bk=bk, mask=mask, h=h,
                        window=window, sinks=sinks, seg=seg)
    return (o, lse), (q, k, v, mask, seg, o, lse)


def _flash_aux_vjp_bwd(scale, causal, h, window, sinks, residuals, cts):
    q, k, v, mask, seg, o, lse = residuals
    do, _ = cts  # lse is aux: its cotangent is discarded
    bq, bk = _blocks_for("bwd", q, k, causal, window, sinks, seg=seg)
    dq, dk, dv = _flash_bwd(q, k, v, o, lse, do, scale, causal,
                            bq=bq, bk=bk, mask=mask, h=h,
                            window=window, sinks=sinks, seg=seg)
    return dq, dk, dv, None, None


_flash_aux.defvjp(_flash_aux_vjp_fwd, _flash_aux_vjp_bwd)


def _kv_mask_shape_ok(shape, b, sk) -> bool:
    """Shape-only test for :func:`_as_kv_mask` (used by the backward's
    eligibility check, which must not touch the mask's values)."""
    nd = len(shape)
    if nd == 0 or nd > 4 or shape[-1] != sk:
        return False
    if nd <= 2:
        return nd == 1 or shape[0] == 1
    return all(d == 1 for d in shape[1:-1]) and shape[0] in (1, b)


def _seg_shape_ok(shape, b, s, sk) -> bool:
    """Shape-only eligibility for flash segment ids: (S,) or (B|1, S) with
    S_q == S_k (self-attention packing)."""
    if s != sk:
        return False
    nd = len(shape)
    if nd == 1:
        return shape[0] == s
    return nd == 2 and shape[1] == s and shape[0] in (1, b)


def _as_seg(seg, b, s):
    """Normalize segment ids to a (B, S) int32 table."""
    sg = jnp.asarray(seg, jnp.int32)
    if sg.ndim == 1:
        sg = sg[None, :]
    return jnp.broadcast_to(sg, (b, s))


def _pad_seg(seg, sp):
    """Pad a (B, S) segment table to (B, sp) with -1: padded rows/cols can
    never match a real document id (ids are required to be >= 0), so padded
    keys are invisible to real queries with no extra mask; padded queries
    still see their own diagonal (-1 == -1), keeping the softmax
    normalizer >= 1 everywhere."""
    s = seg.shape[1]
    if sp == s:
        return seg
    return jnp.pad(seg, ((0, 0), (0, sp - s)), constant_values=-1)


def _as_kv_mask(mask, b, sk):
    """Normalize ``mask`` to a (B, Sk) int32 key-padding table, or None.

    Key-padding means: after the dispatcher's broadcast against the
    (B, H, Sq, Sk) score shape (3-D masks get the head axis inserted at 1,
    everything else broadcasts right-aligned), the mask value depends only
    on (batch, key).  Shapes qualifying: (Sk,), (1, Sk), (B|1, 1, Sk),
    (B|1, 1, 1, Sk).  A 2-D (X, Sk) with X != 1 aligns X against Sq — NOT
    key padding — and anything with a real Sq or head extent is dense.
    """
    m = jnp.asarray(mask)
    if not _kv_mask_shape_ok(m.shape, b, sk):
        return None
    lead = m.shape[0] if m.ndim >= 3 else 1
    mb = m.reshape(lead, sk)
    return jnp.broadcast_to(mb.astype(jnp.int32), (b, sk))


# Forward-time residual stash: the sdpa dispatcher records (o, lse) per
# flash forward so the tape's backward can run ONLY the two backward kernels
# (no flash-forward recompute).  Entries pin strong refs to the operand
# arrays, so a key (id triple) can only match the exact same objects; FIFO
# eviction bounds growth across re-traces.  Misses just fall back to a
# recompute via jax.vjp.
from collections import OrderedDict as _OrderedDict

_residual_stash: "_OrderedDict" = _OrderedDict()
_STASH_MAX = 64


def _stash_residuals(qf, kf, vf, mask, o, lse, window=None, sinks=0,
                     seg=None) -> None:
    # only worth pinning when a backward can follow; no_grad forwards
    # (decode, eval) must not accumulate dead activations in the stash
    import minidiff_tpu as _md

    if not _md.grad_allowed_():
        return
    key = (id(qf), id(kf), id(vf), 0 if mask is None else id(mask),
           window, sinks, 0 if seg is None else id(seg))
    _residual_stash[key] = ((qf, kf, vf, mask, seg), o, lse)
    while len(_residual_stash) > _STASH_MAX:
        _residual_stash.popitem(last=False)


def flash_grads(q, k, v, do, scale, causal, mask=None, window=None,
                sinks=0, segment_ids=None):
    """Fused (dq, dk, dv) for (B, H, S, D) operands via the flash kernels.

    Serves the TAPE's sdpa VJPs (ops/definitions.py): the dK/dV and dQ
    backward kernels over the forward's stashed (o, lse) residuals (or one
    flash-forward recompute on a stash miss), instead of the composed
    framework-op grads that materialize the (S, S) score matrix in HBM
    three ways.  ``mask``/``segment_ids`` are the raw (pre-normalization)
    values the forward saw, if any.  Caller is responsible for eligibility
    (use ``flash_grads_decision``).
    """
    b, h, s, d = q.shape
    sk = k.shape[2]
    kvm = None if mask is None else _as_kv_mask(mask, b, sk)
    qf, kf, vf, kvmp = _pad_flash_inputs(
        q.reshape(b * h, s, d),
        k.reshape(b * h, sk, d),
        v.reshape(b * h, sk, d),
        kvm,
        b,
    )
    segp = (None if segment_ids is None
            else _pad_seg(_as_seg(segment_ids, b, s), qf.shape[1]))
    dof = do.reshape(b * h, s, d).astype(q.dtype)
    if qf.shape[1] != s:
        dof = jnp.pad(dof, ((0, 0), (0, qf.shape[1] - s), (0, 0)))

    key = (id(q), id(k), id(v), 0 if mask is None else id(mask),
           window, sinks, 0 if segment_ids is None else id(segment_ids))
    hit = _residual_stash.pop(key, None)
    if hit is not None:
        _, o, lse = hit  # padded (o, lse) from the padded forward
        bq, bk = _blocks_for("bwd", qf, kf, causal, window, sinks, seg=segp)
        dqf, dkf, dvf = _flash_bwd(
            qf, kf, vf, o, lse, dof, scale, causal, bq=bq, bk=bk,
            mask=kvmp, h=h, window=window, sinks=sinks, seg=segp,
        )
    else:
        _, vjp_fn = jax.vjp(
            lambda a, b_, c: _flash(a, b_, c, kvmp, segp, scale, causal, h,
                                    window, sinks),
            qf, kf, vf,
        )
        dqf, dkf, dvf = vjp_fn(dof)
    return (
        dqf[:, :s].reshape(b, h, s, d),
        dkf[:, :sk].reshape(b, h, sk, d),
        dvf[:, :sk].reshape(b, h, sk, d),
    )


def flash_grads_decision(q, k, v, causal, mask=None, window=None,
                         sinks=0, segment_ids=None) -> bool:
    """True when the fused flash backward should serve this (4-D) shape —
    same eligibility AND same autotuner verdict as the forward dispatch."""
    if not _flash_eligible(q, k, v):
        return False
    if window is not None and not causal:
        return False
    b, h, s, d = q.shape
    sk = k.shape[2]
    if mask is not None and not _kv_mask_shape_ok(jnp.shape(mask), b, sk):
        return False
    if segment_ids is not None and not _seg_shape_ok(
            jnp.shape(segment_ids), b, s, sk):
        return False
    return _attn_decision(b * h, s, sk, d, q.dtype, bool(causal),
                          window=window, sinks=sinks,
                          packed=segment_ids is not None) != "composed"


# ---------------------------------------------------------------------------
# dispatch
# ---------------------------------------------------------------------------


def _composed_sdpa(q, k, v, scale, causal, mask=None, window=None, sinks=0):
    # softmax in AT LEAST f32 (bf16 scores lose the max-subtraction), but
    # never downcast — f64 inputs keep f64 so the fd oracle stays sharp
    acc = jnp.promote_types(q.dtype, jnp.float32)
    # cast BEFORE the contraction: einsum's output dtype follows its inputs,
    # and a bf16 score matrix cast to f32 afterwards has already lost the
    # bits (the flash kernel accumulates scores in f32 natively)
    s = jnp.einsum(
        "...qd,...kd->...qk", q.astype(acc), k.astype(acc)
    ) * scale
    if causal:
        sq, sk = s.shape[-2], s.shape[-1]
        rows = jax.lax.broadcasted_iota(jnp.int32, (sq, sk), 0)
        cols = jax.lax.broadcasted_iota(jnp.int32, (sq, sk), 1)
        keep = rows >= cols
        if window is not None:
            live = rows - cols < window
            if sinks:
                live = live | (cols < sinks)
            keep = keep & live
        s = jnp.where(keep, s, _NEG_INF)
    if mask is not None:
        s = jnp.where(jnp.asarray(mask, bool), s, _NEG_INF)
    p = jax.nn.softmax(s, axis=-1).astype(v.dtype)
    return jnp.einsum("...qk,...kd->...qd", p, v)


def _flash_eligible(q, k, v) -> bool:
    if not _pallas_enabled():
        return False
    if q.ndim != 4:
        return False
    if q.dtype != k.dtype or q.dtype != v.dtype:
        return False
    if q.dtype not in (jnp.float32, jnp.bfloat16):
        return False
    b, h, s, d = q.shape
    sk = k.shape[2]
    # ragged lengths qualify: operands are zero-padded to 128-multiples
    # (every block table divides those) and padded keys ride the kv mask
    sp, skp = _round128(s), _round128(sk)
    return (
        _pick_blocks(_FWD_BLOCKS, sp, skp) is not None
        and _pick_blocks(_BWD_BLOCKS, sp, skp) is not None
        and d % 128 == 0
        and d <= 256
        and k.shape == (b, h, sk, d)
        and v.shape == (b, h, sk, d)
    )


def _normalize_window(window, sinks, sq, sk, causal):
    """Validate/canonicalize sliding-window args: window requires causal;
    a window covering every causal position is the same program as no
    window (so it canonicalizes to None and reuses that autotune entry)."""
    if window is None:
        return None, 0
    window = int(window)
    sinks = int(sinks)
    if not causal:
        raise ValueError("sliding-window attention requires causal=True")
    if window < 1:
        raise ValueError(f"window must be >= 1, got {window}")
    if sinks < 0:
        raise ValueError(f"sinks must be >= 0, got {sinks}")
    if window >= sq and window >= sk:
        return None, 0
    return window, sinks


def sdpa(q, k, v, causal: bool = False, scale=None, mask=None,
         window=None, sinks=0, segment_ids=None):
    """Scaled dot-product attention over (B, H, S, D) (3-D treated as H=1).

    Backend entry point for the ``md.sdpa`` op: flash kernel on TPU when
    eligible, composed jnp softmax-attention otherwise.  ``mask`` (boolean,
    True = attend, broadcastable over the score shape) rides into the flash
    kernels when it is key-padding-shaped (value depends only on (batch,
    key) — see ``_as_kv_mask``); any other mask forces the composed path.

    ``window`` (requires causal) restricts each query to the last ``window``
    key positions — Mistral-style sliding-window attention; ``sinks`` keeps
    the first N keys visible to every query (StreamingLLM attention sinks).
    Inside the flash kernels the band skips dead blocks, so long-sequence
    windowed attention costs O(S*W) score FLOPs, not O(S^2).

    ``segment_ids`` ((S,) or (B, S) int, ids >= 0) packs multiple documents
    into one row — queries attend keys only within the same id.  Rides into
    the flash kernels as two (B, 1, S) id rows (never a dense (S, S) mask
    in HBM); requires S_q == S_k for the fused path.
    """
    q = jnp.asarray(q)
    k = jnp.asarray(k)
    v = jnp.asarray(v)
    squeeze = q.ndim == 3
    if squeeze:
        q, k, v = q[:, None], k[:, None], v[:, None]
    if scale is None:
        scale = 1.0 / (q.shape[-1] ** 0.5)
    scale = float(scale)
    if segment_ids is not None and q.shape[-2] != k.shape[-2]:
        raise ValueError(
            "segment_ids requires S_q == S_k (self-attention packing); got "
            f"{q.shape[-2]} vs {k.shape[-2]}")
    window, sinks = _normalize_window(
        window, sinks, q.shape[-2], k.shape[-2], causal)
    use_flash = False
    kvm = None
    seg = None
    if _flash_eligible(q, k, v):
        b, h, s, d = q.shape
        sk = k.shape[2]
        if mask is not None:
            kvm = _as_kv_mask(mask, b, sk)
        if segment_ids is not None and _seg_shape_ok(
                jnp.shape(segment_ids), b, s, sk):
            seg = _as_seg(segment_ids, b, s)
        if ((mask is None or kvm is not None)
                and (segment_ids is None or seg is not None)):
            use_flash = _attn_decision(
                b * h, s, sk, d, q.dtype, bool(causal),
                window=window, sinks=sinks,
                packed=seg is not None) != "composed"
    if use_flash:
        qf, kf, vf, kvmp = _pad_flash_inputs(
            q.reshape(b * h, s, d),
            k.reshape(b * h, sk, d),
            v.reshape(b * h, sk, d),
            kvm,
            b,
        )
        segp = None if seg is None else _pad_seg(seg, qf.shape[1])
        out_f, lse = _flash_aux(qf, kf, vf, kvmp, segp, scale, bool(causal),
                                h, window, sinks)
        # record residuals so the tape's backward (flash_grads) skips the
        # flash-forward recompute; keyed by the UN-reshaped operand ids the
        # grad functions will present (mask keyed by the RAW object — the
        # same unwrapped kwarg value the tape's grad functions unwrap to);
        # the stashed (o, lse) are the PADDED ones the backward kernels eat
        _stash_residuals(q, k, v, mask, out_f, lse, window, sinks,
                         seg=segment_ids)
        out = out_f[:, :s].reshape(b, h, s, d)
    else:
        if mask is not None:
            mask = jnp.asarray(mask, bool)
            if mask.ndim == 3:
                # (B, Sq, Sk): insert the head axis so the batch axis never
                # right-aligns against H in the (B, H, Sq, Sk) score shape
                mask = mask[:, None]
        if segment_ids is not None:
            sg = jnp.asarray(segment_ids, jnp.int32)
            if sg.ndim == 1:
                sg = sg[None, :]
            # (B, 1, Sq, Sk): same-document visibility, head axis broadcast
            sm = (sg[:, None, :, None] == sg[:, None, None, :])
            mask = sm if mask is None else jnp.logical_and(mask, sm)
        out = _composed_sdpa(q, k, v, scale, bool(causal), mask=mask,
                             window=window, sinks=sinks)
    return out[:, 0] if squeeze else out


# ---------------------------------------------------------------------------
# Autotuner: like kernels/matmul.py, flash must EARN each dispatch.  Per
# (B*H, S, Sk, D, dtype, causal) race the flash kernels (block candidates for
# fwd and bwd independently) against XLA's composed attention on throwaway
# inputs; cache ((fwd_blocks), (bwd_blocks)) or "composed".  With
# MINIDIFF_TPU_AUTOTUNE=0 the static block tables decide and flash always
# wins eligible shapes.
# ---------------------------------------------------------------------------

import os as _os

_attn_cache: dict = {}


def _attn_key(bh, s, sk, d, dtype, causal, window=None, sinks=0,
              packed=False):
    return (bh, s, sk, d, str(dtype), bool(causal), window, sinks,
            bool(packed))


def _attn_autotune(bh, s, sk, d, dtype, causal, window=None, sinks=0,
                   packed=False):
    import numpy as np

    from minidiff_tpu.kernels.matmul import (
        _measure_pull_latency,
        time_device_chain,
    )

    rng = np.random.RandomState(0)
    q = jnp.asarray(rng.standard_normal((bh, s, d)), dtype)
    k = jnp.asarray(rng.standard_normal((bh, sk, d)), dtype)
    v = jnp.asarray(rng.standard_normal((bh, sk, d)), dtype)
    do = jnp.asarray(rng.standard_normal((bh, s, d)), dtype)
    scale = float(1.0 / d**0.5)

    # ragged lengths: flash candidates run PADDED (with the kv mask pricing
    # the padding waste) while composed runs the real shape — the decision
    # then reflects what each path would actually execute
    sp, skp = _round128(s), _round128(sk)
    qp, kp, vp, kvmp = _pad_flash_inputs(q, k, v, None, bh)
    dop = do if sp == s else jnp.pad(
        do, ((0, 0), (0, sp - s), (0, 0)))

    # sequence packing: race with a representative 4-document segment table
    # (what the mask costs, not which documents) — real workloads vary, but
    # the kernel cost depends only on the extra compare per tile
    seg = segp = None
    if packed:
        seg = jnp.minimum(jnp.arange(s, dtype=jnp.int32) // max(s // 4, 1),
                          3)[None, :]
        seg = jnp.broadcast_to(seg, (bh, s))
        segp = _pad_seg(seg, sp)

    # Chained racing (see matmul._autotune_eager): a scalar feedback from
    # each rep's output perturbs the next rep's producer scale, forcing
    # sequential execution — independent dispatches pipeline through the
    # tunnel and time dispatch, not device work.  Reps are unrolled
    # IN-TRACE so one dispatch covers >=~4ms of device work and the ~300us
    # high-variance per-dispatch tunnel cost becomes a small common-mode
    # term.
    def _chain_step(core, unroll):
        @jax.jit
        def step(carry):
            x, fb = carry
            for _ in range(unroll):
                xp = x * (jnp.asarray(1.0, jnp.float32) + fb).astype(x.dtype)
                out = core(xp)
                # feedback over EVERY output leaf: anything left out of the
                # feedback is dead code the compiler deletes from the race
                fb = sum(
                    jnp.sum(leaf.astype(jnp.float32))
                    for leaf in jax.tree.leaves(out)
                ) * jnp.asarray(1e-30, jnp.float32)
            return x, fb

        return step

    import time as _time

    def _race(core, carry_leaf):
        """Per-REP seconds for ``core`` under chained in-trace unrolling."""
        step1 = _chain_step(core, 1)
        carry0 = (carry_leaf, jnp.zeros((), jnp.float32))
        out = step1(carry0)  # compile (raises propagate to the caller)
        float(out[-1])
        t0 = _time.perf_counter()
        out = carry0
        for _ in range(4):
            out = step1(out)
        float(out[-1])
        per_est = max((_time.perf_counter() - t0 - lat) / 4, 1e-6)
        unroll = max(1, min(16, int(4e-3 / per_est) + 1))
        step = step1 if unroll == 1 else _chain_step(core, unroll)
        if unroll > 1:
            out = step(carry0)  # compile
            float(out[-1])
        return time_device_chain(step, carry0, lat) / unroll

    lat = _measure_pull_latency(q)

    # composed baseline: ONE value_and_grad executable = fwd + bwd (charging
    # an extra standalone forward would bias the race toward flash).  Under
    # packing the composed path pays the dense (S, S) segment mask.
    comp_mask = None if seg is None else (seg[:, :, None] == seg[:, None, :])
    comp_g = jax.value_and_grad(
        lambda q, k, v: jnp.sum(
            _composed_sdpa(q, k, v, scale, causal, mask=comp_mask,
                           window=window,
                           sinks=sinks).astype(jnp.float32)
            * do.astype(jnp.float32)
        ),
        argnums=(0, 1, 2),
    )
    t_comp = _race(lambda qp: comp_g(qp, k, v), q)

    # best flash fwd blocks.  A single block config failing to compile can
    # be a real VMEM limit, but EVERY config failing means the kernel
    # family cannot lower at this shape — that is a bug signal, not a race
    # result (VERDICT r2: silent excepts hid exactly that for a round).
    from minidiff_tpu.kernels.matmul import report_kernel_failure

    best_f, best_f_t = None, float("inf")
    fwd_err = None
    for blocks in _FWD_BLOCKS:
        if sp % blocks[0] or skp % blocks[1]:
            continue
        bq, bk = blocks
        fwd = functools.partial(
            _flash_fwd, scale=scale, causal=causal, bq=bq, bk=bk,
            mask=kvmp, h=1, window=window, sinks=sinks, seg=segp)
        try:
            t = _race(lambda qx, fwd=fwd: fwd(qx, kp, vp), qp)
        except Exception as e:
            fwd_err = e
            continue
        if t < best_f_t:
            best_f, best_f_t = blocks, t
    if best_f is None:
        if fwd_err is not None:
            report_kernel_failure(
                "flash-fwd",
                (bh, s, sk, d, str(jnp.dtype(dtype)), causal, window, sinks),
                fwd_err)
        # nothing compiled: a bug/transient signal, not a race verdict —
        # None tells the call site to run composed WITHOUT persisting
        return None
    o_best, lse = _flash_fwd(
        qp, kp, vp, scale, causal, bq=best_f[0], bk=best_f[1],
        mask=kvmp, h=1, window=window, sinks=sinks, seg=segp)

    # best flash bwd blocks (using the best fwd's residuals)
    best_b, best_b_t = None, float("inf")
    bwd_err = None
    for blocks in _BWD_BLOCKS:
        if sp % blocks[0] or skp % blocks[1]:
            continue
        bq, bk = blocks
        bwd = functools.partial(
            _flash_bwd, scale=scale, causal=causal, bq=bq, bk=bk,
            mask=kvmp, h=1, window=window, sinks=sinks, seg=segp)
        try:
            t = _race(
                lambda dox, bwd=bwd: bwd(qp, kp, vp, o_best, lse, dox), dop)
        except Exception as e:
            bwd_err = e
            continue
        if t < best_b_t:
            best_b, best_b_t = blocks, t
    if best_b is None:
        if bwd_err is not None:
            report_kernel_failure(
                "flash-bwd",
                (bh, s, sk, d, str(jnp.dtype(dtype)), causal, window, sinks),
                bwd_err)
        return None  # see the fwd case: composed-but-do-not-persist

    # flash must beat composed fwd+bwd by >8% — above the chained race's
    # residual tunnel noise (~5%); real flash wins are 1.9-3.2x, so the
    # margin never costs a genuine win (ties go to XLA: better fusion with
    # neighboring work inside larger jits)
    if best_f_t + best_b_t > 0.92 * t_comp:
        return "composed"
    return (best_f, best_b)


def _attn_decision(bh, s, sk, d, dtype, causal, window=None, sinks=0,
                   packed=False):
    key = _attn_key(bh, s, sk, d, dtype, causal, window, sinks, packed)
    if key not in _attn_cache:
        if _os.environ.get("MINIDIFF_TPU_AUTOTUNE", "1") == "0":
            _attn_cache[key] = (
                _pick_blocks(_STATIC_FWD, s, sk),
                _pick_blocks(_STATIC_BWD, s, sk),
            )
        else:
            from minidiff_tpu.kernels import tunecache
            from minidiff_tpu.kernels.matmul import run_outside_trace

            hit, dec = tunecache.lookup("attention", key)
            if not hit:
                dec = run_outside_trace(
                    lambda: _attn_autotune(bh, s, sk, d, dtype, causal,
                                           window=window, sinks=sinks,
                                           packed=packed)
                )
                if dec is None:
                    # no candidate compiled — composed for this process
                    # only, so a transient failure is re-tried next time
                    dec = "composed"
                else:
                    tunecache.record("attention", key, dec)
            _attn_cache[key] = dec
    return _attn_cache[key]


# Decision-relevant sources for the persistent tune cache (see
# tunecache._fingerprint): the flash kernels, the padding/mask machinery
# they compile, and the block-candidate tables a recorded pick indexes.
TUNE_FINGERPRINT_SOURCES = (
    _fwd_kernel, _bwd_dkv_kernel, _bwd_dq_kernel, _flash_fwd, _flash_bwd,
    _causal_mask, _masked_scores, _block_live, _apply_kv_mask,
    _apply_seg_mask,
    _pad_flash_inputs, _recompute_p_ds, _blocks_for, _pick_blocks,
    _FWD_BLOCKS, _BWD_BLOCKS,
)
