"""Fused paged decode attention: one query token over a paged KV pool.

``models/paged.py`` serves requests out of a shared pool of fixed
128-token KV pages with per-slot page tables.  The round-3 implementation
gathered every slot's pages into a dense logical ``(B, kv, window, hd)``
view per layer per step — O(window) HBM traffic per slot regardless of how
many tokens the slot actually holds, plus a materialized intermediate the
dense server never pays.  This kernel reads the pool DIRECTLY:

- the page table and per-slot positions ride as SCALAR PREFETCH (SMEM), so
  each grid step's BlockSpec index map picks the page to DMA out of the
  pool — the same idiom as ``sdpa_int8_cache``'s per-row positions;
- the page-walk grid dimension is innermost and CLAMPED to the slot's
  last used page: beyond it the index map repeats the previous page, and
  consecutive identical block indices elide the re-fetch (Mosaic's
  revisiting rule), so HBM traffic is the slot's ACTUAL page count, not
  the worst-case window;
- softmax runs online (flash-style): per page a (g, PAGE) score tile,
  running max / normalizer / f32 accumulator in VMEM scratch, one output
  write on the last page.

Layouts: q (B, kv, g, hd) — g = query heads per kv head (GQA grouping,
head h belongs to kv head h // g); pools (P, kv, PAGE, hd); table
(B, maxp) int32 page ids; pos (B,) int32 = the position the incoming
token occupies (cache rows <= pos are live).  The mask predicate is the
dense server's: ``l <= pos`` plus the optional sliding-window band
``l > pos - window`` with ``sinks`` always-visible head rows.

The jnp reference (`paged_attention_reference`) computes the same algebra
over the gathered view — the oracle for interpret-mode tests and the
dispatch fallback off-TPU.

No reference counterpart: /root/reference has no serving layer (SURVEY
§2.2); the paging design follows the public vLLM/TPU paged-attention
idea re-derived for Pallas block specs.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from minidiff_tpu.kernels.matmul import _pallas_enabled, report_kernel_failure

PAGE = 128

_SUPPORTED = (jnp.float32, jnp.bfloat16)


def _mask(l_global, pos_b, window, sinks):
    visible = l_global <= pos_b
    if window is not None:
        band = l_global > pos_b - int(window)
        if sinks:
            band = jnp.logical_or(band, l_global < int(sinks))
        visible = jnp.logical_and(visible, band)
    return visible


def _make_kernel(scale: float, window, sinks: int, maxp: int):
    def kernel(tab_ref, pos_ref, q_ref, k_ref, v_ref, o_ref,
               acc_ref, m_ref, l_ref):
        b = pl.program_id(0)
        pg = pl.program_id(1)

        @pl.when(pg == 0)
        def _init():
            m_ref[:] = jnp.full_like(m_ref, -1e30)
            l_ref[:] = jnp.zeros_like(l_ref)
            acc_ref[:] = jnp.zeros_like(acc_ref)

        pos_b = pos_ref[b]

        @pl.when(pg * PAGE <= pos_b)
        def _page():
            q = q_ref[0]                                   # (kv, g, hd)
            k = k_ref[0]                                   # (kv, PAGE, hd)
            kv, g = q.shape[0], q.shape[1]
            s = jax.lax.dot_general(
                q, k, dimension_numbers=(((2,), (2,)), ((0,), (0,))),
                preferred_element_type=jnp.float32) * scale  # (kv, g, PAGE)
            l_global = (pg * PAGE + jax.lax.broadcasted_iota(
                jnp.int32, (kv, g, PAGE), 2))
            s = jnp.where(_mask(l_global, pos_b, window, sinks), s, -1e30)
            m_cur = m_ref[:, :, :1]                        # (kv, g, 1)
            m_new = jnp.maximum(m_cur, jnp.max(s, axis=-1, keepdims=True))
            alpha = jnp.exp(m_cur - m_new)                 # (kv, g, 1)
            p = jnp.exp(s - m_new)                         # (kv, g, PAGE)
            l_ref[:] = l_ref[:] * alpha + jnp.sum(p, axis=-1, keepdims=True)
            pv = jax.lax.dot_general(
                p.astype(v_ref.dtype), v_ref[0],
                dimension_numbers=(((2,), (1,)), ((0,), (0,))),
                preferred_element_type=jnp.float32)        # (kv, g, hd)
            acc_ref[:] = acc_ref[:] * alpha + pv
            m_ref[:] = jnp.broadcast_to(m_new, m_ref.shape)

        @pl.when(pg == maxp - 1)
        def _flush():
            o_ref[0] = (acc_ref[:] / l_ref[:, :, :1]).astype(o_ref.dtype)

    return kernel


@functools.partial(jax.jit, static_argnames=("scale", "window", "sinks",
                                             "interpret"))
def _pallas_paged_attention(q, pool_k, pool_v, table, pos, scale: float,
                            window, sinks: int, interpret: bool = False):
    b, kv, g, hd = q.shape
    maxp = table.shape[1]

    def _page_idx(bi, pg, tab, pos):
        # clamp to the slot's last used page: repeated indices past it
        # skip the DMA (revisiting), so dead pages cost nothing.  One grid
        # cell covers ALL kv heads of a page (one big DMA, not kv small
        # ones — per-cell overhead dominated the first cut of this kernel)
        last = jnp.maximum(pos[bi], 0) // PAGE
        return (tab[bi, jnp.minimum(pg, last)], 0, 0, 0)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(b, maxp),
        in_specs=[
            pl.BlockSpec((1, kv, g, hd), lambda bi, pg, tab, pos:
                         (bi, 0, 0, 0)),
            pl.BlockSpec((1, kv, PAGE, hd), _page_idx),
            pl.BlockSpec((1, kv, PAGE, hd), _page_idx),
        ],
        out_specs=pl.BlockSpec((1, kv, g, hd), lambda bi, pg, tab, pos:
                               (bi, 0, 0, 0)),
        scratch_shapes=[
            pltpu.VMEM((kv, g, hd), jnp.float32),   # output accumulator
            pltpu.VMEM((kv, g, 128), jnp.float32),  # running max
            pltpu.VMEM((kv, g, 128), jnp.float32),  # running normalizer
        ],
    )
    return pl.pallas_call(
        _make_kernel(scale, window, sinks, maxp),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((b, kv, g, hd), q.dtype),
        interpret=interpret,
    )(table.astype(jnp.int32), pos.astype(jnp.int32), q, pool_k, pool_v)


def paged_attention_reference(q, pool_k, pool_v, table, pos, scale: float,
                              window=None, sinks: int = 0):
    """Same algebra over the gathered logical view (oracle / fallback).

    q (B, kv, g, hd); pools (P, kv, PAGE, hd); table (B, maxp); pos (B,).
    """
    b, kv, g, hd = q.shape
    maxp = table.shape[1]
    pages = pool_k[table]                         # (B, maxp, kv, PAGE, hd)
    view_k = pages.transpose(0, 2, 1, 3, 4).reshape(b, kv, maxp * PAGE, hd)
    view_v = pool_v[table].transpose(0, 2, 1, 3, 4).reshape(
        b, kv, maxp * PAGE, hd)
    s = jax.lax.dot_general(
        q, view_k, dimension_numbers=(((3,), (3,)), ((0, 1), (0, 1))),
        preferred_element_type=jnp.float32) * scale   # (B, kv, g, L)
    l_global = jax.lax.broadcasted_iota(jnp.int32, (1, 1, 1, maxp * PAGE), 3)
    pos_b = pos.astype(jnp.int32)[:, None, None, None]
    s = jnp.where(_mask(l_global, pos_b, window, sinks), s, -1e30)
    m = jnp.max(s, axis=-1, keepdims=True)
    e = jnp.exp(s - m)
    p = (e / jnp.sum(e, axis=-1, keepdims=True)).astype(view_v.dtype)
    return jax.lax.dot_general(
        p, view_v, dimension_numbers=(((3,), (2,)), ((0, 1), (0, 1))),
        preferred_element_type=jnp.float32).astype(q.dtype)


_FALLBACK_WARNED: set = set()


def paged_attention(q, pool_k, pool_v, table, pos, scale=None, window=None,
                    sinks: int = 0):
    """Dispatch: fused page-walk kernel on TPU, gathered reference off it.

    Eligibility: ``hd`` is the kernel blocks' lane dimension — multiples of
    64 lower through Mosaic (64 pads to half-utilized lanes but still beats
    the O(window) gather).  Head dims off the 64 grid (80, 96 — Phi-class)
    fall back to the gathered reference; that negates the kernel's
    HBM-traffic claim, so the fallback WARNS once per shape instead of
    staying silent (ADVICE r4).
    """
    b, kv, g, hd = q.shape
    scale = float(scale) if scale is not None else 1.0 / (hd ** 0.5)
    if _pallas_enabled() and q.dtype in _SUPPORTED:
        if hd % 64 == 0 and pool_k.shape[2] == PAGE:
            try:
                return _pallas_paged_attention(q, pool_k, pool_v, table,
                                               pos, scale, window,
                                               int(sinks))
            except Exception as e:  # lowering failure: loud, then fall back
                report_kernel_failure(
                    "paged-attn", (b, kv, g, hd, table.shape[1],
                                   str(jnp.dtype(q.dtype))), e)
        else:
            shape_key = (hd, pool_k.shape[2])
            if shape_key not in _FALLBACK_WARNED:
                _FALLBACK_WARNED.add(shape_key)
                import warnings

                warnings.warn(
                    f"paged_attention: head_dim={hd} (page={pool_k.shape[2]})"
                    " is not fused-kernel eligible (needs hd % 64 == 0 and"
                    f" page == {PAGE}); serving falls back to the O(window)"
                    " gathered reference path", stacklevel=2)
    return paged_attention_reference(q, pool_k, pool_v, table, pos, scale,
                                     window, int(sinks))


def append_kv(pool, rows, page_ids, offsets):
    """Scatter one decode step's KV into its pages, one DUS per live row.

    pool (P, kv, PAGE, hd); rows (B, kv, hd) — row b's new KV line;
    page_ids (B,) int32 page per row; offsets (B,) int32 in-page position.
    O(B * kv * hd) HBM writes — replacing the full-pool one-hot rewrite
    (the round-3 implementation rewrote all P pages per layer per step).
    """
    pids = page_ids.astype(jnp.int32)
    offs = offsets.astype(jnp.int32)
    # one batched scatter: row b lands at pool[pids[b], :, offs[b], :].
    # Live slots hold distinct pages so indices never collide; dead slots
    # all target the garbage page 0, where any write order is fine.
    return pool.at[pids, :, offs].set(rows.astype(pool.dtype),
                                      mode="drop",
                                      unique_indices=False)
