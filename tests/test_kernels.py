"""Pallas kernel correctness (interpret mode on CPU; compiled on real TPU)."""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from minidiff_tpu.kernels import matmul as mm


@pytest.fixture(autouse=True)
def _interpret(monkeypatch):
    # run the Pallas kernel in interpreter mode on CPU
    import functools
    from jax.experimental import pallas as pl

    original = pl.pallas_call
    monkeypatch.setattr(
        pl, "pallas_call", functools.partial(original, interpret=True)
    )
    yield


def test_pallas_matmul_matches_jnp():
    m, k, n = 512, 512, 256
    x = jnp.asarray(np.random.randn(m, k), dtype=jnp.float32)
    y = jnp.asarray(np.random.randn(k, n), dtype=jnp.float32)
    got = mm._pallas_matmul_2d(x, y, bm=256, bn=256, bk=256)
    want = jnp.matmul(x, y)
    # f32 accumulation order differs between the tiled kernel and XLA's matmul
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-4, atol=1e-4)


def test_pallas_matmul_bf16_accumulates_f32():
    m = k = n = 256
    x = jnp.asarray(np.random.randn(m, k), dtype=jnp.bfloat16)
    y = jnp.asarray(np.random.randn(k, n), dtype=jnp.bfloat16)
    got = mm._pallas_matmul_2d(x, y, bm=128, bn=128, bk=128)
    want = jnp.matmul(
        x.astype(jnp.float32), y.astype(jnp.float32)
    ).astype(jnp.bfloat16)
    np.testing.assert_allclose(
        np.asarray(got, dtype=np.float32),
        np.asarray(want, dtype=np.float32),
        rtol=2e-2,
        atol=2e-2,
    )


def test_custom_vjp_matches_jax_grad():
    m = k = n = 256

    xn = np.random.randn(m, k).astype(np.float32)
    yn = np.random.randn(k, n).astype(np.float32)

    def loss_pallas(x, y):
        # small tiles so the kernel actually runs under interpret mode
        return jnp.sum(mm._pallas_matmul(x, y, 128, 128, 128) ** 2)

    def loss_ref(x, y):
        return jnp.sum(jnp.matmul(x, y) ** 2)

    gx, gy = jax.grad(loss_pallas, argnums=(0, 1))(jnp.asarray(xn), jnp.asarray(yn))
    ex, ey = jax.grad(loss_ref, argnums=(0, 1))(jnp.asarray(xn), jnp.asarray(yn))
    np.testing.assert_allclose(np.asarray(gx), np.asarray(ex), rtol=1e-3, atol=1e-2)
    np.testing.assert_allclose(np.asarray(gy), np.asarray(ey), rtol=1e-3, atol=1e-2)


def test_dispatcher_fallback_small_or_unaligned():
    # small/unaligned shapes must fall back to jnp.matmul
    x = jnp.asarray(np.random.randn(7, 5), dtype=jnp.float32)
    y = jnp.asarray(np.random.randn(5, 3), dtype=jnp.float32)
    np.testing.assert_allclose(
        np.asarray(mm.matmul(x, y)),
        np.asarray(jnp.matmul(x, y)),
        rtol=1e-6,
    )
    assert mm._choose("nn", x, y) is None


def test_pallas_nt_tn_match_reference():
    m, k, n = 256, 512, 128
    x = jnp.asarray(np.random.randn(m, k), dtype=jnp.float32)
    y = jnp.asarray(np.random.randn(n, k), dtype=jnp.float32)
    got = mm._pallas_matmul_nt_2d(x, y, bm=128, bn=128, bk=128)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(x @ y.T), rtol=1e-4, atol=1e-4
    )
    xt = jnp.asarray(np.random.randn(k, m), dtype=jnp.float32)
    yt = jnp.asarray(np.random.randn(k, n), dtype=jnp.float32)
    got = mm._pallas_matmul_tn_2d(xt, yt, bm=128, bn=128, bk=128)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(xt.T @ yt), rtol=1e-4, atol=1e-4
    )


def test_autotuner_shape_bookkeeping():
    # _mnk maps operand shapes to the logical (m, n, k) per variant
    assert mm._mnk("nn", (64, 32), (32, 48)) == (64, 48, 32)
    assert mm._mnk("nt", (64, 32), (48, 32)) == (64, 48, 32)
    assert mm._mnk("tn", (32, 64), (32, 48)) == (64, 48, 32)
    # mismatched contraction dims are rejected
    assert mm._mnk("nn", (64, 32), (31, 48)) == (0, 0, 0)
    assert mm._tiles_fit("nn", (256, 256, 512), 1024, 1024, 1024)
    assert not mm._tiles_fit("nn", (256, 256, 512), 1024, 1024, 768)


def test_autotuner_static_fallback(monkeypatch):
    # With autotuning off and pallas force-enabled, _choose returns the first
    # fitting tile config; the in-memory cache key includes shape + dtype.
    monkeypatch.setenv("MINIDIFF_TPU_AUTOTUNE", "0")
    monkeypatch.setattr(mm, "_pallas_enabled", lambda: True)
    mm._choice_cache.clear()
    try:
        x = jnp.zeros((2048, 2048), jnp.bfloat16)
        choice = mm._choose("nn", x, x)
        assert choice in mm._TILE_CANDIDATES["nn"]
        # too small -> always XLA
        s = jnp.zeros((256, 256), jnp.bfloat16)
        assert mm._choose("nn", s, s) is None
        # unsupported dtype -> always XLA
        d = jnp.zeros((2048, 2048), jnp.float64)
        assert mm._choose("nn", d, d) is None
    finally:
        mm._choice_cache.clear()
