"""Vision Transformer family tests.

No reference counterpart (the reference has no models layer, SURVEY §2.2);
extends the SURVEY §8 model-zoo rows.
"""

from __future__ import annotations

import numpy as np
import pytest

import minidiff_tpu as md
from minidiff_tpu.models import ViT, patchify


def _np(t):
    import minidiff_tpu.backend as backend

    return np.asarray(backend.get_backend().as_numpy(t._data))


def test_patchify_matches_manual(backend):
    b, h, w, c, p = 2, 8, 8, 3, 4
    imgs = np.random.randn(b, h, w, c)
    got = _np(patchify(md.Tensor(imgs), p))
    assert got.shape == (b, (h // p) * (w // p), p * p * c)
    # patch (i, j) flattens row-major over (p, p, c)
    for bi in range(b):
        for gi in range(h // p):
            for gj in range(w // p):
                want = imgs[bi, gi * p:(gi + 1) * p,
                            gj * p:(gj + 1) * p, :].reshape(-1)
                np.testing.assert_array_equal(
                    got[bi, gi * (w // p) + gj], want)


def test_patchify_rejects_indivisible(backend):
    with pytest.raises(ValueError):
        patchify(md.Tensor(np.zeros((1, 9, 8, 3))), 4)


def test_vit_forward_shapes_and_grads(backend):
    m = ViT(image_size=8, patch_size=4, in_channels=3, num_classes=5,
            dim=32, num_heads=2, num_layers=2)
    p = m.init()
    x = md.Tensor(np.random.randn(2, 8, 8, 3))
    out = m.apply(p, x)
    assert out.shape == (2, 5)
    loss = md.sum(out ** 2)
    loss.backward()
    assert p["cls"].grad is not None
    assert p["pos_emb"].grad is not None
    assert p["patch_embed"]["w"].grad is not None
    assert p["blocks"][0]["attn"]["qkv"]["w"].grad is not None
    assert p["head"]["w"].grad is not None


def test_vit_learns_synthetic_classification(backend):
    # class = which quadrant of the image carries the bright blob
    from minidiff_tpu.models import SGD
    from minidiff_tpu.models import functional as F

    rng = np.random.RandomState(0)
    n, size = 64, 8
    labels = rng.randint(0, 4, n)
    imgs = rng.randn(n, size, size, 1) * 0.1
    for i, lab in enumerate(labels):
        r, c = divmod(lab, 2)
        imgs[i, r * 4:(r + 1) * 4, c * 4:(c + 1) * 4, :] += 2.0

    m = ViT(image_size=size, patch_size=4, in_channels=1, num_classes=4,
            dim=32, num_heads=2, num_layers=2)
    params = m.init()
    opt = SGD(0.1)
    state = opt.init(params)
    X, Y = md.Tensor(imgs), md.Tensor(labels)
    first = last = None
    for step in range(60):
        logits = m.apply(params, X)
        loss = F.cross_entropy(logits, Y)
        loss.backward()
        import jax

        grads = jax.tree.map(lambda t: t.grad, params,
                             is_leaf=lambda t: isinstance(t, md.Tensor))
        params, state = opt.update(params, grads, state)
        val = float(_np(loss))
        first = val if first is None else first
        last = val
    assert last < first * 0.5, (first, last)
    preds = np.argmax(_np(m.apply(params, X)), axis=-1)
    assert (preds == labels).mean() > 0.9


def test_vit_dropout_uses_functional_rng(backend):
    m = ViT(image_size=8, patch_size=4, in_channels=1, num_classes=3,
            dim=32, num_heads=2, num_layers=1, dropout=0.5)
    p = m.init()
    x = md.Tensor(np.random.randn(2, 8, 8, 1))
    k1, k2 = md.random_key(0), md.random_key(1)
    a = _np(m.apply(p, x, rng=k1))
    a_again = _np(m.apply(p, x, rng=k1))
    b = _np(m.apply(p, x, rng=k2))
    np.testing.assert_array_equal(a, a_again)  # same key -> same mask
    assert np.abs(a - b).max() > 0  # fresh key -> fresh mask
    # eval mode (rng=None) is deterministic and mask-free
    e1, e2 = _np(m.apply(p, x)), _np(m.apply(p, x))
    np.testing.assert_array_equal(e1, e2)


def test_vit_serves_quantized(backend):
    from minidiff_tpu.models import quantize_for_serving

    m = ViT(image_size=8, patch_size=4, in_channels=3, num_classes=5,
            dim=128, num_heads=4, num_layers=1)
    p = m.init()
    qp = quantize_for_serving(p, min_elements=128 * 128)
    assert "w_q" in qp["blocks"][0]["fc1"]
    x = md.Tensor(np.random.randn(2, 8, 8, 3))
    ref, out = _np(m.apply(p, x)), _np(m.apply(qp, x))
    rel = np.max(np.abs(out - ref)) / (np.max(np.abs(ref)) + 1e-9)
    assert rel < 0.1, rel
