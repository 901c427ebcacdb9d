"""DiT (adaLN-Zero diffusion transformer) + rectified-flow train/sample.

No reference counterpart (/root/reference has no models layer); extends
the SURVEY §8 model-family rows with a generative-vision family.  Pins:
* adaLN-Zero init: the untrained model predicts exactly v=0, so every
  block starts as identity and the sampler is a no-op drift
* the flow-matching interpolation/objective against a manual reference
* gradients through the whole model vs the finite-difference oracle
* the compiled md.scan sampler == the eager Euler loop step-for-step
* functional-RNG discipline: same key -> same loss; folded keys differ;
  two steps under ONE md.jit program draw different noise
"""

from __future__ import annotations

import numpy as np
import pytest

import minidiff_tpu as md
from minidiff_tpu.models import (Adam, DiT, flow_matching_loss, patchify,
                                 sample_flow, timestep_embedding,
                                 unpatchify)
from minidiff_tpu.utils import compute_grads


def _np(t):
    import minidiff_tpu.backend as backend

    return np.asarray(backend.get_backend().as_numpy(t._data))


def _tiny(num_classes=0, **kw):
    np.random.seed(0)
    kw.setdefault("image_size", 8)
    kw.setdefault("patch_size", 4)
    kw.setdefault("in_channels", 3)
    kw.setdefault("dim", 32)
    kw.setdefault("num_heads", 2)
    kw.setdefault("num_layers", 2)
    m = DiT(num_classes=num_classes, **kw)
    return m, m.init()


def test_unpatchify_inverts_patchify(backend):
    img = md.Tensor(np.random.randn(2, 8, 8, 3))
    rt = unpatchify(patchify(img, 4), 4, 8, 8, 3)
    np.testing.assert_allclose(_np(rt), _np(img), rtol=0, atol=0)


def test_timestep_embedding(backend):
    t = md.Tensor(np.array([0.0, 0.5, 1.0]))
    emb = timestep_embedding(t, 16)
    assert emb.shape == (3, 16)
    e = _np(emb)
    # t=0: cos block = 1, sin block = 0
    np.testing.assert_allclose(e[0, :8], np.ones(8), atol=1e-12)
    np.testing.assert_allclose(e[0, 8:], np.zeros(8), atol=1e-12)
    assert not np.allclose(e[1], e[2])


def test_adaln_zero_init_predicts_zero(backend):
    m, p = _tiny(num_classes=4)
    x = md.Tensor(np.random.randn(4, 8, 8, 3))
    v = m.apply(p, x, md.Tensor(np.full(4, 0.3)), labels=md.Tensor([0, 1, 2, 3]))
    assert np.abs(_np(v)).max() == 0.0


def test_untrained_sampler_is_identity_drift(backend):
    # v==0 everywhere => Euler integration returns the initial noise
    m, p = _tiny()
    key = md.random_key(5)
    s = sample_flow(m, p, key, 2, steps=4)
    from minidiff_tpu.random import random_normal

    want = random_normal(key, (2, 8, 8, 3))
    np.testing.assert_allclose(_np(s), _np(want), rtol=1e-6, atol=1e-9)


def test_flow_matching_objective_reference(backend):
    # with a model stub returning zeros, loss = mean((eps - x0)^2) for the
    # key-determined draws — pin the interpolation/objective algebra
    m, p = _tiny()
    x0 = md.Tensor(np.random.randn(4, 8, 8, 3))
    key = md.random_key(1)
    got = float(_np(flow_matching_loss(m, p, x0, key)))
    from minidiff_tpu.random import random_normal, random_uniform

    k_t, k_e = md.split_key(key, 2)
    _t = random_uniform(k_t, (4,))
    eps = random_normal(k_e, (4, 8, 8, 3))
    want = float(np.mean((_np(eps) - _np(x0)) ** 2))
    assert abs(got - want) < 1e-9


def test_gradcheck_vs_oracle(backend):
    # whole-model gradient wrt the noisy input against the oracle
    np.random.seed(0)
    m = DiT(image_size=4, patch_size=2, in_channels=1, dim=16,
            num_heads=2, num_layers=1)
    p = m.init()
    # un-zero the output head so gradients reach every parameter path
    p["final"]["w"] = md.Tensor(
        np.random.randn(*p["final"]["w"].shape) * 0.1, allow_grad=True)
    x = md.Tensor(np.random.randn(2, 4, 4, 1), allow_grad=True)
    t = md.Tensor(np.array([0.3, 0.7]))
    manual, auto = compute_grads(
        x, func=lambda a: md.sum(m.apply(p, a, t) ** 2))
    np.testing.assert_allclose(_np(manual[0]), _np(auto[0]),
                               rtol=1e-4, atol=1e-6)


def test_trains_conditionally():
    md.set_backend("xla")
    m, p = _tiny(num_classes=4)
    x0 = md.Tensor(np.random.RandomState(0).randn(4, 8, 8, 3))
    lab = md.Tensor(np.arange(4))
    key = md.random_key(0)
    eval_key = md.random_key(99)  # held-out draw: per-step losses are
    # stochastic (fresh key per step), so progress is measured on a FIXED key
    opt = Adam(3e-3)
    st = opt.init(p)

    def eval_loss(prms):
        with md.no_grad():
            return float(_np(flow_matching_loss(
                m, prms, x0, eval_key, labels=lab)))

    before = eval_loss(p)
    for i in range(20):
        k = md.fold_in(key, i)
        _, grads = md.value_and_grad(
            lambda prms: flow_matching_loss(m, prms, x0, k, labels=lab))(p)
        p, st = opt.update(p, grads, st)
    assert eval_loss(p) < before


def test_jit_step_draws_fresh_noise():
    # ONE compiled program, key as traced input: different keys must give
    # different losses (the RNG-under-jit contract)
    md.set_backend("xla")
    m, p = _tiny()
    x0 = md.Tensor(np.random.RandomState(1).randn(2, 8, 8, 3))

    @md.jit
    def loss_of(key):
        return flow_matching_loss(m, p, x0, key)

    key = md.random_key(9)
    l1 = float(_np(loss_of(md.fold_in(key, 0))))
    l2 = float(_np(loss_of(md.fold_in(key, 1))))
    l1_again = float(_np(loss_of(md.fold_in(key, 0))))
    assert l1 != l2
    assert l1 == l1_again


def test_scan_sampler_matches_eager_loop():
    # the ONE-program md.scan integration must match a python Euler loop
    # step-for-step on the same trained-ish params
    md.set_backend("xla")
    m, p = _tiny(num_classes=2)
    # un-zero output head so the field is nontrivial
    rng = np.random.RandomState(3)
    p["final"]["w"] = md.Tensor(
        rng.randn(*p["final"]["w"].shape) * 0.05, allow_grad=True)
    p["final_mod"]["w"] = md.Tensor(
        rng.randn(*p["final_mod"]["w"].shape) * 0.05, allow_grad=True)
    lab = md.Tensor([0, 1])
    key = md.random_key(11)
    got = sample_flow(m, p, key, 2, steps=6, labels=lab)

    from minidiff_tpu.random import random_normal

    x = random_normal(key, (2, 8, 8, 3))
    dt = 1.0 / 6
    with md.no_grad():
        for t in np.linspace(1.0, dt, 6):
            tb = md.Tensor(np.full(2, t))
            x = x - dt * m.apply(p, x, tb, labels=lab)
    np.testing.assert_allclose(_np(got), _np(x), rtol=1e-5, atol=1e-7)


def test_conditional_requires_labels(backend):
    m, p = _tiny(num_classes=4)
    x = md.Tensor(np.random.randn(2, 8, 8, 3))
    with pytest.raises(ValueError):
        m.apply(p, x, md.Tensor(np.full(2, 0.5)))


def test_bad_patch_size_raises(backend):
    with pytest.raises(ValueError):
        DiT(image_size=10, patch_size=4)
