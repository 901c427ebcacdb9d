"""AOT export (utils/export.py): jax.export round-trips of framework fns
and the compiled serving programs.

No reference counterpart (/root/reference has no serving/export layer).
Covers:
* export_fn/load_fn round-trip on a pytree-in/pytree-out function
* exported transformer decode == generate_compiled token-for-token,
  including running with DIFFERENT weights of the same structure
* exported SSM decode == generate_compiled_ssm
* sampling seed stays a runtime argument of the artifact
"""

from __future__ import annotations

import numpy as np
import pytest

import minidiff_tpu as md
from minidiff_tpu.models import (
    MambaLM,
    TransformerLM,
    generate_compiled,
    generate_compiled_ssm,
)
from minidiff_tpu.utils import export_decode, export_fn, load_fn


def _np(t):
    import minidiff_tpu.backend as backend

    return np.asarray(backend.get_backend().as_numpy(t._data))


def setup_function(_):
    md.set_backend("xla")


def test_export_fn_roundtrip():
    def f(tree, y):
        return {"out": tree["a"] @ tree["b"] + y, "sum": (y ** 2).sum()}

    rng = np.random.default_rng(0)
    ex = ({"a": md.Tensor(rng.standard_normal((3, 4))),
           "b": md.Tensor(rng.standard_normal((4, 2)))},
          md.Tensor(rng.standard_normal((3, 2))))
    blob = export_fn(f, *ex)
    assert isinstance(blob, bytes) and len(blob) > 100
    call = load_fn(blob)
    got = call(*ex)
    want = f(*ex)
    np.testing.assert_allclose(_np(got["out"]), _np(want["out"]), rtol=1e-6)
    np.testing.assert_allclose(_np(got["sum"]), _np(want["sum"]), rtol=1e-6)


def test_export_transformer_decode_matches_and_reweights():
    model = TransformerLM(vocab_size=17, dim=16, num_heads=2, num_layers=2,
                          max_seq_len=32)
    params = model.init()
    prompt = md.Tensor(np.random.default_rng(1).integers(0, 17, (2, 5)))
    want = _np(generate_compiled(model, params, prompt, 6))

    blob = export_decode(model, params, prompt, 6)
    call = load_fn(blob)
    got = _np(call(params, prompt, md.Tensor(np.uint32(0))))
    np.testing.assert_array_equal(got, want[:, 5:])

    # same blob, different weights (same structure): must track the new
    # model, not bake the old weights in
    params2 = model.init()
    want2 = _np(generate_compiled(model, params2, prompt, 6))
    got2 = _np(call(params2, prompt, md.Tensor(np.uint32(0))))
    np.testing.assert_array_equal(got2, want2[:, 5:])


def test_export_ssm_decode_matches():
    model = MambaLM(vocab_size=11, dim=8, num_layers=1, d_state=4)
    params = model.init()
    prompt = md.Tensor(np.random.default_rng(2).integers(0, 11, (2, 4)))
    want = _np(generate_compiled_ssm(model, params, prompt, 5))
    blob = export_decode(model, params, prompt, 5, kind="ssm")
    got = _np(load_fn(blob)(params, prompt, md.Tensor(np.uint32(0))))
    np.testing.assert_array_equal(got, want[:, 4:])
    with pytest.raises(ValueError, match="kv_quant"):
        export_decode(model, params, prompt, 5, kind="ssm", kv_quant=True)


def test_export_sampling_seed_is_runtime():
    model = TransformerLM(vocab_size=13, dim=16, num_heads=2, num_layers=1,
                          max_seq_len=16)
    params = model.init()
    prompt = md.Tensor(np.random.default_rng(3).integers(0, 13, (2, 4)))
    blob = export_decode(model, params, prompt, 6, greedy=False,
                         temperature=1.0, top_k=5)
    call = load_fn(blob)
    a = _np(call(params, prompt, md.Tensor(np.uint32(7))))
    b = _np(call(params, prompt, md.Tensor(np.uint32(7))))
    c = _np(call(params, prompt, md.Tensor(np.uint32(8))))
    np.testing.assert_array_equal(a, b)
    assert (a != c).any()
    # parity with the live path at the same seed
    live = _np(generate_compiled(model, params, prompt, 6, greedy=False,
                                 temperature=1.0, top_k=5, seed=7))
    np.testing.assert_array_equal(a, live[:, 4:])
