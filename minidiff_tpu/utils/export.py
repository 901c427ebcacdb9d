"""AOT export of compiled programs (jax.export / StableHLO serialization).

A framework function — or an entire compiled serving program — serializes
to portable bytes that reload and execute WITHOUT the model's Python code:
the deployment artifact is the versioned StableHLO program itself, checked
against XLA's compatibility guarantees at load time.  This is the serving
hand-off story: build and validate the decode program in the training
environment, ship one blob to the fleet.

- ``export_fn(fn, *example)`` — trace any framework-ops function at the
  example arguments' shapes/dtypes (pytrees of Tensors) and serialize.
- ``load_fn(blob)`` — rebuild a callable over Tensors from the bytes.
- ``export_decode(model, params, prompt, max_new_tokens, ...)`` — the
  exact cached program ``generate_compiled`` runs (transformer KV-cache
  scan decode), serialized; ``kind="ssm"`` exports the Mamba O(1)-state
  decode.  The exported program takes ``(params, prompt, seed)`` so one
  blob serves any weights of the same structure and any runtime seed.

The platform is recorded in the artifact (export on TPU to serve on TPU);
shapes are static, as compiled serving wants.  No reference counterpart:
/root/reference has no serving or export layer.
"""

from __future__ import annotations

from typing import TYPE_CHECKING

import minidiff_tpu as md

if TYPE_CHECKING:
    from typing import Any, Callable

__all__ = ["export_fn", "load_fn", "export_decode"]


def _is_tensor(x) -> bool:
    return isinstance(x, md.Tensor)


def _raw(tree):
    import jax

    return jax.tree.map(lambda t: t._data, tree, is_leaf=_is_tensor)


def export_fn(fn: "Callable", *example: "Any") -> bytes:
    """Serialize ``fn`` (framework ops over Tensor pytrees) traced at the
    example arguments' shapes/dtypes.  Returns portable bytes."""
    import jax
    from jax import export as jexport

    raws = _raw(example)

    def raw_fn(*raw_args):
        with md.no_grad():
            args = jax.tree.map(md.Tensor, raw_args)
            out = fn(*args)
        return _raw(out)

    structs = jax.tree.map(
        lambda r: jax.ShapeDtypeStruct(r.shape, r.dtype), raws)
    return bytes(jexport.export(jax.jit(raw_fn))(*structs).serialize())


def load_fn(blob: bytes) -> "Callable":
    """Rebuild a Tensor-level callable from ``export_fn``/``export_decode``
    bytes.  The model's Python code is not needed — only the framework."""
    import jax
    from jax import export as jexport

    exp = jexport.deserialize(blob)

    def call(*args: "Any"):
        out = exp.call(*_raw(args))
        return jax.tree.map(md.Tensor, out)

    return call


def export_decode(model, params, prompt: "md.Tensor", max_new_tokens: int,
                  greedy: bool = True, temperature: float = 1.0,
                  top_k=None, kv_quant: bool = False,
                  kind: str = "transformer") -> bytes:
    """Serialize the exact compiled serving program for ``model``.

    The artifact computes ``(params, prompt, seed_uint32) -> generated
    tokens (B, max_new_tokens)`` — weights stay runtime inputs, so one
    blob serves checkpoints of the same structure.  ``kind="ssm"``
    exports the MambaLM O(1)-state decode (``kv_quant`` is a
    transformer-only option).
    """
    import jax
    from jax import export as jexport

    if kind == "transformer":
        from minidiff_tpu.models.decode import decode_program

        program = decode_program(model, params, prompt, max_new_tokens,
                                 greedy=greedy, temperature=temperature,
                                 top_k=top_k, kv_quant=kv_quant)
    elif kind == "ssm":
        if kv_quant:
            raise ValueError("kv_quant only applies to transformer decode")
        from minidiff_tpu.models.ssm import ssm_decode_program

        program = ssm_decode_program(model, params, prompt, max_new_tokens,
                                     greedy=greedy, temperature=temperature,
                                     top_k=top_k)
    else:
        raise ValueError(f"unknown kind {kind!r} ('transformer' or 'ssm')")

    import jax.numpy as jnp

    raw_params = _raw(params)
    structs = jax.tree.map(
        lambda r: jax.ShapeDtypeStruct(r.shape, r.dtype), raw_params)
    prompt_struct = jax.ShapeDtypeStruct(prompt.shape, prompt._data.dtype)
    seed_struct = jax.ShapeDtypeStruct((), jnp.uint32)
    return bytes(jexport.export(program)(
        structs, prompt_struct, seed_struct).serialize())
