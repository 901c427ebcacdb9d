"""The tape engine's compiled programs ARE jax.grad's programs.

docs/op_bench_table.md claims that every non-kernel op in the per-op
benchmark lowers to the same optimized HLO as the handwritten jax.grad
twin, so that measured ratios away from 1.0 are tunnel noise rather than
a slower program.  This file pins that claim: for every benchmark case
(both dtypes, single rep) the post-optimization HLO of `md.jit(fwd+bwd)`
must equal jax's, modulo debug metadata and value names.

Reference parity anchor: the reference has no compiled path at all
(/root/reference/minidiff/topology.py walks the tape eagerly); the bar
here is our own — the thesis that the tape adds zero compiled-code cost.
"""

from __future__ import annotations

import re

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import minidiff_tpu as md
from benchmarks.op_bench import CASES, _chain


def canonical_hlo(text: str) -> str:
    """Optimized-HLO text modulo names and debug info.

    Strips per-instruction `metadata={...}`, the file/function/location
    tables, and the module header, then alpha-renames every `%value` (and
    the bare parameter names in ENTRY signatures) in order of first
    appearance.  Two programs canonicalizing identically are the same
    computation with the same schedule and fusion decisions.
    """
    text = re.sub(r"metadata=\{[^}]*\}", "", text)
    # drop parameter names from ENTRY signatures: `(name: f32[..], ...)`
    text = re.sub(r"(\()\s*[\w.\-]+(:\s)", r"\1\2", text)
    text = re.sub(r"(,\s)[\w.\-]+(:\s)", r"\1\2", text)
    keep = []
    for line in text.splitlines():
        s = line.strip()
        if s.startswith("%") or s.startswith("ENTRY") or s == "}":
            keep.append(line.rstrip().rstrip(","))
    out = "\n".join(keep)
    names: dict = {}

    def rename(m: "re.Match[str]") -> str:
        tok = m.group(0)
        if tok not in names:
            names[tok] = f"%t{len(names)}"
        return names[tok]

    return re.sub(r"%[\w.\-]+", rename, out)


def _build_pair(name, md_fn, jnp_fn, n, dtype):
    shape = (64, 64)
    shapes = [shape] + [shape[::-1] if name == "matmul" else shape] * (n - 1)
    rng = np.random.RandomState(0)
    args = tuple(jnp.asarray(rng.randn(*s) * 0.1, dtype) for s in shapes)
    argnums = tuple(range(n))

    md_vag = md.value_and_grad(_chain(md_fn, n, 1), argnums=argnums)

    def md_body(*ts):
        out, g = md_vag(*ts)
        return tuple(
            t.detach() - (gt * 1e-6).astype(t.dtype) for t, gt in zip(ts, g))

    jax_vag = jax.value_and_grad(_chain(jnp_fn, n, 1), argnums=argnums)

    def jax_body(*xs):
        out, g = jax_vag(*xs)
        return tuple(x - (gx * 1e-6).astype(x.dtype) for x, gx in zip(xs, g))

    return md_body, jax_body, args


# Cases whose optimized HLO intentionally DIVERGES from jax.grad's, because
# the tape's VJP emits a cheaper formulation (verified by eye on the canonical
# HLO; numerics are pinned against the finite-difference oracle in
# tests/test_ops.py):
#   * tanh (and the tanh epilogue inside matmul): d/dx tanh = 1 - t*t — one
#     multiply+subtract, where jax emits the expanded (1-t)*t + (1-t).
#   * max_axis: ties split the cotangent evenly (convert(eq)/count), where
#     jax routes it through select(eq, ct, 0) — different (both valid)
#     subgradient conventions.
#   * broadcast bf16 / mean bf16: the tape's cotangent stays in the slice
#     shape (f32[64] rebroadcast in-fusion vs a materialized f32[64,64]
#     parameter) / folds the scale constants one convert earlier.
KNOWN_DIVERGENT = {
    ("tanh", "float32"), ("tanh", "bfloat16"),
    ("mean", "bfloat16"),
    ("max_axis", "float32"), ("max_axis", "bfloat16"),
    ("matmul", "float32"), ("matmul", "bfloat16"),
    ("broadcast", "bfloat16"),
}


@pytest.mark.parametrize("dtype", [jnp.float32, jnp.bfloat16],
                         ids=["f32", "bf16"])
@pytest.mark.parametrize("case", CASES, ids=[c[0] for c in CASES])
def test_opbench_case_hlo_vs_jax_grad(case, dtype):
    """Identical programs where expected; the divergence set must not grow.

    A new entry appearing here means a VJP stopped lowering to jax.grad's
    program — either an intentional improvement (add it to KNOWN_DIVERGENT
    with a note) or a regression that docs/op_bench_table.md's roofline
    argument no longer covers.
    """
    md.set_backend("xla")
    name, md_fn, jnp_fn, n = case
    md_body, jax_body, args = _build_pair(name, md_fn, jnp_fn, n, dtype)
    t_md = canonical_hlo(
        md.lower(md_body, *(md.Tensor(x, allow_grad=True) for x in args))
        .compile().as_text())
    t_jax = canonical_hlo(jax.jit(jax_body).lower(*args).compile().as_text())
    if (name, dtype.__name__) in KNOWN_DIVERGENT:
        assert t_md != t_jax, (
            f"{name}/{dtype.__name__}: now identical to jax.grad — remove "
            "it from KNOWN_DIVERGENT")
        # the divergent program must not pay for its different formulation
        # with extra MXU work: same number of dot ops on both sides
        assert t_md.count(" dot(") == t_jax.count(" dot(")
    else:
        assert t_md == t_jax, (
            f"{name}/{dtype.__name__}: tape-compiled HLO diverges from "
            "jax.grad")


def test_canonicalizer_detects_real_differences():
    """The canonicalizer must not be so aggressive it equates everything."""
    md.set_backend("xla")

    def f(a):
        return md.sum(md.tanh(a))

    def g(a):
        return jnp.sum(jnp.exp(a))

    x = jnp.ones((64, 64), jnp.float32)
    t_f = canonical_hlo(
        md.lower(md.grad(f), md.Tensor(x, allow_grad=True))
        .compile().as_text())
    t_g = canonical_hlo(
        jax.jit(jax.grad(g)).lower(x).compile().as_text())
    assert t_f != t_g
