"""MoE training-step efficiency vs the dense-FFN step at equal FLOPs.

The VERDICT r3 criterion: with the grouped (gather/scatter) dispatch, an
E=8 MoE step must be within 1.3x of an architecturally matched dense-FFN
transformer step whose matmul FLOPs are the same (capacity factor 1.0,
k=1: every token runs one expert FFN of the same width, so activated
FLOPs match the dense MLP exactly — the difference is pure routing
overhead).  Same chained-timing protocol as bench.py.

Run: ``python benchmarks/moe_bench.py`` on a TPU.  No reference
counterpart: /root/reference has no models or benchmarks.
"""

from __future__ import annotations

import json
import time

import jax
import jax.numpy as jnp
import numpy as np

DIM, HEADS, LAYERS, SEQ, BATCH, VOCAB = 512, 4, 2, 512, 8, 512
CHAIN, REPEATS = 8, 3


def _pull(x) -> float:
    return float(jnp.sum(jnp.asarray(x, jnp.float32)))


def moe_vs_dense(experts: int = 8) -> dict:
    import minidiff_tpu as md
    from minidiff_tpu.models import SGD, TransformerLM, lm_loss, \
        make_train_step
    from minidiff_tpu.models.moe import MoETransformerLM, make_moe_loss

    md.set_backend("xla")
    dense = TransformerLM(vocab_size=VOCAB, dim=DIM, num_heads=HEADS,
                          num_layers=LAYERS, max_seq_len=SEQ,
                          dtype=md.bfloat16)
    moe = MoETransformerLM(vocab_size=VOCAB, dim=DIM, num_heads=HEADS,
                           num_layers=LAYERS, num_experts=experts,
                           max_seq_len=SEQ, k=1, capacity_factor=1.0,
                           dtype=md.bfloat16, grouped=True)
    np.random.seed(0)
    dp = dense.init()
    np.random.seed(0)
    mp = moe.init()
    toks = md.Tensor(np.random.RandomState(1).randint(
        0, VOCAB, size=(BATCH, SEQ)))

    d_step = make_train_step(dense, SGD(1e-3), loss_fn=lm_loss)
    m_step = make_train_step(moe, SGD(1e-3), loss_fn=make_moe_loss(0.01),
                             apply_fn=moe.apply_with_aux)

    def run(step, params):
        p = params
        for _ in range(CHAIN):
            p, _, loss = step(p, None, toks, toks)
        return loss._data

    def timed(step, params, lat):
        best = None
        for _ in range(1):
            t0 = time.perf_counter()
            _pull(run(step, params))
            dt = max(time.perf_counter() - t0 - lat, 1e-9) / CHAIN
            best = dt if best is None else min(best, dt)
        return best

    # warm both programs, then paired rounds (drift cancels in the ratio)
    _pull(run(d_step, dp))
    _pull(run(m_step, mp))
    probe = jnp.ones((8, 128), jnp.float32)
    ts = []
    for _ in range(5):
        t0 = time.perf_counter()
        _pull(probe)
        ts.append(time.perf_counter() - t0)
    lat = sorted(ts)[2]
    pairs = [(timed(d_step, dp, lat), timed(m_step, mp, lat))
             for _ in range(REPEATS)]
    t_d = min(p[0] for p in pairs)
    t_m = min(p[1] for p in pairs)
    ratio = sorted(pm / pd for pd, pm in pairs)[len(pairs) // 2]
    return {
        "moe_e8_step_ms": round(t_m * 1e3, 3),
        "dense_ffn_step_ms": round(t_d * 1e3, 3),
        "moe_vs_dense_equal_flops": round(ratio, 4),
    }


def _timed_pair(step_a, pa, step_b, pb, toks) -> tuple:
    """(t_a, t_b, median ratio t_b/t_a) with paired chained rounds."""
    import minidiff_tpu as md  # noqa: F401  (backend already selected)

    def run(step, params):
        p = params
        loss = None
        for _ in range(CHAIN):
            p, _, loss = step(p, None, toks, toks)
        return loss._data

    _pull(run(step_a, pa))
    _pull(run(step_b, pb))
    probe = jnp.ones((8, 128), jnp.float32)
    ts = []
    for _ in range(5):
        t0 = time.perf_counter()
        _pull(probe)
        ts.append(time.perf_counter() - t0)
    lat = sorted(ts)[2]

    def timed(step, params):
        t0 = time.perf_counter()
        _pull(run(step, params))
        return max(time.perf_counter() - t0 - lat, 1e-9) / CHAIN

    pairs = [(timed(step_a, pa), timed(step_b, pb)) for _ in range(REPEATS)]
    t_a = min(p[0] for p in pairs)
    t_b = min(p[1] for p in pairs)
    ratio = sorted(pb_ / pa_ for pa_, pb_ in pairs)[len(pairs) // 2]
    return t_a, t_b, ratio


def grouped_crossover(experts: int, _return_grouped: bool = False):
    """Grouped (slot-table gather) vs one-hot dispatch at a given E.

    The scalability argument for grouped routing is about LARGE expert
    counts: the one-hot dispatch/combine tensordots cost O(E*C*T*d) MXU
    FLOPs (C = cf*k*T/E, so ~2.5*k*T^2*d regardless of E) while the
    gather path moves O(k*T*d) bytes.  ``grouped_speedup_vs_onehot_e{E}``
    > 1 means grouped wins (it is t_onehot / t_grouped).
    """
    import minidiff_tpu as md
    from minidiff_tpu.models import SGD, make_train_step
    from minidiff_tpu.models.moe import MoETransformerLM, make_moe_loss

    md.set_backend("xla")
    steps = {}
    params = {}
    for grouped in (False, True):
        np.random.seed(0)
        m = MoETransformerLM(vocab_size=VOCAB, dim=DIM, num_heads=HEADS,
                             num_layers=LAYERS, num_experts=experts,
                             max_seq_len=SEQ, k=1, capacity_factor=1.0,
                             dtype=md.bfloat16, grouped=grouped)
        params[grouped] = m.init()
        steps[grouped] = make_train_step(
            m, SGD(1e-3), loss_fn=make_moe_loss(0.01),
            apply_fn=m.apply_with_aux)
    toks = md.Tensor(np.random.RandomState(1).randint(
        0, VOCAB, size=(BATCH, SEQ)))
    t_g, t_o, ratio = _timed_pair(steps[True], params[True],
                                  steps[False], params[False], toks)
    result = {
        f"moe_grouped_e{experts}_step_ms": round(t_g * 1e3, 3),
        f"moe_onehot_e{experts}_step_ms": round(t_o * 1e3, 3),
        f"grouped_speedup_vs_onehot_e{experts}": round(ratio, 4),
    }
    if _return_grouped:
        # hand the warmed grouped step back so sweep() does not pay a
        # second identical train-step compile per E (r5 self-review)
        return result, steps[True], params[True]
    return result


def sweep(experts_list=(8, 32, 64)) -> dict:
    """Full crossover table: per E, grouped vs one-hot vs the dense-FFN
    step at equal activated FLOPs (cf=1.0, k=1).

    ``moe_grouped_speedup_vs_dense_e{E} = t_dense / t_grouped`` — > 1
    means the grouped MoE step is FASTER than the equal-FLOPs dense step
    (explicit name; the older ``moe_vs_dense_equal_flops`` row was read
    both ways).
    """
    import minidiff_tpu as md
    from minidiff_tpu.models import SGD, TransformerLM, lm_loss, \
        make_train_step

    md.set_backend("xla")
    np.random.seed(0)
    dense = TransformerLM(vocab_size=VOCAB, dim=DIM, num_heads=HEADS,
                          num_layers=LAYERS, max_seq_len=SEQ,
                          dtype=md.bfloat16)
    dp = dense.init()
    d_step = make_train_step(dense, SGD(1e-3), loss_fn=lm_loss)
    toks = md.Tensor(np.random.RandomState(1).randint(
        0, VOCAB, size=(BATCH, SEQ)))
    out: dict = {}
    for e in experts_list:
        rows, m_step, mp = grouped_crossover(e, _return_grouped=True)
        out.update(rows)
        t_m, t_d, ratio = _timed_pair(m_step, mp, d_step, dp, toks)
        out[f"moe_grouped_speedup_vs_dense_e{e}"] = round(ratio, 4)
        out["dense_ffn_step_ms"] = round(t_d * 1e3, 3)
    return out


def main() -> None:
    print(json.dumps(sweep(), indent=2))


if __name__ == "__main__":
    main()
