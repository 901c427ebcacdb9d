"""SSM benchmarks: the fused scan kernel and the Mamba train/serve paths.

Run on real TPU from the repo root:  python -m benchmarks.ssm_bench

Three sections:
1. linear_scan kernel race — fused single-pass Pallas vs
   jax.lax.associative_scan at Mamba-training shapes (what the autotuner
   sees, reported explicitly).  Paired A/B rounds, median of ratios.
2. MambaLM train step through the tape engine (md.jit) vs a handwritten
   jax.value_and_grad twin of the same architecture — the framework-
   overhead check for the new family.
3. decode throughput: generate_compiled_ssm tokens/s (O(1) state) at a
   long context where a transformer's KV cache would dominate HBM.
"""

from __future__ import annotations

import time

import jax
import jax.numpy as jnp
import numpy as np

import minidiff_tpu as md
from minidiff_tpu.models import Adam, MambaLM, generate_compiled_ssm, lm_loss, make_train_step

CHAIN = 8
REPEATS = 3


def _pull(x) -> float:
    return float(jnp.sum(x).astype(jnp.float32))


def _latency(probe) -> float:
    ts = []
    for _ in range(5):
        t0 = time.perf_counter()
        _pull(probe)
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts))


def _time_chain(step, carry0, lat, chain=CHAIN):
    best = None
    for _ in range(REPEATS):
        c = carry0
        t0 = time.perf_counter()
        for _ in range(chain):
            c = step(c)
        _pull(c[-1] if isinstance(c, tuple) else c)
        dt = max(time.perf_counter() - t0 - lat, 1e-9) / chain
        best = dt if best is None else min(best, dt)
    return best


def scan_race():
    from minidiff_tpu.kernels import scan as K

    print("== linear_scan: fused pallas vs associative_scan ==")
    for (b, t, c), dtype in [
        ((8, 1024, 4096), jnp.float32),
        ((8, 1024, 4096), jnp.bfloat16),
        ((8, 4096, 1024), jnp.bfloat16),
        ((16, 2048, 2048), jnp.bfloat16),
    ]:
        rng = np.random.RandomState(0)
        a = jnp.asarray(rng.uniform(0.2, 0.95, (b, t, c)), dtype)
        x = jnp.asarray(rng.standard_normal((b, t, c)), dtype)
        lat = _latency(a)
        tiles = K._tiles(t, c)
        bt, cb, t_pad, c_pad = tiles

        @jax.jit
        def assoc_step(carry):
            xx, fb = carry
            xp = xx * (1.0 + fb).astype(xx.dtype)
            out = K._jnp_scan(a, xp, 1)
            return xx, jnp.sum(out.astype(jnp.float32)) * 1e-30

        @jax.jit
        def fused_step(carry):
            xx, fb = carry
            xp = xx * (1.0 + fb).astype(xx.dtype)
            out = K._run_padded(a, xp, t, c, bt, cb, t_pad, c_pad)
            return xx, jnp.sum(out.astype(jnp.float32)) * 1e-30

        carry0 = (x, jnp.zeros((), jnp.float32))
        tas, tfs = [], []
        for _ in range(3):  # paired rounds: drift-proof
            tas.append(_time_chain(assoc_step, carry0, lat))
            tfs.append(_time_chain(fused_step, carry0, lat))
        ratios = [ta / tf for ta, tf in zip(tas, tfs)]
        ta_m, tf_m = float(np.median(tas)), float(np.median(tfs))
        bytes_1pass = 3 * b * t * c * jnp.dtype(dtype).itemsize
        print(f"  B{b} T{t} C{c} {jnp.dtype(dtype).name}:"
              f" assoc {ta_m*1e3:7.3f} ms  fused {tf_m*1e3:7.3f} ms"
              f"  speedup x{float(np.median(ratios)):.2f}"
              f"  (1-pass roofline {bytes_1pass/819e9*1e3:.3f} ms @819GB/s)")


def _jax_mamba_twin(model: MambaLM, params):
    """Handwritten jax forward of the same architecture (the overhead twin)."""
    raw = jax.tree.map(lambda t: t._data,
                       params, is_leaf=lambda x: isinstance(x, md.Tensor))

    def rms(x, g, eps=1e-6):
        return x * jax.lax.rsqrt(
            jnp.mean(x * x, -1, keepdims=True) + eps) * g

    def block(bp, u, blk):
        b, s, _ = u.shape
        di, n, k = blk.d_inner, blk.d_state, blk.d_conv
        dtr = blk.dt_rank
        xz = (u @ bp["in_proj"]["w"]).reshape(b, s, di, 2)
        x_raw, z = xz[..., 0], xz[..., 1]
        x = x_raw * bp["conv_w"][k - 1]
        for j in range(k - 1):
            sh = k - 1 - j
            if sh < s:
                x = x + jnp.pad(x_raw[:, :s - sh], ((0, 0), (sh, 0), (0, 0))) * bp["conv_w"][j]
        x = jax.nn.silu(x + bp["conv_b"])
        proj = x @ bp["x_proj"]["w"]
        dt = jax.nn.softplus(proj[..., :dtr] @ bp["dt_proj"]["w"]
                             + bp["dt_proj"]["b"])
        B = proj[..., dtr:dtr + n]
        C = proj[..., dtr + n:]
        A = -jnp.exp(bp["A_log"])
        abar = jnp.exp(dt[..., None] * A)
        bx = (dt * x)[..., None] * B[:, :, None, :]

        def combine(lo, hi):
            a1, b1 = lo
            a2, b2 = hi
            return a1 * a2, b1 * a2 + b2

        h = jax.lax.associative_scan(combine, (abar, bx), axis=1)[1]
        y = (h * C[:, :, None, :]).sum(-1) + x * bp["D"]
        y = y * jax.nn.silu(z)
        return y @ bp["out_proj"]["w"]

    def fwd(p, toks):
        x = p["tok_emb"][toks]
        for blk, bp, np_ in zip(model.blocks, p["blocks"], p["norms"]):
            x = x + block(bp, rms(x, np_["g"]), blk)
        x = rms(x, p["ln_f"]["g"])
        return x @ p["tok_emb"].T

    return raw, fwd


def train_race(vocab=512, dim=1024, layers=4, seq=1024, batch=8):
    print("== MambaLM train step: md.jit tape vs handwritten jax twin ==")
    dt = md.bfloat16
    model = MambaLM(vocab_size=vocab, dim=dim, num_layers=layers,
                    d_state=16, dtype=dt)
    params = model.init()
    rng = np.random.RandomState(0)
    x = md.Tensor(rng.randint(0, vocab, (batch, seq)))
    y = md.Tensor(rng.randint(0, vocab, (batch, seq)))
    from minidiff_tpu.models import SGD

    step = make_train_step(model, SGD(1e-4), loss_fn=lm_loss)
    state = None
    params, state, l0 = step(params, state, x, y)
    # second warmup: the first call's state=None pytree structure differs
    # from the steady state, so the steady-state executable compiles here,
    # not inside the timed chain
    params, state, l0 = step(params, state, x, y)
    lat = _latency(l0._data)

    best = None
    for _ in range(REPEATS):
        p2, s2, loss = params, state, None
        t0 = time.perf_counter()
        for _ in range(CHAIN):
            p2, s2, loss = step(p2, s2, x, y)
        _pull(loss._data)
        dtm = max(time.perf_counter() - t0 - lat, 1e-9) / CHAIN
        best = dtm if best is None else min(best, dtm)

    raw, fwd = _jax_mamba_twin(model, params)

    def loss_fn(p, toks, tgt):
        logits = fwd(p, toks)
        logp = jax.nn.log_softmax(logits.astype(jnp.float32), -1)
        ll = jnp.take_along_axis(logp, tgt[..., None], -1)
        return -jnp.mean(ll)

    opt_lr = 1e-4

    @jax.jit
    def twin_step(p, toks, tgt):
        loss, g = jax.value_and_grad(loss_fn)(p, toks, tgt)
        p = jax.tree.map(lambda w, gw: w - opt_lr * gw.astype(w.dtype), p, g)
        return p, loss

    xr, yr = x._data, y._data
    p = raw
    p, l0 = twin_step(p, xr, yr)
    best_twin = None
    for _ in range(REPEATS):
        pp = p
        t0 = time.perf_counter()
        for _ in range(CHAIN):
            pp, loss = twin_step(pp, xr, yr)
        _pull(loss)
        dtm = max(time.perf_counter() - t0 - lat, 1e-9) / CHAIN
        best_twin = dtm if best_twin is None else min(best_twin, dtm)

    print(f"  framework {best*1e3:8.3f} ms/step   jax twin {best_twin*1e3:8.3f} ms/step"
          f"   ratio x{best_twin/best:.3f} (both SGD; >1 = framework faster)")


def decode_bench(vocab=512, dim=1024, layers=4, prompt_len=1024, new=128,
                 batch=8):
    print("== compiled SSM decode ==")
    model = MambaLM(vocab_size=vocab, dim=dim, num_layers=layers,
                    d_state=16, dtype=md.bfloat16)
    params = model.init()
    rng = np.random.RandomState(0)
    prompt = md.Tensor(rng.randint(0, vocab, (batch, prompt_len)))
    out = generate_compiled_ssm(model, params, prompt, new)  # compile
    lat = _latency(out._data)
    best = None
    for _ in range(REPEATS):
        t0 = time.perf_counter()
        o = generate_compiled_ssm(model, params, prompt, new)
        _pull(o._data)
        dtm = max(time.perf_counter() - t0 - lat, 1e-9)
        best = dtm if best is None else min(best, dtm)
    tps = batch * new / best
    print(f"  b{batch} prompt{prompt_len} new{new}: {best*1e3:.1f} ms"
          f"  -> {tps:,.0f} tok/s ({best/new*1e3:.3f} ms/token incl. prefill)")


if __name__ == "__main__":
    md.set_backend("xla")
    print("device:", jax.devices()[0])
    scan_race()
    train_race()
    decode_bench()
