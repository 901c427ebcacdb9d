"""Headline-only train-step timing for optimization iterations."""
import json, os, sys, time
import jax, jax.numpy as jnp, numpy as np
sys.path.insert(0, "/root/repo")
import bench as BB
import minidiff_tpu as md
from minidiff_tpu.models import SGD, TransformerLM, lm_loss, make_train_step

md.set_backend("xla")
model = TransformerLM(vocab_size=BB.VOCAB, dim=BB.DIM, num_heads=BB.HEADS,
                      num_layers=BB.LAYERS, max_seq_len=BB.SEQ, dtype=md.bfloat16)
np.random.seed(0)
params0 = model.init()
raw0 = jax.tree.map(lambda t: t._data, params0, is_leaf=lambda t: isinstance(t, md.Tensor))
toks_np = np.random.RandomState(1).randint(0, BB.VOCAB, size=(BB.BATCH, BB.SEQ))
toks = md.Tensor(toks_np); toks_j = jnp.asarray(toks_np)

opt = SGD(BB.LR)
step_fn = make_train_step(model, opt, loss_fn=lm_loss)
def md_step(params):
    params, _, loss = step_fn(params, None, toks, toks)
    return params, loss._data

@jax.jit
def jax_step_c(p):
    loss, g = jax.value_and_grad(BB._twin_loss)(p, toks_j)
    return jax.tree.map(lambda w, gw: w - BB.LR * gw.astype(w.dtype), p, g), loss
def jax_step(p): return jax_step_c(p)

probe = jnp.ones((8, 128), jnp.float32)
t_md, t_jax, ratio = BB._time_param_pair(md_step, params0, jax_step, raw0, probe)
n_params = sum(int(np.prod(t.shape)) for t in jax.tree.leaves(raw0))
flops = int(6 * n_params * BB.BATCH * BB.SEQ
            + 3.5 * 4 * BB.BATCH * BB.HEADS * BB.SEQ * BB.SEQ * (BB.DIM // BB.HEADS) / 2)
print(json.dumps({"ratio": round(ratio, 4),
                  "md_ms": round(t_md * 1e3, 3),
                  "jax_ms": round(t_jax * 1e3, 3),
                  "tflops": round(flops / t_md / 1e12, 2)}))
