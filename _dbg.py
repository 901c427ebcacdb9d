import time, sys
t0 = time.time()
def log(msg): print(f"[{time.time()-t0:7.1f}s] {msg}", flush=True)
import numpy as np, jax, jax.numpy as jnp
log("jax imported")
import minidiff_tpu as md
from minidiff_tpu.models import TransformerLM, generate_compiled
from benchmarks import decode_twin as T
log("imports done")
md.set_backend("xla")
model = TransformerLM(vocab_size=T.VOCAB, dim=T.DIM, num_heads=T.HEADS,
                      num_layers=T.LAYERS, max_seq_len=T.CACHE, dtype=md.bfloat16)
np.random.seed(0)
params = model.init()
log("params init")
raw = jax.tree.map(lambda t: t._data, params, is_leaf=lambda t: isinstance(t, md.Tensor))
prompt_np = np.random.RandomState(1).randint(1, T.VOCAB, size=(T.BATCH, T.PROMPT))
out = generate_compiled(model, params, md.Tensor(jnp.asarray(prompt_np)), T.NEW)
np.asarray(out.detach()); log("framework decode compiled+run")
tw = T.twin_decode(raw, jnp.asarray(prompt_np), T.NEW)
np.asarray(tw); log("twin compiled+run")
