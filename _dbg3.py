import time, numpy as np, jax, jax.numpy as jnp
t0=time.time()
def log(m): print(f"[{time.time()-t0:6.1f}s] {m}", flush=True)
import minidiff_tpu as md
md.set_backend("xla")
from minidiff_tpu.models import TransformerLM
from minidiff_tpu.models.decode import generate_compiled
model = TransformerLM(vocab_size=512, dim=1024, num_heads=8, num_layers=4,
                      max_seq_len=512, dtype=md.bfloat16)
np.random.seed(0); params = model.init()
log("init")
prompt = md.Tensor(np.random.RandomState(1).randint(1, 512, size=(8, 16)))
# few tokens first: small scan
out = generate_compiled(model, params, prompt, 2)
np.asarray(out.detach()); log("decode NEW=2 ok")
out = generate_compiled(model, params, prompt, 8)
np.asarray(out.detach()); log("decode NEW=8 ok")
out = generate_compiled(model, params, prompt, 128)
np.asarray(out.detach()); log("decode NEW=128 ok")
