import time, numpy as np, jax, jax.numpy as jnp
t0=time.time()
def log(m): print(f"[{time.time()-t0:6.1f}s] {m}", flush=True)
# medium compile: 20-step scan over a 2-layer MLP
def body(c, _):
    w1, w2, x = c
    h = jnp.tanh(x @ w1)
    x2 = jnp.tanh(h @ w2)
    return (w1, w2, x2), jnp.sum(x2)
w1 = jnp.ones((512,512), jnp.bfloat16); w2 = jnp.ones((512,512), jnp.bfloat16)
x = jnp.ones((8,512), jnp.bfloat16)
f = jax.jit(lambda c: jax.lax.scan(body, c, jnp.arange(20)))
log("tracing")
out = f((w1,w2,x))
jax.block_until_ready(out)
log("scan compiled+ran")
