"""A/B the fused SCCN message-combine kernel vs the XLA composition.

Flagship rank-3 shape: rows = B*G * S_3 = 384 * 4845, C = 64, M = 2
(same-rank + low-to-high). Times fwd alone and fwd+bwd (value_and_grad)
for both implementations via the chain-length slope.

Usage: python benchmarks/ab_combine.py [--rows N] [--m M]
"""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
_CACHE = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache")
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", _CACHE)
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1.0")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES", "0")

import jax, jax.numpy as jnp, numpy as np
jax.config.update("jax_compilation_cache_dir", _CACHE)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

from topo_audio_autoencoder_tpu.ops.sccn_combine import (
    fused_message_combine, message_combine_reference)
from topo_audio_autoencoder_tpu.utils import chain_time

T0 = time.time()
def log(m):
    print(f"[+{time.time()-T0:6.1f}s] {m}", flush=True)

def arg(name, default):
    return int(sys.argv[sys.argv.index(name) + 1]) if name in sys.argv else default

rows = arg("--rows", 384 * 4845)
m = arg("--m", 2)
c = 64
b, s = 384, rows // 384
rng = np.random.default_rng(0)
dt = jnp.bfloat16
car = jnp.asarray(rng.standard_normal((m, b, s, c)), dt)
x = jnp.asarray(rng.standard_normal((b, s, c)), dt)
v = jnp.asarray(rng.standard_normal((m, c, c)) * 0.1, dt)
w1 = jnp.asarray(rng.standard_normal((c, c)) * 0.1, dt)
b1 = jnp.zeros((c,), dt)
w2 = jnp.asarray(rng.standard_normal((c, 1)) * 0.1, dt)

def run(tag, fn):
    f = jax.jit(fn)
    log(f"compile {tag}...")
    f(car, x, v, w1, b1, w2)  # warm

    def mk():
        state = {"x": x}
        def step(i):
            out = f(car, state["x"], v, w1, b1, w2)
            state["x"] = out[0] if isinstance(out, tuple) else out
            return state["x"]
        return step

    dt_s = chain_time(mk, k1=3, k2=13, warmup=2)
    log(f"{tag}: {dt_s*1e3:.2f} ms")
    return dt_s

def fwd_fused(car, x, v, w1, b1, w2):
    return fused_message_combine(car, x, v, w1, b1, w2)

def fwd_ref(car, x, v, w1, b1, w2):
    return message_combine_reference(car, x, v, w1, b1, w2)

def fwd_einsum(car, x, v, w1, b1, w2):
    import jax.numpy as jnp
    msgs = jnp.einsum("mbsc,mcd->mbsd", car, v) + x[None]
    h = jax.nn.gelu(msgs @ w1 + b1)
    scores = (h @ w2).astype(jnp.float32)
    attn = jax.nn.softmax(scores, axis=0).astype(msgs.dtype)
    return (msgs * attn).sum(axis=0)

def fwd_seq(car, x, v, w1, b1, w2):
    """Round-2 style: per-message matmul+residual, stack at the end."""
    import jax.numpy as jnp
    msgs = [car[i] @ v[i] + x for i in range(car.shape[0])]
    stacked = jnp.stack(msgs)
    h = jax.nn.gelu(stacked @ w1 + b1)
    scores = (h @ w2).astype(jnp.float32)
    attn = jax.nn.softmax(scores, axis=0).astype(stacked.dtype)
    return (stacked * attn).sum(axis=0)

def grad_of(fn):
    def g(car, x, v, w1, b1, w2):
        def loss(xx, vv, ww1, bb1, ww2):
            return fn(car, xx, vv, ww1, bb1, ww2).astype(jnp.float32).sum()
        val, grads = jax.value_and_grad(loss, argnums=(0, 1, 2, 3, 4))(
            x, v, w1, b1, w2)
        return grads[0] + x * 0 + val.astype(x.dtype)  # chain through dx
    return g

if "--variants" in sys.argv:
    for tag, fn in (("perdot", fwd_ref), ("einsum", fwd_einsum), ("seq", fwd_seq)):
        run(f"{tag} f+b ", grad_of(fn))
else:
    r_fwd = run("ref fwd   ", fwd_ref)
    f_fwd = run("fused fwd ", fwd_fused)
    r_all = run("ref f+b   ", grad_of(fwd_ref))
    f_all = run("fused f+b ", grad_of(fwd_fused))
    log(f"fwd speedup {r_fwd/f_fwd:.2f}x | f+b speedup {r_all/f_all:.2f}x")
