"""One-off: where does bench.py's 278 s measurement wall-clock go?

Times every phase of the chain_time protocol individually.
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

T0 = time.time()
def log(m):
    print(f"[+{time.time()-T0:6.1f}s] {m}", flush=True)

from topo_audio_autoencoder_tpu.models import AudioAutoencoder
from topo_audio_autoencoder_tpu.training import (
    create_train_state, make_optimizer, make_train_step)
from topo_audio_autoencoder_tpu.utils import fetch_scalar

model = AudioAutoencoder.create(num_vertices=20, num_bands=16,
                                sccn_hidden_dim=64, n_sccn_layers=6)
opt = make_optimizer(accumulate_grad_batches=1)
log("init...")
state = create_train_state(model, opt, jax.random.PRNGKey(0), (1, 1, 64000))
step = make_train_step(model, opt, compute_dtype=jnp.bfloat16, donate=False)
rng = np.random.default_rng(0)
batch = jnp.asarray(rng.standard_normal((128, 3, 1, 64000), dtype=np.float32))
temp = jnp.asarray(1.0); key = jax.random.PRNGKey(7)
log("lower+compile...")
compiled = step.lower(state, batch, temp, key).compile()
log("compiled")

def chain(k, tag):
    t0 = time.perf_counter()
    s = state; out = None
    per = []
    for i in range(k):
        ti = time.perf_counter()
        s, m = compiled(s, batch, temp, key)
        out = m["total_loss"]
        per.append(time.perf_counter() - ti)
    tf = time.perf_counter()
    fetch_scalar(out)
    tend = time.perf_counter()
    log(f"{tag}: k={k} dispatch={tf-t0:.2f}s (per-call {np.mean(per)*1e3:.0f} ms, "
        f"max {np.max(per)*1e3:.0f} ms) fetch={tend-tf:.2f}s total={tend-t0:.2f}s")
    return tend - t0

w = chain(3, "warmup")
t1 = chain(5, "run1 ")
t2 = chain(25, "run2 ")
log(f"slope = {(t2-t1)/20*1e3:.1f} ms/step")
