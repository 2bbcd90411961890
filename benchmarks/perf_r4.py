"""Round-4 perf timebox: attack the flat step tail as a group (VERDICT #5).

One process, one A/B ladder at the flagship shape (n=20, b=128, G=3,
bf16 — the bench.py headline shape). Variants:

  base        single train step, tree-form optimizer (current headline)
  flat        single train step, flat_groups=True (per-group vector Adam:
              the xprof "optimizer, sampler, rectifier, misc ~25 ms" bucket
              contains dozens of sub-ms Adam leaf updates; fusing each
              group into ONE raveled vector collapses them)
  scan8       production path: make_scan_indexed_train_step, K=8 steps per
              dispatch with in-scan HBM corpus gather (what full_recipe.py
              actually runs) — amortizes per-program launch overhead
  scan8_flat  both

Per-step times via the chain-length slope (utils.chain_time — dispatch
and fetch cancel; the tunnel's block_until_ready lies). ±15% tunnel noise
applies BETWEEN processes; inside this one process, variant deltas are
meaningful at the ~2% level (measured round 3).

Writes one JSON line per variant to stdout and a summary to
benchmarks/PERF_R4.json.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

_CACHE_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache"
)
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", _CACHE_DIR)
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1.0")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES", "0")

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", _CACHE_DIR)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

from topo_audio_autoencoder_tpu.models import AudioAutoencoder
from topo_audio_autoencoder_tpu.training import (
    create_train_state,
    make_optimizer,
    make_train_step,
)
from topo_audio_autoencoder_tpu.training.train_step import (
    make_scan_indexed_train_step,
)
from topo_audio_autoencoder_tpu.utils import chain_time

B, G, T, K = 128, 3, 64000, 8
T0 = time.time()


def log(msg):
    print(f"[perf_r4 +{time.time() - T0:6.1f}s] {msg}", flush=True)


def measure_single(model, flat: bool, batch, dtype):
    opt = make_optimizer(accumulate_grad_batches=1, flat_groups=flat)
    state = create_train_state(model, opt, jax.random.PRNGKey(0), (1, 1, T))
    step = make_train_step(model, opt, compute_dtype=dtype, donate=False)
    temp, key = jnp.asarray(1.0), jax.random.PRNGKey(7)
    log(f"compiling single flat={flat}...")
    compiled = step.lower(state, batch, temp, key).compile()

    def make_step():
        carry = {"s": state}

        def go(i):
            carry["s"], m = compiled(carry["s"], batch, temp, key)
            return m["total_loss"]

        return go

    dt = chain_time(make_step, k1=5, k2=25)
    return dt


def measure_scan(model, flat: bool, corpus, dtype):
    opt = make_optimizer(accumulate_grad_batches=1, flat_groups=flat)
    state = create_train_state(model, opt, jax.random.PRNGKey(0), (1, 1, T))
    scan_step = make_scan_indexed_train_step(
        model, opt, corpus, compute_dtype=dtype, donate=False
    )
    rng = np.random.default_rng(0)
    idxs = jnp.asarray(
        rng.integers(0, corpus.shape[0], size=(K, B, G)), jnp.int32
    )
    temp, key = jnp.asarray(1.0), jax.random.PRNGKey(7)
    log(f"compiling scan{K} flat={flat} (runs on first call)...")

    def make_step():
        carry = {"s": state}

        def go(i):
            carry["s"], m = scan_step(carry["s"], idxs, temp, key)
            return m["total_loss"]

        return go

    # fewer chain links — each link is K steps
    dt = chain_time(make_step, k1=2, k2=6, warmup=2)
    return dt / K


def main():
    on_tpu = jax.default_backend() != "cpu"
    dtype = jnp.bfloat16 if on_tpu else jnp.float32
    model = AudioAutoencoder.create(
        num_vertices=20, num_bands=16, sccn_hidden_dim=64, n_sccn_layers=6
    )
    rng = np.random.default_rng(0)
    batch = jnp.asarray(rng.standard_normal((B, G, 1, T), dtype=np.float32))
    corpus = rng.standard_normal((512, T), dtype=np.float32)

    results = {}
    for name, fn in (
        ("base", lambda: measure_single(model, False, batch, dtype)),
        ("flat", lambda: measure_single(model, True, batch, dtype)),
        ("scan8", lambda: measure_scan(model, False, corpus, dtype)),
        ("scan8_flat", lambda: measure_scan(model, True, corpus, dtype)),
    ):
        try:
            dt = fn()
            results[name] = {
                "step_ms": round(dt * 1e3, 2),
                "clips_per_sec": round(B / dt, 1),
            }
        except Exception as e:
            results[name] = {"error": f"{type(e).__name__}: {e}"}
        print(json.dumps({name: results[name]}), flush=True)

    out = os.path.join(os.path.dirname(os.path.abspath(__file__)), "PERF_R4.json")
    with open(out, "w") as f:
        json.dump(results, f, indent=1)
    log(f"written {out}")


if __name__ == "__main__":
    main()
