"""n=32 scaling probe: train-step throughput on the 32-vertex hierarchy.

n=32 means 32 + 496 + 4,960 + 35,960 = 41,448 simplices (6.7x the
flagship n=20's 6,195) with a [35,960 x 4,960] tetra-triangle incidence
whose membership matrix is built in-graph from index tables (a baked
constant would blow the remote compile transport — topology/builder.py).
Round 2 made this configuration work end to end; this records a measured
number for it.

Usage: python benchmarks/bench_n32.py [--b N] [--g N]
"""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
_CACHE = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache")
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", _CACHE)
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1.0")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES", "0")

import json
import jax, jax.numpy as jnp, numpy as np
jax.config.update("jax_compilation_cache_dir", _CACHE)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

T0 = time.time()
def log(m):
    print(f"[+{time.time()-T0:6.1f}s] {m}", file=sys.stderr, flush=True)

def arg(name, default):
    return int(sys.argv[sys.argv.index(name) + 1]) if name in sys.argv else default

def main():
    from topo_audio_autoencoder_tpu.models import AudioAutoencoder
    from topo_audio_autoencoder_tpu.utils import wait_for_backend

    if not wait_for_backend(
        float(os.environ.get("BENCH_BACKEND_WAIT_SECS", "240")), log=log
    ):
        # Emit a parseable outage line rather than hanging ~23 min in our
        # own PJRT init (the pool-outage failure mode; see RESULTS.md).
        print(json.dumps({
            "metric": "n32_train_clips_per_sec", "value": 0.0,
            "unit": "clips/s", "error": "tpu_backend_unavailable",
        }), flush=True)
        return
    from topo_audio_autoencoder_tpu.training import (
        create_train_state, make_optimizer, make_train_step)
    from topo_audio_autoencoder_tpu.utils import chain_time

    b, g, t = arg("--b", 8), arg("--g", 3), 64000
    model = AudioAutoencoder.create(
        num_vertices=32, num_bands=16, sccn_hidden_dim=64, n_sccn_layers=6
    )
    opt = make_optimizer(accumulate_grad_batches=1)
    log("jit_init...")
    state = create_train_state(model, opt, jax.random.PRNGKey(0), (1, 1, t))
    on_tpu = jax.default_backend() != "cpu"
    step = make_train_step(
        model, opt,
        compute_dtype=jnp.bfloat16 if on_tpu else jnp.float32, donate=False,
    )
    rng = np.random.default_rng(0)
    batch = jnp.asarray(rng.standard_normal((b, g, 1, t), dtype=np.float32))
    temp = jnp.asarray(1.0)
    key = jax.random.PRNGKey(7)
    log(f"compile n=32 step (b={b}, G={g})...")
    compiled = step.lower(state, batch, temp, key).compile()
    log("measure...")

    def mk():
        carry = {"s": state}
        def run(i):
            carry["s"], m = compiled(carry["s"], batch, temp, key)
            return m["total_loss"]
        return run

    dt = chain_time(mk, k1=3, k2=13, warmup=2)
    flops = None
    try:
        ca = compiled.cost_analysis()
        if isinstance(ca, (list, tuple)):
            ca = ca[0]
        flops = float(ca.get("flops", 0.0)) or None
    except Exception:
        pass
    out = {
        "metric": "n32_train_clips_per_sec", "value": round(b / dt, 2),
        "unit": "clips/s", "step_ms": round(dt * 1e3, 2), "b": b, "g": g,
        "num_simplices": 32 + 496 + 4960 + 35960,
    }
    if flops:
        out["tflops_per_sec"] = round(flops / dt / 1e12, 1)
    print(json.dumps(out), flush=True)

if __name__ == "__main__":
    main()
