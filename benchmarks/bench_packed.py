"""A/B: dense masked-static vs static-capacity packed operators at n=32.

The VERDICT r4 frontier: the dense n=32 step pays factored products over
all 35,960 tetra rows while trained complexes end with ~28 active tetra
(~100x top-rank sparsity on the table). topology/packed.py re-wins the
reference's dynamic active slicing (complex_builder.py:47,57-59)
statically; this harness measures what that buys on the real step.

Measures, same batch/keys/chain protocol for each variant:
  dense    the n=32 dense train step (the 391 ms b=32 baseline)
  packed   pack_capacities=(0, 0, K2, K3) train step
and a decode-only A/B (the codec path, where packing is exact and the
attention memory shrinks from 41,416 to 496+K2+K3 keys).

Usage: python benchmarks/bench_packed.py [--n V] [--b N] [--g N]
       [--k2 N] [--k3 N]
       [--skip-dense]  # when the dense number is already on record
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


def measure_step(model, b, g, t, label):
    from topo_audio_autoencoder_tpu.training import (
        create_train_state, make_optimizer, make_train_step)
    from topo_audio_autoencoder_tpu.utils import chain_time

    opt = make_optimizer(accumulate_grad_batches=1)
    log(f"[{label}] jit_init...")
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
    log(f"[{label}] compile step (b={b}, G={g})...")
    compiled = step.lower(state, batch, temp, key).compile()
    log(f"[{label}] measure...")

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
    rec = {"variant": label, "step_ms": round(dt * 1e3, 2),
           "clips_per_sec": round(b / dt, 2)}
    if flops:
        rec["tflops_per_sec"] = round(flops / dt / 1e12, 2)
        rec["flops_per_step"] = float(f"{flops:.4g}")
    print(json.dumps(rec), flush=True)
    return dt, state


def measure_decode(model, params, t, label, batch=8):
    """Codec-path decode: thresholded sparse latent -> waveform."""
    from topo_audio_autoencoder_tpu.topology.rectifier import RectifiedProbs

    sizes = model.tables.sizes
    rng = np.random.default_rng(1)
    # ~trained-complex sparsity: 20/100/100/30 active per rank
    ranks = []
    for s, k in zip(sizes, (20, 100, 100, 30)):
        p = np.zeros((batch, s), np.float32)
        for bi in range(batch):
            p[bi, rng.choice(s, size=min(k, s), replace=False)] = 1.0
        ranks.append(jnp.asarray(p))
    probs = RectifiedProbs(*ranks)
    dec = jax.jit(
        lambda pr, par: model.apply(
            par, pr, t // 16, method=lambda m, a, d: m.decode_from_probs(a, d)
        )
    )
    log(f"[{label}] compile decode...")
    # decode has no state chain; serialize via the scalar fetch each call
    from topo_audio_autoencoder_tpu.utils import fetch_scalar

    w = dec(probs, params)
    fetch_scalar(w[0, 0, 0])  # warm
    reps = 10
    t0 = time.perf_counter()
    for _ in range(reps):
        w = dec(probs, params)
        fetch_scalar(w[0, 0, 0])
    dt = (time.perf_counter() - t0) / reps
    print(json.dumps({"variant": f"{label}_decode",
                      "decode_ms_b8": round(dt * 1e3, 2)}), flush=True)
    return dt


def main():
    from topo_audio_autoencoder_tpu.models import AudioAutoencoder
    from topo_audio_autoencoder_tpu.utils import wait_for_backend

    if not wait_for_backend(
        float(os.environ.get("BENCH_BACKEND_WAIT_SECS", "240")), log=log
    ):
        print(json.dumps({"metric": "packed_ab", "error": "tpu_backend_unavailable"}),
              flush=True)
        return
    n = arg("--n", 32)
    b, g, t = arg("--b", 32), arg("--g", 3), 64000
    k2, k3 = arg("--k2", 512), arg("--k3", 256)
    kw = dict(num_vertices=n, num_bands=16, sccn_hidden_dim=64,
              n_sccn_layers=6, max_active_vertices=n)

    results = {}
    if "--skip-dense" not in sys.argv:
        dense_model = AudioAutoencoder.create(**kw)
        dt_d, _ = measure_step(dense_model, b, g, t, "dense")
        results["dense_ms"] = dt_d * 1e3
    packed_model = AudioAutoencoder.create(**kw, pack_capacities=(0, 0, k2, k3))
    dt_p, state_p = measure_step(packed_model, b, g, t, f"packed_k{k2}_{k3}")
    results["packed_ms"] = dt_p * 1e3
    if "dense_ms" in results:
        print(json.dumps({
            "metric": "packed_speedup_train_step",
            "value": round(results["dense_ms"] / results["packed_ms"], 2),
            "unit": "x", "k2": k2, "k3": k3, "b": b, "g": g,
        }), flush=True)

    # decode A/B (exact-parity regime)
    params = state_p.params
    if "--skip-dense" not in sys.argv:
        measure_decode(AudioAutoencoder.create(**kw), params, t, "dense")
    measure_decode(packed_model, params, t, "packed")


if __name__ == "__main__":
    main()
