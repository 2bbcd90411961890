"""Trace the batch-1 encoder->complex forward (driver config 1).

Captures an xplane trace of the jitted b=1 'audio -> logits -> sampler ->
rectifier -> operators' path (BASELINE config 1, measured 12.4 ms round 2)
and prints per-source self-time aggregation, to decide whether the
latency is op-launch overhead or a few hot ops.

Usage: python benchmarks/trace_b1.py
"""
from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("PROTOCOL_BUFFERS_PYTHON_IMPLEMENTATION", "python")
_CACHE = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache")
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", _CACHE)

import jax
import jax.numpy as jnp
import numpy as np

LOG_DIR = "/tmp/jax_trace_b1"


def main() -> None:
    from topo_audio_autoencoder_tpu.models import AudioAutoencoder
    from topo_audio_autoencoder_tpu.training import create_train_state, make_optimizer
    from topo_audio_autoencoder_tpu.training.train_step import _cast_tree
    from topo_audio_autoencoder_tpu.utils import chain_time, fetch_scalar

    t = 64000
    model = AudioAutoencoder.create(
        num_vertices=20, num_bands=16, sccn_hidden_dim=64, n_sccn_layers=6
    )
    opt = make_optimizer(accumulate_grad_batches=1)
    state = create_train_state(model, opt, jax.random.PRNGKey(0), (1, 1, t))
    cdt = jnp.bfloat16 if jax.default_backend() != "cpu" else jnp.float32
    cast = jax.jit(lambda p: _cast_tree(p, cdt))(state.params)
    key = jax.random.PRNGKey(3)
    temp = jnp.asarray(1.0)
    x = jnp.asarray(
        np.random.default_rng(0).standard_normal((1, 1, t), dtype=np.float32)
    ).astype(cdt)

    @jax.jit
    def enc_fwd(xx):
        bands = jnp.swapaxes(model.pqmf.forward(xx), -1, -2)
        enc = model.apply(
            cast, bands, temp, key, True,
            rngs={"dropout": key},
            method=lambda m, b, tp, r, tr: m.encoder(b, tp, r, tr),
        )
        # scalar-chain output: feed something back at input scale
        return xx + 0.0 * enc.probs[0].sum().astype(xx.dtype)

    # honest per-call time via chained calls
    def mk():
        carry = {"x": x}

        def step(i):
            carry["x"] = enc_fwd(carry["x"])
            return carry["x"]

        return step

    dt = chain_time(mk, k1=5, k2=25)
    print(f"b=1 encoder fwd: {dt * 1e3:.2f} ms", flush=True)

    xx = x
    jax.profiler.start_trace(LOG_DIR)
    for _ in range(4):
        xx = enc_fwd(xx)
    fetch_scalar(xx)
    jax.profiler.stop_trace()
    print("trace captured", flush=True)

    # aggregate
    import glob, json, re
    from xprof.convert import raw_to_tool_data

    paths = sorted(glob.glob(f"{LOG_DIR}/plugins/profile/*/*.xplane.pb"))
    data, _ = raw_to_tool_data.xspace_to_tool_data([paths[-1]], "hlo_stats", {})
    d = json.loads(data)
    rows = d["rows"]

    def val(r, i):
        c = r["c"][i]
        return c.get("v") if isinstance(c, dict) else c

    tot = sum(float(val(r, 9) or 0) for r in rows)
    n_ops = sum(float(val(r, 6) or 0) for r in rows)
    print(f"device self-time/call: {tot / 4e3:.3f} ms over {n_ops / 4:.0f} op executions")
    agg = {}
    for r in rows:
        si = str(val(r, 25))
        m = re.search(r">([^<>]+?):(\d+)<", si)
        src = f"{m.group(1).split('/')[-1]}:{m.group(2)}" if m else "(none)"
        agg.setdefault(src, [0.0, 0])
        agg[src][0] += float(val(r, 9) or 0) / 4
        agg[src][1] += int(float(val(r, 6) or 0) / 4)
    for k, (v, n) in sorted(agg.items(), key=lambda kv: -kv[1][0])[:20]:
        print(f"{v / 1e3:7.3f} ms  n={n:4d}  {k}")


if __name__ == "__main__":
    main()
