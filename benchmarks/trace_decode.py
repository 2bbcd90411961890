"""Capture a profiler trace of the decode hot path and print top HLO ops.

The sectional profiler (profile_step.py) shows gen+decode forward at
~262 ms/step b=128 while its known-big matmuls only explain ~20 ms; this
captures an xplane trace of the jitted decode forward and aggregates
per-HLO device times via xprof, to find the real hotspot.

Usage: python benchmarks/trace_decode.py [--dir /tmp/jax_trace_decode]
"""

from __future__ import annotations

import glob
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("PROTOCOL_BUFFERS_PYTHON_IMPLEMENTATION", "python")

import jax
import jax.numpy as jnp
import numpy as np

B = 128
G = 3
T = 64000


def capture(log_dir: str) -> None:
    from topo_audio_autoencoder_tpu.models import AudioAutoencoder
    from topo_audio_autoencoder_tpu.training import create_train_state, make_optimizer
    from topo_audio_autoencoder_tpu.training.train_step import _cast_tree
    from topo_audio_autoencoder_tpu.utils import fetch_scalar

    on_tpu = jax.default_backend() != "cpu"
    cdt = jnp.bfloat16 if on_tpu else jnp.float32
    model = AudioAutoencoder.create(
        num_vertices=20, num_bands=16, sccn_hidden_dim=64, n_sccn_layers=6
    )
    opt = make_optimizer(accumulate_grad_batches=1)
    state = create_train_state(model, opt, jax.random.PRNGKey(0), (1, 1, T))
    cast = jax.jit(lambda p: _cast_tree(p, cdt))(state.params)
    temp = jnp.asarray(1.0)
    key = jax.random.PRNGKey(3)
    logits = jnp.asarray(
        np.random.default_rng(0).standard_normal((B, 6195), dtype=np.float32)
    ).astype(cdt)

    @jax.jit
    def dec_fwd(lg):
        enc = model.apply(
            cast, lg, temp, key, True,
            method=lambda m, l, tp, r, tr: m.encoder.generate_complex(l, tp, r, tr),
        )
        wav = model.apply(
            cast, enc, T // model.num_bands, True,
            rngs={"dropout": key},
            method=lambda m, e, dl, tr: m.decode(e, dl, tr),
        )
        return lg + 0.0 * wav.sum().astype(lg.dtype)

    x = logits
    for _ in range(3):
        x = dec_fwd(x)
    fetch_scalar(x)

    jax.profiler.start_trace(log_dir)
    for _ in range(3):
        x = dec_fwd(x)
    fetch_scalar(x)
    jax.profiler.stop_trace()
    print(f"trace captured to {log_dir}", flush=True)


def analyze(log_dir: str, top: int = 25) -> None:
    from xprof.convert import raw_to_tool_data

    paths = sorted(glob.glob(f"{log_dir}/plugins/profile/*/*.xplane.pb"))
    if not paths:
        print(json.dumps({"error": f"no xplane.pb under {log_dir}"}))
        return
    names = raw_to_tool_data.xspace_to_tool_names([paths[-1]])
    print("tools:", names, flush=True)
    for tool in ("hlo_stats", "framework_op_stats"):
        if tool not in " ".join(names):
            continue
        data, ctype = raw_to_tool_data.xspace_to_tool_data([paths[-1]], tool, {})
        out = f"{log_dir}/{tool}.out"
        mode = "wb" if isinstance(data, bytes) else "w"
        with open(out, mode) as f:
            f.write(data)
        print(f"{tool}: wrote {out} ({ctype})", flush=True)


def capture_step(log_dir: str) -> None:
    """Trace the FULL jitted train step (fwd+bwd+opt) at the bench shape."""
    from topo_audio_autoencoder_tpu.models import AudioAutoencoder
    from topo_audio_autoencoder_tpu.training import (
        create_train_state, make_optimizer, make_train_step,
    )
    from topo_audio_autoencoder_tpu.utils import fetch_scalar

    on_tpu = jax.default_backend() != "cpu"
    cdt = jnp.bfloat16 if on_tpu else jnp.float32
    model = AudioAutoencoder.create(
        num_vertices=20, num_bands=16, sccn_hidden_dim=64, n_sccn_layers=6
    )
    opt = make_optimizer(accumulate_grad_batches=1)
    state = create_train_state(model, opt, jax.random.PRNGKey(0), (1, 1, T))
    step = make_train_step(model, opt, compute_dtype=cdt, donate=False)
    batch = jnp.asarray(
        np.random.default_rng(0).standard_normal((B, G, 1, T), dtype=np.float32)
    )
    temp = jnp.asarray(1.0)
    key = jax.random.PRNGKey(1)
    for _ in range(2):
        state, m = step(state, batch, temp, key)
    fetch_scalar(m["total_loss"])
    jax.profiler.start_trace(log_dir)
    for _ in range(2):
        state, m = step(state, batch, temp, key)
    fetch_scalar(m["total_loss"])
    jax.profiler.stop_trace()
    print(f"trace captured to {log_dir}", flush=True)


if __name__ == "__main__":
    full = "--step" in sys.argv
    log_dir = "/tmp/jax_trace_step" if full else "/tmp/jax_trace_decode"
    if "--dir" in sys.argv:
        log_dir = sys.argv[sys.argv.index("--dir") + 1]
    if "--analyze-only" not in sys.argv:
        (capture_step if full else capture)(log_dir)
    analyze(log_dir)
