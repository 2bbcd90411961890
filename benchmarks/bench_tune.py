"""Measure the vmapped grid-tune stage in isolation (device-corpus path).

The 2048-corpus quality run's tune stage (8 combos x 5 epochs x 256 grid
steps at b=8 G=12) measured 3,396 s with the array path: every grid step
shipped a [8, 12, 1, 64000] float32 batch (~25 MB) over the remote-TPU
tunnel — ~100 GB of H2D for ~130 s of device compute. The device-corpus
tuner (tuner.py::VmappedGridTuner.tune with ``corpus=``) ships [8, 12]
int32 indices instead and gathers rows in HBM, optionally fusing
``--scan`` grid steps into one lax.scan dispatch like the production
trainer epoch.

Neighbors are synthetic permutations (the tune-stage compute is identical;
the O(N^2) distance precompute is benchmarked separately in run_all.py).

Usage: python benchmarks/bench_tune.py [--corpus N] [--scan K] [--epochs E]
       [--batch B] [--array]   # --array: the old host-batch path, for A/B
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def _arg(name, default, cast=int):
    if name in sys.argv:
        return cast(sys.argv[sys.argv.index(name) + 1])
    return default


def main() -> None:
    from topo_audio_autoencoder_tpu.data import (
        ContrastiveConfig,
        NSynthDataset,
        batch_iterator,
        index_iterator,
        synth_corpus,
    )
    from topo_audio_autoencoder_tpu.models import AudioAutoencoder
    from topo_audio_autoencoder_tpu.training.tuner import VmappedGridTuner
    from topo_audio_autoencoder_tpu.utils import wait_for_backend

    n = _arg("--corpus", 2048)
    scan = _arg("--scan", 16)
    epochs = _arg("--epochs", 5)
    batch = _arg("--batch", 8)
    array_path = "--array" in sys.argv

    def emit(**kw):
        print(json.dumps(kw), flush=True)

    if not wait_for_backend(600.0):
        emit(stage="outage", error="TPU backend unreachable")
        return

    t = 64000
    corpus = synth_corpus(n + n // 4, n_samples=t, seed=0)
    train_wavs, val_wavs = corpus[:n], corpus[n:]
    rng = np.random.default_rng(0)
    neighbors = np.stack(
        [rng.permutation(np.delete(np.arange(n), i)) for i in range(n)]
    ).astype(np.int32)
    train = NSynthDataset(
        train_wavs, neighbors, train=True, config=ContrastiveConfig()
    )
    val = NSynthDataset(val_wavs, train=False)

    model = AudioAutoencoder.create(
        num_vertices=20, num_bands=16, sccn_hidden_dim=64, n_sccn_layers=6
    )
    import jax.numpy as jnp

    grid = {
        "encoder_lr": [1e-3, 5e-4],
        "decoder_lr": [1e-3, 3e-4],
        "complexity_penalty": [0.05, 0.1],
    }
    tuner = VmappedGridTuner(model, compute_dtype=jnp.bfloat16)
    t0 = time.perf_counter()
    if array_path:
        result = tuner.tune(
            grid,
            train_batches=lambda e: batch_iterator(train, batch, epoch=e),
            val_batches=lambda: batch_iterator(val, batch, shuffle=False),
            epochs=epochs,
        )
        mode = "array"
    else:
        result = tuner.tune(
            grid,
            train_batches=lambda e: index_iterator(train, batch, epoch=e),
            val_batches=lambda: index_iterator(val, batch, shuffle=False),
            corpus=train.waveforms,
            val_corpus=val.waveforms,
            scan_steps=scan,
            epochs=epochs,
        )
        mode = f"indexed scan={scan}"
    dt = time.perf_counter() - t0
    steps = epochs * (n // batch)
    emit(
        stage="tune",
        mode=mode,
        corpus=n,
        batch=batch,
        epochs=epochs,
        grid_steps=steps,
        seconds=round(dt, 2),
        steps_per_sec=round(steps / dt, 2),
        best=result["best_params"],
        val_losses=[round(v, 4) for v in result["val_losses"]],
    )


if __name__ == "__main__":
    main()
