"""Overfit probe: can the flagship model memorize ONE batch?

The round-2 quality run barely learned (val 18.27 -> 18.13 over 29
epochs). Before blaming the recipe, this isolates capability: G=1 stacks
(contrastive off), one fixed batch, high LR, no grad accumulation, and
~thousands of optimizer updates via the scanned trainer (one dispatch per
SCAN steps — per-step dispatch over the remote-TPU tunnel would dominate).

If spectral loss collapses (and SNR climbs), the architecture + gradients
are fine and the quality-run problem is optimization scale (it made ~145
optimizer updates total). If it plateaus near the zero-predictor baseline,
there is a modeling bug worth hunting.

Prints one JSON line per probe stage; artifacts in --out.

Usage: python benchmarks/overfit_probe.py [--steps N] [--lr F] [--temp F]
       [--vertices N --hidden C --layers L]  # capacity axes (default
           # 20/64/6, the reference architecture); --vertices 32 probes
           # learning on the 41,448-simplex hierarchy the reference's
           # dynamic-sparse design cannot train. Artifacts keyed by axes.
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache"))
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1.0")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES", "0")

import jax
import jax.numpy as jnp
import numpy as np


def _arg(name, default, cast=float):
    if name in sys.argv:
        return cast(sys.argv[sys.argv.index(name) + 1])
    return default


def main() -> None:
    from topo_audio_autoencoder_tpu.data import synth_corpus
    from topo_audio_autoencoder_tpu.models import AudioAutoencoder
    from topo_audio_autoencoder_tpu.ops.stft import spectral_distance
    from topo_audio_autoencoder_tpu.training import (
        create_train_state,
        make_optimizer,
        make_scan_train_step,
        make_train_step,
    )

    steps = int(_arg("--steps", 2000))
    scan = int(_arg("--scan", 100))
    lr = _arg("--lr", 1e-3)
    temp_v = _arg("--temp", 1.0)
    n_vertices = int(_arg("--vertices", 20))
    hidden = int(_arg("--hidden", 64))
    layers = int(_arg("--layers", 6))
    b, t = 8, 64000
    out = Path("benchmarks/probe_out")
    out.mkdir(parents=True, exist_ok=True)

    def emit(**kw):
        print(json.dumps(kw), flush=True)

    on_tpu = jax.default_backend() != "cpu"
    model = AudioAutoencoder.create(
        num_vertices=n_vertices, num_bands=16, sccn_hidden_dim=hidden,
        n_sccn_layers=layers,
        # Match full_recipe.py: scale the active-vertex ceiling with n so a
        # larger hierarchy is not penalized down to the flagship's size.
        max_active_vertices=n_vertices,
    )
    opt = make_optimizer(
        encoder_lr=lr, decoder_lr=lr, accumulate_grad_batches=1
    )
    state = create_train_state(model, opt, jax.random.PRNGKey(0), (1, 1, t))
    step = make_train_step(
        model, opt,
        compute_dtype=jnp.bfloat16 if on_tpu else jnp.float32,
        with_grad_norms=False, donate=False,
    )
    scan_step = make_scan_train_step(step, donate=True)

    corpus = synth_corpus(b, n_samples=t, seed=0)
    batch = jnp.asarray(corpus)[:, None, None, :]  # [B, G=1, 1, T]
    key = jax.random.PRNGKey(7)
    temp = jnp.asarray(temp_v)

    # Reference points: the loss a zero-predictor and the initial model get.
    @jax.jit
    def recon_stats(params, x):
        o = model.apply(params, x[:, 0], 1.0, None, False)
        err = (o.waveform - x[:, 0]).astype(jnp.float32)
        sig = x[:, 0].astype(jnp.float32)
        snr = 10.0 * jnp.log10(
            jnp.sum(sig**2) / jnp.maximum(jnp.sum(err**2), 1e-12)
        )
        spec = spectral_distance(
            o.waveform[:, 0].astype(jnp.float32), sig[:, 0]
        ).mean()
        return spec, snr

    # "Wrong answer" scale reference: spectral distance when the model
    # outputs a DIFFERENT corpus clip (recon-first arg order as in
    # losses.py — the linear term normalizes by recon energy, so a
    # zero-predictor baseline is degenerate here).
    wrong_loss = float(
        jax.jit(
            lambda x: spectral_distance(jnp.roll(x, 1, axis=0), x).mean()
        )(jnp.asarray(corpus))
    )
    l0, snr0 = (float(v) for v in jax.device_get(recon_stats(state.params, batch)))
    emit(stage="init", wrong_clip_spectral=round(wrong_loss, 4),
         init_spectral=round(l0, 4), init_snr_db=round(snr0, 3))

    t0 = time.time()
    curve = []
    batches = jnp.broadcast_to(batch, (scan,) + batch.shape)
    for s in range(0, steps, scan):
        state, metrics = scan_step(state, batches, temp, key)
        spect = np.asarray(jax.device_get(metrics["spectral_loss"]))
        curve.extend(float(x) for x in spect)
        emit(stage="seg", step=s + scan, spectral=round(float(spect[-1]), 4),
             total=round(float(np.asarray(jax.device_get(metrics['total_loss']))[-1]), 4),
             elapsed_s=round(time.time() - t0, 1))

    l1, snr1 = (float(v) for v in jax.device_get(recon_stats(state.params, batch)))
    emit(stage="done", steps=steps, lr=lr, temp=temp_v,
         vertices=n_vertices, hidden=hidden, layers=layers,
         spectral_start=round(curve[0], 4), spectral_end=round(curve[-1], 4),
         drop_pct=round(100 * (1 - curve[-1] / curve[0]), 1),
         final_snr_db=round(snr1, 3), init_snr_db=round(snr0, 3),
         wrong_clip_spectral=round(wrong_loss, 4),
         seconds=round(time.time() - t0, 1))
    tag = (
        "" if (n_vertices, hidden, layers) == (20, 64, 6)
        else f"_n{n_vertices}_c{hidden}_l{layers}"
    )
    (out / f"overfit_curve{tag}.json").write_text(json.dumps(
        {"lr": lr, "temp": temp_v, "vertices": n_vertices, "hidden": hidden,
         "layers": layers, "spectral": curve}))


if __name__ == "__main__":
    main()
