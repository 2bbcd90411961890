"""A/B step-level benchmarks driving round-2 defaults (VERDICT r1 items 3/7/9).

Each experiment times the FULL jitted train step (fwd+bwd+opt, bf16 on TPU)
with exactly one knob flipped, same batch, 20+ iters, one process:

  rectifier : membership-matmul vs static-face-gather contraction
  sampler   : pure-JAX threefry vs fused Pallas on-chip-PRNG relaxation
  n32       : n=20 vs n=32 vertices (table build + step + HBM check)

Usage: python benchmarks/ab.py [rectifier|sampler|n32 ...]
Prints one JSON line per measurement.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

T = 64000
ITERS = 20


def _emit(**kw):
    print(json.dumps({k: (round(v, 4) if isinstance(v, float) else v) for k, v in kw.items()}), flush=True)


def _step_time(model, batch_size=128, group=3, iters=ITERS):
    from topo_audio_autoencoder_tpu.training import (
        create_train_state, make_optimizer, make_train_step,
    )

    on_tpu = jax.default_backend() != "cpu"
    opt = make_optimizer(accumulate_grad_batches=1)
    state = create_train_state(model, opt, jax.random.PRNGKey(0), (1, 1, T))
    step = make_train_step(
        model, opt,
        compute_dtype=jnp.bfloat16 if on_tpu else jnp.float32,
        donate=False,
    )
    batch = jnp.asarray(
        np.random.default_rng(0).standard_normal(
            (batch_size, group, 1, T), dtype=np.float32
        )
    )
    temp = jnp.asarray(1.0)
    rng = jax.random.PRNGKey(7)
    from topo_audio_autoencoder_tpu.utils import chain_time

    def make_step():
        carry = {"s": state}

        def run(i):
            carry["s"], metrics = step(carry["s"], batch, temp, rng)
            return metrics["total_loss"]

        return run

    return chain_time(make_step, k1=4, k2=max(8, iters))


def ab_rectifier():
    """Matmul vs gather rectifier contraction inside the full train step."""
    from topo_audio_autoencoder_tpu.models import AudioAutoencoder
    from topo_audio_autoencoder_tpu.topology import rectifier

    b = 128
    for method in ("matmul", "gather"):
        old = rectifier.DEFAULT_METHOD
        rectifier.DEFAULT_METHOD = method
        try:
            model = AudioAutoencoder.create(
                num_vertices=20, num_bands=16, sccn_hidden_dim=64
            )
            dt = _step_time(model, batch_size=b)
            _emit(ab="rectifier", method=method,
                  step_ms=dt * 1e3, clips_per_sec=b / dt)
        finally:
            rectifier.DEFAULT_METHOD = old


def ab_sampler():
    """Pure-JAX vs fused-Pallas stochastic relaxation, both samplers."""
    from topo_audio_autoencoder_tpu.models import AudioAutoencoder

    b = 128
    for sampler in ("gumbel", "hard_concrete"):
        for fused in (False, True):
            model = AudioAutoencoder.create(
                num_vertices=20, num_bands=16, sccn_hidden_dim=64,
                sampler=sampler, use_fused_sampler=fused,
            )
            dt = _step_time(model, batch_size=b)
            _emit(ab="sampler", sampler=sampler, fused=fused,
                  step_ms=dt * 1e3, clips_per_sec=b / dt)


def ab_n32():
    """Scale the complex to n=32 (32/496/4960/35960 = 41,448 simplices)."""
    from topo_audio_autoencoder_tpu.models import AudioAutoencoder
    from topo_audio_autoencoder_tpu.topology import build_tables

    for n, b in ((20, 32), (32, 32)):
        t0 = time.perf_counter()
        tables = build_tables(n)
        build_s = time.perf_counter() - t0
        model = AudioAutoencoder.create(
            num_vertices=n, num_bands=16, sccn_hidden_dim=64
        )
        dt = _step_time(model, batch_size=b)
        _emit(ab="n32", n=n, total_simplices=tables.total_simplices,
              table_build_s=build_s, step_ms=dt * 1e3, clips_per_sec=b / dt,
              batch=b)


if __name__ == "__main__":
    all_abs = {"rectifier": ab_rectifier, "sampler": ab_sampler, "n32": ab_n32}
    wanted = [a for a in sys.argv[1:] if a in all_abs] or list(all_abs)
    for key in wanted:
        try:
            all_abs[key]()
        except Exception as e:
            _emit(ab=key, error=str(e)[:300])
