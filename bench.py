"""Benchmark harness: train-step throughput on the flagship config.

Prints ONE JSON line:
    {"metric": ..., "value": N, "unit": ..., "vs_baseline": N, ...extras}

Headline metric: NSynth-shaped clips/sec/chip through the full jitted train
step — full 20-vertex complex hierarchy, 4 s @ 16 kHz clips, contrastive
G=3 stacks (anchor + positive + 1 negative; the smallest G with an active
InfoNCE term). The dataset's default training stack is G=12
(data/dataset.py ContrastiveConfig), so the same step is ALSO measured at
G=12 and reported in the extra fields — the encoder runs on B*G waveforms,
so G=12 clips/s is materially lower; both numbers are real, they answer
different questions (per-clip step cost vs full-curriculum step cost).

Extras ground the number in hardware terms (VERDICT r1 item 3):
- flops_per_step: XLA-compiled FLOPs from cost_analysis() (fwd+bwd+opt)
- tflops_per_sec and mfu vs the chip's bf16 peak (device_kind lookup)

vs_baseline is measured against the reference's CPU PyTorch throughput:
the reference publishes no numbers (BASELINE.md), so the baseline is the
measured torch-CPU proxy of the same compute graph
(benchmarks/reference_proxy_torch.py): 1.82 clips/s fwd+bwd.
"""

from __future__ import annotations

import json
import time

import jax
import jax.numpy as jnp
import numpy as np

REF_CLIPS_PER_SEC = 1.818

# bf16 peak FLOP/s per chip by device kind (public TPU specs).
PEAK_BF16 = {
    "TPU v2": 45e12,
    "TPU v3": 123e12,
    "TPU v4": 275e12,
    "TPU v5 lite": 197e12,
    "TPU v5e": 197e12,
    "TPU v5": 459e12,
    "TPU v5p": 459e12,
    "TPU v6 lite": 918e12,
    "TPU v6e": 918e12,
}


def _peak_flops() -> float | None:
    kind = jax.devices()[0].device_kind
    for name, peak in PEAK_BF16.items():
        if kind.lower().startswith(name.lower()):
            return peak
    return None


def _compiled_flops(fn, *args) -> float | None:
    """XLA's own FLOP count for the compiled step (cost_analysis)."""
    try:
        ca = jax.jit(fn).lower(*args).compile().cost_analysis()
        if isinstance(ca, (list, tuple)):
            ca = ca[0]
        return float(ca.get("flops", 0.0)) or None
    except Exception:
        return None


def _measure(train_step, state0, batch, temp, k1=5, k2=25):
    """True sec/step via the chain-length slope (utils.chain_time): the
    state chain makes steps sequentially dependent, the terminal scalar
    fetch forces real completion, and the slope cancels dispatch/fetch
    latency. (block_until_ready returns early over the remote-TPU tunnel —
    round-1 numbers timed dispatch, not compute; see utils/profiling.py.)
    """
    from topo_audio_autoencoder_tpu.utils import chain_time

    rng = jax.random.PRNGKey(7)

    def make_step():
        carry = {"s": state0}

        def step(i):
            carry["s"], metrics = train_step(carry["s"], batch, temp, rng)
            return metrics["total_loss"]

        return step

    return chain_time(make_step, k1=k1, k2=k2)


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
    temp = jnp.asarray(1.0)
    rng = np.random.default_rng(0)

    # --- headline: G=3 (minimal active InfoNCE) ---
    batch3 = jnp.asarray(
        rng.standard_normal((batch_size, 3, 1, t), dtype=np.float32)
    )
    dt3 = _measure(train_step, state, batch3, temp)
    clips3 = batch_size / dt3

    flops = _compiled_flops(
        lambda s, b, tp, r: train_step(s, b, tp, r),
        state, batch3, temp, jax.random.PRNGKey(0),
    )
    peak = _peak_flops() if on_tpu else None
    tflops = (flops / dt3 / 1e12) if flops else None
    mfu = (flops / dt3 / peak) if (flops and peak) else None

    # --- full-curriculum stack: G=12 at the dataset's default, b=32
    # (b=128*G12 = 1536 encodes/step overflows the remote compile helper) ---
    b12 = 32
    batch12 = jnp.asarray(
        rng.standard_normal((b12, 12, 1, t), dtype=np.float32)
    )
    dt12 = _measure(train_step, state, batch12, temp, k1=3, k2=10)
    clips12 = b12 / dt12

    extras = {
        "step_ms_b128_g3": round(dt3 * 1e3, 3),
        "g12_clips_per_sec_b32": round(clips12, 1),
        "g12_step_ms": round(dt12 * 1e3, 3),
    }
    if flops:
        extras["flops_per_step"] = float(f"{flops:.4g}")
    if tflops:
        extras["tflops_per_sec"] = round(tflops, 2)
    if mfu:
        extras["mfu"] = round(mfu, 4)
        extras["device_kind"] = jax.devices()[0].device_kind

    print(
        json.dumps(
            {
                "metric": "train_clips_per_sec_per_chip",
                "value": round(clips3, 3),
                "unit": "clips/s",
                "vs_baseline": round(clips3 / REF_CLIPS_PER_SEC, 2),
                **extras,
            }
        )
    )


if __name__ == "__main__":
    main()
