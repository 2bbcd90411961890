"""Benchmark harness: train-step throughput on the flagship config.

Prints ONE JSON line to stdout:
    {"metric": ..., "value": N, "unit": ..., "vs_baseline": N, ...}

Headline metric: NSynth-shaped clips/sec/chip through the full jitted train
step — full 20-vertex complex hierarchy, 4 s @ 16 kHz clips, contrastive
G=3 stacks (anchor + positive + 1 negative; the smallest G with an active
InfoNCE term).

Driver-survivability design (round-2 postmortem: BENCH_r02 rc=124 twice —
three sequential remote AOT compiles and JSON only at the very end):
- The persistent compilation cache is enabled (same knobs as
  tests/conftest.py) BEFORE jax initializes, so a warm run skips the
  multi-minute remote compile entirely.
- Exactly ONE compile on the measurement path: the train step is
  AOT-compiled once via ``jit(...).lower(...).compile()`` and that same
  executable provides both the timed calls and ``cost_analysis()`` FLOPs
  (no second compile for MFU).
- The headline JSON line is printed and flushed IMMEDIATELY after the G=3
  measurement. Everything after it (the G=12 full-curriculum number, which
  needs its own compile) runs behind a wall-clock guard and writes to
  stderr + benchmarks/BENCH_extras.json — never a second stdout line, so a
  timeout mid-extras still leaves a parseable result.

Timing is chain-length-slope based (utils.chain_time): the state chain
makes steps sequentially dependent, a terminal device->host scalar fetch
forces true completion (``block_until_ready`` returns early over the
remote-TPU tunnel — round-1 numbers timed dispatch, not compute), and the
slope cancels the fixed dispatch+fetch round trip.

vs_baseline is measured against the reference's CPU PyTorch throughput:
the reference publishes no numbers (BASELINE.md), so the baseline is the
measured torch-CPU proxy of the same compute graph
(benchmarks/reference_proxy_torch.py): 1.82 clips/s fwd+bwd. The
measurement replaces the reference's hot loop (reference trainer.py:272-310).
"""

from __future__ import annotations

import json
import os
import sys
import time

T_START = time.time()
# Wall-clock budget for OPTIONAL extras (the G=12 compile). The headline
# is never gated on this; set BENCH_BUDGET_SECS=0 to skip extras entirely.
EXTRAS_BUDGET_SECS = float(os.environ.get("BENCH_BUDGET_SECS", "300"))

_CACHE_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)), ".jax_cache")
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", _CACHE_DIR)
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1.0")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES", "0")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

# The axon site plugin configures jax programmatically at startup and can
# beat env vars — re-apply the cache knobs through the config API too.
jax.config.update("jax_compilation_cache_dir", _CACHE_DIR)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

REF_CLIPS_PER_SEC = 1.818
_HEADLINE_EMITTED = [False]

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


def _log(msg: str) -> None:
    print(f"[bench +{time.time() - T_START:6.1f}s] {msg}", file=sys.stderr, flush=True)




def _measure_compiled(compiled, state0, batch, temp, key, k1=5, k2=25):
    """sec/step of an AOT-compiled step via the chain-length slope."""
    from topo_audio_autoencoder_tpu.utils import chain_time

    def make_step():
        carry = {"s": state0}

        def step(i):
            carry["s"], metrics = compiled(carry["s"], batch, temp, key)
            return metrics["total_loss"]

        return step

    return chain_time(make_step, k1=k1, k2=k2)


def _emit_outage_line(reason: str) -> None:
    """Last-resort stdout line when the backend is unreachable.

    An honest zero with an error marker beats rc=124 with no output: the
    driver still records a parseable line, and the error field plus the
    last-measured band (benchmarks/RESULTS.md) make the cause auditable.
    """
    print(
        json.dumps(
            {
                "metric": "train_clips_per_sec_per_chip",
                "value": 0.0,
                "unit": "clips/s",
                "vs_baseline": 0.0,
                "error": reason,
                "last_measured_band_clips_per_sec": [799, 844],
                "note": "TPU pool unreachable at bench time; see benchmarks/RESULTS.md infrastructure note",
            }
        ),
        flush=True,
    )


def main() -> None:
    # Transient-outage insurance: wait out a wedged/unavailable tunnel
    # (bounded) instead of crashing with no stdout line. If the pool is
    # still down after the budget, emit the outage line and exit — our
    # own PJRT init would otherwise hang ~23 min with nothing on stdout.
    from topo_audio_autoencoder_tpu.utils import wait_for_backend

    wait = float(os.environ.get("BENCH_BACKEND_WAIT_SECS", "240"))
    if wait > 0 and not wait_for_backend(wait, log=_log):
        _emit_outage_line("tpu_backend_unavailable")
        return
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
    _log("init params (jit_init)...")
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
    key = jax.random.PRNGKey(7)
    rng = np.random.default_rng(0)

    # --- headline: G=3 (minimal active InfoNCE), ONE compile ---
    batch3 = jnp.asarray(
        rng.standard_normal((batch_size, 3, 1, t), dtype=np.float32)
    )
    _log("compiling G=3 train step (AOT, persistent cache enabled)...")
    compiled3 = train_step.lower(state, batch3, temp, key).compile()
    _log("compiled; measuring...")
    dt3 = _measure_compiled(compiled3, state, batch3, temp, key)
    clips3 = batch_size / dt3
    _log(f"measured: {dt3 * 1e3:.1f} ms/step; cost_analysis...")

    # FLOPs from the SAME executable — no extra compile.
    flops = None
    try:
        ca = compiled3.cost_analysis()
        if isinstance(ca, (list, tuple)):
            ca = ca[0]
        flops = float(ca.get("flops", 0.0)) or None
    except Exception as e:  # headline must survive any extras failure
        _log(f"cost_analysis unavailable: {e!r}")
    peak = _peak_flops() if on_tpu else None
    tflops = (flops / dt3 / 1e12) if flops else None
    mfu = (flops / dt3 / peak) if (flops and peak) else None

    headline = {
        "metric": "train_clips_per_sec_per_chip",
        "value": round(clips3, 3),
        "unit": "clips/s",
        "vs_baseline": round(clips3 / REF_CLIPS_PER_SEC, 2),
        "step_ms_b128_g3": round(dt3 * 1e3, 3),
    }
    if flops:
        headline["flops_per_step"] = float(f"{flops:.4g}")
    if tflops:
        headline["tflops_per_sec"] = round(tflops, 2)
    if mfu:
        headline["mfu"] = round(mfu, 4)
        headline["device_kind"] = jax.devices()[0].device_kind

    # THE stdout line — printed before any optional work.
    _HEADLINE_EMITTED[0] = True
    print(json.dumps(headline), flush=True)
    _log(f"headline emitted: {clips3:.0f} clips/s ({dt3 * 1e3:.1f} ms/step)")

    # --- optional extras: G=12 full-curriculum stack (its own compile) ---
    extras = dict(headline)
    out_path = os.path.join(
        os.path.dirname(os.path.abspath(__file__)),
        "benchmarks",
        "BENCH_extras.json",
    )

    def write_extras(note):
        extras["total_wallclock_s"] = round(time.time() - T_START, 1)
        with open(out_path, "w") as f:
            json.dump(extras, f, indent=1)
        _log(f"extras written to {out_path}: {note}")

    elapsed = time.time() - T_START
    if elapsed > EXTRAS_BUDGET_SECS:
        _log(f"skipping extras (elapsed {elapsed:.0f}s > budget {EXTRAS_BUDGET_SECS:.0f}s)")
        return
    try:
        b12 = 32
        batch12 = jnp.asarray(
            rng.standard_normal((b12, 12, 1, t), dtype=np.float32)
        )
        _log("compiling G=12 step...")
        compiled12 = train_step.lower(state, batch12, temp, key).compile()
        dt12 = _measure_compiled(
            compiled12, state, batch12, temp, key, k1=3, k2=10
        )
        extras["g12_clips_per_sec_b32"] = round(b12 / dt12, 1)
        extras["g12_step_ms"] = round(dt12 * 1e3, 3)
        write_extras(f"G=12 {b12 / dt12:.0f} clips/s")
    except Exception as e:
        _log(f"extras failed (headline already emitted): {e!r}")

    # --- extras 2: the n=32 quality-flagship shape (VERDICT r4 weak #1:
    # the science moved to n=32 — best val 12.466 — so BENCH_r* must
    # regression-guard that shape too, not only the n=20 headline). ---
    if time.time() - T_START > EXTRAS_BUDGET_SECS:
        _log("skipping n=32 extra (budget spent)")
        return
    try:
        b32 = 32
        model32 = AudioAutoencoder.create(
            num_vertices=32, num_bands=16, sccn_hidden_dim=64,
            n_sccn_layers=6, max_active_vertices=32,
        )
        _log("init n=32 params (jit_init)...")
        state32 = create_train_state(
            model32, optimizer, jax.random.PRNGKey(0), (1, 1, t)
        )
        step32 = make_train_step(
            model32,
            optimizer,
            compute_dtype=jnp.bfloat16 if on_tpu else jnp.float32,
            donate=False,
        )
        batch_n32 = jnp.asarray(
            rng.standard_normal((b32, 3, 1, t), dtype=np.float32)
        )
        _log("compiling n=32 G=3 step...")
        compiled_n32 = step32.lower(state32, batch_n32, temp, key).compile()
        dt32 = _measure_compiled(
            compiled_n32, state32, batch_n32, temp, key, k1=3, k2=10
        )
        extras["n32_step_ms_b32_g3"] = round(dt32 * 1e3, 3)
        extras["n32_clips_per_sec"] = round(b32 / dt32, 1)
        try:
            ca = compiled_n32.cost_analysis()
            if isinstance(ca, (list, tuple)):
                ca = ca[0]
            f32_ = float(ca.get("flops", 0.0)) or None
            if f32_ and peak:
                extras["n32_mfu"] = round(f32_ / dt32 / peak, 4)
        except Exception:
            pass
        write_extras(f"n=32 {dt32 * 1e3:.0f} ms/step")
    except Exception as e:
        _log(f"n=32 extra failed (headline already emitted): {e!r}")

    # --- extras 3: the PACKED n=32 step (topology/packed.py — the round-5
    # quality flagship trains this path: 8.9x the dense step and a better
    # best val, benchmarks/RESULTS.md "Packed training holds quality"). ---
    if time.time() - T_START > EXTRAS_BUDGET_SECS:
        _log("skipping packed extra (budget spent)")
        return
    try:
        packed32 = AudioAutoencoder.create(
            num_vertices=32, num_bands=16, sccn_hidden_dim=64,
            n_sccn_layers=6, max_active_vertices=32,
            pack_capacities=(0, 0, 512, 256),
        )
        _log("init packed n=32 params (jit_init)...")
        statep = create_train_state(
            packed32, optimizer, jax.random.PRNGKey(0), (1, 1, t)
        )
        stepp = make_train_step(
            packed32,
            optimizer,
            compute_dtype=jnp.bfloat16 if on_tpu else jnp.float32,
            donate=False,
        )
        _log("compiling packed n=32 G=3 step...")
        compiled_p = stepp.lower(statep, batch_n32, temp, key).compile()
        dtp = _measure_compiled(
            compiled_p, statep, batch_n32, temp, key, k1=3, k2=13
        )
        extras["n32_packed_step_ms_b32_g3"] = round(dtp * 1e3, 3)
        extras["n32_packed_clips_per_sec"] = round(b32 / dtp, 1)
        extras["n32_packed_speedup"] = round(dt32 / dtp, 2)
        write_extras(f"packed n=32 {dtp * 1e3:.1f} ms/step")
    except Exception as e:
        _log(f"packed extra failed (headline already emitted): {e!r}")


if __name__ == "__main__":
    try:
        main()
    except Exception as exc:
        _log(f"bench failed: {exc!r}")
        if not _HEADLINE_EMITTED[0]:  # never print a second stdout line
            _emit_outage_line(f"{type(exc).__name__}: {exc}")
        sys.exit(0)
