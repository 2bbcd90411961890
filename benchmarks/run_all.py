"""The five driver-defined benchmark configs (BASELINE.json:6-12).

Each prints one JSON line; the repo-root ``bench.py`` remains the single
headline metric. Run: ``python benchmarks/run_all.py [--quick]``.

Timing methodology (round 2): ``block_until_ready`` returns early over the
remote-TPU tunnel (see utils/profiling.fetch_scalar), so every config is
measured as a CHAIN of sequentially-dependent jitted calls terminated by a
scalar fetch, and per-call time is the slope between two chain lengths
(utils.chain_time) — dispatch and fetch round-trips cancel. Round-1 numbers
predate this fix and timed dispatch, not compute.

Configs:
1. batch=1 encoder -> HardConcrete -> complex_builder forward (golden ref)
2. full autoencoder fwd + recon loss, batch=8, vertices+edges only
3. jitted train step, topo-constraint loss + STE backward, batch=32
4. full synthetic-train epoch, precomputed distance cache on device, batch=128
5. data-parallel over all devices, full hierarchy, bf16 train step
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
QUICK = "--quick" in sys.argv


def _chain(make_step, k1=4, k2=16):
    from topo_audio_autoencoder_tpu.utils import chain_time

    return chain_time(make_step, k1=k1, k2=k2)


def _emit(name, value, unit, extra=None):
    rec = {"config": name, "value": round(value, 4), "unit": unit}
    if extra:
        rec.update(extra)
    print(json.dumps(rec), flush=True)


def config0():
    """Encoder+SCCN(+decoder) forward latency, batch 1 — the second
    BASELINE.json headline metric. value = slope-derived device ms/call;
    e2e_p50_ms additionally includes the host<->device round trip."""
    from topo_audio_autoencoder_tpu.models import AudioAutoencoder
    from topo_audio_autoencoder_tpu.utils import time_fn

    model = AudioAutoencoder.create(
        num_vertices=20, num_bands=16, sccn_hidden_dim=64
    )
    x = jax.random.normal(jax.random.PRNGKey(5), (1, 1, T)) * 0.1
    params = model.jit_init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        x, 1.0, jax.random.PRNGKey(2), True,
    )

    @jax.jit
    def fwd(params, x):
        # output feeds the next call: sequentially-dependent chain
        return jnp.tanh(model.apply(params, x, 1.0, None, False).waveform)

    def make_step():
        carry = {"x": x}

        def step(i):
            carry["x"] = fwd(params, carry["x"])
            return carry["x"]

        return step

    dt = _chain(make_step, k1=5, k2=25)
    e2e = time_fn(fwd, params, x, warmup=2, iters=10)
    _emit(
        "0_fwd_b1", dt * 1e3, "ms",
        {"e2e_p50_ms": round(e2e["p50"] * 1e3, 3)},
    )


def config1():
    """Encoder->HardConcrete->operators forward, batch=1."""
    from topo_audio_autoencoder_tpu.models import AudioAutoencoder

    model = AudioAutoencoder.create(
        num_vertices=20, num_bands=16, sccn_hidden_dim=64,
        hard=True, sampler="hard_concrete",
    )
    x = jax.random.normal(jax.random.PRNGKey(5), (1, 1, T)) * 0.1
    params = model.jit_init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        x, 1.0, jax.random.PRNGKey(2), True,
    )

    @jax.jit
    def encode(params, x, rng):
        enc = model.apply(
            params, x, 1.0, rng, False,
            method=lambda m, a, t_, r, tr: m.encode(a, t_, r, tr),
        )
        # fold a scalar of the output into the next input: dependency chain
        return x + 0.0 * enc.probs.vertices.sum()

    def make_step():
        carry = {"x": x}

        def step(i):
            carry["x"] = encode(params, carry["x"], jax.random.PRNGKey(3))
            return carry["x"]

        return step

    dt = _chain(make_step, k1=5, k2=25)
    _emit("1_encoder_forward_b1", dt * 1e3, "ms/clip")


def config2():
    """Full autoencoder fwd + loss, batch=8, vertices+edges only."""
    from topo_audio_autoencoder_tpu.models import AudioAutoencoder
    from topo_audio_autoencoder_tpu.training.losses import autoencoder_loss

    model = AudioAutoencoder.create(
        num_vertices=20, num_bands=16, sccn_hidden_dim=64, max_rank=1
    )
    x = jax.random.normal(jax.random.PRNGKey(0), (8, 1, T)) * 0.1
    params = model.jit_init(
        {"params": jax.random.PRNGKey(1), "dropout": jax.random.PRNGKey(2)},
        x[:1], 1.0, jax.random.PRNGKey(3), True,
    )

    @jax.jit
    def fwd(params, x):
        out = model.apply(params, x, 1.0, None, False)
        total, _ = autoencoder_loss(out.waveform, x, out.aux, out.valid)
        return x + 0.0 * total

    def make_step():
        carry = {"x": x}

        def step(i):
            carry["x"] = fwd(params, carry["x"])
            return carry["x"]

        return step

    dt = _chain(make_step, k1=4, k2=16)
    _emit("2_full_forward_b8_rank1", 8 / dt, "clips/s")


def config3():
    """Jitted train step (STE backward through HardConcrete), batch=32."""
    from topo_audio_autoencoder_tpu.models import AudioAutoencoder
    from topo_audio_autoencoder_tpu.training import (
        create_train_state, make_optimizer, make_train_step,
    )

    b = 8 if QUICK else 32
    model = AudioAutoencoder.create(
        num_vertices=20, num_bands=16, sccn_hidden_dim=64,
        hard=True, sampler="hard_concrete",
    )
    opt = make_optimizer(accumulate_grad_batches=1)
    state = create_train_state(model, opt, jax.random.PRNGKey(0), (1, 1, T))
    step = make_train_step(model, opt, donate=False)
    batch = jax.random.normal(jax.random.PRNGKey(1), (b, 1, 1, T)) * 0.1
    rng = jax.random.PRNGKey(2)
    temp = jnp.asarray(1.0)

    def make_step():
        carry = {"s": state}

        def run(i):
            carry["s"], m = step(carry["s"], batch, temp, rng)
            return m["total_loss"]

        return run

    dt = _chain(make_step, k1=4, k2=16)
    _emit(f"3_train_step_b{b}_hard", b / dt, "clips/s")


def config4():
    """One training epoch over a synthetic corpus with on-device distance
    cache, batch=128 (32 in --quick). Device-resident corpus: steps
    receive [B, G] index matrices, waveform gathers happen in HBM.
    Wall-clock epoch time, terminated by a real scalar fetch."""
    from topo_audio_autoencoder_tpu.data import (
        ContrastiveConfig, NSynthDataset, compute_distances, index_iterator,
        prefetch_to_device, synth_corpus,
    )
    from topo_audio_autoencoder_tpu.models import AudioAutoencoder
    from topo_audio_autoencoder_tpu.training import (
        anneal_temperature, create_train_state, make_indexed_train_step,
        make_optimizer,
    )
    from topo_audio_autoencoder_tpu.utils import fetch_scalar

    n, b = (128, 32) if QUICK else (2048, 128)
    corpus = synth_corpus(n, T)
    t0 = time.perf_counter()
    dists = compute_distances(corpus, tile=64)
    precompute_s = time.perf_counter() - t0

    # at b=128 the full G=12 stack is a 1536-encode graph that overflows
    # the compile helper; 4 negatives keep the contrastive term at b=128
    cc = ContrastiveConfig(num_negative_samples=4 if b >= 128 else 10)
    ds = NSynthDataset(corpus, dists["neighbors"], train=True, config=cc)
    model = AudioAutoencoder.create(
        num_vertices=20, num_bands=16, sccn_hidden_dim=64
    )
    opt = make_optimizer(accumulate_grad_batches=1)
    state = create_train_state(model, opt, jax.random.PRNGKey(0), (1, 1, T))
    step = make_indexed_train_step(
        model, opt, jnp.asarray(corpus),
        compute_dtype=jnp.bfloat16 if jax.default_backend() != "cpu" else jnp.float32,
        donate=False,
    )

    temp = anneal_temperature(0)
    key = jax.random.PRNGKey(1)  # per-step keys fold in-jit from the step counter
    # warmup compile on first batch shape
    first = next(iter(index_iterator(ds, b)))
    state, m = step(state, jnp.asarray(first), temp, key)
    fetch_scalar(m["total_loss"])

    t0 = time.perf_counter()
    count = 0
    for idxs in prefetch_to_device(index_iterator(ds, b), 2):
        state, m = step(state, idxs, temp, key)
        count += b
    fetch_scalar(m["total_loss"])
    dt = time.perf_counter() - t0
    _emit(
        f"4_epoch_b{b}", count / dt, "clips/s",
        {"precompute_s": round(precompute_s, 2), "corpus": n,
         "steps": count // b},
    )


def config5():
    """Data-parallel bf16 train step over all devices, full hierarchy."""
    from topo_audio_autoencoder_tpu.models import AudioAutoencoder
    from topo_audio_autoencoder_tpu.parallel import make_mesh, replicate, shard_batch
    from topo_audio_autoencoder_tpu.training import (
        create_train_state, make_optimizer, make_train_step,
    )

    mesh = make_mesh()
    nd = mesh.devices.size
    per_device = 4 if QUICK else 16
    b = nd * per_device
    model = AudioAutoencoder.create(
        num_vertices=20, num_bands=16, sccn_hidden_dim=64
    )
    opt = make_optimizer(accumulate_grad_batches=1)
    state = create_train_state(model, opt, jax.random.PRNGKey(0), (1, 1, T))
    state = replicate(state, mesh)
    step = make_train_step(model, opt, compute_dtype=jnp.bfloat16, donate=False)
    batch = shard_batch(
        jax.random.normal(jax.random.PRNGKey(1), (b, 3, 1, T)) * 0.1, mesh
    )
    rng = jax.random.PRNGKey(2)
    temp = jnp.asarray(1.0)

    def make_step():
        carry = {"s": state}

        def run(i):
            with mesh:
                carry["s"], m = step(carry["s"], batch, temp, rng)
            return m["total_loss"]

        return run

    dt = _chain(make_step, k1=4, k2=16)
    _emit(
        f"5_dp{nd}_bf16_b{b}", b / dt, "clips/s",
        {"devices": nd, "per_chip": round(b / dt / nd, 2)},
    )


if __name__ == "__main__":
    all_cfgs = {
        "0": config0, "1": config1, "2": config2, "3": config3,
        "4": config4, "5": config5,
    }
    wanted = [a for a in sys.argv[1:] if a in all_cfgs] or list(all_cfgs)
    for key in wanted:
        try:
            all_cfgs[key]()
        except Exception as e:  # keep the suite running
            _emit(all_cfgs[key].__name__, -1, "error", {"error": str(e)[:200]})
