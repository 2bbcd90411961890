"""The five driver-defined benchmark configs (BASELINE.json:6-12).

Each prints one JSON line; the repo-root ``bench.py`` remains the single
headline metric. Run: ``python benchmarks/run_all.py [--quick]``.

Configs:
1. batch=1 encoder -> HardConcrete -> complex_builder forward (golden ref)
2. full autoencoder fwd + recon loss, batch=8, vertices+edges only
3. jitted train step, topo-constraint loss + STE backward, batch=32
4. full synthetic-train epoch, precomputed distance cache on device, batch=128
5. data-parallel over all devices, full hierarchy, bf16 train step
"""

from __future__ import annotations

import json
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

T = 64000
QUICK = "--quick" in sys.argv


def _bench(fn, *args, iters=10, warmup=2):
    for _ in range(warmup):
        jax.block_until_ready(fn(*args))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters


def _emit(name, value, unit, extra=None):
    rec = {"config": name, "value": round(value, 4), "unit": unit}
    if extra:
        rec.update(extra)
    print(json.dumps(rec), flush=True)


def config0():
    """Encoder+SCCN(+decoder) forward p50 latency, batch 1 — the second
    BASELINE.json headline metric."""
    import numpy as np

    from topo_audio_autoencoder_tpu.models import AudioAutoencoder
    from topo_audio_autoencoder_tpu.utils import time_fn

    model = AudioAutoencoder.create(
        num_vertices=20, num_bands=16, sccn_hidden_dim=64
    )
    x = jnp.zeros((1, 1, T))
    params = model.jit_init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        x, 1.0, jax.random.PRNGKey(2), True,
    )

    @jax.jit
    def fwd(params, x):
        return model.apply(params, x, 1.0, None, False).waveform

    stats = time_fn(fwd, params, x, warmup=3, iters=30)
    _emit("0_fwd_p50_b1", stats["p50"] * 1e3, "ms", {"min_ms": round(stats["min"] * 1e3, 3)})


def config1():
    """Encoder->HardConcrete->operators forward, batch=1."""
    from topo_audio_autoencoder_tpu.models import AudioAutoencoder

    model = AudioAutoencoder.create(
        num_vertices=20, num_bands=16, sccn_hidden_dim=64,
        hard=True, sampler="hard_concrete",
    )
    x = jnp.zeros((1, 1, T))
    params = model.jit_init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        x, 1.0, jax.random.PRNGKey(2), True,
    )

    @jax.jit
    def encode(params, x, rng):
        return model.apply(
            params, x, 1.0, rng, False, method=lambda m, a, t_, r, tr: m.encode(a, t_, r, tr)
        ).ops.adj0

    dt = _bench(encode, params, x, jax.random.PRNGKey(3))
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
        return total

    dt = _bench(fwd, params, x)
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

    def run(state, batch, rng):
        s, m = step(state, batch, jnp.asarray(1.0), rng)
        return m["total_loss"]

    dt = _bench(run, state, batch, jax.random.PRNGKey(2))
    _emit(f"3_train_step_b{b}_hard", b / dt, "clips/s")


def config4():
    """One training epoch over a synthetic corpus with on-device distance
    cache, batch=128 (32 in --quick). Device-resident corpus: steps
    receive [B, G] index matrices, waveform gathers happen in HBM."""
    from topo_audio_autoencoder_tpu.data import (
        NSynthDataset, compute_distances, index_iterator, synth_corpus,
    )
    from topo_audio_autoencoder_tpu.models import AudioAutoencoder
    from topo_audio_autoencoder_tpu.training import (
        anneal_temperature, create_train_state, make_indexed_train_step,
        make_optimizer,
    )

    from topo_audio_autoencoder_tpu.data import ContrastiveConfig

    n, b = (128, 32) if QUICK else (512, 128)
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
        model, opt, jnp.asarray(corpus), donate=False
    )

    temp = anneal_temperature(0)
    # warmup compile on first batch shape
    first = next(iter(index_iterator(ds, b)))
    state, _ = step(state, jnp.asarray(first), temp, jax.random.PRNGKey(1))
    jax.block_until_ready(state.params)

    t0 = time.perf_counter()
    count = 0
    for i, idxs in enumerate(index_iterator(ds, b)):
        state, m = step(state, jnp.asarray(idxs), temp, jax.random.PRNGKey(i))
        count += b
    jax.block_until_ready(state.params)
    dt = time.perf_counter() - t0
    _emit(
        f"4_epoch_b{b}", count / dt, "clips/s",
        {"precompute_s": round(precompute_s, 2), "corpus": n},
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

    def run(state, batch, rng):
        with mesh:
            s, m = step(state, batch, jnp.asarray(1.0), rng)
        return m["total_loss"]

    dt = _bench(run, state, batch, jax.random.PRNGKey(2))
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
