"""Jitted train/eval steps and the optimizer stack.

Implements the reference trainer's per-batch math (reference:
trainer.py:260-310) as one compiled function:

- Two-group Adam with separate encoder/decoder learning rates
  (trainer.py:80-87) via ``optax.multi_transform`` keyed on the top-level
  param tree.
- Gradient accumulation N (trainer.py:284-293) via ``optax.MultiSteps`` —
  the optimizer applies every N calls, matching loss/N scaling semantics.
- Global-norm clipping at 10 applied to the accumulated gradient
  (trainer.py:288), i.e. clipping sits *inside* the MultiSteps wrapper.
- Contrastive batch semantics per SURVEY §2.4.8: each item is a stack of
  [anchor, positive, negatives...] waveforms; all run through PQMF+encoder
  logits, InfoNCE over the logit rows, and only the anchor is decoded.
- Per-component gradient-norm telemetry (trainer.py:313-397) computed from
  the gradient tree inside the same jit.
- Optional bf16 compute policy: params + activations cast to bfloat16 for
  the forward/backward, fp32 master params and optimizer state. The
  rectifier and STFT keep their own fp32 islands (see those modules).
"""

from __future__ import annotations

import functools
from typing import Any, NamedTuple

import jax
import jax.numpy as jnp
import optax

from ..models.autoencoder import AudioAutoencoder
from ..models.encoder import info_nce_loss, rank_diversity_entropy, vertex_count_penalty
from ..ops.samplers import temperature_schedule
from .losses import LossWeights, autoencoder_loss


class TrainState(NamedTuple):
    params: Any
    opt_state: Any
    step: jnp.ndarray  # int32 micro-step counter


def make_optimizer(
    encoder_lr: float = 1e-3,
    decoder_lr: float = 1e-4,
    gradient_clip_val: float = 10.0,
    accumulate_grad_batches: int = 4,
    flat_groups: bool = False,
) -> optax.GradientTransformation:
    """clip -> {encoder: adam(lr_e), decoder: adam(lr_d)}, accumulated.

    ``flat_groups=True`` wraps each group's Adam in ``optax.flatten``: the
    ~100-leaf param tree updates as TWO fused vectors instead of dozens of
    sub-ms elementwise ops (the xprof "flat tail",
    benchmarks/RESULTS.md step-time table). Numerically identical
    (tests/test_training.py pins equality); OFF by default because the
    opt_state pytree changes shape, which breaks Orbax restore of
    checkpoints written with the unflattened layout.
    """

    def label_fn(params):
        def label_tree(tree, label):
            return jax.tree.map(lambda _: label, tree)

        return {
            "params": {
                k: label_tree(v, "encoder" if k == "encoder" else "decoder")
                for k, v in params["params"].items()
            }
        }

    wrap = optax.flatten if flat_groups else (lambda t: t)
    inner = optax.chain(
        optax.clip_by_global_norm(gradient_clip_val),
        optax.multi_transform(
            {
                "encoder": wrap(optax.adam(encoder_lr)),
                "decoder": wrap(optax.adam(decoder_lr)),
            },
            label_fn,
        ),
    )
    if accumulate_grad_batches > 1:
        inner = optax.MultiSteps(inner, every_k_schedule=accumulate_grad_batches)
    return inner


def create_train_state(
    model: AudioAutoencoder,
    optimizer: optax.GradientTransformation,
    rng: jax.Array,
    sample_shape: tuple[int, ...],
) -> TrainState:
    x = jnp.zeros(sample_shape, jnp.float32)
    prng, drng, srng = jax.random.split(rng, 3)
    params = model.jit_init({"params": prng, "dropout": drng}, x, 1.0, srng, True)
    return TrainState(
        params=params,
        opt_state=optimizer.init(params),
        step=jnp.zeros((), jnp.int32),
    )


def _cast_tree(tree, dtype):
    return jax.tree.map(
        lambda x: x.astype(dtype) if jnp.issubdtype(x.dtype, jnp.floating) else x,
        tree,
    )


def component_grad_norms(grads) -> dict:
    """Per-top-level-module L2 gradient norms (trainer.py:313-397)."""
    out = {}
    for part, tree in grads["params"].items():
        if isinstance(tree, dict):
            for name, sub in tree.items():
                leaves = jax.tree.leaves(sub)
                out[f"{part}/{name}"] = jnp.sqrt(
                    sum(jnp.sum(jnp.square(l)) for l in leaves)
                )
        else:
            out[part] = jnp.sqrt(jnp.sum(jnp.square(tree)))
    return out


def make_train_step(
    model: AudioAutoencoder,
    optimizer: optax.GradientTransformation,
    weights: LossWeights = LossWeights(),
    compute_dtype: jnp.dtype = jnp.float32,
    with_grad_norms: bool = False,
    donate: bool = True,
):
    """Build the jitted train step.

    Batch: [B, G, 1, T] — G-way contrastive stacks (G = 1 disables the
    contrastive term; G >= 3 required for InfoNCE).
    """

    def loss_fn(params, batch, temperature, rng):
        b, g, _, t = batch.shape
        srng, drng = jax.random.split(rng)
        cast_params = _cast_tree(params, compute_dtype)
        flat = batch.reshape(b * g, 1, t).astype(compute_dtype)

        # Encoder logits for ALL group members (contrastive needs them)...
        bands = model.pqmf.forward(flat)
        logits = model.apply(
            cast_params,
            jnp.swapaxes(bands, -1, -2),
            True,
            rngs={"dropout": drng},
            method=lambda m, x, tr: m.encoder.compute_logits(x, tr),
        )  # [B*G, S]

        contrastive = None
        if g >= 3:
            contrastive = info_nce_loss(
                logits.reshape(b, g, -1).astype(jnp.float32)
            )

        # ...then complex + decode for the anchors only.
        anchor_logits = logits.reshape(b, g, -1)[:, 0]
        enc = model.apply(
            cast_params,
            anchor_logits,
            temperature,
            srng,
            True,
            method=lambda m, l, tp, r, tr: m.encoder.generate_complex(l, tp, r, tr),
        )
        anchors = flat.reshape(b, g, 1, t)[:, 0]
        recon = model.apply(
            cast_params,
            enc,
            t // model.num_bands,
            True,
            rngs={"dropout": drng},
            method=lambda m, e, dl, tr: m.decode(e, dl, tr),
        )
        aux = {
            "binary_entropy": rank_diversity_entropy(enc.rectified),
            "diversity": vertex_count_penalty(
                enc.rectified.vertices,
                model.min_active_vertices,
                model.max_active_vertices,
            ),
            "l0": enc.l0,
        }
        total, components = autoencoder_loss(
            recon.astype(jnp.float32),
            anchors.astype(jnp.float32),
            {k: v.astype(jnp.float32) for k, v in aux.items()},
            enc.valid,
            weights,
            contrastive,
        )
        return total, components

    @functools.partial(jax.jit, donate_argnums=(0,) if donate else ())
    def train_step(state: TrainState, batch, temperature, rng):
        # Derive the per-step key INSIDE the jit from (base key, step
        # counter): the trainer passes one constant key per run instead of
        # an eager host-side split every step (~100 ms/dispatch over a
        # remote-TPU link), and resume determinism needs only (key, step).
        rng = jax.random.fold_in(rng, state.step)
        (loss, components), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params, batch, temperature, rng
        )
        grads = _cast_tree(grads, jnp.float32)
        updates, opt_state = optimizer.update(
            grads, state.opt_state, state.params
        )
        params = optax.apply_updates(state.params, updates)
        metrics = dict(components)
        if with_grad_norms:
            metrics["grad_norms"] = component_grad_norms(grads)
        return (
            TrainState(params=params, opt_state=opt_state, step=state.step + 1),
            metrics,
        )

    return train_step


def make_scan_train_step(train_step, donate: bool = True):
    """Fuse K sequential train steps into ONE compiled program.

    ``train_step`` is any (state, batch, temperature, rng) -> (state,
    metrics) step (e.g. from ``make_train_step``; a jitted inner step
    inlines under tracing). The returned function takes batches with a
    leading scan axis — [K, B, G, 1, T] — and advances the state K times
    inside a single ``lax.scan``: one dispatch instead of K. Per-step PRNG
    semantics are IDENTICAL to the Python loop (keys derive from
    (run key, state.step) inside the step, and the step counter is carried
    through the scan), so a scanned epoch reproduces the per-step epoch.

    Why: over a remote-TPU transport each dispatch costs ~100 ms of host
    round-trip; at small batch sizes the hot loop becomes dispatch-bound.
    The scan makes the whole segment one XLA program — the device runs
    K steps back-to-back with zero host involvement. (The reference
    dispatches per batch and blocks on loss.item() every step,
    reference trainer.py:272-310.)

    Metrics come back with a leading [K] axis on every leaf.
    """

    @functools.partial(jax.jit, donate_argnums=(0,) if donate else ())
    def scan_steps(state: TrainState, batches, temperature, rng):
        def body(st, batch):
            return train_step(st, batch, temperature, rng)

        return jax.lax.scan(body, state, batches)

    return scan_steps


def make_scan_indexed_train_step(
    model: AudioAutoencoder,
    optimizer: optax.GradientTransformation,
    corpus: jnp.ndarray,  # [N, T] device-resident waveforms
    weights: LossWeights = LossWeights(),
    compute_dtype: jnp.dtype = jnp.float32,
    with_grad_norms: bool = False,
    donate: bool = True,
    mesh=None,
    shard_corpus: bool = False,
):
    """Scanned variant of ``make_indexed_train_step``: takes [K, B, G]
    int32 index matrices and runs K train steps in one dispatch, gathering
    each step's batch from the HBM-resident corpus inside the scan body.

    The gather lives INSIDE the one program here (unlike the split-jit
    production step): the scan already amortizes compile helper pressure
    over K steps, and at trainer batch sizes (B <= 32) the combined
    program compiles fine — the b=128 split-jit workaround in
    ``make_indexed_train_step`` is a bench-only concern.

    ``shard_corpus=True`` (requires ``mesh``) shards corpus rows over the
    mesh and assembles each step's batch with the distributed gather —
    see ``make_sharded_corpus_gather``.
    """
    base = make_train_step(
        model, optimizer, weights, compute_dtype, with_grad_norms,
        donate=False,
    )
    gather = None
    if mesh is not None and shard_corpus:
        corpus_dev, gather = make_sharded_corpus_gather(mesh, corpus)
    elif mesh is not None:
        from ..parallel import replicated

        corpus_dev = jax.device_put(
            jnp.asarray(corpus, jnp.float32), replicated(mesh)
        )
    else:
        corpus_dev = jax.device_put(jnp.asarray(corpus, jnp.float32))

    @functools.partial(jax.jit, donate_argnums=(0,) if donate else ())
    def scan_steps(state: TrainState, idxs, temperature, rng, corpus):
        def body(st, idx):  # idx: [B, G]
            if gather is not None:
                batch = gather(corpus, idx)  # distributed rows
            else:
                batch = corpus[idx][:, :, None, :]
            return base(st, batch, temperature, rng)

        return jax.lax.scan(body, state, idxs)

    def scanned_step(state: TrainState, idxs, temperature, rng):
        return scan_steps(state, idxs, temperature, rng, corpus_dev)

    return scanned_step


def make_sharded_corpus_gather(mesh, corpus, axis: str = "data"):
    """Corpus sharded ROW-WISE over the mesh + a batch-gather that
    assembles each chip's batch shard from the distributed rows.

    The replicated device corpus caps at one chip's HBM (~4k clips of
    4 s/16 kHz audio in f32); sharding rows over D chips scales the
    resident corpus D-fold toward real NSynth sizes (~300k clips on a
    v5e-8 would still stream, but 30k+ fit). The access pattern is the
    sharded-embedding-table idiom:

      1. every chip receives the FULL [B, G] index matrix (tiny int32s),
      2. gathers the rows it owns from its local shard (masked clip for
         foreign indices — zero contribution),
      3. one ``psum_scatter`` over the batch dim both sums the
         per-chip contributions (exactly one chip owns each row) and
         leaves each chip holding only ITS batch shard — the same
         [B/D, G, T] layout the replicated-corpus path produces.

    Per-step ICI traffic is ~B*G*T floats (the batch itself), the
    minimum possible when rows live remotely; index traffic is noise.

    Returns ``(corpus_dev, gather)`` where ``gather(corpus_dev,
    idxs[B, G]) -> [B, G, 1, T]`` batch-sharded over the mesh. Rows are
    zero-padded to a device-count multiple; callers never index pads.
    """
    from jax.sharding import NamedSharding, PartitionSpec as P

    try:  # public spelling since jax 0.6
        from jax import shard_map
    except ImportError:  # pragma: no cover
        from jax.experimental.shard_map import shard_map

    import numpy as np

    d = mesh.devices.size
    # Pad on the HOST and device_put straight to the sharded layout: the
    # whole point is a corpus larger than one chip's HBM, so it must never
    # be materialized on a single device on the way in.
    corpus = np.asarray(corpus, np.float32)
    n = corpus.shape[0]
    pad = (-n) % d
    if pad:
        corpus = np.concatenate(
            [corpus, np.zeros((pad, corpus.shape[1]), corpus.dtype)]
        )
    n_local = (n + pad) // d
    corpus_dev = jax.device_put(corpus, NamedSharding(mesh, P(axis)))

    def local_gather(cshard, idx):
        dev = jax.lax.axis_index(axis)
        local = idx - dev * n_local
        ok = (local >= 0) & (local < n_local)
        rows = cshard[jnp.clip(local, 0, n_local - 1)]
        rows = jnp.where(ok[..., None], rows, jnp.zeros((), rows.dtype))
        # sum of one-hot contributions + scatter to this chip's batch rows
        return jax.lax.psum_scatter(
            rows, axis, scatter_dimension=0, tiled=True
        )

    sharded = shard_map(
        local_gather,
        mesh=mesh,
        in_specs=(P(axis, None), P()),
        out_specs=P(axis, None, None),
    )

    @jax.jit
    def gather(corpus, idxs):  # [B, G] -> [B, G, 1, T] batch-sharded
        return sharded(corpus, idxs)[:, :, None, :]

    return corpus_dev, gather


def make_eval_step(
    model: AudioAutoencoder,
    weights: LossWeights = LossWeights(),
):
    """Jitted validation step: deterministic forward + loss
    (trainer.py:399-415). Batch: [B, 1, T] bare waveforms."""

    @jax.jit
    def eval_step(params, batch):
        out = model.apply(params, batch, 1.0, None, False)
        total, components = autoencoder_loss(
            out.waveform, batch, out.aux, out.valid, weights,
            with_per_sample=True,
        )
        return total, components

    return eval_step


def anneal_temperature(
    epoch, initial_temp: float = 5.0, min_temp: float = 0.1, decay: float = 0.95
):
    """Per-epoch Gumbel temperature (trainer.py:264-269), as a pure
    function usable as a dynamic jit argument."""
    return temperature_schedule(epoch, initial_temp, min_temp, decay)


def make_indexed_train_step(
    model: AudioAutoencoder,
    optimizer: optax.GradientTransformation,
    corpus: jnp.ndarray,  # [N, T] device-resident waveforms
    weights: LossWeights = LossWeights(),
    compute_dtype: jnp.dtype = jnp.float32,
    with_grad_norms: bool = False,
    donate: bool = True,
    mesh=None,
    shard_corpus: bool = False,
):
    """Train step over a device-resident corpus: takes [B, G] int32 index
    matrices and gathers waveform rows in HBM instead of shipping
    B*G*T floats host->device every step (~1000x less PCIe/ICI traffic
    for NSynth shapes). Sampling semantics are identical to the array
    path — see ``NSynthDataset.sample_batch_indices``.

    Under data parallelism pass the ``mesh``: by default the corpus is
    placed replicated across it (each chip gathers its batch shard's rows
    locally — zero cross-chip traffic for batch assembly), index batches
    arrive sharded on the leading dim, and XLA still inserts only the
    gradient all-reduce. ``shard_corpus=True`` instead shards the corpus
    ROWS over the mesh (D-fold HBM capacity, one psum_scatter of the
    batch per step — see ``make_sharded_corpus_gather``) for corpora that
    do not fit one chip.
    """
    base = make_train_step(
        model, optimizer, weights, compute_dtype, with_grad_norms,
        donate=donate,
    )
    # The corpus is a jit *argument*, not a closed-over constant: baking
    # tens of MB into the HLO bloats (de)serialization and the compile
    # cache; as an argument it stays resident on device across steps.
    if mesh is not None and shard_corpus:
        corpus_dev, _gather = make_sharded_corpus_gather(mesh, corpus)
    else:
        if mesh is not None:
            from ..parallel import replicated

            corpus_dev = jax.device_put(
                jnp.asarray(corpus, jnp.float32), replicated(mesh)
            )
        else:
            corpus_dev = jax.device_put(jnp.asarray(corpus, jnp.float32))

        # The gather is its own (tiny) jit rather than fused into the
        # train step: the one-program form at b=128 with the Pallas
        # attention kernels crashes the remote-TPU AOT compile helper
        # (subprocess exit 1; each half compiles fine alone — measured
        # round 2). The gathered batch stays on device, so the split
        # costs one extra dispatch and no host traffic; under DP the
        # sharded idxs make the gather output batch-sharded while the
        # replicated corpus gathers locally per chip.
        @jax.jit
        def _gather(corpus, idxs):
            return corpus[idxs][:, :, None, :]  # [B, G, 1, T]

    def indexed_step(state: TrainState, idxs, temperature, rng):
        return base(state, _gather(corpus_dev, idxs), temperature, rng)

    return indexed_step
