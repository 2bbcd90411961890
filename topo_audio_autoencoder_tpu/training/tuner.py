"""Vmapped hyperparameter grid search: every combo trains at once.

The reference tunes its 8-combo grid (encoder_lr x decoder_lr x
complexity_penalty, main.py:261-265) *sequentially* — 8 separate 5-epoch
runs (trainer.py:186-244). On TPU the model is small relative to the chip,
so the grid becomes a vmapped leading axis: K parameter trees, K optimizer
states, K hyperparameter scalars, one compiled step that advances all
combos on the same batch simultaneously. An 8-combo search costs roughly
one run's wall-clock.

Hyperparameters stay *dynamic* (per-combo traced scalars), so the compiled
step is reused across any grid of the same size:

- learning rates: Adam is factored as ``clip -> scale_by_adam`` and the
  normalized update is scaled by the per-combo (encoder, decoder) LRs,
  exactly equivalent to two-group ``adam(lr)`` (trainer.py:80-87).
- complexity_penalty enters the loss as a traced weight.

The sequential, per-combo-resumable tuner remains in
``Trainer.tune_hyperparameters`` for checkpoint-compatible runs.
"""

from __future__ import annotations

import itertools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..models.autoencoder import AudioAutoencoder
from ..models.encoder import info_nce_loss, rank_diversity_entropy, vertex_count_penalty
from .losses import LossWeights, autoencoder_loss
from .train_step import _cast_tree


class GridState(NamedTuple):
    params: any  # K-stacked param trees
    opt_state: any  # K-stacked scale_by_adam states
    encoder_lr: jnp.ndarray  # [K]
    decoder_lr: jnp.ndarray  # [K]
    complexity_penalty: jnp.ndarray  # [K]


def _grid_combos(grid: dict) -> list[tuple[float, float, float]]:
    return list(
        itertools.product(
            grid["encoder_lr"], grid["decoder_lr"], grid["complexity_penalty"]
        )
    )


class VmappedGridTuner:
    def __init__(
        self,
        model: AudioAutoencoder,
        gradient_clip_val: float = 10.0,
        compute_dtype=jnp.float32,
        weights: LossWeights = LossWeights(),
        mesh=None,
    ):
        """``mesh``: a 1-D 'data' mesh for data-parallel tuning. The grid
        state (K param trees) replicates across it, batches shard on their
        batch dim (the combo vmap axis stays un-sharded — every chip
        advances all K combos on its batch shard), and XLA inserts the
        gradient all-reduce, exactly like the production DP train step.
        The reference's tuner is part of its training pipeline
        (reference trainer.py:186-244), so DP parity covers it too."""
        import dataclasses

        self.mesh = mesh
        if mesh is not None:
            from ..parallel import batch_sharding, replicated

            self._bsh = batch_sharding(mesh)
            self._rep = replicated(mesh)
        else:
            self._bsh = self._rep = None

        # vmapping the whole grid over the train step can't lower the
        # fused samplers' pallas_call (the scalar SMEM seed block has no
        # batched block mapping); run the tuner with the pure-JAX
        # samplers — the flag carries no params, so the winning combo's
        # weights transfer to the fused-sampler production model as-is.
        if model.use_fused_sampler:
            model = dataclasses.replace(model, use_fused_sampler=False)
        self.model = model
        self.base_weights = weights
        self.tx = optax.chain(
            optax.clip_by_global_norm(gradient_clip_val),
            optax.scale_by_adam(),
        )
        model_ref = model
        cast = compute_dtype

        def loss_fn(params, cpx, batch, temperature, rng):
            b, g, _, t = batch.shape
            srng, drng = jax.random.split(rng)
            cp = _cast_tree(params, cast)
            flat = batch.reshape(b * g, 1, t).astype(cast)
            bands = model_ref.pqmf.forward(flat)
            logits = model_ref.apply(
                cp, jnp.swapaxes(bands, -1, -2), True,
                rngs={"dropout": drng},
                method=lambda m, x, tr: m.encoder.compute_logits(x, tr),
            )
            contrastive = (
                info_nce_loss(logits.reshape(b, g, -1).astype(jnp.float32))
                if g >= 3 else None
            )
            enc = model_ref.apply(
                cp, logits.reshape(b, g, -1)[:, 0], temperature, srng, True,
                method=lambda m, l, tp, r, tr: m.encoder.generate_complex(l, tp, r, tr),
            )
            recon = model_ref.apply(
                cp, enc, t // model_ref.num_bands, True,
                rngs={"dropout": drng},
                method=lambda m, e, dl, tr: m.decode(e, dl, tr),
            )
            aux = {
                "binary_entropy": rank_diversity_entropy(enc.rectified),
                "diversity": vertex_count_penalty(
                    enc.rectified.vertices,
                    model_ref.min_active_vertices,
                    model_ref.max_active_vertices,
                ),
            }
            w = self.base_weights._replace(complexity_penalty=cpx)
            # stft_method='matmul': identical on TPU ('auto' picks matmul);
            # on CPU the grad-of-vmap + mesh-sharded composition trips an
            # XLA FftThunk layout RET_CHECK (see ops/stft.py) — the matmul
            # DFT has no fft thunk in either direction.
            total, comps = autoencoder_loss(
                recon.astype(jnp.float32),
                flat.reshape(b, g, 1, t)[:, 0].astype(jnp.float32),
                {k: v.astype(jnp.float32) for k, v in aux.items()},
                enc.valid, w, contrastive, stft_method="matmul",
            )
            return total, comps

        tx = self.tx

        def grid_loss(params_k, cpxs, batch, temp, rngs):
            # GRAD-OF-VMAP, not vmap-of-grad: each combo's loss depends
            # only on its own params, so the gradient of the summed
            # stacked loss IS the per-combo gradient stack — same math.
            # vmap-of-grad would batch the conv *transpose* rules, which
            # jax 0.9 refuses whenever avals carry mesh shardings (the
            # conv batch rule's rhs-batched out_sharding branch raises
            # NotImplementedError) — i.e. the moment the tuner runs
            # data-parallel. grad-of-vmap differentiates the already-
            # batched forward jaxpr; no batching rule runs in the
            # backward, so the same program serves 1 chip and a mesh.
            losses, _ = jax.vmap(loss_fn, in_axes=(0, 0, None, None, 0))(
                params_k, cpxs, batch, temp, rngs
            )
            return losses.sum(), losses

        def apply_one(params, opt_state, lr_e, lr_d, grads):
            updates, opt_state = tx.update(grads, opt_state, params)
            # two-group LR scaling == {encoder: adam(lr_e), decoder: adam(lr_d)}
            scaled = {
                "params": {
                    k: jax.tree.map(
                        lambda u: -(lr_e if k == "encoder" else lr_d) * u, v
                    )
                    for k, v in updates["params"].items()
                }
            }
            params = optax.apply_updates(params, scaled)
            return params, opt_state

        # DP note: sharding comes from INPUT PLACEMENT only (batch sharded,
        # grid state replicated — exactly like the production train step);
        # GSPMD propagation from the placed inputs inserts the gradient
        # all-reduce without in-graph constraints.
        def grid_step(state: GridState, batch, temp, rngs):
            (_, loss), grads = jax.value_and_grad(grid_loss, has_aux=True)(
                state.params, state.complexity_penalty, batch, temp, rngs
            )
            grads = _cast_tree(grads, jnp.float32)
            params, opt_state = jax.vmap(apply_one)(
                state.params, state.opt_state,
                state.encoder_lr, state.decoder_lr, grads,
            )
            return state._replace(params=params, opt_state=opt_state), loss

        def scan_grid_step(state: GridState, idx_seg, temp, rng, corpus):
            """[k, B, G] index segment -> k grid steps in ONE dispatch.

            The PRNG key rides the scan carry and is split exactly like
            the host loop (rng, sub = split(rng); split(sub, K) per step),
            so the scanned and per-step tunes follow the same trajectory
            bit for bit (cf. the trainer's scanned epoch,
            trainer.py::_train_epoch_scanned). The HBM gather lives inside
            the body — at tuner batch sizes the combined program is well
            under the remote compile helper's limit (see
            make_scan_indexed_train_step).
            """
            k_combos = state.encoder_lr.shape[0]

            def body(carry, idx):
                st, r = carry
                r, sub = jax.random.split(r)
                step_rngs = jax.random.split(sub, k_combos)
                batch = corpus[idx][:, :, None, :]
                # Under a mesh the gather stays chip-local: the corpus is
                # replicated and idx arrives batch-sharded, so the gathered
                # rows inherit the batch sharding by propagation.
                st, loss = grid_step(st, batch, temp, step_rngs)
                return (st, r), loss

            (state, rng), losses = jax.lax.scan(body, (state, rng), idx_seg)
            return state, rng, losses

        def combo_eval(params, cpx, batch):
            out = model_ref.apply(params, batch, 1.0, None, False)
            w = self.base_weights._replace(complexity_penalty=cpx)
            total, _ = autoencoder_loss(
                out.waveform, batch, out.aux, out.valid, w,
                stft_method="matmul",
            )
            return total

        self.grid_step = jax.jit(grid_step, donate_argnums=(0,))
        self.scan_grid_step = jax.jit(scan_grid_step, donate_argnums=(0,))
        self.grid_eval = jax.jit(
            jax.vmap(combo_eval, in_axes=(0, 0, None))
        )

    def init_grid(self, grid: dict, sample_shape, seed: int = 511990) -> GridState:
        """K independently-seeded param trees + per-combo hyperparams."""
        combos = _grid_combos(grid)
        k = len(combos)
        x = jnp.zeros(sample_shape, jnp.float32)

        def init_one(rng):
            p, d, s = jax.random.split(rng, 3)
            return self.model.init({"params": p, "dropout": d}, x, 1.0, s, True)

        keys = jax.random.split(jax.random.PRNGKey(seed), k)
        params = jax.jit(jax.vmap(init_one))(keys)
        opt_state = jax.vmap(self.tx.init)(params)
        enc, dec, cpx = (jnp.asarray([c[i] for c in combos]) for i in range(3))
        state = GridState(params, opt_state, enc, dec, cpx)
        if self.mesh is not None:
            from ..parallel import replicate

            state = replicate(state, self.mesh)
        return state

    def tune(
        self,
        grid: dict,
        train_batches,  # iterable of [B, G, 1, T] (re-iterable per epoch)
        val_batches,  # iterable of [B, 1, T]
        epochs: int = 5,
        seed: int = 0,
        initial_temp: float = 5.0,
        min_temp: float = 0.1,
        temp_decay: float = 0.95,
        corpus=None,  # [N, T]: batches become [B, G] / [B, 1] index matrices
        val_corpus=None,
        scan_steps: int = 0,  # >1: k grid steps per dispatch (needs corpus)
    ) -> dict:
        """Train every combo simultaneously; returns best combo + curves.

        The Gumbel temperature anneals per epoch with the SAME schedule as
        the production run (trainer temp args; reference trainer.py:264-269
        anneals during tuning epochs too) — tuning at a fixed temperature
        would rank combos under different sampling dynamics than the run
        they seed.

        With ``corpus`` the tuner runs the same device-resident-corpus
        path as the production trainer (``make_indexed_train_step``):
        waveforms live in HBM once and each step ships a [B, G] int32
        index matrix instead of B*G*T floats — at G=12/T=64000 that is
        ~25 MB/step of H2D the tunnel cannot sustain. The gather is its
        own tiny jit (fusing it into the grid step has crashed the remote
        AOT compile helper at large sizes). Train losses are kept as
        device references and drained once at the end, so the grid's
        dispatch chain never blocks on a host fetch mid-tune.
        """
        from .train_step import anneal_temperature

        # Under a mesh: corpus replicated (chip-local gathers), every batch
        # (waveforms or indices) sharded on its batch dim.
        put_rep = (
            (lambda x: jax.device_put(x, self._rep))
            if self.mesh is not None
            else jax.device_put
        )
        put_batch = (
            (lambda x: jax.device_put(jnp.asarray(x), self._bsh))
            if self.mesh is not None
            else jnp.asarray
        )
        gather = gather_val = None
        if corpus is not None:
            corpus = put_rep(jnp.asarray(corpus, jnp.float32))
            vc = (
                corpus
                if val_corpus is None
                else put_rep(jnp.asarray(val_corpus, jnp.float32))
            )
            gather = jax.jit(lambda c, i: c[i][:, :, None, :])  # [B,G,1,T]
            gather_val = jax.jit(lambda c, i: c[i[:, 0]][:, None, :])  # [B,1,T]

        combos = _grid_combos(grid)
        state = None
        rng = jax.random.PRNGKey(seed)
        train_curve = []
        scanned = corpus is not None and scan_steps > 1
        for epoch in range(epochs):
            temp = jnp.asarray(
                anneal_temperature(epoch, initial_temp, min_temp, temp_decay),
                jnp.float32,
            )
            if scanned:
                if state is None:
                    state = self.init_grid(
                        grid, (1, 1, corpus.shape[-1]), seed
                    )
                idx_batches = [np.asarray(b) for b in train_batches(epoch)]
                for s in range(0, len(idx_batches), scan_steps):
                    seg = np.stack(idx_batches[s : s + scan_steps])
                    if self.mesh is not None:
                        from jax.sharding import NamedSharding
                        from jax.sharding import PartitionSpec as P

                        # [k, B, G]: scan axis first, BATCH dim sharded
                        seg = jax.device_put(
                            jnp.asarray(seg),
                            NamedSharding(self.mesh, P(None, "data")),
                        )
                    else:
                        seg = jnp.asarray(seg)
                    state, rng, losses = self.scan_grid_step(
                        state, seg, temp, rng, corpus
                    )
                    train_curve.append(losses)  # [k, K] device ref
                continue
            for batch in train_batches(epoch):
                batch = put_batch(batch)
                if gather is not None:
                    batch = gather(corpus, batch)
                if state is None:
                    state = self.init_grid(
                        grid, (1, 1, batch.shape[-1]), seed
                    )
                rng, sub = jax.random.split(rng)
                step_rngs = jax.random.split(sub, len(combos))
                state, losses = self.grid_step(
                    state, batch, temp, step_rngs
                )
                train_curve.append(losses)  # device ref; drained below
        # ONE drain for the whole tune; flatten scanned [k, K] stacks to
        # per-step rows so the curve's shape matches the per-step path.
        train_curve = [
            row
            for l in jax.device_get(train_curve)
            for row in (np.asarray(l) if np.asarray(l).ndim == 2 else [np.asarray(l)])
        ]
        # Array (not scalar) accumulator: a corpus smaller than one val
        # batch yields zero batches, and argmin/tolist must still work.
        val_losses = np.zeros(len(combos))
        n_val = 0
        for batch in val_batches():
            batch = put_batch(batch)
            if gather_val is not None:
                batch = gather_val(vc, batch)
            val_losses = val_losses + np.asarray(
                self.grid_eval(state.params, state.complexity_penalty, batch)
            )
            n_val += 1
        val_losses = val_losses / max(n_val, 1)
        best = int(np.argmin(val_losses))
        return {
            "best_index": best,
            "best_params": {
                "encoder_lr": combos[best][0],
                "decoder_lr": combos[best][1],
                "complexity_penalty": combos[best][2],
            },
            "val_losses": val_losses.tolist(),
            "train_curve": [l.tolist() for l in train_curve],
            "state": state,
        }
