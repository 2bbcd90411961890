"""Trainer shell: epoch loop, validation, early stopping, checkpoints,
grid-search tuner with resume, audio dumps.

Equivalent of the reference ``Trainer`` (reference: trainer.py:49-469),
re-designed around jitted steps:

- epoch loop <= 100 epochs, early-stop patience 20, checkpoint 'best' on
  val improvement + every 10 epochs (trainer.py:128-161) + every 100
  iterations (trainer.py:303-304);
- grid-search tuner over encoder_lr x decoder_lr x complexity_penalty,
  ``tuning_epochs`` per combo, per-combo checkpoint dirs with
  resume-from-latest (trainer.py:186-244);
- per-epoch Gumbel temperature annealing passed as a *dynamic* jit arg
  (no recompile per epoch) (trainer.py:264-269);
- curriculum ``set_epoch`` on the train dataset (trainer.py:137);
- every ``log_every`` steps: loss components + per-component gradient
  norms to a JSON-lines stream and input/output wav dumps with
  active-simplex-count metadata (trainer.py:296-301,163-184);
- Orbax checkpoints of params/opt-state/step + host metadata.

No interactive prompts (SURVEY §5.6): everything is constructor config.
"""

from __future__ import annotations

import itertools
import json
from dataclasses import dataclass, field
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

from ..data.dataset import (
    NSynthDataset,
    batch_iterator,
    index_iterator,
    prefetch_to_device,
)
from ..data.preprocess import save_wav
from ..models.autoencoder import AudioAutoencoder
from .checkpoint import CheckpointManager
from .losses import LossWeights
from .metrics import MetricWriter, TrainingMetrics
from .train_step import (
    TrainState,
    anneal_temperature,
    create_train_state,
    make_eval_step,
    make_indexed_train_step,
    make_optimizer,
    make_train_step,
)


def _moments_to_bf16(state):
    """Cast every f32 leaf of the optimizer state to bf16 (params and the
    integer step/count leaves untouched)."""
    return state._replace(
        opt_state=jax.tree.map(
            lambda a: a.astype(jnp.bfloat16)
            if a.dtype == jnp.float32
            else a,
            state.opt_state,
        )
    )


_moments_to_bf16_jit = jax.jit(_moments_to_bf16)


def _cast_like(tree, template):
    """Cast each leaf of ``tree`` to the dtype of the matching
    ``template`` leaf (host-side; used to undo the bf16 moment cast)."""
    return jax.tree.map(
        lambda a, t: a.astype(t.dtype) if a.dtype != t.dtype else a,
        tree,
        template,
    )


@dataclass
class TrainerConfig:
    """All knobs of the reference Trainer ctor (trainer.py:50-72) that
    survive the rebuild, plus batching (the reference was batch-1)."""

    checkpoint_dir: str = "./checkpoints"
    encoder_lr: float = 1e-3
    decoder_lr: float = 1e-4
    batch_size: int = 4
    initial_reg_factor: float = 1e-5  # binary_entropy_penalty
    complexity_penalty: float = 0.1
    l0_penalty: float = 0.0  # Hard Concrete expected-L0 sparsity weight
    invalid_state_penalty: float = 100.0
    seed: int = 511990
    initial_temp: float = 5.0
    min_temp: float = 0.1
    temp_decay: float = 0.95
    gradient_clip_val: float = 10.0
    accumulate_grad_batches: int = 4
    max_epochs: int = 100
    patience: int = 20
    tuning_epochs: int = 5
    log_every: int = 10
    checkpoint_every_iters: int = 100
    checkpoint_every_epochs: int = 10
    sample_rate: int = 16000
    compute_dtype: str = "float32"  # or "bfloat16"
    with_grad_norms: bool = True
    dump_audio: bool = True
    # Keep the training corpus resident in HBM and ship only [B, G] index
    # matrices per step (the contrastive stacks are G-fold redundant corpus
    # rows; gathering on device cuts H2D traffic ~G*T/4-fold).
    device_corpus: bool = True
    # Data-parallel training over all visible devices: params/opt-state
    # replicated, batches sharded on the leading dim, gradient all-reduce
    # inserted by XLA over ICI. batch_size must divide the device count.
    data_parallel: bool = False
    n_devices: int | None = None  # DP width; None = all devices
    # Shard the TRAIN corpus rows over the mesh instead of replicating it:
    # D-fold HBM capacity (toward real NSynth sizes) at the cost of one
    # psum_scatter of the batch per step (make_sharded_corpus_gather).
    # Requires data_parallel + device_corpus. The (4x smaller) val corpus
    # stays replicated.
    shard_corpus: bool = False
    # Fuse this many train steps into ONE compiled lax.scan dispatch
    # (device_corpus only; 0/1 = per-step dispatch). Each dispatch over a
    # remote-TPU transport costs ~100 ms of host round-trip, so small-batch
    # epochs are dispatch-bound without this; a scanned segment runs K
    # steps back-to-back on device with zero host involvement.
    scan_steps: int = 0
    # End-of-epoch checkpoints run on a background thread against a
    # device-side snapshot of the state (the D2H fetch + serialize of the
    # flagship state is ~8 s — measured to dominate the epoch otherwise).
    # The snapshot copy makes this safe under donated train-step buffers.
    async_checkpoint: bool = True
    # Save optimizer moments bfloat16: the Adam mu/nu are ~2/3 of a train
    # state's bytes (the n=32 state is ~1 GB; one save = D2H at ~40 MB/s
    # + single-core serialize ≈ 150 s, 3x the epoch). The cast runs
    # on-device BEFORE the fetch, so it shrinks the D2H too. Moments are
    # restored to their original dtype on resume; params are never cast.
    # Resumed trajectories deviate by the bf16 rounding of mu/nu only
    # (parity-tested in tests/test_trainer.py).
    checkpoint_moments_bf16: bool = False


class Trainer:
    def __init__(
        self,
        model: AudioAutoencoder,
        train_dataset: NSynthDataset,
        val_dataset: NSynthDataset,
        test_dataset: NSynthDataset | None = None,
        config: TrainerConfig = TrainerConfig(),
    ):
        self.model = model
        self.train_dataset = train_dataset
        self.val_dataset = val_dataset
        self.test_dataset = test_dataset
        self.cfg = config
        self.checkpoint_dir = Path(config.checkpoint_dir)
        self.checkpoint_dir.mkdir(parents=True, exist_ok=True)
        self.metrics = TrainingMetrics()
        self.writer = MetricWriter(self.checkpoint_dir)
        self.rng = jax.random.PRNGKey(config.seed)
        if config.data_parallel:
            from ..parallel import make_mesh

            self.mesh = make_mesh(config.n_devices)
            if config.batch_size % self.mesh.devices.size != 0:
                raise ValueError(
                    f"batch_size {config.batch_size} must divide the "
                    f"{self.mesh.devices.size}-device mesh"
                )
        else:
            self.mesh = None
        if config.shard_corpus and (
            self.mesh is None or not config.device_corpus
        ):
            raise ValueError(
                "shard_corpus requires data_parallel and device_corpus"
            )
        self._build(config.encoder_lr, config.decoder_lr, config.complexity_penalty)
        self.state: TrainState | None = None
        self._ckpt_thread = None  # at most one async save in flight
        self._snapshot_fn = None  # lazy: jitted device-side state copy
        self._snapshot_cast = None  # moments-bf16 flag the snapshot fn bakes

    # ------------------------------------------------------------ setup

    def _build(self, encoder_lr, decoder_lr, complexity_penalty):
        """(Re)build optimizer + jitted steps for a hyperparam combo."""
        cfg = self.cfg
        self.hyper = {
            "encoder_lr": encoder_lr,
            "decoder_lr": decoder_lr,
            "complexity_penalty": complexity_penalty,
        }
        self.optimizer = make_optimizer(
            encoder_lr=encoder_lr,
            decoder_lr=decoder_lr,
            gradient_clip_val=cfg.gradient_clip_val,
            accumulate_grad_batches=cfg.accumulate_grad_batches,
        )
        weights = LossWeights(
            binary_entropy_penalty=cfg.initial_reg_factor,
            complexity_penalty=complexity_penalty,
            invalid_state_penalty=cfg.invalid_state_penalty,
            l0_penalty=cfg.l0_penalty,
        )
        dtype = jnp.bfloat16 if cfg.compute_dtype == "bfloat16" else jnp.float32
        self.scan_train_step = None
        if cfg.device_corpus and cfg.scan_steps > 1:
            from .train_step import make_scan_indexed_train_step

            self.scan_train_step = make_scan_indexed_train_step(
                self.model,
                self.optimizer,
                jnp.asarray(np.asarray(self.train_dataset.waveforms)),
                weights,
                compute_dtype=dtype,
                with_grad_norms=cfg.with_grad_norms,
                donate=False,
                mesh=self.mesh,
                shard_corpus=cfg.shard_corpus,
            )
        if cfg.device_corpus:
            self.train_step = make_indexed_train_step(
                self.model,
                self.optimizer,
                jnp.asarray(np.asarray(self.train_dataset.waveforms)),
                weights,
                compute_dtype=dtype,
                with_grad_norms=cfg.with_grad_norms,
                donate=False,
                mesh=self.mesh,
                shard_corpus=cfg.shard_corpus,
            )
        else:
            self.train_step = make_train_step(
                self.model,
                self.optimizer,
                weights,
                compute_dtype=dtype,
                with_grad_norms=cfg.with_grad_norms,
                donate=False,
            )
        self.eval_step = make_eval_step(self.model, weights)
        # jitted deterministic forward for audio dumps (eager apply
        # dispatches thousands of ops — minutes over a remote-TPU link)
        self._dump_fwd = jax.jit(
            lambda p, x: self.model.apply(p, x, 1.0, None, False)
        )

    def init_state(self) -> TrainState:
        t = self.train_dataset.waveforms.shape[-1]
        shape = (1, 1, t)
        self.rng, init_rng = jax.random.split(self.rng)
        state = create_train_state(self.model, self.optimizer, init_rng, shape)
        if self.mesh is not None:
            from ..parallel import replicate

            state = replicate(state, self.mesh)
        return state

    def _put_batch(self, batch):
        """Device placement: shard the leading dim when data-parallel."""
        if self.mesh is None:
            return jnp.asarray(batch)
        from ..parallel import shard_batch

        return shard_batch(jnp.asarray(batch), self.mesh)

    # ------------------------------------------------------------ loops

    def train_epoch(self, epoch: int, sample_dir: Path | None = None) -> float:
        """One epoch of the hot loop — fully asynchronous dispatch.

        The device never waits on the host: batches are prefetched
        (assembly + H2D overlap compute), the per-step PRNG key derives
        from (run key, step counter) inside the jit, and per-step losses
        are kept as device scalars and drained in ONE transfer at epoch
        end. The only mid-epoch syncs are the log_every metric writes and
        periodic checkpoints. (Replaces the reference's blocking
        loss.item() + print loop, trainer.py:272-310.)
        """
        cfg = self.cfg
        temp = anneal_temperature(
            epoch, cfg.initial_temp, cfg.min_temp, cfg.temp_decay
        )
        if self.scan_train_step is not None:
            return self._train_epoch_scanned(epoch, temp, sample_dir)
        make_iter = index_iterator if cfg.device_corpus else batch_iterator
        it = make_iter(
            self.train_dataset, cfg.batch_size, shuffle=True,
            seed=cfg.seed, epoch=epoch,
        )
        it = prefetch_to_device(it, size=2, put=self._put_batch)
        loss_refs: list = []
        for iteration, batch in enumerate(it):
            self.state, metrics = self.train_step(
                self.state, batch, temp, self.rng
            )
            loss_refs.append(metrics["total_loss"])
            if iteration % cfg.log_every == 0:
                self.writer.write(
                    int(self.state.step), jax.device_get(metrics)
                )
                if cfg.dump_audio and sample_dir is None:
                    self._dump_audio(epoch, iteration, batch)
            if (
                cfg.checkpoint_every_iters
                and iteration > 0
                and iteration % cfg.checkpoint_every_iters == 0
            ):
                # iteration > 0: a cadence checkpoint at iteration 0 would
                # force a full-state device->host sync at the top of EVERY
                # epoch — hidden per-epoch stall in the async hot loop
                # (the per-epoch 'latest' save already covers epoch starts).
                self.save_checkpoint(
                    f"epoch_{epoch}_iter_{iteration}", sample_dir
                )
        losses = [float(x) for x in jax.device_get(loss_refs)]
        self.metrics.iteration_losses.extend(losses)
        return sum(losses) / max(len(losses), 1)

    def _train_epoch_scanned(self, epoch: int, temp, sample_dir) -> float:
        """Epoch as a handful of scanned segments — one dispatch per
        ``scan_steps`` train steps (see ``make_scan_indexed_train_step``).

        Identical trajectory to the per-step loop (per-step keys derive
        from (run key, step counter) inside the scan body; sampling from
        (seed, epoch) on the host). Per-step metrics come back stacked and
        are drained in one transfer at epoch end; log_every entries are
        written from the drained stack, so the log stream is the same —
        just written later. Segment boundaries carry the iteration-cadence
        checkpoints.
        """
        cfg = self.cfg
        idx_batches = list(
            index_iterator(
                self.train_dataset, cfg.batch_size, shuffle=True,
                seed=cfg.seed, epoch=epoch,
            )
        )
        if not idx_batches:
            return 0.0
        if cfg.dump_audio and sample_dir is None:
            self._dump_audio(epoch, 0, idx_batches[0])
        k = cfg.scan_steps
        seg_refs = []
        for s in range(0, len(idx_batches), k):
            seg = np.stack(idx_batches[s : s + k])  # [k, B, G]
            self.state, metrics = self.scan_train_step(
                self.state, self._put_scan_batch(seg), temp, self.rng
            )
            seg_refs.append(metrics)
            end = s + seg.shape[0]
            if (
                cfg.checkpoint_every_iters
                and end < len(idx_batches)
                and end // cfg.checkpoint_every_iters
                > s // cfg.checkpoint_every_iters
            ):
                self.save_checkpoint(f"epoch_{epoch}_iter_{end}", sample_dir)
        # ONE device->host drain for the whole epoch's stacked metrics.
        host = jax.device_get(seg_refs)
        step_after = int(self.state.step)
        losses: list[float] = []
        it = 0
        total = sum(len(np.asarray(m["total_loss"])) for m in host)
        for seg_m in host:
            kk = len(np.asarray(seg_m["total_loss"]))
            for j in range(kk):
                if it % cfg.log_every == 0:
                    self.writer.write(
                        step_after - total + it + 1,
                        jax.tree.map(lambda x: np.asarray(x)[j], seg_m),
                    )
                losses.append(float(np.asarray(seg_m["total_loss"])[j]))
                it += 1
        self.metrics.iteration_losses.extend(losses)
        return sum(losses) / max(len(losses), 1)

    def _put_scan_batch(self, seg):
        """Place a [K, B, G] index segment; under DP shard the BATCH dim."""
        if self.mesh is None:
            return jnp.asarray(seg)
        from jax.sharding import NamedSharding, PartitionSpec as P

        return jax.device_put(
            jnp.asarray(seg), NamedSharding(self.mesh, P(None, "data"))
        )

    def validate(self, dataset: NSynthDataset | None = None) -> float:
        """Mean per-clip loss over the ENTIRE evaluation set (default: val).

        The final short batch is right-padded to the full batch size (one
        compiled shape, DP-divisible) and the pad rows are masked out of
        the average — no clip is silently dropped and ``best`` selection
        never sees a truncated set (the reference iterates batch-1 so never
        truncates, trainer.py:399-415).
        """
        cfg = self.cfg
        from ..parallel import pad_to_multiple

        if cfg.device_corpus:
            return self._validate_indexed(dataset or self.val_dataset)
        total, count = 0.0, 0
        for batch in batch_iterator(
            dataset or self.val_dataset, cfg.batch_size, shuffle=False,
            drop_remainder=False,
        ):
            padded, real = pad_to_multiple(np.asarray(batch), cfg.batch_size)
            _, comps = self.eval_step(
                self.state.params, self._put_batch(padded)
            )
            per = np.asarray(jax.device_get(comps["per_sample"]))
            total += float(per[:real].sum())
            count += real
        return total / max(count, 1)

    def _validate_indexed(self, ds: NSynthDataset) -> float:
        """Validation over a device-resident eval corpus.

        Same mechanism as the indexed train path: the eval waveforms live
        in HBM once (replicated across the mesh under DP) and each batch
        ships B int32 indices instead of B*T floats; per-sample losses
        stay as device references and drain in ONE transfer at the end.
        The array path's per-batch H2D (+ a blocking fetch per batch)
        costs whole seconds per epoch over the remote-TPU tunnel.
        """
        cfg = self.cfg
        from ..parallel import pad_to_multiple

        if getattr(self, "_val_corpus_key", None) != id(ds):
            wavs = jnp.asarray(np.asarray(ds.waveforms), jnp.float32)
            if self.mesh is not None:
                from ..parallel import replicated

                wavs = jax.device_put(wavs, replicated(self.mesh))
            else:
                wavs = jax.device_put(wavs)
            self._val_corpus_dev = wavs
            self._val_corpus_key = id(ds)
            self._val_gather = jax.jit(lambda c, i: c[i[:, 0]][:, None, :])
        refs: list = []
        for batch in index_iterator(
            ds, cfg.batch_size, shuffle=False, drop_remainder=False
        ):
            # Pad rows (repeats of the last index) are masked out of the
            # average below, exactly like the array path.
            padded, real = pad_to_multiple(np.asarray(batch), cfg.batch_size)
            x = self._val_gather(self._val_corpus_dev, self._put_batch(padded))
            _, comps = self.eval_step(self.state.params, x)
            refs.append((comps["per_sample"], real))
        drained = jax.device_get([p for p, _ in refs])
        total = sum(
            float(np.asarray(p)[:real].sum())
            for p, (_, real) in zip(drained, refs)
        )
        count = sum(real for _, real in refs)
        return total / max(count, 1)

    def train(
        self, hyper_params: dict | None = None, resume: bool = False
    ) -> TrainingMetrics:
        """Full run, optionally preceded by grid tuning (trainer.py:120-161).

        ``resume=True`` picks up the ``latest`` checkpoint (params, opt
        state, step, metrics, epoch, curriculum epoch, host PRNG key — the
        reference restores model/optimizer/metrics, trainer.py:434-453) and
        reproduces the uninterrupted run exactly: the per-step keys derive
        from (run key, step counter), the shuffle/sampling streams from
        (seed, epoch), so a kill-and-resume trajectory is bit-identical
        (tests/test_trainer.py kill-and-resume test).
        """
        start_epoch = 0
        if resume and CheckpointManager(self.checkpoint_dir).exists("latest"):
            start_epoch = self.resume_from("latest") + 1
            hyper_params = None  # any tuning is already folded into the run
        if self.state is None:
            self.state = self.init_state()
        if hyper_params:
            self.tune_hyperparameters(hyper_params)
            self.load_best_parameters()

        cfg = self.cfg
        best_val = self.metrics.best_val_loss
        patience_counter = (
            max(0, (start_epoch - 1) - self.metrics.best_epoch)
            if start_epoch and self.metrics.best_epoch >= 0
            else 0
        )
        for epoch in range(start_epoch, cfg.max_epochs):
            train_loss = self.train_epoch(epoch)
            self.train_dataset.set_epoch(epoch)
            self.metrics.train_losses.append(train_loss)

            val_loss = self.validate()
            self.metrics.val_losses.append(val_loss)
            self.metrics.save(self.checkpoint_dir)

            names: tuple[str, ...] = ("latest",)
            if val_loss < best_val:
                best_val = val_loss
                self.metrics.best_val_loss = val_loss
                self.metrics.best_epoch = epoch
                patience_counter = 0
                names = ("best", "latest")  # identical state: ONE D2H fetch
            else:
                patience_counter += 1
            if (
                patience_counter < cfg.patience
                and epoch % cfg.checkpoint_every_epochs == 0
            ):
                names = names + (f"epoch_{epoch}",)
            self.save_checkpoint(
                names, epoch=epoch, block=not cfg.async_checkpoint
            )
            if patience_counter >= cfg.patience:
                break
        self.finish_checkpoints()
        # Held-out evaluation with the best weights, scored exactly once.
        if self.test_dataset is not None:
            ckpt = CheckpointManager(self.checkpoint_dir)
            if ckpt.exists("best"):
                self.state = ckpt.restore("best", template=self.state)
            self.metrics.test_loss = self.validate(self.test_dataset)
            self.metrics.save(self.checkpoint_dir)
        return self.metrics

    # ------------------------------------------------------------ tuner

    def tune_hyperparameters_vmapped(self, hyper_params: dict) -> dict | None:
        """Grid search with every combo trained simultaneously as a vmap
        axis (see training/tuner.py) — one compiled step advances the whole
        grid. ~K-fold faster than the sequential tuner when the model fits
        K times in HBM; no per-combo checkpoint resume."""
        from .tuner import VmappedGridTuner

        cfg = self.cfg
        import jax.numpy as jnp  # local: dtype switch

        tuner = VmappedGridTuner(
            self.model,
            gradient_clip_val=cfg.gradient_clip_val,
            compute_dtype=(
                jnp.bfloat16 if cfg.compute_dtype == "bfloat16" else jnp.float32
            ),
            # Under data parallelism the tune stage runs on the SAME mesh
            # as the production run: grid state replicated, batches sharded
            # (VERDICT r3: the tuner previously ignored the mesh and would
            # run single-chip on a real pod slice).
            mesh=self.mesh,
        )
        # device_corpus: ship [B, G] indices per step and gather rows in
        # HBM, exactly like the production train loop (the array path ships
        # ~25 MB/step at G=12 — the tune stage was 3,400 s host-bound on a
        # 2048-clip corpus before this, vs ~130 s of device compute).
        make_iter = index_iterator if cfg.device_corpus else batch_iterator
        result = tuner.tune(
            hyper_params,
            train_batches=lambda e: make_iter(
                self.train_dataset, cfg.batch_size, seed=cfg.seed, epoch=e
            ),
            val_batches=lambda: make_iter(
                self.val_dataset, cfg.batch_size, shuffle=False
            ),
            epochs=cfg.tuning_epochs,
            seed=cfg.seed,
            initial_temp=cfg.initial_temp,
            min_temp=cfg.min_temp,
            temp_decay=cfg.temp_decay,
            corpus=(
                self.train_dataset.waveforms if cfg.device_corpus else None
            ),
            val_corpus=(
                self.val_dataset.waveforms if cfg.device_corpus else None
            ),
            scan_steps=cfg.scan_steps if cfg.device_corpus else 0,
        )
        best = result["best_params"]
        self.metrics.best_params = best
        self.metrics.save(self.checkpoint_dir)
        # adopt the winning combo's trained params as the starting point
        k = result["best_index"]
        best_params = jax.tree.map(lambda x: x[k], result["state"].params)
        self._build(
            best["encoder_lr"], best["decoder_lr"], best["complexity_penalty"]
        )
        fresh = self.init_state()
        self.state = fresh._replace(params=best_params)
        self.save_checkpoint("best_tuning")
        return best

    def tune_hyperparameters(self, hyper_params: dict) -> dict | None:
        """Grid search with per-combo resume (trainer.py:186-244)."""
        cfg = self.cfg
        best_val, best_params = float("inf"), None
        grid = itertools.product(
            hyper_params["encoder_lr"],
            hyper_params["decoder_lr"],
            hyper_params["complexity_penalty"],
        )
        for enc_lr, dec_lr, cpx in grid:
            combo_dir = self.checkpoint_dir / f"e{enc_lr}_d{dec_lr}_c{cpx}"
            combo_ckpt = CheckpointManager(combo_dir)
            self._build(enc_lr, dec_lr, cpx)

            latest = combo_ckpt.latest_epoch_name()
            fresh = self.init_state()
            if latest is not None:
                self.state = combo_ckpt.restore(latest, template=fresh)
                start_epoch = int(latest.split("_")[1]) + 1
            else:
                # fresh seeded weights per combo (model.reset_weights analog,
                # audio2complex.py:64-69 / trainer.py:218)
                self.state = fresh
                start_epoch = 0

            for epoch in range(start_epoch, cfg.tuning_epochs):
                self.train_epoch(epoch, sample_dir=combo_dir)
                val_loss = self.validate()
                combo_ckpt.save(
                    f"epoch_{epoch}", self.state, extra=self.hyper
                )
                if val_loss < best_val:
                    best_val = val_loss
                    best_params = dict(self.hyper)
                    combo_ckpt.save("best", self.state, extra=self.hyper)
                    self.save_checkpoint("best_tuning")

        self.metrics.best_params = best_params
        self.metrics.save(self.checkpoint_dir)
        return best_params

    def load_best_parameters(self) -> None:
        """Re-apply the winning combo + its weights (trainer.py:246-258)."""
        p = self.metrics.best_params
        if p is None:
            return
        self._build(
            p["encoder_lr"], p["decoder_lr"], p["complexity_penalty"]
        )
        ckpt = CheckpointManager(self.checkpoint_dir)
        if ckpt.exists("best_tuning"):
            self.state = ckpt.restore("best_tuning", template=self.state)

    # ------------------------------------------------------------ io

    def save_checkpoint(
        self,
        name: str | tuple[str, ...],
        directory: Path | None = None,
        epoch: int | None = None,
        block: bool = True,
    ):
        """Checkpoint = device state (params/opt-state/step, Orbax) + host
        snapshot sidecar. With ``epoch`` set, the sidecar carries the full
        resume payload: metrics, epoch, dataset curriculum epoch, and the
        host PRNG key (the reference saves model/optimizer/metrics/
        hyperparams, trainer.py:417-432; curriculum + RNG are additions the
        reference forgets and silently resets on restore).

        ``name`` may be a tuple (e.g. ``("best", "latest")``): the state is
        fetched device→host ONCE and written under every name. The fetch is
        the expensive part — ~6 s for a 198 MB state at the remote tunnel's
        D2H bandwidth — so an improving epoch that snapshots both "best"
        and "latest" must not pay it twice.

        ``block=False`` runs the fetch + serialize on a background thread
        against a jitted device-side COPY of the state (the live buffers
        are donated to the next train step, so the thread must never hold
        them); the epoch loop only pays the copy dispatch. At most one
        save is in flight — the next save (or ``finish_checkpoints`` /
        any restore) joins it first, re-raising any failure."""
        extra = dict(self.hyper)
        # Architecture stamp: lets consumers (codec_cli) rebuild the exact
        # module without the user re-supplying --vertices/--hidden/--layers
        # (a silent mismatch decodes garbage).
        extra["model"] = self.model.geometry()
        cast_moments = self.cfg.checkpoint_moments_bf16
        if cast_moments:
            # Stamped so load_checkpoint builds a bf16-moment template for
            # the Orbax restore, then casts back to the live dtypes.
            extra["moments_dtype"] = "bfloat16"
        if epoch is not None:
            from dataclasses import asdict

            extra["train_state"] = {
                "epoch": epoch,
                "metrics": asdict(self.metrics),
                "dataset_epoch": self.train_dataset.epoch,
                "rng_key": np.asarray(self.rng).tolist(),
            }
        names = (name,) if isinstance(name, str) else name
        directory = directory or self.checkpoint_dir

        def _write(state):
            ckpt = CheckpointManager(directory)
            host_state = jax.device_get(state)
            for n in names:
                ckpt.save(n, host_state, extra=extra)

        self.finish_checkpoints()
        if block:
            state = (
                _moments_to_bf16_jit(self.state) if cast_moments else self.state
            )
            _write(state)
            return
        if self._snapshot_fn is None or self._snapshot_cast != cast_moments:

            def snap(s):
                s = jax.tree.map(jnp.copy, s)
                return _moments_to_bf16(s) if cast_moments else s

            self._snapshot_fn = jax.jit(snap)
            self._snapshot_cast = cast_moments
        snap = self._snapshot_fn(self.state)

        def _guarded():
            try:
                _write(snap)
            except BaseException as e:  # surfaced by finish_checkpoints
                self._ckpt_error = e

        import threading

        self._ckpt_error = None
        self._ckpt_thread = threading.Thread(target=_guarded, name="ckpt-save")
        self._ckpt_thread.start()

    def finish_checkpoints(self):
        """Join the in-flight async checkpoint save, re-raising its error.

        Called before every restore (the newest snapshot must be durable
        first), before the next save, and at the end of ``train()``."""
        t, self._ckpt_thread = self._ckpt_thread, None
        if t is not None:
            t.join()
            err, self._ckpt_error = getattr(self, "_ckpt_error", None), None
            if err is not None:
                raise err

    def load_checkpoint(self, name: str, directory: Path | None = None):
        self.finish_checkpoints()  # the newest snapshot must be durable
        ckpt = CheckpointManager(directory or self.checkpoint_dir)
        if self.state is None:
            self.state = self.init_state()
        # The sidecar says whether moments were saved bf16
        # (checkpoint_moments_bf16): restore against a matching-dtype
        # template, then cast back to the live state's dtypes.
        extra = ckpt.load_extra(name)
        template = self.state
        if (extra or {}).get("moments_dtype") == "bfloat16":
            template = _moments_to_bf16(template)
        restored = ckpt.restore(name, template=template)
        self.state = restored._replace(
            opt_state=_cast_like(restored.opt_state, self.state.opt_state)
        )
        if self.mesh is not None:
            # restore() returns host numpy arrays; under data parallelism
            # the state must be re-replicated across the mesh exactly as
            # init_state does, or the first DP step sees unsharded inputs.
            from ..parallel import replicate

            self.state = replicate(self.state, self.mesh)
        if extra:
            self._build(
                extra["encoder_lr"],
                extra["decoder_lr"],
                extra["complexity_penalty"],
            )
        return extra

    def resume_from(self, name: str, directory: Path | None = None) -> int:
        """Restore a full training snapshot; returns the completed epoch.

        Restores what ``load_checkpoint`` does plus metrics (early-stopping
        state), the dataset curriculum epoch (negative-sampling offset),
        and the host PRNG key — everything needed for the resumed
        trajectory to match the uninterrupted one."""
        extra = self.load_checkpoint(name, directory) or {}
        snap = extra.get("train_state")
        if not snap:
            return -1
        self.metrics = TrainingMetrics(**snap["metrics"])
        self.train_dataset.set_epoch(snap["dataset_epoch"])
        self.rng = jnp.asarray(snap["rng_key"], dtype=jnp.uint32)
        return int(snap["epoch"])

    def _dump_audio(self, epoch: int, iteration: int, batch: np.ndarray):
        """Input/output wav dump + complex-size metadata
        (trainer.py:163-184), using the deterministic eval path."""
        cfg = self.cfg
        if batch.ndim == 2:  # index batch (device-corpus path) -> anchor row
            x = jnp.asarray(
                np.asarray(self.train_dataset.waveforms)[batch[:1, 0]]
            )[:, None, :]
        else:
            x = jnp.asarray(batch[:1, 0] if batch.ndim == 4 else batch[:1])
        out = self._dump_fwd(self.state.params, x)
        d = self.checkpoint_dir / f"samples/epoch_{epoch}_iter_{iteration}"
        d.mkdir(parents=True, exist_ok=True)
        save_wav(d / f"input_{iteration}.wav", np.asarray(x[0]), cfg.sample_rate)
        save_wav(
            d / f"output_{iteration}.wav",
            np.asarray(out.waveform[0]),
            cfg.sample_rate,
        )
        masks = out.encoder_output.masks
        meta = {
            "complex_data": {
                "num_vertices": int(masks[0][0].sum()),
                "num_edges": int(masks[1][0].sum()),
                "num_triangles": int(masks[2][0].sum()),
                "num_tetra": int(masks[3][0].sum()),
            }
        }
        (d / f"metadata_{iteration}.json").write_text(json.dumps(meta, indent=2))
