"""Quality evidence at the reference's full training recipe (VERDICT r1 #8).

Runs the reference schedule (main.py:261-265, trainer.py:120-161) end to end
on a >=512-clip corpus with the dataset-default G=12 contrastive stacks:

  1. on-device O(N^2) distance precompute
  2. 8-combo grid tune (encoder_lr x decoder_lr x complexity_penalty,
     5 epochs each, vmapped: the whole grid advances in one compiled step)
  3. full run <= 100 epochs, early-stop patience 20
  4. artifacts: loss curves (metrics.json), active-simplex statistics per
     epoch, reconstruction wav samples at start/mid/end

Outputs land in --out (default benchmarks/quality_run/); progress prints one
JSON line per stage. Wall-clock on one v5e chip: minutes, dominated by the
two compiles.

Usage: python benchmarks/full_recipe.py [--quick] [--epochs N] [--corpus N]
       [--resume]  # continue an interrupted run from <out>/checkpoints/best
       [--enc-lr X --dec-lr X --cpx X]  # pin the grid to ONE combo: the
           # tune stage still runs (it provides the warm start), but at
           # fixed hyperparameters — for matched-hyperparameter
           # corpus-scaling comparisons (the tuner otherwise picks
           # different combos per corpus)
       [--vertices N --hidden C --layers L]  # model-capacity axes
           # (default 20/64/6, the reference architecture). The round-3
           # corpus-scaling study showed the flagship is latent-capacity
           # bound past ~2k clips; --vertices 32 trains the 41,448-simplex
           # hierarchy the reference's dynamic-sparse design cannot. Pin
           # the combo (--enc-lr ...) for large models: the vmapped tune
           # holds the whole grid's activations in HBM at once.
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

# JAX_PLATFORMS=cpu in the env is beaten by the site plugin's
# programmatic TPU config (CLAUDE.md); honor it through the config API
# so CPU smokes never open a TPU client under a live training job.
if os.environ.get("JAX_PLATFORMS") == "cpu":
    jax.config.update("jax_platforms", "cpu")


def _arg(name, default, cast=int):
    if name in sys.argv:
        return cast(sys.argv[sys.argv.index(name) + 1])
    return default


def resume_run(trainer, out: Path) -> int:
    """Restore an interrupted recipe run in place; return the next epoch.

    Picks the freshest durable checkpoint ("latest", written every
    --ckpt-every epochs, falling back to "best", which holds the best
    *saved* epoch and may lag the true best under the same cadence),
    restores the full training snapshot (params, opt state, metrics,
    curriculum epoch, host PRNG key — Trainer.resume_from), and
    truncates probe-log entries the resumed segment will re-emit
    (including any stale "final" row). Returns 0 when there is nothing
    to resume from.
    """
    from topo_audio_autoencoder_tpu.training import CheckpointManager

    ckpt = CheckpointManager(out / "checkpoints")
    # A kill mid-save can leave a truncated snapshot (restore raises on
    # missing leaves); fall back to the next-freshest durable name rather
    # than crashing the whole recipe — under cadence gating each fallback
    # step loses at most --ckpt-every epochs beyond the freshest name.
    start_epoch = 0
    for name in ("latest", "best"):
        if not ckpt.exists(name):
            continue
        try:
            ep = trainer.resume_from(name)
        except Exception as e:
            print(json.dumps({"stage": "resume_skip", "name": name,
                              "error": type(e).__name__}), flush=True)
            continue
        if ep < 0:
            # A kill between the Orbax rename and the async sidecar write
            # leaves the checkpoint dir intact with no .extra.json:
            # resume_from returns -1 (weights restored, no trajectory).
            # Fall through to the next-freshest durable name instead of
            # silently restarting the run at epoch 0.
            print(json.dumps({"stage": "resume_skip", "name": name,
                              "error": "missing_sidecar"}), flush=True)
            continue
        start_epoch = ep + 1
        break
    if start_epoch == 0:
        return 0
    stats_file = out / "complex_stats.jsonl"
    if stats_file.exists():
        kept = [
            line for line in stats_file.read_text().splitlines()
            if line.strip()
            and isinstance(json.loads(line)["epoch"], int)
            and json.loads(line)["epoch"] < start_epoch
        ]
        stats_file.write_text("".join(line + "\n" for line in kept))
    return start_epoch


def main() -> None:
    from topo_audio_autoencoder_tpu.data import (
        ContrastiveConfig,
        NSynthDataset,
        compute_distances,
        synth_corpus,
    )
    from topo_audio_autoencoder_tpu.data.preprocess import save_wav
    from topo_audio_autoencoder_tpu.models import AudioAutoencoder
    from topo_audio_autoencoder_tpu.training import Trainer, TrainerConfig

    quick = "--quick" in sys.argv
    resume = "--resume" in sys.argv
    n_train = _arg("--corpus", 128 if quick else 512)
    max_epochs = _arg("--epochs", 8 if quick else 300)
    patience_cfg = _arg("--patience", 4 if quick else 40)
    # Round-3 diagnosis (benchmarks/overfit_probe.py): the model overfits a
    # fixed batch at ~30% spectral drop in 2k updates at ANY temperature,
    # so round 2's marginal quality run (best val at epoch 8 of 29) was
    # optimization-starved: b=32 on 512 clips = 16 steps/epoch x 29 epochs
    # = 464 updates, most applied to a decoder at lr 1e-4. Fix: halve the
    # batch (2x updates/epoch), let the LR grid reach 1e-3 for the
    # decoder, and raise the epoch/patience budget so annealing + patience
    # don't kill the run before the update count is out of the probe's
    # warm-up regime.
    # Quick length must be divisible by n_bands * 16 (the decoder's four
    # x2 upsamples fix the per-band output length to a multiple of 16).
    t = 16384 if quick else 64000
    batch = 8 if quick else 16
    scan_steps = _arg("--scan", 0 if quick else 16)
    # Fixed hyperparameters (all three given) pin the grid to one combo.
    fixed = (
        _arg("--enc-lr", None, float),
        _arg("--dec-lr", None, float),
        _arg("--cpx", None, float),
    )
    fixed = fixed if all(v is not None for v in fixed) else None
    out = Path(_arg("--out", "benchmarks/quality_run", str))
    out.mkdir(parents=True, exist_ok=True)

    def emit(**kw):
        print(json.dumps(kw), flush=True)

    t0 = time.perf_counter()
    corpus = synth_corpus(n_train + n_train // 4, n_samples=t, seed=0)
    train_wavs, val_wavs = corpus[:n_train], corpus[n_train:]
    dists = compute_distances(train_wavs, tile=64)
    emit(stage="precompute", n=n_train, seconds=round(time.perf_counter() - t0, 2))

    train_ds = NSynthDataset(
        train_wavs, dists["neighbors"], train=True,
        config=ContrastiveConfig(),  # G = 12: the dataset default
    )
    val_ds = NSynthDataset(val_wavs, train=False)
    n_vertices = _arg("--vertices", 20)
    model = AudioAutoencoder.create(
        num_vertices=n_vertices,
        num_bands=16,
        sccn_hidden_dim=_arg("--hidden", 64),
        n_sccn_layers=_arg("--layers", 6),
        # The reference's 8/20 band means "all 20 vertices may be active";
        # scale the ceiling with n so a larger hierarchy is not penalized
        # down to the flagship's effective size (vertex_count_penalty).
        max_active_vertices=n_vertices,
        # Discrete-path axes (VERDICT r3 #2): --sampler hard_concrete
        # trains the documented Hard Concrete gate; --hard trains the
        # reference's STE path (Bernoulli draw, re-rectify,
        # straight-through — reference encoder.py:341-357).
        sampler=_arg("--sampler", "gumbel", str),
        hard="--hard" in sys.argv,
        # --learned-hc trains the README-documented learned per-rank
        # beta/gamma/zeta stretch (requires --sampler hard_concrete).
        learned_hc="--learned-hc" in sys.argv,
        # --pack "0,0,512,256": static-capacity packed operators (top-K
        # active slicing, topology/packed.py) — the large-n perf lever.
        pack_capacities=_arg(
            "--pack",
            None,
            lambda s: tuple(int(v) for v in s.split(",")),
        ),
    )
    on_tpu = jax.default_backend() != "cpu"
    trainer = Trainer(
        model, train_ds, val_ds,
        config=TrainerConfig(
            checkpoint_dir=str(out / "checkpoints"),
            batch_size=batch,
            max_epochs=max_epochs,
            patience=patience_cfg,
            tuning_epochs=2 if quick else 5,
            compute_dtype="bfloat16" if on_tpu else "float32",
            dump_audio=False,  # probe dumps below instead
            checkpoint_every_iters=0,
            log_every=10,
            scan_steps=scan_steps,
            # --ckpt-bf16: save optimizer moments bfloat16 — cuts the
            # ~1 GB n=32 state to ~2/3 (the moments are 2/3 of the bytes
            # and the cast halves them) and shrinks the D2H fetch the
            # same way. Resume deviates only by the bf16 rounding of
            # mu/nu (TrainerConfig.checkpoint_moments_bf16).
            checkpoint_moments_bf16="--ckpt-bf16" in sys.argv,
        ),
    )
    # On --resume the tune stage is skipped: the tuned combo is re-applied
    # from the checkpoint sidecar — it is already folded into the run.
    start_epoch = resume_run(trainer, out) if resume else 0
    if start_epoch:
        emit(stage="resume", start_epoch=start_epoch,
             best_val_loss=round(trainer.metrics.best_val_loss, 4))
    else:
        trainer.state = trainer.init_state()
        # Fresh start into a reused --out dir: rotate a stale step log
        # aside. MetricWriter is append-only and the step counter restarts
        # at 0, so appending would interleave two runs in one file. (On
        # --resume the counter continues from the snapshot, so appending
        # is the correct behavior there.)
        log = out / "checkpoints" / "train_log.jsonl"
        if log.exists() and log.stat().st_size:
            log.rename(log.with_name("train_log_prev.jsonl"))

    # fixed probe batch for per-epoch complex statistics + audio dumps,
    # plus a held-out val probe: probe_spectral measures memorization,
    # val_spectral generalization on a PURE spectral metric (the val
    # total also carries the complexity/entropy penalties, whose scale
    # moves with the model's simplex count — not comparable across
    # capacity axes).
    probe = jnp.asarray(train_wavs[:4])[:, None, :]
    val_probe = jnp.asarray(val_wavs[:4])[:, None, :]

    from topo_audio_autoencoder_tpu.ops.stft import spectral_distance, stft_magnitude
    from topo_audio_autoencoder_tpu.topology.rectifier import RectifiedProbs

    @jax.jit
    def probe_fwd(params, x):
        dl = x.shape[-1] // model.num_bands
        enc = model.apply(
            params, x, 1.0, None, False,
            method=lambda m, a, t, r, tr: m.encode(a, t, r, tr),
        )
        wav = model.apply(
            params, enc, dl, False,
            method=lambda m, e, d, tr: m.decode(e, d, tr),
        )
        spec = spectral_distance(wav[:, 0], x[:, 0]).mean()
        # Hard-eval probe: decode the THRESHOLDED latent — exactly what the
        # codec ships (inference.pack_latent binarizes at 0.5;
        # Codec.decode -> decode_from_probs re-rectifies). For the Gumbel
        # sampler the eval probs are already {0,1} so hard == soft; for
        # Hard Concrete (continuous eval probs) this measures the
        # train-soft/eval-hard quantization gap (VERDICT r3 #2).
        hard_latent = RectifiedProbs(
            *((p >= 0.5).astype(p.dtype) for p in enc.probs.ranks)
        )
        hwav = model.apply(
            params, hard_latent, dl,
            method=lambda m, pr, d: m.decode_from_probs(pr, d),
        )
        hspec = spectral_distance(hwav[:, 0], x[:, 0]).mean()
        # Phase-blind SNR in the magnitude-STFT domain (the waveform SNR is
        # meaningless under a magnitude-only objective: phase drifts freely).
        sx = stft_magnitude(x[:, 0].astype(jnp.float32), 512)
        sy = stft_magnitude(wav[:, 0].astype(jnp.float32), 512)
        ssnr = 10.0 * jnp.log10(
            jnp.sum(sx**2) / jnp.maximum(jnp.sum((sx - sy) ** 2), 1e-12)
        )
        return (
            wav,
            tuple(m.sum(axis=-1) for m in enc.masks),
            spec,
            hspec,
            ssnr,
        )

    def complex_stats(epoch):
        wav, counts, spec, hspec, ssnr = probe_fwd(trainer.state.params, probe)
        _, _, vspec, vhspec, _ = probe_fwd(trainer.state.params, val_probe)
        # ONE device->host drain for everything except the wav (only
        # materialized at the start/mid/end dumps) — per-leaf fetches cost
        # a ~100 ms round-trip each over the remote tunnel.
        counts, spec, hspec, ssnr, vspec, vhspec = jax.device_get(
            (counts, spec, hspec, ssnr, vspec, vhspec)
        )
        counts = [np.asarray(c).mean() for c in counts]
        rec = {
            "epoch": epoch,
            "probe_spectral": round(float(spec), 4),
            "val_spectral": round(float(vspec), 4),
            "probe_hard_spectral": round(float(hspec), 4),
            "val_hard_spectral": round(float(vhspec), 4),
            "probe_spectral_snr_db": round(float(ssnr), 3),
            "active_vertices": round(float(counts[0]), 2),
            "active_edges": round(float(counts[1]), 2),
            "active_triangles": round(float(counts[2]), 2),
            "active_tetra": round(float(counts[3]), 2),
        }
        with (out / "complex_stats.jsonl").open("a") as f:
            f.write(json.dumps(rec) + "\n")
        return wav, rec

    if start_epoch == 0:
        # --- stage 2: vmapped 8-combo grid tune ---
        # Tune at a reduced batch: the whole grid trains as one vmap axis, so
        # HBM holds 8x one step's activations — b=32 G=12 x8 OOMs a v5e chip.
        t0 = time.perf_counter()
        # Grid deviates from the reference's (main.py:261-265: decoder_lr in
        # {1e-4, 5e-5}) after the round-2 diagnosis: at a few hundred updates
        # a 1e-4 decoder barely moves, and the overfit probe shows healthy
        # descent at 1e-3. The reference grid's decoder ceiling is
        # represented by 3e-4.
        grid = {
            "encoder_lr": [1e-3, 5e-4],
            "decoder_lr": [1e-3, 3e-4],
            "complexity_penalty": [0.05, 0.1],
        }
        if fixed is not None:
            grid = {
                "encoder_lr": [fixed[0]],
                "decoder_lr": [fixed[1]],
                "complexity_penalty": [fixed[2]],
            }
        full_batch = trainer.cfg.batch_size
        trainer.cfg.batch_size = min(8, full_batch)
        best = trainer.tune_hyperparameters_vmapped(grid)
        trainer.cfg.batch_size = full_batch
        emit(stage="tune", best=best, seconds=round(time.perf_counter() - t0, 2))

        # --- stage 3: full run with per-epoch probes ---
        (out / "complex_stats.jsonl").write_text("")
        wav0, stats0 = complex_stats(-1)
        save_wav(out / "sample_input.wav", np.asarray(probe[0]), 16000)
        save_wav(out / "sample_epoch_start.wav", np.asarray(wav0[0]), 16000)
        emit(stage="probe_init", **{k: v for k, v in stats0.items() if k != "epoch"})

    t0 = time.perf_counter()
    cfg = trainer.cfg
    best_val = trainer.metrics.best_val_loss if start_epoch else float("inf")
    # Durability tracking (ADVICE r4): the val loss held by the durable
    # "best" checkpoint. Under --ckpt-every>1 the global best_val can be
    # set on epochs that are never saved; gating best-saves on it would
    # then starve "best" forever. best_saved_val only ever reflects what
    # is actually on disk — read it back from the "best" sidecar on
    # resume (metrics.best_val_loss at save time equals the saved epoch's
    # val loss, because the save runs after the metrics update).
    best_saved_val = float("inf")
    if start_epoch:
        from topo_audio_autoencoder_tpu.training import CheckpointManager

        _ck = CheckpointManager(out / "checkpoints")
        if _ck.exists("best"):
            _ts = (_ck.load_extra("best") or {}).get("train_state") or {}
            best_saved_val = float(
                _ts.get("metrics", {}).get("best_val_loss", float("inf"))
            )
    last_epoch, last_val, last_saved = None, None, None
    patience = (
        max(0, (start_epoch - 1) - trainer.metrics.best_epoch)
        if start_epoch and trainer.metrics.best_epoch >= 0
        else 0
    )
    for epoch in range(start_epoch, max_epochs):
        te = time.perf_counter()
        train_loss = trainer.train_epoch(epoch)
        trainer.train_dataset.set_epoch(epoch)
        trainer.metrics.train_losses.append(train_loss)
        t_train = time.perf_counter() - te
        val_loss = trainer.validate()
        trainer.metrics.val_losses.append(val_loss)
        t_val = time.perf_counter() - te - t_train
        trainer.metrics.save(out / "checkpoints")
        wav, stats = complex_stats(epoch)
        if epoch == max_epochs // 2:
            save_wav(out / "sample_epoch_mid.wav", np.asarray(wav[0]), 16000)
        tc = time.perf_counter()
        improving = val_loss < best_val
        if improving:
            best_val = val_loss
            trainer.metrics.best_val_loss = val_loss
            trainer.metrics.best_epoch = epoch
            patience = 0
        else:
            patience += 1
        # Durable snapshot so --resume loses at most --ckpt-every epochs.
        # Default 1 = every epoch; large models should raise it — the n=32
        # state is ~1 GB, and its D2H fetch + single-core serialize costs
        # more than a training epoch. The cadence gates BOTH names: early
        # in training "best" improves every epoch, so an ungated best-save
        # would make the run checkpoint-bound anyway (see CLAUDE.md). The
        # "best" snapshot holds the best *saved* epoch — gated on
        # best_saved_val, NOT the global best_val, so an unsaved
        # off-cadence improvement can never starve later best-saves
        # (ADVICE r4); metrics (best_val_loss/best_epoch) still track the
        # true best exactly.
        if epoch % _arg("--ckpt-every", 1) == 0:
            # Improving-vs-saved epoch: best == latest — ONE device fetch,
            # two names (the 198 MB D2H is ~5 s over the tunnel; don't pay
            # it twice).
            if val_loss < best_saved_val:
                names = ("best", "latest")
                best_saved_val = val_loss
            else:
                names = ("latest",)
        else:
            names = ()
        if names:
            trainer.save_checkpoint(
                names, epoch=epoch, block=not trainer.cfg.async_checkpoint
            )
            last_saved = epoch
        last_epoch, last_val = epoch, val_loss
        t_ckpt = time.perf_counter() - tc
        emit(stage="epoch", epoch=epoch, train_loss=round(train_loss, 4),
             val_loss=round(val_loss, 4),
             **{k: v for k, v in stats.items() if k != "epoch"},
             train_s=round(t_train, 2), val_s=round(t_val, 2),
             ckpt_s=round(t_ckpt, 2),
             epoch_s=round(time.perf_counter() - te, 2))
        if patience >= cfg.patience:
            emit(stage="early_stop", epoch=epoch)
            break
    # Final durable flush (ADVICE r4): cadence gating can leave the last
    # up-to-(ckpt_every-1) epochs — including an early-stop epoch or the
    # reported best — with no durable snapshot. Save "latest"
    # unconditionally (and "best" when the in-memory state beats the best
    # *saved* val) so the "done" line below never reports a value no
    # checkpoint contains.
    if last_epoch is not None and last_saved != last_epoch:
        names = ["latest"]
        if last_val < best_saved_val:
            names.insert(0, "best")
            best_saved_val = last_val
        trainer.save_checkpoint(tuple(names), epoch=last_epoch, block=True)
    trainer.finish_checkpoints()  # last async save durable before exit
    # metrics.save inside the loop runs BEFORE the best-val update for that
    # epoch; re-save so the on-disk best fields match the final state.
    trainer.metrics.save(out / "checkpoints")
    wav_end, _ = complex_stats("final")
    save_wav(out / "sample_epoch_end.wav", np.asarray(wav_end[0]), 16000)
    emit(
        stage="done",
        epochs_run=len(trainer.metrics.train_losses),
        best_val_loss=round(trainer.metrics.best_val_loss, 4),
        best_epoch=trainer.metrics.best_epoch,
        train_seconds=round(time.perf_counter() - t0, 1),
        clips_per_sec=round(
            (len(trainer.metrics.train_losses) - start_epoch)
            * n_train / (time.perf_counter() - t0), 1
        ),
    )


if __name__ == "__main__":
    main()
