"""File-based data-pipeline rehearsal at NSynth-like scale (VERDICT r4 #6).

Every quality number so far used the in-memory synthetic corpus; the
wav-file ingestion path (reference: main.py:25-87, nsyth_dataset.py:7-72)
was unit-tested but never exercised at scale. This harness measures the
FULL file-based pipeline end to end, stage by stage:

  1. synthesize  N wav FILES on disk (16-bit PCM; a fraction at 24 kHz
                 to exercise the resampler) — stands in for NSynth
  2. ingest      preprocess_split: native C++ decode (scipy fallback)
                 -> packed train/val .npy + manifest; also A/Bs the
                 native vs scipy decoder on a sample
  3. precompute  O(N^2) spectral-distance matrix on the training slice
  4. train       2 epochs of the real Trainer with data_parallel +
                 device_corpus + shard_corpus over the visible devices
                 (the 8-device virtual CPU mesh under tests' env, the
                 chip otherwise)

Each stage prints one JSON line with wall-clock; a summary lands in
benchmarks/REHEARSAL.json. Defaults are sized for the single-core CPU
host (--files 10000 ingestion-scale, --train-clips 256 for the mesh
stages, a reduced n=8 model); pass --full-model for the flagship n=20.

Usage:
  JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
      python benchmarks/real_data_rehearsal.py [--files N] [--train-clips N]
"""
import json
import os
import shutil
import sys
import time
from pathlib import Path

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
_CACHE = "/tmp/jax_test_cache"  # share the CPU suite's persistent cache
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", _CACHE)
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0.5")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES", "0")

T0 = time.time()
ROOT = Path(__file__).resolve().parent


def arg(name, default, cast=int):
    return cast(sys.argv[sys.argv.index(name) + 1]) if name in sys.argv else default


def emit(rec, summary):
    rec["t_total_s"] = round(time.time() - T0, 1)
    summary.append(rec)
    print(json.dumps(rec), flush=True)


def main():
    import jax

    if os.environ.get("JAX_PLATFORMS") == "cpu":
        jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_compilation_cache_dir", _CACHE)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

    import numpy as np
    from scipy.io import wavfile

    from topo_audio_autoencoder_tpu.data import (
        NSynthDataset, compute_distances, synth_corpus,
    )
    from topo_audio_autoencoder_tpu.data.preprocess import (
        load_wav, preprocess_split,
    )
    from topo_audio_autoencoder_tpu.data.native_loader import (
        load_wav_native, native_available,
    )
    from topo_audio_autoencoder_tpu.models import AudioAutoencoder
    from topo_audio_autoencoder_tpu.training import Trainer, TrainerConfig

    n_files = arg("--files", 10000)
    n_train = arg("--train-clips", 256)
    t = arg("--samples", 64000)
    work = Path(arg("--work", "/tmp/rehearsal", str))
    summary = []

    # --- stage 1: synthesize wav FILES ---
    t0 = time.time()
    wav_dir = work / "wavs"
    if wav_dir.exists() and len(list(wav_dir.glob("*.wav"))) >= n_files:
        emit({"stage": "synthesize", "files": n_files, "cached": True,
              "seconds": 0.0}, summary)
    else:
        shutil.rmtree(wav_dir, ignore_errors=True)
        wav_dir.mkdir(parents=True)
        chunk = 512
        done = 0
        while done < n_files:
            k = min(chunk, n_files - done)
            clips = synth_corpus(k, n_samples=t, seed=1000 + done)
            for j in range(k):
                i = done + j
                x = np.asarray(clips[j])
                if i % 5 == 4:  # 20% at 24 kHz: exercises the resampler
                    sr = 24000
                    idx = np.clip(
                        (np.arange(int(len(x) * 1.5)) / 1.5).astype(int),
                        0, len(x) - 1,
                    )
                    x = x[idx]
                else:
                    sr = 16000
                wavfile.write(
                    wav_dir / f"clip_{i:06d}.wav", sr,
                    (np.clip(x, -1, 1) * 32767).astype(np.int16),
                )
            done += k
        emit({"stage": "synthesize", "files": n_files,
              "seconds": round(time.time() - t0, 1),
              "disk_mb": round(sum(
                  f.stat().st_size for f in wav_dir.glob("*.wav")) / 1e6, 1)},
             summary)

    # --- stage 2: ingest (native decode A/B on a sample, then the full run)
    files = sorted(wav_dir.glob("*.wav"))
    sample = files[:200]
    ab = {"native_available": native_available()}
    if native_available():
        t0 = time.time()
        for p in sample:
            load_wav_native(p, max_samples=t, target_sr=16000)
        ab["native_files_per_sec"] = round(len(sample) / (time.time() - t0), 1)
    t0 = time.time()
    for p in sample:
        load_wav(p, 16000)
    ab["scipy_files_per_sec"] = round(len(sample) / (time.time() - t0), 1)

    t0 = time.time()
    packed = preprocess_split(files, work / "packed", "all", 16000, t)
    emit({"stage": "ingest", "files": len(files),
          "seconds": round(time.time() - t0, 1),
          "files_per_sec": round(len(files) / (time.time() - t0), 1),
          "packed_mb": round(packed.nbytes / 1e6, 1), **ab}, summary)

    # parity spot-check: a 16 kHz file roundtrips to its synth source
    src = synth_corpus(1, n_samples=t, seed=1000)[0]
    got = packed[0]
    err = float(np.abs(got[: len(src)] - src).max())
    assert err < 2e-4, f"ingest mismatch vs source: {err}"

    # --- stage 3: O(N^2) distance precompute on the train slice ---
    train_wavs = packed[:n_train]
    val_wavs = packed[n_train : n_train + max(8, n_train // 4)]
    t0 = time.time()
    dists = compute_distances(train_wavs, tile=32)
    emit({"stage": "precompute", "n": n_train,
          "seconds": round(time.time() - t0, 1),
          "devices": jax.device_count()}, summary)

    # --- stage 4: 2 DP epochs, sharded device corpus over the mesh ---
    full = "--full-model" in sys.argv
    model = AudioAutoencoder.create(
        num_vertices=20 if full else 8,
        num_bands=16,
        sccn_hidden_dim=64 if full else 16,
        n_sccn_layers=6 if full else 2,
        max_active_vertices=20 if full else 8,
    )
    train_ds = NSynthDataset(train_wavs, dists["neighbors"], train=True)
    val_ds = NSynthDataset(val_wavs, train=False)
    ndev = jax.device_count()
    trainer = Trainer(
        model, train_ds, val_ds,
        config=TrainerConfig(
            checkpoint_dir=str(work / "ckpt"),
            batch_size=ndev * 2,
            max_epochs=2,
            data_parallel=True,
            shard_corpus=True,
            device_corpus=True,
            dump_audio=False,
            with_grad_norms=False,
            accumulate_grad_batches=1,
        ),
    )
    trainer.state = trainer.init_state()
    for epoch in range(2):
        t0 = time.time()
        loss = trainer.train_epoch(epoch)
        val = trainer.validate()
        emit({"stage": "train_epoch", "epoch": epoch,
              "train_loss": round(float(loss), 4),
              "val_loss": round(float(val), 4),
              "seconds": round(time.time() - t0, 1),
              "devices": ndev, "sharded_corpus": True}, summary)
        assert np.isfinite(loss) and np.isfinite(val)

    out = ROOT / "REHEARSAL.json"
    out.write_text(json.dumps({
        "files": n_files, "train_clips": n_train, "clip_samples": t,
        "full_model": full, "stages": summary,
    }, indent=1))
    print(json.dumps({"stage": "done", "out": str(out)}), flush=True)


if __name__ == "__main__":
    main()
