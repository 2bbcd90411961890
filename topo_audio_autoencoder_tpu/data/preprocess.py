"""Host-side corpus preprocessing: wav files -> one packed waveform array.

Equivalent of the reference ``DataProcessor`` (reference: main.py:25-87),
which torchaudio-loads each wav, resamples to 16 kHz and saves per-file
``.pt`` tensors (main.py:30-44). Here the corpus packs into a single
float32 array (optionally memory-mapped) — one sequential read at train
time instead of N file opens.

Uses scipy for wav I/O + polyphase resampling (no torchaudio dependency).
"""

from __future__ import annotations

import json
from pathlib import Path

import numpy as np
from scipy.io import wavfile
from scipy.signal import resample_poly


def load_wav(path: str | Path, target_sr: int = 16000) -> np.ndarray:
    """Load, mono-ize, resample, normalize to float32 in [-1, 1]."""
    sr, data = wavfile.read(path)
    if data.dtype == np.int16:
        x = data.astype(np.float32) / 32768.0
    elif data.dtype == np.int32:
        x = data.astype(np.float32) / 2147483648.0
    elif data.dtype == np.uint8:
        x = (data.astype(np.float32) - 128.0) / 128.0
    else:
        x = data.astype(np.float32)
    if x.ndim > 1:
        x = x.mean(axis=1)
    if sr != target_sr:
        g = np.gcd(sr, target_sr)
        x = resample_poly(x, target_sr // g, sr // g).astype(np.float32)
    return x


def save_wav(path: str | Path, x: np.ndarray, sr: int = 16000) -> None:
    """float32 [-1, 1] -> 16-bit wav (trainer.py:170-171 analog)."""
    Path(path).parent.mkdir(parents=True, exist_ok=True)
    x = np.clip(np.asarray(x).reshape(-1), -1.0, 1.0)
    wavfile.write(path, sr, (x * 32767.0).astype(np.int16))


def preprocess_split(
    wav_paths: list[str | Path],
    out_dir: str | Path,
    split: str,
    target_sr: int = 16000,
    clip_samples: int = 64000,
) -> np.ndarray:
    """Pack wavs into ``<out_dir>/<split>.npy`` + a file manifest.

    Clips are padded/truncated to ``clip_samples`` (4 s @ 16 kHz), matching
    the reference's fixed-length NSynth notes. Returns the packed array.
    """
    out_dir = Path(out_dir)
    out_dir.mkdir(parents=True, exist_ok=True)
    packed = np.zeros((len(wav_paths), clip_samples), dtype=np.float32)
    names = []
    # Native decode when the C++ runtime is available (RIFF parse +
    # resample in native/audio_loader.cpp); scipy fallback otherwise.
    # A/B at 10k files: benchmarks/real_data_rehearsal.py.
    from .native_loader import load_wav_native, native_available

    use_native = native_available()
    for i, p in enumerate(wav_paths):
        x = (
            load_wav_native(p, max_samples=clip_samples, target_sr=target_sr)
            if use_native
            else None
        )
        if x is None:
            x = load_wav(p, target_sr)
        x = x[:clip_samples]
        packed[i, : len(x)] = x
        names.append(Path(p).stem)
    np.save(out_dir / f"{split}.npy", packed)
    (out_dir / f"{split}_manifest.json").write_text(json.dumps(names))
    return packed


def load_split(out_dir: str | Path, split: str, mmap: bool = True) -> np.ndarray:
    return np.load(
        Path(out_dir) / f"{split}.npy", mmap_mode="r" if mmap else None
    )
