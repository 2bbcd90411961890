"""ctypes bindings for the native (C++) host audio runtime.

Wraps ``native/audio_loader.cpp``: wav decode and multithreaded contrastive
batch assembly. The library is built on demand with g++ (no pybind11 in
this environment); every entry point has a pure-numpy fallback so the
framework works without a toolchain.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from pathlib import Path

import numpy as np

_NATIVE_DIR = Path(__file__).resolve().parents[2] / "native"
_LIB_PATH = _NATIVE_DIR / "libtaa_audio.so"
_lib = None
_tried = False


def _build() -> bool:
    try:
        subprocess.run(
            ["make", "-s", "libtaa_audio.so"],
            cwd=_NATIVE_DIR,
            check=True,
            capture_output=True,
            timeout=120,
        )
        return True
    except Exception:
        return False


def get_lib():
    """Load (building if needed) the native library, or None."""
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    _tried = True
    if not _LIB_PATH.exists() and not _build():
        return None
    try:
        lib = ctypes.CDLL(str(_LIB_PATH))
    except OSError:
        return None
    f32p = ctypes.POINTER(ctypes.c_float)
    i32p = ctypes.POINTER(ctypes.c_int32)
    lib.taa_load_wav.restype = ctypes.c_int
    lib.taa_load_wav.argtypes = [
        ctypes.c_char_p, f32p, ctypes.c_int, ctypes.c_int,
    ]
    lib.taa_assemble_contrastive_batch.restype = None
    lib.taa_assemble_contrastive_batch.argtypes = [
        f32p, ctypes.c_int, ctypes.c_int, i32p, ctypes.c_int, i32p,
        ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int,
        ctypes.c_uint64, f32p, ctypes.c_int,
    ]
    lib.taa_gather_batch.restype = None
    lib.taa_gather_batch.argtypes = [
        f32p, ctypes.c_int, i32p, ctypes.c_int, f32p,
    ]
    _lib = lib
    return _lib


def native_available() -> bool:
    return get_lib() is not None


def _f32p(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_float))


def _i32p(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_int32))


def load_wav_native(
    path: str | Path, max_samples: int = 16000 * 30, target_sr: int = 16000
) -> np.ndarray | None:
    """Decode+resample a wav natively; None if the library is unavailable
    or the file unsupported (caller falls back to scipy)."""
    lib = get_lib()
    if lib is None:
        return None
    out = np.zeros(max_samples, dtype=np.float32)
    n = lib.taa_load_wav(
        str(path).encode(), _f32p(out), max_samples, target_sr
    )
    if n < 0:
        return None
    return out[:n].copy()


def assemble_contrastive_batch(
    corpus: np.ndarray,  # [N, T] float32, C-contiguous
    anchors: np.ndarray,  # [B] int32
    neighbors: np.ndarray,  # [N, N-1] int32, C-contiguous
    num_pos: int,
    num_neg: int,
    neg_end: int,
    seed: int,
    num_threads: int | None = None,
) -> np.ndarray:
    """[B, 2+num_neg, T] contrastive stacks; native if possible."""
    corpus = np.ascontiguousarray(corpus, dtype=np.float32)
    anchors = np.ascontiguousarray(anchors, dtype=np.int32)
    neighbors = np.ascontiguousarray(neighbors, dtype=np.int32)
    n, t = corpus.shape
    b = len(anchors)
    lib = get_lib()
    if lib is None:
        return _assemble_numpy(
            corpus, anchors, neighbors, num_pos, num_neg, neg_end, seed
        )
    out = np.empty((b, 2 + num_neg, t), dtype=np.float32)
    if num_threads is None:
        num_threads = min(8, os.cpu_count() or 1)
    lib.taa_assemble_contrastive_batch(
        _f32p(corpus), n, t, _i32p(anchors), b, _i32p(neighbors),
        neighbors.shape[1], num_pos, num_neg, neg_end,
        ctypes.c_uint64(seed), _f32p(out), num_threads,
    )
    return out


def _assemble_numpy(
    corpus, anchors, neighbors, num_pos, num_neg, neg_end, seed
) -> np.ndarray:
    """Pure-numpy fallback with the same window semantics (RNG differs)."""
    n_nb = neighbors.shape[1]
    neg_end = min(neg_end, n_nb)
    neg_start = max(0, neg_end - num_neg)
    rng = np.random.default_rng(seed)
    rows = []
    for a in anchors:
        pos = neighbors[a, rng.integers(0, min(num_pos, n_nb))]
        negs = neighbors[a, neg_start:neg_end]
        if len(negs) < num_neg:
            negs = np.pad(negs, (0, num_neg - len(negs)), mode="edge")
        rows.append(corpus[np.concatenate([[a, pos], negs])])
    return np.stack(rows)


def gather_batch(corpus: np.ndarray, idxs: np.ndarray) -> np.ndarray:
    corpus = np.ascontiguousarray(corpus, dtype=np.float32)
    idxs = np.ascontiguousarray(idxs, dtype=np.int32)
    lib = get_lib()
    if lib is None:
        return corpus[idxs].copy()
    out = np.empty((len(idxs), corpus.shape[1]), dtype=np.float32)
    lib.taa_gather_batch(
        _f32p(corpus), corpus.shape[1], _i32p(idxs), len(idxs), _f32p(out)
    )
    return out
