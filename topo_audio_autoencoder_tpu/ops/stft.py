"""Multiscale magnitude STFT and spectral distances, TPU-native.

Re-implements the behavior of ``rave.core.MultiScaleSTFT(scales=[2048,1024,
512,256,128], magnitude=True, sample_rate=16000)`` and
``rave.core.AudioDistanceV1`` used by the reference (loss.py:20-22,
precompute_distances.py:33-49).

TPU-first framing: torch.stft gathers overlapping frames; gathers are slow
on TPU. Because hop = n_fft/4 exactly, overlapping frames are produced with
pure reshapes and static slices — reshape the signal to [frames, hop] and
concatenate 4 shifted views along the last axis. Zero gathers, zero dynamic
shapes; the windowing fuses into the rfft's input.

Conventions (self-consistent; documented rather than bit-matching torch):
- centered frames: reflect-pad n_fft//2 on both sides (torch.stft center=True)
- Hann window, hop = n_fft // 4
- 'normalized' magnitudes: divided by sqrt(n_fft), torch.stft(normalized=True)
"""

from __future__ import annotations

from functools import lru_cache, partial

import jax
import jax.numpy as jnp
import numpy as np

DEFAULT_SCALES = (2048, 1024, 512, 256, 128)


def frame_signal(x: jnp.ndarray, n_fft: int, hop: int) -> jnp.ndarray:
    """Overlapping frames via reshape+shift (requires n_fft % hop == 0).

    x: [..., T] (T divisible by hop after padding) -> [..., F, n_fft]
    """
    if n_fft % hop != 0:
        raise ValueError("n_fft must be a multiple of hop for reshape framing")
    ratio = n_fft // hop
    t = x.shape[-1]
    # right-pad so T is a multiple of hop
    pad = (-t) % hop
    if pad:
        x = jnp.pad(x, [(0, 0)] * (x.ndim - 1) + [(0, pad)])
    chunks = x.reshape(*x.shape[:-1], -1, hop)  # [..., T/hop, hop]
    n_chunks = chunks.shape[-2]
    n_frames = n_chunks - ratio + 1
    views = [chunks[..., i : i + n_frames, :] for i in range(ratio)]
    return jnp.concatenate(views, axis=-1)  # [..., F, n_fft]


@lru_cache(maxsize=16)
def _windowed_dft_matrices(n_fft: int) -> tuple[np.ndarray, np.ndarray]:
    """Hann-windowed real-DFT basis [n_fft, n_fft//2+1] (cos, -sin).

    The window folds into the basis so the whole STFT is two matmuls.
    """
    k = np.arange(n_fft // 2 + 1)
    t = np.arange(n_fft)
    ang = 2.0 * np.pi * np.outer(t, k) / n_fft
    w = np.hanning(n_fft + 1)[:-1]
    return (
        (np.cos(ang) * w[:, None]).astype(np.float32),
        (-np.sin(ang) * w[:, None]).astype(np.float32),
    )


@lru_cache(maxsize=16)
def _dft_matrices(n_fft: int) -> tuple[np.ndarray, np.ndarray]:
    """Unwindowed real-DFT basis [n_fft, n_fft//2+1] (cos, -sin)."""
    k = np.arange(n_fft // 2 + 1)
    t = np.arange(n_fft)
    ang = 2.0 * np.pi * np.outer(t, k) / n_fft
    return np.cos(ang).astype(np.float32), (-np.sin(ang)).astype(np.float32)


@partial(jax.custom_vjp, nondiff_argnums=(1,))
def _mag_hybrid(fw: jnp.ndarray, n_fft: int) -> jnp.ndarray:
    """|rfft(fw)| / sqrt(n) with an MXU-matmul VJP.

    TPU asymmetry (measured, v5e): XLA's forward FFT is ~80x faster than
    the DFT-matmul, but differentiating through it is ~2x *slower* than
    matmul backward. So: primal via rfft, cotangent via two batched
    matmuls against the DFT basis —
        d|S|/dfw = (re * ct) @ C^T + (im * ct) @ S^T, scaled by 1/(n|S|).
    """
    spec = jnp.fft.rfft(fw.astype(jnp.float32), axis=-1)
    return (jnp.abs(spec) / np.sqrt(n_fft)).astype(fw.dtype)


def _mag_hybrid_fwd(fw, n_fft):
    spec = jnp.fft.rfft(fw.astype(jnp.float32), axis=-1)
    mag_un = jnp.abs(spec)  # unnormalized magnitude
    inv = 1.0 / (mag_un + 1e-24)
    # residuals: unit-phase components (re, im)/|S| — same memory as the
    # spectrum itself. (The cotangent carries the in/out dtype: fwd output
    # dtype == input dtype.)
    res = (jnp.real(spec) * inv, jnp.imag(spec) * inv)
    return (mag_un / np.sqrt(n_fft)).astype(fw.dtype), res


def _mag_hybrid_bwd(n_fft, res, ct):
    re_u, im_u = res
    cos_b, nsin_b = _dft_matrices(n_fft)
    scale = 1.0 / np.sqrt(n_fft)
    ctf = ct.astype(jnp.float32) * scale
    g = (ctf * re_u) @ jnp.asarray(cos_b).T + (ctf * im_u) @ jnp.asarray(nsin_b).T
    return (g.astype(ct.dtype),)


_mag_hybrid.defvjp(_mag_hybrid_fwd, _mag_hybrid_bwd)


def stft_magnitude(
    x: jnp.ndarray,
    n_fft: int,
    hop: int | None = None,
    method: str = "auto",
) -> jnp.ndarray:
    """Centered, Hann-windowed, normalized magnitude STFT.

    x: [..., T] -> [..., F, n_fft//2 + 1]

    method:
    - 'fft': jnp.fft.rfft end to end.
    - 'matmul': windowed real DFT as two MXU matmuls (frames @ basis).
    - 'hybrid': rfft forward + matmul custom-VJP backward (see
      ``_mag_hybrid``).
    - 'auto': matmul on TPU, fft elsewhere. Measured on v5e (8x64000
      5-scale loss): matmul 1.2ms fwd / 1.5ms grad, fft 2.4/3.2,
      hybrid 2.5/2.7 — the batched MXU matmul wins both directions.
    """
    hop = hop or n_fft // 4
    pad = n_fft // 2
    x = jnp.pad(x, [(0, 0)] * (x.ndim - 1) + [(pad, pad)], mode="reflect")
    frames = frame_signal(x, n_fft, hop)
    if method == "auto":
        method = "matmul" if jax.default_backend() == "tpu" else "fft"
    if method == "matmul":
        cos_b, nsin_b = _windowed_dft_matrices(n_fft)
        f32 = frames.astype(jnp.float32)
        re = f32 @ jnp.asarray(cos_b)
        im = f32 @ jnp.asarray(nsin_b)
        mag = jnp.sqrt(re * re + im * im + 1e-24)
        return (mag / np.sqrt(n_fft)).astype(frames.dtype)
    window = jnp.asarray(np.hanning(n_fft + 1)[:-1], dtype=x.dtype)
    # NOTE: the fft paths cannot run inside a grad-of-vmap program over
    # mesh-sharded inputs on the CPU backend — XLA:CPU's FftThunk
    # RET_CHECK-rejects the non-dim0-major layouts that composition
    # produces (fft_thunk.cc "IsMonotonicWithDim0Major"), and neither
    # optimization_barrier nor rank-2 reshapes pin the autodiff
    # intermediates. Callers in that regime (the vmapped grid tuner) pass
    # method='matmul' explicitly — see spectral_distance(method=...).
    if method == "hybrid":
        return _mag_hybrid(frames * window, n_fft)
    spec = jnp.fft.rfft(frames * window, axis=-1)
    return jnp.abs(spec) / np.sqrt(n_fft)


def multiscale_stft(
    x: jnp.ndarray, scales: tuple[int, ...] = DEFAULT_SCALES
) -> list[jnp.ndarray]:
    """Magnitude STFTs at each scale (hop = scale/4). x: [..., T]."""
    return [stft_magnitude(x, s) for s in scales]


def _mean_over_nonbatch(v: jnp.ndarray, batch_ndim: int) -> jnp.ndarray:
    axes = tuple(range(batch_ndim, v.ndim))
    return jnp.mean(v, axis=axes)


def spectral_distance(
    x: jnp.ndarray,
    y: jnp.ndarray,
    scales: tuple[int, ...] = DEFAULT_SCALES,
    log_epsilon: float = 1e-7,
    batch_ndim: int = 1,
    method: str = "auto",
) -> jnp.ndarray:
    """Batch-preserving AudioDistanceV1: per scale, relative-L2 on linear
    magnitudes (normalized by x's energy) + L1 on log magnitudes, summed
    over scales (precompute_distances.py:11-49). Returns [batch...].

    STFTs are computed in float32 regardless of input dtype: the loss is the
    training signal and bf16 magnitudes lose too much of the log term.

    ``method`` forwards to ``stft_magnitude`` — callers whose program is a
    grad-of-vmap over mesh-sharded inputs must pass 'matmul' (see the
    FftThunk note there).
    """
    x = x.astype(jnp.float32)
    y = y.astype(jnp.float32)
    dist = 0.0
    for s in scales:
        sx = stft_magnitude(x, s, method=method)
        sy = stft_magnitude(y, s, method=method)
        lin = _mean_over_nonbatch((sx - sy) ** 2, batch_ndim) / (
            _mean_over_nonbatch(sx**2, batch_ndim) + 1e-7
        )
        log = _mean_over_nonbatch(
            jnp.abs(jnp.log(sx + log_epsilon) - jnp.log(sy + log_epsilon)), batch_ndim
        )
        dist = dist + lin + log
    return dist


@partial(jax.jit, static_argnames=("scales",))
def spectral_distance_matrix_block(
    xs: jnp.ndarray, ys: jnp.ndarray, scales: tuple[int, ...] = DEFAULT_SCALES
) -> jnp.ndarray:
    """Pairwise spectral distances between two stacks of waveforms.

    xs: [A, T], ys: [B, T] -> [A, B]. Computes each stack's multiscale STFT
    once — the on-device replacement for the reference's Python pair loop
    (precompute_distances.py:96-115), which recomputed both STFTs per pair.

    Memory shape matters at tile sizes: a naive [A, B, F, K] broadcast is
    ~2 GB per scale at 64x64 tiles of 4 s clips. Instead:
    - the relative-L2 term expands to ||x||² + ||y||² - 2<x, y> — one
      [A, FK] @ [FK, B] MXU matmul;
    - the L1 log term cannot factor through a matmul, so it scans over
      fixed-size chunks of the flattened (F*K) axis: each step broadcasts
      only [A, B, chunk] (~130 MB at 64x64 tiles) and accumulates into the
      [A, B] result.
    """
    xs = xs.astype(jnp.float32)
    ys = ys.astype(jnp.float32)
    out = 0.0
    for s in scales:
        sx = stft_magnitude(xs, s)  # [A, F, K]
        sy = stft_magnitude(ys, s)  # [B, F, K]
        n_elem = sx.shape[-1] * sx.shape[-2]
        fx = sx.reshape(sx.shape[0], -1)  # [A, FK]
        fy = sy.reshape(sy.shape[0], -1)  # [B, FK]
        x2 = (fx * fx).sum(-1)  # [A]
        y2 = (fy * fy).sum(-1)  # [B]
        cross = fx @ fy.T  # [A, B] — the MXU does the pair work
        sq = jnp.maximum(x2[:, None] + y2[None, :] - 2.0 * cross, 0.0)
        lin = (sq / n_elem) / (x2[:, None] / n_elem + 1e-7)

        lx = jnp.log(fx + 1e-7)  # [A, FK]
        ly = jnp.log(fy + 1e-7)  # [B, FK]
        chunk = 8192
        pad = (-lx.shape[-1]) % chunk
        # pad with a common value so padded positions contribute zero
        lxp = jnp.pad(lx, ((0, 0), (0, pad)))
        lyp = jnp.pad(ly, ((0, 0), (0, pad)))
        n_chunks = lxp.shape[-1] // chunk
        lxc = lxp.reshape(lx.shape[0], n_chunks, chunk).swapaxes(0, 1)
        lyc = lyp.reshape(ly.shape[0], n_chunks, chunk).swapaxes(0, 1)

        def body(acc, c):
            cx, cy = c
            return acc + jnp.abs(cx[:, None, :] - cy[None, :, :]).sum(-1), None

        log_sum, _ = jax.lax.scan(
            body,
            jnp.zeros((lx.shape[0], ly.shape[0]), jnp.float32),
            (lxc, lyc),
        )
        out = out + lin + log_sum / n_elem
    return out
