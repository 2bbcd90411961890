"""Pseudo-QMF (PQMF) analysis/synthesis filterbank, TPU-native.

Re-implements the behavior of ``rave.pqmf.PQMF(attenuation=100, n_band=16,
polyphase=True)`` used by the reference (audio2complex.py:36): a cosine-
modulated near-perfect-reconstruction filterbank splitting a waveform into
``n_band`` critically-sampled subbands and back.

Design (host-side, numpy/scipy, once per model):
- Kaiser-windowed lowpass prototype at the requested stopband attenuation;
  tap count from the Kaiser formula with transition width ~ the band edge.
- The cutoff is then *optimized* (scalar search) to minimize the measured
  end-to-end reconstruction error of the full analysis+synthesis system —
  the same near-PR criterion RAVE optimizes, evaluated directly.
- Cosine modulation into M bands:
      h_k[t] = 2 h[t] cos((2k+1) * (pi/2M) * (t - (N-1)/2) + (-1)^k * pi/4)

Compute (device-side, JAX):
- Analysis = one strided conv [B,1,T] -> [B,M,T/M] with stride M. XLA lowers
  a strided multi-filter conv to an im2col matmul on the MXU — this *is* the
  polyphase fast path; no per-phase bookkeeping needed.
- Synthesis = the exact adjoint conv (lhs-dilated conv with flipped kernels)
  scaled by exactly M (the cosine-modulation energy normalization — no
  empirical calibration factor), making forward→inverse a near-identity
  with zero delay (symmetric padding, linear-phase filters); the
  round-trip error is pinned by tests/test_ops.py.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from functools import lru_cache

import jax.numpy as jnp
import numpy as np
from jax import lax
from scipy import signal as sps
from scipy.optimize import minimize_scalar


def _kaiser_prototype(cutoff: float, attenuation: float, n_band: int) -> np.ndarray:
    """Kaiser-designed linear-phase lowpass prototype (odd length)."""
    width = 1.0 / (2.0 * n_band)  # transition width ~ half band, Nyquist=1
    numtaps, beta = sps.kaiserord(attenuation, width)
    numtaps |= 1  # force odd for exact linear phase / zero delay
    return sps.firwin(numtaps, cutoff, window=("kaiser", beta), fs=2.0)


def _modulate(h: np.ndarray, n_band: int) -> np.ndarray:
    """Cosine-modulate the prototype into the M analysis filters [M, N]."""
    n = h.shape[-1]
    t = np.arange(n) - (n - 1) / 2
    k = np.arange(n_band)[:, None]
    phase = ((-1.0) ** k) * np.pi / 4.0
    return 2.0 * h[None, :] * np.cos((2 * k + 1) * np.pi / (2 * n_band) * t + phase)


def _np_analysis(x: np.ndarray, hk: np.ndarray, n_band: int) -> np.ndarray:
    """Host reference analysis (correlation semantics, matching lax.conv).

    out[k, j] = sum_n x_padded[j*M + n] * hk[k, n], centered (zero delay).
    x [T] -> [M, T/M].
    """
    n = hk.shape[-1]
    pad = n // 2
    xp = np.pad(x, (pad, pad))
    m, tm = n_band, len(x) // n_band
    out = np.empty((m, tm))
    for band in range(m):
        full = np.correlate(xp, hk[band], mode="valid")  # length T
        out[band] = full[: tm * n_band : n_band]
    return out


def _np_synthesis(z: np.ndarray, hk: np.ndarray, n_band: int) -> np.ndarray:
    """Host reference synthesis: M * exact adjoint of ``_np_analysis``.

    x_hat[t] = M * sum_{k,j} z[k, j] * hk[k, t - j*M + pad].
    """
    m, tm = z.shape
    n = hk.shape[-1]
    t = tm * m
    pad = n // 2
    acc = np.zeros(t)
    for band in range(m):
        up = np.zeros(t)
        up[::n_band] = z[band]
        acc += np.convolve(up, hk[band], mode="full")[pad : pad + t]
    return n_band * acc


def _reconstruction_error(h: np.ndarray, n_band: int) -> float:
    """Steady-state relative L2 reconstruction error on white noise.

    Measured over the signal interior only: the first/last 2N samples carry
    the zero-padding edge transient that any finite conv filterbank has, and
    including them would swamp the filter-quality signal the cutoff search
    needs (edge error ~1e-2 vs interior ~1e-4..1e-3).
    """
    rng = np.random.default_rng(0)
    x = rng.standard_normal(8 * n_band * 64)
    hk = _modulate(h, n_band)
    y = _np_synthesis(_np_analysis(x, hk, n_band), hk, n_band)
    n = h.shape[-1]
    s = slice(2 * n, len(x) - 2 * n)
    return float(np.linalg.norm(y[s] - x[s]) / np.linalg.norm(x[s]))


def design_prototype(attenuation: float, n_band: int) -> tuple[np.ndarray, float]:
    """Optimize prototype cutoff for minimum reconstruction error.

    Returns (prototype, achieved relative reconstruction error).
    """
    ideal = 1.0 / (2.0 * n_band)

    def objective(c):
        return _reconstruction_error(_kaiser_prototype(c, attenuation, n_band), n_band)

    res = minimize_scalar(
        objective, bounds=(0.5 * ideal, 1.5 * ideal), method="bounded",
        options={"xatol": ideal * 1e-4},
    )
    h = _kaiser_prototype(float(res.x), attenuation, n_band)
    return h, float(res.fun)


@lru_cache(maxsize=8)
def _design_cached(attenuation: float, n_band: int):
    """The cutoff optimization costs ~10s of host time per (att, M) — cache
    it per process so repeated model creation is free."""
    return design_prototype(attenuation, n_band)


@dataclass(frozen=True, eq=False)
class PQMF:
    """Near-perfect-reconstruction pseudo-QMF filterbank.

    forward: [B, 1, T] -> [B, M, T/M]   (T must be divisible by M)
    inverse: [B, M, T/M] -> [B, 1, T]
    """

    attenuation: float = 100.0
    n_band: int = 16
    filters: np.ndarray = field(default=None, repr=False)  # [M, N]
    recon_error: float = field(default=0.0)

    @classmethod
    def create(cls, attenuation: float = 100.0, n_band: int = 16) -> "PQMF":
        h, err = _design_cached(float(attenuation), int(n_band))
        hk = _modulate(h, n_band).astype(np.float32)
        return cls(attenuation=attenuation, n_band=n_band, filters=hk, recon_error=err)

    @property
    def taps(self) -> int:
        return self.filters.shape[-1]

    def forward(self, x: jnp.ndarray) -> jnp.ndarray:
        """Analysis. x: [B, 1, T] -> [B, M, T/M]."""
        m, n = self.filters.shape
        pad = n // 2
        w = jnp.asarray(self.filters, dtype=x.dtype)[:, None, :]  # [M, 1, N]
        return lax.conv_general_dilated(
            x,
            w,
            window_strides=(m,),
            padding=[(pad, pad - (m - 1))],
            dimension_numbers=("NCH", "OIH", "NCH"),
        )

    def inverse(self, z: jnp.ndarray) -> jnp.ndarray:
        """Synthesis: M * adjoint(analysis). z: [B, M, T/M] -> [B, 1, T]."""
        m, n = self.filters.shape
        pad = n // 2
        # Adjoint of a strided conv = lhs-dilated conv with flipped kernels
        # and swapped in/out channels. Padding derived so output length = T.
        w = jnp.asarray(self.filters[:, ::-1].copy(), dtype=z.dtype)[None, :, :]
        pal = n - 1 - pad
        par = n - 1 - (pad - (m - 1))
        y = lax.conv_general_dilated(
            z,
            w,
            window_strides=(1,),
            padding=[(pal, par)],
            lhs_dilation=(m,),
            dimension_numbers=("NCH", "OIH", "NCH"),
        )
        return y * float(m)
