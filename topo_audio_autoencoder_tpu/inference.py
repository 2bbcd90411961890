"""Inference API: codec-style encode/decode + parameter save/load.

The reference exposes inference only through ``AudioAutoencoder.forward``
(reference: audio2complex.py:40-58); a framework user also needs the
codec view of the model — waveform -> discrete simplicial latent ->
waveform — plus persistence. This module provides:

- ``Codec.encode``: waveform -> binary per-rank simplex masks + rectified
  probabilities (the deterministic eval path: thresholded relaxation,
  encoder.py:43-47).
- ``Codec.decode``: masks/probs -> waveform, by rebuilding embeddings +
  operators from the latent alone (no encoder re-run) — proving the
  latent is a *sufficient* code.
- ``Codec.reconstruct``: fused jitted encode+decode.
- ``pack_latent`` / ``unpack_latent``: the wire format — one bit per
  simplex, ``ceil((n + C(n,2) + C(n,3) + C(n,4)) / 8)`` bytes per clip
  (n=20: 6,195 bits = 775 bytes for 4 s of 16 kHz audio ≈ 1.55 kbit/s).
  Lossless for *Gumbel* eval-path latents (thresholding yields exact
  {0,1} probs and rectification maps binaries to binaries); Hard
  Concrete eval probs are continuous and quantize — see ``pack_latent``.
- ``save_params`` / ``load_params``: Orbax round trip.
"""

from __future__ import annotations

import math
from functools import partial
from pathlib import Path
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from .models.autoencoder import AudioAutoencoder
from .topology.rectifier import RectifiedProbs
from .training.checkpoint import CheckpointManager


class SimplicialLatent(NamedTuple):
    """The discrete code: per-rank probabilities (binary at eval) shaped
    [B, S_r]. ``masks`` derive as probs > 0."""

    vertices: jnp.ndarray
    edges: jnp.ndarray
    triangles: jnp.ndarray
    tetra: jnp.ndarray

    @property
    def ranks(self):
        return (self.vertices, self.edges, self.triangles, self.tetra)


class Codec:
    """Jitted codec view over a trained autoencoder."""

    def __init__(self, model: AudioAutoencoder, params):
        self.model = model
        self.params = params

        @jax.jit
        def _encode(params, x):
            enc = model.apply(
                params, x, 1.0, None, False,
                method=lambda m, a, t, r, tr: m.encode(a, t, r, tr),
            )
            return SimplicialLatent(*enc.probs.ranks)

        @partial(jax.jit, static_argnums=(2,))
        def _decode(params, latent: SimplicialLatent, desired_length: int):
            # decode_from_probs re-rectifies, restoring face closure for
            # thresholded (pack_latent) Hard Concrete latents; idempotent
            # for already-valid latents.
            probs = RectifiedProbs(*latent.ranks)
            return model.apply(
                params, probs, desired_length,
                method=lambda m, p, dl: m.decode_from_probs(p, dl),
            )

        @jax.jit
        def _reconstruct(params, x):
            return model.apply(params, x, 1.0, None, False).waveform

        self._encode = _encode
        self._decode = _decode
        self._reconstruct = _reconstruct

    def encode(self, x: jnp.ndarray) -> SimplicialLatent:
        """[B, 1, T] -> binary simplicial latent."""
        return self._encode(self.params, x)

    def decode(self, latent: SimplicialLatent, num_samples: int) -> jnp.ndarray:
        """latent -> [B, 1, num_samples]."""
        return self._decode(
            self.params, latent, num_samples // self.model.num_bands
        )

    def reconstruct(self, x: jnp.ndarray) -> jnp.ndarray:
        return self._reconstruct(self.params, x)


def pack_latent(latent: SimplicialLatent) -> np.ndarray:
    """Latent -> ``[..., ceil(S_total/8)]`` uint8 bitstream.

    Ranks concatenate in order (vertices, edges, triangles, tetra) along
    the last axis before packing, so the bit layout matches the flat
    logit order (reference: encoder.py:291-297 ``split_simplices``).

    Binarization thresholds at 0.5. Lossless ONLY for binary latents —
    the Gumbel eval path yields exact {0, 1} probs. The Hard Concrete
    eval path yields *continuous* probs in [0, 1] (samplers.py), which
    quantize here: the decode of the packed latent differs from the
    decode of the original probs (the probs scale the decoder
    embeddings). ``Codec.decode`` re-rectifies, so the thresholded
    latent is always decoded as a valid complex; measure the
    quantization with the recipe's hard-eval probe
    (benchmarks/full_recipe.py).
    """
    bits = np.concatenate(
        [np.asarray(r) >= 0.5 for r in latent.ranks], axis=-1
    )
    return np.packbits(bits.astype(np.uint8), axis=-1)


def unpack_latent(
    packed: np.ndarray, num_vertices: int, dtype=jnp.float32
) -> SimplicialLatent:
    """Inverse of :func:`pack_latent` for a complete complex on
    ``num_vertices`` vertices (rank sizes are the binomials C(n, k+1))."""
    sizes = [math.comb(num_vertices, k) for k in range(1, 5)]
    bits = np.unpackbits(
        np.asarray(packed, dtype=np.uint8), axis=-1, count=sum(sizes)
    )
    splits = np.split(bits, np.cumsum(sizes)[:-1], axis=-1)
    return SimplicialLatent(*(jnp.asarray(s, dtype=dtype) for s in splits))


def save_params(directory: str | Path, params, name: str = "params") -> None:
    CheckpointManager(directory).save(name, params)


def load_params(directory: str | Path, template, name: str = "params"):
    return CheckpointManager(directory).restore(name, template=template)
