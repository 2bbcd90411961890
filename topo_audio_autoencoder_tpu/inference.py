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
- ``save_params`` / ``load_params``: Orbax round trip.
"""

from __future__ import annotations

from functools import partial
from pathlib import Path
from typing import NamedTuple

import jax
import jax.numpy as jnp

from .models.autoencoder import AudioAutoencoder
from .topology.builder import build_operators
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
            probs = RectifiedProbs(*latent.ranks)
            masks = tuple((p > 0).astype(p.dtype) for p in probs.ranks)
            tables = model.tables

            def run(m, probs, masks):
                embeddings = tuple(
                    m.encoder.embed_norms[r](m.encoder.embed_tables[r])
                    * probs.ranks[r][..., None]
                    for r in range(4)
                )
                ops = build_operators(probs, tables, masks=masks)
                sub = m.decoder(embeddings, ops, masks, desired_length, False)
                return m.pqmf.inverse(jnp.swapaxes(sub, -1, -2))

            return model.apply(params, probs, masks, method=run)

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


def save_params(directory: str | Path, params, name: str = "params") -> None:
    CheckpointManager(directory).save(name, params)


def load_params(directory: str | Path, template, name: str = "params"):
    return CheckpointManager(directory).restore(name, template=template)
