"""Autoencoder facade: PQMF -> encoder -> complex -> decoder -> PQMF⁻¹.

TPU-native equivalent of the reference ``AudioAutoencoder``
(reference: audio2complex.py:18-72), with the SURVEY §2.4.2/5 interface
fixes: the encoder returns a structured ``EncoderOutput`` and the aux-loss
dict {'binary_entropy', 'diversity'} is always present; the all-zero-vertex
``None`` bailout (audio2complex.py:47-48) becomes a ``valid`` flag the
objective converts into the fixed penalty loss, keeping the whole step
jittable.
"""

from __future__ import annotations

from typing import NamedTuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..ops.pqmf import PQMF
from ..topology.complexes import ComplexTables, build_tables
from .decoder import AudioDecoder
from .encoder import AudioEncoder, EncoderOutput, rank_diversity_entropy, vertex_count_penalty


class AutoencoderOutput(NamedTuple):
    waveform: jnp.ndarray  # [B, 1, T] reconstruction
    aux: dict  # {'binary_entropy': [B], 'diversity': [B]}
    valid: jnp.ndarray  # [B] bool
    encoder_output: EncoderOutput


class AudioAutoencoder(nn.Module):
    """Full model. Waveforms are NCW ([B, 1, T]) at the facade boundary to
    match the reference API; internals are channels-last."""

    tables: ComplexTables
    pqmf: PQMF
    num_bands: int = 16
    sccn_hidden_dim: int = 64
    min_active_vertices: int = 8
    max_active_vertices: int = 20
    hard: bool = False
    sampler: str = "gumbel"  # or "hard_concrete" (the documented mechanism)
    dropout: float = 0.1
    n_sccn_layers: int = 6
    use_jumping_knowledge: bool = False
    use_fused_sampler: bool = True
    # Learned per-rank Hard Concrete stretch (beta/gamma/zeta) — see
    # AudioEncoder.learned_hc. Requires sampler="hard_concrete".
    learned_hc: bool = False
    # Static-capacity packed operators (topology/packed.py): per-rank
    # top-K capacities, e.g. (None, None, 512, 256) at n=32 packs
    # triangles/tetra; None keeps the fully-dense masked-static path.
    pack_capacities: tuple | None = None

    @classmethod
    def create(
        cls,
        num_vertices: int = 20,
        num_bands: int = 16,
        sccn_hidden_dim: int = 64,
        min_active_vertices: int = 8,
        max_active_vertices: int = 20,
        hard: bool = False,
        sampler: str = "gumbel",
        dropout: float = 0.1,
        n_sccn_layers: int = 6,
        pqmf_attenuation: float = 100.0,
        max_rank: int = 3,
        use_jumping_knowledge: bool = False,
        use_fused_sampler: bool = True,
        learned_hc: bool = False,
        pack_capacities: tuple | None = None,
    ) -> "AudioAutoencoder":
        """Build tables + filterbank host-side once (audio2complex.py:18-38).

        ``max_rank`` truncates the simplex hierarchy (1 = vertices+edges
        only); higher ranks become statically-empty and cost nothing.
        """
        return cls(
            tables=build_tables(num_vertices, max_rank),
            pqmf=PQMF.create(attenuation=pqmf_attenuation, n_band=num_bands),
            num_bands=num_bands,
            sccn_hidden_dim=sccn_hidden_dim,
            min_active_vertices=min_active_vertices,
            max_active_vertices=max_active_vertices,
            hard=hard,
            sampler=sampler,
            dropout=dropout,
            n_sccn_layers=n_sccn_layers,
            use_jumping_knowledge=use_jumping_knowledge,
            use_fused_sampler=use_fused_sampler,
            learned_hc=learned_hc,
            pack_capacities=(
                tuple(pack_capacities) if pack_capacities is not None else None
            ),
        )

    def setup(self):
        self.encoder = AudioEncoder(
            tables=self.tables,
            num_bands=self.num_bands,
            embedding_dim=self.sccn_hidden_dim,
            dropout=self.dropout,
            hard=self.hard,
            sampler=self.sampler,
            use_fused_sampler=self.use_fused_sampler,
            learned_hc=self.learned_hc,
            pack_capacities=self.pack_capacities,
        )
        self.decoder = AudioDecoder(
            sccn_hidden_dim=self.sccn_hidden_dim,
            initial_sequence_length=250,
            output_channels=self.num_bands,
            n_sccn_layers=self.n_sccn_layers,
            use_jumping_knowledge=self.use_jumping_knowledge,
        )

    def encode(self, x, temperature=1.0, rng=None, train: bool = True):
        """[B, 1, T] -> EncoderOutput."""
        bands = self.pqmf.forward(x)  # [B, M, T/M]
        return self.encoder(
            jnp.swapaxes(bands, -1, -2), temperature, rng, train
        )

    def decode(
        self, enc: EncoderOutput, desired_length: int | None = None,
        train: bool = True,
    ) -> jnp.ndarray:
        """EncoderOutput -> [B, 1, T]. ``desired_length`` is the per-band
        (post-PQMF) length, a static shape under jit."""
        sub = self.decoder(
            enc.embeddings, enc.ops, enc.masks, desired_length, train
        )
        return self.pqmf.inverse(jnp.swapaxes(sub, -1, -2))

    def decode_from_probs(
        self, probs, desired_length: int | None = None, train: bool = False
    ) -> jnp.ndarray:
        """Decode straight from a per-rank probability latent — the codec
        path (``inference.Codec.decode``): embeddings + operators are rebuilt
        from the latent alone, no encoder re-run.

        The latent is re-rectified first. Rectification is idempotent on
        already-valid latents (any ``EncoderOutput.probs``), so this is a
        no-op for them; for a *thresholded* Hard Concrete latent (whose
        continuous eval probs can binarize to a non-complex: a simplex kept
        at >= 0.5 while a face dropped below) it restores face closure,
        exactly as the encoder would (reference: encoder.py:341-357
        re-rectifies its Bernoulli draw for the same reason).
        """
        from ..topology.builder import build_operators
        from ..topology.rectifier import enforce_constraints

        rect = enforce_constraints(*probs.ranks, self.tables)
        masks = tuple((p > 0).astype(p.dtype) for p in rect.ranks)
        if self.pack_capacities is not None:
            # Codec decode on the packed path: the thresholded latent is
            # sparse, so packing is exact whenever capacity covers the
            # active set (topology/packed.py) — and the decode attention
            # memory shrinks from sum(S_r) to sum(K_r) rows.
            from ..topology.packed import build_packed_operators

            ops = build_packed_operators(
                rect,
                self.tables,
                self.pack_capacities,
                masks=masks,
                select_key=tuple(
                    m + p for m, p in zip(masks, rect.ranks)
                ),
            )
            embeddings = tuple(
                self.encoder.embed_norms[r](self.encoder.embed_tables[r])
                * rect.ranks[r][..., None]
                if ops.idx[r] is None
                else jnp.take(
                    self.encoder.embed_norms[r](self.encoder.embed_tables[r]),
                    ops.idx[r],
                    axis=0,
                )
                * ops.probs[r][..., None]
                for r in range(4)
            )
            masks = ops.masks
        else:
            embeddings = tuple(
                self.encoder.embed_norms[r](self.encoder.embed_tables[r])
                * rect.ranks[r][..., None]
                for r in range(4)
            )
            ops = build_operators(rect, self.tables, masks=masks)
        sub = self.decoder(embeddings, ops, masks, desired_length, train)
        return self.pqmf.inverse(jnp.swapaxes(sub, -1, -2))

    def geometry(self) -> dict:
        """Model-architecture facts a checkpoint consumer needs to rebuild
        this exact module (stamped into checkpoint sidecars by the Trainer;
        read back by ``codec_cli`` — the reference hard-codes its geometry,
        reference main.py:272-278)."""
        return {
            "vertices": self.tables.num_vertices,
            "bands": self.num_bands,
            "hidden": self.sccn_hidden_dim,
            "layers": self.n_sccn_layers,
            "sampler": self.sampler,
            "hard": self.hard,
            "learned_hc": self.learned_hc,
            "min_active_vertices": self.min_active_vertices,
            "max_active_vertices": self.max_active_vertices,
            "pack_capacities": (
                list(self.pack_capacities)
                if self.pack_capacities is not None
                else None
            ),
        }

    def __call__(
        self, x, temperature=1.0, rng=None, train: bool = True
    ) -> AutoencoderOutput:
        enc = self.encode(x, temperature, rng, train)
        wav = self.decode(enc, x.shape[-1] // self.num_bands, train)
        aux = {
            "binary_entropy": rank_diversity_entropy(enc.rectified),
            "diversity": vertex_count_penalty(
                enc.rectified.vertices,
                self.min_active_vertices,
                self.max_active_vertices,
            ),
            "l0": enc.l0,
        }
        return AutoencoderOutput(
            waveform=wav, aux=aux, valid=enc.valid, encoder_output=enc
        )

    def num_params(self, params) -> int:
        """Total parameter count (audio2complex.py:61-62)."""
        return sum(int(p.size) for p in jax.tree.leaves(params))

    def reset_params(self, sample_shape=(1, 1, 64000), seed: int = 511990):
        """Fresh, seeded parameters — the reference's ``reset_weights``
        (audio2complex.py:64-69, seeded 511990, used by the tuner
        trainer.py:218). Functional: returns a new param tree."""
        k = jax.random.PRNGKey(seed)
        p, d, s = jax.random.split(k, 3)
        x = jnp.zeros(sample_shape, jnp.float32)
        return self.jit_init({"params": p, "dropout": d}, x, 1.0, s, True)

    def jit_init(self, rngs, x, temperature=1.0, rng=None, train=True):
        """Compiled parameter initialization. Eager ``init`` dispatches
        thousands of tiny ops — ~400s over a remote-TPU link vs ~30s
        compiled. ``train`` is static (it gates Python control flow)."""
        if rng is None:
            rng = jax.random.PRNGKey(0)
        import functools

        return functools.partial(jax.jit, static_argnums=(4,))(self.init)(
            rngs, x, temperature, rng, train
        )
