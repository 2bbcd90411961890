"""Audio encoder: PQMF bands -> conv stacks -> simplex logits -> soft complex.

TPU-native re-design of the reference ``AudioEncoder`` (reference:
encoder.py:72-433). Architectural mapping (numerics preserved, layout
re-designed for the MXU):

- The reference runs 16 *separate* per-band conv stacks in a Python loop
  (encoder.py:104-119, 396-401). Identical architecture per band == one
  grouped conv with ``feature_group_count=16``: a single large MXU conv per
  stage instead of 16 small ones. Channel order is band-major, so per-band
  GroupNorm(2, 8) becomes GroupNorm(32) over the fused 128 channels etc. —
  group boundaries land exactly on the reference's.
- Everything is channels-last ([B, T, C]) and batched; the reference is
  written for batch 1 with squeezes (encoder.py:426).
- ``generate_complex`` implements the *intended* sampling path per SURVEY
  §2.4.1-2: bias the vertex slice only, sample all 6,195 logits, split by
  rank, rectify; the hard path re-rectifies a Bernoulli draw and straight-
  throughs to the logits (encoder.py:341-357). The all-zero-vertex bailout
  (encoder.py:365-366) becomes a ``valid`` flag so the step stays jittable.
- Active-simplex gathers (encoder.py:227-263) become masked-static: full
  embedding tables LayerNormed and scaled by the (rectified or STE'd)
  probabilities — inactive rows are exactly zero, and downstream consumers
  receive the masks.
"""

from __future__ import annotations

from typing import NamedTuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ..ops.samplers import (
    HardConcreteParams,
    binary_gumbel,
    hard_concrete,
    hard_concrete_l0_penalty,
    straight_through,
)
from ..topology.builder import SimplicialOperators, build_operators
from ..topology.complexes import ComplexTables
from ..topology.rectifier import RectifiedProbs, enforce_constraints


class EncoderOutput(NamedTuple):
    """Everything the decoder + objective need, fixed shapes throughout."""

    logits: jnp.ndarray  # [B, S_total] raw simplex logits (pre vertex bias)
    embeddings: tuple  # per-rank [B, S_r, C], zero rows when inactive
    ops: SimplicialOperators  # masked-dense operator set
    probs: RectifiedProbs  # per-rank output probabilities (STE'd if hard)
    rectified: RectifiedProbs  # soft rectified probabilities
    masks: tuple  # per-rank {0,1} active masks [B, S_r]
    valid: jnp.ndarray  # [B] bool: at least one active vertex
    l0: jnp.ndarray  # [B] expected number of open gates (Hard Concrete L0
    # sparsity term, Louizos et al. 2018 eq. 12; zeros for the Gumbel sampler)


def _conv(features, kernel, stride=1, groups=1, name=None):
    pad = (kernel - 1) // 2
    return nn.Conv(
        features,
        kernel_size=(kernel,),
        strides=(stride,),
        padding=[(pad, pad)],
        feature_group_count=groups,
        name=name,
    )


class BandEncoder(nn.Module):
    """Fused per-band conv stacks (encoder.py:104-119), 16 bands at once.

    [B, T, 16] -> [B, T/8, 256]; channels band-major (band b owns channels
    [16b, 16b+16)).
    """

    num_bands: int = 16

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        nb = self.num_bands
        x = _conv(8 * nb, 15, 2, groups=nb, name="conv0")(x)
        x = nn.GroupNorm(num_groups=2 * nb, name="norm0")(x)
        x = nn.gelu(x)
        x = _conv(16 * nb, 7, 2, groups=nb, name="conv1")(x)
        x = nn.GroupNorm(num_groups=4 * nb, name="norm1")(x)
        x = nn.gelu(x)
        x = _conv(16 * nb, 5, 2, groups=nb, name="conv2")(x)
        x = nn.GroupNorm(num_groups=4 * nb, name="norm2")(x)
        x = nn.gelu(x)
        return x


class AudioEncoder(nn.Module):
    """Waveform bands -> simplex logits -> rectified soft complex."""

    tables: ComplexTables
    num_bands: int = 16
    embedding_dim: int = 64
    dropout: float = 0.1
    hard: bool = False
    # Stochastic relaxation. "gumbel" is the binary Gumbel the reference
    # *code* ships (encoder.py:26-53); "hard_concrete" is the Hard Concrete
    # gate (Louizos et al. 2018) its README/progress report document
    # (README.md:15-18) — the BASELINE north-star's named mechanism.
    sampler: str = "gumbel"
    # On TPU, run the stochastic relaxation as one fused Pallas kernel
    # (on-chip PRNG; differentiable via closed-form custom VJP). Falls
    # back to the pure-JAX sampler on other backends.
    use_fused_sampler: bool = True
    # Learn the Hard Concrete stretch per rank (the reference README's
    # "learned temperature/gamma/zeta", README.md:15-18 — described but
    # never implemented in the reference code). Four scalars each for
    # beta/gamma/zeta, constrained to their valid ranges via softplus
    # (beta > 0, gamma < 0, zeta > 1) and broadcast over each rank's
    # simplices. Replaces the annealed temperature for the sampler AND
    # the expected-L0 term, so the gate sharpness becomes trainable.
    # Only meaningful with sampler="hard_concrete".
    learned_hc: bool = False
    # Static-capacity packed operators (topology/packed.py): per-rank
    # top-K active slicing for large hierarchies where the dense factored
    # products pay for every C(n,k) row. None = dense masked-static.
    pack_capacities: tuple | None = None

    def setup(self):
        if self.sampler not in ("gumbel", "hard_concrete"):
            raise ValueError(
                f"sampler must be 'gumbel' or 'hard_concrete', got {self.sampler!r}"
            )
        if self.learned_hc and self.sampler != "hard_concrete":
            raise ValueError("learned_hc requires sampler='hard_concrete'")
        t = self.tables
        self.sizes = t.sizes
        self.total_simplices = t.total_simplices
        self.band_encoder = BandEncoder(self.num_bands)
        # Cross-band merge (encoder.py:126-135). Widths scale with num_bands
        # (reference hardcodes 16 bands -> 256/192/128); group sizes match
        # the reference's at 16 bands.
        nb = self.num_bands
        self.cross0 = _conv(12 * nb, 5, groups=4, name="cross0")
        self.cross_norm0 = nn.GroupNorm(num_groups=12)
        self.cross1 = _conv(8 * nb, 7, name="cross1")
        self.cross_norm1 = nn.GroupNorm(num_groups=8)
        self.skip_weight = self.param(
            "skip_weight", lambda k: jnp.asarray(0.1, jnp.float32)
        )
        # Temporal reduction (encoder.py:138-149)
        self.red0 = _conv(8 * nb, 7, 4, groups=8, name="red0")
        self.red_norm0 = nn.GroupNorm(num_groups=8)
        self.red1 = _conv(8 * nb, 7, 2, groups=8, name="red1")
        self.red_norm1 = nn.GroupNorm(num_groups=8)
        self.red2 = _conv(8 * nb, 3, 2, name="red2")
        self.red_norm2 = nn.GroupNorm(num_groups=8)
        # MLP to simplex logits (encoder.py:152-165)
        self.mlp0 = nn.Dense(2048)
        self.mlp_norm0 = nn.LayerNorm()
        self.mlp1 = nn.Dense(1024)
        self.mlp_norm1 = nn.LayerNorm()
        self.mlp2 = nn.Dense(self.total_simplices)
        self.drop = nn.Dropout(self.dropout)
        # Per-rank additive vertex bias, init 2.0 (encoder.py:167): only the
        # vertex bias is ever applied (encoder.py:292); the other three rank
        # biases in the reference are vestigial and not rebuilt.
        self.vertex_bias = self.param(
            "vertex_bias", lambda k: jnp.asarray(2.0, jnp.float32)
        )
        # Per-rank embedding tables + LayerNorms (encoder.py:177-195)
        self.embed_tables = [
            self.param(
                f"embed_rank{r}",
                nn.initializers.normal(1.0),
                (self.sizes[r], self.embedding_dim),
            )
            for r in range(4)
        ]
        self.embed_norms = [nn.LayerNorm(name=f"embed_norm{r}") for r in range(4)]
        if self.learned_hc:
            # softplus^-1(x) = log(expm1(x)); inits reproduce the fixed
            # defaults (beta=2/3 per Louizos et al. 2018, gamma=-0.1,
            # zeta=1.1) so an untrained learned_hc model starts identical
            # to the fixed-stretch sampler.
            def inv_softplus(x):
                return float(np.log(np.expm1(x)))

            self.hc_beta_raw = self.param(
                "hc_beta_raw",
                lambda k: jnp.full((4,), inv_softplus(2.0 / 3.0), jnp.float32),
            )
            self.hc_gamma_raw = self.param(
                "hc_gamma_raw",
                lambda k: jnp.full((4,), inv_softplus(0.1), jnp.float32),
            )
            self.hc_zeta_raw = self.param(
                "hc_zeta_raw",
                lambda k: jnp.full((4,), inv_softplus(0.1), jnp.float32),
            )

    def _hc_stretch(self, dtype):
        """Per-simplex (beta, gamma, zeta) arrays from the per-rank learned
        raw params, range-constrained and broadcast by rank size."""
        reps = np.asarray(self.sizes)
        expand = lambda v: jnp.repeat(  # noqa: E731
            v.astype(dtype), reps, total_repeat_length=self.total_simplices
        )
        beta = expand(nn.softplus(self.hc_beta_raw))
        gamma = expand(-nn.softplus(self.hc_gamma_raw))
        zeta = expand(1.0 + nn.softplus(self.hc_zeta_raw))
        return beta, gamma, zeta

    def compute_logits(self, bands: jnp.ndarray, train: bool = True) -> jnp.ndarray:
        """[B, T, num_bands] (channels-last PQMF bands) -> [B, S_total]."""
        x = self.band_encoder(bands)  # [B, T/8, 256]
        # Skip: max over adjacent channel pairs — the reference's MaxPool1d
        # applied across the channel axis (encoder.py:122,408): 256 -> 128.
        b, t, c = x.shape
        skip = x.reshape(b, t, c // 2, 2).max(axis=-1)
        y = nn.gelu(self.cross_norm0(self.cross0(x)))
        y = nn.gelu(self.cross_norm1(self.cross1(y)))
        y = y + self.skip_weight * skip
        y = nn.gelu(self.red_norm0(self.red0(y)))
        y = nn.gelu(self.red_norm1(self.red1(y)))
        y = nn.gelu(self.red_norm2(self.red2(y)))  # [B, 32, 128]
        y = y.reshape(y.shape[0], -1)  # [B, 4096]
        y = self.drop(nn.gelu(self.mlp_norm0(self.mlp0(y))), deterministic=not train)
        y = self.drop(nn.gelu(self.mlp_norm1(self.mlp1(y))), deterministic=not train)
        return self.mlp2(y)  # [B, S_total]

    def generate_complex(
        self,
        logits: jnp.ndarray,
        temperature,
        rng: jax.Array | None,
        train: bool = True,
    ) -> EncoderOutput:
        """Sample, rectify, embed, assemble — the intended reference path
        (encoder.py:324-388 with SURVEY §2.4.1-2 fixes), fully static."""
        v = self.sizes[0]
        biased = logits.at[..., :v].add(nn.relu(self.vertex_bias))
        if rng is not None:
            sample_rng, hard_rng = jax.random.split(rng)
        else:
            sample_rng = hard_rng = None

        # 1. Stochastic relaxation of every logit. "hard_concrete" treats the
        # biased logits as log-alpha (Louizos et al. 2018 §4): stretched
        # noisy sigmoid clipped to [0, 1], exactly 0/1 with positive
        # probability. "gumbel" is the reference code's binary Gumbel
        # (encoder.py:326-327); the reference *hard* path relaxes
        # deterministically (sigmoid(l/T), encoder.py:330) before the
        # Bernoulli draw, so gumbel+hard uses no sampling noise here.
        if self.sampler == "hard_concrete":
            if self.learned_hc:
                # Learned per-rank stretch: beta/gamma/zeta ride the fused
                # kernel as [1, S] row operands (closed-form VJP extended
                # to the stretch cotangents) — the learned path shares the
                # north-star one-kernel sampler with the fixed stretch.
                beta, gamma, zeta = self._hc_stretch(biased.dtype)
                if self.use_fused_sampler and train and sample_rng is not None:
                    from ..ops.pallas_kernels import (
                        hard_concrete_fused_learned_diff,
                    )

                    probs_all = hard_concrete_fused_learned_diff(
                        biased, sample_rng, beta, gamma, zeta, True
                    )
                else:
                    probs_all = hard_concrete(
                        biased, sample_rng, beta,
                        HardConcreteParams(gamma=gamma, zeta=zeta),
                        training=train,
                    )
            elif self.use_fused_sampler and train and sample_rng is not None:
                from ..ops.pallas_kernels import hard_concrete_fused_diff

                probs_all = hard_concrete_fused_diff(
                    biased, sample_rng, temperature, True
                )
            else:
                probs_all = hard_concrete(
                    biased, sample_rng, temperature, training=train
                )
        elif self.hard:
            probs_all = jax.nn.sigmoid(
                biased / jnp.asarray(temperature).astype(biased.dtype)
            )
        elif self.use_fused_sampler and train and sample_rng is not None:
            from ..ops.pallas_kernels import binary_gumbel_fused_diff

            probs_all = binary_gumbel_fused_diff(
                biased, sample_rng, temperature, True
            )
        else:
            probs_all = binary_gumbel(
                biased, sample_rng, temperature, training=train
            )

        # 2. Rectify to a valid soft complex.
        rect = enforce_constraints(*self.tables.split(probs_all), self.tables)

        # 3. Hard path (encoder.py:330-357): Bernoulli (or threshold) the
        # rectified probabilities, re-rectify the binary draw, and straight-
        # through the exact 0/1 values to the biased logits.
        if self.hard:
            if hard_rng is None:
                hard_ranks = tuple(
                    (p > 0.5).astype(p.dtype) for p in rect.ranks
                )
            else:
                keys = jax.random.split(hard_rng, 4)
                hard_ranks = tuple(
                    jax.random.bernoulli(k, p).astype(p.dtype)
                    for k, p in zip(keys, rect.ranks)
                )
            rect2 = enforce_constraints(*hard_ranks, self.tables)
            logit_ranks = self.tables.split(biased)
            out_ranks = RectifiedProbs(
                *(straight_through(h, l) for h, l in zip(rect2.ranks, logit_ranks))
            )
        else:
            out_ranks = rect

        masks = tuple((p > 0).astype(logits.dtype) for p in out_ranks.ranks)
        valid = out_ranks.vertices.sum(axis=-1) > 0

        if self.pack_capacities is not None:
            # Static-capacity packed path (topology/packed.py): ops,
            # embeddings, and masks for the packed ranks live in top-K
            # packed layout; probs/rectified (the latent + loss inputs)
            # stay full. Selection key mask+rect keeps every active row
            # ahead of every inactive one.
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
                self.embed_norms[r](self.embed_tables[r])
                * out_ranks.ranks[r][..., None]
                if ops.idx[r] is None
                else jnp.take(
                    self.embed_norms[r](self.embed_tables[r]),
                    ops.idx[r],
                    axis=0,
                )
                * jnp.take_along_axis(
                    out_ranks.ranks[r], ops.idx[r], axis=-1
                )[..., None]
                for r in range(4)
            )
            masks = ops.masks
        else:
            # Masked-static embeddings (encoder.py:227-263):
            # LN(table) * prob.
            embeddings = tuple(
                self.embed_norms[r](self.embed_tables[r])
                * out_ranks.ranks[r][..., None]
                for r in range(4)
            )
            # Operators from the *soft* rectified probs in both paths
            # (encoder.py:384 passes ``rectified``); masks from the
            # output probs.
            ops = build_operators(rect, self.tables, masks=masks)

        # Expected-L0 sparsity term: mean gate-open probability per sample.
        # Only the Hard Concrete gate has a closed form; the Gumbel path
        # reports zero (the reference has no analog — its sparsity pressure
        # comes entirely from the diversity/entropy penalties).
        if self.sampler == "hard_concrete" and self.learned_hc:
            beta, gamma, zeta = self._hc_stretch(biased.dtype)
            l0 = hard_concrete_l0_penalty(
                biased, beta, HardConcreteParams(gamma=gamma, zeta=zeta)
            ).mean(axis=-1)
        elif self.sampler == "hard_concrete":
            l0 = hard_concrete_l0_penalty(biased, temperature).mean(axis=-1)
        else:
            l0 = jnp.zeros(logits.shape[:-1], logits.dtype)

        return EncoderOutput(
            logits=logits,
            embeddings=embeddings,
            ops=ops,
            probs=out_ranks,
            rectified=rect,
            masks=masks,
            valid=valid,
            l0=l0,
        )

    def __call__(
        self,
        bands: jnp.ndarray,
        temperature,
        rng: jax.Array | None = None,
        train: bool = True,
    ) -> EncoderOutput:
        logits = self.compute_logits(bands, train)
        return self.generate_complex(logits, temperature, rng, train)


def info_nce_loss(
    logits: jnp.ndarray, temperature: float = 0.1
) -> jnp.ndarray:
    """InfoNCE over simplex-logit rows (encoder.py:299-314, intended batched
    semantics per SURVEY §2.4.8).

    logits: [B, G, S] where row 0 = anchor, 1 = positive, 2: = negatives.
    """
    norm = logits / (jnp.linalg.norm(logits, axis=-1, keepdims=True) + 1e-12)
    anchor = norm[:, 0]  # [B, S]
    positive = norm[:, 1]  # [B, S]
    negatives = norm[:, 2:]  # [B, K, S]
    pos = jnp.einsum("bs,bs->b", anchor, positive)[:, None]  # [B, 1]
    neg = jnp.einsum("bs,bks->bk", anchor, negatives)  # [B, K]
    scores = jnp.concatenate([pos, neg], axis=1) / temperature
    # cross-entropy with label 0
    return (jax.nn.logsumexp(scores, axis=1) - scores[:, 0]).mean()


def triplet_loss(logits: jnp.ndarray, margin: float = 1.0) -> jnp.ndarray:
    """Triplet margin loss with L2 distance (encoder.py:316-320)."""
    anchor, positive, negative = logits[:, 0], logits[:, 1], logits[:, 2]
    d_pos = jnp.linalg.norm(anchor - positive, axis=-1)
    d_neg = jnp.linalg.norm(anchor - negative, axis=-1)
    return jnp.maximum(d_pos - d_neg + margin, 0.0).mean()


def vertex_count_penalty(
    vertex_probs: jnp.ndarray, min_active: int, max_active: int
) -> jnp.ndarray:
    """relu(min - count) + relu(count - max) (encoder.py:199-203)."""
    count = vertex_probs.sum(axis=-1)
    return nn.relu(min_active - count) + nn.relu(count - max_active)


def rank_diversity_entropy(probs: RectifiedProbs) -> jnp.ndarray:
    """Negative entropy of mean activation across ranks (encoder.py:205-225):
    encourages activation mass spread over simplex ranks. Returns the loss
    term (-0.1 * entropy), batched."""
    acts = jnp.stack(
        [p.mean(axis=-1) for p in probs.ranks if p.shape[-1] > 0], axis=-1
    )  # [B, <=4]; statically-empty ranks excluded (max_rank truncation)
    dist = acts / (acts.sum(axis=-1, keepdims=True) + 1e-10)
    entropy = -(dist * jnp.log(dist + 1e-10)).sum(axis=-1)
    return -0.1 * entropy
