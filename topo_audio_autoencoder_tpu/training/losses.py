"""Training objective: multiscale spectral distance + regularizers.

TPU-native equivalent of the reference ``AutoencoderLoss``
(reference: loss.py:15-54) with the SURVEY §2.4.5 interface fix: the aux-loss
dict {'binary_entropy', 'diversity'} is always present, and the invalid-state
path (all-zero-vertex sample) is folded in as a per-sample ``where`` against
the fixed penalty (trainer.py:278-279) so the whole objective stays jittable.

Returns per-component scalars for logging like the reference's
``loss_components`` (loss.py:47-52).
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from ..ops.stft import DEFAULT_SCALES, spectral_distance


class LossWeights(NamedTuple):
    """Penalty weights (loss.py:16-25, trainer.py:57-62)."""

    binary_entropy_penalty: float = 1e-5  # trainer initial_reg_factor
    complexity_penalty: float = 0.1
    contrastive_weight: float = 1.0
    invalid_state_penalty: float = 100.0
    # Hard Concrete expected-L0 sparsity weight (Louizos et al. 2018 eq. 12);
    # inert (the aux term is zero) under the Gumbel sampler.
    l0_penalty: float = 0.0


def autoencoder_loss(
    recon: jnp.ndarray,  # [B, 1, T] reconstruction
    target: jnp.ndarray,  # [B, 1, T]
    aux: dict,  # {'binary_entropy': [B], 'diversity': [B]}
    valid: jnp.ndarray,  # [B] bool
    weights: LossWeights = LossWeights(),
    contrastive: jnp.ndarray | None = None,  # scalar, optional
    scales: tuple[int, ...] = DEFAULT_SCALES,
    with_per_sample: bool = False,
    stft_method: str = "auto",
):
    """Total loss (scalar) + components dict of scalars.

    ``with_per_sample`` adds the [B] per-sample total under
    components["per_sample"] (used by padded validation to mask out pad
    rows; keep it off the train path — the metric writer expects scalars).

    ``stft_method`` forwards to the spectral term; the vmapped grid tuner
    passes 'matmul' (identical on TPU where 'auto' already picks matmul;
    on CPU it sidesteps an XLA FftThunk layout RET_CHECK under
    grad-of-vmap + mesh sharding — see ops/stft.py).
    """
    spec = spectral_distance(
        recon[:, 0, :], target[:, 0, :], scales, method=stft_method
    )  # [B]
    per_sample = (
        spec
        + weights.binary_entropy_penalty * aux["binary_entropy"]
        + weights.complexity_penalty * aux["diversity"]
    )
    if weights.l0_penalty and "l0" in aux:
        per_sample = per_sample + weights.l0_penalty * aux["l0"]
    # Invalid samples (no active vertices) contribute the fixed penalty
    # instead of their (meaningless) reconstruction loss.
    per_sample = jnp.where(valid, per_sample, weights.invalid_state_penalty)
    total = per_sample.mean()

    validf = valid.astype(spec.dtype)
    components = {
        "spectral_loss": jnp.where(valid, spec, 0.0).mean(),
        "binary_entropy_loss": aux["binary_entropy"].mean(),
        "diversity_loss": aux["diversity"].mean(),
        "invalid_fraction": 1.0 - validf.mean(),
    }
    if "l0" in aux:
        components["l0_loss"] = aux["l0"].mean()
    if contrastive is not None:
        total = total + weights.contrastive_weight * contrastive
        components["contrastive_loss"] = contrastive
    components["total_loss"] = total
    if with_per_sample:
        components["per_sample"] = per_sample
    return total, components
