"""Stochastic binarization samplers: Binary Gumbel and Hard Concrete.

The reference implements a binary Gumbel-softmax relaxation
(encoder.py:26-53) while its README/progress report describe Hard Concrete
(Louizos et al. 2018) — per SURVEY §2.1 the rebuild provides *both*: the
Gumbel relaxation for behavioral parity and the documented Hard Concrete
(with straight-through estimation) as the default sampler.

All samplers are pure functions of (logits, rng key, temperature) — the
temperature schedule is a pure function of the epoch, replacing the
reference's mutable ``current_temp`` attribute (trainer.py:264-269).

On TPU the Hard Concrete path can run as one fused Pallas kernel using the
on-chip PRNG (see ``pallas_kernels.hard_concrete_pallas``); the functions
here are the reference implementation and the CPU/test path.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp


def temperature_schedule(
    epoch: jnp.ndarray | int,
    initial_temp: float = 5.0,
    min_temp: float = 0.1,
    decay: float = 0.95,
) -> jnp.ndarray:
    """Per-epoch annealing max(min_temp, T0 * decay^epoch) (trainer.py:264-269)."""
    return jnp.maximum(min_temp, initial_temp * decay ** jnp.asarray(epoch, jnp.float32))


def straight_through(hard: jnp.ndarray, soft: jnp.ndarray) -> jnp.ndarray:
    """Forward value = hard, gradient = d(soft): y = soft + sg(hard - soft).

    Same estimator as the reference's hard path (encoder.py:354-357).
    """
    return soft + jax.lax.stop_gradient(hard - soft)


def _logistic_noise(key, shape, dtype=jnp.float32):
    u = jax.random.uniform(key, shape, dtype=dtype, minval=1e-6, maxval=1.0 - 1e-6)
    return jnp.log(u) - jnp.log1p(-u)


def binary_gumbel(
    logits: jnp.ndarray,
    key: jax.Array | None,
    temperature: jnp.ndarray | float,
    training: bool = True,
) -> jnp.ndarray:
    """Binary Gumbel-softmax relaxation, exactly the reference's math.

    The reference stacks [l, 1-l], adds independent Gumbel noise to both, and
    takes softmax channel 0 (encoder.py:33-41):

        softmax([(l+g1)/T, (1-l+g2)/T])[0] = sigmoid((2l - 1 + (g1-g2)) / T)

    and the difference of two standard Gumbels is a standard Logistic, so we
    sample logistic noise directly (one uniform instead of two exponentials).
    Eval mode thresholds the noiseless relaxation at 0.5, which reduces to
    ``logits > 0.5`` (encoder.py:43-47).
    """
    if not training:
        return (logits > 0.5).astype(logits.dtype)
    noise = _logistic_noise(key, logits.shape, logits.dtype)
    # Compute in the logits dtype: a strongly-typed f32 temperature (e.g.
    # anneal_temperature's output) would otherwise silently promote the
    # probs — and every downstream consumer (embeddings, SCCN, decoder)
    # — to f32 under a bf16 policy (measured: the whole decode ran f32).
    temperature = jnp.asarray(temperature).astype(logits.dtype)
    return jax.nn.sigmoid((2.0 * logits - 1.0 + noise) / temperature)


@dataclass(frozen=True)
class HardConcreteParams:
    """Stretch parameters from Louizos et al. (2018) §4.

    ``gamma``/``zeta`` may also be arrays broadcastable against the
    log-alpha tensor — the encoder's learned per-rank stretch
    (``AudioEncoder.learned_hc``) passes per-simplex [S] vectors.
    """

    gamma: float = -0.1
    zeta: float = 1.1


def hard_concrete(
    log_alpha: jnp.ndarray,
    key: jax.Array | None,
    temperature: jnp.ndarray | float,
    params: HardConcreteParams = HardConcreteParams(),
    training: bool = True,
) -> jnp.ndarray:
    """Hard Concrete relaxation of a Bernoulli gate.

    train: s = sigmoid((logistic_noise + log_alpha) / beta)
           z = clip(s * (zeta - gamma) + gamma, 0, 1)
    eval:  z = clip(sigmoid(log_alpha) * (zeta - gamma) + gamma, 0, 1)

    Exactly zero / one with positive probability, differentiable in between.
    """
    g, z_ = params.gamma, params.zeta
    if training:
        noise = _logistic_noise(key, log_alpha.shape, log_alpha.dtype)
        # See binary_gumbel: keep the compute dtype, don't let a strong
        # f32 temperature promote the probs (and all their consumers).
        temperature = jnp.asarray(temperature).astype(log_alpha.dtype)
        s = jax.nn.sigmoid((noise + log_alpha) / temperature)
    else:
        s = jax.nn.sigmoid(log_alpha)
    return jnp.clip(s * (z_ - g) + g, 0.0, 1.0)


def hard_concrete_l0_penalty(
    log_alpha: jnp.ndarray,
    temperature: jnp.ndarray | float,
    params: HardConcreteParams = HardConcreteParams(),
) -> jnp.ndarray:
    """Expected L0 (probability a gate is nonzero), for sparsity penalties."""
    g, z_ = params.gamma, params.zeta
    return jax.nn.sigmoid(
        log_alpha - jnp.asarray(temperature) * jnp.log(-g / z_)
    )


def bernoulli_ste(
    probs: jnp.ndarray, logits: jnp.ndarray, key: jax.Array
) -> jnp.ndarray:
    """Bernoulli sample of ``probs`` with gradients routed to ``logits``.

    The reference hard path samples bernoulli(rectified) and straight-
    throughs to the raw per-rank logits (encoder.py:342-357).
    """
    hard = jax.random.bernoulli(key, probs).astype(probs.dtype)
    return straight_through(hard, logits)
