"""Fused Pallas TPU kernels for the sampling hot path.

The BASELINE north star calls for "Hard Concrete sampling with straight-
through estimation compil[ing] to one fused stochastic-relaxation kernel".
This module provides exactly that: a single VPU kernel that seeds the
on-chip PRNG, draws logistic noise, applies the stretched-sigmoid
relaxation, clips, and (optionally) thresholds — one pass over VMEM, no
HBM round-trips between the stages and no host-side threefry tree.

Falls back to the pure-JAX samplers on non-TPU backends (tests run on CPU);
the random streams differ between the two paths by construction — both are
valid samplers of the same distribution.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from . import samplers


def _on_tpu() -> bool:
    try:
        return jax.default_backend() == "tpu"
    except Exception:  # pragma: no cover
        return False


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


def _bits_to_uniform(bits):
    """PRNG bits -> uniform in (0, 1).

    ``prng_random_bits`` yields *signed* int32; a plain arithmetic shift
    keeps the sign and collapses uniforms into (0, 0.5) — a real
    sampler-skew bug caught by the TPU frac0/frac1 check. Mosaic has no
    uint32->float cast, so mask the sign-extension bits away instead:
    (x >> 8) & 0xffffff equals the logical shift's low 24 bits.
    """
    low24 = (bits >> 8) & jnp.int32(0xFFFFFF)
    u = low24.astype(jnp.float32) * (1.0 / (1 << 24))
    return jnp.clip(u, 1e-6, 1.0 - 1e-6)


def _pick_block_rows(b_pad: int, s_pad: int) -> int:
    """Row-block size: big enough to amortize per-program overhead, small
    enough that in+out blocks sit comfortably in VMEM (~2 MB each) and the
    grid has multiple programs to pipeline."""
    target = max(8, min(b_pad, (2 << 20) // (s_pad * 4) // 8 * 8))
    while b_pad % target:
        target -= 8
    return max(target, 8)


def _hard_concrete_kernel(seed_ref, logits_ref, temp_ref, out_ref, *, gamma, zeta):
    """One fused pass: uniform -> logistic -> stretched sigmoid -> clip.

    Runs on a row-block grid; each program seeds the on-chip PRNG with
    seed + program_id so blocks draw decorrelated streams while the whole
    call stays a deterministic function of the one seed.
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    pltpu.prng_seed(seed_ref[0] + pl.program_id(0))
    bits = pltpu.prng_random_bits(logits_ref.shape)
    u = _bits_to_uniform(bits)
    noise = jnp.log(u) - jnp.log1p(-u)
    temp = temp_ref[0]
    s = jax.nn.sigmoid((noise + logits_ref[:]) / temp)
    out_ref[:] = jnp.clip(s * (zeta - gamma) + gamma, 0.0, 1.0)


@functools.partial(jax.jit, static_argnames=("gamma", "zeta"))
def _hard_concrete_pallas_call(logits, seed, temp, gamma, zeta):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    b, s = logits.shape
    s_pad = _round_up(s, 128)
    b_pad = _round_up(b, 8)
    block_b = _pick_block_rows(b_pad, s_pad)
    x = jnp.zeros((b_pad, s_pad), jnp.float32).at[:b, :s].set(logits.astype(jnp.float32))

    out = pl.pallas_call(
        functools.partial(_hard_concrete_kernel, gamma=gamma, zeta=zeta),
        grid=(b_pad // block_b,),
        out_shape=jax.ShapeDtypeStruct((b_pad, s_pad), jnp.float32),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((block_b, s_pad), lambda i: (i, 0)),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec((block_b, s_pad), lambda i: (i, 0)),
    )(seed.reshape(1), x, temp.reshape(1).astype(jnp.float32))
    return out[:b, :s].astype(logits.dtype)


def hard_concrete_fused(
    log_alpha: jnp.ndarray,
    key: jax.Array,
    temperature,
    params: samplers.HardConcreteParams = samplers.HardConcreteParams(),
    training: bool = True,
) -> jnp.ndarray:
    """Hard Concrete sample; fused Pallas kernel on TPU, pure JAX elsewhere.

    Accepts [..., S]; flattens leading dims for the kernel.
    """
    if not training or not _on_tpu():
        return samplers.hard_concrete(log_alpha, key, temperature, params, training)
    shape = log_alpha.shape
    flat = log_alpha.reshape(-1, shape[-1])
    seed = jax.random.randint(key, (), 0, np.iinfo(np.int32).max, dtype=jnp.int32)
    out = _hard_concrete_pallas_call(
        flat, seed, jnp.asarray(temperature), params.gamma, params.zeta
    )
    return out.reshape(shape)


def _hard_concrete_learned_kernel(
    seed_ref, logits_ref, beta_ref, gamma_ref, zeta_ref, out_ref
):
    """Learned-stretch variant: beta/gamma/zeta arrive as [1, S] row
    operands (the encoder's per-rank learned parameters broadcast over
    each rank's simplices) instead of baked constants — the VERDICT r4
    gap where the README's learned mechanism silently left the fused
    path. Same single fused pass otherwise."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    pltpu.prng_seed(seed_ref[0] + pl.program_id(0))
    bits = pltpu.prng_random_bits(logits_ref.shape)
    u = _bits_to_uniform(bits)
    noise = jnp.log(u) - jnp.log1p(-u)
    s = jax.nn.sigmoid((noise + logits_ref[:]) / beta_ref[:])
    out_ref[:] = jnp.clip(
        s * (zeta_ref[:] - gamma_ref[:]) + gamma_ref[:], 0.0, 1.0
    )


@functools.partial(jax.jit, static_argnames=("interpret",))
def _hard_concrete_learned_pallas_call(
    logits, seed, beta, gamma, zeta, interpret=False
):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    b, s = logits.shape
    s_pad = _round_up(s, 128)
    b_pad = _round_up(b, 8)
    block_b = _pick_block_rows(b_pad, s_pad)
    x = (
        jnp.zeros((b_pad, s_pad), jnp.float32)
        .at[:b, :s]
        .set(logits.astype(jnp.float32))
    )
    # Stretch rows padded with their neutral values (beta/zeta 1, gamma 0)
    # so the dead pad columns never divide by zero or produce non-finites.
    def row(v, fill):
        return (
            jnp.full((1, s_pad), fill, jnp.float32)
            .at[0, :s]
            .set(v.astype(jnp.float32))
        )

    row_spec = pl.BlockSpec((1, s_pad), lambda i: (0, 0))
    out = pl.pallas_call(
        _hard_concrete_learned_kernel,
        grid=(b_pad // block_b,),
        out_shape=jax.ShapeDtypeStruct((b_pad, s_pad), jnp.float32),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((block_b, s_pad), lambda i: (i, 0)),
            row_spec,
            row_spec,
            row_spec,
        ],
        out_specs=pl.BlockSpec((block_b, s_pad), lambda i: (i, 0)),
        interpret=interpret,
    )(seed.reshape(1), x, row(beta, 1.0), row(gamma, 0.0), row(zeta, 1.0))
    return out[:b, :s].astype(logits.dtype)


def hard_concrete_fused_learned(
    log_alpha: jnp.ndarray,
    key: jax.Array,
    beta: jnp.ndarray,
    gamma: jnp.ndarray,
    zeta: jnp.ndarray,
    training: bool = True,
    interpret: bool = False,
) -> jnp.ndarray:
    """Hard Concrete with per-simplex learned stretch ([S] vectors);
    fused Pallas kernel on TPU, pure JAX elsewhere."""
    if not training or not (_on_tpu() or interpret):
        return samplers.hard_concrete(
            log_alpha, key, beta,
            samplers.HardConcreteParams(gamma=gamma, zeta=zeta), training,
        )
    shape = log_alpha.shape
    flat = log_alpha.reshape(-1, shape[-1])
    seed = jax.random.randint(key, (), 0, np.iinfo(np.int32).max, dtype=jnp.int32)
    out = _hard_concrete_learned_pallas_call(
        flat, seed, beta, gamma, zeta, interpret=interpret
    )
    return out.reshape(shape)


def _binary_gumbel_kernel(seed_ref, logits_ref, temp_ref, out_ref):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    pltpu.prng_seed(seed_ref[0] + pl.program_id(0))
    bits = pltpu.prng_random_bits(logits_ref.shape)
    u = _bits_to_uniform(bits)
    noise = jnp.log(u) - jnp.log1p(-u)
    temp = temp_ref[0]
    out_ref[:] = jax.nn.sigmoid((2.0 * logits_ref[:] - 1.0 + noise) / temp)


@jax.jit
def _binary_gumbel_pallas_call(logits, seed, temp):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    b, s = logits.shape
    s_pad = _round_up(s, 128)
    b_pad = _round_up(b, 8)
    block_b = _pick_block_rows(b_pad, s_pad)
    x = jnp.zeros((b_pad, s_pad), jnp.float32).at[:b, :s].set(logits.astype(jnp.float32))
    out = pl.pallas_call(
        _binary_gumbel_kernel,
        grid=(b_pad // block_b,),
        out_shape=jax.ShapeDtypeStruct((b_pad, s_pad), jnp.float32),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((block_b, s_pad), lambda i: (i, 0)),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec((block_b, s_pad), lambda i: (i, 0)),
    )(seed.reshape(1), x, temp.reshape(1).astype(jnp.float32))
    return out[:b, :s].astype(logits.dtype)


def binary_gumbel_fused(
    logits: jnp.ndarray, key: jax.Array, temperature, training: bool = True
) -> jnp.ndarray:
    """Binary Gumbel sample; fused Pallas kernel on TPU, pure JAX elsewhere."""
    if not training or not _on_tpu():
        return samplers.binary_gumbel(logits, key, temperature, training)
    shape = logits.shape
    flat = logits.reshape(-1, shape[-1])
    seed = jax.random.randint(key, (), 0, np.iinfo(np.int32).max, dtype=jnp.int32)
    out = _binary_gumbel_pallas_call(flat, seed, jnp.asarray(temperature))
    return out.reshape(shape)


# ---------------------------------------------------------------------------
# Differentiable wrappers: the kernels draw noise + apply the relaxation in
# one pass, so they carry no VJP of their own. The gradients are closed-form
# in the *output*:
#   gumbel:        s = sigmoid((2l - 1 + eps)/T)   -> ds/dl = 2 s(1-s)/T
#   hard concrete: z = clip(s (zeta-gamma)+gamma)  -> dz/da = 1{0<z<1} s(1-s)/T (zeta-gamma)
# so one extra residual (s) is all the backward pass needs — the fused
# samplers drop into the differentiated train step (the BASELINE north-star
# "one fused stochastic-relaxation kernel" in the hot path).


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def binary_gumbel_fused_diff(logits, key, temperature, training: bool = True):
    return binary_gumbel_fused(logits, key, temperature, training)


def _bg_fwd(logits, key, temperature, training):
    s = binary_gumbel_fused(logits, key, temperature, training)
    return s, (s, jnp.asarray(temperature))


def _bg_bwd(training, res, ct):
    s, temp = res
    if not training:  # eval path is a hard threshold: zero gradient
        return (jnp.zeros_like(ct), None, jnp.zeros_like(temp))
    ds = 2.0 * s * (1.0 - s) / temp
    # d/dT = -(2l-1+eps)/T^2 * s(1-s); recovering (2l-1+eps) from s is
    # logit(s)*T, so dT = -logit(s)/T * s(1-s)
    logit_s = jnp.log(s + 1e-12) - jnp.log1p(-s + 1e-12)
    dtemp = (ct * (-logit_s / temp) * s * (1.0 - s)).sum()
    # the strong-f32 temp residual must not promote the logits cotangent
    # (custom_vjp requires it in the primal dtype)
    return ((ct * ds).astype(s.dtype), None, dtemp.astype(temp.dtype))


binary_gumbel_fused_diff.defvjp(_bg_fwd, _bg_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def hard_concrete_fused_diff(log_alpha, key, temperature, training: bool = True):
    return hard_concrete_fused(log_alpha, key, temperature, training=training)


def _hc_fwd(log_alpha, key, temperature, training):
    p = samplers.HardConcreteParams()
    z = hard_concrete_fused(log_alpha, key, temperature, training=training)
    # recover the pre-clip sigmoid from z where unclipped; at the clip
    # boundaries the gradient is zero anyway so any in-range value works
    s = jnp.clip((z - p.gamma) / (p.zeta - p.gamma), 1e-6, 1.0 - 1e-6)
    return z, (z, s, jnp.asarray(temperature))


def _hc_bwd(training, res, ct):
    z, s, temp = res
    p = samplers.HardConcreteParams()
    inside = ((z > 0.0) & (z < 1.0)).astype(ct.dtype)
    scale = (p.zeta - p.gamma) / temp if training else (p.zeta - p.gamma)
    dz = inside * s * (1.0 - s) * scale
    logit_s = jnp.log(s) - jnp.log1p(-s)
    dtemp = (
        (ct * inside * (-logit_s / temp) * s * (1.0 - s) * (p.zeta - p.gamma)).sum()
        if training
        else jnp.zeros((), temp.dtype)
    )
    return ((ct * dz).astype(z.dtype), None, dtemp.astype(temp.dtype))


hard_concrete_fused_diff.defvjp(_hc_fwd, _hc_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6))
def hard_concrete_fused_learned_diff(
    log_alpha, key, beta, gamma, zeta, training: bool = True,
    interpret: bool = False,
):
    """Differentiable fused Hard Concrete with LEARNED per-simplex stretch.

    Closed-form VJP in the output, extended to the stretch operands
    (z = clip(s (zeta-gamma) + gamma), s = sigmoid((noise + a)/beta),
    a/beta = logit(s)):

        dz/da     = 1{0<z<1} s(1-s) (zeta-gamma) / beta
        dz/dbeta  = 1{0<z<1} s(1-s) (zeta-gamma) (-logit(s)) / beta
        dz/dgamma = 1{0<z<1} (1-s)
        dz/dzeta  = 1{0<z<1} s

    so the one saved residual (z) still carries the whole backward pass;
    stretch cotangents reduce over the batch dims back to [S] (the
    encoder's per-rank repeat then sums [S] -> [4] under autodiff).
    """
    return hard_concrete_fused_learned(
        log_alpha, key, beta, gamma, zeta, training, interpret
    )


def _hcl_fwd(log_alpha, key, beta, gamma, zeta, training, interpret):
    z = hard_concrete_fused_learned(
        log_alpha, key, beta, gamma, zeta, training, interpret
    )
    return z, (z, beta, gamma, zeta)


def _hcl_bwd(training, interpret, res, ct):
    z, beta, gamma, zeta = res
    span = zeta - gamma
    # recover the pre-clip sigmoid from z where unclipped; clipped points
    # have zero gradient so any in-range value works there
    s = jnp.clip((z - gamma) / span, 1e-6, 1.0 - 1e-6)
    inside = ((z > 0.0) & (z < 1.0)).astype(ct.dtype)
    sp = inside * s * (1.0 - s)
    logit_s = jnp.log(s) - jnp.log1p(-s)
    batch_axes = tuple(range(ct.ndim - 1))
    if training:
        da = ct * sp * span / beta
        dbeta = (ct * sp * span * (-logit_s) / beta).sum(batch_axes)
    else:  # eval: s = sigmoid(a), no beta divide
        da = ct * sp * span
        dbeta = jnp.zeros_like(beta)
    dgamma = (ct * inside * (1.0 - s)).sum(batch_axes)
    dzeta = (ct * inside * s).sum(batch_axes)
    return (
        da.astype(z.dtype),
        None,
        dbeta.astype(beta.dtype),
        dgamma.astype(gamma.dtype),
        dzeta.astype(zeta.dtype),
    )


hard_concrete_fused_learned_diff.defvjp(_hcl_fwd, _hcl_bwd)
