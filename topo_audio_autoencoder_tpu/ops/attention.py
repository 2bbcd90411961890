"""Fused masked cross-attention (Pallas TPU forward, XLA backward).

Why this exists: the decoder's cross-attention (reference decoder.py:58-63)
materializes a [B, H, Q, M] fp32 score tensor (3.2 GB at the flagship
shape B=128, H=4, Q=250, M=6175). XLA's forward fusion for
mask -> rowmax -> softmax over that tensor runs at ~30 GB/s effective on
v5e (measured: 221 of the 262 ms decode forward — 84% of the whole step's
forward). Layout and dtype variants don't help (bench:
benchmarks/profile_step.py attn — all within 1%).

The fix is to never stream the score tensor through HBM: one Pallas
program per (batch*head, q-block) computes scores for the full memory
axis in VMEM (Q-block 128 x M ~ 3 MB fp32), does the fp32-island softmax
in place, and writes only the bf16 attention weights (needed as the
backward residual — exactly what XLA itself saves) and the [Q, D] output.

The backward is a second Pallas kernel over the saved weights: the
softmax-VJP's dp/ds temporaries ([BH, Q, M] fp32, ~3 GB at the flagship
shape) live and die in VMEM instead of streaming through HBM (~25 ms as
XLA einsums, ~2 ms fused). dk/dv accumulate across q-block grid visits.

Semantics (identical to the jnp reference path in models/decoder.py):
- scores scaled by 1/sqrt(D), key-mask applied additively (-1e9),
- softmax in fp32 regardless of input dtype (fp32 island),
- rows whose memory is fully masked produce exactly zero output
  (and zero attention weights, so their gradient is zero too).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


# The q-block adapts to the memory-axis length: per-program VMEM scales
# as qblk*Mp (fp32 score/exp temps + bf16 weights), and the flagship
# n=20 shape (Mp=6272, qblk=128) already sits near the budget — n=32's
# Mp=41472 needs qblk 32/16. Budget chosen so the worst program stays
# well under the raised 64 MB scoped-VMEM cap.
def _pick_qblk(mp: int, bytes_per_qm: int, budget: int = 24 * 1024 * 1024) -> int:
    for qb in (128, 64, 32, 16, 8):
        if mp * qb * bytes_per_qm <= budget or qb == 8:
            return qb
    return 8


def _attn_kernel(q_ref, kt_ref, vt_ref, mask_ref, out_ref, p_ref, *, scale):
    """One (batch*head, q-block) program: full-M softmax in VMEM."""
    q = q_ref[0]  # [QB, D] bf16
    kt = kt_ref[0]  # [D, Mp]
    vt = vt_ref[0]  # [D, Mp] (transposed: [Mp, D] would lane-pad 8x)
    mask = mask_ref[0]  # [1, Mp] float32 {0,1}
    s = jax.lax.dot_general(
        q, kt, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )  # [QB, Mp] fp32
    s = s * scale
    s = jnp.where(mask > 0.0, s, -1e9)
    m = jnp.max(s, axis=-1, keepdims=True)
    e = jnp.exp(s - m)
    denom = jnp.sum(e, axis=-1, keepdims=True)
    # All-masked memory: uniform e over -1e9 rows is garbage; zero it.
    valid = (jnp.sum(mask) > 0.0).astype(jnp.float32)
    p = (e / denom) * valid
    p_bf = p.astype(vt.dtype)
    o = jax.lax.dot_general(
        p_bf, vt, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )  # [QB, D]
    out_ref[0] = o.astype(out_ref.dtype)
    p_ref[0] = p_bf


@functools.partial(jax.jit, static_argnames=("interpret",))
def _attn_fwd_call(qh, kth, vth, maskp, interpret=False):
    """qh [BH, Qp, D], kth/vth [BH, D, Mp], maskp [B, 1, Mp]."""
    from jax.experimental import pallas as pl

    bh, qp, d = qh.shape
    mp = kth.shape[-1]
    b = maskp.shape[0]
    h = bh // b
    scale = 1.0 / np.sqrt(d)
    qb = _pick_qblk(mp, 12)  # s + e fp32 (8B) + p bf16 in+out (4B) per q*m
    grid = (bh, qp // qb)
    out, p = pl.pallas_call(
        functools.partial(_attn_kernel, scale=scale),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, qb, d), lambda i, j: (i, j, 0)),
            pl.BlockSpec((1, d, mp), lambda i, j: (i, 0, 0)),
            pl.BlockSpec((1, d, mp), lambda i, j: (i, 0, 0)),
            pl.BlockSpec((1, 1, mp), lambda i, j: (i // h, 0, 0)),
        ],
        out_shape=(
            jax.ShapeDtypeStruct((bh, qp, d), qh.dtype),
            jax.ShapeDtypeStruct((bh, qp, mp), qh.dtype),
        ),
        out_specs=(
            pl.BlockSpec((1, qb, d), lambda i, j: (i, j, 0)),
            pl.BlockSpec((1, qb, mp), lambda i, j: (i, j, 0)),
        ),
        # In f32 (no bf16 policy) one program's buffers hit 16.12M — a
        # hair over the default 16M scoped-VMEM cap; raise it.
        compiler_params=None if interpret else _compiler_params(),
        interpret=interpret,
    )(qh, kth, vth, maskp)
    return out, p


def _compiler_params():
    from jax.experimental.pallas import tpu as pltpu

    return pltpu.CompilerParams(vmem_limit_bytes=64 * 1024 * 1024)


def _attn_bwd_kernel(p_ref, dot_ref, qt_ref, kt_ref, vt_ref, dqt_ref, dkt_ref, dvt_ref, *, scale, qb):
    """One (batch*head, q-block) program: softmax-VJP in VMEM.

    The XLA equivalent materializes dp and ds ([BH, Q, M] fp32, ~3 GB at
    the flagship shape) through HBM (~25 ms measured); here they live and
    die in VMEM. dk/dv revisit the same output block across the q-block
    axis and accumulate (initialized on the first visit).

    All [*, D] tensors travel TRANSPOSED as [D, *]: with D=16 the minor
    dim would lane-pad 8x (a [Mp, 16] bf16 buffer costs 1.6 MB instead of
    0.2), which blew the scoped-VMEM budget in the [Mp, D] layout. The
    [D, Qp] arrays arrive as FULL-Q blocks (their lane dim must be
    128-aligned, which a q-block < 128 isn't) and the q-slice happens
    in-kernel with a dynamic slice.
    """
    from jax.experimental import pallas as pl

    j = pl.program_id(1)
    p = p_ref[0]  # [QB, Mp] bf16 saved attention weights
    # The [D, Qp] arrays arrive pre-reshaped to [BH, nqb, D, QB] so the
    # q-block is a whole trailing dim (lane-dim dynamic slices must be
    # 128-aligned, which a q-block < 128 isn't).
    dot_ = dot_ref[0, 0]  # [D, QB]
    qt = qt_ref[0, 0]  # [D, QB]
    kt = kt_ref[0]  # [D, Mp]
    vt = vt_ref[0]  # [D, Mp]
    f32 = jnp.float32
    # dv^T contribution = do^T @ p : [D, Mp]
    dvt = jax.lax.dot_general(
        dot_, p, (((1,), (0,)), ((), ())), preferred_element_type=f32
    )
    # dp = do @ v^T : [QB, Mp]  (contract D = sublanes of both)
    dp = jax.lax.dot_general(
        dot_, vt, (((0,), (0,)), ((), ())), preferred_element_type=f32
    )
    pf = p.astype(f32)
    ds = pf * (dp - jnp.sum(pf * dp, axis=-1, keepdims=True))  # softmax VJP
    ds_b = ds.astype(p.dtype)
    # dq^T = k^T @ ds^T : [D, QB]  (contract Mp = lanes of both)
    dqt = jax.lax.dot_general(
        kt, ds_b, (((1,), (1,)), ((), ())), preferred_element_type=f32
    )
    # dk^T = q^T @ ds : [D, Mp]  (contract QB)
    dkt = jax.lax.dot_general(
        qt, ds_b, (((1,), (0,)), ((), ())), preferred_element_type=f32
    )
    dqt_ref[0, 0] = (dqt * scale).astype(dqt_ref.dtype)

    @pl.when(j == 0)
    def _init():
        dkt_ref[0] = (dkt * scale).astype(dkt_ref.dtype)
        dvt_ref[0] = dvt.astype(dvt_ref.dtype)

    @pl.when(j > 0)
    def _accum():
        dkt_ref[0] += (dkt * scale).astype(dkt_ref.dtype)
        dvt_ref[0] += dvt.astype(dvt_ref.dtype)


@functools.partial(jax.jit, static_argnames=("interpret",))
def _attn_bwd_call(p, dot_, qt, kt, vt, interpret=False):
    """p [BH, Qp, Mp], dot_/qt [BH, D, Qp], kt/vt [BH, D, Mp].

    Returns (dq^T [BH, D, Qp], dk^T [BH, D, Mp], dv^T [BH, D, Mp]).
    """
    from jax.experimental import pallas as pl

    bh, d, qp = qt.shape
    mp = kt.shape[-1]
    scale = 1.0 / np.sqrt(d)
    qb = _pick_qblk(mp, 16)  # dp + ds fp32 + p + ds_b bf16 per q*m
    nqb = qp // qb

    def to_blocks(x):  # [BH, D, Qp] -> [BH, nqb, D, qb]
        return jnp.swapaxes(x.reshape(bh, d, nqb, qb), 1, 2)

    dqt4, dkt, dvt = pl.pallas_call(
        functools.partial(_attn_bwd_kernel, scale=scale, qb=qb),
        grid=(bh, nqb),
        in_specs=[
            pl.BlockSpec((1, qb, mp), lambda i, j: (i, j, 0)),
            pl.BlockSpec((1, 1, d, qb), lambda i, j: (i, j, 0, 0)),
            pl.BlockSpec((1, 1, d, qb), lambda i, j: (i, j, 0, 0)),
            pl.BlockSpec((1, d, mp), lambda i, j: (i, 0, 0)),
            pl.BlockSpec((1, d, mp), lambda i, j: (i, 0, 0)),
        ],
        out_shape=(
            jax.ShapeDtypeStruct((bh, nqb, d, qb), qt.dtype),
            jax.ShapeDtypeStruct((bh, d, mp), kt.dtype),
            jax.ShapeDtypeStruct((bh, d, mp), vt.dtype),
        ),
        out_specs=(
            pl.BlockSpec((1, 1, d, qb), lambda i, j: (i, j, 0, 0)),
            pl.BlockSpec((1, d, mp), lambda i, j: (i, 0, 0)),
            pl.BlockSpec((1, d, mp), lambda i, j: (i, 0, 0)),
        ),
        # fp32 [QB, Mp] temps put one program a hair over the default
        # 16 MB scoped-VMEM budget; raise it (v5e VMEM is far larger).
        compiler_params=None if interpret else _compiler_params(),
        interpret=interpret,
    )(p, to_blocks(dot_), to_blocks(qt), kt, vt)
    dqt = jnp.swapaxes(dqt4, 1, 2).reshape(bh, d, qp)
    return dqt, dkt, dvt


def _reference_attention(query, keys, values, key_mask, num_heads):
    """jnp path (CPU fallback + golden reference). Identical math."""
    b, tq, c = query.shape
    tm = keys.shape[1]
    h, d = num_heads, c // num_heads
    q = query.reshape(b, tq, h, d)
    k = keys.reshape(b, tm, h, d)
    v = values.reshape(b, tm, h, d)
    scores = jnp.einsum("bqhd,bmhd->bhqm", q, k).astype(jnp.float32)
    scores = scores / np.sqrt(d)
    scores = jnp.where(key_mask[:, None, None, :] > 0, scores, -1e9)
    attn = jax.nn.softmax(scores, axis=-1)
    any_valid = (key_mask.sum(axis=-1) > 0)[:, None, None, None]
    attn = jnp.where(any_valid, attn, 0.0).astype(query.dtype)
    out = jnp.einsum("bhqm,bmhd->bqhd", attn, v)
    return out.reshape(b, tq, c)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4,))
def fused_masked_attention(query, keys, values, key_mask, num_heads):
    """Multi-head dot-product attention with a key-padding mask.

    query [B, Q, C], keys/values [B, M, C], key_mask [B, M] {0,1}.
    Returns [B, Q, C]. C = num_heads * head_dim. Pallas on TPU, jnp
    elsewhere; fp32 softmax either way.
    """
    out, _ = _fused_fwd(query, keys, values, key_mask, num_heads)
    return out


def _split_heads(x, h):
    b, t, c = x.shape
    return x.reshape(b, t, h, c // h).transpose(0, 2, 1, 3).reshape(b * h, t, c // h)


def _merge_heads(x, b):
    bh, t, d = x.shape
    h = bh // b
    return x.reshape(b, h, t, d).transpose(0, 2, 1, 3).reshape(b, t, h * d)


def _use_pallas() -> bool:
    try:
        return jax.default_backend() == "tpu"
    except Exception:  # pragma: no cover
        return False


def _fused_fwd(query, keys, values, key_mask, num_heads):
    # Harmonize input dtypes (mixed f32/bf16 callers otherwise hit the
    # kernel with a q-dtype p_ref vs v-dtype weights); softmax is fp32
    # inside the kernel regardless. Residuals keep the ORIGINAL arrays —
    # the VJP must return cotangents in the original dtypes, and dtypes
    # themselves are not valid residual leaves.
    dt = jnp.result_type(query, keys, values)
    if not _use_pallas():
        out = _reference_attention(
            query.astype(dt), keys.astype(dt), values.astype(dt),
            key_mask, num_heads,
        )
        return out, (query, keys, values, key_mask, None)

    b, tq, c = query.shape
    tm = keys.shape[1]
    h, d = num_heads, c // num_heads
    # qp is 128-aligned (the lcm of every adaptive q-block choice, and
    # the lane alignment the backward's [D, Qp] blocks require).
    qp, mp = _round_up(tq, 128), _round_up(tm, 128)

    qh = _split_heads(query.astype(dt), h)  # [BH, Q, D]
    kh = _split_heads(keys.astype(dt), h)
    vh = _split_heads(values.astype(dt), h)
    qh = jnp.pad(qh, ((0, 0), (0, qp - tq), (0, 0)))
    kth = jnp.pad(jnp.swapaxes(kh, 1, 2), ((0, 0), (0, 0), (0, mp - tm)))
    vth = jnp.pad(jnp.swapaxes(vh, 1, 2), ((0, 0), (0, 0), (0, mp - tm)))
    maskp = jnp.pad(key_mask.astype(jnp.float32), ((0, 0), (0, mp - tm)))[:, None, :]

    out, p = _attn_fwd_call(qh, kth, vth, maskp)
    out = _merge_heads(out[:, :tq], b)
    return out, (query, keys, values, key_mask, p)


def _fused_bwd(num_heads, res, ct):
    query, keys, values, key_mask, p = res
    b, tq, c = query.shape
    tm = keys.shape[1]
    h, d = num_heads, c // num_heads
    scale = 1.0 / np.sqrt(d)
    dt = jnp.result_type(query, keys, values)

    if p is None:
        # CPU path: differentiate the reference implementation.
        _, vjp = jax.vjp(
            lambda q, k, v: _reference_attention(
                q.astype(dt), k.astype(dt), v.astype(dt), key_mask, h
            ),
            query, keys, values,
        )
        return *vjp(ct.astype(dt)), None

    # p: [BH, Qp, Mp] saved attention weights. Softmax-VJP as a second
    # Pallas kernel: dp/ds stay in VMEM (the XLA einsum chain streams two
    # [BH, Q, M] fp32 tensors through HBM — ~25 ms at the flagship shape).
    # Masked (and all-masked) positions have p == 0 => ds == 0 there, so
    # the mask needs no separate handling.
    qp, mp = p.shape[1], p.shape[2]
    dtt = p.dtype

    def to_t(x, length, pad_to):  # [B, T, C] -> [BH, D, pad_to]
        xt = jnp.swapaxes(_split_heads(x.astype(dtt), h), 1, 2)
        return jnp.pad(xt, ((0, 0), (0, 0), (0, pad_to - length)))

    qt = to_t(query, tq, qp)
    kt = to_t(keys, tm, mp)
    vt = to_t(values, tm, mp)
    dot_ = to_t(ct, tq, qp)

    # interpret mode off-TPU: lets the kernel-residual path run (and be
    # parity-tested) on CPU.
    dqt, dkt, dvt = _attn_bwd_call(p, dot_, qt, kt, vt, interpret=not _use_pallas())

    return (
        _merge_heads(jnp.swapaxes(dqt, 1, 2)[:, :tq], b).astype(query.dtype),
        _merge_heads(jnp.swapaxes(dkt, 1, 2)[:, :tm], b).astype(keys.dtype),
        _merge_heads(jnp.swapaxes(dvt, 1, 2)[:, :tm], b).astype(values.dtype),
        None,
    )


fused_masked_attention.defvjp(_fused_fwd, _fused_bwd)
