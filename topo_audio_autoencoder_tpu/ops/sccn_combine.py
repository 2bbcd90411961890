"""Fused SCCN message combine (Pallas TPU, jnp reference elsewhere).

Per rank, an SCCN layer turns up-to-three message carriers into one output
(reference custom_sccn.py:78-135):

    msg_m  = carrier_m @ V_m + x          (channel mix + residual)
    h_m    = gelu(msg_m @ W1 + b1)
    s_m    = h_m @ w2                      (attention score)
    attn   = softmax_m(s)
    y      = sum_m attn_m * msg_m

As separate XLA ops this streams the [B, S, C] tensors through HBM ~25
times per rank per layer (three Denses in+out, a stack, the attention MLP
in+out, softmax, weighted sum) — measured round 2 as a ~31 ms "C=64 Dense
tail" of the 152 ms flagship step, running at 5-10 TF/s because every op
is bandwidth-bound ([*, 64] x [64, 64] matmuls move 2 bytes per FLOP).

The fused kernel reads each carrier and x exactly ONCE and writes y once
(M+2 tensor passes instead of ~25): one Pallas program per row-tile holds
the per-message activations in VMEM, does the matmuls on the MXU with f32
accumulation, the M-way softmax in f32, and the weighted combine in
registers. The backward kernel recomputes the forward from the same
inputs (VMEM is cheaper than HBM residuals at these shapes) and emits
input cotangents per tile plus f32 weight-gradient accumulators that
revisit one shared block across the sequential TPU grid.

Scale handling: the per-message learnable scales fold into the weight,
``V_m = W_m * scale_m``, OUTSIDE this op — autodiff through that product
recovers dW and dscale from dV, so the kernel neither sees nor
differentiates the scales.

The ``x`` operand carries the residual; pass zeros for residual=False
(the zero cotangent is discarded by construction).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

_SQRT_2_OVER_PI = float(np.sqrt(2.0 / np.pi))
_GELU_C = 0.044715

# Below this many rows the dispatch+padding overhead of a kernel launch
# beats the HBM savings — ranks 0/1 (20/190 simplices) stay on XLA.
MIN_FUSED_ROWS = 4096


def _gelu(x):
    """tanh-approximate gelu, bit-matching jax.nn.gelu(approximate=True)."""
    u = _SQRT_2_OVER_PI * (x + _GELU_C * x * x * x)
    return 0.5 * x * (1.0 + jnp.tanh(u))


def _gelu_grad(x):
    u = _SQRT_2_OVER_PI * (x + _GELU_C * x * x * x)
    t = jnp.tanh(u)
    du = _SQRT_2_OVER_PI * (1.0 + 3.0 * _GELU_C * x * x)
    return 0.5 * (1.0 + t) + 0.5 * x * (1.0 - t * t) * du


def message_combine_reference(carriers, x, v, w1, b1, w2):
    """Pure-jnp semantics (CPU path + parity golden).

    carriers: tuple of M [B, S, C] arrays (a stacked [M, B, S, C] array
    also works), x [B, S, C], v [M, C, C], w1 [C, C], b1 [C], w2 [C, 1]
    -> [B, S, C]. Formulation chosen by on-chip A/B at the flagship
    rank-3 shape (`benchmarks/ab_combine.py --variants`, fwd+bwd):
    per-message plain dot with the residual added BEFORE stacking
    (8.4 ms) beats adding x to the stacked tensor afterwards (9.6 ms —
    the broadcast-add is an extra full HBM pass instead of a matmul
    epilogue) and the batched ``mbsc,mcd->mbsd`` einsum (9.2 ms — its
    batched-matmul operand layout forces copies). The shared-weight
    attention MLP over [M, B, S, C] is an ordinary last-dim matmul and
    needs no batched layout. Softmax over the message axis in f32.
    """
    msgs = jnp.stack([c @ v[i] + x for i, c in enumerate(carriers)])
    h = jax.nn.gelu(msgs @ w1 + b1)
    scores = (h @ w2).astype(jnp.float32)  # [M, B, S, 1]
    attn = jax.nn.softmax(scores, axis=0).astype(msgs.dtype)
    return (msgs * attn).sum(axis=0)


# ------------------------------------------------------------------ fwd


def _fwd_kernel(car_ref, x_ref, v_ref, w1_ref, b1_ref, w2_ref, out_ref, *, m):
    # w2 travels as a [1, C] row (a [C, 1] operand would put the lane dim
    # at width 1 — the score contraction is an elementwise mul + reduce).
    f32 = jnp.float32
    xx = x_ref[...].astype(f32)  # [T, C]
    w1 = w1_ref[...]
    b1 = b1_ref[...].astype(f32)  # [1, C]
    w2 = w2_ref[...].astype(f32)  # [1, C]
    msgs, scores = [], []
    for i in range(m):
        mm = jax.lax.dot_general(
            car_ref[i], v_ref[i], (((1,), (0,)), ((), ())),
            preferred_element_type=f32,
        ) + xx  # [T, C] f32
        pre = jax.lax.dot_general(
            mm.astype(w1.dtype), w1, (((1,), (0,)), ((), ())),
            preferred_element_type=f32,
        ) + b1
        h = _gelu(pre)
        s = jnp.sum(h * w2, axis=-1, keepdims=True)  # [T, 1]
        msgs.append(mm)
        scores.append(s)
    smax = scores[0]
    for s in scores[1:]:
        smax = jnp.maximum(smax, s)
    exps = [jnp.exp(s - smax) for s in scores]
    denom = exps[0]
    for e in exps[1:]:
        denom = denom + e
    y = msgs[0] * (exps[0] / denom)
    for mm, e in zip(msgs[1:], exps[1:]):
        y = y + mm * (e / denom)
    out_ref[...] = y.astype(out_ref.dtype)


# ------------------------------------------------------------------ bwd


def _bwd_kernel(
    car_ref, x_ref, v_ref, w1_ref, b1_ref, w2_ref, dy_ref,
    dcar_ref, dx_ref, dv_ref, dw1_ref, db1_ref, dw2_ref, *, m,
):
    from jax.experimental import pallas as pl

    f32 = jnp.float32
    xx = x_ref[...].astype(f32)
    w1 = w1_ref[...]
    b1 = b1_ref[...].astype(f32)
    w2 = w2_ref[...].astype(f32)  # [1, C]
    dy = dy_ref[...].astype(f32)  # [T, C]

    # --- recompute forward (activations live only in VMEM) ---
    msgs, pres, hs, scores = [], [], [], []
    for i in range(m):
        mm = jax.lax.dot_general(
            car_ref[i], v_ref[i], (((1,), (0,)), ((), ())),
            preferred_element_type=f32,
        ) + xx
        pre = jax.lax.dot_general(
            mm.astype(w1.dtype), w1, (((1,), (0,)), ((), ())),
            preferred_element_type=f32,
        ) + b1
        h = _gelu(pre)
        s = jnp.sum(h * w2, axis=-1, keepdims=True)  # [T, 1]
        msgs.append(mm)
        pres.append(pre)
        hs.append(h)
        scores.append(s)
    smax = scores[0]
    for s in scores[1:]:
        smax = jnp.maximum(smax, s)
    exps = [jnp.exp(s - smax) for s in scores]
    denom = exps[0]
    for e in exps[1:]:
        denom = denom + e
    attn = [e / denom for e in exps]

    # --- backward ---
    dattn = [jnp.sum(dy * mm, axis=-1, keepdims=True) for mm in msgs]
    inner = attn[0] * dattn[0]
    for a, da in zip(attn[1:], dattn[1:]):
        inner = inner + a * da
    dx = jnp.zeros_like(xx)
    bd = w1.dtype
    for i in range(m):
        ds = attn[i] * (dattn[i] - inner)  # [T, 1] f32
        dh = ds * w2  # [T, 1] x [1, C] -> [T, C]
        dpre = dh * _gelu_grad(pres[i])
        dmsg = attn[i] * dy + jax.lax.dot_general(
            dpre.astype(bd), w1, (((1,), (1,)), ((), ())),
            preferred_element_type=f32,
        )
        dx = dx + dmsg
        dcar_ref[i] = jax.lax.dot_general(
            dmsg.astype(bd), v_ref[i], (((1,), (1,)), ((), ())),
            preferred_element_type=f32,
        ).astype(dcar_ref.dtype)

        dv_i = jax.lax.dot_general(
            car_ref[i], dmsg.astype(bd), (((0,), (0,)), ((), ())),
            preferred_element_type=f32,
        )
        dw1_i = jax.lax.dot_general(
            msgs[i].astype(bd), dpre.astype(bd), (((0,), (0,)), ((), ())),
            preferred_element_type=f32,
        )
        db1_i = jnp.sum(dpre, axis=0, keepdims=True)  # [1, C]
        dw2_i = jnp.sum(hs[i] * ds, axis=0, keepdims=True)  # [1, C]

        @pl.when(pl.program_id(0) == 0)
        def _init(i=i, dv_i=dv_i, dw1_i=dw1_i, db1_i=db1_i, dw2_i=dw2_i):
            dv_ref[i] = dv_i
            if i == 0:
                dw1_ref[...] = dw1_i
                db1_ref[...] = db1_i
                dw2_ref[...] = dw2_i
            else:
                dw1_ref[...] += dw1_i
                db1_ref[...] += db1_i
                dw2_ref[...] += dw2_i

        @pl.when(pl.program_id(0) > 0)
        def _accum(i=i, dv_i=dv_i, dw1_i=dw1_i, db1_i=db1_i, dw2_i=dw2_i):
            dv_ref[i] += dv_i
            dw1_ref[...] += dw1_i
            db1_ref[...] += db1_i
            dw2_ref[...] += dw2_i

    dx_ref[...] = dx.astype(dx_ref.dtype)


# ------------------------------------------------------------- plumbing


def _round_up(n: int, k: int) -> int:
    return (n + k - 1) // k * k


def _use_pallas() -> bool:
    try:
        return jax.default_backend() == "tpu"
    except Exception:  # pragma: no cover
        return False


def _compiler_params():
    from jax.experimental.pallas import tpu as pltpu

    return pltpu.CompilerParams(vmem_limit_bytes=96 * 1024 * 1024)


def _pick_tile(p: int) -> int:
    # Big tiles: each Pallas program carries fixed launch overhead, and the
    # flagship step visits ~1.9M rank-3 rows per layer — 512-row tiles cost
    # ~30k launches across 6 layers (measured +95 ms vs the unfused XLA
    # path). 4096-row tiles cut that 8x; VMEM per program stays ~20 MB.
    for t in (4096, 512, 128):
        if p % t == 0:
            return t
    return 128


@functools.partial(jax.jit, static_argnames=("interpret",))
def _fwd_call(car, x, v, w1, b1, w2, interpret=False):
    """car [M, P, C] (P row-padded), x [P, C] -> y [P, C]."""
    from jax.experimental import pallas as pl

    m, p, c = car.shape
    t = _pick_tile(p)
    grid = (p // t,)
    return pl.pallas_call(
        functools.partial(_fwd_kernel, m=m),
        grid=grid,
        in_specs=[
            pl.BlockSpec((m, t, c), lambda i: (0, i, 0)),
            pl.BlockSpec((t, c), lambda i: (i, 0)),
            pl.BlockSpec((m, c, c), lambda i: (0, 0, 0)),
            pl.BlockSpec((c, c), lambda i: (0, 0)),
            pl.BlockSpec((1, c), lambda i: (0, 0)),
            pl.BlockSpec((1, c), lambda i: (0, 0)),
        ],
        out_shape=jax.ShapeDtypeStruct((p, c), x.dtype),
        out_specs=pl.BlockSpec((t, c), lambda i: (i, 0)),
        compiler_params=None if interpret else _compiler_params(),
        interpret=interpret,
    )(car, x, v, w1, b1.reshape(1, c), w2.reshape(1, c))


@functools.partial(jax.jit, static_argnames=("interpret",))
def _bwd_call(car, x, v, w1, b1, w2, dy, interpret=False):
    from jax.experimental import pallas as pl

    m, p, c = car.shape
    t = _pick_tile(p)
    grid = (p // t,)
    f32 = jnp.float32
    dcar, dx, dv, dw1, db1, dw2 = pl.pallas_call(
        functools.partial(_bwd_kernel, m=m),
        grid=grid,
        in_specs=[
            pl.BlockSpec((m, t, c), lambda i: (0, i, 0)),
            pl.BlockSpec((t, c), lambda i: (i, 0)),
            pl.BlockSpec((m, c, c), lambda i: (0, 0, 0)),
            pl.BlockSpec((c, c), lambda i: (0, 0)),
            pl.BlockSpec((1, c), lambda i: (0, 0)),
            pl.BlockSpec((1, c), lambda i: (0, 0)),
            pl.BlockSpec((t, c), lambda i: (i, 0)),
        ],
        out_shape=(
            jax.ShapeDtypeStruct((m, p, c), car.dtype),
            jax.ShapeDtypeStruct((p, c), x.dtype),
            jax.ShapeDtypeStruct((m, c, c), f32),
            jax.ShapeDtypeStruct((c, c), f32),
            jax.ShapeDtypeStruct((1, c), f32),
            jax.ShapeDtypeStruct((1, c), f32),
        ),
        out_specs=(
            pl.BlockSpec((m, t, c), lambda i: (0, i, 0)),
            pl.BlockSpec((t, c), lambda i: (i, 0)),
            pl.BlockSpec((m, c, c), lambda i: (0, 0, 0)),
            pl.BlockSpec((c, c), lambda i: (0, 0)),
            pl.BlockSpec((1, c), lambda i: (0, 0)),
            pl.BlockSpec((1, c), lambda i: (0, 0)),
        ),
        compiler_params=None if interpret else _compiler_params(),
        interpret=interpret,
    )(car, x, v, w1, b1.reshape(1, c), w2.reshape(1, c), dy)
    return dcar, dx, dv, dw1, db1, dw2


@jax.custom_vjp
def fused_message_combine(carriers, x, v, w1, b1, w2):
    """Fused message-mix + attention combine. See module docstring.

    carriers: tuple of M [B, S, C] arrays (or a stacked [M, B, S, C]
    array), x [B, S, C], v [M, C, C], w1 [C, C], b1 [C], w2 [C, 1]
    -> [B, S, C].
    """
    out, _ = _fmc_fwd(carriers, x, v, w1, b1, w2)
    return out


def _flatten_pad(car, x, t_block=128):
    m, b, s, c = car.shape
    rows = b * s
    p = _round_up(rows, 4096 if rows >= 4096 else (512 if rows >= 512 else t_block))
    car2 = car.reshape(m, b * s, c)
    x2 = x.reshape(b * s, c)
    if p != b * s:
        car2 = jnp.pad(car2, ((0, 0), (0, p - b * s), (0, 0)))
        x2 = jnp.pad(x2, ((0, p - b * s), (0, 0)))
    return car2, x2


def _fmc_fwd(carriers, x, v, w1, b1, w2):
    if not _use_pallas():
        out = message_combine_reference(carriers, x, v, w1, b1, w2)
        return out, (carriers, x, v, w1, b1, w2)
    car = carriers if hasattr(carriers, "shape") else jnp.stack(carriers)
    m, b, s, c = car.shape
    car2, x2 = _flatten_pad(car, x)
    y = _fwd_call(car2, x2, v, w1, b1, w2)
    out = y[: b * s].reshape(b, s, c)
    return out, (carriers, x, v, w1, b1, w2)


def _fmc_bwd(res, dy):
    carriers, x, v, w1, b1, w2 = res
    if not _use_pallas():
        _, vjp = jax.vjp(message_combine_reference, carriers, x, v, w1, b1, w2)
        return vjp(dy)
    stacked_in = hasattr(carriers, "shape")
    car = carriers if stacked_in else jnp.stack(carriers)
    m, b, s, c = car.shape
    car2, x2 = _flatten_pad(car, x)
    dy2 = jnp.pad(
        dy.reshape(b * s, c), ((0, car2.shape[1] - b * s), (0, 0))
    )
    dcar, dx, dv, dw1, db1, dw2 = _bwd_call(car2, x2, v, w1, b1, w2, dy2)
    dcar_full = dcar[:, : b * s].reshape(m, b, s, c)
    return (
        dcar_full.astype(car.dtype)
        if stacked_in
        else tuple(dcar_full[i].astype(car.dtype) for i in range(m)),
        dx[: b * s].reshape(b, s, c).astype(x.dtype),
        dv.astype(v.dtype),
        dw1.astype(w1.dtype),
        db1.reshape(c).astype(b1.dtype),
        dw2.reshape(c, 1).astype(w2.dtype),
    )


fused_message_combine.defvjp(_fmc_fwd, _fmc_bwd)
