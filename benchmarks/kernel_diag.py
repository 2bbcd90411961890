"""Decompose the fused message-combine kernel's cost, and test a
lane-packed reformulation.

Round-3 measured the fused SCCN combine kernel (ops/sccn_combine.py) at
4-5x SLOWER than the XLA composition at the flagship rank-3 shape
(1.86M rows, C=64, M=2): 20 ms fwd vs 4.2 ms. The hypothesized
mechanisms (RESULTS.md): C=64 uses half of each 128-lane vreg / bf16
(16,128) VMEM tile, and the f32 tanh-gelu chain is VPU-heavy. This
harness separates those by timing a ladder of kernel variants that all
move the same HBM traffic:

  copy    DMA + launch floor: y = car0 + car1 + x, no compute
  matmul  + the two [T,64]x[64,64] mixes (MXU), no attention MLP
  nogelu  full pipeline with identity activation (no tanh)
  full    the production kernel (ops/sccn_combine._fwd_call)
  packed  lane-packed reformulation: carriers travel as ONE [T, 2C=128]
          block, the mixes/MLP run as block-diagonal [128,128] matmuls
          (full MXU tiles), gelu runs on full 128-lane vregs, the
          residual tile and the final half-fold are MXU matmuls
          (no in-kernel lane slicing/relayouts)
  xla     the message_combine_reference jnp composition (the one to beat)

The ladder reads directly: copy = overhead floor, matmul-copy = MXU,
nogelu-matmul = softmax/score chain, full-nogelu = tanh-gelu,
packed vs full = the lane-packing win. Parity for `packed` is asserted
against the jnp reference in interpret mode before any timing.

Usage:
  python benchmarks/kernel_diag.py --parity     # CPU, interpret mode
  python benchmarks/kernel_diag.py [--rows N] [--tile T] [--variants a,b]
"""
import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
_CACHE = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache")
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", _CACHE)
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1.0")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES", "0")

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", _CACHE)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

from topo_audio_autoencoder_tpu.ops.sccn_combine import (  # noqa: E402
    _compiler_params,
    _fwd_kernel,
    _gelu,
    _gelu_grad,
    message_combine_reference,
)

T0 = time.time()


def log(m):
    print(f"[+{time.time()-T0:6.1f}s] {m}", flush=True)


def arg(name, default, cast=int):
    return cast(sys.argv[sys.argv.index(name) + 1]) if name in sys.argv else default


# ------------------------------------------------------------ variants


def _copy_kernel(car_ref, x_ref, out_ref, *, m):
    acc = x_ref[...].astype(jnp.float32)
    for i in range(m):
        acc = acc + car_ref[i].astype(jnp.float32)
    out_ref[...] = acc.astype(out_ref.dtype)


def _matmul_kernel(car_ref, x_ref, v_ref, out_ref, *, m):
    f32 = jnp.float32
    xx = x_ref[...].astype(f32)
    acc = jnp.zeros_like(xx)
    for i in range(m):
        acc = acc + jax.lax.dot_general(
            car_ref[i], v_ref[i], (((1,), (0,)), ((), ())),
            preferred_element_type=f32,
        ) + xx
    out_ref[...] = acc.astype(out_ref.dtype)


def _nogelu_kernel(car_ref, x_ref, v_ref, w1_ref, b1_ref, w2_ref, out_ref, *, m):
    """The production kernel with gelu replaced by identity."""
    f32 = jnp.float32
    xx = x_ref[...].astype(f32)
    w1 = w1_ref[...]
    b1 = b1_ref[...].astype(f32)
    w2 = w2_ref[...].astype(f32)
    msgs, scores = [], []
    for i in range(m):
        mm = jax.lax.dot_general(
            car_ref[i], v_ref[i], (((1,), (0,)), ((), ())),
            preferred_element_type=f32,
        ) + xx
        pre = jax.lax.dot_general(
            mm.astype(w1.dtype), w1, (((1,), (0,)), ((), ())),
            preferred_element_type=f32,
        ) + b1
        s = jnp.sum(pre * w2, axis=-1, keepdims=True)
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


def _packed_kernel(carp_ref, x_ref, vblk_ref, w1blk_ref, b1t_ref, w2t_ref,
                   tile_ref, fold_ref, out_ref, *, c):
    """M=2 combine on lane-packed [T, 2C] blocks (2C == 128 for C=64).

    Every elementwise op runs on full 128-lane vregs; the two message
    mixes and the attention MLP are single block-diagonal [2C, 2C]
    matmuls (full MXU tiles); the residual tile (x -> [x | x]) and the
    final half-fold (y0*a0 + y1*a1 summed across halves) are matmuls
    against constant 0/1 matrices, so the kernel contains NO lane
    slicing, concatenation, or reshape — the ops Mosaic relayouts on.
    """
    f32 = jnp.float32
    carp = carp_ref[...]                       # [T, 2C] bf16
    xx = x_ref[...]                            # [T, C]  bf16
    xt = jax.lax.dot_general(                  # [T, 2C] = x @ [I | I]
        xx, tile_ref[...], (((1,), (0,)), ((), ())),
        preferred_element_type=f32,
    )
    msgs = jax.lax.dot_general(
        carp, vblk_ref[...], (((1,), (0,)), ((), ())),
        preferred_element_type=f32,
    ) + xt                                     # [T, 2C] f32
    pre = jax.lax.dot_general(
        msgs.astype(carp.dtype), w1blk_ref[...], (((1,), (0,)), ((), ())),
        preferred_element_type=f32,
    ) + b1t_ref[...].astype(f32)
    h = _gelu(pre)
    z = h * w2t_ref[...].astype(f32)           # [T, 2C]
    lanes = jax.lax.broadcasted_iota(jnp.int32, z.shape, 1)
    first = lanes < c
    s0 = jnp.sum(jnp.where(first, z, 0.0), axis=-1, keepdims=True)
    s1 = jnp.sum(jnp.where(first, 0.0, z), axis=-1, keepdims=True)
    a0 = jax.nn.sigmoid(s0 - s1)               # softmax over m=2
    attn = jnp.where(first, a0, 1.0 - a0)      # [T, 2C]
    yp = (msgs * attn).astype(carp.dtype)
    out_ref[...] = jax.lax.dot_general(        # fold halves: yp @ [I ; I]
        yp, fold_ref[...], (((1,), (0,)), ((), ())),
        preferred_element_type=f32,
    ).astype(out_ref.dtype)


def _packed_bwd_kernel(carp_ref, x_ref, vblk_ref, w1blk_ref, b1t_ref,
                       w2t_ref, tile_ref, fold_ref, dy_ref,
                       dcarp_ref, dx_ref, dvblk_ref, dw1blk_ref, db1t_ref,
                       dw2t_ref, *, c):
    """Backward of _packed_kernel: recomputes the forward in VMEM, emits
    per-tile input cotangents and f32 weight-grad accumulators that
    revisit one shared block across the sequential grid (same pattern as
    ops/sccn_combine._bwd_kernel). Weight grads are in PACKED space —
    the caller folds diagonal blocks / halves back to W1/b1/w2/V."""
    from jax.experimental import pallas as pl

    f32 = jnp.float32
    carp = carp_ref[...]
    xx = x_ref[...]
    tile_m = tile_ref[...]
    fold_m = fold_ref[...]
    vblk = vblk_ref[...]
    w1blk = w1blk_ref[...]
    w2t = w2t_ref[...].astype(f32)
    bd = carp.dtype

    # --- recompute forward ---
    xt = jax.lax.dot_general(xx, tile_m, (((1,), (0,)), ((), ())),
                             preferred_element_type=f32)
    msgs = jax.lax.dot_general(carp, vblk, (((1,), (0,)), ((), ())),
                               preferred_element_type=f32) + xt
    pre = jax.lax.dot_general(msgs.astype(bd), w1blk, (((1,), (0,)), ((), ())),
                              preferred_element_type=f32) + b1t_ref[...].astype(f32)
    h = _gelu(pre)
    z = h * w2t
    lanes = jax.lax.broadcasted_iota(jnp.int32, z.shape, 1)
    first = lanes < c
    s0 = jnp.sum(jnp.where(first, z, 0.0), axis=-1, keepdims=True)
    s1 = jnp.sum(jnp.where(first, 0.0, z), axis=-1, keepdims=True)
    a0 = jax.nn.sigmoid(s0 - s1)
    attn = jnp.where(first, a0, 1.0 - a0)

    # --- backward ---
    dyp = jax.lax.dot_general(dy_ref[...], tile_m, (((1,), (0,)), ((), ())),
                              preferred_element_type=f32)  # tile dy to [T,2C]
    dmsgs = dyp * attn
    dattn = dyp * msgs
    da0 = jnp.sum(jnp.where(first, dattn, -dattn), axis=-1, keepdims=True)
    dd = da0 * a0 * (1.0 - a0)
    dz = jnp.where(first, dd, -dd)
    dh = dz * w2t
    dpre = dh * _gelu_grad(pre)
    dmsgs = dmsgs + jax.lax.dot_general(
        dpre.astype(bd), w1blk, (((1,), (1,)), ((), ())),
        preferred_element_type=f32)
    dcarp_ref[...] = jax.lax.dot_general(
        dmsgs.astype(bd), vblk, (((1,), (1,)), ((), ())),
        preferred_element_type=f32).astype(dcarp_ref.dtype)
    dx_ref[...] = jax.lax.dot_general(
        dmsgs.astype(bd), fold_m, (((1,), (0,)), ((), ())),
        preferred_element_type=f32).astype(dx_ref.dtype)

    dvblk_i = jax.lax.dot_general(carp, dmsgs.astype(bd),
                                  (((0,), (0,)), ((), ())),
                                  preferred_element_type=f32)
    dw1blk_i = jax.lax.dot_general(msgs.astype(bd), dpre.astype(bd),
                                   (((0,), (0,)), ((), ())),
                                   preferred_element_type=f32)
    db1t_i = jnp.sum(dpre, axis=0, keepdims=True)
    dw2t_i = jnp.sum(h * dz, axis=0, keepdims=True)

    @pl.when(pl.program_id(0) == 0)
    def _init():
        dvblk_ref[...] = dvblk_i
        dw1blk_ref[...] = dw1blk_i
        db1t_ref[...] = db1t_i
        dw2t_ref[...] = dw2t_i

    @pl.when(pl.program_id(0) > 0)
    def _accum():
        dvblk_ref[...] += dvblk_i
        dw1blk_ref[...] += dw1blk_i
        db1t_ref[...] += db1t_i
        dw2t_ref[...] += dw2t_i


# ------------------------------------------------------------- callers


def _pack_operands(car, x, v, w1, b1, w2):
    """[2,P,C] carriers -> [P,2C] lane-packed + block-diag weights.

    In production the carrier pack would fuse into the upstream incidence
    matmuls' epilogue (each writes its half of the packed buffer); here
    the transpose+reshape cost is deliberately INCLUDED in the timing.
    """
    m, p, c = car.shape
    assert m == 2, "packed variant is specialized to M=2"
    carp = jnp.swapaxes(car, 0, 1).reshape(p, m * c)
    zero = jnp.zeros((c, c), v.dtype)
    vblk = jnp.block([[v[0], zero], [zero, v[1]]])
    w1blk = jnp.block([[w1, zero], [zero, w1]])
    b1t = jnp.concatenate([b1, b1]).reshape(1, 2 * c)
    w2t = jnp.concatenate([w2[:, 0], w2[:, 0]]).reshape(1, 2 * c)
    eye = jnp.eye(c, dtype=car.dtype)
    tile_m = jnp.concatenate([eye, eye], axis=1)        # [C, 2C]
    fold_m = jnp.concatenate([eye, eye], axis=0)        # [2C, C]
    return carp, vblk, w1blk, b1t, w2t, tile_m, fold_m


@functools.partial(jax.jit, static_argnames=("tile", "interpret"))
def packed_call(car, x, v, w1, b1, w2, tile=4096, interpret=False):
    """car [M=2, P, C], unpacked operands -> y [P, C]."""
    from jax.experimental import pallas as pl

    m, p, c = car.shape
    carp, vblk, w1blk, b1t, w2t, tile_m, fold_m = _pack_operands(
        car, x, v, w1, b1, w2)
    grid = (p // tile,)
    return pl.pallas_call(
        functools.partial(_packed_kernel, c=c),
        grid=grid,
        in_specs=[
            pl.BlockSpec((tile, 2 * c), lambda i: (i, 0)),
            pl.BlockSpec((tile, c), lambda i: (i, 0)),
            pl.BlockSpec((2 * c, 2 * c), lambda i: (0, 0)),
            pl.BlockSpec((2 * c, 2 * c), lambda i: (0, 0)),
            pl.BlockSpec((1, 2 * c), lambda i: (0, 0)),
            pl.BlockSpec((1, 2 * c), lambda i: (0, 0)),
            pl.BlockSpec((c, 2 * c), lambda i: (0, 0)),
            pl.BlockSpec((2 * c, c), lambda i: (0, 0)),
        ],
        out_shape=jax.ShapeDtypeStruct((p, c), x.dtype),
        out_specs=pl.BlockSpec((tile, c), lambda i: (i, 0)),
        compiler_params=None if interpret else _compiler_params(),
        interpret=interpret,
    )(carp, x, vblk, w1blk, b1t, w2t, tile_m, fold_m)


@functools.partial(jax.jit, static_argnames=("tile", "interpret"))
def packed_bwd_call(car, x, v, w1, b1, w2, dy, tile=4096, interpret=False):
    """Packed backward: returns (dcar [2,P,C], dx, dv, dw1, db1, dw2)."""
    from jax.experimental import pallas as pl

    m, p, c = car.shape
    carp, vblk, w1blk, b1t, w2t, tile_m, fold_m = _pack_operands(
        car, x, v, w1, b1, w2)
    grid = (p // tile,)
    f32 = jnp.float32
    dcarp, dx, dvblk, dw1blk, db1t, dw2t = pl.pallas_call(
        functools.partial(_packed_bwd_kernel, c=c),
        grid=grid,
        in_specs=[
            pl.BlockSpec((tile, 2 * c), lambda i: (i, 0)),
            pl.BlockSpec((tile, c), lambda i: (i, 0)),
            pl.BlockSpec((2 * c, 2 * c), lambda i: (0, 0)),
            pl.BlockSpec((2 * c, 2 * c), lambda i: (0, 0)),
            pl.BlockSpec((1, 2 * c), lambda i: (0, 0)),
            pl.BlockSpec((1, 2 * c), lambda i: (0, 0)),
            pl.BlockSpec((c, 2 * c), lambda i: (0, 0)),
            pl.BlockSpec((2 * c, c), lambda i: (0, 0)),
            pl.BlockSpec((tile, c), lambda i: (i, 0)),
        ],
        out_shape=(
            jax.ShapeDtypeStruct((p, 2 * c), car.dtype),
            jax.ShapeDtypeStruct((p, c), x.dtype),
            jax.ShapeDtypeStruct((2 * c, 2 * c), f32),
            jax.ShapeDtypeStruct((2 * c, 2 * c), f32),
            jax.ShapeDtypeStruct((1, 2 * c), f32),
            jax.ShapeDtypeStruct((1, 2 * c), f32),
        ),
        out_specs=(
            pl.BlockSpec((tile, 2 * c), lambda i: (i, 0)),
            pl.BlockSpec((tile, c), lambda i: (i, 0)),
            pl.BlockSpec((2 * c, 2 * c), lambda i: (0, 0)),
            pl.BlockSpec((2 * c, 2 * c), lambda i: (0, 0)),
            pl.BlockSpec((1, 2 * c), lambda i: (0, 0)),
            pl.BlockSpec((1, 2 * c), lambda i: (0, 0)),
        ),
        compiler_params=None if interpret else _compiler_params(),
        interpret=interpret,
    )(carp, x, vblk, w1blk, b1t, w2t, tile_m, fold_m, dy)
    # Unpack: packed-space grads -> the shared/unpacked parameters.
    dcar = dcarp.reshape(p, 2, c).swapaxes(0, 1).astype(car.dtype)
    dv = jnp.stack([dvblk[:c, :c], dvblk[c:, c:]]).astype(v.dtype)
    dw1 = (dw1blk[:c, :c] + dw1blk[c:, c:]).astype(w1.dtype)
    db1 = (db1t[0, :c] + db1t[0, c:]).astype(b1.dtype)
    dw2 = (dw2t[0, :c] + dw2t[0, c:]).reshape(c, 1).astype(w2.dtype)
    return dcar, dx, dv, dw1, db1, dw2


def make_packed_combine(tile=4096, interpret=False):
    """custom_vjp wrapper so jax.grad routes through the packed kernels."""

    @jax.custom_vjp
    def packed_combine(car, x, v, w1, b1, w2):
        return packed_call(car, x, v, w1, b1, w2, tile=tile,
                           interpret=interpret)

    def fwd(car, x, v, w1, b1, w2):
        return packed_combine(car, x, v, w1, b1, w2), (car, x, v, w1, b1, w2)

    def bwd(res, dy):
        return packed_bwd_call(*res, dy, tile=tile, interpret=interpret)

    packed_combine.defvjp(fwd, bwd)
    return packed_combine


def _simple_call(kernel, car, x, extra, tile, interpret=False):
    from jax.experimental import pallas as pl

    m, p, c = car.shape
    grid = (p // tile,)
    specs = [
        pl.BlockSpec((m, tile, c), lambda i: (0, i, 0)),
        pl.BlockSpec((tile, c), lambda i: (i, 0)),
    ]
    for a in extra:
        specs.append(pl.BlockSpec(a.shape, lambda i, n=a.ndim: (0,) * n))
    return pl.pallas_call(
        functools.partial(kernel, m=m),
        grid=grid,
        in_specs=specs,
        out_shape=jax.ShapeDtypeStruct((p, c), x.dtype),
        out_specs=pl.BlockSpec((tile, c), lambda i: (i, 0)),
        compiler_params=None if interpret else _compiler_params(),
        interpret=interpret,
    )(car, x, *extra)


def make_variant(name, tile):
    """Returns fn(car, x, v, w1, b1, w2) -> [P, C] for the variant."""
    def fn(car, x, v, w1, b1, w2):
        c = x.shape[-1]
        if name == "copy":
            return _simple_call(_copy_kernel, car, x, (), tile)
        if name == "matmul":
            return _simple_call(_matmul_kernel, car, x, (v,), tile)
        if name == "nogelu":
            return _simple_call(
                _nogelu_kernel, car, x,
                (v, w1, b1.reshape(1, c), w2.reshape(1, c)), tile)
        if name == "full":
            return _simple_call(
                _fwd_kernel, car, x,
                (v, w1, b1.reshape(1, c), w2.reshape(1, c)), tile)
        if name == "packed":
            return packed_call(car, x, v, w1, b1, w2, tile=tile)
        if name == "xla":
            return message_combine_reference(car, x, v, w1, b1, w2)
        raise ValueError(name)
    return fn


def make_inputs(rows, m, c, dtype, seed=0):
    rng = np.random.default_rng(seed)
    car = jnp.asarray(rng.standard_normal((m, rows, c)), dtype)
    x = jnp.asarray(rng.standard_normal((rows, c)), dtype)
    v = jnp.asarray(rng.standard_normal((m, c, c)) * 0.1, dtype)
    w1 = jnp.asarray(rng.standard_normal((c, c)) * 0.1, dtype)
    b1 = jnp.asarray(rng.standard_normal((c,)) * 0.1, dtype)
    w2 = jnp.asarray(rng.standard_normal((c, 1)) * 0.1, dtype)
    return car, x, v, w1, b1, w2


def parity():
    """Interpret-mode parity of the packed kernel vs the jnp reference."""
    jax.config.update("jax_platforms", "cpu")
    car, x, v, w1, b1, w2 = make_inputs(512, 2, 64, jnp.float32)
    want = message_combine_reference(car, x, v, w1, b1, w2)
    got = packed_call(car, x, v, w1, b1, w2, tile=128, interpret=True)
    err = float(jnp.max(jnp.abs(want - got)))
    log(f"packed vs reference max|err| = {err:.2e}")
    assert err < 1e-5, err
    # copy/matmul/nogelu are timing scaffolds, not semantics — just ensure
    # they build and execute in interpret mode.
    for name in ("copy", "matmul", "nogelu"):
        out = _simple_call(
            {"copy": _copy_kernel, "matmul": _matmul_kernel,
             "nogelu": _nogelu_kernel}[name],
            car, x,
            () if name == "copy" else (
                (v,) if name == "matmul"
                else (v, w1, b1.reshape(1, 64), w2.reshape(1, 64))),
            tile=128, interpret=True)
        assert out.shape == x.shape, name

    # Gradient parity: packed custom-VJP kernels vs autodiff through the
    # jnp reference, all six cotangents.
    pc = make_packed_combine(tile=128, interpret=True)

    def loss(fn):
        return lambda *a: (fn(*a) ** 2).sum()

    g_ref = jax.grad(loss(message_combine_reference), argnums=(0, 1, 2, 3, 4, 5))(
        car, x, v, w1, b1, w2)
    g_pk = jax.grad(loss(pc), argnums=(0, 1, 2, 3, 4, 5))(
        car, x, v, w1, b1, w2)
    for name, a, b in zip(("dcar", "dx", "dv", "dw1", "db1", "dw2"), g_ref, g_pk):
        scale = float(jnp.max(jnp.abs(a))) + 1e-30
        err = float(jnp.max(jnp.abs(a - b))) / scale
        log(f"grad {name}: rel max|err| = {err:.2e}")
        assert err < 1e-4, (name, err)
    log("parity OK (fwd + all six grads)")


def main():
    if "--parity" in sys.argv:
        parity()
        return
    from topo_audio_autoencoder_tpu.utils import chain_time, wait_for_backend

    if not wait_for_backend(float(os.environ.get("BENCH_BACKEND_WAIT_SECS", "240")), log=log):
        log("backend unavailable; aborting")
        return
    rows = arg("--rows", 384 * 4845)
    tile = arg("--tile", 4096)
    m, c = arg("--m", 2), 64
    p = (rows + tile - 1) // tile * tile
    grad_mode = "--grad" in sys.argv
    default_names = ("packed,xla" if grad_mode
                     else "copy,matmul,nogelu,full,packed,xla")
    names = arg("--variants", default_names, str).split(",")
    dt = jnp.bfloat16
    car, x, v, w1, b1, w2 = make_inputs(p, m, c, dt)
    gb_moved = (m + 2) * p * c * 2 / 1e9  # car in, x in, y out
    if grad_mode:
        gb_moved *= 2.5  # + dcar, dx writes and a recompute read, roughly
    log(f"rows={p} tile={tile} traffic={gb_moved:.2f} GB min"
        f"{' (fwd+bwd)' if grad_mode else ''}")

    def grad_of(fn):
        def g(car, x, v, w1, b1, w2):
            def loss(xx, vv, ww1, bb1, ww2):
                return fn(car, xx, vv, ww1, bb1, ww2).astype(jnp.float32).sum()
            val, grads = jax.value_and_grad(loss, argnums=(0, 1, 2, 3, 4))(
                x, v, w1, b1, w2)
            return grads[0] + x * 0 + val.astype(x.dtype)  # chain through dx
        return g

    for name in names:
        if grad_mode and name == "packed":
            base = make_packed_combine(tile=tile)
        elif grad_mode and name == "full":
            from topo_audio_autoencoder_tpu.ops.sccn_combine import (
                fused_message_combine)
            base = fused_message_combine  # production custom-VJP kernels
        else:
            base = make_variant(name, tile)
        fn = jax.jit(grad_of(base) if grad_mode else base)
        log(f"compile {name}...")
        fn(car, x, v, w1, b1, w2)

        def mk():
            state = {"x": x}
            def step(i):
                state["x"] = fn(car, state["x"], v, w1, b1, w2)
                return state["x"]
            return step

        dt_s = chain_time(mk, k1=3, k2=13, warmup=2)
        log(f"{name:7s}: {dt_s*1e3:7.2f} ms  ({gb_moved/dt_s:.0f} GB/s effective)")


if __name__ == "__main__":
    main()
