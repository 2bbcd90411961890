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


# ------------------------------------------------------------- callers


@functools.partial(jax.jit, static_argnames=("tile", "interpret"))
def packed_call(car, x, v, w1, b1, w2, tile=4096, interpret=False):
    """car [M=2, P, C], unpacked operands -> y [P, C].

    The lane-pack of the carriers ([2, P, C] -> [P, 2C]) happens in XLA
    (transpose+reshape); in production it would fuse into the upstream
    incidence matmuls' epilogue. Block-diagonal weights are built here —
    they are tiny ([128,128]).
    """
    from jax.experimental import pallas as pl

    m, p, c = car.shape
    assert m == 2, "packed variant is specialized to M=2"
    carp = jnp.swapaxes(car, 0, 1).reshape(p, m * c)
    f32 = jnp.float32
    zero = jnp.zeros((c, c), v.dtype)
    vblk = jnp.block([[v[0], zero], [zero, v[1]]])
    w1blk = jnp.block([[w1, zero], [zero, w1]])
    b1t = jnp.concatenate([b1, b1]).reshape(1, 2 * c)
    w2t = jnp.concatenate([w2[:, 0], w2[:, 0]]).reshape(1, 2 * c)
    eye = jnp.eye(c, dtype=car.dtype)
    tile_m = jnp.concatenate([eye, eye], axis=1)        # [C, 2C]
    fold_m = jnp.concatenate([eye, eye], axis=0)        # [2C, C]
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
    log("parity OK")


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
    names = arg("--variants", "copy,matmul,nogelu,full,packed,xla", str).split(",")
    dt = jnp.bfloat16
    car, x, v, w1, b1, w2 = make_inputs(p, m, c, dt)
    gb_moved = (m + 2) * p * c * 2 / 1e9  # car in, x in, y out
    log(f"rows={p} tile={tile} traffic={gb_moved:.2f} GB min")
    for name in names:
        fn = jax.jit(make_variant(name, tile))
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
