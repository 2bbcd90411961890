"""Sectional breakdown of the headline train step (where do 414 ms go?).

Times each stage of the b=128/G=3/T=64000 bf16 train step as its own
sequentially-dependent jitted chain (utils.chain_time — see CLAUDE.md on why
block_until_ready cannot be trusted over the remote-TPU tunnel):

  pqmf       : PQMF analysis, B*G waveforms
  enc_logits : band conv stacks + MLP -> 6,195 logits, B*G
  complexgen : sampler + rectifier + operator build, B anchors
  decode     : SCCN(6 layers) + cross-attention + upsampling + PQMF^T, B
  stft_loss  : 5-scale spectral distance B pairs
  fwd        : full loss_fn forward
  step       : full jitted train step (fwd + bwd + adam)

Also A/Bs the incidence-contraction layout standalone (the SCCN's dominant
FLOPs): broadcast-batched [S',S]@[B,S,C] vs flat-gemm [S',S]@[S,B*C] vs
face-gather, fwd and fwd+bwd.

Usage: python benchmarks/profile_step.py [sections|layout ...]
Prints one JSON line per measurement.
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

B = 128
G = 3
T = 64000


def _emit(**kw):
    print(
        json.dumps(
            {k: (round(v, 4) if isinstance(v, float) else v) for k, v in kw.items()}
        ),
        flush=True,
    )


def _chain(make_step, k1=4, k2=12):
    from topo_audio_autoencoder_tpu.utils import chain_time

    return chain_time(make_step, k1=k1, k2=k2)


def _chain_fn(fn, x0, k1=4, k2=12):
    """Chain a jitted array->array fn through its own output."""

    def make_step():
        carry = {"x": x0}

        def step(i):
            carry["x"] = fn(carry["x"])
            return carry["x"]

        return step

    return _chain(make_step, k1=k1, k2=k2)


def sections():
    from topo_audio_autoencoder_tpu.models import AudioAutoencoder
    from topo_audio_autoencoder_tpu.training import (
        create_train_state,
        make_optimizer,
        make_train_step,
    )
    from topo_audio_autoencoder_tpu.training.losses import autoencoder_loss

    on_tpu = jax.default_backend() != "cpu"
    cdt = jnp.bfloat16 if on_tpu else jnp.float32
    model = AudioAutoencoder.create(
        num_vertices=20, num_bands=16, sccn_hidden_dim=64, n_sccn_layers=6
    )
    opt = make_optimizer(accumulate_grad_batches=1)
    state = create_train_state(model, opt, jax.random.PRNGKey(0), (1, 1, T))

    from topo_audio_autoencoder_tpu.training.train_step import _cast_tree

    cast = jax.jit(lambda p: _cast_tree(p, cdt))(state.params)
    rng = np.random.default_rng(0)
    flat = jnp.asarray(
        rng.standard_normal((B * G, 1, T), dtype=np.float32)
    ).astype(cdt)
    temp = jnp.asarray(1.0)
    key = jax.random.PRNGKey(3)

    # --- pqmf ---
    @jax.jit
    def pqmf_fwd(x):
        bands = model.pqmf.forward(x)
        return x + 0.0 * bands.sum().astype(x.dtype)

    dt = _chain_fn(pqmf_fwd, flat)
    _emit(section="pqmf_bg", ms=dt * 1e3)

    # --- encoder logits (bands precomputed; jit EVERYTHING — eager
    # dispatch over the remote tunnel is ~100 ms/op) ---
    bands = jax.jit(
        lambda x: jnp.swapaxes(model.pqmf.forward(x), -1, -2)
    )(flat)  # [B*G, T', nb]

    @jax.jit
    def logits_fwd(bnd):
        lg = model.apply(
            cast, bnd, False,
            method=lambda m, x, tr: m.encoder.compute_logits(x, tr),
        )
        return bnd + 0.0 * lg.sum().astype(bnd.dtype)

    dt = _chain_fn(logits_fwd, bands)
    _emit(section="enc_logits_bg", ms=dt * 1e3)

    # --- complex generation (sampler + rectifier + builder) ---
    logits = jax.jit(
        lambda bnd: model.apply(
            cast, bnd, False,
            method=lambda m, x, tr: m.encoder.compute_logits(x, tr),
        ).reshape(B, G, -1)[:, 0]
    )(bands)

    @jax.jit
    def gen_fwd(lg):
        enc = model.apply(
            cast, lg, temp, key, True,
            method=lambda m, l, tp, r, tr: m.encoder.generate_complex(l, tp, r, tr),
        )
        s = sum(p.sum() for p in enc.probs.ranks)
        return lg + 0.0 * s.astype(lg.dtype)

    dt = _chain_fn(gen_fwd, logits)
    _emit(section="complexgen_b", ms=dt * 1e3)

    # --- decode (SCCN + attention + upsample + PQMF synthesis) ---
    @jax.jit
    def dec_fwd(lg):
        enc = model.apply(
            cast, lg, temp, key, True,
            method=lambda m, l, tp, r, tr: m.encoder.generate_complex(l, tp, r, tr),
        )
        wav = model.apply(
            cast, enc, T // model.num_bands, True,
            rngs={"dropout": key},
            method=lambda m, e, dl, tr: m.decode(e, dl, tr),
        )
        return lg + 0.0 * wav.sum().astype(lg.dtype)

    dt_gen_dec = _chain_fn(dec_fwd, logits)
    _emit(section="gen_plus_decode_b", ms=dt_gen_dec * 1e3)

    # --- stft loss ---
    anchors = flat.reshape(B, G, 1, T)[:, 0].astype(jnp.float32)
    recon = anchors * 0.9 + 0.01

    @jax.jit
    def loss_fwd(r):
        aux = {
            "binary_entropy": jnp.zeros((B,)),
            "diversity": jnp.zeros((B,)),
            "l0": jnp.zeros((B,)),
        }
        total, _ = autoencoder_loss(r, anchors, aux, jnp.ones((B,), bool))
        return r + 0.0 * total

    dt = _chain_fn(loss_fwd, recon)
    _emit(section="stft_loss_b", ms=dt * 1e3)

    # --- full forward (loss only, no grad) ---
    step_fn = make_train_step(model, opt, compute_dtype=cdt, donate=False)
    batch = flat.reshape(B, G, 1, T).astype(jnp.float32)

    # full fwd via value only
    from topo_audio_autoencoder_tpu.models.encoder import (
        info_nce_loss,
        rank_diversity_entropy,
        vertex_count_penalty,
    )

    @jax.jit
    def full_fwd(bt):
        b, g, _, t = bt.shape
        fl = bt.reshape(b * g, 1, t).astype(cdt)
        bnd = jnp.swapaxes(model.pqmf.forward(fl), -1, -2)
        lg = model.apply(
            cast, bnd, True, rngs={"dropout": key},
            method=lambda m, x, tr: m.encoder.compute_logits(x, tr),
        )
        contrast = info_nce_loss(lg.reshape(b, g, -1).astype(jnp.float32))
        al = lg.reshape(b, g, -1)[:, 0]
        enc = model.apply(
            cast, al, temp, key, True,
            method=lambda m, l, tp, r, tr: m.encoder.generate_complex(l, tp, r, tr),
        )
        wav = model.apply(
            cast, enc, t // model.num_bands, True,
            rngs={"dropout": key},
            method=lambda m, e, dl, tr: m.decode(e, dl, tr),
        )
        aux = {
            "binary_entropy": rank_diversity_entropy(enc.rectified).astype(jnp.float32),
            "diversity": vertex_count_penalty(
                enc.rectified.vertices, model.min_active_vertices,
                model.max_active_vertices,
            ).astype(jnp.float32),
            "l0": enc.l0.astype(jnp.float32),
        }
        total, _ = autoencoder_loss(
            wav.astype(jnp.float32),
            bt[:, 0].astype(jnp.float32),
            aux, enc.valid, contrastive=contrast,
        )
        return bt + 0.0 * total

    dt_fwd = _chain_fn(full_fwd, batch)
    _emit(section="full_fwd", ms=dt_fwd * 1e3)

    # --- full train step ---
    def make_step():
        carry = {"s": state}

        def run(i):
            carry["s"], m = step_fn(carry["s"], batch, temp, key)
            return m["total_loss"]

        return run

    dt_step = _chain(make_step, k1=3, k2=9)
    _emit(section="full_step", ms=dt_step * 1e3,
          bwd_opt_ms=(dt_step - dt_fwd) * 1e3)


def layout():
    """Incidence-contraction layouts at the SCCN's dominant shape."""
    from topo_audio_autoencoder_tpu.topology.complexes import build_tables

    tables = build_tables(20)
    t2tt = jnp.asarray(tables.t2tt, jnp.bfloat16)  # [Tt, T] 0/1
    tt, tr = t2tt.shape  # 4845, 1140
    c = 64
    key = jax.random.PRNGKey(0)
    x_bsc = jax.random.normal(key, (B, tt, c), jnp.bfloat16)
    p = jax.nn.sigmoid(jax.random.normal(key, (B, tt), jnp.bfloat16))
    faces = jnp.asarray(tables.tet_tris, jnp.int32)  # [Tt, 4] triangle ids

    mT = jnp.swapaxes(t2tt, 0, 1)  # [T, Tt]

    @jax.jit
    def up_bsc(x):
        y = mT @ (p[..., None] * x)  # [B, T, C] broadcast-batched
        return x + 0.0 * y.sum().astype(x.dtype)

    @jax.jit
    def up_flat(x):
        # [T, Tt] @ [Tt, B*C] flat gemm
        xt = jnp.swapaxes(p[..., None] * x, 0, 1).reshape(tt, B * c)
        y = mT @ xt
        return x + 0.0 * y.sum().astype(x.dtype)

    @jax.jit
    def down_bsc(xtri):
        y = p[..., None] * (t2tt @ xtri)  # [B, Tt, C]
        return xtri + 0.0 * y.sum().astype(xtri.dtype)

    @jax.jit
    def down_gather(xtri):
        y = p[..., None] * xtri[:, faces].sum(axis=2)  # [B, Tt, C]
        return xtri + 0.0 * y.sum().astype(xtri.dtype)

    x_tri = jax.random.normal(key, (B, tr, c), jnp.bfloat16)

    for name, fn, x0 in [
        ("up_bsc", up_bsc, x_bsc),
        ("up_flat", up_flat, x_bsc),
        ("down_bsc", down_bsc, x_tri),
        ("down_gather", down_gather, x_tri),
    ]:
        dt = _chain_fn(fn, x0, k1=5, k2=25)
        _emit(layout=name, ms=dt * 1e3)

        g = jax.jit(jax.grad(lambda x: fn(x).astype(jnp.float32).sum()))
        dtg = _chain_fn(lambda x: g(x) * 0 + x0, x0, k1=5, k2=25)
        _emit(layout=name + "_grad", ms=dtg * 1e3)


def attn():
    """Cross-attention variants at the decoder's shape (the 84%-of-decode
    hotspot: trace_decode.py found the fp32 [B,4,250,6175] score tensor's
    mask+max fusion running at 28 GB/s effective)."""
    b, h, q, m, d = B, 4, 250, 6175, 16
    key = jax.random.PRNGKey(0)
    kq, kk, kv, km = jax.random.split(key, 4)
    qx = jax.random.normal(kq, (b, q, h, d), jnp.bfloat16)
    kx = jax.random.normal(kk, (b, m, h, d), jnp.bfloat16)
    vx = jax.random.normal(kv, (b, m, h, d), jnp.bfloat16)
    mask = (jax.random.uniform(km, (b, m)) > 0.3).astype(jnp.bfloat16)
    scale = 1.0 / np.sqrt(d)

    @jax.jit
    def cur(qx):
        scores = jnp.einsum("bqhd,bmhd->bhqm", qx, kx).astype(jnp.float32)
        scores = scores * scale
        scores = jnp.where(mask[:, None, None, :] > 0, scores, -1e9)
        attn_w = jax.nn.softmax(scores, axis=-1)
        any_valid = (mask.sum(axis=-1) > 0)[:, None, None, None]
        attn_w = jnp.where(any_valid, attn_w, 0.0).astype(qx.dtype)
        out = jnp.einsum("bhqm,bmhd->bqhd", attn_w, vx)
        return (0.9 * qx + 0.1 * out).astype(qx.dtype)

    @jax.jit
    def mminor(qx):
        kh = jnp.swapaxes(kx, 1, 2)  # [b,h,m,d]
        vh = jnp.swapaxes(vx, 1, 2)
        qh = jnp.swapaxes(qx, 1, 2)  # [b,h,q,d]
        scores = jnp.einsum("bhqd,bhmd->bhqm", qh, kh).astype(jnp.float32)
        scores = scores * scale
        scores = jnp.where(mask[:, None, None, :] > 0, scores, -1e9)
        attn_w = jax.nn.softmax(scores, axis=-1)
        any_valid = (mask.sum(axis=-1) > 0)[:, None, None, None]
        attn_w = jnp.where(any_valid, attn_w, 0.0).astype(qx.dtype)
        out = jnp.swapaxes(jnp.einsum("bhqm,bhmd->bhqd", attn_w, vh), 1, 2)
        return (0.9 * qx + 0.1 * out).astype(qx.dtype)

    @jax.jit
    def bf16_scores(qx):
        kh = jnp.swapaxes(kx, 1, 2)
        vh = jnp.swapaxes(vx, 1, 2)
        qh = jnp.swapaxes(qx, 1, 2)
        scores = jnp.einsum("bhqd,bhmd->bhqm", qh, kh)  # bf16 in HBM
        scores = jnp.where(mask[:, None, None, :] > 0, scores, jnp.asarray(-1e9, scores.dtype))
        # fp32 softmax math on bf16-stored scores: the upcast happens
        # inside the fusion, HBM traffic stays half
        attn_w = jax.nn.softmax(scores.astype(jnp.float32) * scale, axis=-1)
        any_valid = (mask.sum(axis=-1) > 0)[:, None, None, None]
        attn_w = jnp.where(any_valid, attn_w, 0.0).astype(qx.dtype)
        out = jnp.swapaxes(jnp.einsum("bhqm,bhmd->bhqd", attn_w, vh), 1, 2)
        return (0.9 * qx + 0.1 * out).astype(qx.dtype)

    for name, fn in [("cur", cur), ("mminor", mminor), ("bf16_scores", bf16_scores)]:
        dt = _chain_fn(fn, qx, k1=3, k2=9)
        _emit(attn=name, ms=dt * 1e3)
        g = jax.jit(jax.grad(lambda x: fn(x).astype(jnp.float32).sum()))
        dtg = _chain_fn(lambda x: jnp.asarray(g(x), qx.dtype), qx, k1=3, k2=9)
        _emit(attn=name + "_gradchain", ms=dtg * 1e3)


if __name__ == "__main__":
    which = [a for a in sys.argv[1:] if not a.startswith("-")] or [
        "sections", "layout",
    ]
    for name in which:
        globals()[name]()
