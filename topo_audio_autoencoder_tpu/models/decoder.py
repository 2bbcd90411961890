"""Audio decoder: simplicial message passing -> cross-attention -> upsampling.

TPU-native re-design of the reference ``AudioDecoder`` (reference:
decoder.py:19-175). The reference operates on dynamically-sized active-
simplex slices; here every stage is masked-static:

- The SCCN runs over all simplices (inactive ones have zero operator
  rows/cols, see topology/builder.py).
- The reference builds its query sequence by temporal-conv-ing the packed
  *active* vertex features and linearly interpolating that variable-length
  sequence to 250 steps (decoder.py:132-141). We reproduce that exactly with
  static shapes: a stable argsort packs active vertices first, the tail is
  zeroed (== the conv's zero padding), GroupNorm uses masked moments, and
  the resize gathers with *dynamic indices* over a *static* buffer.
- The cross-attention memory is all rank 1-3 simplices with an additive
  -inf mask on inactive ones (decoder.py:144-161) — identical softmax to
  attending over the active slice only.

Stage-by-stage parity notes are inline.
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from ..topology.builder import SimplicialOperators
from .sccn import GradientSCCN, JumpingKnowledgeSCCN


def linear_resize(x: jnp.ndarray, out_len: int) -> jnp.ndarray:
    """Linear interpolation along axis -2 (time), align_corners=False.

    Matches F.interpolate(mode='linear', align_corners=False)
    (decoder.py:96,140) and nn.Upsample(scale_factor=2, mode='linear').
    x: [..., T, C] -> [..., out_len, C].
    """
    t = x.shape[-2]
    src = (jnp.arange(out_len, dtype=jnp.float32) + 0.5) * (t / out_len) - 0.5
    src = jnp.clip(src, 0.0, t - 1.0)
    i0 = jnp.floor(src).astype(jnp.int32)
    i1 = jnp.minimum(i0 + 1, t - 1)
    w = (src - i0)[..., :, None].astype(x.dtype)  # keep the compute dtype
    return x[..., i0, :] * (1.0 - w) + x[..., i1, :] * w


def masked_linear_resize(
    x: jnp.ndarray, valid_len: jnp.ndarray, out_len: int
) -> jnp.ndarray:
    """Resize [B, T, C] treating only the first ``valid_len[b]`` steps as the
    source sequence — the static-shape equivalent of interpolating a packed
    variable-length sequence (decoder.py:140). ``valid_len``: [B] ints."""
    b, t, _ = x.shape
    vl = valid_len.astype(jnp.float32)[:, None]  # [B, 1]
    j = jnp.arange(out_len, dtype=jnp.float32)[None, :]  # [1, out]
    src = jnp.clip((j + 0.5) * vl / out_len - 0.5, 0.0, jnp.maximum(vl - 1.0, 0.0))
    i0 = jnp.floor(src).astype(jnp.int32)  # [B, out]
    i1 = jnp.minimum(i0 + 1, jnp.maximum(valid_len[:, None] - 1, 0))
    w = (src - i0)[..., None].astype(x.dtype)  # keep the compute dtype
    g0 = jnp.take_along_axis(x, i0[..., None], axis=1)
    g1 = jnp.take_along_axis(x, i1[..., None], axis=1)
    return g0 * (1.0 - w) + g1 * w


def pack_active(feats: jnp.ndarray, mask: jnp.ndarray):
    """Stable-sort active tokens to the front and zero the tail.

    feats: [B, S, C], mask: [B, S] in {0,1}. Returns (packed [B, S, C],
    count [B]). Replaces the reference's dynamic ``nonzero()`` slicing
    (encoder.py:230-233) with a static permutation.
    """
    order = jnp.argsort(1.0 - mask, axis=-1, stable=True)  # active first
    packed = jnp.take_along_axis(feats, order[..., None], axis=1)
    count = mask.sum(axis=-1).astype(jnp.int32)
    pos_valid = jnp.arange(mask.shape[-1])[None, :] < count[:, None]
    return packed * pos_valid[..., None], count


class MaskedGroupNorm(nn.Module):
    """GroupNorm over [B, T, C] whose moments ignore masked time steps.

    Equivalent to torch GroupNorm on the packed active sequence
    (decoder.py:45-50): statistics are per (batch, group) over
    (valid time) x (group channels).
    """

    num_groups: int
    epsilon: float = 1e-5

    @nn.compact
    def __call__(self, x: jnp.ndarray, pos_valid: jnp.ndarray) -> jnp.ndarray:
        b, t, c = x.shape
        g = self.num_groups
        scale = self.param("scale", nn.initializers.ones, (c,))
        bias = self.param("bias", nn.initializers.zeros, (c,))
        xg = x.reshape(b, t, g, c // g)
        m = pos_valid[:, :, None, None].astype(x.dtype)  # [B, T, 1, 1]
        denom = m.sum(axis=(1, 3), keepdims=True) * (c // g)
        denom = jnp.maximum(denom, 1.0)
        mean = (xg * m).sum(axis=(1, 3), keepdims=True) / denom
        var = (((xg - mean) ** 2) * m).sum(axis=(1, 3), keepdims=True) / denom
        y = (xg - mean) / jnp.sqrt(var + self.epsilon)
        y = y.reshape(b, t, c) * scale + bias
        return y * pos_valid[..., None]


class BottleneckProj(nn.Module):
    """Dense(C/2)+LN+GELU+Dense(C)+LN key/value projection
    (decoder.py:68-83)."""

    channels: int

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        y = nn.Dense(self.channels // 2)(x)
        y = nn.gelu(nn.LayerNorm()(y))
        y = nn.Dense(self.channels)(y)
        return nn.LayerNorm()(y)


class CrossAttention(nn.Module):
    """4-head dot-product attention with an additive key mask
    (decoder.py:58-63). Computed in fp32 for a stable softmax.

    The score/softmax/contract core runs as a fused Pallas kernel on TPU
    (ops/attention.py): XLA's forward fusion over the materialized
    [B, H, Q, M] fp32 score tensor measured ~30 GB/s effective — 84% of
    the decode forward at the flagship shape — while the kernel keeps the
    scores in VMEM and writes only the bf16 weights + output."""

    channels: int
    num_heads: int = 4

    @nn.compact
    def __call__(self, query, keys, values, key_mask):
        from ..ops.attention import fused_masked_attention

        q = nn.Dense(self.channels, name="q_proj")(query)
        k = nn.Dense(self.channels, name="k_proj")(keys)
        v = nn.Dense(self.channels, name="v_proj")(values)
        out = fused_masked_attention(q, k, v, key_mask, self.num_heads)
        return nn.Dense(self.channels, name="out_proj")(out)


class AudioDecoder(nn.Module):
    """Simplicial features -> [B, T, num_bands] subband waveforms."""

    sccn_hidden_dim: int = 64
    initial_sequence_length: int = 250
    output_channels: int = 16
    n_sccn_layers: int = 6
    # The reference defines a JumpingKnowledge SCCN variant (LSTM over the
    # per-layer outputs, custom_sccn.py:164-204) but never uses it; here
    # it's a selectable decoder backbone.
    use_jumping_knowledge: bool = False

    @nn.compact
    def __call__(
        self,
        embeddings,  # per-rank [B, S_r, C]
        ops: SimplicialOperators,
        masks,  # per-rank [B, S_r]
        desired_length: int | None = None,
        train: bool = True,
    ) -> jnp.ndarray:
        # The reference accepts ``desired_length`` but never uses it
        # (decoder.py:120,140 — SURVEY §2.4.7); the intended behavior is that
        # the output matches it: the 4 upsample blocks multiply length by 16,
        # so the query sequence starts at desired_length // 16.
        init_len = (
            self.initial_sequence_length
            if desired_length is None
            else desired_length // 16
        )
        c = self.sccn_hidden_dim
        backbone = JumpingKnowledgeSCCN if self.use_jumping_knowledge else GradientSCCN
        feats = backbone(
            channels=c, max_rank=3, n_layers=self.n_sccn_layers, name="sccn"
        )(list(embeddings), ops, train)

        # --- Vertex features -> query sequence (decoder.py:132-141)
        vx = feats[0] * 0.1
        vx = nn.Dense(2 * c, name="v2q_dense0")(vx)
        vx = nn.gelu(nn.LayerNorm(name="v2q_norm0")(vx))
        vx = nn.Dense(c, name="v2q_dense1")(vx)
        vx = nn.gelu(nn.LayerNorm(name="v2q_norm1")(vx))

        packed, count = pack_active(vx, masks[0])
        pos_valid = jnp.arange(packed.shape[1])[None, :] < count[:, None]
        # Depthwise temporal convs over the packed active-vertex sequence
        # (decoder.py:44-51); zeroed tail == the reference's zero padding.
        y = _grouped_conv(c, 8, "tconv0")(packed)
        y = nn.gelu(MaskedGroupNorm(8, name="tnorm0")(y, pos_valid))
        y = _grouped_conv(c, 8, "tconv1")(y)
        y = nn.gelu(MaskedGroupNorm(8, name="tnorm1")(y, pos_valid))
        query = masked_linear_resize(y, count, init_len)

        # --- Cross-attention memory: ranks 1..3, scaled 0.1
        # (decoder.py:144-152), masked instead of sliced.
        memory = jnp.concatenate([f * 0.1 for f in feats[1:]], axis=1)
        mem_mask = jnp.concatenate(list(masks[1:]), axis=1)

        pre_norm = nn.LayerNorm(name="pre_attention_norm")
        memory = pre_norm(memory) * mem_mask[..., None]
        query = pre_norm(query)
        keys = BottleneckProj(c, name="key_proj")(memory)
        values = BottleneckProj(c, name="value_proj")(memory)

        attention_scale = self.param(
            "attention_scale", lambda k: jnp.asarray(0.5, jnp.float32)
        )
        attn = CrossAttention(c, name="cross_attention")(query, keys, values, mem_mask)
        attn = attn * attention_scale
        x = query + nn.gelu(attn)
        x = nn.LayerNorm(name="post_attention_norm")(x)

        # --- Progressive upsampling 250 -> 4000 (decoder.py:86-105)
        channels = [c, c // 2, c // 4, self.output_channels]
        for i in range(4):
            cin = channels[i]
            cout = channels[min(i + 1, 3)]
            x = linear_resize(x, x.shape[-2] * 2)
            x = _grouped_conv(cin, cin, f"up{i}_depthwise")(x)
            x = nn.Conv(cout, (1,), name=f"up{i}_pointwise")(x)
            x = nn.GroupNorm(num_groups=min(8, cout), name=f"up{i}_norm")(x)
            x = nn.gelu(x)
            x = x * (1.0 / 2 ** (i + 1))
        return x  # [B, 4000, output_channels]


def _grouped_conv(features: int, groups: int, name: str) -> nn.Conv:
    return nn.Conv(
        features,
        kernel_size=(3,),
        padding=[(1, 1)],
        feature_group_count=groups,
        name=name,
    )
