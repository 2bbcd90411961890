"""Simplicial Complex Convolutional Network (SCCN), masked-static & batched.

TPU-native re-design of the reference's ``GradientSCCNLayer`` /
``GradientSCCN`` / ``JumpingKnowledgeSCCN`` (reference: custom_sccn.py:7-205),
which subclass TopoModelX's SCCN (Yang et al. 2022) but replace its
aggregation entirely. Per rank r the layer computes up to three messages:

- same-rank:     ``A_r @ X_r @ W``              (custom_sccn.py:78-81)
- high-to-low:   ``B_{r+1} @ X_{r+1} @ W``      (custom_sccn.py:95-98)
- low-to-high:   ``B_r^T @ X_{r-1} @ W``        (custom_sccn.py:113-116)

each scaled by a learnable scalar and given a residual ``+ X_r``
(custom_sccn.py:83,100,117; residual defaults True since ``GradientSCCN``
never forwards its own flag, custom_sccn.py:147-155), then combines them by
learned softmax attention over the message axis (2-layer MLP -> softmax,
custom_sccn.py:128-132) and LayerNorms the result during training on all but
the final layer (custom_sccn.py:133-135). Messages are *linear* — the
``update_func`` the reference passes is consumed only by the bypassed base
class, so no nonlinearity appears in the message path.

TPU-first differences (numerics preserved):

- All shapes static and batched: features are per-rank ``[B, S_r, C]``
  arrays; inactive simplices carry zero operator rows/columns (see
  ``topology.builder``) so they send no messages. No missing-rank
  bookkeeping — a fully masked rank is simply all-zero.
- NO operator matrix is ever materialized: every neighborhood product goes
  through the factored ``SimplicialOperators`` form (static membership
  matrix × per-sample probability vector) — static-LHS MXU matmuls with no
  per-sample [S, S'] tensors in HBM (see ``topology.builder``).
- The per-rank message mix + attention combine tail is ONE fused op
  (``ops/sccn_combine.py``): a Pallas kernel on TPU for the large ranks
  (the unfused form streams each [B, S, C] tensor through HBM ~25 times
  per rank — measured round 2 as a ~31 ms bandwidth-bound tail), the
  identical jnp composition elsewhere.
"""

from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax.numpy as jnp
import numpy as np

from ..topology.builder import SimplicialOperators

MAX_RANK = 3


class GradientSCCNLayer(nn.Module):
    """One masked-static SCCN layer over ranks 0..max_rank.

    The per-rank tail — message channel-mix Denses, the 2-layer score MLP
    with softmax over the message axis (reference custom_sccn.py:28-34,
    128-132), and the weighted combine — runs as ONE fused op
    (``ops.sccn_combine``): a Pallas kernel on TPU for the large ranks,
    the identical jnp composition elsewhere. The score head carries no
    bias: softmax over the message axis is shift-invariant, so a scalar
    score bias is provably gradient-free (the reference carries one as
    dead weight, custom_sccn.py:32).
    """

    channels: int
    max_rank: int = MAX_RANK
    residual: bool = True
    is_final_layer: bool = False
    # Pallas combine kernel for ranks with many rows. Default OFF: measured
    # on v5e at the flagship rank-3 shape (1.86M rows, C=64, M=2), XLA's
    # own fusion of the batched-einsum composition runs 4.2 ms fwd /
    # 8.6 ms fwd+bwd vs the Pallas kernel's 20/30 ms (benchmarks/
    # ab_combine.py) — with C=64 on 128-lane vregs Mosaic's layouts waste
    # half the machine, and XLA already keeps the tail fused tightly
    # enough that hand-fusion has no HBM traffic left to save.
    fused_combine: bool = False

    @nn.compact
    def __call__(
        self,
        features: Sequence[jnp.ndarray],
        ops: SimplicialOperators,
        train: bool = True,
    ) -> list[jnp.ndarray]:
        from ..ops.sccn_combine import (
            MIN_FUSED_ROWS,
            fused_message_combine,
            message_combine_reference,
        )

        # Learnable per-message-type scales (custom_sccn.py:21-25). Shared
        # across ranks, exactly like the reference's single ParameterDict.
        scale_same = self.param("scale_same", nn.initializers.ones, (1,))
        scale_l2h = self.param("scale_low_to_high", nn.initializers.ones, (1,))
        scale_h2l = self.param("scale_high_to_low", nn.initializers.ones, (1,))
        lecun = nn.initializers.lecun_normal()

        # Hoisted shared incidence products. Every expensive product in
        # this layer factors through one of
        #     down_r = B_r^T @ X_{r-1}   [S_r, C]
        #     up_r   = B_r   @ X_r       [S_{r-1}, C]
        # because channel mixing commutes with the incidence contraction:
        # B^T (X W) = (B^T X) W. The reference evaluates each message's
        # neighborhood product separately (6 large products per layer on
        # the triangle-tetra incidence); sharing cuts that to 4 — a
        # measured step-level win at n=20 where the [1140, 4845] tri-tetra
        # contraction dominates the model's FLOPs. Products use the
        # factored (static-membership × prob-vector) form — no per-sample
        # incidence matrices exist anywhere.
        down: dict[int, jnp.ndarray] = {}
        up: dict[int, jnp.ndarray] = {}
        for r in range(1, self.max_rank + 1):
            if features[r].shape[-2] == 0 or features[r - 1].shape[-2] == 0:
                continue
            down[r] = ops.down(r, features[r - 1])  # [B, S_r, C]
            up[r] = ops.up(r, features[r])  # [B, S_{r-1}, C]

        out: list[jnp.ndarray] = []
        for rank in range(self.max_rank + 1):
            x = features[rank]  # [B, S_r, C]
            # Statically-empty ranks (max_rank-truncated hierarchies) are
            # passed through — the reference's missing-rank handling
            # (custom_sccn.py:69-71) resolved at trace time.
            if x.shape[-2] == 0:
                out.append(x)
                continue
            c = self.channels

            # Message CARRIERS — the neighborhood products, with every
            # channel mix deferred into the fused combine. The same-rank
            # mix W commutes with every S-axis-linear factor (incidence
            # matmuls, prob and degree scalings), so it hoists OUTSIDE the
            # whole A_r product: W is applied ONCE at rank-r size instead
            # of once at the (up to 4.25x larger) coface rank plus once
            # for the diagonal term — a measured Dense-time win at n=20
            # where rank-2's coface product runs over all 4,845 tetra rows.
            w_same = self.param(f"same_rank_{rank}", lecun, (c, c))
            if rank == 0:
                car = ops.adj0_matmul(x)
            else:
                if rank < self.max_rank and (rank + 1) in down:
                    # A_r = B_{r+1} B_{r+1}^T - D: reuse down_{r+1}.
                    core = ops.up(rank + 1, down[rank + 1])
                    diag = ops.gram_diag(rank, via_upper=True)
                elif rank == self.max_rank and rank in up:
                    # A_top = B_top^T B_top - D: reuse up_top.
                    core = ops.down(rank, up[rank])
                    diag = ops.gram_diag(rank, via_upper=False)
                else:  # neighbor rank statically empty -> A_r == 0
                    core = None
                    diag = None
                if core is None:
                    car = jnp.zeros_like(x)
                else:
                    car = core - diag[..., :, None] * x
            mixes = [(w_same, scale_same, car)]

            # High-to-low carrier: up_{r+1}. Skipped when the higher rank
            # is statically absent (custom_sccn.py:90-93).
            if rank < self.max_rank and (rank + 1) in up:
                w_h2l = self.param(f"high_to_low_{rank}", lecun, (c, c))
                mixes.append((w_h2l, scale_h2l, up[rank + 1]))

            # Low-to-high carrier: down_r.
            if rank > 0 and rank in down:
                w_l2h = self.param(f"low_to_high_{rank}", lecun, (c, c))
                mixes.append((w_l2h, scale_l2h, down[rank]))

            w1 = self.param(f"attn_w1_{rank}", lecun, (c, c))
            b1 = self.param(f"attn_b1_{rank}", nn.initializers.zeros, (c,))
            w2 = self.param(f"attn_w2_{rank}", lecun, (c, 1))

            # Scales fold into the mix weights (V = W * scale): autodiff
            # through the product recovers dW and dscale, so the fused op
            # never sees the scales. Carriers travel as a TUPLE — stacking
            # them into [M, B, S, C] before the mix costs a layout copy.
            v = jnp.stack([w * s for w, s, _ in mixes])  # [M, C, C]
            cars = tuple(cr for _, _, cr in mixes)
            xres = x if self.residual else jnp.zeros_like(x)
            combine = (
                fused_message_combine
                if self.fused_combine
                and int(np.prod(x.shape[:-1])) >= MIN_FUSED_ROWS
                else message_combine_reference
            )
            y = combine(cars, xres, v, w1, b1, w2)

            # Reference normalizes only in train mode and never on the final
            # layer (custom_sccn.py:133-135) — final layers carry no norm
            # params at all here (they'd be dead weight).
            if not self.is_final_layer:
                ln = nn.LayerNorm(name=f"norm_{rank}")
                if train:
                    y = ln(y)
                else:
                    # Materialize params so train/eval share one param tree.
                    _ = ln(jnp.zeros_like(y[..., :1, :]))
            out.append(y)
        return out


class GradientSCCN(nn.Module):
    """Stack of ``n_layers`` GradientSCCNLayers (custom_sccn.py:140-162)."""

    channels: int
    max_rank: int = MAX_RANK
    n_layers: int = 6
    residual: bool = True

    @nn.compact
    def __call__(
        self,
        features: Sequence[jnp.ndarray],
        ops: SimplicialOperators,
        train: bool = True,
    ) -> list[jnp.ndarray]:
        for i in range(self.n_layers):
            features = GradientSCCNLayer(
                channels=self.channels,
                max_rank=self.max_rank,
                residual=self.residual,
                is_final_layer=(i == self.n_layers - 1),
                name=f"layer_{i}",
            )(features, ops, train)
        return list(features)


class JumpingKnowledgeSCCN(nn.Module):
    """GradientSCCN + a 2-layer LSTM over the per-layer outputs, keeping the
    last step (reference: custom_sccn.py:164-204). The LSTM runs per simplex
    over the layer axis; weights are shared across ranks like the
    reference's single ``jk_lstm``.
    """

    channels: int
    max_rank: int = MAX_RANK
    n_layers: int = 2

    @nn.compact
    def __call__(
        self,
        features: Sequence[jnp.ndarray],
        ops: SimplicialOperators,
        train: bool = True,
    ) -> list[jnp.ndarray]:
        per_layer: list[list[jnp.ndarray]] = []
        for i in range(self.n_layers):
            features = GradientSCCNLayer(
                channels=self.channels,
                max_rank=self.max_rank,
                is_final_layer=(i == self.n_layers - 1),
                name=f"layer_{i}",
            )(features, ops, train)
            per_layer.append(list(features))

        lstm1 = nn.RNN(nn.OptimizedLSTMCell(self.channels), name="jk_lstm_0")
        lstm2 = nn.RNN(nn.OptimizedLSTMCell(self.channels), name="jk_lstm_1")

        out = []
        for rank in range(self.max_rank + 1):
            # [B, S, L, C]: sequence axis = layer index.
            seq = jnp.stack([pl[rank] for pl in per_layer], axis=-2)
            b, s, l, c = seq.shape
            if s == 0:
                out.append(seq[:, :, 0, :])
                continue
            seq = seq.reshape(b * s, l, c)
            h = lstm2(lstm1(seq))
            out.append(h[:, -1, :].reshape(b, s, c))
        return out
