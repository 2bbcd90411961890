"""Static-capacity packed operators: top-K active slicing, the TPU way.

The reference slices every operator down to the dynamically-discovered
active simplices (reference: complex_builder.py:47,57-59 — ``nonzero()``
row/column selection), so its per-step cost tracks the *active* complex
size. The masked-static design in ``topology.builder`` deliberately gave
that up for fixed shapes — and at n=32 it pays dense factored products
over all 35,960 tetra rows while trained complexes end with ~30 active
(the round-4 capacity study).

This module wins the active-slicing back *statically*: each packed rank
keeps a fixed CAPACITY of K rows, filled with the top-K simplices by
(mask + probability) — a static-shape ``top_k`` + gather, exactly like
the decoder's ``pack_active`` (models/decoder.py:65-76). Every incidence
product then runs over [K_r] packed rows instead of all C(n, k):

- face structure travels as gathered *index tables* ([K_r, r+1] face ids
  per sample), not membership matrices: ``down`` products become a
  4-row gather+sum, ``up`` products a one-hot matmul (an MXU-friendly
  scatter-add — TPU scatters serialize, one-hot contractions tile).
- ranks below the packing boundary keep the dense factored form of
  ``topology.builder`` (at n=32, V=32 / E=496 are cheaper dense than
  packed).

Exactness: if every rank's capacity >= its active-row count, the packed
forward is EXACTLY the dense masked-static forward (verified in
tests/test_packed.py). Rectification guarantees every face of an active
simplex is active, so the top-K set (actives sort first — the mask term
dominates the key) is face-closed and no gather ever reads a dropped
row. When actives exceed capacity the lowest-probability rows are
truncated (their mask rows drop to 0) — the same probability-ordered
graceful degradation a learned complex under a complexity penalty
wants, and a config knob the user sets per rank.

During *training*, Gumbel relaxations are nonzero everywhere, so the
soft products see a probability-ordered truncation to the K heaviest
rows per rank; Hard Concrete / eval / codec paths have exact zeros and
are exact under capacity. The codec decode (``decode_from_probs``) is
always exact whenever capacity covers the (sparse, thresholded) latent.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from .complexes import ComplexTables
from .rectifier import RectifiedProbs
from .builder import _membership_matrix


class PackedOperators(NamedTuple):
    """Duck-type of ``builder.SimplicialOperators`` (same product methods)
    with per-rank static-capacity packing.

    - ``probs`` / ``masks``: per-rank; packed ranks are [..., K_r] in
      key-descending order, dense ranks are the full [..., S_r].
    - ``idx``: per-rank top-K indices into the full rank ([..., K_r]), or
      None for dense ranks. Consumers gather row-aligned data (embedding
      rows, per-row stats) with these.
    - ``faces``: per packed rank r>=1, [..., K_r, r+1] face ids of each
      packed simplex — in the LOWER rank's layout (packed positions with
      sentinel K_{r-1} for dropped rows, or full ids when the lower rank
      is dense).
    - ``memberships``: dense membership matrices for the rank pairs that
      stay dense (entry i serves rank i+1), None once packing starts.
    """

    probs: tuple
    masks: tuple
    idx: tuple
    faces: tuple
    memberships: tuple

    # ------------------------------------------------------------ layout

    def is_packed(self, rank: int) -> bool:
        return self.idx[rank] is not None

    def _lower_size(self, rank: int) -> int:
        return self.probs[rank - 1].shape[-1]

    # ------------------------------------------------ face-table products

    def _gather_faces(self, rank: int, x: jnp.ndarray) -> jnp.ndarray:
        """``M_rank @ x`` over packed rows: sum x over each packed
        simplex's faces. x: [..., lower, C] -> [..., K_rank, C]."""
        faces = self.faces[rank]  # [..., K, F]
        if self.is_packed(rank - 1):
            # Sentinel K_lower points one past the end: append a zero row
            # so dropped faces (capacity overflow) gather exact zeros.
            pad = jnp.zeros((*x.shape[:-2], 1, x.shape[-1]), x.dtype)
            x = jnp.concatenate([x, pad], axis=-2)
        flat = faces.reshape(*faces.shape[:-2], -1)  # [..., K*F]
        g = jnp.take_along_axis(x, flat[..., None], axis=-2)
        return g.reshape(*faces.shape, x.shape[-1]).sum(axis=-2)

    def _scatter_faces(self, rank: int, u: jnp.ndarray) -> jnp.ndarray:
        """``M_rank^T @ u`` over packed rows: add each packed simplex's
        value into its faces. u: [..., K_rank, C] -> [..., lower, C].

        Implemented as a one-hot contraction, not ``.at[].add``: XLA
        lowers TPU scatters to serialized updates, while a
        [K*F, lower] x [K*F, C] one-hot matmul rides the MXU (K*F is
        tiny — a few thousand rows — so the FLOPs are noise)."""
        faces = self.faces[rank]  # [..., K, F]
        nf = faces.shape[-1]
        lower = self._lower_size(rank)
        lower_packed = self.is_packed(rank - 1)
        depth = lower + (1 if lower_packed else 0)
        flat = faces.reshape(*faces.shape[:-2], -1)  # [..., K*F]
        oh = jax.nn.one_hot(flat, depth, dtype=u.dtype)
        urep = jnp.repeat(u, nf, axis=-2)  # [..., K*F, C], (k, j)-ordered
        out = jnp.einsum("...kd,...kc->...dc", oh, urep)
        return out[..., :lower, :] if lower_packed else out

    # ----------------------------------------------------------- products
    # Same semantics (and docstring contracts) as SimplicialOperators;
    # see topology/builder.py for the factored math being specialized.

    def up(self, rank: int, x: jnp.ndarray) -> jnp.ndarray:
        p = self.probs[rank]
        if not self.is_packed(rank):
            m = self.memberships[rank - 1]
            return jnp.swapaxes(m, 0, 1) @ (p[..., None] * x)
        return self._scatter_faces(rank, p[..., None] * x)

    def down(self, rank: int, x: jnp.ndarray) -> jnp.ndarray:
        p = self.probs[rank]
        if not self.is_packed(rank):
            m = self.memberships[rank - 1]
            return p[..., None] * (m @ x)
        return p[..., None] * self._gather_faces(rank, x)

    def adj0_matmul(self, x: jnp.ndarray) -> jnp.ndarray:
        p = self.probs[1]
        if not self.is_packed(1):
            m = self.memberships[0]
            y = jnp.swapaxes(m, 0, 1) @ (p[..., None] * (m @ x))
            deg = p @ m
            return y - deg[..., None] * x
        y = self._scatter_faces(1, p[..., None] * self._gather_faces(1, x))
        deg = self._scatter_faces(1, p[..., :, None])[..., 0]
        return y - deg[..., None] * x

    def gram_diag(self, rank: int, via_upper: bool) -> jnp.ndarray:
        if via_upper:
            p = self.probs[rank + 1]
            if not self.is_packed(rank + 1):
                return (p * p) @ self.memberships[rank]
            return self._scatter_faces(rank + 1, (p * p)[..., :, None])[..., 0]
        p = self.probs[rank]
        return (p * p) * float(rank + 1)


def build_packed_operators(
    probs: RectifiedProbs,
    tables: ComplexTables,
    capacities,
    masks: tuple | None = None,
    select_key: tuple | None = None,
) -> PackedOperators:
    """Pack the top-K rows of each capacity-limited rank.

    ``capacities``: per-rank (len 4) ints; None/0 keeps the rank dense.
    Must be upward-closed (packing rank r requires packing every rank
    above it): a dense rank's membership products need its *own* rows
    dense, and its coface products are owned by the rank above — so the
    packing boundary is a single rank r0 with everything >= r0 packed.

    ``select_key`` (default ``mask + prob`` per rank) orders rows for
    top-K: adding the {0,1} mask makes every active row sort strictly
    before every inactive one regardless of soft probability, so the
    packed set is exactly the active set whenever capacity allows.
    """
    dt = probs.edges.dtype
    ranks = tuple(probs.ranks)
    if masks is None:
        masks = tuple((p > 0).astype(dt) for p in ranks)
    caps = [
        None if not c else min(int(c), s)
        for c, s in zip(capacities, tables.sizes)
    ]
    for r in range(3):
        if caps[r] is not None and caps[r + 1] is None:
            raise ValueError(
                f"capacities must be upward-closed: rank {r} is packed "
                f"but rank {r + 1} is dense ({capacities!r})"
            )
    face_tables = (None, tables.edges, tables.tri_edges, tables.tet_tris)
    idx: list = [None] * 4
    faces: list = [None] * 4
    pprobs, pmasks = list(ranks), list(masks)
    for r in range(4):
        if caps[r] is None:
            continue
        key = (
            select_key[r] if select_key is not None else masks[r] + ranks[r]
        )
        _, ix = jax.lax.top_k(key, caps[r])  # [..., K] key-descending
        idx[r] = ix
        pprobs[r] = jnp.take_along_axis(ranks[r], ix, axis=-1)
        pmasks[r] = jnp.take_along_axis(masks[r], ix, axis=-1)
        if r >= 1:
            f = jnp.asarray(face_tables[r])[ix]  # [..., K, r+1] full ids
            if idx[r - 1] is not None:
                # Remap full lower ids -> packed positions; rows dropped
                # from the lower rank's capacity map to the sentinel
                # K_lower (a zero row in every gather).
                kl, sl = caps[r - 1], tables.sizes[r - 1]
                pos = jnp.full((*ix.shape[:-1], sl), kl, jnp.int32)
                pos = jnp.put_along_axis(
                    pos,
                    idx[r - 1],
                    jnp.broadcast_to(
                        jnp.arange(kl, dtype=jnp.int32), idx[r - 1].shape
                    ),
                    axis=-1,
                    inplace=False,
                )
                f = jnp.take_along_axis(
                    pos, f.reshape(*f.shape[:-2], -1), axis=-1
                ).reshape(f.shape)
            faces[r] = f
    memberships = tuple(
        _membership_matrix(dense, fidx, nf, dt) if caps[i + 1] is None else None
        for i, (dense, fidx, nf) in enumerate(
            (
                (tables.v2e, tables.edges, tables.num_vertices),
                (tables.e2t, tables.tri_edges, tables.num_edges),
                (tables.t2tt, tables.tet_tris, tables.num_triangles),
            )
        )
    )
    return PackedOperators(
        probs=tuple(pprobs),
        masks=tuple(pmasks),
        idx=tuple(idx),
        faces=tuple(faces),
        memberships=memberships,
    )
