"""Assembly of simplicial message-passing operators from rectified probs.

TPU-native equivalent of the reference ``build_sparse_matrices``
(reference: complex_builder.py:23-115), re-designed **masked-static and
factored**:

The reference builds sparse COO matrices and slices rows/columns down to the
dynamically-discovered active simplices (``nonzero()``), which is hostile to
XLA (dynamic shapes, scatter/gather). Because n fixes every size, we keep ALL
simplices at fixed shape and express inactivity as zero weight. This is
*exactly equivalent* to the reference's active-slicing: rectification
guarantees that any simplex with probability 0 has every incidence /
adjacency entry equal to 0 (its faces' probabilities weight those entries),
so the rows/columns the reference deletes are identically zero here and
contribute nothing to any matmul. Downstream consumers that are not linear in
the features (LayerNorm, attention softmax) receive explicit active masks.

Second redesign (round 2): **no per-sample operator matrix is ever
materialized.** Every operator the reference builds factors through a
*static* 0/1 membership matrix and the per-sample probability vector:

    inc_r          = M_r^T * p_r              (complex_builder.py:52-54)
    inc_r  @ X     = M_r^T @ (p_r ⊙ X)        ("up"   product)
    inc_r^T @ X    = p_r ⊙ (M_r @ X)          ("down" product)
    A_0    @ X     = M_1^T @ (p_1 ⊙ (M_1 @ X)) - deg ⊙ X     (adj0)
    A_r    @ X     = M_{r+1}^T @ (p_{r+1}² ⊙ (M_{r+1} @ X)) - d ⊙ X
                     (same-rank via shared cofaces, complex_builder.py:62-63)
    A_top  @ X     = p ⊙ (M @ (M^T @ (p ⊙ X))) - d ⊙ X
                     (top rank via shared faces, complex_builder.py:64)

where M_r is the [S_r, S_{r-1}] face membership of rank r and p_r the
rectified probabilities. Why this shape of code on TPU:

- HBM: the reference's per-sample incidences cost O(B·T·Tt) floats
  (n=20, b=128: ~2.8 GB for inc3 alone); the factored form carries only the
  [B, S_r] probability vectors — the membership matrices are shared
  compile-time constants.
- MXU: every contraction is ``static_matrix @ batched_tensor``, which XLA
  lowers to ONE [S_out, S_in] × [S_in, B·C] matmul instead of B independent
  small ones — far better systolic-array tiling.
- Scaling: n is no longer bounded by per-sample operator storage (n=32's
  t2tt is ~700 MB — fine once, fatal per sample).

``adj0`` / ``inc1..3`` / ``adj_diag`` / ``dense_adjacency`` remain available
as on-demand materializers for tests, inspection, and parity checks against
the reference's explicit construction.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from .complexes import ComplexTables
from .rectifier import RectifiedProbs


class SimplicialOperators(NamedTuple):
    """Factored, fixed-shape operator set for the SCCN.

    Fields (leading batch dims allowed on probs/masks):

    - ``probs``: per-rank rectified probabilities ([..., V], [..., E],
      [..., T], [..., Tt]) — the only per-sample state.
    - ``masks``: per-rank {0,1} active masks — the static-shape stand-in for
      the reference's ``active_indices`` (encoder.py:230-233).
    - ``memberships``: static 0/1 face-membership matrices
      (v2e [E, V], e2t [T, E], t2tt [Tt, T]) shared by every sample.

    The products below never materialize an operator matrix; the properties
    (``adj0``, ``inc1``…) materialize on demand for tests/inspection only.
    """

    probs: tuple
    masks: tuple
    memberships: tuple

    # ------------------------------------------------------------ products

    def up(self, rank: int, x: jnp.ndarray) -> jnp.ndarray:
        """``inc_rank @ x``: rank -> rank-1 message carrier.

        x: [..., S_rank, C] -> [..., S_{rank-1}, C].
        """
        m = self.memberships[rank - 1]  # [S_r, S_{r-1}]
        p = self.probs[rank]
        return jnp.swapaxes(m, 0, 1) @ (p[..., None] * x)

    def down(self, rank: int, x: jnp.ndarray) -> jnp.ndarray:
        """``inc_rank^T @ x``: rank-1 -> rank message carrier.

        x: [..., S_{rank-1}, C] -> [..., S_rank, C].
        """
        m = self.memberships[rank - 1]
        p = self.probs[rank]
        return p[..., None] * (m @ x)

    def adj0_matmul(self, x: jnp.ndarray) -> jnp.ndarray:
        """``A_0 @ x`` — vertex adjacency weighted by edge probs with the
        degree diagonal removed (complex_builder.py:35-40): each edge {u,v}
        contributes p_e to A[u,v] and A[v,u], never to the diagonal."""
        m = self.memberships[0]  # v2e [E, V]
        p = self.probs[1]
        y = jnp.swapaxes(m, 0, 1) @ (p[..., None] * (m @ x))
        deg = p @ m  # [..., V] weighted vertex degree
        return y - deg[..., None] * x

    def gram_diag(self, rank: int, via_upper: bool) -> jnp.ndarray:
        """Diagonal of the rank-``rank`` incidence Gram (the self-loop mass
        removed by complex_builder.py:67-70)."""
        if via_upper:
            p = self.probs[rank + 1]
            return (p * p) @ self.memberships[rank]  # [..., S_rank]
        # Lower (shared-face) Gram: a rank-r simplex has r+1 faces.
        p = self.probs[rank]
        return (p * p) * float(rank + 1)

    # --------------------------------------------------- materializers

    @property
    def adj0(self) -> jnp.ndarray:
        m = self.memberships[0]
        p = self.probs[1]
        weighted = p[..., :, None] * m  # [..., E, V]
        gram0 = jnp.einsum("...ev,...eu->...vu", weighted, m)
        eye = jnp.eye(m.shape[-1], dtype=m.dtype)
        return gram0 * (1.0 - eye)

    def incidence(self, rank: int) -> jnp.ndarray:
        """Materialized ``inc_rank = M_rank^T * p_rank`` (tests only)."""
        m = self.memberships[rank - 1]
        p = self.probs[rank]
        return jnp.swapaxes(m * p[..., :, None], -1, -2)

    @property
    def inc1(self) -> jnp.ndarray:
        return self.incidence(1)

    @property
    def inc2(self) -> jnp.ndarray:
        return self.incidence(2)

    @property
    def inc3(self) -> jnp.ndarray:
        return self.incidence(3)

    @property
    def adj_diag(self) -> tuple:
        """Reference-convention Gram diagonals (d1 [E], d2 [T], d3 [Tt]):
        ranks 1-2 via shared cofaces, the top rank via shared faces."""
        return (
            self.gram_diag(1, via_upper=True),
            self.gram_diag(2, via_upper=True),
            self.gram_diag(3, via_upper=False),
        )


# Above this many elements a dense membership matrix is built IN-GRAPH
# from its [S, k] face-index table (a scatter of k ones per row) instead
# of being baked into the HLO as a constant: at n=32 the t2tt matrix is
# [35960, 4960] (~713 MB f32) — the serialized program blows the remote
# compile transport (HTTP 413) and bloats every compile cache. The
# scatter runs once per step (XLA CSEs the shared expression) and costs
# ~the matrix's HBM write.
_MAX_CONST_ELEMS = 16 * 1024 * 1024


def _membership_matrix(
    dense: "np.ndarray", face_idx: "np.ndarray", num_faces: int, dt
) -> jnp.ndarray:
    if dense.size <= _MAX_CONST_ELEMS:
        return jnp.asarray(dense, dtype=dt)
    s = face_idx.shape[0]
    rows = jnp.arange(s)[:, None]
    return (
        jnp.zeros((s, num_faces), dt)
        .at[rows, jnp.asarray(face_idx)]
        .set(jnp.ones((), dt))
    )


def build_operators(
    probs: RectifiedProbs, tables: ComplexTables, masks: tuple | None = None
) -> SimplicialOperators:
    """Build the factored operator set. Batched over leading dims.

    ``masks`` defaults to ``prob > 0`` per rank, matching the reference's
    ``nonzero()``-derived active sets (encoder.py:230-233).
    """
    dt = probs.edges.dtype
    memberships = tuple(
        _membership_matrix(dense, idx, nf, dt)
        for dense, idx, nf in (
            (tables.v2e, tables.edges, tables.num_vertices),
            (tables.e2t, tables.tri_edges, tables.num_edges),
            (tables.t2tt, tables.tet_tris, tables.num_triangles),
        )
    )
    if masks is None:
        masks = tuple((p > 0).astype(dt) for p in probs.ranks)
    return SimplicialOperators(
        probs=tuple(probs.ranks), masks=masks, memberships=memberships
    )


def same_rank_matmul(ops: SimplicialOperators, rank: int, x: jnp.ndarray) -> jnp.ndarray:
    """Compute ``A_rank @ x`` without materializing A.

    x: [..., S_rank, C]. Equals the reference's dense
    ``adjacencies[rank] @ x`` with self-loops removed
    (complex_builder.py:62-70) — verified against the explicit construction
    in tests/test_topology.py. The convention is FIXED regardless of
    truncation, matching ``dense_adjacency`` and the reference: ranks 1-2
    connect via shared cofaces (complex_builder.py:62-63), rank 3 via
    shared faces (complex_builder.py:64). A statically-empty coface rank
    makes A == 0 naturally (the zero-size Gram product yields zeros),
    exactly like the reference's explicit construction.
    """
    if rank == 0:
        return ops.adj0_matmul(x)
    if not 1 <= rank <= 3:
        raise ValueError(f"rank must be in 0..3, got {rank}")
    if rank < 3:
        # A_r = inc_{r+1} @ inc_{r+1}^T - D
        p = ops.probs[rank + 1]
        m = ops.memberships[rank]  # [S_{r+1}, S_r]
        gram_x = jnp.swapaxes(m, 0, 1) @ ((p * p)[..., None] * (m @ x))
        return gram_x - ops.gram_diag(rank, via_upper=True)[..., None] * x
    # A_3 = inc_3^T @ inc_3 - D
    p = ops.probs[rank]
    m = ops.memberships[rank - 1]  # [S_r, S_{r-1}]
    px = p[..., None] * x
    gram_x = p[..., None] * (m @ (jnp.swapaxes(m, 0, 1) @ px))
    return gram_x - ops.gram_diag(rank, via_upper=False)[..., None] * x


def dense_adjacency(ops: SimplicialOperators, rank: int) -> jnp.ndarray:
    """Materialize the dense adjacency for a rank (tests / inspection only).

    Uses the reference's fixed conventions (rank 1-2 via upper incidence,
    rank 3 via lower, complex_builder.py:62-64) regardless of truncation,
    matching the reference's explicit construction.
    """
    if rank == 0:
        return ops.adj0
    if rank == 1:
        inc, d = ops.inc2, ops.adj_diag[0]
    elif rank == 2:
        inc, d = ops.inc3, ops.adj_diag[1]
    elif rank == 3:
        inc, d = jnp.swapaxes(ops.inc3, -1, -2), ops.adj_diag[2]
    else:
        raise ValueError(f"rank must be in 0..3, got {rank}")
    gram = inc @ jnp.swapaxes(inc, -1, -2)
    s = gram.shape[-1]
    return gram - d[..., :, None] * jnp.eye(s, dtype=gram.dtype)
