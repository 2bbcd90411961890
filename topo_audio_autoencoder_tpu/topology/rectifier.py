"""Simplicial-closure rectification of per-simplex probabilities.

TPU-native equivalent of the reference ``enforce_constraints``
(reference: rectifier.py:75-127). Guarantees, rank by rank (bottom-up):

1. a simplex with any zero-probability face gets probability exactly 0
   ("closure" / downward-closed property), and
2. a simplex is never more probable than the *geometric mean* of its faces:
   ``rectified = min(raw, exp(mean(log(face_probs + eps))))``.

Design notes (why this shape of code):

- Everything is a batched MXU matmul against the constant 0/1 face-membership
  matrices. The reference gathers vertex pairs (rectifier.py:88) and matmuls
  the log-probs for higher ranks (rectifier.py:101,112); here all three ranks
  use the same matmul form ``exp((M @ log(p + eps)) / k)``, which XLA lowers
  to three tiny batched matmuls — no gathers, no dynamic shapes.
- Zero propagation: the reference zeroes masked entries with ``x - x``
  (rectifier.py:94-96) so the gradient of masked entries is 0; ``jnp.where``
  with a 0 branch has identical forward value and identical (zero) cotangent,
  so we use that.
- The zero masks chain exactly like the reference: edges mask from *raw*
  vertex probs (rectifier.py:89), triangles from *rectified* edges
  (rectifier.py:103-104), tetra from *rectified* triangles
  (rectifier.py:114-115).
- fp32 island: the log/exp chain with eps=1e-10 underflows in bf16, so the
  rectifier always computes in float32 and casts back to the input dtype —
  the required "fp32 island inside a bf16 step".
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp
import numpy as np

from .complexes import ComplexTables


class RectifiedProbs(NamedTuple):
    """Per-rank rectified probabilities. Mirrors reference RectifiedProbs
    (rectifier.py:67-73); ``all_simplices`` is the rank-concatenated vector."""

    vertices: jnp.ndarray
    edges: jnp.ndarray
    triangles: jnp.ndarray
    tetra: jnp.ndarray

    @property
    def all_simplices(self) -> jnp.ndarray:
        return jnp.concatenate(
            [self.vertices, self.edges, self.triangles, self.tetra], axis=-1
        )

    @property
    def ranks(self):
        return (self.vertices, self.edges, self.triangles, self.tetra)


def _rectify_rank(
    raw: jnp.ndarray,
    face_probs: jnp.ndarray,
    membership_t: jnp.ndarray,
    k: float,
    eps: float,
) -> jnp.ndarray:
    """One rectification step: min(raw, geomean of faces), zeros propagated.

    ``membership_t`` is the transposed membership matrix [F, S] so the
    contraction is ``[..., F] @ [F, S] -> [..., S]`` (batched MXU matmul).
    """
    log_faces = jnp.log(face_probs + eps)
    geo = jnp.exp(log_faces @ membership_t / k)
    # A simplex whose faces include any exact zero must be exactly zero.
    zero_faces = (face_probs == 0.0).astype(log_faces.dtype) @ membership_t
    geo = jnp.where(zero_faces > 0.0, 0.0, geo)
    return jnp.minimum(raw, geo)


def _rectify_rank_gather(
    raw: jnp.ndarray,
    face_probs: jnp.ndarray,
    face_idx: np.ndarray,
    eps: float,
) -> jnp.ndarray:
    """Same rectification as ``_rectify_rank`` via a static face gather.

    The membership matmul touches k nonzeros per row out of F (rank 3:
    4/1140 = 0.35% density, i.e. ~99.65% wasted MACs); the gather form
    reads exactly the k face values per simplex using the static index
    tables (``tables.edges`` / ``tri_edges`` / ``tet_tris``). Identical
    numerics — the winner on TPU is decided by measurement (bench A/B).
    """
    log_faces = jnp.log(face_probs + eps)
    gathered = log_faces[..., face_idx]  # [..., S, k], static idx
    geo = jnp.exp(gathered.mean(axis=-1))
    zero = (face_probs == 0.0)[..., face_idx].any(axis=-1)
    geo = jnp.where(zero, 0.0, geo)
    return jnp.minimum(raw, geo)


# Contraction method for the rectifier's face-geomean products. "gather"
# reads the k static face indices per simplex; "matmul" contracts against
# the dense membership matrix (99.65% zeros at rank 3). Identical numerics
# (parity-tested incl. gradients); measured on v5e at the flagship step:
# gather 146.5 ms vs matmul 156.5 ms (benchmarks/ab.py rectifier), and the
# gather form carries only the tiny [S, k] index constants — no dense
# [S, F] matrices in the HLO (required for n >= 32).
DEFAULT_METHOD = "gather"


def enforce_constraints(
    vertex_probs: jnp.ndarray,
    edge_probs: jnp.ndarray,
    triangle_probs: jnp.ndarray,
    tetra_probs: jnp.ndarray,
    tables: ComplexTables,
    eps: float = 1e-10,
    method: str | None = None,
) -> RectifiedProbs:
    """Rectify probabilities bottom-up so they form a valid (soft) complex.

    Accepts arbitrary leading batch dims; all shapes are static. Vertices
    pass through unrectified, matching reference rectifier.py:122.
    ``method``: "matmul" | "gather" (see DEFAULT_METHOD).
    """
    method = method or DEFAULT_METHOD
    in_dtype = vertex_probs.dtype
    f32 = jnp.float32
    v = vertex_probs.astype(f32)
    e = edge_probs.astype(f32)
    t = triangle_probs.astype(f32)
    tt = tetra_probs.astype(f32)

    if method == "gather":
        re = _rectify_rank_gather(e, v, tables.edges, eps)
        rt = _rectify_rank_gather(t, re, tables.tri_edges, eps)
        rtt = _rectify_rank_gather(tt, rt, tables.tet_tris, eps)
    elif method == "matmul":
        v2e_t = jnp.asarray(tables.v2e.T, dtype=f32)  # [V, E]
        e2t_t = jnp.asarray(tables.e2t.T, dtype=f32)  # [E, T]
        t2tt_t = jnp.asarray(tables.t2tt.T, dtype=f32)  # [T, Tt]
        re = _rectify_rank(e, v, v2e_t, 2.0, eps)
        rt = _rectify_rank(t, re, e2t_t, 3.0, eps)
        rtt = _rectify_rank(tt, rt, t2tt_t, 4.0, eps)
    else:
        raise ValueError(f"method must be 'matmul' or 'gather', got {method!r}")

    return RectifiedProbs(
        vertices=v.astype(in_dtype),
        edges=re.astype(in_dtype),
        triangles=rt.astype(in_dtype),
        tetra=rtt.astype(in_dtype),
    )


def enforce_constraints_flat(
    all_probs: jnp.ndarray, tables: ComplexTables, eps: float = 1e-10
) -> RectifiedProbs:
    """Rectify a flat [..., total_simplices] probability vector."""
    v, e, t, tt = tables.split(all_probs)
    return enforce_constraints(v, e, t, tt, tables, eps)


def constraint_violations(probs: RectifiedProbs, tables: ComplexTables) -> dict:
    """Numeric constraint checker (replaces the print-based
    ``verify_constraints``, reference rectifier.py:129-165). Returns max
    violation of each property; all should be ~0 for rectified probs."""
    eps = 1e-10

    def check(rect, faces, membership, k):
        m = np.asarray(membership)
        geo = jnp.exp(jnp.log(faces + eps) @ jnp.asarray(m.T) / k)
        zero = (faces == 0.0).astype(jnp.float32) @ jnp.asarray(m.T)
        geo = jnp.where(zero > 0, 0.0, geo)
        over = jnp.maximum(rect - geo, 0.0)
        zero_violation = jnp.where(zero > 0, jnp.abs(rect), 0.0)
        return float(jnp.max(over)), float(jnp.max(zero_violation))

    e_over, e_zero = check(probs.edges, probs.vertices, tables.v2e, 2.0)
    t_over, t_zero = check(probs.triangles, probs.edges, tables.e2t, 3.0)
    tt_over, tt_zero = check(probs.tetra, probs.triangles, tables.t2tt, 4.0)
    return {
        "edge_over_geomean": e_over,
        "edge_zero_face": e_zero,
        "triangle_over_geomean": t_over,
        "triangle_zero_face": t_zero,
        "tetra_over_geomean": tt_over,
        "tetra_zero_face": tt_zero,
    }
