"""Topology core tests: tables, rectifier properties, operator assembly.

Mirrors the reference's ad-hoc diagnostics (rectifier.py:168-198 seeded demo,
encoder.py:445-499 known-complex test) as real property/golden tests.
"""

import itertools
import math

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from topo_audio_autoencoder_tpu.topology import (
    build_tables,
    enforce_constraints,
    enforce_constraints_flat,
    constraint_violations,
    build_operators,
    same_rank_matmul,
    dense_adjacency,
)


# ---------------------------------------------------------------- tables


@pytest.mark.parametrize("n", [4, 6, 20])
def test_table_sizes(n):
    t = build_tables(n)
    assert t.sizes == (
        n,
        math.comb(n, 2),
        math.comb(n, 3),
        math.comb(n, 4),
    )
    assert t.total_simplices == sum(t.sizes)
    # n=20 must reproduce the reference latent size 6195 (encoder.py:86-90)
    if n == 20:
        assert t.total_simplices == 6195


def test_membership_matrices_brute_force():
    """Each membership row marks exactly the faces of that simplex."""
    n = 6
    t = build_tables(n)
    edges = [tuple(e) for e in t.edges]
    tris = [tuple(x) for x in t.triangles]

    for i, tri in enumerate(t.triangles):
        expected_edges = {edges.index(p) for p in itertools.combinations(tuple(tri), 2)}
        got = set(np.nonzero(t.e2t[i])[0])
        assert got == expected_edges
        assert set(t.tri_edges[i]) == expected_edges

    for i, tet in enumerate(t.tetra):
        expected_tris = {tris.index(p) for p in itertools.combinations(tuple(tet), 3)}
        got = set(np.nonzero(t.t2tt[i])[0])
        assert got == expected_tris
        assert set(t.tet_tris[i]) == expected_tris

    # v2e marks both endpoints
    for i, (u, v) in enumerate(t.edges):
        assert set(np.nonzero(t.v2e[i])[0]) == {u, v}


def test_row_sums():
    t = build_tables(7)
    assert np.all(t.v2e.sum(1) == 2)
    assert np.all(t.e2t.sum(1) == 3)
    assert np.all(t.t2tt.sum(1) == 4)


# ---------------------------------------------------------------- rectifier


def _random_probs(rng, t, zero_frac=0.2):
    probs = [rng.random(s).astype(np.float32) for s in t.sizes]
    for p in probs:
        p[rng.random(p.shape) < zero_frac] = 0.0
    return probs


@pytest.mark.parametrize("n", [5, 7])
def test_rectifier_properties(rng, n):
    """Closure: zero face => zero simplex; min-dominance; geomean bound."""
    t = build_tables(n)
    v, e, tri, tet = _random_probs(rng, t)
    r = enforce_constraints(jnp.array(v), jnp.array(e), jnp.array(tri), jnp.array(tet), t)

    # vertices pass through (rectifier.py:122)
    np.testing.assert_array_equal(np.asarray(r.vertices), v)

    # rectified never exceeds raw
    assert np.all(np.asarray(r.edges) <= e + 1e-7)
    assert np.all(np.asarray(r.triangles) <= tri + 1e-7)
    assert np.all(np.asarray(r.tetra) <= tet + 1e-7)

    viol = constraint_violations(r, t)
    for k, val in viol.items():
        assert val <= 1e-5, f"{k} violated: {val}"


@pytest.mark.parametrize("n", [5, 8])
def test_rectifier_gather_matches_matmul(rng, n):
    """The static-face-gather contraction must equal the membership matmul
    bit-for-bit in values and match gradients (both batched)."""
    t = build_tables(n)
    B = 3
    flat = np.stack(
        [np.concatenate(_random_probs(rng, t, 0.25)) for _ in range(B)]
    ).astype(np.float32)
    x = jnp.array(flat)

    def run(method):
        def f(p):
            r = enforce_constraints(*t.split(p), t, method=method)
            return r.all_simplices

        val = f(x)
        grad = jax.grad(lambda p: (f(p) ** 2).sum())(x)
        return np.asarray(val), np.asarray(grad)

    v_m, g_m = run("matmul")
    v_g, g_g = run("gather")
    np.testing.assert_allclose(v_g, v_m, rtol=1e-6, atol=1e-7)
    np.testing.assert_allclose(g_g, g_m, rtol=1e-5, atol=1e-6)
    # exact zeros must propagate identically (closure property)
    np.testing.assert_array_equal(v_g == 0.0, v_m == 0.0)


def test_rectifier_golden_brute_force(rng):
    """Compare against a direct per-simplex geometric-mean computation."""
    n = 6
    t = build_tables(n)
    eps = 1e-10
    v, e, tri, tet = _random_probs(rng, t, zero_frac=0.3)
    r = enforce_constraints(jnp.array(v), jnp.array(e), jnp.array(tri), jnp.array(tet), t)

    # edges
    exp_e = np.empty_like(e)
    for i, (a, b) in enumerate(t.edges):
        if v[a] == 0 or v[b] == 0:
            geo = 0.0
        else:
            geo = math.exp((math.log(v[a] + eps) + math.log(v[b] + eps)) / 2)
        exp_e[i] = min(e[i], geo)
    np.testing.assert_allclose(np.asarray(r.edges), exp_e, rtol=1e-5, atol=1e-7)

    # triangles (from rectified edges)
    exp_t = np.empty_like(tri)
    for i in range(len(tri)):
        face_ps = exp_e[t.tri_edges[i]]
        if np.any(face_ps == 0):
            geo = 0.0
        else:
            geo = math.exp(np.log(face_ps + eps).sum() / 3)
        exp_t[i] = min(tri[i], geo)
    np.testing.assert_allclose(np.asarray(r.triangles), exp_t, rtol=1e-5, atol=1e-6)

    # tetra (from rectified triangles)
    exp_tt = np.empty_like(tet)
    for i in range(len(tet)):
        face_ps = exp_t[t.tet_tris[i]]
        if np.any(face_ps == 0):
            geo = 0.0
        else:
            geo = math.exp(np.log(face_ps + eps).sum() / 4)
        exp_tt[i] = min(tet[i], geo)
    np.testing.assert_allclose(np.asarray(r.tetra), exp_tt, rtol=1e-5, atol=1e-6)


def test_rectifier_batched_and_flat(rng):
    n = 6
    t = build_tables(n)
    batch = np.stack(
        [np.concatenate(_random_probs(rng, t)) for _ in range(4)]
    ).astype(np.float32)
    r = enforce_constraints_flat(jnp.array(batch), t)
    # Batched result row-for-row equals unbatched. Tolerance is loose because
    # f32 matmul reassociation differences get amplified by log() of small
    # probabilities through the chained ranks (~1e-3 relative worst case).
    for b in range(4):
        rb = enforce_constraints_flat(jnp.array(batch[b]), t)
        np.testing.assert_allclose(
            np.asarray(r.all_simplices)[b],
            np.asarray(rb.all_simplices),
            rtol=5e-3,
            atol=1e-4,
        )
    assert r.all_simplices.shape == (4, t.total_simplices)


def test_rectifier_grad_zero_on_masked(rng):
    """Masked (zero-face) entries must have zero gradient, like the
    reference's ``x - x`` trick (rectifier.py:94-96)."""
    n = 5
    t = build_tables(n)
    v, e, tri, tet = _random_probs(rng, t, zero_frac=0.0)
    v[0] = 0.0  # kill vertex 0 -> all its edges must be 0 with zero grad

    def loss(ev):
        r = enforce_constraints(jnp.array(v), ev, jnp.array(tri)[: t.sizes[2]], jnp.array(tet), t)
        return jnp.sum(r.edges**2)

    g = jax.grad(loss)(jnp.array(e))
    dead_edges = [i for i, (a, b) in enumerate(t.edges) if a == 0 or b == 0]
    # the rectified value of dead edges is min(e, 0) -> gradient to raw e is
    # only nonzero if e < 0, which can't happen for probabilities
    for i in dead_edges:
        assert float(g[i]) == 0.0
    # gradients are finite everywhere
    assert np.all(np.isfinite(np.asarray(g)))


def test_rectifier_grads_finite_with_zeros(rng):
    """log(0 + eps) paths must not produce NaN/Inf gradients."""
    n = 5
    t = build_tables(n)
    v, e, tri, tet = _random_probs(rng, t, zero_frac=0.4)

    def loss(vv, ee, tr, te):
        r = enforce_constraints(vv, ee, tr, te, t)
        return jnp.sum(r.all_simplices)

    grads = jax.grad(loss, argnums=(0, 1, 2, 3))(
        jnp.array(v), jnp.array(e), jnp.array(tri), jnp.array(tet)
    )
    for g in grads:
        assert np.all(np.isfinite(np.asarray(g)))


# ---------------------------------------------------------------- builder


def _reference_dense_ops(r, t):
    """Direct translation of complex_builder.py:35-70 math (numpy), without
    active-slicing (we compare against the masked-static full matrices)."""
    pe = np.asarray(r.edges, dtype=np.float64)
    pt = np.asarray(r.triangles, dtype=np.float64)
    ptt = np.asarray(r.tetra, dtype=np.float64)
    V = t.num_vertices

    adj0 = np.zeros((V, V))
    for i, (a, b) in enumerate(t.edges):
        adj0[a, b] = pe[i]
        adj0[b, a] = pe[i]

    inc1 = t.v2e.T.astype(np.float64) * pe[None, :]
    inc2 = t.e2t.T.astype(np.float64) * pt[None, :]
    inc3 = t.t2tt.T.astype(np.float64) * ptt[None, :]

    def rm_diag(a):
        return a * (1 - np.eye(a.shape[0]))

    adj1 = rm_diag(inc2 @ inc2.T)
    adj2 = rm_diag(inc3 @ inc3.T)
    adj3 = rm_diag(inc3.T @ inc3)
    return adj0, adj1, adj2, adj3, inc1, inc2, inc3


def test_builder_matches_reference_math(rng):
    n = 6
    t = build_tables(n)
    v, e, tri, tet = _random_probs(rng, t, zero_frac=0.3)
    r = enforce_constraints(jnp.array(v), jnp.array(e), jnp.array(tri), jnp.array(tet), t)
    ops = build_operators(r, t)

    adj0, adj1, adj2, adj3, inc1, inc2, inc3 = _reference_dense_ops(r, t)

    np.testing.assert_allclose(np.asarray(ops.adj0), adj0, rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(ops.inc1), inc1, rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(ops.inc2), inc2, rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(ops.inc3), inc3, rtol=1e-5, atol=1e-6)

    for rank, expected in [(1, adj1), (2, adj2), (3, adj3)]:
        np.testing.assert_allclose(
            np.asarray(dense_adjacency(ops, rank)), expected, rtol=1e-4, atol=1e-5
        )


def test_factored_same_rank_matmul(rng):
    """A @ X via factored incidences == dense A @ X, all ranks, batched."""
    n = 6
    t = build_tables(n)
    B, C = 3, 8
    flat = np.stack(
        [np.concatenate(_random_probs(rng, t, 0.2)) for _ in range(B)]
    ).astype(np.float32)
    r = enforce_constraints_flat(jnp.array(flat), t)
    ops = build_operators(r, t)

    for rank, s in enumerate(t.sizes):
        x = jnp.array(rng.standard_normal((B, s, C)), dtype=jnp.float32)
        fast = same_rank_matmul(ops, rank, x)
        dense = dense_adjacency(ops, rank) @ x
        np.testing.assert_allclose(
            np.asarray(fast), np.asarray(dense), rtol=1e-4, atol=1e-4
        )


def test_zero_prob_rows_are_zero(rng):
    """Masked-static equivalence: operators touching an inactive simplex are
    identically zero, so keeping full shapes equals the reference's slicing."""
    n = 6
    t = build_tables(n)
    v, e, tri, tet = _random_probs(rng, t, zero_frac=0.4)
    v[2] = 0.0
    r = enforce_constraints(jnp.array(v), jnp.array(e), jnp.array(tri), jnp.array(tet), t)
    ops = build_operators(r, t)

    inactive_v = np.asarray(r.vertices) == 0
    inactive_e = np.asarray(r.edges) == 0
    adj0 = np.asarray(ops.adj0)
    assert np.all(adj0[inactive_v] == 0)
    assert np.all(adj0[:, inactive_v] == 0)
    inc1 = np.asarray(ops.inc1)
    assert np.all(inc1[inactive_v] == 0)
    assert np.all(inc1[:, inactive_e] == 0)
    adj1 = np.asarray(dense_adjacency(ops, 1))
    assert np.all(np.abs(adj1[inactive_e]) < 1e-6)


def test_known_complex_golden():
    """Hand-built 4-vertex binary complex (mirrors encoder.py:445-499)."""
    t = build_tables(4)
    # all vertices on; edge (2,3) off -> triangles/tetra containing it die
    v = jnp.ones(4)
    e = jnp.array([1, 1, 1, 1, 1, 0], dtype=jnp.float32)  # edges: 01 02 03 12 13 23
    tri = jnp.ones(4)  # 012 013 023 123
    tet = jnp.ones(1)
    r = enforce_constraints(v, e, tri, tet, t)
    np.testing.assert_allclose(np.asarray(r.edges), [1, 1, 1, 1, 1, 0], atol=1e-6)
    # triangles 023 (idx 2) and 123 (idx 3) contain edge 23 -> 0
    np.testing.assert_allclose(np.asarray(r.triangles), [1, 1, 0, 0], atol=1e-6)
    np.testing.assert_allclose(np.asarray(r.tetra), [0], atol=1e-6)

    ops = build_operators(r, t)
    expected_adj0 = np.array(
        [[0, 1, 1, 1], [1, 0, 1, 1], [1, 1, 0, 0], [1, 1, 0, 0]], dtype=np.float32
    )
    np.testing.assert_allclose(np.asarray(ops.adj0), expected_adj0, atol=1e-6)
    # triangle adjacency: only triangles 012,013 active; they share no tetra
    adj2 = np.asarray(dense_adjacency(ops, 2))
    assert np.all(adj2 == 0)
    # edge adjacency: edges of triangle 012 pairwise adjacent etc.
    adj1 = np.asarray(dense_adjacency(ops, 1))
    assert adj1[0, 1] > 0  # edges 01 & 02 share triangle 012
    assert adj1[5].sum() == 0  # dead edge 23 isolated
