"""Static-capacity packed operators (topology/packed.py) vs the dense
masked-static path.

Exactness contract: whenever each rank's capacity covers its active-row
count, the packed products (and the whole packed forward) equal the dense
ones — the packed path is the TPU-static analog of the reference's
dynamic active slicing (reference: complex_builder.py:47,57-59). Over
capacity, truncation keeps the highest-probability rows.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from topo_audio_autoencoder_tpu.topology import build_tables, build_operators
from topo_audio_autoencoder_tpu.topology.packed import (
    PackedOperators,
    build_packed_operators,
)
from topo_audio_autoencoder_tpu.topology.builder import same_rank_matmul
from topo_audio_autoencoder_tpu.topology.rectifier import RectifiedProbs


def sparse_complex(rng, tables, keep=0.5):
    """Random downward-closed sparse probabilities per rank.

    A simplex is active only if all its faces are active AND a coin
    lands heads; active rows get probabilities in [0.2, 1]."""
    n = tables.num_vertices
    v_act = (rng.random(n) < 0.75).astype(np.float32)
    e_act = np.array(
        [v_act[a] * v_act[b] for a, b in tables.edges], np.float32
    ) * (rng.random(tables.num_edges) < keep)
    t_act = np.array(
        [np.prod(e_act[list(f)]) > 0 for f in tables.tri_edges], np.float32
    ) * (rng.random(tables.num_triangles) < keep)
    tt_act = np.array(
        [np.prod(t_act[list(f)]) > 0 for f in tables.tet_tris], np.float32
    ) * (rng.random(tables.num_tetra) < keep)
    ranks = []
    for act in (v_act, e_act, t_act, tt_act):
        p = (0.2 + 0.8 * rng.random(act.shape)).astype(np.float32) * act
        ranks.append(p)
    return ranks


def batched_probs(rng, tables, batch=3):
    rows = [sparse_complex(rng, tables) for _ in range(batch)]
    return RectifiedProbs(
        *(jnp.asarray(np.stack([r[k] for r in rows])) for k in range(4))
    )


def unpack_rows(packed, idx, full_size):
    """Scatter packed rows [B, K, ...] back to the full layout (numpy)."""
    packed, idx = np.asarray(packed), np.asarray(idx)
    out = np.zeros((packed.shape[0], full_size, *packed.shape[2:]), packed.dtype)
    for b in range(packed.shape[0]):
        out[b, idx[b]] = packed[b]
    return out


@pytest.fixture(scope="module")
def setup():
    tables = build_tables(8)
    rng = np.random.default_rng(7)
    probs = batched_probs(rng, tables)
    # Capacity = max active count + 1: covers every active row (the
    # exactness condition) and leaves at least one pad slot so the
    # sentinel path is exercised too.
    caps = tuple(
        min(int((np.asarray(p) > 0).sum(-1).max()) + 1, tables.sizes[r])
        for r, p in enumerate(probs.ranks)
    )
    dense = build_operators(probs, tables)
    packed = build_packed_operators(probs, tables, caps)
    feats = tuple(
        jnp.asarray(
            np.random.default_rng(10 + r).standard_normal(
                (3, tables.sizes[r], 5), np.float32
            )
        )
        for r in range(4)
    )
    return tables, probs, dense, packed, caps, feats


def pack_feat(feats_r, idx):
    return jnp.take_along_axis(feats_r, np.asarray(idx)[..., None], axis=1)


def test_down_parity(setup):
    tables, probs, dense, packed, caps, feats = setup
    for r in range(1, 4):
        want = np.asarray(dense.down(r, feats[r - 1]))
        x_low = (
            pack_feat(feats[r - 1], packed.idx[r - 1])
            if packed.idx[r - 1] is not None
            else feats[r - 1]
        )
        got = unpack_rows(
            packed.down(r, x_low), packed.idx[r], tables.sizes[r]
        )
        np.testing.assert_allclose(got, want, atol=1e-5, err_msg=f"rank {r}")


def test_up_parity(setup):
    tables, probs, dense, packed, caps, feats = setup
    for r in range(1, 4):
        want = np.asarray(dense.up(r, feats[r]))
        x_r = pack_feat(feats[r], packed.idx[r])
        got = packed.up(r, x_r)
        if packed.idx[r - 1] is not None:
            got = unpack_rows(got, packed.idx[r - 1], tables.sizes[r - 1])
        np.testing.assert_allclose(
            np.asarray(got), want, atol=1e-5, err_msg=f"rank {r}"
        )


def test_adj0_and_same_rank_parity(setup):
    tables, probs, dense, packed, caps, feats = setup
    want = np.asarray(dense.adj0_matmul(feats[0]))
    x0 = (
        pack_feat(feats[0], packed.idx[0])
        if packed.idx[0] is not None
        else feats[0]
    )
    got = packed.adj0_matmul(x0)
    if packed.idx[0] is not None:
        got = unpack_rows(got, packed.idx[0], tables.sizes[0])
    np.testing.assert_allclose(np.asarray(got), want, atol=1e-5)

    # same-rank via the layer's composition: up(r+1, down(r+1, x)) - diag*x
    for r in (1, 2):
        want = np.asarray(same_rank_matmul(dense, r, feats[r]))
        x_r = pack_feat(feats[r], packed.idx[r])
        core = packed.up(r + 1, packed.down(r + 1, x_r))
        d = packed.gram_diag(r, via_upper=True)
        got = unpack_rows(
            core - d[..., None] * x_r, packed.idx[r], tables.sizes[r]
        )
        np.testing.assert_allclose(got, want, atol=1e-5, err_msg=f"rank {r}")
    # top rank via shared faces
    want = np.asarray(same_rank_matmul(dense, 3, feats[3]))
    x3 = pack_feat(feats[3], packed.idx[3])
    core = packed.down(3, packed.up(3, x3))
    d = packed.gram_diag(3, via_upper=False)
    got = unpack_rows(core - d[..., None] * x3, packed.idx[3], tables.sizes[3])
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_gram_diag_parity(setup):
    tables, probs, dense, packed, caps, feats = setup
    for r, via in ((0, True), (1, True), (2, True), (3, False)):
        want = np.asarray(dense.gram_diag(r, via_upper=via))
        got = packed.gram_diag(r, via_upper=via)
        if packed.idx[r] is not None:
            got = unpack_rows(got[..., None], packed.idx[r], tables.sizes[r])[
                ..., 0
            ]
        np.testing.assert_allclose(
            np.asarray(got), want, atol=1e-5, err_msg=f"rank {r}"
        )


def test_partial_packing_boundary(setup):
    """Pack only ranks 2..3 (the intended large-n config): dense ranks keep
    the membership-matrix math, boundary products mix layouts."""
    tables, probs, dense, _, _, feats = setup
    caps = (0, 0, tables.sizes[2] // 2, tables.sizes[3] // 2)
    packed = build_packed_operators(probs, tables, caps)
    assert packed.idx[0] is None and packed.idx[1] is None
    assert packed.memberships[0] is not None  # v2e stays dense
    assert packed.memberships[2] is None
    # boundary: rank-2 packed over a dense rank-1
    want = np.asarray(dense.down(2, feats[1]))
    got = unpack_rows(
        packed.down(2, feats[1]), packed.idx[2], tables.sizes[2]
    )
    np.testing.assert_allclose(got, want, atol=1e-5)
    want = np.asarray(dense.up(2, feats[2]))
    got = np.asarray(packed.up(2, pack_feat(feats[2], packed.idx[2])))
    np.testing.assert_allclose(got, want, atol=1e-5)
    # dense-only product below the boundary
    np.testing.assert_allclose(
        np.asarray(packed.adj0_matmul(feats[0])),
        np.asarray(dense.adj0_matmul(feats[0])),
        atol=1e-5,
    )


def test_upward_closure_required(setup):
    tables, probs, *_ = setup
    with pytest.raises(ValueError, match="upward-closed"):
        build_packed_operators(probs, tables, (4, 0, 0, 0))


def test_truncation_keeps_top_probability_rows(setup):
    tables, probs, *_ = setup
    caps = (0, 0, 0, 2)  # force tetra overflow
    packed = build_packed_operators(probs, tables, caps)
    p_full = np.asarray(probs.tetra)
    for b in range(p_full.shape[0]):
        kept = np.asarray(packed.idx[3])[b]
        kept_p = p_full[b, kept]
        dropped = np.delete(p_full[b], kept)
        if dropped.size:
            assert kept_p.min() >= dropped.max() - 1e-6


def test_model_forward_parity_under_capacity():
    """decode_from_probs: packed model == dense model on a sparse latent
    (the codec path), same parameters."""
    from topo_audio_autoencoder_tpu.models import AudioAutoencoder

    tables = build_tables(8)
    rng = np.random.default_rng(3)
    probs = batched_probs(rng, tables, batch=2)
    caps = (0, 0, tables.sizes[2] // 2, tables.sizes[3] // 2)

    kw = dict(num_vertices=8, num_bands=16, sccn_hidden_dim=16,
              n_sccn_layers=2, max_active_vertices=8)
    dense_model = AudioAutoencoder.create(**kw)
    packed_model = AudioAutoencoder.create(**kw, pack_capacities=caps)

    x = jnp.asarray(
        np.random.default_rng(0).standard_normal((2, 1, 4096)), jnp.float32
    )
    params = dense_model.jit_init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        x,
    )

    def decode(model):
        return jax.jit(
            lambda p, pr: model.apply(
                p, pr, 256, method=lambda m, a, d: m.decode_from_probs(a, d)
            )
        )(params, probs)

    w_dense = np.asarray(decode(dense_model))
    w_packed = np.asarray(decode(packed_model))
    np.testing.assert_allclose(w_packed, w_dense, atol=2e-4, rtol=1e-3)


def test_packed_train_forward_and_grads_finite():
    """Full packed forward+backward under jit: finite loss and grads."""
    from topo_audio_autoencoder_tpu.models import AudioAutoencoder

    model = AudioAutoencoder.create(
        num_vertices=8, num_bands=16, sccn_hidden_dim=16, n_sccn_layers=2,
        max_active_vertices=8, pack_capacities=(0, 0, 28, 35),
    )
    x = jnp.asarray(
        np.random.default_rng(0).standard_normal((2, 1, 4096)), jnp.float32
    )
    params = model.jit_init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        x,
    )

    @jax.jit
    def loss_fn(p):
        out = model.apply(
            p, x, 1.0, jax.random.PRNGKey(2), True,
            rngs={"dropout": jax.random.PRNGKey(3)},
        )
        return jnp.abs(out.waveform).mean() + out.aux["binary_entropy"].mean()

    val, grads = jax.value_and_grad(loss_fn)(params)
    assert np.isfinite(float(val))
    leaves = jax.tree.leaves(grads)
    assert all(np.isfinite(np.asarray(g)).all() for g in leaves)
    # embedding-table grads must flow through the packed gather
    emb = grads["params"]["encoder"]["embed_rank3"]
    assert float(jnp.abs(emb).sum()) > 0


def test_packed_ste_hard_path_grads_finite():
    """Packing composes with the STE hard path (the val-total winner):
    binary out-probs select the packed set exactly; straight-through
    gradients flow through the packed gathers."""
    from topo_audio_autoencoder_tpu.models import AudioAutoencoder

    model = AudioAutoencoder.create(
        num_vertices=8, num_bands=16, sccn_hidden_dim=16, n_sccn_layers=2,
        max_active_vertices=8, hard=True, pack_capacities=(0, 0, 28, 35),
    )
    x = jnp.asarray(
        np.random.default_rng(0).standard_normal((2, 1, 4096)), jnp.float32
    )
    params = model.jit_init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        x,
    )

    @jax.jit
    def loss_fn(p):
        out = model.apply(
            p, x, 1.0, jax.random.PRNGKey(2), True,
            rngs={"dropout": jax.random.PRNGKey(3)},
        )
        return jnp.abs(out.waveform).mean()

    val, grads = jax.value_and_grad(loss_fn)(params)
    assert np.isfinite(float(val))
    assert all(
        np.isfinite(np.asarray(g)).all() for g in jax.tree.leaves(grads)
    )
    # STE: logits must receive gradient through the hard packed latent
    mlp = grads["params"]["encoder"]["mlp2"]["kernel"]
    assert float(jnp.abs(mlp).sum()) > 0
