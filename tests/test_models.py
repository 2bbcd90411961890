"""Model-layer tests: SCCN, encoder, decoder, autoencoder facade."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from topo_audio_autoencoder_tpu.models import (
    AudioAutoencoder,
    GradientSCCN,
    JumpingKnowledgeSCCN,
    info_nce_loss,
    triplet_loss,
    linear_resize,
    masked_linear_resize,
    pack_active,
    vertex_count_penalty,
)
from topo_audio_autoencoder_tpu.topology import (
    build_tables,
    enforce_constraints_flat,
    build_operators,
)

N = 6  # small complex: 6/15/20/15 simplices


@pytest.fixture(scope="module")
def tables():
    return build_tables(N)


@pytest.fixture(scope="module")
def model():
    return AudioAutoencoder.create(
        num_vertices=N, num_bands=4, sccn_hidden_dim=32, n_sccn_layers=2
    )


@pytest.fixture(scope="module")
def params(model):
    x = jnp.zeros((1, 1, 4096))
    return model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        x, 1.0, jax.random.PRNGKey(2), True,
    )


def _random_complex(tables, key, batch=2, zero_frac=0.3):
    probs = jax.random.uniform(key, (batch, tables.total_simplices))
    # sprinkle exact zeros so rectification creates real inactive simplices
    zero = jax.random.bernoulli(jax.random.PRNGKey(9), zero_frac, probs.shape)
    probs = jnp.where(zero, 0.0, probs)
    rect = enforce_constraints_flat(probs, tables)
    masks = tuple((p > 0).astype(jnp.float32) for p in rect.ranks)
    ops = build_operators(rect, tables, masks)
    return rect, ops, masks


# ---------------------------------------------------------------- SCCN


def test_sccn_shapes_and_gradients(tables):
    """Gradient-flow check mirroring reference test_sccn.py:4-65.

    Low zero fraction: every rank must have active simplices, else zero
    grads on that rank's first-layer weights are *correct* (inactive
    simplices have zero features and zero operator rows)."""
    key = jax.random.PRNGKey(0)
    rect, ops, masks = _random_complex(tables, key, zero_frac=0.02)
    assert all(float(m.sum()) > 0 for m in masks), "need active simplices"
    c = 16
    feats = [
        jax.random.normal(jax.random.PRNGKey(r), (2, s, c)) * m[..., None]
        for r, (s, m) in enumerate(zip(tables.sizes, masks))
    ]
    sccn = GradientSCCN(channels=c, max_rank=3, n_layers=4)
    params = sccn.init(jax.random.PRNGKey(1), feats, ops, True)

    def loss(p, fs):
        out = sccn.apply(p, fs, ops, True)
        return sum(o.sum() for o in out)

    val, grads = jax.value_and_grad(loss, argnums=(0, 1))(params, feats)
    assert np.isfinite(float(val))
    leaves = jax.tree.leaves(grads)
    assert all(np.all(np.isfinite(np.asarray(l))) for l in leaves)
    # every parameter receives gradient signal
    pnorms = [float(jnp.abs(l).sum()) for l in jax.tree.leaves(grads[0])]
    assert all(n > 0 for n in pnorms), "vanishing gradient in SCCN params"


def test_sccn_inactive_simplices_do_not_influence_active(tables):
    """Masked-static equivalence: perturbing an inactive simplex's input
    features must not change any active simplex's output."""
    key = jax.random.PRNGKey(3)
    rect, ops, masks = _random_complex(tables, key, batch=1)
    c = 8
    feats = [
        jax.random.normal(jax.random.PRNGKey(10 + r), (1, s, c)) * m[..., None]
        for r, (s, m) in enumerate(zip(tables.sizes, masks))
    ]
    sccn = GradientSCCN(channels=c, max_rank=3, n_layers=2)
    params = sccn.init(jax.random.PRNGKey(4), feats, ops, True)
    out0 = sccn.apply(params, feats, ops, True)

    # find an inactive edge and perturb its features
    edge_mask = np.asarray(masks[1][0])
    inactive = np.where(edge_mask == 0)[0]
    if len(inactive) == 0:
        pytest.skip("random complex had no inactive edges")
    feats2 = list(feats)
    feats2[1] = feats[1].at[0, inactive[0]].add(100.0)
    out1 = sccn.apply(params, feats2, ops, True)
    for r in range(4):
        m = np.asarray(masks[r][0]) > 0
        np.testing.assert_allclose(
            np.asarray(out0[r][0])[m], np.asarray(out1[r][0])[m],
            rtol=1e-5, atol=1e-5,
        )


def test_sccn_layer_matches_naive_messages(tables):
    """The hoisted shared-product layer must equal the naive per-message
    form (dense adjacency / separate incidence products)."""
    from topo_audio_autoencoder_tpu.models import GradientSCCNLayer
    from topo_audio_autoencoder_tpu.topology import dense_adjacency

    key = jax.random.PRNGKey(21)
    rect, ops, masks = _random_complex(tables, key, batch=1, zero_frac=0.1)
    c = 8
    feats = [
        jax.random.normal(jax.random.PRNGKey(30 + r), (1, s, c))
        for r, s in enumerate(tables.sizes)
    ]
    layer = GradientSCCNLayer(channels=c, max_rank=3, is_final_layer=True)
    params = layer.init(jax.random.PRNGKey(31), feats, ops, True)
    out = layer.apply(params, feats, ops, True)

    p = params["params"]
    scales = {k: p[f"scale_{k}"] for k in ("same", "low_to_high", "high_to_low")}
    for rank in range(4):
        msgs = []
        w_s = p[f"same_rank_{rank}"]
        adj = dense_adjacency(ops, rank)
        msgs.append(adj @ (feats[rank] @ w_s) * scales["same"] + feats[rank])
        if rank < 3:
            w_h = p[f"high_to_low_{rank}"]
            inc = ops.incidence(rank + 1)
            msgs.append(inc @ (feats[rank + 1] @ w_h) * scales["high_to_low"] + feats[rank])
        if rank > 0:
            w_l = p[f"low_to_high_{rank}"]
            inc_t = jnp.swapaxes(ops.incidence(rank), -1, -2)
            msgs.append(inc_t @ (feats[rank - 1] @ w_l) * scales["low_to_high"] + feats[rank])
        stacked = jnp.stack(msgs)
        h = jax.nn.gelu(stacked @ p[f"attn_w1_{rank}"] + p[f"attn_b1_{rank}"])
        score = h @ p[f"attn_w2_{rank}"]
        attn = jax.nn.softmax(score, axis=0)
        expected = (stacked * attn).sum(axis=0)
        np.testing.assert_allclose(
            np.asarray(out[rank]), np.asarray(expected), rtol=2e-4, atol=2e-5
        )


def test_jumping_knowledge_sccn(tables):
    key = jax.random.PRNGKey(5)
    rect, ops, masks = _random_complex(tables, key, batch=2)
    c = 8
    feats = [
        jax.random.normal(jax.random.PRNGKey(20 + r), (2, s, c))
        for r, s in enumerate(tables.sizes)
    ]
    jk = JumpingKnowledgeSCCN(channels=c, max_rank=3, n_layers=2)
    params = jk.init(jax.random.PRNGKey(6), feats, ops, True)
    out = jk.apply(params, feats, ops, True)
    for r in range(4):
        assert out[r].shape == (2, tables.sizes[r], c)
        assert np.all(np.isfinite(np.asarray(out[r])))


# ---------------------------------------------------------------- helpers


def test_linear_resize_matches_expected():
    # doubling [0, 1] with align_corners=False -> [0, 0.25, 0.75, 1]
    x = jnp.array([[0.0], [1.0]])[None]  # [1, 2, 1]
    y = np.asarray(linear_resize(x, 4))[0, :, 0]
    np.testing.assert_allclose(y, [0.0, 0.25, 0.75, 1.0], atol=1e-6)


def test_masked_linear_resize_ignores_tail():
    """Resizing with valid_len=k must equal resizing x[:, :k] directly."""
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((1, 10, 3)), dtype=jnp.float32)
    k = 4
    out_masked = masked_linear_resize(x, jnp.array([k]), 8)
    out_direct = linear_resize(x[:, :k], 8)
    np.testing.assert_allclose(
        np.asarray(out_masked), np.asarray(out_direct), rtol=1e-5, atol=1e-6
    )


def test_pack_active():
    feats = jnp.arange(12, dtype=jnp.float32).reshape(1, 4, 3)
    mask = jnp.array([[0.0, 1.0, 0.0, 1.0]])
    packed, count = pack_active(feats, mask)
    assert int(count[0]) == 2
    np.testing.assert_allclose(np.asarray(packed[0, 0]), [3, 4, 5])
    np.testing.assert_allclose(np.asarray(packed[0, 1]), [9, 10, 11])
    np.testing.assert_allclose(np.asarray(packed[0, 2:]), 0.0)


# ---------------------------------------------------------------- losses


def test_info_nce_prefers_positive():
    key = jax.random.PRNGKey(0)
    anchor = jax.random.normal(key, (2, 1, 32))
    sim = jnp.concatenate([anchor, anchor + 0.01, -anchor, anchor * -0.5 + 1.0], axis=1)
    dissim = jnp.concatenate(
        [anchor, -anchor, anchor + 0.01, anchor * 0.99], axis=1
    )
    assert float(info_nce_loss(sim)) < float(info_nce_loss(dissim))


def test_triplet_loss_zero_when_separated():
    anchor = jnp.ones((1, 1, 8))
    logits = jnp.concatenate([anchor, anchor, anchor + 100.0], axis=1)
    assert float(triplet_loss(logits)) == 0.0


def test_vertex_count_penalty():
    p = jnp.array([[1.0] * 4 + [0.0] * 4])
    assert float(vertex_count_penalty(p, 8, 20)[0]) == 4.0  # under min
    assert float(vertex_count_penalty(p, 2, 3)[0]) == 1.0  # over max
    assert float(vertex_count_penalty(p, 2, 8)[0]) == 0.0


# ---------------------------------------------------------------- end to end


def test_autoencoder_roundtrip_shapes(model, params):
    x = jax.random.normal(jax.random.PRNGKey(7), (2, 1, 4096))
    out = model.apply(
        params, x, 1.0, jax.random.PRNGKey(8), True,
        rngs={"dropout": jax.random.PRNGKey(9)},
    )
    assert out.waveform.shape == x.shape
    assert out.valid.shape == (2,)
    assert set(out.aux) == {"binary_entropy", "diversity", "l0"}
    assert np.all(np.isfinite(np.asarray(out.waveform)))


def test_autoencoder_eval_deterministic(model, params):
    x = jax.random.normal(jax.random.PRNGKey(10), (1, 1, 4096))
    o1 = model.apply(params, x, 1.0, None, False)
    o2 = model.apply(params, x, 1.0, None, False)
    np.testing.assert_array_equal(np.asarray(o1.waveform), np.asarray(o2.waveform))
    # eval masks are binary and rectified: a valid complex
    masks = o1.encoder_output.masks
    for m in masks:
        assert set(np.unique(np.asarray(m))) <= {0.0, 1.0}


def test_autoencoder_grads_finite(model, params):
    x = jax.random.normal(jax.random.PRNGKey(11), (1, 1, 4096))

    def loss_fn(p):
        o = model.apply(
            p, x, 1.0, jax.random.PRNGKey(12), True,
            rngs={"dropout": jax.random.PRNGKey(13)},
        )
        return (
            jnp.mean((o.waveform - x) ** 2)
            + o.aux["binary_entropy"].mean()
            + o.aux["diversity"].mean()
        )

    g = jax.grad(loss_fn)(params)
    assert all(np.all(np.isfinite(np.asarray(l))) for l in jax.tree.leaves(g))


def test_autoencoder_jit_compiles(model, params):
    x = jax.random.normal(jax.random.PRNGKey(14), (1, 1, 4096))

    @jax.jit
    def fwd(p, x):
        return model.apply(p, x, 1.0, None, False).waveform

    y1 = fwd(params, x)
    y2 = fwd(params, x)  # cached path
    np.testing.assert_array_equal(np.asarray(y1), np.asarray(y2))


def test_hard_path_model(tables):
    model = AudioAutoencoder.create(
        num_vertices=N, num_bands=4, sccn_hidden_dim=32, n_sccn_layers=2,
        hard=True,
    )
    x = jax.random.normal(jax.random.PRNGKey(15), (1, 1, 4096))
    params = model.init(
        {"params": jax.random.PRNGKey(16), "dropout": jax.random.PRNGKey(17)},
        x, 1.0, jax.random.PRNGKey(18), True,
    )
    out = model.apply(
        params, x, 1.0, jax.random.PRNGKey(19), True,
        rngs={"dropout": jax.random.PRNGKey(20)},
    )
    # hard path: forward probabilities are binary up to the STE's float
    # non-associativity (l + (h - l) reproduces h only to ~1 ulp; the
    # reference's torch arithmetic has the identical artifact)
    for p in out.encoder_output.probs.ranks:
        v = np.asarray(p)
        assert np.all(np.isclose(v, 0.0, atol=1e-5) | np.isclose(v, 1.0, atol=1e-5))

    # gradients flow through the STE
    def loss_fn(p):
        o = model.apply(
            p, x, 1.0, jax.random.PRNGKey(19), True,
            rngs={"dropout": jax.random.PRNGKey(20)},
        )
        return jnp.mean((o.waveform - x) ** 2)

    g = jax.grad(loss_fn)(params)
    enc_grads = jax.tree.leaves(g["params"]["encoder"])
    assert all(np.all(np.isfinite(np.asarray(l))) for l in enc_grads)
    total = sum(float(jnp.abs(l).sum()) for l in enc_grads)
    assert total > 0, "no gradient reached the encoder through the STE"


# ---------------------------------------------------------- Hard Concrete


@pytest.fixture(scope="module")
def hc_model():
    return AudioAutoencoder.create(
        num_vertices=N, num_bands=4, sccn_hidden_dim=32, n_sccn_layers=2,
        sampler="hard_concrete",
    )


@pytest.fixture(scope="module")
def hc_params(hc_model):
    x = jnp.zeros((1, 1, 4096))
    return hc_model.init(
        {"params": jax.random.PRNGKey(40), "dropout": jax.random.PRNGKey(41)},
        x, 1.0, jax.random.PRNGKey(42), True,
    )


def test_hard_concrete_soft_path_is_valid_complex(hc_model, hc_params, tables):
    """HC relaxation -> rectify must satisfy closure + geomean dominance."""
    from topo_audio_autoencoder_tpu.topology import constraint_violations

    x = jax.random.normal(jax.random.PRNGKey(43), (2, 1, 4096))
    out = hc_model.apply(
        hc_params, x, 1.0, jax.random.PRNGKey(44), True,
        rngs={"dropout": jax.random.PRNGKey(45)},
    )
    probs = out.encoder_output.probs
    # HC gates live in [0, 1] and hit the boundaries with positive prob
    for p in probs.ranks:
        v = np.asarray(p)
        assert np.all(v >= 0.0) and np.all(v <= 1.0)
    viol = constraint_violations(probs, tables)
    assert all(v < 1e-5 for v in viol.values()), viol
    # the L0 term is populated (not the Gumbel zero-stub) and finite
    l0 = np.asarray(out.aux["l0"])
    assert l0.shape == (2,) and np.all(np.isfinite(l0)) and np.all(l0 > 0)


def test_hard_concrete_eval_deterministic(hc_model, hc_params):
    x = jax.random.normal(jax.random.PRNGKey(46), (1, 1, 4096))
    o1 = hc_model.apply(hc_params, x, 1.0, None, False)
    o2 = hc_model.apply(hc_params, x, 1.0, None, False)
    np.testing.assert_array_equal(np.asarray(o1.waveform), np.asarray(o2.waveform))


def test_hard_concrete_gradients_flow(hc_model, hc_params):
    """Backward through HC relaxation + rectifier reaches the encoder,
    including through the expected-L0 sparsity term."""
    x = jax.random.normal(jax.random.PRNGKey(47), (1, 1, 4096))

    def loss_fn(p):
        o = hc_model.apply(
            p, x, 1.0, jax.random.PRNGKey(48), True,
            rngs={"dropout": jax.random.PRNGKey(49)},
        )
        return jnp.mean((o.waveform - x) ** 2) + 0.01 * o.aux["l0"].mean()

    g = jax.grad(loss_fn)(hc_params)
    enc_grads = jax.tree.leaves(g["params"]["encoder"])
    assert all(np.all(np.isfinite(np.asarray(l))) for l in enc_grads)
    assert sum(float(jnp.abs(l).sum()) for l in enc_grads) > 0


def test_learned_hc_init_matches_fixed_stretch(tables):
    """learned_hc at its inits (beta=2/3, gamma=-0.1, zeta=1.1) must
    reproduce the fixed-stretch sampler exactly — the learned stretch is a
    strict generalization (reference README.md:15-18's 'learned
    temperature/gamma/zeta', absent from the reference code)."""
    kw = dict(
        num_vertices=N, num_bands=4, sccn_hidden_dim=32, n_sccn_layers=2,
        sampler="hard_concrete", use_fused_sampler=False,
    )
    fixed = AudioAutoencoder.create(**kw)
    learned = AudioAutoencoder.create(**kw, learned_hc=True)
    x = jax.random.normal(jax.random.PRNGKey(60), (2, 1, 4096))
    rngs = {"params": jax.random.PRNGKey(61), "dropout": jax.random.PRNGKey(62)}
    pf = fixed.init(rngs, x, 2.0 / 3.0, jax.random.PRNGKey(63), True)
    pl = learned.init(rngs, x, 1.0, jax.random.PRNGKey(63), True)
    for r in ("hc_beta_raw", "hc_gamma_raw", "hc_zeta_raw"):
        assert r in pl["params"]["encoder"], pl["params"]["encoder"].keys()
    of = fixed.apply(
        pf, x, 2.0 / 3.0, jax.random.PRNGKey(64), True,
        rngs={"dropout": jax.random.PRNGKey(65)},
    )
    ol = learned.apply(
        pl, x, 123.0, jax.random.PRNGKey(64), True,  # temp arg must be ignored
        rngs={"dropout": jax.random.PRNGKey(65)},
    )
    for a, b in zip(of.encoder_output.probs.ranks, ol.encoder_output.probs.ranks):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)
    np.testing.assert_allclose(
        np.asarray(of.aux["l0"]), np.asarray(ol.aux["l0"]), atol=1e-6
    )


def test_learned_hc_stretch_gets_gradients(tables):
    """The learned beta/gamma/zeta must receive nonzero, finite gradients
    through both the reconstruction and the expected-L0 term."""
    model = AudioAutoencoder.create(
        num_vertices=N, num_bands=4, sccn_hidden_dim=32, n_sccn_layers=2,
        sampler="hard_concrete", learned_hc=True, use_fused_sampler=False,
    )
    x = jax.random.normal(jax.random.PRNGKey(66), (1, 1, 4096))
    params = model.init(
        {"params": jax.random.PRNGKey(67), "dropout": jax.random.PRNGKey(68)},
        x, 1.0, jax.random.PRNGKey(69), True,
    )

    def loss_fn(p):
        o = model.apply(
            p, x, 1.0, jax.random.PRNGKey(70), True,
            rngs={"dropout": jax.random.PRNGKey(71)},
        )
        return jnp.mean((o.waveform - x) ** 2) + 0.01 * o.aux["l0"].mean()

    g = jax.grad(loss_fn)(params)["params"]["encoder"]
    for r in ("hc_beta_raw", "hc_gamma_raw", "hc_zeta_raw"):
        v = np.asarray(g[r])
        assert v.shape == (4,) and np.all(np.isfinite(v))
        assert np.abs(v).sum() > 0, f"no gradient reached {r}"


def test_learned_hc_requires_hard_concrete():
    model = AudioAutoencoder.create(
        num_vertices=N, num_bands=4, sccn_hidden_dim=32, n_sccn_layers=2,
        sampler="gumbel", learned_hc=True,
    )
    with pytest.raises(ValueError, match="learned_hc"):
        model.init(
            {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
            jnp.zeros((1, 1, 4096)), 1.0, jax.random.PRNGKey(2), True,
        )


def test_hard_concrete_hard_ste_path(tables):
    """sampler=hard_concrete + hard=True: binary forward, STE backward."""
    model = AudioAutoencoder.create(
        num_vertices=N, num_bands=4, sccn_hidden_dim=32, n_sccn_layers=2,
        sampler="hard_concrete", hard=True,
    )
    x = jax.random.normal(jax.random.PRNGKey(50), (1, 1, 4096))
    params = model.init(
        {"params": jax.random.PRNGKey(51), "dropout": jax.random.PRNGKey(52)},
        x, 1.0, jax.random.PRNGKey(53), True,
    )
    out = model.apply(
        params, x, 1.0, jax.random.PRNGKey(54), True,
        rngs={"dropout": jax.random.PRNGKey(55)},
    )
    for p in out.encoder_output.probs.ranks:
        v = np.asarray(p)
        assert np.all(np.isclose(v, 0.0, atol=1e-5) | np.isclose(v, 1.0, atol=1e-5))

    def loss_fn(p):
        o = model.apply(
            p, x, 1.0, jax.random.PRNGKey(54), True,
            rngs={"dropout": jax.random.PRNGKey(55)},
        )
        return jnp.mean((o.waveform - x) ** 2)

    g = jax.grad(loss_fn)(params)
    enc_grads = jax.tree.leaves(g["params"]["encoder"])
    assert all(np.all(np.isfinite(np.asarray(l))) for l in enc_grads)
    assert sum(float(jnp.abs(l).sum()) for l in enc_grads) > 0


def test_invalid_sampler_rejected(tables):
    model = AudioAutoencoder.create(
        num_vertices=N, num_bands=4, sccn_hidden_dim=32, n_sccn_layers=2,
        sampler="nonsense",
    )
    with pytest.raises(ValueError, match="sampler"):
        model.init(
            {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
            jnp.zeros((1, 1, 4096)), 1.0, jax.random.PRNGKey(2), True,
        )


def test_bf16_policy_survives_strong_f32_temperature():
    """anneal_temperature returns a strongly-typed f32 scalar; dividing by
    it used to silently promote the sampled probs — and every downstream
    consumer (embeddings, SCCN, decoder, attention) — to f32 under the
    bf16 compute policy. The samplers must keep the logits dtype."""
    import jax.numpy as jnp

    from topo_audio_autoencoder_tpu.training import anneal_temperature
    from topo_audio_autoencoder_tpu.training.train_step import _cast_tree

    model = AudioAutoencoder.create(
        num_vertices=6, num_bands=4, sccn_hidden_dim=16, n_sccn_layers=1
    )
    x32 = jnp.zeros((1, 1, 2048), jnp.float32)
    params = model.jit_init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        x32, 1.0, jax.random.PRNGKey(2), True,
    )
    cast = _cast_tree(params, jnp.bfloat16)
    temp = anneal_temperature(3)
    assert jnp.asarray(temp).dtype == jnp.float32  # the hazardous input
    for sampler, hard in (("gumbel", False), ("gumbel", True), ("hard_concrete", False)):
        m = model.replace(sampler=sampler, hard=hard) if hasattr(model, "replace") else model
        enc = m.apply(
            cast, x32.astype(jnp.bfloat16), temp, jax.random.PRNGKey(3), True,
            rngs={"dropout": jax.random.PRNGKey(4)},
            method=lambda mm, a, t, r, tr: mm.encode(a, t, r, tr),
        )
        assert enc.probs.vertices.dtype == jnp.bfloat16, (sampler, hard)
        assert enc.embeddings[0].dtype == jnp.bfloat16, (sampler, hard)


def test_sccn_layer_fused_flag_consistency(tables):
    """fused_combine=True (jnp fallback off-TPU goes through the same
    wrapper) and the explicit reference give identical layer outputs."""
    key = jax.random.PRNGKey(77)
    rect, ops, masks = _random_complex(tables, key, batch=1)
    c = 8
    feats = [
        jax.random.normal(jax.random.PRNGKey(40 + r), (1, s, c))
        for r, s in enumerate(tables.sizes)
    ]
    from topo_audio_autoencoder_tpu.models import GradientSCCNLayer

    l_f = GradientSCCNLayer(channels=c, max_rank=3, fused_combine=True)
    l_r = GradientSCCNLayer(channels=c, max_rank=3, fused_combine=False)
    params = l_f.init(jax.random.PRNGKey(41), feats, ops, True)
    out_f = l_f.apply(params, feats, ops, True)
    out_r = l_r.apply(params, feats, ops, True)
    for a, b_ in zip(out_f, out_r):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_), rtol=1e-6)
