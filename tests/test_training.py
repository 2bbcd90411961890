"""Training-layer tests: loss, optimizer groups, train step, checkpointing.

Small model (6 vertices, 4 bands, T=2048) keeps CPU compiles fast.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from topo_audio_autoencoder_tpu.models import AudioAutoencoder
from topo_audio_autoencoder_tpu.training import (
    CheckpointManager,
    LossWeights,
    TrainingMetrics,
    anneal_temperature,
    autoencoder_loss,
    create_train_state,
    make_eval_step,
    make_optimizer,
    make_train_step,
)

T = 2048


@pytest.fixture(scope="module")
def model():
    return AudioAutoencoder.create(
        num_vertices=6, num_bands=4, sccn_hidden_dim=16, n_sccn_layers=2
    )


@pytest.fixture(scope="module")
def optimizer():
    return make_optimizer(
        encoder_lr=1e-3, decoder_lr=1e-4, accumulate_grad_batches=2
    )


@pytest.fixture(scope="module")
def state(model, optimizer):
    return create_train_state(model, optimizer, jax.random.PRNGKey(0), (1, 1, T))


@pytest.fixture(scope="module")
def stepped(model, optimizer, state):
    """Run 4 micro-steps (2 optimizer applications at accumulation 2)."""
    step = make_train_step(model, optimizer, donate=False)
    batch = jax.random.normal(jax.random.PRNGKey(1), (2, 3, 1, T))
    states = [state]
    metrics = []
    s = state
    for i in range(4):
        s, m = step(s, batch, anneal_temperature(0), jax.random.PRNGKey(i + 2))
        states.append(s)
        metrics.append(m)
    return states, metrics


# ------------------------------------------------------------ loss


def test_autoencoder_loss_components():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((2, 1, T)), dtype=jnp.float32)
    aux = {"binary_entropy": jnp.array([0.1, 0.2]), "diversity": jnp.array([1.0, 2.0])}
    valid = jnp.array([True, True])
    total, comps = autoencoder_loss(x, x, aux, valid, scales=(512, 256))
    # identical recon -> spectral 0; only penalties remain
    np.testing.assert_allclose(float(comps["spectral_loss"]), 0.0, atol=1e-5)
    w = LossWeights()
    expected = (
        w.binary_entropy_penalty * 0.15 + w.complexity_penalty * 1.5
    )
    np.testing.assert_allclose(float(total), expected, rtol=1e-5)


def test_autoencoder_loss_invalid_penalty():
    x = jnp.zeros((2, 1, T))
    y = jnp.ones((2, 1, T))
    aux = {"binary_entropy": jnp.zeros(2), "diversity": jnp.zeros(2)}
    valid = jnp.array([False, False])
    total, comps = autoencoder_loss(y, x, aux, valid, scales=(512,))
    # both samples invalid -> exactly the fixed penalty (trainer.py:278-279)
    np.testing.assert_allclose(float(total), 100.0)
    np.testing.assert_allclose(float(comps["invalid_fraction"]), 1.0)


def test_temperature_anneal():
    assert float(anneal_temperature(0)) == 5.0
    assert float(anneal_temperature(1)) == pytest.approx(4.75)
    assert float(anneal_temperature(500)) == pytest.approx(0.1)


# ------------------------------------------------------------ optimizer


def test_two_lr_groups(model, optimizer, stepped):
    """Encoder and decoder must receive different effective LRs
    (trainer.py:80-87)."""
    states, _ = stepped
    # after the first optimizer application (accumulation 2 -> state[2])
    before, after = states[0].params["params"], states[2].params["params"]

    def mean_update(part):
        num, den = 0.0, 0
        for b, a in zip(jax.tree.leaves(before[part]), jax.tree.leaves(after[part])):
            num += float(jnp.abs(a - b).sum())
            den += b.size
        return num / den

    upd_enc = mean_update("encoder")
    upd_dec = mean_update("decoder")
    assert upd_enc > 0 and upd_dec > 0
    # Adam updates scale ~lr; encoder lr is 10x decoder lr
    assert upd_enc > 2 * upd_dec


def test_flat_groups_optimizer_identical(model, state):
    """flat_groups=True (fused per-group vector Adam) must be numerically
    identical to the tree-form optimizer: same fixed gradient tree through
    both, elementwise-equal params after several applications. (Comparing
    full train steps instead is flaky — the different optimizer graphs
    change XLA fusion inside the *backward*, perturbing grads at 1e-5.)"""
    params = state.params
    keys = jax.random.split(jax.random.PRNGKey(3), len(jax.tree.leaves(params)))
    grads = jax.tree.unflatten(
        jax.tree.structure(params),
        [
            jax.random.normal(k, l.shape, l.dtype) * 0.1
            for k, l in zip(keys, jax.tree.leaves(params))
        ],
    )
    results = []
    for flat in (False, True):
        opt = make_optimizer(
            encoder_lr=1e-3, decoder_lr=1e-4, accumulate_grad_batches=1,
            flat_groups=flat,
        )
        import optax

        s, p = opt.init(params), params
        for _ in range(3):
            u, s = opt.update(grads, s, p)
            p = optax.apply_updates(p, u)
        results.append(p)
    ref, flat = results
    for a, b in zip(jax.tree.leaves(ref), jax.tree.leaves(flat)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_accumulation_applies_every_k(stepped):
    """With accumulation 2, params change only on every 2nd micro-step."""
    states, _ = stepped
    p0 = jax.tree.leaves(states[0].params)[0]
    p1 = jax.tree.leaves(states[1].params)[0]
    p2 = jax.tree.leaves(states[2].params)[0]
    np.testing.assert_array_equal(np.asarray(p0), np.asarray(p1))
    assert not np.array_equal(np.asarray(p1), np.asarray(p2))


def test_metrics_finite_and_complete(stepped):
    _, metrics = stepped
    for m in metrics:
        for k in (
            "total_loss",
            "spectral_loss",
            "binary_entropy_loss",
            "diversity_loss",
            "contrastive_loss",
            "invalid_fraction",
        ):
            assert np.isfinite(float(m[k])), k
        assert "grad_norms" not in m  # disabled by default


def test_grad_norm_telemetry(model, optimizer, state):
    step = make_train_step(model, optimizer, with_grad_norms=True, donate=False)
    batch = jax.random.normal(jax.random.PRNGKey(9), (1, 3, 1, T))
    _, m = step(state, batch, anneal_temperature(0), jax.random.PRNGKey(10))
    gn = m["grad_norms"]
    assert any(k.startswith("encoder/") for k in gn)
    assert any(k.startswith("decoder/") for k in gn)
    assert all(np.isfinite(float(v)) for v in gn.values())


def test_eval_step(model, state):
    ev = make_eval_step(model)
    batch = jax.random.normal(jax.random.PRNGKey(11), (2, 1, T))
    loss, comps = ev(state.params, batch)
    assert np.isfinite(float(loss))
    l2, _ = ev(state.params, batch)
    np.testing.assert_allclose(float(loss), float(l2))  # deterministic


def test_bf16_step_runs(model, state):
    opt = make_optimizer(accumulate_grad_batches=1)
    st = create_train_state(model, opt, jax.random.PRNGKey(12), (1, 1, T))
    step = make_train_step(model, opt, compute_dtype=jnp.bfloat16, donate=False)
    batch = jax.random.normal(jax.random.PRNGKey(13), (1, 3, 1, T))
    st2, m = step(st, batch, anneal_temperature(0), jax.random.PRNGKey(14))
    assert np.isfinite(float(m["total_loss"]))
    # master params stay fp32
    assert jax.tree.leaves(st2.params)[0].dtype == jnp.float32


# ------------------------------------------------------------ checkpoint


def test_checkpoint_roundtrip(tmp_path, state, stepped):
    states, _ = stepped
    ckpt = CheckpointManager(tmp_path)
    ckpt.save("epoch_3", states[3], extra={"encoder_lr": 1e-3})
    restored = ckpt.restore("epoch_3", template=states[3])
    for a, b in zip(jax.tree.leaves(states[3]), jax.tree.leaves(restored)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    assert ckpt.load_extra("epoch_3") == {"encoder_lr": 1e-3}


def test_checkpoint_latest_epoch(tmp_path, state):
    ckpt = CheckpointManager(tmp_path)
    for n in (0, 2, 10):
        ckpt.save(f"epoch_{n}", {"x": jnp.zeros(1)})
    assert ckpt.latest_epoch_name() == "epoch_10"


def test_training_metrics_json(tmp_path):
    m = TrainingMetrics()
    m.train_losses = [1.0, 0.5]
    m.best_params = {"encoder_lr": 1e-3}
    m.save(tmp_path)
    m2 = TrainingMetrics.load(tmp_path)
    assert m2.train_losses == [1.0, 0.5]
    assert m2.best_params == {"encoder_lr": 1e-3}
