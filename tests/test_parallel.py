"""Parallelism tests on the 8-device virtual CPU mesh.

The conftest forces ``--xla_force_host_platform_device_count=8`` — the JAX
idiom for a fake multi-device backend (SURVEY §4 implication (f))."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from topo_audio_autoencoder_tpu.models import AudioAutoencoder
from topo_audio_autoencoder_tpu.parallel import (
    make_mesh,
    pad_to_multiple,
    replicate,
    shard_batch,
)
from topo_audio_autoencoder_tpu.training import (
    anneal_temperature,
    create_train_state,
    make_optimizer,
    make_train_step,
)

T = 2048


def test_mesh_has_8_devices():
    mesh = make_mesh()
    assert mesh.devices.size == 8


def test_pad_to_multiple():
    x = np.ones((5, 3))
    padded, real = pad_to_multiple(x, 4)
    assert padded.shape == (8, 3) and real == 5
    padded2, real2 = pad_to_multiple(x, 5)
    assert padded2.shape == (5, 3) and real2 == 5


@pytest.fixture(scope="module")
def dp_setup():
    mesh = make_mesh()
    model = AudioAutoencoder.create(
        num_vertices=6, num_bands=4, sccn_hidden_dim=16, n_sccn_layers=2
    )
    opt = make_optimizer(accumulate_grad_batches=1)
    state = create_train_state(model, opt, jax.random.PRNGKey(0), (1, 1, T))
    step = make_train_step(model, opt, donate=False)
    return mesh, model, opt, state, step


def test_dp_step_runs_sharded(dp_setup):
    mesh, model, opt, state, step = dp_setup
    batch = jax.random.normal(jax.random.PRNGKey(1), (8, 3, 1, T))
    rep_state = replicate(state, mesh)
    sharded = shard_batch(batch, mesh)
    # batch really is distributed over 8 devices
    assert len(sharded.sharding.device_set) == 8
    with mesh:
        new_state, metrics = step(
            rep_state, sharded, anneal_temperature(0), jax.random.PRNGKey(2)
        )
    assert np.isfinite(float(metrics["total_loss"]))
    # updated params are fully replicated (grad all-reduce happened)
    leaf = jax.tree.leaves(new_state.params)[0]
    assert leaf.sharding.is_fully_replicated


def test_dp_matches_single_device(dp_setup):
    """DP over 8 shards must produce the same loss and updated params as
    the same batch on one device (up to reduction order)."""
    mesh, model, opt, state, step = dp_setup
    batch = jax.random.normal(jax.random.PRNGKey(3), (8, 3, 1, T))
    rng = jax.random.PRNGKey(4)
    temp = anneal_temperature(0)

    single_state, single_metrics = step(state, batch, temp, rng)

    rep_state = replicate(state, mesh)
    sharded = shard_batch(batch, mesh)
    with mesh:
        dp_state, dp_metrics = step(rep_state, sharded, temp, rng)

    np.testing.assert_allclose(
        float(single_metrics["total_loss"]),
        float(dp_metrics["total_loss"]),
        rtol=1e-4,
    )
    # Adam's first update is +-lr * sign(m); reduction-order float noise can
    # flip the sign of near-zero gradients, so params agree only to the
    # learning-rate scale (1e-3), not bitwise.
    for a, b in zip(jax.tree.leaves(single_state.params), jax.tree.leaves(dp_state.params)):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=0.0, atol=2.5e-3
        )


def test_dp_trainer_end_to_end(tmp_path):
    """Trainer with data_parallel=True runs an epoch on the 8-device mesh
    with replicated state."""
    from topo_audio_autoencoder_tpu.data import (
        NSynthDataset, compute_distances, synth_corpus,
    )
    from topo_audio_autoencoder_tpu.training import Trainer, TrainerConfig

    corpus = synth_corpus(16, 1024, seed=1)
    d = compute_distances(corpus, tile=16, scales=(256,))
    train = NSynthDataset(corpus, d["neighbors"], train=True)
    val = NSynthDataset(synth_corpus(8, 1024, seed=2), train=False)
    model = AudioAutoencoder.create(
        num_vertices=4, num_bands=4, sccn_hidden_dim=8, n_sccn_layers=1
    )
    t = Trainer(
        model, train, val,
        config=TrainerConfig(
            checkpoint_dir=str(tmp_path), batch_size=8,
            accumulate_grad_batches=1, max_epochs=1, dump_audio=False,
            with_grad_norms=False, data_parallel=True,
        ),
    )
    metrics = t.train()
    assert len(metrics.train_losses) == 1
    assert np.isfinite(metrics.train_losses[0])
    leaf = jax.tree.leaves(t.state.params)[0]
    assert leaf.sharding.is_fully_replicated
    assert len(leaf.sharding.device_set) == 8


def test_sharded_corpus_gather_matches_plain():
    """Row-sharded corpus + distributed gather (VERDICT r3 #6) assembles
    exactly the batch the replicated-corpus gather would — including
    padded row counts and foreign-shard indices."""
    from topo_audio_autoencoder_tpu.training import make_sharded_corpus_gather

    mesh = make_mesh()
    rng = np.random.default_rng(0)
    corpus = rng.standard_normal((19, 64)).astype(np.float32)  # 19 % 8 != 0
    corpus_dev, gather = make_sharded_corpus_gather(mesh, corpus)
    assert not corpus_dev.sharding.is_fully_replicated
    assert corpus_dev.shape == (24, 64)  # padded to the 8-device multiple

    idx = rng.integers(0, 19, size=(16, 3)).astype(np.int32)
    got = gather(corpus_dev, jnp.asarray(idx))
    want = corpus[idx][:, :, None, :]
    np.testing.assert_array_equal(np.asarray(got), want)
    assert len(got.sharding.device_set) == 8  # batch-sharded result


def test_dp_shard_corpus_matches_replicated(tmp_path):
    """A DP epoch over the row-sharded corpus reproduces the
    replicated-corpus epoch exactly: the assembled batches are
    numerically identical (each row is one chip's exact contribution),
    so the training trajectories match."""
    from topo_audio_autoencoder_tpu.data import (
        NSynthDataset, compute_distances, synth_corpus,
    )
    from topo_audio_autoencoder_tpu.training import Trainer, TrainerConfig

    corpus = synth_corpus(17, 1024, seed=1)  # odd size: exercises padding
    d = compute_distances(corpus, tile=17, scales=(256,))
    losses = {}
    for shard in (False, True):
        train = NSynthDataset(corpus, d["neighbors"], train=True)
        val = NSynthDataset(synth_corpus(8, 1024, seed=2), train=False)
        model = AudioAutoencoder.create(
            num_vertices=4, num_bands=4, sccn_hidden_dim=8, n_sccn_layers=1
        )
        t = Trainer(
            model, train, val,
            config=TrainerConfig(
                checkpoint_dir=str(tmp_path / f"s{shard}"), batch_size=8,
                accumulate_grad_batches=1, max_epochs=1, dump_audio=False,
                with_grad_norms=False, data_parallel=True,
                shard_corpus=shard, scan_steps=2,
            ),
        )
        m = t.train()
        losses[shard] = (m.train_losses[0], m.val_losses[0])
    np.testing.assert_allclose(losses[True], losses[False], rtol=1e-5)


def test_graft_entry_dryrun():
    import sys
    from pathlib import Path

    sys.path.insert(0, str(Path(__file__).resolve().parents[1]))
    import __graft_entry__ as ge

    ge.dryrun_multichip(8)
