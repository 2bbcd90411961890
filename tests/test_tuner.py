"""Vmapped grid tuner tests."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from topo_audio_autoencoder_tpu.data import (
    NSynthDataset,
    batch_iterator,
    compute_distances,
    index_iterator,
    synth_corpus,
)
from topo_audio_autoencoder_tpu.models import AudioAutoencoder
from topo_audio_autoencoder_tpu.training import VmappedGridTuner

T = 1024


@pytest.fixture(scope="module")
def setup():
    corpus = synth_corpus(6, T, seed=1)
    d = compute_distances(corpus, tile=6, scales=(256,))
    train = NSynthDataset(corpus, d["neighbors"], train=True)
    val = NSynthDataset(synth_corpus(4, T, seed=2), train=False)
    model = AudioAutoencoder.create(
        num_vertices=4, num_bands=4, sccn_hidden_dim=8, n_sccn_layers=1
    )
    return model, train, val


def test_vmapped_tuner_selects_best(setup):
    model, train, val = setup
    tuner = VmappedGridTuner(model)
    grid = {
        "encoder_lr": [1e-3, 5e-4],
        "decoder_lr": [1e-4],
        "complexity_penalty": [0.05, 0.1],
    }
    result = tuner.tune(
        grid,
        train_batches=lambda e: batch_iterator(train, 2, epoch=e),
        val_batches=lambda: batch_iterator(val, 2, shuffle=False),
        epochs=1,
    )
    assert len(result["val_losses"]) == 4
    assert all(np.isfinite(v) for v in result["val_losses"])
    assert result["best_index"] == int(np.argmin(result["val_losses"]))
    bp = result["best_params"]
    assert bp["encoder_lr"] in grid["encoder_lr"]
    assert bp["decoder_lr"] in grid["decoder_lr"]
    assert bp["complexity_penalty"] in grid["complexity_penalty"]


def test_trainer_vmapped_tuning(setup, tmp_path):
    """Trainer integration: vmapped tuning selects a combo and adopts its
    trained parameters."""
    from topo_audio_autoencoder_tpu.training import Trainer, TrainerConfig

    model, train, val = setup
    trainer = Trainer(
        model, train, val,
        config=TrainerConfig(
            checkpoint_dir=str(tmp_path), batch_size=2,
            accumulate_grad_batches=1, tuning_epochs=1,
            dump_audio=False, with_grad_norms=False,
        ),
    )
    best = trainer.tune_hyperparameters_vmapped(
        {"encoder_lr": [1e-3, 5e-4], "decoder_lr": [1e-4],
         "complexity_penalty": [0.1]}
    )
    assert best is not None
    assert trainer.metrics.best_params == best
    assert trainer.state is not None
    # adopted params are a single (unstacked) tree: same shapes as a
    # fresh single-model init, not K-stacked
    fresh = trainer.init_state()
    for a, b in zip(
        jax.tree.leaves(trainer.state.params), jax.tree.leaves(fresh.params)
    ):
        assert a.shape == b.shape
    assert (tmp_path / "best_tuning").exists()


def test_indexed_tune_matches_array_path(setup):
    """Device-corpus tuning (index batches + HBM gather) must reproduce
    the array path exactly: the iterators share sampling seeds, so the
    gathered waveforms — and therefore every grid step — are identical."""
    model, train, val = setup
    grid = {
        "encoder_lr": [1e-3, 5e-4],
        "decoder_lr": [1e-4],
        "complexity_penalty": [0.1],
    }
    kw = dict(epochs=1, seed=3)
    res_arr = VmappedGridTuner(model).tune(
        grid,
        train_batches=lambda e: batch_iterator(train, 2, epoch=e),
        val_batches=lambda: batch_iterator(val, 2, shuffle=False),
        **kw,
    )
    res_idx = VmappedGridTuner(model).tune(
        grid,
        train_batches=lambda e: index_iterator(train, 2, epoch=e),
        val_batches=lambda: index_iterator(val, 2, shuffle=False),
        corpus=train.waveforms,
        val_corpus=val.waveforms,
        **kw,
    )
    np.testing.assert_allclose(
        res_idx["val_losses"], res_arr["val_losses"], rtol=1e-5
    )
    assert res_idx["best_index"] == res_arr["best_index"]


def test_scanned_tune_matches_per_step(setup):
    """Scanned tuning (k grid steps per dispatch, PRNG key carried in the
    scan) follows the per-step indexed path's trajectory: the key is
    split in the same order, so every step consumes the same batch and
    sampler noise. The FIRST step must agree to float-noise (semantic
    equivalence); later steps only loosely — the scanned program fuses
    differently, and a 1-ulp difference through the stochastic binarizer
    can flip a discrete sample and macroscopically (but legitimately)
    perturb the trajectory (same chaos tolerance as the trainer's
    test_scanned_epoch_matches_per_step)."""
    model, train, val = setup
    grid = {
        "encoder_lr": [1e-3],
        "decoder_lr": [1e-4],
        "complexity_penalty": [0.05, 0.1],
    }
    kw = dict(
        train_batches=lambda e: index_iterator(train, 2, epoch=e),
        val_batches=lambda: index_iterator(val, 2, shuffle=False),
        corpus=train.waveforms,
        val_corpus=val.waveforms,
        epochs=2,
        seed=7,
    )
    res_step = VmappedGridTuner(model).tune(grid, **kw)
    res_scan = VmappedGridTuner(model).tune(grid, scan_steps=2, **kw)
    assert len(res_scan["train_curve"]) == len(res_step["train_curve"])
    np.testing.assert_allclose(
        res_scan["train_curve"][0], res_step["train_curve"][0], rtol=1e-5
    )  # same semantics
    np.testing.assert_allclose(
        res_scan["train_curve"], res_step["train_curve"], rtol=1.5e-1
    )  # same trajectory, chaos tolerance (measured max divergence 6.7%)
    np.testing.assert_allclose(
        res_scan["val_losses"], res_step["val_losses"], rtol=1.5e-1
    )


def test_tuner_dp_matches_single_device(setup):
    """Vmapped tuning under a data-parallel mesh (VERDICT r3 #3): grid
    state replicated, batch sharded on its batch dim, same losses and
    updates as single-device (up to reduction order — same tolerances as
    test_parallel.test_dp_matches_single_device)."""
    from topo_audio_autoencoder_tpu.parallel import make_mesh, shard_batch

    model, train, val = setup
    mesh = make_mesh(2)
    grid = {
        "encoder_lr": [1e-3, 5e-4],
        "decoder_lr": [1e-4],
        "complexity_penalty": [0.1],
    }
    t1 = VmappedGridTuner(model)
    tdp = VmappedGridTuner(model, mesh=mesh)
    state1 = t1.init_grid(grid, (1, 1, T))
    statedp = tdp.init_grid(grid, (1, 1, T))
    leaf = jax.tree.leaves(statedp.params)[0]
    assert leaf.sharding.is_fully_replicated

    batch = jnp.asarray(next(iter(batch_iterator(train, 2))))
    rngs = jax.random.split(jax.random.PRNGKey(0), 2)
    s1, l1 = t1.grid_step(state1, batch, jnp.asarray(1.0), rngs)
    sdp, ldp = tdp.grid_step(
        statedp, shard_batch(batch, mesh), jnp.asarray(1.0), rngs
    )
    np.testing.assert_allclose(np.asarray(l1), np.asarray(ldp), rtol=1e-4)
    leaf = jax.tree.leaves(sdp.params)[0]
    assert leaf.sharding.is_fully_replicated  # grad all-reduce happened
    for a, b in zip(jax.tree.leaves(s1.params), jax.tree.leaves(sdp.params)):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=0.0, atol=2.5e-3
        )


def test_tuner_dp_full_tune_scanned(setup):
    """The whole DP tune pipeline — device corpus replicated over the
    mesh, scanned grid steps on sharded index segments, sharded val —
    runs and returns finite per-combo losses."""
    from topo_audio_autoencoder_tpu.parallel import make_mesh

    model, train, val = setup
    mesh = make_mesh(2)
    grid = {
        "encoder_lr": [1e-3],
        "decoder_lr": [1e-4],
        "complexity_penalty": [0.05, 0.1],
    }
    res = VmappedGridTuner(model, mesh=mesh).tune(
        grid,
        train_batches=lambda e: index_iterator(train, 2, epoch=e),
        val_batches=lambda: index_iterator(val, 2, shuffle=False),
        corpus=train.waveforms,
        val_corpus=val.waveforms,
        epochs=1,
        seed=3,
        scan_steps=2,
    )
    assert all(np.isfinite(v) for v in res["val_losses"])
    leaf = jax.tree.leaves(res["state"].params)[0]
    assert leaf.sharding.is_fully_replicated


def test_vmapped_combos_diverge(setup):
    """Different LRs must actually produce different parameters."""
    model, train, val = setup
    tuner = VmappedGridTuner(model)
    grid = {
        "encoder_lr": [1e-2, 1e-5],
        "decoder_lr": [1e-4],
        "complexity_penalty": [0.1],
    }
    state = tuner.init_grid(grid, (1, 1, T))
    batch = jnp.asarray(next(iter(batch_iterator(train, 2))))
    rngs = jax.random.split(jax.random.PRNGKey(0), 2)
    # both combos start from *different seeds* already; check the update
    # magnitude tracks the LR by measuring param movement per combo
    # grid_step donates the state, so snapshot the before-values to host
    leaf_b = np.asarray(
        jax.tree.leaves(state.params["params"]["encoder"])[0]
    ).copy()
    state2, losses = tuner.grid_step(state, batch, jnp.asarray(1.0), rngs)
    leaf_a = jax.tree.leaves(state2.params["params"]["encoder"])[0]
    moved = np.abs(np.asarray(leaf_a) - np.asarray(leaf_b)).reshape(2, -1).mean(1)
    assert moved[0] > moved[1] * 10  # 1e-2 lr moves much more than 1e-5
