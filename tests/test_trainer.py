"""Trainer-shell integration tests: tiny end-to-end runs on CPU."""

import numpy as np
import pytest

from topo_audio_autoencoder_tpu.data import (
    NSynthDataset,
    compute_distances,
    synth_corpus,
)
from topo_audio_autoencoder_tpu.models import AudioAutoencoder
from topo_audio_autoencoder_tpu.training import Trainer, TrainerConfig

T = 1024
SCALES = (256, 128)


@pytest.fixture(scope="module")
def model():
    return AudioAutoencoder.create(
        num_vertices=4, num_bands=4, sccn_hidden_dim=8, n_sccn_layers=1
    )


@pytest.fixture(scope="module")
def datasets():
    corpus = synth_corpus(8, n_samples=T, seed=1)
    dists = compute_distances(corpus, tile=8, scales=SCALES)
    train = NSynthDataset(corpus, dists["neighbors"], train=True)
    val = NSynthDataset(synth_corpus(4, n_samples=T, seed=2), train=False)
    return train, val


def _config(tmp_path, **kw):
    defaults = dict(
        checkpoint_dir=str(tmp_path),
        batch_size=2,
        accumulate_grad_batches=1,
        max_epochs=2,
        patience=5,
        tuning_epochs=1,
        log_every=2,
        checkpoint_every_iters=0,
        checkpoint_every_epochs=1,
        dump_audio=False,
        with_grad_norms=False,
    )
    defaults.update(kw)
    return TrainerConfig(**defaults)


def test_trainer_end_to_end(tmp_path, model, datasets):
    train, val = datasets
    trainer = Trainer(model, train, val, config=_config(tmp_path))
    metrics = trainer.train()  # no tuning grid
    assert len(metrics.train_losses) == 2
    assert len(metrics.val_losses) == 2
    assert all(np.isfinite(l) for l in metrics.train_losses)
    assert (tmp_path / "best").exists()
    assert (tmp_path / "metrics.json").exists()
    assert (tmp_path / "train_log.jsonl").exists()


def test_trainer_checkpoint_resume(tmp_path, model, datasets):
    train, val = datasets
    t1 = Trainer(model, train, val, config=_config(tmp_path / "a"))
    t1.state = t1.init_state()
    t1.train_epoch(0)
    t1.save_checkpoint("epoch_0")

    t2 = Trainer(model, train, val, config=_config(tmp_path / "a"))
    t2.load_checkpoint("epoch_0")
    import jax

    for a, b in zip(jax.tree.leaves(t1.state), jax.tree.leaves(t2.state)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_trainer_tuner(tmp_path, model, datasets):
    train, val = datasets
    trainer = Trainer(model, train, val, config=_config(tmp_path))
    trainer.state = trainer.init_state()
    best = trainer.tune_hyperparameters(
        {
            "encoder_lr": [1e-3],
            "decoder_lr": [1e-4, 5e-5],
            "complexity_penalty": [0.1],
        }
    )
    assert best is not None
    assert best["decoder_lr"] in (1e-4, 5e-5)
    # per-combo checkpoint dirs exist (trainer.py:199-201)
    assert (tmp_path / "e0.001_d0.0001_c0.1").exists()
    assert (tmp_path / "e0.001_d5e-05_c0.1").exists()
    assert trainer.metrics.best_params == best
