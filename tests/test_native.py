"""Native (C++) host runtime tests. Skipped when no toolchain."""

import numpy as np
import pytest

from topo_audio_autoencoder_tpu.data import (
    NSynthDataset,
    batch_iterator,
    save_wav,
    sort_neighbors,
)
from topo_audio_autoencoder_tpu.data.native_loader import (
    _assemble_numpy,
    assemble_contrastive_batch,
    gather_batch,
    load_wav_native,
    native_available,
)

pytestmark = pytest.mark.skipif(
    not native_available(), reason="native library unavailable"
)


@pytest.fixture(scope="module")
def corpus():
    rng = np.random.default_rng(0)
    return rng.standard_normal((20, 256)).astype(np.float32)


@pytest.fixture(scope="module")
def neighbors(corpus):
    rng = np.random.default_rng(1)
    return np.stack(
        [rng.permutation(np.delete(np.arange(20), i))[:19] for i in range(20)]
    ).astype(np.int32)


def test_native_wav_decode(tmp_path):
    x = (np.sin(np.linspace(0, 100, 4000)) * 0.5).astype(np.float32)
    save_wav(tmp_path / "t.wav", x, 16000)
    y = load_wav_native(tmp_path / "t.wav", 8000, 16000)
    assert y.shape == x.shape
    np.testing.assert_allclose(y, x, atol=2e-3)


def test_native_wav_resample(tmp_path):
    x = (np.sin(np.linspace(0, 100, 8000)) * 0.5).astype(np.float32)
    save_wav(tmp_path / "t.wav", x, 32000)
    y = load_wav_native(tmp_path / "t.wav", 16000, 16000)
    assert y.shape == (4000,)


def test_assemble_semantics(corpus, neighbors):
    """Native assembly must match the reference window semantics
    (nsyth_dataset.py:52-62): anchor row 0, positive in top-k, negatives
    exactly the [neg_end-num_neg, neg_end) window."""
    anchors = np.arange(6, dtype=np.int32)
    batch = assemble_contrastive_batch(
        corpus, anchors, neighbors, num_pos=3, num_neg=4, neg_end=19, seed=42
    )
    assert batch.shape == (6, 6, 256)
    for i in range(6):
        np.testing.assert_array_equal(batch[i, 0], corpus[i])
        top = corpus[neighbors[i, :3]]
        assert any(np.array_equal(batch[i, 1], c) for c in top)
        for k in range(4):
            np.testing.assert_array_equal(
                batch[i, 2 + k], corpus[neighbors[i, 15 + k]]
            )


def test_assemble_matches_numpy_fallback(corpus, neighbors):
    """Same windows as the numpy fallback (modulo positive RNG)."""
    anchors = np.arange(4, dtype=np.int32)
    native = assemble_contrastive_batch(
        corpus, anchors, neighbors, 1, 3, 10, seed=7
    )
    ref = _assemble_numpy(corpus, anchors, neighbors, 1, 3, 10, seed=7)
    # num_pos=1 makes the positive deterministic -> full equality
    np.testing.assert_array_equal(native, ref)


def test_gather_batch(corpus):
    out = gather_batch(corpus, np.array([3, 5, 3], dtype=np.int32))
    np.testing.assert_array_equal(out, corpus[[3, 5, 3]])


def test_dataset_native_batch_path(corpus, neighbors):
    ds = NSynthDataset(corpus, neighbors, train=True)
    batches = list(batch_iterator(ds, 5, seed=3, epoch=0))
    assert all(b.shape == (5, 12, 1, 256) for b in batches)
    # anchors deterministic from the shuffle order
    ds2 = NSynthDataset(corpus, neighbors, train=True)
    b2 = list(batch_iterator(ds2, 5, seed=3, epoch=0))
    np.testing.assert_array_equal(batches[0], b2[0])  # fully deterministic
