"""Data-layer tests: precompute, contrastive dataset, preprocessing."""

import numpy as np
import pytest

from topo_audio_autoencoder_tpu.data import (
    ContrastiveConfig,
    NSynthDataset,
    batch_iterator,
    compute_distance_matrix,
    compute_distances,
    load_distances,
    save_wav,
    load_wav,
    sort_neighbors,
    synth_corpus,
)
from topo_audio_autoencoder_tpu.ops import spectral_distance
import jax.numpy as jnp

T = 2048
SCALES = (512, 256)


@pytest.fixture(scope="module")
def corpus():
    return synth_corpus(12, n_samples=T, seed=0)


def test_distance_matrix_consistency(corpus):
    """Tiled matrix == direct pairwise spectral distances; symmetric."""
    mat = compute_distance_matrix(corpus, tile=5, scales=SCALES)
    assert mat.shape == (12, 12)
    np.testing.assert_allclose(np.diag(mat), 0.0, atol=1e-5)
    np.testing.assert_allclose(mat, mat.T, atol=1e-6)
    for i, j in [(0, 1), (3, 7), (2, 11)]:
        d = float(
            spectral_distance(
                jnp.asarray(corpus[i])[None], jnp.asarray(corpus[j])[None], SCALES
            )[0]
        )
        np.testing.assert_allclose(mat[i, j], d, rtol=1e-3, atol=1e-4)


def test_sort_neighbors_excludes_self():
    d = np.array(
        [[0.0, 2.0, 1.0], [2.0, 0.0, 3.0], [1.0, 3.0, 0.0]], dtype=np.float32
    )
    nb = sort_neighbors(d)
    assert nb.shape == (3, 2)
    np.testing.assert_array_equal(nb[0], [2, 1])
    np.testing.assert_array_equal(nb[1], [0, 2])
    np.testing.assert_array_equal(nb[2], [0, 1])


def test_compute_distances_save_load(tmp_path, corpus):
    path = tmp_path / "d.npz"
    result = compute_distances(corpus, save_path=path, tile=6, scales=SCALES)
    loaded = load_distances(path)
    np.testing.assert_array_equal(result["distances"], loaded["distances"])
    np.testing.assert_array_equal(result["neighbors"], loaded["neighbors"])


def test_dataset_train_stack(corpus):
    nb = sort_neighbors(compute_distance_matrix(corpus, tile=6, scales=SCALES))
    cfg = ContrastiveConfig(num_positive_neighbors=3, num_negative_samples=4)
    ds = NSynthDataset(corpus, nb, train=True, config=cfg)
    item = ds[0]
    assert item.shape == (2 + 4, 1, T)  # anchor + positive + negatives
    np.testing.assert_array_equal(item[0, 0], corpus[0])
    # positive must be one of the 3 nearest neighbors
    pos_candidates = corpus[nb[0, :3]]
    assert any(np.array_equal(item[1, 0], c) for c in pos_candidates)
    # initial epoch: negatives come from the farthest end of the ordering
    far = corpus[nb[0, -4:]]
    for k in range(4):
        assert any(np.array_equal(item[2 + k, 0], c) for c in far)


def test_dataset_curriculum_decay(corpus):
    """set_epoch decays the negative offset x0.90/epoch with a floor
    (nsyth_dataset.py:31-41)."""
    nb = sort_neighbors(compute_distance_matrix(corpus, tile=6, scales=SCALES))
    cfg = ContrastiveConfig(min_negative_offset=5, num_negative_samples=2)
    ds = NSynthDataset(corpus, nb, train=True, config=cfg)
    ds.set_epoch(0)
    assert ds.current_negative_offset == 11  # clamped to N-1
    ds.set_epoch(4)
    assert ds.current_negative_offset == int(12 * 0.9**4)
    ds.set_epoch(100)
    assert ds.current_negative_offset == 5  # floor


def test_dataset_eval_mode(corpus):
    ds = NSynthDataset(corpus, train=False)
    item = ds[3]
    assert item.shape == (1, T)
    np.testing.assert_array_equal(item[0], corpus[3])


def test_batch_iterator_shapes_and_seeding(corpus):
    nb = sort_neighbors(compute_distance_matrix(corpus, tile=6, scales=SCALES))
    ds = NSynthDataset(corpus, nb, train=True)
    b1 = list(batch_iterator(ds, 4, seed=7, epoch=0))
    assert all(b.shape == (4, 12, 1, T) for b in b1)
    assert len(b1) == 3
    # same seed+epoch -> same order of anchors
    ds2 = NSynthDataset(corpus, nb, train=True)
    b2 = list(batch_iterator(ds2, 4, seed=7, epoch=0))
    np.testing.assert_array_equal(b1[0][:, 0], b2[0][:, 0])


def test_sample_batch_indices_semantics(corpus):
    """Vectorized index assembly: anchor col, positive from the top-k
    neighbor set, negatives = the exact curriculum window, deterministic
    under the seed."""
    dists = compute_distances(corpus, tile=6, scales=SCALES)
    cc = ContrastiveConfig(num_positive_neighbors=3, num_negative_samples=4)
    ds = NSynthDataset(corpus, dists["neighbors"], train=True, config=cc)
    ds.set_epoch(0)
    anchors = np.array([0, 5, 9])
    idx = ds.sample_batch_indices(anchors, seed=7)
    assert idx.shape == (3, ds.group_size) and idx.dtype == np.int32
    np.testing.assert_array_equal(idx[:, 0], anchors)
    neg_end = ds.current_negative_offset
    neg_start = neg_end - cc.num_negative_samples
    for row, a in zip(idx, anchors):
        assert row[1] in ds.neighbors[a, :cc.num_positive_neighbors]
        np.testing.assert_array_equal(row[2:], ds.neighbors[a, neg_start:neg_end])
    # seeded determinism
    np.testing.assert_array_equal(idx, ds.sample_batch_indices(anchors, seed=7))
    # eval mode: bare [B, 1] column
    ds_eval = NSynthDataset(corpus, train=False)
    np.testing.assert_array_equal(
        ds_eval.sample_batch_indices(anchors, seed=7), anchors[:, None]
    )


def test_indexed_gather_matches_array_batch(corpus):
    """corpus[idx] on device == host-assembled waveform stacks."""
    dists = compute_distances(corpus, tile=6, scales=SCALES)
    cc = ContrastiveConfig(num_negative_samples=3)
    ds = NSynthDataset(corpus, dists["neighbors"], train=True, config=cc)
    idx = ds.sample_batch_indices(np.array([1, 4]), seed=11)
    gathered = np.asarray(jnp.asarray(corpus)[jnp.asarray(idx)])[:, :, None, :]
    direct = corpus[idx][:, :, None, :]
    np.testing.assert_array_equal(gathered, direct)


def test_prefetch_to_device(corpus):
    from topo_audio_autoencoder_tpu.data import prefetch_to_device

    ds = NSynthDataset(corpus, train=False)
    batches = list(prefetch_to_device(batch_iterator(ds, 4, shuffle=False), 2))
    direct = list(batch_iterator(ds, 4, shuffle=False))
    assert len(batches) == len(direct)
    for a, b in zip(batches, direct):
        np.testing.assert_array_equal(np.asarray(a), b)


def test_wav_roundtrip(tmp_path):
    x = np.sin(np.linspace(0, 100, 4000)).astype(np.float32) * 0.5
    save_wav(tmp_path / "t.wav", x, 16000)
    y = load_wav(tmp_path / "t.wav", 16000)
    assert y.shape == x.shape
    np.testing.assert_allclose(y, x, atol=1e-3)


def test_load_wav_resamples(tmp_path):
    x = np.sin(np.linspace(0, 100, 8000)).astype(np.float32) * 0.5
    save_wav(tmp_path / "t.wav", x, 32000)
    y = load_wav(tmp_path / "t.wav", 16000)
    assert y.shape == (4000,)
