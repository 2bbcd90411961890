"""Config-tree + CLI override + neighbor-explorer tests."""

import numpy as np

from topo_audio_autoencoder_tpu.config import Config
from topo_audio_autoencoder_tpu.data import (
    compute_distances,
    explore_neighbors,
    synth_corpus,
)


def test_config_defaults():
    cfg = Config()
    assert cfg.model.num_vertices == 20
    assert cfg.train.encoder_lr == 1e-3
    assert cfg.grid.encoder_lr == [1e-3, 5e-4]


def test_config_overrides():
    cfg = Config.from_args(
        [
            "model.num_vertices=12",
            "train.batch_size=32",
            "model.hard=true",
            "run_tuning=false",
            "grid.encoder_lr=0.01,0.001",
            "train.compute_dtype=bfloat16",
        ]
    )
    assert cfg.model.num_vertices == 12
    assert cfg.train.batch_size == 32
    assert cfg.model.hard is True
    assert cfg.run_tuning is False
    assert cfg.grid.encoder_lr == [0.01, 0.001]
    assert cfg.train.compute_dtype == "bfloat16"


def test_config_roundtrip_dict():
    d = Config().to_dict()
    assert d["model"]["sccn_hidden_dim"] == 64
    assert d["train"]["patience"] == 20


def test_explore_neighbors(tmp_path):
    corpus = synth_corpus(6, n_samples=1024, seed=3)
    result = compute_distances(corpus, tile=6, scales=(256,))
    out = explore_neighbors(
        corpus,
        result["distances"],
        result["neighbors"],
        index=2,
        out_dir=tmp_path,
        num_neighbors=2,
    )
    assert (out / "original.wav").exists()
    assert len(list((out / "nearest").glob("*.wav"))) == 2
    assert len(list((out / "farthest").glob("*.wav"))) == 2
    # nearest file names carry the smallest distances
    near = sorted((out / "nearest").glob("*.wav"))[0].name
    far = sorted((out / "farthest").glob("*.wav"))[0].name
    d_near = float(near.split("_dist_")[1][:-4])
    d_far = float(far.split("_dist_")[1][:-4])
    assert d_near <= d_far
