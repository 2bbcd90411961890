"""Codec CLI round trip: wav -> .tac bitstream -> wav."""

import json

import jax
import numpy as np
import pytest

from topo_audio_autoencoder_tpu.codec_cli import main as cli_main
from topo_audio_autoencoder_tpu.codec_cli import read_tac
from topo_audio_autoencoder_tpu.data.preprocess import load_wav, save_wav
from topo_audio_autoencoder_tpu.inference import (
    Codec,
    save_params,
    unpack_latent,
)
from topo_audio_autoencoder_tpu.models import AudioAutoencoder

T = 4096
GEOM = ["--vertices", "6", "--bands", "4", "--hidden", "16", "--layers", "2"]


@pytest.fixture(scope="module")
def setup(tmp_path_factory):
    root = tmp_path_factory.mktemp("codec_cli")
    model = AudioAutoencoder.create(
        num_vertices=6, num_bands=4, sccn_hidden_dim=16, n_sccn_layers=2,
        max_active_vertices=6,
    )
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 1, T))
    params = model.init(
        {"params": jax.random.PRNGKey(1), "dropout": jax.random.PRNGKey(2)},
        x, 1.0, jax.random.PRNGKey(3), True,
    )
    save_params(root / "params", params)
    wavs = []
    for i in range(2):
        p = root / f"in_{i}.wav"
        save_wav(p, np.asarray(x[i]) * 0.1, 16000)  # headroom for int16
        wavs.append(str(p))
    return model, params, root, wavs


def test_encode_decode_roundtrip(setup, capsys):
    model, params, root, wavs = setup
    tac = root / "clips.tac"
    cli_main(["encode", str(tac), *wavs, "--params", str(root / "params"),
              *GEOM, "--batch", "2", "--clip-samples", str(T)])
    enc_report = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    packed, header = read_tac(tac)
    total = sum(model.tables.sizes)  # 6 + 15 + 20 + 15 = 56 bits
    assert packed.shape == (2, (total + 7) // 8)
    assert enc_report["bytes_per_clip"] == (total + 7) // 8
    assert header["vertices"] == 6 and header["num_samples"] == T

    out_dir = root / "recon"
    cli_main(["decode", str(tac), str(out_dir),
              "--params", str(root / "params"), "--batch", "2"])
    files = sorted(out_dir.glob("in_*.wav"))
    assert len(files) == 2

    # The CLI output must equal a direct Codec decode of the same
    # bitstream (within the wav container's int16 quantization).
    lat = unpack_latent(packed, 6)
    direct = np.asarray(Codec(model, params).decode(lat, T))
    for j, f in enumerate(files):
        got = load_wav(f)
        want = np.clip(direct[j, 0], -1.0, 1.0)
        np.testing.assert_allclose(got, want, atol=2.0 / 32768.0)


def test_sidecar_geometry(setup, capsys, tmp_path):
    """A Trainer-style checkpoint sidecar stamps the model geometry; the
    CLI reads it (no --vertices/... flags needed) and rejects an explicit
    flag that disagrees (VERDICT r3 #8: a silent mismatch decoded
    garbage)."""
    model, params, root, wavs = setup
    from topo_audio_autoencoder_tpu.training.checkpoint import CheckpointManager

    ck = CheckpointManager(tmp_path / "ckpt")
    ck.save(
        "best", {"params": params},
        extra={"model": model.geometry(), "encoder_lr": 1e-3},
    )
    tac = tmp_path / "clips.tac"
    cli_main(["encode", str(tac), wavs[0],
              "--checkpoint", str(tmp_path / "ckpt"),
              "--clip-samples", str(T)])
    capsys.readouterr()
    _, header = read_tac(tac)
    assert header["vertices"] == 6
    assert header["hidden"] == 16 and header["layers"] == 2

    with pytest.raises(SystemExit, match="geometry mismatch"):
        cli_main(["encode", str(tmp_path / "x.tac"), wavs[0],
                  "--checkpoint", str(tmp_path / "ckpt"),
                  "--vertices", "20", "--clip-samples", str(T)])


def test_geometry_learned_hc_stamp():
    """learned_hc roundtrips geometry() -> _resolve_geometry ->
    _build_model, so a learned-stretch checkpoint restores into the right
    module without CLI flags."""
    import argparse

    from topo_audio_autoencoder_tpu.codec_cli import (
        _build_model,
        _resolve_geometry,
    )
    from topo_audio_autoencoder_tpu.models import AudioAutoencoder

    model = AudioAutoencoder.create(
        num_vertices=6, num_bands=4, sccn_hidden_dim=16, n_sccn_layers=2,
        sampler="hard_concrete", learned_hc=True,
    )
    header = dict(model.geometry())
    assert header["learned_hc"] is True
    args = argparse.Namespace(checkpoint=None)
    geom = _resolve_geometry(args, header)
    rebuilt = _build_model(geom)
    assert rebuilt.learned_hc is True and rebuilt.sampler == "hard_concrete"


def test_roundtrip_gran_guard(setup, tmp_path):
    """roundtrip rejects an indivisible --clip-samples up front (ADVICE r3:
    it previously failed opaquely inside the jitted decoder)."""
    model, params, root, wavs = setup
    with pytest.raises(SystemExit, match="divisible"):
        cli_main(["roundtrip", wavs[0], str(tmp_path / "x.wav"),
                  "--params", str(root / "params"), *GEOM,
                  "--clip-samples", "100"])


def test_windowing_arbitrary_length(setup, capsys):
    """A wav longer than the trained clip length is coded as multiple
    windows and reassembled to its original length on decode (the
    encoder MLP only accepts the trained window size)."""
    model, params, root, wavs = setup
    long_wav = root / "long.wav"
    x = np.random.default_rng(5).normal(size=T + T // 2) * 0.1
    save_wav(long_wav, x.astype(np.float32), 16000)

    tac = root / "long.tac"
    cli_main(["encode", str(tac), str(long_wav),
              "--params", str(root / "params"), *GEOM,
              "--clip-samples", str(T)])
    report = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert report["windows"] == 2  # ceil(1.5 windows)
    _, header = read_tac(tac)
    assert header["files"] == [["long", 2, T + T // 2]]

    out_dir = root / "recon_long"
    cli_main(["decode", str(tac), str(out_dir),
              "--params", str(root / "params")])
    got = load_wav(out_dir / "long.wav")
    assert len(got) == T + T // 2
