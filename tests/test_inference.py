"""Codec inference API tests: latent sufficiency, persistence."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from topo_audio_autoencoder_tpu.inference import (
    Codec,
    load_params,
    pack_latent,
    save_params,
    unpack_latent,
)
from topo_audio_autoencoder_tpu.models import AudioAutoencoder

T = 4096


@pytest.fixture(scope="module")
def setup():
    model = AudioAutoencoder.create(
        num_vertices=6, num_bands=4, sccn_hidden_dim=16, n_sccn_layers=2
    )
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 1, T))
    params = model.init(
        {"params": jax.random.PRNGKey(1), "dropout": jax.random.PRNGKey(2)},
        x, 1.0, jax.random.PRNGKey(3), True,
    )
    return model, params, x


def test_encode_is_binary(setup):
    model, params, x = setup
    lat = Codec(model, params).encode(x)
    for l, s in zip(lat.ranks, model.tables.sizes):
        assert l.shape == (2, s)
        assert set(np.unique(np.asarray(l))) <= {0.0, 1.0}


def test_latent_is_sufficient(setup):
    """Decoding from the latent alone == the full model's eval forward:
    the complex really is the whole code."""
    model, params, x = setup
    codec = Codec(model, params)
    lat = codec.encode(x)
    y = codec.decode(lat, T)
    rec = codec.reconstruct(x)
    np.testing.assert_allclose(np.asarray(y), np.asarray(rec), atol=1e-5)


def test_latent_respects_closure(setup):
    """Encoded latents form valid complexes (every face present)."""
    from topo_audio_autoencoder_tpu.topology import (
        RectifiedProbs, constraint_violations,
    )

    model, params, x = setup
    lat = Codec(model, params).encode(x)
    v = constraint_violations(RectifiedProbs(*lat.ranks), model.tables)
    assert v["edge_zero_face"] == 0.0
    assert v["triangle_zero_face"] == 0.0
    assert v["tetra_zero_face"] == 0.0


def test_latent_bitstream_roundtrip(setup):
    """pack -> unpack is lossless and the wire size is ceil(S_total/8)
    bytes per clip (6 vertices: 6+15+20+15 = 56 bits = 7 bytes)."""
    model, params, x = setup
    codec = Codec(model, params)
    lat = codec.encode(x)
    wire = pack_latent(lat)
    total = sum(model.tables.sizes)
    assert wire.dtype == np.uint8
    assert wire.shape == (2, (total + 7) // 8)
    lat2 = unpack_latent(wire, model.tables.num_vertices)
    for a, b in zip(lat.ranks, lat2.ranks):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # The decoded waveform from the unpacked latent is the decoded
    # waveform from the original latent: the bitstream IS the code.
    np.testing.assert_allclose(
        np.asarray(codec.decode(lat2, T)),
        np.asarray(codec.decode(lat, T)),
        atol=1e-6,
    )


def test_hard_concrete_pack_quantization():
    """Hard Concrete eval probs are continuous; pack_latent binarizes at
    0.5 and Codec.decode re-rectifies, so the packed latent always decodes
    as a valid complex (ADVICE r3: the old > 0 threshold packed any
    barely-open gate to 1.0 and could ship a non-complex)."""
    from topo_audio_autoencoder_tpu.inference import SimplicialLatent
    from topo_audio_autoencoder_tpu.topology import enforce_constraints

    model = AudioAutoencoder.create(
        num_vertices=6, num_bands=4, sccn_hidden_dim=16, n_sccn_layers=2,
        sampler="hard_concrete",
    )
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 1, T))
    params = model.init(
        {"params": jax.random.PRNGKey(1), "dropout": jax.random.PRNGKey(2)},
        x, 1.0, jax.random.PRNGKey(3), True,
    )
    codec = Codec(model, params)
    lat = codec.encode(x)
    vals = np.concatenate([np.asarray(p).ravel() for p in lat.ranks])
    assert ((vals > 0) & (vals < 1)).any(), "HC eval probs should be continuous"

    wire = pack_latent(lat)
    lat2 = unpack_latent(wire, 6)
    for a, b in zip(lat.ranks, lat2.ranks):
        np.testing.assert_array_equal(
            np.asarray(b), (np.asarray(a) >= 0.5).astype(np.float32)
        )
    # Decoding the packed latent == decoding its rectified closure: the
    # internal re-rectification restores validity (and is idempotent).
    rect = enforce_constraints(
        *(jnp.asarray((np.asarray(p) >= 0.5).astype(np.float32)) for p in lat.ranks),
        model.tables,
    )
    y2 = np.asarray(codec.decode(lat2, T))
    y_rect = np.asarray(codec.decode(SimplicialLatent(*rect.ranks), T))
    assert np.isfinite(y2).all()
    np.testing.assert_allclose(y2, y_rect, atol=1e-6)


def test_params_roundtrip(tmp_path, setup):
    model, params, x = setup
    save_params(tmp_path, params)
    p2 = load_params(tmp_path, params)
    for a, b in zip(jax.tree.leaves(params), jax.tree.leaves(p2)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
