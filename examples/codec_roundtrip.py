"""Codec demo: waveform -> 1-bit-per-simplex latent -> bytes -> waveform.

    python examples/codec_roundtrip.py [checkpoint_dir] [--packed]

With a trained checkpoint directory (e.g. a `full_recipe.py --out` run's
`checkpoints/`), encodes a synthetic clip with the trained model; without
one, uses fresh parameters (the pipeline is the point — quality needs
training). `--packed` decodes through the static-capacity packed
operators (topology/packed.py) — exact for the sparse thresholded
latent, with a fraction of the dense decode's FLOPs.

Prints the latent size (775 B per 4 s clip at n=20 — ~1.55 kbit/s vs
125 kB raw PCM16) and the decode's spectral distance to the input.
"""

from __future__ import annotations

import sys

import jax
import jax.numpy as jnp
import numpy as np


def main():
    from topo_audio_autoencoder_tpu.data import synth_corpus
    from topo_audio_autoencoder_tpu.inference import (
        Codec, pack_latent, unpack_latent,
    )
    from topo_audio_autoencoder_tpu.models import AudioAutoencoder
    from topo_audio_autoencoder_tpu.ops.stft import spectral_distance

    ckpt_dir = next((a for a in sys.argv[1:] if not a.startswith("--")), None)
    packed = "--packed" in sys.argv

    geom = {"vertices": 20, "hidden": 64, "layers": 6}
    params = None
    if ckpt_dir:
        from topo_audio_autoencoder_tpu.training.checkpoint import (
            CheckpointManager,
        )

        ck = CheckpointManager(ckpt_dir)
        extra = ck.load_extra("best") or {}
        geom.update(extra.get("model") or {})
        params = ck.restore("best")["params"]
        print(f"loaded 'best' from {ckpt_dir} (n={geom['vertices']})")

    n = geom["vertices"]
    model = AudioAutoencoder.create(
        num_vertices=n,
        sccn_hidden_dim=geom["hidden"],
        n_sccn_layers=geom["layers"],
        max_active_vertices=n,
        pack_capacities=(0, 0, 512, 256) if packed and n >= 32 else None,
    )
    x = jnp.asarray(synth_corpus(1, n_samples=64000, seed=7))[:, None, :]
    if params is None:
        print("no checkpoint given: fresh (untrained) parameters")
        params = model.jit_init(
            {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
            x,
        )

    codec = Codec(model, params)
    latent = codec.encode(x)
    wire = pack_latent(latent)
    print(f"latent: {model.tables.total_simplices} bits -> "
          f"{wire.shape[-1]} bytes per 4 s clip "
          f"(raw PCM16: {2 * x.shape[-1]:,} bytes)")

    decoded = codec.decode(unpack_latent(wire, n), x.shape[-1])
    spec = float(spectral_distance(decoded[:, 0], x[:, 0]).mean())
    print(f"roundtrip spectral distance: {spec:.3f}"
          + ("" if ckpt_dir else "  (untrained — expect large)"))


if __name__ == "__main__":
    main()
