"""topo_audio_autoencoder_tpu — TPU-native topological audio autoencoder.

A from-scratch JAX/XLA/Pallas framework with the capabilities of the
reference PyTorch repo (Monlarc/topo-audio-autoencoder): a PQMF-multiband
audio autoencoder whose latent space is a simplicial complex, trained with
multiscale spectral + contrastive objectives.

Layers (SURVEY §7 build order):

- ``topology``  — combinatorial tables, closure rectifier, operator builder
- ``ops``       — PQMF filterbank, multiscale STFT, samplers, Pallas kernels
- ``models``    — encoder, SCCN, decoder, autoencoder facade (Flax)
- ``training``  — objective, jitted train/eval steps, trainer shell, Orbax
- ``data``      — preprocessing, on-device distance precompute, datasets
- ``parallel``  — device mesh + data-parallel sharding
- ``utils``     — profiling, debug instrumentation
"""

__version__ = "0.1.0"

from . import topology, ops  # noqa: F401  (lightweight; models import flax lazily)
