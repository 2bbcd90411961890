"""Model layer: encoder, SCCN, decoder, autoencoder facade."""

from .sccn import GradientSCCNLayer, GradientSCCN, JumpingKnowledgeSCCN
from .encoder import (
    AudioEncoder,
    BandEncoder,
    EncoderOutput,
    info_nce_loss,
    triplet_loss,
    vertex_count_penalty,
    rank_diversity_entropy,
)
from .decoder import (
    AudioDecoder,
    CrossAttention,
    MaskedGroupNorm,
    linear_resize,
    masked_linear_resize,
    pack_active,
)
from .autoencoder import AudioAutoencoder, AutoencoderOutput

__all__ = [
    "GradientSCCNLayer",
    "GradientSCCN",
    "JumpingKnowledgeSCCN",
    "AudioEncoder",
    "BandEncoder",
    "EncoderOutput",
    "info_nce_loss",
    "triplet_loss",
    "vertex_count_penalty",
    "rank_diversity_entropy",
    "AudioDecoder",
    "CrossAttention",
    "MaskedGroupNorm",
    "linear_resize",
    "masked_linear_resize",
    "pack_active",
    "AudioAutoencoder",
    "AutoencoderOutput",
]
