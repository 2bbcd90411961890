"""Signal + sampling ops: PQMF filterbank, multiscale STFT, samplers, kernels."""

from .pqmf import PQMF, design_prototype
from .stft import (
    DEFAULT_SCALES,
    multiscale_stft,
    stft_magnitude,
    spectral_distance,
    spectral_distance_matrix_block,
)
from .samplers import (
    binary_gumbel,
    hard_concrete,
    hard_concrete_l0_penalty,
    HardConcreteParams,
    straight_through,
    bernoulli_ste,
    temperature_schedule,
)
from .pallas_kernels import (
    hard_concrete_fused,
    binary_gumbel_fused,
    hard_concrete_fused_diff,
    binary_gumbel_fused_diff,
)

__all__ = [
    "PQMF",
    "design_prototype",
    "DEFAULT_SCALES",
    "multiscale_stft",
    "stft_magnitude",
    "spectral_distance",
    "spectral_distance_matrix_block",
    "binary_gumbel",
    "hard_concrete",
    "hard_concrete_l0_penalty",
    "HardConcreteParams",
    "straight_through",
    "bernoulli_ste",
    "temperature_schedule",
    "hard_concrete_fused",
    "binary_gumbel_fused",
    "hard_concrete_fused_diff",
    "binary_gumbel_fused_diff",
]
