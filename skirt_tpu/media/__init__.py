"""Dust media: optical property mixes, spatial dust systems, emissivity."""

from .mix import (
    DustMix,
    SimpleOligoDustMix,
    MeanDustMixFromFile,
    MeanZubkoDustMix,
    TrustMeanDustMix,
    TrustPolarizedMeanDustMix,
    DraineLiDustMix,
    InterstellarDustMix,
    ElectronDustMix,
    Benchmark1DDustMix,
    Benchmark2DDustMix,
)
from .dust_system import (
    DustComponent,
    DustSystem,
    DustMassNormalization,
    OpticalDepthNormalization,
)

__all__ = [
    "DustMix", "SimpleOligoDustMix", "MeanDustMixFromFile",
    "MeanZubkoDustMix", "TrustMeanDustMix", "TrustPolarizedMeanDustMix",
    "DraineLiDustMix",
    "InterstellarDustMix", "ElectronDustMix", "Benchmark1DDustMix",
    "Benchmark2DDustMix",
    "DustComponent", "DustSystem", "DustMassNormalization",
    "OpticalDepthNormalization",
]
