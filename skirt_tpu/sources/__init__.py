"""Radiation sources: SED families and stellar systems."""

from .sed import (
    SED, BlackBodySED, SunSED, FileSED, PlanckFunction, KuruczSED,
    QuasarSED, PegaseSED, MarastonSED, BruzualCharlotSED,
    MappingsSED, StarburstSED,
)
from .stellar import (
    StellarComponent,
    OligoStellarComponent,
    StellarSystem,
    BolometricLuminosityNormalization,
    SpectralLuminosityNormalization,
    BandLuminosityNormalization,
    BroadbandLuminosityNormalization,
)

__all__ = [
    "SED", "BlackBodySED", "SunSED", "FileSED", "PlanckFunction",
    "KuruczSED", "QuasarSED", "PegaseSED", "MarastonSED",
    "BruzualCharlotSED", "MappingsSED", "StarburstSED",
    "StellarComponent", "OligoStellarComponent", "StellarSystem",
    "BolometricLuminosityNormalization", "SpectralLuminosityNormalization",
    "BandLuminosityNormalization", "BroadbandLuminosityNormalization",
]
