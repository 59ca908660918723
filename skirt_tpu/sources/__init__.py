"""Radiation sources: SED families and stellar systems."""

from .sed import (
    SED, BlackBodySED, SunSED, FileSED, PlanckFunction, KuruczSED,
    QuasarSED, PegaseSED, MarastonSED,
)
from .stellar import (
    StellarComponent,
    OligoStellarComponent,
    StellarSystem,
    BolometricLuminosityNormalization,
    SpectralLuminosityNormalization,
    BandLuminosityNormalization,
)

__all__ = [
    "SED", "BlackBodySED", "SunSED", "FileSED", "PlanckFunction",
    "KuruczSED", "QuasarSED", "PegaseSED", "MarastonSED",
    "StellarComponent", "OligoStellarComponent", "StellarSystem",
    "BolometricLuminosityNormalization", "SpectralLuminosityNormalization",
    "BandLuminosityNormalization",
]
