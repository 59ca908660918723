"""Radiation sources: SED families and stellar systems."""

from .sed import (
    SED, BlackBodySED, SunSED, FileSED, PlanckFunction, KuruczSED,
    QuasarSED,
)
from .stellar import (
    StellarComponent,
    OligoStellarComponent,
    StellarSystem,
    BolometricLuminosityNormalization,
    SpectralLuminosityNormalization,
)

__all__ = [
    "SED", "BlackBodySED", "SunSED", "FileSED", "PlanckFunction",
    "KuruczSED", "QuasarSED",
    "StellarComponent", "OligoStellarComponent", "StellarSystem",
    "BolometricLuminosityNormalization", "SpectralLuminosityNormalization",
]
