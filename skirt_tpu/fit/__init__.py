"""Reverse fitting engine (the FitSKIRT equivalent).

ref: FitSKIRTcore/ — FitScheme/OligoFitScheme, AdjustableSkirtSimulation,
ParameterRange, Optimization (GAlib steady-state GA), ReferenceImage,
Convolution, GALumfit/LumSimplex/GoldenSection.
"""

from .ranges import ParameterRange
from .convolution import GaussianKernel, FitsKernel, convolve
from .reference_image import ReferenceImage
from .ga import SteadyStateGA
from .scheme import FitScheme
from .fski import load_fski, parse_fski, substitute_labels, template_labels

__all__ = [
    "ParameterRange", "GaussianKernel", "FitsKernel", "convolve",
    "ReferenceImage", "SteadyStateGA", "FitScheme",
    "load_fski", "parse_fski", "substitute_labels", "template_labels",
]
