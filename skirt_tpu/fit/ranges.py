"""Fit parameter ranges.

ref: FitSKIRTcore/ParameterRange.cpp — label, type, min/max with units.
"""

from __future__ import annotations

from dataclasses import dataclass

from ..units import parse_quantity


@dataclass
class ParameterRange:
    label: str
    minimum: float
    maximum: float
    quantity: str = "dimless"
    log_scale: bool = False

    @classmethod
    def from_strings(cls, label: str, min_text: str, max_text: str,
                     quantity: str = "dimless") -> "ParameterRange":
        return cls(label, parse_quantity(min_text, quantity),
                   parse_quantity(max_text, quantity), quantity)

    def clip(self, value: float) -> float:
        return min(max(value, self.minimum), self.maximum)
