"""Instruments: flux/image detection with device-side tallies."""

from .instruments import (
    DistantInstrument,
    SEDInstrument,
    FrameInstrument,
    SimpleInstrument,
    FullInstrument,
    InstrumentSystem,
)
from .perspective import PerspectiveInstrument
from .multiframe import InstrumentFrame, MultiFrameInstrument

__all__ = [
    "DistantInstrument", "SEDInstrument", "FrameInstrument",
    "SimpleInstrument", "FullInstrument", "InstrumentSystem",
    "PerspectiveInstrument", "InstrumentFrame", "MultiFrameInstrument",
]
