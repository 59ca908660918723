"""Instruments: flux/image detection with device-side tallies."""

from .instruments import (
    DistantInstrument,
    SEDInstrument,
    FrameInstrument,
    SimpleInstrument,
    FullInstrument,
    InstrumentSystem,
)

__all__ = [
    "DistantInstrument", "SEDInstrument", "FrameInstrument",
    "SimpleInstrument", "FullInstrument", "InstrumentSystem",
]
