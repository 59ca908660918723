"""Fatal errors and signal handling.

ref: SKIRTcore/FatalError.hpp (exception carrying call-site info, raised
through the FATALERROR macro) and SKIRTcore/SignalHandler.cpp (converts
SIGSEGV/SIGFPE/... into a catchable FatalError, installed in
SkirtMain.cpp:34).  In Python, synchronous hardware faults cannot be
converted into exceptions safely; `faulthandler` provides the equivalent
post-mortem traceback, and SIGTERM is mapped to a KeyboardInterrupt-like
exception so cleanup runs.
"""

from __future__ import annotations

import faulthandler
import inspect
import os
import signal


class FatalError(RuntimeError):
    """Error with call-site info (ref: FatalError.hpp, FATALERROR macro)."""

    def __init__(self, message: str):
        frame = inspect.stack()[1]
        self.function = frame.function
        self.filename = os.path.basename(frame.filename)
        self.lineno = frame.lineno
        super().__init__(message)

    def __str__(self):
        return (f"{self.args[0]} (raised in {self.function} at "
                f"{self.filename}:{self.lineno})")


class TerminationRequest(Exception):
    """Raised when the process receives SIGTERM/SIGHUP."""


def _terminate(signum, _frame):
    raise TerminationRequest(f"received signal {signal.Signals(signum).name}")


def install_signal_handlers():
    """ref: SignalHandler::InstallSignalHandlers.

    - faulthandler dumps Python tracebacks on SIGSEGV/SIGFPE/SIGABRT/SIGBUS
      (the closest safe equivalent of the reference's fault-to-exception
      conversion);
    - SIGTERM/SIGHUP raise TerminationRequest so logs flush and partial
      outputs are written.
    """
    faulthandler.enable()
    for sig in (signal.SIGTERM, signal.SIGHUP):
        try:
            signal.signal(sig, _terminate)
        except (ValueError, OSError):  # non-main thread or unsupported
            pass
