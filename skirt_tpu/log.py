"""Console/file logging with scope timers.

ref: SKIRTcore/Log.hpp:18-109 (Console/FileLog, levels, linked logs),
SKIRTcore/TimeLogger.hpp:14-40 (RAII phase timers).
"""

from __future__ import annotations

import sys
import time
from contextlib import contextmanager

_LEVELS = {"info": 0, "warning": 1, "success": 2, "error": 3}
_COLORS = {"info": "", "warning": "\033[35m", "success": "\033[32m", "error": "\033[31m"}
_RESET = "\033[0m"


class Log:
    """A console logger optionally linked to a file log."""

    def __init__(self, verbose: bool = True, lowest: str = "info",
                 file_path: str | None = None, use_color: bool | None = None,
                 with_memory: bool = False):
        self.verbose = verbose
        self.lowest = _LEVELS[lowest]
        self._file = open(file_path, "w") if file_path else None
        self._t0 = time.time()
        self.use_color = use_color if use_color is not None else sys.stdout.isatty()
        # per-message memory usage (ref: the reference's -m flag,
        # Log.hpp:48-109 / SkirtCommandLineHandler.cpp:286-330)
        self.with_memory = with_memory

    def _emit(self, level: str, message: str) -> None:
        if _LEVELS[level] < self.lowest:
            return
        stamp = time.strftime("%d/%m/%Y %H:%M:%S")
        if self.with_memory:
            from .diagnostics import format_memory
            stamp += f" ({format_memory()})"
        line = f"{stamp}  {message}"
        if self.use_color and _COLORS[level]:
            print(f"{_COLORS[level]}{line}{_RESET}", flush=True)
        else:
            print(line, flush=True)
        if self._file:
            self._file.write(line + "\n")
            self._file.flush()

    def info(self, message: str) -> None:
        self._emit("info", message)

    def warning(self, message: str) -> None:
        self._emit("warning", "Warning: " + message)

    def success(self, message: str) -> None:
        self._emit("success", message)

    def error(self, message: str) -> None:
        self._emit("error", "Error: " + message)

    @contextmanager
    def timer(self, scope: str):
        """'Starting <scope>... / Finished <scope> in N s' around a block.

        ref: SKIRTcore/TimeLogger.hpp.
        """
        self.info(f"Starting {scope}...")
        t0 = time.perf_counter()
        try:
            yield
        finally:
            dt = time.perf_counter() - t0
            self.success(f"Finished {scope} in {dt:.1f} s.")
            from .diagnostics import AllocationLogger
            alloc = AllocationLogger.active()
            if alloc is not None:
                alloc.check(scope)

    def close(self) -> None:
        if self._file:
            self._file.close()
            self._file = None


class SilentLog(Log):
    def __init__(self):
        super().__init__(verbose=False, lowest="error", use_color=False)

    def _emit(self, level: str, message: str) -> None:  # pragma: no cover
        pass
