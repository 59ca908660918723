"""C++ iostream-style tokenizer for the reference's text resource formats.

The reference parses its data files with interleaved `file >> x` and
`getline(file, line)` calls (e.g. GrainComposition.cpp:205-566,
BruzualCharlotSEDFamily.cpp:68-120).  Faithful emulation matters: a
`>>` skips whitespace across newlines to the next token, while `getline`
consumes the REMAINDER of the current line (possibly empty) and leaves
the stream at the start of the next.  Any file the reference can read,
these semantics read identically.
"""

from __future__ import annotations


class CxxTokenStream:
    """Position = (line index, tokens consumed on that line)."""

    def __init__(self, text: str, name: str = "<stream>"):
        self.lines = text.splitlines()
        self.name = name
        self.line = 0
        self.tok = 0

    def next_tok(self) -> str:
        """`file >> x`: next whitespace-delimited token, crossing lines."""
        while True:
            if self.line >= len(self.lines):
                raise ValueError(f"truncated data file {self.name}")
            toks = self.lines[self.line].split()
            if self.tok < len(toks):
                t = toks[self.tok]
                self.tok += 1
                return t
            self.line += 1
            self.tok = 0

    def getline(self) -> None:
        """`getline(file, ...)`: discard to end of current line."""
        self.line += 1
        self.tok = 0

    def next_int(self) -> int:
        return int(self.next_tok())

    def next_float(self) -> float:
        return float(self.next_tok().replace("D", "E").replace("d", "e"))
