"""Import error hierarchy.

Mirror of reference ``src/io/error.rs``: file-extension / IO / parse /
inconsistency errors, with parse errors carrying a file-location chain.
"""

from __future__ import annotations

from typing import List, Optional, Tuple


class ImportError_(Exception):
    """Base of the import error hierarchy (reference: Import)."""


class FileExtensionError(ImportError_):
    pass


class IOError_(ImportError_):
    pass


class ParseError(ImportError_):
    """Syntactic error, with an optional (line number, line text) chain."""

    def __init__(self, message: str, location: Optional[Tuple[int, str]] = None):
        super().__init__(message)
        self.message = message
        self.locations: List[Tuple[int, str]] = [location] if location else []

    def wrap(self, message: str) -> "ParseError":
        err = ParseError(f"{message}: {self.message}")
        err.locations = list(self.locations)
        return err

    def __str__(self) -> str:
        chain = "".join(f"\n  at line {n}: {t!r}" for n, t in self.locations)
        return self.message + chain


class Inconsistency(ImportError_):
    """Logically invalid program (reference: Inconsistency)."""
