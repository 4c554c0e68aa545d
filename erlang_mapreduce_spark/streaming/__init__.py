"""Streaming operators — importing populates the registry."""

from . import streams, windows  # noqa: F401
