"""Streaming operators — importing populates the registry."""

from . import windows  # noqa: F401
