"""Source/sink operators — importing populates the registry."""

from . import scans  # noqa: F401
