"""Scalar-function-family operators — importing populates the registry."""

from . import scalar  # noqa: F401
