"""Scalar-function-family operators — importing populates the registry."""

from . import scalar, udfs  # noqa: F401
