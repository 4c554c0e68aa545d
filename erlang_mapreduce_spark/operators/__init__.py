"""Operator modules — importing them populates the registry."""

from . import relational, text  # noqa: F401
