"""Operator modules — importing them populates the registry."""

from . import joins, relational, text, windows  # noqa: F401
