"""Operator modules — importing them populates the registry."""

from . import (  # noqa: F401
    analysis,
    dedup,
    joins,
    relational,
    similarity,
    text,
    windows,
)
