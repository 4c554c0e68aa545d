"""Operator modules — importing them populates the registry."""

from . import (  # noqa: F401
    analysis,
    curation,
    dedup,
    joins,
    pipeline,
    relational,
    similarity,
    sql_suite,
    text,
    windows,
)
