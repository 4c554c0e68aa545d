"""Operator modules — importing them populates the registry."""

from . import (  # noqa: F401
    analysis,
    curation,
    dedup,
    events_analytics,
    joins,
    pipeline,
    relational,
    similarity,
    sql_suite,
    text,
    windows,
)
