"""Operator modules — importing them populates the registry."""

from . import (  # noqa: F401
    analysis,
    bpe,
    curation,
    dedup,
    events_analytics,
    graph,
    joins,
    maintenance,
    pipeline,
    relational,
    similarity,
    pretrain,
    sql_suite,
    text,
    web,
    windows,
)
