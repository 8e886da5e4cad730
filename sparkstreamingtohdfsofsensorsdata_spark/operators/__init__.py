"""Relational operators (SURVEY.md §2.1-2.7). Importing this package
registers every query in the central registry."""

from . import (  # noqa: F401
    aggregates,
    bucketing,
    graph,
    joins,
    merge,
    projections,
    quality,
    sampling,
    scans,
    setops,
    sorts,
    timeseries,
    windows,
)
