"""Relational operators (SURVEY.md §2.1-2.7). Importing this package
registers every query in the central registry."""

from . import aggregates, bucketing, joins, projections, scans, setops, sorts, windows  # noqa: F401
