"""Scalar-function family queries (SURVEY.md §2.8)."""

from . import collections, scalars, udfs  # noqa: F401
