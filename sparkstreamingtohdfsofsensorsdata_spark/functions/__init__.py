"""Scalar-function family queries (SURVEY.md §2.8)."""

# scalars/udfs first: import order is registry order (see registry.load_all).
from . import scalars, udfs, collections  # noqa: F401
