"""Scalar-function family queries (SURVEY.md §2.8)."""
