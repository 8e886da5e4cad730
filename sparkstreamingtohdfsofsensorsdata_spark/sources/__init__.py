"""Batch + streaming source factory (SURVEY.md §2.1)."""
