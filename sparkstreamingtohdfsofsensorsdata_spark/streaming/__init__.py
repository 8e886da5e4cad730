"""Structured Streaming operators (SURVEY.md §2.9): the reference's
core identity — watermarked windowed aggregation over an event stream,
persisted to a partitioned, checkpointed file sink."""

from . import queries  # noqa: F401
