"""LLM-data-pipeline operators (SURVEY.md §2.10): dedup, similarity
search, text analysis, multimodal columns."""

from . import chunking, contamination, dedup, multimodal, similarity, text  # noqa: F401
