"""LLM-data-pipeline operators (SURVEY.md §2.10): dedup, similarity
search, text analysis, multimodal columns."""

from . import (  # noqa: F401
    chunking,
    contamination,
    corpus_stats,
    dedup,
    multimodal,
    similarity,
    text,
)
