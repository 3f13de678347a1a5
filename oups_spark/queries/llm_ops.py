"""Queries exercising the LLM-data-pipeline operators (filled in as
the operators land): dedup family, similarity search, text analysis,
multimodal plumbing."""

from __future__ import annotations
