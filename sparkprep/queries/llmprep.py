"""LLM-data-pipeline scale operators: dedup families and similarity
search (filled in incrementally)."""

from __future__ import annotations

QUERIES: dict = {}
ORACLES: dict = {}
