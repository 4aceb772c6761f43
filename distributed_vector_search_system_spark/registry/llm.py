"""LLM-data-pipeline operators (dedup / similarity / text) — Stage 6."""

from __future__ import annotations

QUERIES: dict = {}
ORACLES: dict = {}
