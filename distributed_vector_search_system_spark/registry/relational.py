"""Relational query surface (SURVEY.md §2.7) — filled in Stage 4."""

from __future__ import annotations

QUERIES: dict = {}
ORACLES: dict = {}
