"""Repetition-based quality signals (Gopher-style) — pure expressions.

The quality gates in large training-data pipelines (Gopher §A1.1, C4,
RefinedWeb) filter documents whose content is dominated by repetition:
duplicated lines/paragraphs (boilerplate, scraper glitches) and a
single dominant word n-gram (keyword stuffing, navigation chrome).
These are per-document signals — map-only, no shuffle, whole-stage
codegen — and every one is replayable in DuckDB list functions, so the
registry row carries an exact oracle.

Definitions (duplicate fraction = 1 − distinct/total, 0 for empty):

- ``dup_line_frac``      — fraction of non-empty lines that are
  repeats of an earlier line;
- ``dup_paragraph_frac`` — same at paragraph ("\\n\\n") granularity;
- ``top_bigram_frac``    — fraction of word-bigram occurrences taken
  by the most frequent bigram (1.0 when there is exactly one bigram);
- ``repetition_flagged`` — the composite gate with the standard-ish
  thresholds (line 0.30, paragraph 0.30, bigram 0.20 — tunable).

The per-doc bigram mode is computed as
``max over distinct g of count(g)`` — O(u·n) per document in codegen,
fine because documents are bounded-length rows (the corpus is huge, a
document is not); nothing here touches more than one row.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

#: default gate thresholds (shared with the registry row's second
#: projection, which derives the flag from ALREADY-COMPUTED signal
#: columns instead of re-expanding the expressions)
MAX_DUP_LINE_FRAC = 0.30
MAX_DUP_PARAGRAPH_FRAC = 0.30
MAX_TOP_BIGRAM_FRAC = 0.20


def _nonempty(parts: Column) -> Column:
    return F.filter(parts, lambda p: F.trim(p) != "")


def _dup_frac(parts: Column) -> Column:
    """1 − distinct/total over an array, 0.0 when the array is empty."""
    n = F.size(parts)
    return F.when(n == 0, F.lit(0.0)).otherwise(
        1.0 - F.size(F.array_distinct(parts)).cast("double") / n.cast("double")
    )


def dup_line_frac(text_col) -> Column:
    c = F.col(text_col) if isinstance(text_col, str) else text_col
    return _dup_frac(_nonempty(F.split(c, "\n")))


def dup_paragraph_frac(text_col) -> Column:
    c = F.col(text_col) if isinstance(text_col, str) else text_col
    return _dup_frac(_nonempty(F.split(c, "\n\n")))


def word_bigrams(text_col) -> Column:
    """Lowercased whitespace-token bigrams as 'a b' strings."""
    from .text import ws_tokens

    toks = ws_tokens(text_col, lowercase=True)
    n = F.size(toks)
    return F.when(n < 2, F.array().cast("array<string>")).otherwise(
        F.transform(
            F.slice(toks, 1, n - 1),
            lambda t, i: F.concat_ws(" ", t, F.element_at(toks, i + 2)),
        )
    )


def top_bigram_frac(text_col) -> Column:
    """max bigram count / total bigrams; 0.0 when no bigram exists."""
    g = word_bigrams(text_col)
    counts = F.transform(
        F.array_distinct(g), lambda x: F.size(F.filter(g, lambda y: y == x))
    )
    return F.when(F.size(g) == 0, F.lit(0.0)).otherwise(
        F.array_max(counts).cast("double") / F.size(g).cast("double")
    )


def repetition_flagged(
    text_col,
    *,
    max_dup_line_frac: float = MAX_DUP_LINE_FRAC,
    max_dup_paragraph_frac: float = MAX_DUP_PARAGRAPH_FRAC,
    max_top_bigram_frac: float = MAX_TOP_BIGRAM_FRAC,
) -> Column:
    """Composite gate.  NOTE: this re-expands all three signal
    expressions (HOFs are CodegenFallback — no subexpression
    elimination); when also selecting the individual signals, project
    them first and derive the flag from the materialized columns
    (see registry/llm.q_text_repetition)."""
    return (
        (dup_line_frac(text_col) > max_dup_line_frac)
        | (dup_paragraph_frac(text_col) > max_dup_paragraph_frac)
        | (top_bigram_frac(text_col) > max_top_bigram_frac)
    )
