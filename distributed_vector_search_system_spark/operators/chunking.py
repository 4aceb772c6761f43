"""Token-window document chunking — the embedding/training prep step.

Long documents feed both embedding models and LM training as bounded
token windows with overlap (context carry-over at chunk boundaries).
This is a pure map-side explode — no shuffle, no Python — and fully
SQL-expressible, so the registry row carries an exact DuckDB oracle.

Semantics (deterministic, replayed verbatim by the oracle):

- tokens = case-preserving whitespace split, empties dropped
  (``functions.text.ws_tokens`` — NOT the lowercasing/punctuation-
  stripping ``tokens`` of the analysis ops: chunk text must
  reconstruct the original stream);
- chunk starts at 1-based token offsets ``1, 1+stride, 1+2·stride, …``
  while ``start ≤ max(n_tokens − overlap, 1)`` (``stride =
  chunk_tokens − overlap``): every token is covered (the last emitted
  window always reaches the end), and a tail window whose tokens ALL
  lie inside the previous chunk is never emitted — a ≤ ``overlap``
  remainder would otherwise duplicate training data;
- the final chunk may be shorter than ``chunk_tokens``;
- a zero-token document emits no chunks;
- ``chunk_text`` re-joins the window with single spaces (whitespace is
  normalized — chunking happens after text normalization in a real
  pipeline anyway).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def chunk_documents(
    docs: DataFrame,
    *,
    chunk_tokens: int = 64,
    overlap: int = 16,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(id, chunk_id, n_tokens, chunk_text) rows, ``chunk_id`` 0-based
    in offset order."""
    if not 0 <= overlap < chunk_tokens:
        raise ValueError(
            f"need 0 <= overlap < chunk_tokens, got {overlap}/{chunk_tokens}"
        )
    from ..functions.text import ws_tokens

    stride = chunk_tokens - overlap
    toks = ws_tokens(text_col)
    n = F.size(toks)
    with_toks = docs.select(F.col(id_col), toks.alias("_toks"), n.alias("_n")).filter(
        F.col("_n") > 0
    )
    starts = F.sequence(
        F.lit(1), F.greatest(F.col("_n") - overlap, F.lit(1)), F.lit(stride)
    )
    exploded = with_toks.select(
        id_col, "_toks", F.explode(starts).alias("_start")
    )
    chunk = F.slice(F.col("_toks"), F.col("_start"), chunk_tokens)
    return exploded.select(
        id_col,
        ((F.col("_start") - 1) / stride).cast("int").alias("chunk_id"),
        F.size(chunk).alias("n_tokens"),
        F.array_join(chunk, " ").alias("chunk_text"),
    )
