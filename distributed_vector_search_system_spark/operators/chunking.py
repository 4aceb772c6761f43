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


def pack_sequences(
    docs: DataFrame,
    budget: int,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    bucket: int = 4096,
) -> DataFrame:
    """GPT-style sequence packing layout: documents are laid out in
    ascending id order into fixed ``budget``-token training windows
    (concat-then-split, the standard LM-pretraining packing); each doc
    is assigned the window where its token span STARTS plus its offset
    inside it — ``(id, n_tokens, bin_id, bin_offset)``.  A document
    longer than the remaining window space simply spills into the
    following window(s); the physical split is the training reader's
    job, this operator computes the deterministic layout.

    Scale shape — distributed prefix-sum, NOT a global window: a naive
    ``SUM() OVER (ORDER BY id)`` drags the whole corpus through ONE
    partition.  Instead (the textbook two-level scan):

    1. docs bucket by ``floor(id / bucket)``; per-bucket token totals
       are one aggregate (map-side combine, one shuffle on the bucket
       key);
    2. the running sum over BUCKET TOTALS is a window over the
       aggregated frame — ``n_docs / bucket`` rows, driver-trivial;
    3. each doc's global offset = its bucket's base (broadcast back) +
       a ``partitionBy(bucket)`` running sum, whose window state is
       bounded by the bucket size.

    Integer addition is associative, so the two-level sum equals the
    global-window sum EXACTLY (tested, and the registry oracle replays
    the single-window form in DuckDB).  Tokens = the analysis
    tokenizer (``functions.text.tokens``), matching the corpus token
    stats the budget would be sized against.
    """
    if budget <= 0:
        raise ValueError("budget must be positive")
    if bucket <= 0:
        raise ValueError("bucket must be positive")
    from pyspark.sql import Window

    from ..functions.text import tokens

    t = docs.select(
        F.col(id_col).alias("id"),
        F.size(tokens(text_col)).cast("long").alias("n_tokens"),
    ).withColumn("_grp", F.floor(F.col("id") / bucket))
    gsums = t.groupBy("_grp").agg(F.sum("n_tokens").alias("_gsum"))
    wg = Window.orderBy("_grp").rowsBetween(Window.unboundedPreceding, -1)
    goffs = gsums.select(
        "_grp",
        F.coalesce(F.sum("_gsum").over(wg), F.lit(0)).alias("_goff"),
    )
    ww = (
        Window.partitionBy("_grp")
        .orderBy("id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    return (
        t.join(F.broadcast(goffs), "_grp")
        .withColumn(
            "_cum",
            F.col("_goff") + F.coalesce(F.sum("n_tokens").over(ww), F.lit(0)),
        )
        .select(
            "id",
            "n_tokens",
            # integral DIV, not floor(double /): long/int division goes
            # through DOUBLE and loses integer precision once _cum
            # exceeds 2^53 — at 100 TB cumulative token counts get
            # there, and the oracle's exact integer `//` would disagree
            # (ADVICE r07).  `div` stays on longs end to end.
            F.expr(f"_cum div {int(budget)}").alias("bin_id"),
            (F.col("_cum") % budget).alias("bin_offset"),
        )
    )
