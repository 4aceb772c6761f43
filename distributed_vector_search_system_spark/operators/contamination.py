"""Benchmark decontamination: n-gram overlap between a training
corpus and an evaluation set, round 10.

A training-data pipeline at 100 TB must answer "does my corpus leak
the benchmark?" before anything trains on it — the standard method
(GPT-3 appendix C; PaLM; The Pile) flags a training document as
contaminated when it shares surface n-grams with any eval item
(8 ≤ n ≤ 13 in the published pipelines; the operator takes ``n``).
This is the dedup family's machinery (shingle → equi-join blocking,
``operators/dedup.py``) pointed at an ASYMMETRIC pair: a huge corpus
against a small benchmark — which flips the scale strategy from
"bound the blocker's fan-out" to "broadcast the small side".

Operators:

- ``contamination_overlap`` — per (training doc, benchmark item):
  the count of shared distinct n-shingles, the item's shingle total,
  and the overlap fraction.  The audit artifact: which eval items
  leak, from where, how badly.
- ``decontaminate`` — the pipeline verb: drop every training doc
  sharing ≥ ``min_overlap`` shingles (or ≥ ``min_frac`` of some
  item's shingles) with any benchmark item.

This module GENERALIZES ``operators.sampling.decontaminate`` (round
4), which implements exactly the ``min_overlap=1`` case as a plain
shingle semi-join — no per-(doc, item) aggregate at all, the
cheapest possible plan for the any-overlap rule.  ``decontaminate``
here therefore DELEGATES to it when the gates are trivial and pays
the pair aggregate only when a threshold actually needs pair counts;
what is genuinely new is the AUDIT (which item leaked, from where,
how badly — the artifact a release review wants) and the
absolute/relative thresholds.

Both are deterministic set arithmetic → exactly SQL-replayable.

Scale (100 TB): the benchmark side is SMALL by contract (eval sets
are thousands of items; their distinct shingles fit in a broadcast).
The corpus-side shingle explode is map-side; the broadcast hash join
against the benchmark shingles restricts it to matching rows BEFORE
the per-(doc, item) count aggregate, so the only shuffle keys on
(doc, item) pairs that actually share a shingle — at sane benchmark
sizes a vanishing fraction of the corpus.  Nothing corpus-wide ever
shuffles; no corpus self-join exists anywhere (contrast the dedup
blockers, which must bound f²/2 fan-out — here the small side caps
fan-out structurally).  ``decontaminate`` reduces the pair frame to
a distinct contaminated-id sliver and LEFT-ANTI joins it back —
broadcast again.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.text import tokens, word_shingles


def _shingled(
    df: DataFrame, id_col: str, text_col: str, n: int, out_id: str
) -> DataFrame:
    return df.select(
        F.col(id_col).alias(out_id),
        word_shingles(tokens(text_col), n).alias("_sh"),
    )


def contamination_overlap(
    docs: DataFrame,
    benchmark: DataFrame,
    *,
    n: int = 13,
    doc_id_col: str = "doc_id",
    text_col: str = "text",
    bench_id_col: str = "bench_id",
    bench_text_col: str = "text",
) -> DataFrame:
    """Shared-shingle counts per (training doc, benchmark item) —
    ``(doc_id, bench_id, overlap, bench_shingles, frac)``.

    ``overlap`` is the number of DISTINCT n-shingles the pair shares
    (both sides' shingle sets are distinct per document, so the
    equi-join count IS the intersection size); ``frac`` is overlap /
    the benchmark item's shingle count, rounded to 6 decimals (the
    repo convention).  Pairs sharing nothing are absent.  Benchmark
    items shorter than ``n`` tokens have no shingles and can never
    flag anything — the published pipelines' behavior.
    """
    if n < 1:
        raise ValueError("n must be >= 1")
    bsh = _shingled(benchmark, bench_id_col, bench_text_col, n, "bench_id")
    bex = bsh.select("bench_id", F.explode("_sh").alias("_shingle"))
    bsizes = bsh.select("bench_id", F.size("_sh").alias("bench_shingles"))
    dex = _shingled(docs, doc_id_col, text_col, n, "doc_id").select(
        "doc_id", F.explode("_sh").alias("_shingle")
    )
    hits = (
        dex.join(F.broadcast(bex), "_shingle")
        .groupBy("doc_id", "bench_id")
        .agg(F.count("*").alias("overlap"))
    )
    return hits.join(F.broadcast(bsizes), "bench_id").select(
        "doc_id",
        "bench_id",
        "overlap",
        "bench_shingles",
        F.round(
            F.col("overlap") / F.col("bench_shingles").cast("double"), 6
        ).alias("frac"),
    )


def contaminated_ids(
    docs: DataFrame,
    benchmark: DataFrame,
    *,
    n: int = 13,
    min_overlap: int = 1,
    min_frac: float | None = None,
    **cols,
) -> DataFrame:
    """Distinct training-doc ids flagged against ANY benchmark item —
    one column ``doc_id``.  A doc is flagged when some pair row has
    ``overlap ≥ min_overlap`` or (when ``min_frac`` is set)
    ``frac ≥ min_frac`` — the OR of the absolute and relative gates,
    matching how published pipelines mix "any 13-gram" (absolute)
    with "≥ X% of the item" (relative) rules."""
    if min_overlap < 1:
        raise ValueError("min_overlap must be >= 1")
    if min_frac is not None and not 0.0 < min_frac <= 1.0:
        raise ValueError("min_frac must be in (0, 1]")
    pairs = contamination_overlap(docs, benchmark, n=n, **cols)
    cond = F.col("overlap") >= min_overlap
    if min_frac is not None:
        cond = cond | (F.col("frac") >= min_frac)
    return pairs.filter(cond).select("doc_id").distinct()


def decontaminate(
    docs: DataFrame,
    benchmark: DataFrame,
    *,
    n: int = 13,
    min_overlap: int = 1,
    min_frac: float | None = None,
    doc_id_col: str = "doc_id",
    text_col: str = "text",
    bench_id_col: str = "bench_id",
    bench_text_col: str = "text",
) -> DataFrame:
    """``docs`` minus contaminated rows (all input columns kept) —
    the verb a pipeline composes directly upstream of training-set
    materialization.  With trivial gates (``min_overlap=1``, no
    ``min_frac``) this IS the any-overlap rule, served by
    ``sampling.decontaminate``'s cheaper plan (shingle semi-join, no
    pair aggregate); thresholds engage the pair-counting path.  The
    flagged-id sliver is match-bounded (rare by construction at real
    n) and broadcast into the anti join, so the corpus passes
    through map-side."""
    if min_overlap == 1 and min_frac is None:
        from .sampling import decontaminate as _any_overlap

        if bench_text_col != text_col:
            benchmark = benchmark.withColumnRenamed(
                bench_text_col, text_col
            )
        return _any_overlap(
            docs, benchmark, n=n, text_col=text_col, id_col=doc_id_col
        )
    bad = contaminated_ids(
        docs, benchmark,
        n=n, min_overlap=min_overlap, min_frac=min_frac,
        doc_id_col=doc_id_col, text_col=text_col,
        bench_id_col=bench_id_col, bench_text_col=bench_text_col,
    ).withColumnRenamed("doc_id", doc_id_col)
    return docs.join(F.broadcast(bad), doc_id_col, "left_anti")
