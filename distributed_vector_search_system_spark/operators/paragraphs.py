"""Corpus-wide paragraph-level deduplication with document reassembly.

Document-level dedup (operators/dedup.py) removes whole near-identical
documents; web corpora additionally repeat PARAGRAPHS across otherwise
distinct documents (navigation chrome, license blocks, quoted
boilerplate).  The standard fix (C4/RefinedWeb line-dedup, generalized)
keeps only the FIRST occurrence of each paragraph corpus-wide and
reassembles the surviving paragraphs per document.

Shape at 100 TB: explode to (doc, idx, paragraph) — map-side; ONE
shuffle on the paragraph hash decides first-occurrence (window over
hash, ordered by the deterministic (doc_id, idx) tie-break); ONE
shuffle back on doc_id reassembles.  The hash key is
content-distributed, so the first shuffle has no hot keys beyond truly
viral paragraphs — exactly the rows the operator exists to cut — and
those collapse to one surviving row each (the window emits rank, not a
collect of the group).

Fully SQL-expressible, so the registry row (`paragraph_dedup`) carries
an exact DuckDB oracle (string_split + ROW_NUMBER + ordered
string_agg).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

#: paragraph separator — blank-line delimited, the corpus convention
SEP = "\n\n"


def explode_paragraphs(
    docs: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(id, idx, paragraph) rows, 1-based idx, empty/whitespace-only
    paragraphs dropped (they are formatting, not content)."""
    parts = F.split(F.col(text_col), SEP)
    out = docs.select(
        F.col(id_col),
        F.posexplode(parts).alias("idx0", "paragraph"),
    ).filter(F.trim(F.col("paragraph")) != "")
    return out.select(
        id_col, (F.col("idx0") + 1).alias("idx"), "paragraph"
    )


def paragraph_dedup(
    docs: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    out_col: str = "dedup_text",
) -> DataFrame:
    """Rebuild each document from the paragraphs for which it is the
    corpus-wide FIRST owner (ordered by (doc_id, idx) — deterministic
    and oracle-replayable).  Documents whose every paragraph is owned
    elsewhere come back with an empty string (callers typically drop
    them with a length gate)."""
    paras = explode_paragraphs(docs, id_col=id_col, text_col=text_col)
    w = Window.partitionBy("paragraph").orderBy(F.col(id_col).asc(), F.col("idx").asc())
    first = (
        paras.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )
    rebuilt = (
        first.groupBy(id_col)
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(
                        F.collect_list(F.struct(F.col("idx"), F.col("paragraph")))
                    ),
                    lambda s: s["paragraph"],
                ),
                SEP,
            ).alias(out_col)
        )
    )
    # left join keeps paragraph-less documents (all owned elsewhere)
    return docs.select(id_col).join(rebuilt, on=id_col, how="left").select(
        id_col, F.coalesce(F.col(out_col), F.lit("")).alias(out_col)
    )
