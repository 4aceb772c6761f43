"""Corpus-wide paragraph- and substring-level deduplication.

Document-level dedup (operators/dedup.py) removes whole near-identical
documents; web corpora additionally repeat PARAGRAPHS across otherwise
distinct documents (navigation chrome, license blocks, quoted
boilerplate).  The standard fix (C4/RefinedWeb line-dedup, generalized)
keeps only the FIRST occurrence of each paragraph corpus-wide and
reassembles the surviving paragraphs per document.

Below paragraph granularity, :func:`substring_dedup` covers EXACT
SUBSTRING repetition (Lee et al. 2021, "Deduplicating Training Data
Makes Language Models Better"): long verbatim token runs repeated
across documents that differ elsewhere.  Lee et al. build a corpus
suffix array — inherently sequential and RAM-bound; the bounded
Spark shape here fingerprints ``window``-token spans, SELECTS which
span positions ship to the dedup shuffle, and resolves each
duplicated fingerprint to its corpus-wide first owner with the same
one-shuffle pattern as :func:`paragraph_dedup`.  Position selection
is the correctness-critical choice:

- ``anchor="winnow"`` (default) — WINNOWING (Schleimer, Wilkerson &
  Aiken 2003, the MOSS algorithm): every run of ``stride``
  consecutive span positions contributes its minimum-fingerprint
  position (leftmost tie).  Anchors are CONTENT-defined, so two
  copies of a duplicated run pick the same interior anchors no
  matter where each copy sits in its document — any duplicated run
  of >= ``window + stride - 1`` tokens is GUARANTEED detected, while
  only ~``2/(stride+1)`` of positions ship to the shuffle.
- ``anchor="grid"`` — positions at a fixed ``stride`` from each
  document's token 0.  Cheaper (no per-position hashing) but
  alignment-SENSITIVE: copies at different offsets modulo ``stride``
  are missed, so it is honest only for aligned duplication (exact
  duplicate documents, shared prefixes).

``stride=1`` makes both modes the exhaustive paper-exact form (every
duplicated ``window``-token run detected, spans ≈ tokens).

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


#: domain-separation seed of the substring-window fingerprints
SUBSTR_SEED = "substr"


def substring_windows(
    docs: DataFrame,
    *,
    window: int = 32,
    stride: int | None = None,
    anchor: str = "winnow",
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """``(id, pos, fp)`` token-span fingerprints at the selected anchor
    positions: ``pos`` is the 0-based token offset of a ``window``-token
    span, ``fp`` the oracle-portable 60-bit hash of its space-joined
    tokens (functions.hashing.portable_hash64, domain-separated).
    ``anchor`` picks the position-selection scheme (module docstring):
    ``"winnow"`` — content-defined argmin-per-``stride``-window
    (alignment-robust, the MOSS scheme); ``"grid"`` — every
    ``stride``-th position from token 0 (cheap, alignment-sensitive).
    Default ``stride``: ``max(1, window // 2)`` for winnow (detection
    guaranteed at ~1.5 windows of overlap), ``window`` for grid
    (non-overlapping tiles).

    Map-only: tokenize → fingerprint → select anchors → explode; no
    shuffle.  Hashing before the shuffle is the scale lever — the
    dedup exchange carries 3 longs per anchor instead of span text
    (~300 bytes at Lee et al.'s 50 tokens), and winnowing ships only
    ~``2/(stride+1)`` of positions; the winnow mode pays one 60-bit
    hash per token position map-side (embarrassingly parallel, no
    exchange).  A 60-bit fingerprint collision merges two unrelated
    spans with probability ~n²/2⁶¹ — the standard fingerprint-dedup
    trade, explicit here.  Documents shorter than ``window`` tokens
    contribute no rows (whole-doc dedup's job, operators/dedup.py)."""
    from ..functions.hashing import portable_hash64
    from ..functions.text import tokens

    if window <= 0:
        raise ValueError("window must be positive")
    if anchor not in ("winnow", "grid"):
        raise ValueError("anchor must be 'winnow' or 'grid'")
    if stride is None:
        stride = window if anchor == "grid" else max(1, window // 2)
    if stride <= 0:
        raise ValueError("stride must be positive")
    toks = docs.select(
        F.col(id_col).alias("id"), tokens(text_col).alias("_t")
    ).filter(F.size("_t") >= window)
    if anchor == "grid":
        pos = toks.select(
            "id",
            "_t",
            F.explode(
                F.sequence(F.lit(0), F.size("_t") - window, F.lit(stride))
            ).alias("pos"),
        )
        return pos.select(
            "id",
            F.col("pos").cast("long").alias("pos"),
            portable_hash64(
                F.concat_ws(" ", F.slice("_t", F.col("pos") + 1, window)),
                seed=SUBSTR_SEED,
            ).alias("fp"),
        )
    # winnowing: fingerprint EVERY span position (1-based i over
    # gram_count = n - window + 1 positions), then keep each length-
    # `stride` gram-window's argmin (leftmost tie via array_position);
    # dedupe overlapping windows' repeated picks with array_distinct.
    # All array HOFs — one pass, map-side.
    grammed = toks.select(
        "id",
        F.transform(
            F.sequence(F.lit(1), F.size("_t") - window + 1),
            lambda i: portable_hash64(
                F.concat_ws(" ", F.slice("_t", i, window)), seed=SUBSTR_SEED
            ),
        ).alias("_g"),
    )
    n_g = F.size("_g")
    win_len = F.least(F.lit(stride), n_g)
    anchors = F.array_distinct(
        F.transform(
            F.sequence(F.lit(1), F.greatest(F.lit(1), n_g - stride + 1)),
            lambda i: i
            - 1
            + F.array_position(
                F.slice("_g", i, win_len), F.array_min(F.slice("_g", i, win_len))
            )
            - 1,
        )
    )
    return grammed.select(
        "id", "_g", F.explode(anchors).alias("pos")
    ).select(
        "id",
        F.col("pos").cast("long").alias("pos"),
        F.element_at("_g", (F.col("pos") + 1).cast("int")).alias("fp"),
    )


def substring_dedup(
    docs: DataFrame,
    *,
    window: int = 32,
    stride: int | None = None,
    anchor: str = "winnow",
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Duplicated-span resolution: every anchored span whose
    fingerprint already occurs earlier in the corpus (first owner =
    lowest ``(doc_id, pos)`` — deterministic and oracle-replayable)
    comes back as ``(doc_id, pos, owner_doc_id, owner_pos)``.  Callers
    drop or mask the returned spans (the paper's remove-later-copies
    policy); per-doc duplication ratios are one ``groupBy(doc_id)``
    away.  With the default winnow anchoring, a cross-document
    verbatim run of >= ``window + stride - 1`` tokens is guaranteed to
    surface at least one shared span, at any alignment (tested).

    One shuffle, partitioned by the 60-bit fingerprint — the same
    first-owner window as :func:`paragraph_dedup`, with the same skew
    story: a viral span's occurrences land in one partition, bounded
    by that span's own frequency, and those are exactly the rows the
    operator exists to cut."""
    wins = substring_windows(
        docs, window=window, stride=stride, anchor=anchor,
        id_col=id_col, text_col=text_col,
    )
    w = Window.partitionBy("fp").orderBy(F.col("id").asc(), F.col("pos").asc())
    ranked = wins.select(
        F.col("id").alias(id_col),
        "pos",
        F.first("id").over(w).alias("owner_doc_id"),
        F.first("pos").over(w).alias("owner_pos"),
        F.row_number().over(w).alias("_rn"),
    )
    return ranked.filter(F.col("_rn") > 1).drop("_rn")
