"""Boolean term constraints: the AND / OR / NOT query layer.

Classic boolean retrieval (Manning IR ch.1) — the admissibility layer
every lexical stack exposes UNDER its ranking: "must contain all of
these terms, at least one of those, none of the others".  The repo's
ranked operators already take an admissible set (``filter_ids=`` on
bm25 / the posting store; ``hits=`` on snippets), so this module is
the producer side: it turns term constraints into an id frame, from a
corpus scan or from the persisted posting index.

Spark-first shape — every clause is a set operation on the exploded
(id, term) pairs, restricted to the CONSTRAINT vocabulary before
anything else (the constraint lists are tiny by contract):

- ``any_of``  — LEFT-SEMI join against the term list (∃ match);
- ``all_of``  — count of DISTINCT matched constraint terms == the
  list's length (the standard conjunctive-containment aggregate; no
  per-term self-joins, one hash aggregate regardless of list size);
- ``none_of`` — LEFT-ANTI join (∄ match).

A doc's admissibility is monotone in its term SET, so duplicates
never matter and the exploded pairs can be distinct-ed map-side.

Scale notes (100 TB): from-scratch pays one corpus tokenize (the
ad-hoc/oracle form).  ``boolean_matching_ids_index`` reads ONLY the
constraint terms' posting rows — ``term IN (…)`` pushdown over the
term-clustered layout, the same seek the ranked reads do — so cost
scales with the constraint terms' posting mass; a ``none_of``-only
query still needs the full id universe to subtract from, which the
index provides from its arbiter/df structures… it does not: NOT is
only evaluable against an id universe, so the index form requires at
least one positive clause (``all_of`` or ``any_of``) and raises
otherwise — the same rule production boolean engines enforce
("queries must not be purely negative").
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.text import tokens


def _norm(terms: Sequence[str] | None) -> list[str]:
    out = sorted({str(t) for t in (terms or ())})
    return out


def _combine(
    pairs: DataFrame,
    universe: DataFrame | None,
    all_of: list[str],
    any_of: list[str],
    none_of: list[str],
    min_should: int = 1,
) -> DataFrame:
    """``pairs``: distinct (id, term) restricted to the constraint
    vocabulary; ``universe``: one-column id frame (required when no
    positive clause).  ``min_should`` (round 12): ES
    ``minimum_should_match`` — the ``any_of`` clause requires at least
    N DISTINCT matched terms instead of one (same conjunctive-
    containment aggregate as ``all_of``; N greater than the list is
    unsatisfiable and returns nothing, the ES contract)."""
    if not (all_of or any_of or none_of):
        raise ValueError("at least one of all_of / any_of / none_of required")
    if min_should < 1:
        raise ValueError("min_should must be >= 1")
    admissible: DataFrame | None = None
    if all_of:
        admissible = (
            pairs.filter(F.col("term").isin(all_of))
            .groupBy("id")
            .agg(F.count_distinct("term").alias("_n"))
            .filter(F.col("_n") == len(all_of))
            .select("id")
        )
    if any_of:
        matched = pairs.filter(F.col("term").isin(any_of))
        if min_should <= 1:
            hits = matched.select("id").distinct()
        else:
            hits = (
                matched.groupBy("id")
                .agg(F.count_distinct("term").alias("_ns"))
                .filter(F.col("_ns") >= min_should)
                .select("id")
            )
        admissible = hits if admissible is None else admissible.join(
            hits, "id", "left_semi"
        )
    if admissible is None:
        if universe is None:
            raise ValueError(
                "purely negative query: none_of requires a positive "
                "clause or an id universe"
            )
        admissible = universe.select("id")
    if none_of:
        neg = pairs.filter(F.col("term").isin(none_of)).select("id").distinct()
        admissible = admissible.join(neg, "id", "left_anti")
    return admissible


def boolean_matching_ids(
    docs: DataFrame,
    *,
    all_of: Sequence[str] = (),
    any_of: Sequence[str] = (),
    none_of: Sequence[str] = (),
    doc_id_col: str = "doc_id",
    text_col: str = "text",
    min_should: int = 1,
) -> DataFrame:
    """Admissible doc ids (one-column ``id`` frame) for the boolean
    constraint over the corpus text — the ad-hoc / oracle form.  Feed
    the result to ``bm25_scores(filter_ids=)``, the posting store's
    ``search(filter_ids=)``, or snippets' ``hits=`` composition.
    ``min_should``: ES ``minimum_should_match`` over ``any_of``."""
    all_of, any_of, none_of = _norm(all_of), _norm(any_of), _norm(none_of)
    vocab = sorted({*all_of, *any_of, *none_of})
    pairs = (
        docs.select(
            F.col(doc_id_col).alias("id"),
            F.explode(F.array_distinct(tokens(text_col))).alias("term"),
        )
        .filter(F.col("term").isin(vocab))
        if vocab
        else None
    )
    universe = docs.select(F.col(doc_id_col).alias("id"))
    return _combine(pairs, universe, all_of, any_of, none_of, min_should)


def boolean_matching_ids_index(
    spark: SparkSession,
    path: str,
    *,
    all_of: Sequence[str] = (),
    any_of: Sequence[str] = (),
    none_of: Sequence[str] = (),
    min_should: int = 1,
) -> DataFrame:
    """The index-served form over a persisted posting index
    (``sources/posting_index.py`` layout): reads ONLY the constraint
    terms' posting rows via ``term IN`` pushdown.  Requires a positive
    clause (see module docstring).  Identical ids to the from-scratch
    form over the same corpus (tested).  ``min_should``: ES
    ``minimum_should_match`` over ``any_of``."""
    all_of, any_of, none_of = _norm(all_of), _norm(any_of), _norm(none_of)
    if not (all_of or any_of):
        raise ValueError(
            "the index form requires a positive clause (all_of / any_of)"
        )
    vocab = sorted({*all_of, *any_of, *none_of})
    pairs = (
        spark.read.parquet(f"{path}/postings")
        .filter(F.col("term").isin(vocab))
        .select("id", "term")
        .distinct()
    )
    return _combine(pairs, None, all_of, any_of, none_of, min_should)
