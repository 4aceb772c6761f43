"""Declarative query DSL, round 11 — one JSON-shaped front door over
the repo's retrieval operators (the honest subset of Elasticsearch's
Query DSL this engine implements exactly).

Every leaf and combinator below delegates to an operator that already
carries its own DuckDB oracle and plan locks — the DSL adds NO new
execution path, only translation (tested by equivalence against the
direct operator calls in tests/test_querydsl.py).  A request is one
query (the ES request shape); the result is the repo's ranked page
``(query_id=0, id, score, rank)``.

Supported nodes::

    {"match":     {"terms": [...]}}                      # BM25
    {"match_phrase": {"terms": [...]}}                   # exact phrase
    {"bool":      {"must": [...], "should": [...],
                   "must_not": [...]}}                   # admissibility
                                                         # + BM25 rank
    {"fuzzy":     {"terms": [...], "max_edits": 1,
                   "max_expansions": 10}}
    {"wildcard":  {"patterns": ["ta*", "t?ble"]}}
    {"prefix":    {"prefixes": ["ta"]}}                  # sugar: "ta*"
    {"function_score": {"query": <node>,
                   "field_value_factor": {"field", "weight",
                                          "modifier"} |
                   "gauss"/"exp": {"field", "origin", "scale",
                                   "offset", "decay"} |
                   "random_score": {"seed"},
                   "boost_mode": "multiply" | "sum"}}
    {"boosting":  {"positive": <node>, "negative": <node>,
                   "negative_boost": 0.5}}

``bool`` semantics follow the repo's boolean layer (ES filter-context
equivalents): ``must`` = every term present, ``should`` = at least one
present, ``must_not`` = none present; ranking is BM25 over
must ∪ should with the admissible-id restriction (idf/N/avgdl stay
corpus-level — the filtered-search contract).  ``boosting``'s negative
node is evaluated as a MATCH SET (its admissible ids), then
``scoring.boosting_score`` demotes without excluding.

Inner queries of composing nodes are fetched at the outer ``k`` (the
rescore-window convention — pass a larger ``k`` and slice downstream
when the re-rank needs headroom).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_LEAVES = ("match", "match_phrase", "bool", "fuzzy", "wildcard", "prefix")
_NODES = _LEAVES + ("function_score", "boosting")


def _node_type(node: dict) -> str:
    if not isinstance(node, dict) or len(node) != 1:
        raise ValueError(
            f"a query node is a single-key dict from {_NODES}; got {node!r}"
        )
    (kind,) = node.keys()
    if kind not in _NODES:
        raise ValueError(f"unknown query node type {kind!r} (know {_NODES})")
    return kind


def _one_query(spark, terms: list[str]) -> DataFrame:
    return spark.createDataFrame(
        [(0, [str(t) for t in terms])], "query_id long, qterms array<string>"
    )


def _match_ids(docs, node, *, doc_id_col, text_col) -> DataFrame:
    """A node's MATCH SET as a one-column id frame (the boosting
    negative / filter context)."""
    from .boolean import boolean_matching_ids

    kind = _node_type(node)
    body = node[kind]
    if kind == "match":
        return boolean_matching_ids(
            docs, any_of=body["terms"],
            doc_id_col=doc_id_col, text_col=text_col,
        )
    if kind == "bool":
        return boolean_matching_ids(
            docs,
            all_of=body.get("must", ()),
            any_of=body.get("should", ()),
            none_of=body.get("must_not", ()),
            doc_id_col=doc_id_col, text_col=text_col,
        )
    raise ValueError(
        f"{kind!r} cannot be used in a match-set context (negative "
        "clauses take 'match' or 'bool' nodes)"
    )


def search_dsl(
    docs: DataFrame,
    dsl: dict,
    k: int,
    *,
    doc_id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Execute one DSL query against ``docs`` —
    ``(query_id, id, score, rank)`` (module docstring)."""
    kind = _node_type(dsl)
    body = dsl[kind]
    spark = docs.sparkSession

    if kind == "match":
        from .retrieval import bm25_topk

        return bm25_topk(
            docs, _one_query(spark, body["terms"]), k,
            doc_id_col=doc_id_col, text_col=text_col,
        )

    if kind == "match_phrase":
        from .phrase import phrase_topk

        q = spark.createDataFrame(
            [(0, [str(t) for t in body["terms"]])],
            "query_id long, phrase array<string>",
        )
        return phrase_topk(
            docs, q, k, doc_id_col=doc_id_col, text_col=text_col
        )

    if kind == "bool":
        from .retrieval import _score_ranked, bm25_scores

        rank_terms = sorted(
            {*body.get("must", ()), *body.get("should", ())}
        )
        if not rank_terms:
            raise ValueError(
                "bool queries need a positive clause (must / should) "
                "to rank on"
            )
        ids = _match_ids(
            docs, dsl, doc_id_col=doc_id_col, text_col=text_col
        )
        scored = bm25_scores(
            docs, _one_query(spark, rank_terms),
            doc_id_col=doc_id_col, text_col=text_col,
            filter_ids=ids,
        )
        return _score_ranked(
            scored.withColumn("score", F.round("score", 6)), k, "score"
        )

    if kind == "fuzzy":
        from .fuzzy import bm25_fuzzy_topk

        return bm25_fuzzy_topk(
            docs, _one_query(spark, body["terms"]), k,
            max_edits=body.get("max_edits", 1),
            max_expansions=body.get("max_expansions", 10),
            doc_id_col=doc_id_col, text_col=text_col,
        )

    if kind in ("wildcard", "prefix"):
        from .fuzzy import bm25_wildcard_topk

        pats = (
            [f"{p}*" for p in body["prefixes"]]
            if kind == "prefix"
            else list(body["patterns"])
        )
        q = spark.createDataFrame(
            [(0, pats)], "query_id long, qpatterns array<string>"
        )
        return bm25_wildcard_topk(
            docs, q, k,
            max_expansions=body.get("max_expansions", 10),
            doc_id_col=doc_id_col, text_col=text_col,
        )

    if kind == "function_score":
        from .scoring import (
            decay_factor,
            field_value_factor,
            function_score,
            random_score_factor,
        )

        inner = search_dsl(
            docs, body["query"], k,
            doc_id_col=doc_id_col, text_col=text_col,
        ).select("query_id", "id", "score")
        fns = [key for key in ("field_value_factor", "gauss", "exp",
                               "random_score") if key in body]
        if len(fns) != 1:
            raise ValueError(
                "function_score takes exactly one of field_value_factor "
                f"/ gauss / exp / random_score; got {fns}"
            )
        fn = fns[0]
        spec = body[fn]
        if fn == "field_value_factor":
            fac = field_value_factor(
                docs, spec["field"],
                weight=spec.get("weight", 1.0),
                modifier=spec.get("modifier", "log1p"),
                doc_id_col=doc_id_col,
            )
        elif fn in ("gauss", "exp"):
            fac = decay_factor(
                docs, spec["field"],
                origin=spec["origin"], scale=spec["scale"],
                offset=spec.get("offset", 0.0),
                decay=spec.get("decay", 0.5),
                kind=fn, doc_id_col=doc_id_col,
            )
        else:
            fac = random_score_factor(
                docs, spec["seed"], doc_id_col=doc_id_col
            )
        return function_score(
            inner, fac, k, mode=body.get("boost_mode", "multiply")
        )

    # boosting
    from .scoring import boosting_score

    inner = search_dsl(
        docs, body["positive"], k,
        doc_id_col=doc_id_col, text_col=text_col,
    ).select("query_id", "id", "score")
    neg = _match_ids(
        docs, body["negative"], doc_id_col=doc_id_col, text_col=text_col
    )
    return boosting_score(
        inner, neg, k, negative_boost=body.get("negative_boost", 0.5)
    )
