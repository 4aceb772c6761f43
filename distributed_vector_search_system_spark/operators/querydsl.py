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
    {"multi_match": {"terms": [...],                     # several text
                   "fields": ["title^2", "text"],        # fields, each
                   "type": "best_fields"}}               # own stats
    {"match_phrase": {"terms": [...], "slop": 0}}        # phrase
                                                         # (slop>0 = sloppy)
    {"bool":      {"must": [...], "should": [...],
                   "must_not": [...],                    # admissibility
                   "minimum_should_match": 1,            # + BM25 rank;
                   "filter": [{"range": {f: {"gte": v}}},# filter = un-
                              {"term": {f: v}},          # scored meta
                              {"exists": {"field": f}}]}}# predicates
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
    {"constant_score": {"filter": <match | bool node>,
                   "boost": 1.0}}                        # unscored set

``bool`` semantics follow the repo's boolean layer (ES filter-context
equivalents): ``must`` = every term present, ``should`` = at least one
present, ``must_not`` = none present; ranking is BM25 over
must ∪ should with the admissible-id restriction (idf/N/avgdl stay
corpus-level — the filtered-search contract).  ``boosting``'s negative
node is evaluated as a MATCH SET (its admissible ids), then
``scoring.boosting_score`` demotes without excluding.

Round 12 (VERDICT r11 item 2): :func:`search_request` composes the
FULL ES request body in one call — ``query`` + ``aggs`` +
``post_filter`` + field ``sort`` — with the real ES semantics:
aggregations run over the query's ENTIRE match set (not the top-k
page) and ``post_filter`` restricts the hits AFTER aggregations are
computed (the classic faceted-navigation shape: counts describe the
unfiltered result, the hit list honors the user's facet pick).

Inner queries of composing nodes are fetched at the outer ``k`` (the
rescore-window convention — pass a larger ``k`` and slice downstream
when the re-rank needs headroom).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_LEAVES = (
    "match", "match_phrase", "bool", "fuzzy", "wildcard", "prefix",
    "multi_match",
)
_NODES = _LEAVES + ("function_score", "boosting", "constant_score")


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


def _zero_qid(id_col: str = "id"):
    """query_id 0 as a NON-FOLDABLE expression (id − id): a literal 0
    would constant-fold out of the ranking window's partition spec,
    leaving a partition-less window — the exact plan shape the repo's
    no-unpartitioned-windows lock forbids.  Deriving the constant from
    the id column keeps ``partitionBy("query_id")`` in the plan, so
    Catalyst applies the WindowGroupLimit partial top-k (each input
    partition truncates to k rows before the exchange), the same shape
    as every multi-query ranked page."""
    c = F.col(id_col)
    return (c - c).cast("long").alias("query_id")


_FILTER_KINDS = ("range", "term", "exists")


def _filter_predicate(filters) -> "F.Column":
    """ES filter-context clauses → one ANDed metadata predicate
    (round 12).  Supported::

        {"range":  {field: {"gte"|"gt"|"lte"|"lt": v, ...}}}
        {"term":   {field: value}}          # exact metadata equality
        {"exists": {"field": name}}         # non-null

    Pure map-side column expressions — Catalyst pushes them into the
    scan (filter context never scores, the ES contract)."""
    _RANGE_OPS = {
        "gte": lambda c, v: c >= v,
        "gt": lambda c, v: c > v,
        "lte": lambda c, v: c <= v,
        "lt": lambda c, v: c < v,
    }
    pred = F.lit(True)
    for fnode in filters:
        if not isinstance(fnode, dict) or len(fnode) != 1:
            raise ValueError(
                f"a filter clause is a single-key dict from "
                f"{_FILTER_KINDS}; got {fnode!r}"
            )
        (kind,) = fnode.keys()
        body = fnode[kind]
        if kind == "range":
            (field,) = body.keys()
            bounds = body[field]
            if not bounds or set(bounds) - set(_RANGE_OPS):
                raise ValueError(
                    f"range takes {sorted(_RANGE_OPS)} bounds; got {bounds!r}"
                )
            for op, v in bounds.items():
                pred = pred & _RANGE_OPS[op](F.col(field), F.lit(v))
        elif kind == "term":
            (field,) = body.keys()
            pred = pred & (F.col(field) == F.lit(body[field]))
        elif kind == "exists":
            pred = pred & F.col(body["field"]).isNotNull()
        else:
            raise ValueError(
                f"unknown filter clause type {kind!r} (know {_FILTER_KINDS})"
            )
    return pred


def _match_ids(docs, node, *, doc_id_col, text_col) -> DataFrame:
    """A node's MATCH SET as a one-column id frame (the boosting
    negative / filter context).  A bool node's ``filter`` clauses
    (metadata range/term/exists) restrict the universe BEFORE the text
    constraints — scores never see them (idf/N/avgdl stay
    corpus-level because ranking always re-scores via
    ``bm25_scores(filter_ids=)`` over the UNfiltered corpus)."""
    from .boolean import boolean_matching_ids

    kind = _node_type(node)
    body = node[kind]
    if kind == "match":
        return boolean_matching_ids(
            docs, any_of=body["terms"],
            doc_id_col=doc_id_col, text_col=text_col,
        )
    if kind == "bool":
        filters = body.get("filter", ())
        if filters:
            docs = docs.filter(_filter_predicate(filters))
        return boolean_matching_ids(
            docs,
            all_of=body.get("must", ()),
            any_of=body.get("should", ()),
            none_of=body.get("must_not", ()),
            doc_id_col=doc_id_col, text_col=text_col,
            min_should=int(body.get("minimum_should_match", 1)),
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
        from .phrase import phrase_slop_topk, phrase_topk

        q = spark.createDataFrame(
            [(0, [str(t) for t in body["terms"]])],
            "query_id long, phrase array<string>",
        )
        slop = int(body.get("slop", 0))
        if slop:
            return phrase_slop_topk(
                docs, q, k, slop=slop,
                doc_id_col=doc_id_col, text_col=text_col,
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

    if kind == "multi_match":
        # ES multi_match (round 12): the same terms scored against
        # SEVERAL text fields, each with its OWN corpus statistics
        # (the multi_index_topk subtlety — a field's idf/avgdl come
        # from that field's token stream) and an optional ^boost.
        # best_fields (the ES default) takes the best single field's
        # score per doc; most_fields sums the fields' scores — both
        # one UNION of per-field legs + one hash aggregate.
        from .retrieval import _score_ranked, bm25_scores

        mtype = body.get("type", "best_fields")
        if mtype not in ("best_fields", "most_fields"):
            raise ValueError(
                f"multi_match type must be best_fields|most_fields; "
                f"got {mtype!r}"
            )
        fields = body.get("fields") or ()
        if not fields:
            raise ValueError("multi_match requires a non-empty fields list")
        q = _one_query(spark, body["terms"])
        legs = []
        for spec in fields:
            name, _, boost = str(spec).partition("^")
            w = float(boost) if boost else 1.0
            legs.append(
                bm25_scores(
                    docs, q, doc_id_col=doc_id_col, text_col=name
                ).select(
                    "query_id", "id", (F.col("score") * w).alias("_c")
                )
            )
        allc = legs[0]
        for leg in legs[1:]:
            allc = allc.unionByName(leg)
        combine = F.max("_c") if mtype == "best_fields" else F.sum("_c")
        scored = allc.groupBy("query_id", "id").agg(
            F.round(combine, 6).alias("score")
        )
        return _score_ranked(scored, k, "score")

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

    if kind == "constant_score":
        # ES constant_score (round 12): every doc the inner filter
        # admits scores exactly `boost` — filter-context matching with
        # relevance switched off (cache-friendly in ES; here it simply
        # skips the scoring chain entirely).  Ties resolve on id, so
        # the page is the admissible set's first k ids.
        from .retrieval import _score_ranked

        boost = float(body.get("boost", 1.0))
        ids = _match_ids(
            docs, body["filter"], doc_id_col=doc_id_col, text_col=text_col
        )
        scored = ids.select(
            _zero_qid(),
            "id",
            F.round(F.lit(boost), 6).alias("score"),
        )
        return _score_ranked(scored, k, "score")

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


# ---------------------------------------------------------------------------
# full request composition (round 12, VERDICT r11 item 2)

#: aggregation node types search_request understands — each delegates
#: to an already-oracled aggregation operator (translation only, the
#: same discipline as the query nodes)
_AGG_KINDS = (
    "terms",
    "histogram",
    "date_histogram",
    "extended_stats",
    "stats",
    "percentiles",
    "cardinality",
    "significant_terms",
)

#: query node types that define a MATCH SET (aggs / post_filter /
#: sort need the full admissible set, not just a ranked page)
_MATCH_SET_KINDS = ("match", "bool")


#: metric node types allowed NESTED inside a bucket agg (terms /
#: histogram / date_histogram) — each becomes one more aggregate
#: expression in the bucket's OWN hash aggregate, so ES
#: sub-aggregations cost no extra shuffle.  ``cardinality`` here is
#: the exact per-bucket form (the oracle carrier; at serving scale
#: prefer a top-level cardinality agg with exact=False).
_SUB_AGG_KINDS = ("avg", "sum", "min", "max", "value_count", "cardinality")


def _sub_agg_expr(name: str, spec: dict):
    if not isinstance(spec, dict) or len(spec) != 1:
        raise ValueError(
            f"a sub-agg node is a single-key dict from {_SUB_AGG_KINDS}; "
            f"got {spec!r}"
        )
    (kind,) = spec.keys()
    field = spec[kind]["field"]
    v = F.col(field)
    if kind == "avg":
        return F.round(F.avg(v.cast("double")), 6).alias(name)
    if kind == "sum":
        return F.round(F.sum(v.cast("double")), 6).alias(name)
    if kind == "min":
        return F.round(F.min(v.cast("double")), 6).alias(name)
    if kind == "max":
        return F.round(F.max(v.cast("double")), 6).alias(name)
    if kind == "value_count":
        return F.count(v).alias(name)
    if kind == "cardinality":
        return F.count_distinct(v).alias(name)
    raise ValueError(
        f"unknown sub-agg node type {kind!r} (know {_SUB_AGG_KINDS})"
    )


def _one_agg(
    restricted: DataFrame,
    spec: dict,
    *,
    docs: DataFrame = None,
    match_ids: DataFrame = None,
    doc_id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Translate one agg node over the (already match-set-restricted)
    docs frame.  Each kind delegates to the operator that carries its
    oracle; output schemas are the operators' own.

    Bucket kinds (terms / histogram / date_histogram) accept an ES
    nested ``"aggs"`` body of metric sub-aggregations
    (:data:`_SUB_AGG_KINDS`) — one output column per sub-agg, computed
    in the bucket's single hash aggregate.  ``significant_terms``
    additionally sees the UNrestricted ``docs`` (its background
    statistics are corpus-level — the JLH contract) plus the match-id
    frame as the foreground."""
    if not isinstance(spec, dict):
        raise ValueError(
            f"an agg node is a single-key dict from {_AGG_KINDS}; got {spec!r}"
        )
    kinds = set(spec) - {"aggs"}
    if len(kinds) != 1:
        raise ValueError(
            f"an agg node is a single-key dict from {_AGG_KINDS} (plus an "
            f"optional nested 'aggs'); got {spec!r}"
        )
    (kind,) = kinds
    body = spec[kind]
    subs = spec.get("aggs") or {}
    if subs and kind not in ("terms", "histogram", "date_histogram"):
        raise ValueError(
            f"nested aggs compose with bucket kinds only; {kind!r} is a "
            "metric"
        )
    sub_cols = [_sub_agg_expr(name, s) for name, s in subs.items()]
    if kind == "terms":
        out = restricted.groupBy(
            F.col(body["field"]).alias("value")
        ).agg(F.count("*").alias("n"), *sub_cols)
        size = body.get("size")
        if size is not None:
            # ES terms order: count desc, then key asc — bucket
            # cardinality only, after the hash aggregate
            out = out.orderBy(F.col("n").desc(), F.col("value").asc()).limit(
                int(size)
            )
        return out
    if kind == "histogram":
        from .facets import histogram_facet

        return histogram_facet(
            restricted, body["field"],
            width=float(body["interval"]),
            origin=float(body.get("offset", 0.0)),
            extra_aggs=sub_cols,
        )
    if kind == "date_histogram":
        from .aggregations import date_histogram

        return date_histogram(
            restricted, body["field"],
            interval=body.get("calendar_interval", "day"),
            extra_aggs=sub_cols,
        )
    if kind == "extended_stats":
        from .aggregations import extended_stats

        return extended_stats(restricted, body["field"])
    if kind == "percentiles":
        from .aggregations import percentiles

        return percentiles(
            restricted, body["field"],
            tuple(body.get("percents", (50.0, 90.0, 99.0))),
        )
    if kind == "cardinality":
        from .aggregations import cardinality

        return cardinality(restricted, body["field"])
    if kind == "stats":
        # the non-extended ES form: count / min / max / avg / sum
        from .aggregations import extended_stats

        return extended_stats(restricted, body["field"]).select(
            "n", "min_v", "max_v", "avg_v", "sum_v"
        )
    if kind == "significant_terms":
        # "what is this result set ABOUT": foreground = the match set,
        # background = the WHOLE corpus (JLH needs the unrestricted
        # frame — restricting it would make every term look ordinary)
        from .facets import significant_terms

        hits = match_ids.select(_zero_qid(), "id")
        return significant_terms(
            hits, docs, int(body.get("top_n", body.get("size", 10))),
            min_fg_df=int(body.get("min_fg_df", 2)),
            doc_id_col=doc_id_col, text_col=text_col,
        )
    raise ValueError(f"unknown agg node type {kind!r} (know {_AGG_KINDS})")


def _query_scores(
    docs: DataFrame, query: dict, *, doc_id_col: str, text_col: str
) -> DataFrame:
    """A match/bool node's FULL scored match set ``(id, score)`` —
    every admissible doc with its BM25 score, not a page (the hybrid
    fusion input; corpus statistics corpus-level as always)."""
    from .retrieval import bm25_scores

    kind = _node_type(query)
    if kind not in _MATCH_SET_KINDS:
        raise ValueError(
            f"knn fusion requires a match-set query node "
            f"({_MATCH_SET_KINDS}); got {kind!r}"
        )
    body = query[kind]
    if kind == "match":
        rank_terms = sorted(set(body["terms"]))
        ids = None
    else:
        rank_terms = sorted({*body.get("must", ()), *body.get("should", ())})
        if not rank_terms:
            raise ValueError(
                "bool queries need a positive clause (must / should) to "
                "rank on"
            )
        ids = _match_ids(docs, query, doc_id_col=doc_id_col, text_col=text_col)
    return bm25_scores(
        docs, _one_query(docs.sparkSession, rank_terms),
        doc_id_col=doc_id_col, text_col=text_col, filter_ids=ids,
    ).select("id", "score")


def _knn_fused(
    docs: DataFrame,
    vectors: DataFrame,
    query: dict,
    knn: dict,
    k: int,
    *,
    doc_id_col: str,
    text_col: str,
    vector_id_col: str,
    vector_col: str,
) -> DataFrame:
    """ES top-level ``knn`` alongside ``query`` (round 12): combined
    score = BM25 + ``boost ·`` vector similarity, final top ``k``::

        {"query_vector": [...], "k": 10, "boost": 1.0}

    The knn leg is the exact top-``k`` by squared L2 (the engine's
    native FAISS-flat semantics) converted to ES's ``l2_norm``
    similarity score ``1 / (1 + d²)``; the query leg is the FULL
    scored match set (exact — no per-shard approximation, an honest
    superset of ES's collect-top-per-shard).  A doc in only one leg
    contributes only that leg's score, the ES sum contract.

    ``vectors`` may instead be a PRE-SCORED ``(id, distance)`` frame
    (detected by a ``distance`` column) — any ANN tier's output (the
    partition-pruned IVF index, PQ/ADC, Matryoshka) plugs in as the
    leg, which is the 100 TB serving shape; exactness is then that
    tier's own measured-recall contract.

    Scale: the knn leg is k-bounded; the fusion is a UNION of the two
    legs' ``(id, contribution)`` rows + one hash aggregate (map-side
    combine; no full-outer join shuffle), then the standard top-k cut.
    """
    from pyspark.sql import Window

    from ..functions.distance import rank_key, squared_l2
    from .retrieval import _score_ranked

    k_knn = int(knn.get("k", k))
    boost = float(knn.get("boost", 1.0))
    if isinstance(vectors, DataFrame) and "distance" in vectors.columns:
        # pre-scored ANN leg (the 100 TB path): ANY vector tier's
        # ``(id, distance)`` output — the partition-pruned IVF index,
        # PQ/ADC, Matryoshka — plugs in; exactness is then that
        # tier's own measured-recall contract
        scored_v = vectors.select(
            _zero_qid(),
            "id",
            F.col("distance").cast("double").alias("_d"),
        )
    else:
        vec = [float(x) for x in knn["query_vector"]]
        qv = F.array(*[F.lit(x) for x in vec])
        scored_v = vectors.select(
            _zero_qid(vector_id_col),
            F.col(vector_id_col).alias("id"),
            squared_l2(F.col(vector_col), qv).alias("_d"),
        )
    w = Window.partitionBy("query_id").orderBy(
        rank_key(F.col("_d")).asc(), F.col("id").asc()
    )
    knn_leg = (
        scored_v.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= k_knn)
        .select("id", (F.lit(boost) / (F.lit(1.0) + F.col("_d"))).alias("_c"))
    )
    q_leg = _query_scores(
        docs, query, doc_id_col=doc_id_col, text_col=text_col
    ).select("id", F.col("score").alias("_c"))
    combined = (
        q_leg.unionByName(knn_leg)
        .groupBy("id")
        .agg(F.round(F.sum("_c"), 6).alias("score"))
        .select(_zero_qid(), "id", "score")
    )
    return _score_ranked(combined, k, "score")


def search_request(
    docs: DataFrame,
    request: dict,
    *,
    doc_id_col: str = "doc_id",
    text_col: str = "text",
    vectors: DataFrame | None = None,
    vector_id_col: str = "vec_id",
    vector_col: str = "embedding",
) -> dict:
    """One full ES-shaped search request::

        {"query":       <query node>,            # required
         "size":        10,                      # hit-page size
         "from":        0,                       # offset pagination
         "fields":      ["source", "lang"],      # doc values on hits
         "track_total_hits": true,               # exact match count
         "highlight":   {"window": 8},           # per-hit snippets
         "aggs":        {name: <agg node>, ...}, # over the MATCH SET
         "post_filter": <match | bool node>,     # hits only, not aggs
         "sort":        [{"field": "asc"|"desc"}, ...],  # field sort
         "search_after": [v1, ..., last_id],     # sorted-page cursor
         "rescore":     {"window_size": N,       # second-pass re-rank
                         "query": {...}},        # (_apply_rescore)
         "knn":         {"query_vector": [...],  # hybrid text+vector
                         "k": 10, "boost": 1.0}} # (_knn_fused)

    Returns ``{"hits": DataFrame, "aggregations": {name: DataFrame}}``.

    Semantics (the ES contract):

    - ``aggs`` aggregate the query's FULL match set — every admissible
      document, not the top-k page (``value_stats(hits=)`` is the
      page-scoped variant; this is the other, more common half).
    - ``post_filter`` restricts the HITS after aggregations: the agg
      input never sees it (facet counts describe what the user COULD
      narrow to; the hit list honors the narrowing already made).
      Scores are unchanged — idf/N/avgdl stay corpus-level, the
      filtered-search contract.
    - field ``sort`` replaces relevance ranking (ES skips scoring when
      sorting by field): hits are the match set's top ``size`` rows by
      the sort key tuple, ties on id — output ``(query_id, id,
      <sort fields...>, rank)``.

    ``aggs`` / ``post_filter`` / ``sort`` need the query's full match
    set, so they require a ``match`` or ``bool`` query node (the
    ranked-only nodes — fuzzy, wildcard, function_score, boosting —
    define a page, not a set; compose those via ``search_dsl`` +
    ``value_stats(hits=)`` instead).

    Scale: the match set is materialized ONCE as an id frame and
    semi-joins restrict the agg / sort inputs.  The semi joins are NOT
    forced broadcast — a match set is query-restricted but unbounded
    (a stopword query admits the corpus), so AQE picks broadcast only
    when the build side measures small; Catalyst pushes the semi join
    below each aggregation (the ``bm25_scores`` filter_ids
    discipline).  Every aggregation is one hash aggregate over the
    restricted rows; the hit page keeps ``search_dsl``'s plan locks.
    """
    if "query" not in request:
        raise ValueError("a search request requires a 'query' node")
    unknown = set(request) - {
        "query", "size", "aggs", "post_filter", "sort", "rescore",
        "search_after", "knn", "from", "highlight", "fields",
        "track_total_hits",
    }
    if unknown:
        raise ValueError(f"unknown request keys {sorted(unknown)}")
    query = request["query"]
    frm = int(request.get("from", 0))
    if frm < 0:
        raise ValueError("from must be >= 0")
    # from+size pagination: every branch fetches the first from+size
    # rows, the page is sliced off the top afterwards (rank stays the
    # GLOBAL rank from+1..from+size — the informative convention; for
    # deep pages prefer the stateless cursors: search_after here, the
    # relevance cursor in operators.pagination)
    k = frm + int(request.get("size", 10))
    aggs = request.get("aggs") or {}
    post_filter = request.get("post_filter")
    sort = request.get("sort")
    rescore = request.get("rescore")
    knn = request.get("knn")
    if knn is not None:
        if sort is not None or rescore is not None or post_filter is not None:
            raise ValueError(
                "knn fusion composes with query + aggs only (sort / "
                "rescore / post_filter do not apply to a hybrid page)"
            )
        if vectors is None:
            raise ValueError(
                "the knn section needs the vectors= frame "
                f"(id {vector_id_col!r}, vector {vector_col!r})"
            )
    search_after = request.get("search_after")
    if search_after is not None and sort is None:
        raise ValueError(
            "search_after requires a field sort (for the relevance-"
            "ranked cursor use operators.pagination.search_after_topk)"
        )
    if search_after is not None and frm:
        raise ValueError(
            "from does not compose with search_after (the cursor IS "
            "the offset), per the ES contract"
        )
    if rescore is not None and sort is not None:
        # the ES contract: rescoring re-ranks by relevance; a field
        # sort discards relevance, so the combination is an error
        raise ValueError("rescore cannot be combined with a field sort")
    # the first relevance pass fetches the rescore window, the second
    # pass cuts it back to the page size
    page_k = max(k, int(rescore.get("window_size", k))) if rescore else k

    track_total = bool(request.get("track_total_hits"))
    needs_set = (
        bool(aggs) or post_filter is not None or sort is not None
        or track_total
    )
    if needs_set and _node_type(query) not in _MATCH_SET_KINDS:
        raise ValueError(
            "aggs / post_filter / sort require a match-set query node "
            f"({_MATCH_SET_KINDS}); compose ranked-only nodes via "
            "search_dsl + value_stats(hits=)"
        )

    match_ids = (
        _match_ids(docs, query, doc_id_col=doc_id_col, text_col=text_col)
        if needs_set
        else None
    )

    aggregations = {}
    if aggs:
        restricted = docs.join(
            match_ids,
            docs[doc_id_col] == match_ids["id"],
            "left_semi",
        )
        aggregations = {
            name: _one_agg(
                restricted, spec,
                docs=docs, match_ids=match_ids,
                doc_id_col=doc_id_col, text_col=text_col,
            )
            for name, spec in aggs.items()
        }

    # the hit page's admissible set: match set ∩ post_filter set
    hit_ids = match_ids
    if post_filter is not None:
        pf = _match_ids(
            docs, post_filter, doc_id_col=doc_id_col, text_col=text_col
        )
        hit_ids = hit_ids.join(pf, "id", "left_semi")

    if knn is not None:
        hits = _knn_fused(
            docs, vectors, query, knn, k,
            doc_id_col=doc_id_col, text_col=text_col,
            vector_id_col=vector_id_col, vector_col=vector_col,
        )
    elif sort is not None:
        from pyspark.sql import Window

        keys = []
        fields = []
        orders = []
        for s in sort:
            if not isinstance(s, dict) or len(s) != 1:
                raise ValueError(
                    f"a sort entry is one {{field: 'asc'|'desc'}}; got {s!r}"
                )
            (field,), (order,) = s.keys(), s.values()
            if order not in ("asc", "desc"):
                raise ValueError(f"sort order must be asc|desc; got {order!r}")
            fields.append(field)
            orders.append(order)
            keys.append(
                F.col(field).asc() if order == "asc" else F.col(field).desc()
            )
        base = docs.join(
            hit_ids, docs[doc_id_col] == hit_ids["id"], "left_semi"
        ).select(
            _zero_qid(doc_id_col),
            F.col(doc_id_col).alias("id"),
            *fields,
        )
        if search_after is not None:
            # ES search_after: the cursor is the last row's sort-key
            # tuple PLUS the id tiebreaker — resume STRICTLY after it.
            # The predicate is a map-side lexicographic filter on the
            # RAW rows below the top-k window (the composite_buckets
            # cursor discipline: page N costs what page 1 costs), with
            # each key's direction honored.
            if len(search_after) != len(fields) + 1:
                raise ValueError(
                    "search_after takes one value per sort field plus "
                    "the id tiebreaker"
                )
            pred = F.col("id") > F.lit(search_after[-1])
            for (field, order), a in zip(
                reversed(list(zip(fields, orders))), search_after[-2::-1]
            ):
                past = (
                    F.col(field) > F.lit(a)
                    if order == "asc"
                    else F.col(field) < F.lit(a)
                )
                pred = past | ((F.col(field) == F.lit(a)) & pred)
            base = base.filter(pred)
        w = Window.partitionBy("query_id").orderBy(*keys, F.col("id").asc())
        hits = (
            base.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k)
        )
    elif post_filter is not None:
        # relevance ranking restricted to the post-filtered set, scores
        # untouched (corpus-level statistics)
        from .retrieval import _score_ranked, bm25_scores

        body = query[_node_type(query)]
        rank_terms = sorted(
            {*body.get("must", ()), *body.get("should", ())}
            if _node_type(query) == "bool"
            else set(body["terms"])
        )
        if not rank_terms:
            raise ValueError(
                "post_filter needs a positive clause to rank on"
            )
        scored = bm25_scores(
            docs, _one_query(docs.sparkSession, rank_terms),
            doc_id_col=doc_id_col, text_col=text_col,
            filter_ids=hit_ids,
        )
        hits = _score_ranked(
            scored.withColumn("score", F.round("score", 6)), page_k, "score"
        )
    else:
        hits = search_dsl(
            docs, query, page_k, doc_id_col=doc_id_col, text_col=text_col
        )

    if rescore is not None:
        hits = _apply_rescore(
            docs, hits, rescore, k,
            doc_id_col=doc_id_col, text_col=text_col,
        )
    if frm:
        hits = hits.filter(F.col("rank") > frm)

    fields_req = request.get("fields")
    if fields_req:
        # doc-value fields on the page: hit ids (k-bounded) broadcast-
        # semi-restrict the pruned attribute scan, then the surviving
        # rows broadcast into a preserving left join — the collapse /
        # function_score discipline; nothing corpus-sized shuffles
        attrs = docs.select(
            F.col(doc_id_col).alias("id"), *[str(c) for c in fields_req]
        )
        page_ids = hits.select("id").distinct()
        attrs_sub = attrs.join(F.broadcast(page_ids), "id", "left_semi")
        hits = hits.join(F.broadcast(attrs_sub), "id", "left")

    out = {"hits": hits, "aggregations": aggregations}

    if track_total:
        # ES track_total_hits: the EXACT size of the full match set,
        # independent of the page — one count over the admissible ids
        out["total_hits"] = match_ids.agg(
            F.count("*").alias("total_hits")
        )

    highlight = request.get("highlight")
    if highlight is not None:
        # per-hit best-window snippets over the page (k-bounded by
        # construction) — the gated engine's snippets discipline; the
        # highlight terms are the query's positive terms
        from .snippets import best_window_snippets

        kind = _node_type(query)
        if kind not in _MATCH_SET_KINDS:
            raise ValueError(
                "highlight needs the query's terms — use a match or "
                "bool query node"
            )
        body = query[kind]
        terms = sorted(
            set(body["terms"])
            if kind == "match"
            else {*body.get("must", ()), *body.get("should", ())}
        )
        out["highlight"] = best_window_snippets(
            docs, _one_query(docs.sparkSession, terms),
            int(highlight.get("window", 8)),
            hits=hits.select("query_id", "id"),
            doc_id_col=doc_id_col, text_col=text_col,
        )

    return out


_RESCORE_MODES = ("total", "multiply", "avg", "max", "min")


def _apply_rescore(
    docs: DataFrame,
    window_hits: DataFrame,
    rescore: dict,
    k: int,
    *,
    doc_id_col: str,
    text_col: str,
) -> DataFrame:
    """ES ``rescore`` (round 12): re-rank the top ``window_size`` hits
    of the relevance pass by a secondary query, then cut to the page::

        {"window_size": 50,
         "query": {"rescore_query": <match | match_phrase node>,
                   "query_weight": 1.0,
                   "rescore_query_weight": 1.0,
                   "score_mode": "total"}}       # | multiply|avg|max|min

    Combined score per the ES contract: with ``p = query_weight ·
    original`` and ``s = rescore_query_weight · secondary``, a window
    doc the rescore query MATCHES scores ``total: p+s / multiply: p·s /
    avg: (p+s)/2 / max / min``; a window doc it does NOT match keeps
    ``p`` unchanged (never zeroed).  The secondary score is BM25 for a
    ``match`` rescore query and the sloppy/exact phrase frequency for
    ``match_phrase`` (the classic phrase-rescore pattern: cheap bag-of-
    words window, exact proximity only over the window).

    Only the top ``window_size`` hits are re-ranked (among themselves);
    first-pass hits beyond the window follow in their ORIGINAL order
    with their original scores — rescoring never promotes a doc into
    the window (the ES contract, and what makes the second pass's cost
    independent of the corpus).

    Scale: the window is k-bounded by construction, so the window ids
    BROADCAST into the secondary scorer's restriction (the
    ``function_score`` hits discipline) — a phrase rescore tokenizes
    only the window's documents, and a match rescore's posting rows
    semi-restrict to window ids before the tf aggregate.  Corpus
    statistics (idf / N / avgdl) stay corpus-level, the repo's
    filtered-search contract."""
    from .retrieval import _score_ranked

    spec = rescore.get("query")
    if not isinstance(spec, dict) or "rescore_query" not in spec:
        raise ValueError(
            "rescore takes {'window_size': N, 'query': "
            "{'rescore_query': <node>, ...}}"
        )
    mode = spec.get("score_mode", "total")
    if mode not in _RESCORE_MODES:
        raise ValueError(f"score_mode must be one of {_RESCORE_MODES}")
    qw = float(spec.get("query_weight", 1.0))
    rw = float(spec.get("rescore_query_weight", 1.0))
    rq = spec["rescore_query"]
    kind = _node_type(rq)
    spark = docs.sparkSession
    window_size = int(rescore.get("window_size", k))
    win = window_hits.filter(F.col("rank") <= window_size)
    tail = window_hits.filter(F.col("rank") > window_size)
    ids = win.select("id").distinct()

    if kind == "match":
        from .retrieval import bm25_scores

        sec = bm25_scores(
            docs, _one_query(spark, rq["match"]["terms"]),
            doc_id_col=doc_id_col, text_col=text_col,
            filter_ids=F.broadcast(ids),
        ).select("id", F.col("score").alias("_sec"))
    elif kind == "match_phrase":
        from .phrase import phrase_slop_topk

        # phrase_tf is per-document (independent of the rest of the
        # corpus), so restricting the tokenize to the window is exact
        window_docs = docs.join(
            F.broadcast(ids),
            docs[doc_id_col] == ids["id"],
            "left_semi",
        )
        q = spark.createDataFrame(
            [(0, [str(t) for t in rq["match_phrase"]["terms"]])],
            "query_id long, phrase array<string>",
        )
        sec = phrase_slop_topk(
            window_docs, q, 2_147_483_647,
            slop=int(rq["match_phrase"].get("slop", 0)),
            doc_id_col=doc_id_col, text_col=text_col,
        ).select("id", F.col("phrase_tf").cast("double").alias("_sec"))
    else:
        raise ValueError(
            "rescore_query must be a match or match_phrase node; "
            f"got {kind!r}"
        )

    joined = win.select(
        "query_id", "id", (F.col("score") * qw).alias("_p")
    ).join(F.broadcast(sec), "id", "left")
    s = F.col("_sec") * rw
    if mode == "total":
        combined = F.col("_p") + F.coalesce(s, F.lit(0.0))
    elif mode == "multiply":
        combined = F.col("_p") * F.coalesce(s, F.lit(1.0))
    elif mode == "avg":
        combined = F.when(
            F.col("_sec").isNotNull(), (F.col("_p") + s) / 2.0
        ).otherwise(F.col("_p"))
    elif mode == "max":
        combined = F.greatest(F.col("_p"), F.coalesce(s, F.col("_p")))
    else:
        combined = F.least(F.col("_p"), F.coalesce(s, F.col("_p")))
    scored = joined.select(
        "query_id", "id", F.round(combined, 6).alias("score")
    )
    rescored = _score_ranked(scored, window_size, "score")
    # rescored window first (its own order), then the tail in original
    # order with original scores — one per-query rank over the union
    from pyspark.sql import Window

    merged = rescored.select(
        "query_id", "id", "score",
        F.lit(0).alias("_k1"), F.col("rank").alias("_k2"),
    ).unionByName(
        tail.select(
            "query_id", "id", "score",
            F.lit(1).alias("_k1"), F.col("rank").alias("_k2"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("_k1").asc(), F.col("_k2").asc()
    )
    return (
        merged.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "id", "score", "rank")
    )
