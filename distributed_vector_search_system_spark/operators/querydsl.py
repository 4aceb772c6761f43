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
    {"dis_max":   {"queries": [<match | bool nodes>],    # best clause
                   "tie_breaker": 0.0}}                  # wins

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
    "match", "match_phrase", "match_phrase_prefix", "bool", "fuzzy",
    "wildcard", "prefix", "multi_match",
)
_NODES = _LEAVES + (
    "function_score", "boosting", "constant_score", "dis_max", "ids",
    "more_like_this",
)


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


_FILTER_KINDS = ("range", "term", "terms", "exists")


def _filter_predicate(filters) -> "F.Column":
    """ES filter-context clauses → one ANDed metadata predicate
    (round 12).  Supported::

        {"range":  {field: {"gte"|"gt"|"lte"|"lt": v, ...}}}
        {"term":   {field: value}}          # exact metadata equality
        {"terms":  {field: [v1, v2, ...]}}  # IN-list (round 13)
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
        elif kind == "terms":
            (field,) = body.keys()
            values = list(body[field])
            if not values:
                raise ValueError("terms takes a non-empty value list")
            pred = pred & F.col(field).isin(values)
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

    if kind == "match_phrase_prefix":
        # search-as-you-type (round 13 addendum): the last element is
        # a PREFIX completed from the corpus vocabulary — the
        # disjunction rides the exact anchor intersection for free
        # (operators/phrase.phrase_prefix_topk)
        from .phrase import phrase_prefix_topk

        q = spark.createDataFrame(
            [(0, [str(t) for t in body["terms"]])],
            "query_id long, phrase array<string>",
        )
        return phrase_prefix_topk(
            docs, q, k,
            max_expansions=int(body.get("max_expansions", 10)),
            doc_id_col=doc_id_col, text_col=text_col,
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

    if kind == "ids":
        # ES ids query (round 13): fetch THESE documents — a
        # constant-score page over the listed ids (absent ids are
        # silently skipped, the ES contract), ties on id.  The id
        # list is RPC-bounded, so the isin predicate pushes to the
        # scan like any term filter.
        from .retrieval import _score_ranked

        values = list(body.get("values") or ())
        if not values:
            raise ValueError("ids needs a non-empty 'values' list")
        boost = float(body.get("boost", 1.0))
        scored = docs.filter(F.col(doc_id_col).isin(values)).select(
            _zero_qid(doc_id_col),
            F.col(doc_id_col).alias("id"),
            F.round(F.lit(boost), 6).alias("score"),
        )
        return _score_ranked(scored, k, "score")

    if kind == "more_like_this":
        # ES more_like_this (round 13 addendum): "find documents like
        # THIS one" — delegates to the oracled MLT operator (tf-idf
        # representative-term selection from the seed, df gates, BM25
        # second pass, seed excluded).  The DSL node takes ONE like id
        # (its page is the single-query contract, query_id remapped to
        # 0); the multi-seed batch form is the operator itself /
        # bm25_mlt_topk, multi-query-native.
        from .mlt import bm25_mlt_topk

        like = body.get("like_ids") or ()
        if len(like) != 1:
            raise ValueError(
                "more_like_this takes exactly one like id in the DSL "
                "(use operators.mlt.bm25_mlt_topk for multi-seed "
                "batches)"
            )
        seeds = spark.createDataFrame([(like[0],)], "seed_id long")
        page = bm25_mlt_topk(
            docs, seeds, k,
            max_query_terms=int(body.get("max_query_terms", 10)),
            min_df=int(body.get("min_doc_freq", 1)),
            max_df=body.get("max_doc_freq"),
            include_seed=bool(body.get("include", False)),
            doc_id_col=doc_id_col, text_col=text_col,
        )
        return page.select(
            _zero_qid(), "id", F.round("score", 6).alias("score"), "rank"
        )

    if kind == "dis_max":
        # ES dis_max (round 13): per doc, the BEST sub-query's score
        # plus tie_breaker × the others' — the classic multi-clause
        # disambiguator ("best field wins, near-ties nudge").  Honest
        # subset: sub-queries are match / bool nodes (the full-scored-
        # set kinds; a ranked-only node's page has no total score
        # set to maximize over).  One UNION of the legs' (id, score)
        # rows + ONE hash aggregate — max + tie·(sum − max) needs no
        # per-leg join, the knn-fusion discipline.
        from .retrieval import _score_ranked

        subs = body.get("queries") or ()
        if not subs:
            raise ValueError("dis_max needs a non-empty 'queries' list")
        tie = float(body.get("tie_breaker", 0.0))
        if not 0.0 <= tie <= 1.0:
            raise ValueError("tie_breaker must be in [0, 1]")
        legs = [
            _query_scores(
                docs, sub, doc_id_col=doc_id_col, text_col=text_col
            )
            for sub in subs
        ]
        allc = legs[0]
        for leg in legs[1:]:
            allc = allc.unionByName(leg)
        scored = allc.groupBy("id").agg(
            F.round(
                F.max("score")
                + F.lit(tie) * (F.sum("score") - F.max("score")),
                6,
            ).alias("score")
        ).select(_zero_qid(), "id", "score")
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
    "range",
    "filters",
    "missing",
    "filter",
    "global",
    "extended_stats",
    "stats",
    "percentiles",
    "cardinality",
    "significant_terms",
    "avg",
    "sum",
    "min",
    "max",
    "value_count",
    "boxplot",
    "weighted_avg",
    "percentile_ranks",
    "sampler",
    "multi_terms",
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

#: bucket kinds allowed NESTED inside a ``terms`` parent (round 13,
#: VERDICT r12 item 3) — "per source, the daily histogram".  The
#: composite (parent, child) key feeds ONE hash aggregate; the
#: parent's size/order shaping is a second aggregate over the
#: BUCKET-COUNT-sized output, never a second pass over the data.
_NESTED_BUCKET_KINDS = ("terms", "histogram", "date_histogram")


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


def _bucket_key_expr(ckind: str, cbody: dict):
    """The map-side bucket-key expression for a nested bucket kind —
    shared with the top-level operators' key math (terms: the raw
    field; histogram: ``origin + floor((v−origin)/width)·width``;
    date_histogram: ``date_trunc``, weeks starting Monday — the
    ES/ISO and DuckDB convention that keeps oracles exact)."""
    if ckind == "terms":
        return F.col(cbody["field"])
    if ckind == "histogram":
        width = float(cbody["interval"])
        if width <= 0:
            raise ValueError("histogram interval must be > 0")
        origin = float(cbody.get("offset", 0.0))
        v = F.col(cbody["field"]).cast("double")
        return F.lit(origin) + F.floor(
            (v - F.lit(origin)) / F.lit(width)
        ) * F.lit(width)
    from .aggregations import _INTERVALS

    interval = cbody.get("calendar_interval", "day")
    if interval not in _INTERVALS:
        raise ValueError(f"interval must be one of {_INTERVALS}")
    return F.date_trunc(interval, F.col(cbody["field"]))


def _nested_bucket_agg(
    restricted: DataFrame,
    parent_body: dict,
    child_name: str,
    child_spec: dict,
) -> DataFrame:
    """Bucket-in-bucket (round 13, VERDICT r12 item 3): a ``terms`` /
    ``histogram`` / ``date_histogram`` agg nested inside a ``terms``
    parent — ES's most common faceting shape ("per source, the daily
    histogram").  Output is LONG format: ``(value, <child_name>, n,
    <child metric cols...>)``, one row per (parent, child) composite
    bucket, ``n`` the composite doc count.

    Semantics (the ES contract, long-formatted):

    - the child may carry its own nested METRIC aggs — computed per
      composite bucket (one more expression in the same aggregate);
      a third bucket level raises (compose ``composite_buckets`` for
      deep paging instead).
    - parent ``size``: top-N parents by total doc count (desc, key
      asc) — totals are the SUM of the composite counts, i.e. docs
      carrying a child key (a NULL child field forms its own bucket
      for terms/date_histogram, and is dropped for histogram, the
      numeric operators' convention).
    - child ``size`` (terms child): top-N child buckets PER PARENT by
      composite count (desc, key asc) — one window over the
      bucket-count-sized composite output.

    Scale: ONE hash aggregate over the composite key (map-side
    combine; exchange carries composite-bucket cardinality only); the
    parent shaping re-aggregates the composite OUTPUT (bucket-sized)
    and semi-joins back broadcast — the data is never re-scanned."""
    ckinds = set(child_spec) - {"aggs"}
    if len(ckinds) != 1 or next(iter(ckinds)) not in _NESTED_BUCKET_KINDS:
        raise ValueError(
            f"a nested bucket agg is a single-key dict from "
            f"{_NESTED_BUCKET_KINDS} (plus an optional nested metric "
            f"'aggs'); got {child_spec!r}"
        )
    (ckind,) = ckinds
    cbody = child_spec[ckind]
    grand = child_spec.get("aggs") or {}
    for gname, gspec in grand.items():
        gk = set(gspec) - {"aggs"} if isinstance(gspec, dict) else set()
        if gk & set(_NESTED_BUCKET_KINDS):
            raise ValueError(
                "bucket nesting is two levels (terms parent + one "
                f"bucket child); {gname!r} nests a third bucket level"
            )
    gcols = [_sub_agg_expr(n, s) for n, s in grand.items()]
    src = restricted
    if ckind == "histogram":
        src = src.filter(F.col(cbody["field"]).isNotNull())
    comp = src.groupBy(
        F.col(parent_body["field"]).alias("value"),
        _bucket_key_expr(ckind, cbody).alias(child_name),
    ).agg(F.count("*").alias("n"), *gcols)
    psize = parent_body.get("size")
    if psize is not None:
        totals = comp.groupBy("value").agg(F.sum("n").alias("_tot"))
        keep = totals.orderBy(
            F.col("_tot").desc(), F.col("value").asc()
        ).limit(int(psize))
        comp = comp.join(F.broadcast(keep.select("value")), "value", "left_semi")
    csize = cbody.get("size") if ckind == "terms" else None
    if csize is not None:
        from pyspark.sql import Window

        w = Window.partitionBy("value").orderBy(
            F.col("n").desc(), F.col(child_name).asc()
        )
        comp = (
            comp.withColumn("_cr", F.row_number().over(w))
            .filter(F.col("_cr") <= int(csize))
            .drop("_cr")
        )
    return comp


def _apply_pipeline(out: DataFrame, pipeline, default_of: str) -> DataFrame:
    """ES pipeline aggs over a bucket series (round 13 addendum):
    ``{"pipeline": {"of": "n", "window": 3}}`` on a histogram /
    date_histogram node appends ``cum_sum`` / ``deriv`` /
    ``moving_avg`` via the oracled ``pipeline_aggs`` operator — the
    windows run over the BUCKET-sized output ordered by bucket key (a
    single global series is one partition by construction, the
    operator's documented shape)."""
    if pipeline is None:
        return out
    from .aggregations import pipeline_aggs

    of = str(pipeline.get("of", default_of))
    if of not in out.columns:
        raise ValueError(
            f"pipeline 'of' must name a bucket column ({out.columns}); "
            f"got {of!r}"
        )
    return pipeline_aggs(
        out, of, order_col="bucket",
        window=int(pipeline.get("window", 3)),
    )


def _one_agg(
    restricted: DataFrame,
    spec: dict,
    *,
    docs: DataFrame = None,
    match_ids: DataFrame = None,
    query: dict = None,
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
    kinds = set(spec) - {"aggs", "pipeline"}
    if len(kinds) != 1:
        raise ValueError(
            f"an agg node is a single-key dict from {_AGG_KINDS} (plus an "
            f"optional nested 'aggs' / 'pipeline'); got {spec!r}"
        )
    (kind,) = kinds
    body = spec[kind]
    pipeline = spec.get("pipeline")
    if pipeline is not None and kind not in ("histogram", "date_histogram"):
        raise ValueError(
            "pipeline aggs run over an ordered bucket series — they "
            f"compose with histogram / date_histogram, not {kind!r}"
        )
    subs = spec.get("aggs") or {}
    if subs and kind not in (
        "terms", "histogram", "date_histogram", "range", "filters",
        "missing", "filter", "global", "sampler", "multi_terms",
    ):
        raise ValueError(
            f"nested aggs compose with bucket kinds only; {kind!r} is a "
            "metric"
        )
    top_hit_subs = {
        n: s
        for n, s in subs.items()
        if isinstance(s, dict) and "top_hits" in s
    }
    if top_hit_subs:
        # ES top_hits sub-agg (round 13): per-bucket exemplar rows —
        # "for each source, the 2 longest documents".  Delegates to
        # the oracled top_hits operator with the parent field as the
        # bucket key; the window's partial top-k (WindowGroupLimit)
        # truncates per bucket before the exchange.
        from .aggregations import top_hits

        if kind != "terms":
            raise ValueError(
                "top_hits nests inside a terms parent only; the parent "
                f"here is {kind!r}"
            )
        if len(subs) != 1:
            raise ValueError(
                "a top_hits sub-agg must be the parent's only sub-agg "
                "(its rows are exemplars, not bucket metrics)"
            )
        ((_, th_spec),) = top_hit_subs.items()
        th = th_spec["top_hits"]
        sort = th.get("sort") or ()
        if len(sort) != 1 or len(sort[0]) != 1:
            raise ValueError(
                "top_hits takes exactly one {field: 'asc'|'desc'} sort "
                "entry (the determinism convention)"
            )
        (sort_col,), (order,) = sort[0].keys(), sort[0].values()
        if order not in ("asc", "desc"):
            raise ValueError(f"sort order must be asc|desc; got {order!r}")
        fields = [str(c) for c in th.get("fields", (doc_id_col,))]
        out_cols = list(dict.fromkeys([*fields, sort_col]))
        return top_hits(
            restricted, int(th.get("size", 3)), sort_col,
            by=(body["field"],), tie_col=doc_id_col,
            ascending=(order == "asc"),
        ).select(F.col(body["field"]).alias("value"), *out_cols, "rank")
    bucket_subs = {
        n: s
        for n, s in subs.items()
        if isinstance(s, dict)
        and (set(s) - {"aggs"}) & set(_NESTED_BUCKET_KINDS)
    }
    if bucket_subs:
        # bucket-in-bucket (round 13, VERDICT r12 item 3)
        if kind != "terms":
            raise ValueError(
                "bucket sub-aggregations nest inside a terms parent "
                f"only; the parent here is {kind!r}"
            )
        if len(subs) != 1:
            raise ValueError(
                "a bucket sub-agg must be the parent's ONLY sub-agg "
                "(sibling metrics aggregate per PARENT bucket in ES — "
                "long format cannot carry both levels in one frame; "
                "issue a second agg node for the parent-level metrics)"
            )
        ((child_name, child_spec),) = bucket_subs.items()
        return _nested_bucket_agg(restricted, body, child_name, child_spec)
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

        out = histogram_facet(
            restricted, body["field"],
            width=float(body["interval"]),
            origin=float(body.get("offset", 0.0)),
            extra_aggs=sub_cols,
        )
        return _apply_pipeline(out, pipeline, "count")
    if kind == "date_histogram":
        from .aggregations import date_histogram

        out = date_histogram(
            restricted, body["field"],
            interval=body.get("calendar_interval", "day"),
            extra_aggs=sub_cols,
        )
        return _apply_pipeline(out, pipeline, "n")
    if kind == "range":
        # ES range agg (round 13): ranges are [from, to) and may
        # OVERLAP — a doc lands in every range it satisfies, so the
        # bucket key cannot be a single group-by expression.  Each
        # doc's memberships become a map-side key ARRAY (one when()
        # per range — the range list is a request constant), exploded
        # and fed to ONE hash aggregate; sub-agg metrics ride along.
        v = F.col(body["field"]).cast("double")
        branches = []
        for r in body["ranges"]:
            frm, to = r.get("from"), r.get("to")
            if frm is None and to is None:
                raise ValueError("a range needs 'from' and/or 'to'")
            key = r.get("key") or (
                f"{'*' if frm is None else float(frm)}"
                f"-{'*' if to is None else float(to)}"
            )
            cond = v.isNotNull()
            if frm is not None:
                cond = cond & (v >= float(frm))
            if to is not None:
                cond = cond & (v < float(to))
            branches.append(F.when(cond, F.lit(key)))
        tagged = restricted.withColumn(
            "key", F.explode(F.array_compact(F.array(*branches)))
        )
        return tagged.groupBy("key").agg(
            F.count("*").alias("n"), *sub_cols
        )
    if kind == "filters":
        # ES filters agg (round 13): NAMED filter-context buckets
        # ("cheap" / "mid" / "premium") — possibly overlapping, same
        # membership-array explode + one hash aggregate as range.
        # Each name maps to one clause or a clause list (ANDed), the
        # _filter_predicate metadata grammar.
        named = body["filters"]
        if not named:
            raise ValueError("filters needs at least one named filter")
        branches = [
            F.when(
                _filter_predicate(cls if isinstance(cls, list) else [cls]),
                F.lit(str(name)),
            )
            for name, cls in named.items()
        ]
        tagged = restricted.withColumn(
            "key", F.explode(F.array_compact(F.array(*branches)))
        )
        return tagged.groupBy("key").agg(
            F.count("*").alias("n"), *sub_cols
        )
    if kind == "missing":
        # ES missing agg (round 13): the docs WITHOUT a value — the
        # data-quality bucket every curation dashboard wants
        return (
            restricted.filter(F.col(body["field"]).isNull())
            .groupBy()
            .agg(F.count("*").alias("n"), *sub_cols)
        )
    if kind == "filter":
        # ES filter agg (round 13): ONE further-narrowed bucket with
        # its sub-agg metrics — the single-bucket sibling of filters;
        # the body is one filter-context clause or a clause list
        return (
            restricted.filter(
                _filter_predicate(body if isinstance(body, list) else [body])
            )
            .groupBy()
            .agg(F.count("*").alias("n"), *sub_cols)
        )
    if kind == "global":
        # ES global agg (round 13): metrics over the WHOLE corpus,
        # ignoring the query — the faceting companion ("matched 12 of
        # 10M; corpus-wide avg for comparison")
        return docs.groupBy().agg(F.count("*").alias("n"), *sub_cols)
    if kind in ("avg", "sum", "min", "max", "value_count"):
        # top-level single-metric aggs (round 13): one aggregate
        # expression, column named "value" (the ES response shape)
        return restricted.groupBy().agg(_sub_agg_expr("value", {kind: body}))
    if kind == "boxplot":
        from .aggregations import boxplot

        return boxplot(
            restricted, body["field"],
            exact=bool(body.get("exact", True)),
            accuracy=int(body.get("accuracy", 10_000)),
        )
    if kind == "weighted_avg":
        from .aggregations import weighted_avg

        return weighted_avg(
            restricted, body["value"]["field"], body["weight"]["field"]
        )
    if kind == "percentile_ranks":
        from .aggregations import percentile_ranks

        return percentile_ranks(
            restricted, body["field"],
            [float(x) for x in body["values"]],
        )
    if kind == "multi_terms":
        # ES multi_terms (round 13 addendum): terms over a COMPOSITE
        # of several fields — one hash aggregate keyed on the field
        # tuple, long format (one column per field), the ES order
        # contract (count desc, then the key tuple asc) applied to the
        # bucket-count-sized output only
        fields = [str(t["field"]) for t in body.get("terms", ())]
        if len(fields) < 2:
            raise ValueError("multi_terms needs at least two fields")
        out = restricted.groupBy(*fields).agg(F.count("*").alias("n"), *sub_cols)
        size = body.get("size")
        if size is not None:
            out = out.orderBy(
                F.col("n").desc(), *[F.col(f).asc() for f in fields]
            ).limit(int(size))
        return out
    if kind == "sampler":
        # ES sampler agg (round 13): sub-agg metrics over only the
        # TOP-``shard_size`` scored docs of the match set — "what do
        # the BEST matches look like" (the global, exact version of
        # ES's per-shard heuristic; requires a match/bool query for
        # the scores).  The scored cut is k-bounded, so it broadcasts
        # into the restriction like any page.
        if query is None or _node_type(query) not in _MATCH_SET_KINDS:
            raise ValueError(
                "sampler needs a match/bool query for its scores"
            )
        from pyspark.sql import Window

        n = int(body.get("shard_size", 100))
        if n < 1:
            raise ValueError("shard_size must be >= 1")
        scored = _query_scores(
            docs, query, doc_id_col=doc_id_col, text_col=text_col
        ).withColumn("score", F.round("score", 6))
        w = Window.partitionBy(_zero_qid()).orderBy(
            F.col("score").desc(), F.col("id").asc()
        )
        top = (
            scored.withColumn("_r", F.row_number().over(w))
            .filter(F.col("_r") <= n)
            .select("id")
        )
        sampled = restricted.join(
            F.broadcast(top),
            restricted[doc_id_col] == top["id"],
            "left_semi",
        )
        return sampled.groupBy().agg(F.count("*").alias("n"), *sub_cols)
    if kind == "extended_stats":
        from .aggregations import extended_stats

        return extended_stats(restricted, body["field"])
    if kind == "percentiles":
        from .aggregations import percentiles

        # round 13 (ADVICE r12 item 2): the request body picks the
        # tier — "exact": false is the bounded-memory GK sketch (the
        # serving tier the exact-tier guard points at), with the
        # "accuracy" knob passed through
        return percentiles(
            restricted, body["field"],
            tuple(body.get("percents", (50.0, 90.0, 99.0))),
            exact=bool(body.get("exact", True)),
            accuracy=int(body.get("accuracy", 10_000)),
        )
    if kind == "cardinality":
        from .aggregations import cardinality

        # round 13 (ADVICE r12 item 2): "exact": false — or ES's own
        # "precision_threshold" key — selects the HLL++ tier (ES
        # cardinality is approximate by contract; precision_threshold
        # maps to a relative-error knob, rsd ≈ 1/√threshold, the
        # HLL++ registers↔error relation)
        exact = bool(body.get("exact", "precision_threshold" not in body))
        rsd = float(body.get("rsd", 0.05))
        if "precision_threshold" in body:
            rsd = min(max(1.0 / float(body["precision_threshold"]) ** 0.5,
                          0.01), 0.4)
        return cardinality(restricted, body["field"], exact=exact, rsd=rsd)
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


def _knn_prefilter(
    docs: DataFrame,
    vectors: DataFrame,
    flt,
    *,
    doc_id_col: str,
    text_col: str,
    vector_id_col: str,
) -> DataFrame:
    """ES 8 kNN ``filter`` (round 13, VERDICT r12 item 2): restrict
    the CANDIDATE vectors BEFORE the top-k cut — pre-filtered ANN, the
    canonical "search my documents" shape (a post-cut filter would
    return fewer than k survivors; ES applies knn.filter during the
    graph search for the same reason).

    ``flt`` is either a list of filter-context clauses (``range`` /
    ``term`` / ``exists``) or one ``match`` / ``bool`` query node.

    Clause lists split by where their fields live: clauses whose
    fields are ON the vectors frame become a map-side predicate on
    ``vectors`` itself — Catalyst pushes it into the vector scan
    (PushedFilters, plan-locked in tests), which on the partitioned
    IVF tier composes with partition pruning; clauses over document
    metadata (and match/bool nodes) evaluate against ``docs`` and
    semi-join the candidate set by id.  Either way the restriction
    sits BELOW the top-k window."""
    if isinstance(flt, dict):
        ids = _match_ids(docs, flt, doc_id_col=doc_id_col, text_col=text_col)
        return vectors.join(
            ids, vectors[vector_id_col] == ids["id"], "left_semi"
        )
    clauses = list(flt)
    vcols = set(vectors.columns)

    def _fields(clause: dict) -> set:
        (ckind,) = clause.keys()
        body = clause[ckind]
        return {body["field"]} if ckind == "exists" else set(body.keys())

    local = [c for c in clauses if _fields(c) <= vcols]
    remote = [c for c in clauses if not (_fields(c) <= vcols)]
    if local:
        vectors = vectors.filter(_filter_predicate(local))
    if remote:
        ids = docs.filter(_filter_predicate(remote)).select(
            F.col(doc_id_col).alias("id")
        )
        vectors = vectors.join(
            ids, vectors[vector_id_col] == ids["id"], "left_semi"
        )
    return vectors


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
    restrict_ids: DataFrame | None = None,
) -> DataFrame:
    """ES top-level ``knn`` alongside ``query`` (round 12): combined
    score = BM25 + ``boost ·`` vector similarity, final top ``k``::

        {"query_vector": [...], "k": 10, "boost": 1.0,
         "filter": [...] | <match | bool node>}   # pre-filtered ANN

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
    if knn.get("filter") is not None:
        vectors = _knn_prefilter(
            docs, vectors, knn["filter"],
            doc_id_col=doc_id_col, text_col=text_col,
            vector_id_col=(
                "id"
                if "distance" in vectors.columns
                else vector_id_col
            ),
        )
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
    if restrict_ids is not None:
        # post_filter over hybrid hits (round 13, VERDICT r12 item 3):
        # the ES contract applies post_filter to the FINAL hit list —
        # scores unchanged, both legs' contributions kept, the top-k
        # cut taken over the surviving docs (so the page refills from
        # below the cut, unlike a post-cut filter)
        combined = combined.join(
            restrict_ids.select("id"), "id", "left_semi"
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
    persist_match_set: bool = False,
) -> dict:
    """One full ES-shaped search request::

        {"query":       <query node>,            # required
         "size":        10,                      # hit-page size
         "from":        0,                       # offset pagination
         "fields":      ["source", "lang"],      # doc values on hits
         "track_total_hits": true,               # exact match count
         "collapse":    {"field": "source",      # one best hit per
                         "per_group": 1},        # group value
         "min_score":   1.5,                     # score floor on hits
         "explain":     true,                    # per-term BM25 decomp
         "suggest":     {name: {"text": "...",   # term suggester
                         "term": {"max_edits": 2, "size": 3}}},
         "highlight":   {"window": 8},           # per-hit snippets
         "aggs":        {name: <agg node>, ...}, # over the MATCH SET
         "post_filter": <match | bool node>,     # hits only, not aggs
         "sort":        [{"field": "asc"|"desc"}, ...],  # field sort
         "search_after": [v1, ..., last_id],     # sorted-page cursor
         "rescore":     {"window_size": N,       # second-pass re-rank
                         "query": {...}},        # (_apply_rescore)
         "knn":         {"query_vector": [...],  # hybrid text+vector
                         "k": 10, "boost": 1.0,  # (_knn_fused)
                         "filter": [...]}}       # pre-filtered ANN
                                                 # (_knn_prefilter)

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

    Scale: the match set is declared ONCE as an id frame and
    semi-joins restrict the agg / sort inputs; with
    ``persist_match_set=True`` it is also COMPUTED once
    (``persist(MEMORY_AND_DISK)`` — a request with K agg nodes +
    total_hits otherwise re-evaluates the match subtree per actioned
    frame; the returned ``"release"`` handle unpersists it after the
    caller has actioned the request's frames).  The semi joins are NOT
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
        "track_total_hits", "collapse", "min_score", "suggest",
        "explain",
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
        if sort is not None or rescore is not None:
            raise ValueError(
                "knn fusion composes with query + aggs + post_filter "
                "only (sort / rescore do not apply to a hybrid page)"
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

    min_score = request.get("min_score")
    if min_score is not None:
        min_score = float(min_score)
        if sort is not None:
            # a field sort skips scoring entirely — there is no score
            # to threshold (the ES behavior: min_score needs scores)
            raise ValueError("min_score does not apply to a field sort")
    explain = bool(request.get("explain"))
    if explain and (sort is not None or knn is not None):
        raise ValueError(
            "explain decomposes BM25 relevance — it does not apply to "
            "a field sort or the knn hybrid page"
        )
    if explain and _node_type(query) not in _MATCH_SET_KINDS:
        raise ValueError(
            f"explain requires a match-set query node ({_MATCH_SET_KINDS})"
        )
    collapse = request.get("collapse")
    if collapse is not None:
        if not isinstance(collapse, dict) or "field" not in collapse:
            raise ValueError(
                "collapse takes {'field': name, 'per_group': 1}"
            )
        if sort is not None or knn is not None or rescore is not None:
            # ES's own limits: collapse re-ranks by relevance, and is
            # rejected alongside rescore; the hybrid page has no
            # full scored set to collapse exactly
            raise ValueError(
                "collapse composes with the relevance page only (not "
                "sort / knn / rescore)"
            )
    track_total = bool(request.get("track_total_hits"))
    needs_set = (
        bool(aggs) or post_filter is not None or sort is not None
        or track_total or collapse is not None
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
    if persist_match_set and match_ids is not None:
        # round 13 (VERDICT r12 item 5): the match-set id frame feeds
        # the hit page, EVERY aggregation, and total_hits — each a
        # separate lazy plan, so a request with K agg nodes would
        # otherwise re-evaluate the match subtree ~K+2 times when the
        # caller actions them all (at corpus scale: one corpus scan per
        # evaluation).  persist() computes it once, like the
        # reference's Q5 caches its result (src/rpc/
        # search_service_impl.cc single-result discipline); the caller
        # releases executor storage via the returned "release" handle
        # after actioning the request's frames.
        from pyspark import StorageLevel

        match_ids = match_ids.persist(StorageLevel.MEMORY_AND_DISK)

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
                docs=docs, match_ids=match_ids, query=query,
                doc_id_col=doc_id_col, text_col=text_col,
            )
            for name, spec in aggs.items()
        }

    # the hit page's admissible set: match set ∩ post_filter set
    hit_ids = match_ids
    pf = None
    if post_filter is not None:
        pf = _match_ids(
            docs, post_filter, doc_id_col=doc_id_col, text_col=text_col
        )
        if hit_ids is not None:
            hit_ids = hit_ids.join(pf, "id", "left_semi")

    if knn is not None:
        # post_filter restricts the hybrid hits by ITS predicate alone
        # (a knn-leg doc outside the query's match set is still a hit
        # — the ES sum contract), so the fused page takes pf, not the
        # match-set intersection
        hits = _knn_fused(
            docs, vectors, query, knn, k,
            doc_id_col=doc_id_col, text_col=text_col,
            vector_id_col=vector_id_col, vector_col=vector_col,
            restrict_ids=pf,
        )
    elif collapse is not None:
        # ES field collapsing (round 13): one best hit per group value
        # (``per_group`` generalizes to N), exact over the FULL scored
        # match set like ES — not a collapse of a pre-cut page, which
        # would lose whole groups.  Inline rather than
        # ``collapse.collapse_topk`` because that operator's attribute
        # scan broadcasts k-bounded hit ids, while this set is
        # match-set-sized: here the group attribute joins the scored
        # set un-hinted (AQE picks the build side) and the per-group
        # window's WindowGroupLimit truncates before the exchange.
        # Output matches collapse_topk: (query_id, id, group, score,
        # rank); NULL groups form their own "null" bucket.
        from pyspark.sql import Window

        from .retrieval import bm25_scores

        body_q = query[_node_type(query)]
        rank_terms = sorted(
            {*body_q.get("must", ()), *body_q.get("should", ())}
            if _node_type(query) == "bool"
            else set(body_q["terms"])
        )
        if not rank_terms:
            raise ValueError("collapse needs a positive clause to rank on")
        per_group = int(collapse.get("per_group", 1))
        if per_group < 1:
            raise ValueError("per_group must be >= 1")
        scored = bm25_scores(
            docs, _one_query(docs.sparkSession, rank_terms),
            doc_id_col=doc_id_col, text_col=text_col,
            filter_ids=hit_ids,
        ).withColumn("score", F.round("score", 6))
        attrs = docs.select(
            F.col(doc_id_col).alias("id"),
            F.coalesce(
                F.col(collapse["field"]).cast("string"), F.lit("null")
            ).alias("group"),
        )
        joined = scored.join(attrs, "id")
        wg = Window.partitionBy("query_id", "group").orderBy(
            F.col("score").desc(), F.col("id").asc()
        )
        best = (
            joined.withColumn("_g", F.row_number().over(wg))
            .filter(F.col("_g") <= per_group)
            .drop("_g")
        )
        wq = Window.partitionBy("query_id").orderBy(
            F.col("score").desc(), F.col("id").asc()
        )
        hits = (
            best.withColumn("rank", F.row_number().over(wq))
            .filter(F.col("rank") <= k)
            .select("query_id", "id", "group", "score", "rank")
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
        if "phrase_tf" in hits.columns:
            # a match_phrase primary ranks by phrase frequency; expose
            # it as the first-pass relevance score so the rescore
            # combiners apply (round 13, ADVICE r12 item 4)
            hits = hits.select(
                "query_id", "id",
                F.col("phrase_tf").cast("double").alias("score"), "rank",
            )
        hits = _apply_rescore(
            docs, hits, rescore, k,
            doc_id_col=doc_id_col, text_col=text_col,
        )
    if min_score is not None:
        # ES min_score (round 13): drop hits scoring below the
        # threshold.  Every scored page here is rank-ordered by score
        # desc, so the filter keeps a PREFIX of ranks — ranks stay
        # contiguous with no re-rank, and it commutes with the from
        # slice below.
        hits = hits.filter(F.col("score") >= F.lit(min_score))
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
    if persist_match_set and match_ids is not None:
        out["release"] = match_ids.unpersist

    if track_total:
        # ES track_total_hits: the EXACT size of the full match set,
        # independent of the page — one count over the admissible ids.
        # Under min_score the total counts the SCORE-QUALIFIED set
        # (the ES contract: min_score affects the total), so it counts
        # the full scored set past the threshold instead.
        if min_score is not None:
            out["total_hits"] = (
                _query_scores(
                    docs, query, doc_id_col=doc_id_col, text_col=text_col
                )
                .filter(F.round("score", 6) >= F.lit(min_score))
                .agg(F.count("*").alias("total_hits"))
            )
        else:
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
        terms = _highlight_terms(query, kind)
        out["highlight"] = best_window_snippets(
            docs, _one_query(docs.sparkSession, terms),
            int(highlight.get("window", 8)),
            hits=hits.select("query_id", "id"),
            doc_id_col=doc_id_col, text_col=text_col,
        )

    if explain:
        # ES ?explain=true (round 13): the per-term BM25 decomposition
        # of every hit on the page — the k-bounded pairs frame feeds
        # the oracled bm25_explain operator (weights sum back to the
        # ranked score, its tested contract)
        from .termvectors import bm25_explain

        body_q = query[_node_type(query)]
        rank_terms = sorted(
            {*body_q.get("must", ()), *body_q.get("should", ())}
            if _node_type(query) == "bool"
            else set(body_q["terms"])
        )
        out["explanation"] = bm25_explain(
            docs, _one_query(docs.sparkSession, rank_terms),
            hits.select("query_id", "id"),
            doc_id_col=doc_id_col, text_col=text_col,
        )

    suggest = request.get("suggest")
    if suggest is not None:
        # ES suggest section (round 13): the term suggester —
        # "did you mean" candidates from the corpus vocabulary via the
        # oracled spell operator; each named suggester gets its own
        # frame (query_id 0, the request convention)
        from .fuzzy import corpus_vocabulary
        from .spell import spell_suggestions

        vocab = corpus_vocabulary(
            docs, doc_id_col=doc_id_col, text_col=text_col
        )
        out["suggest"] = {}
        for name, body in suggest.items():
            if not isinstance(body, dict) or "term" not in body:
                raise ValueError(
                    f"suggester {name!r}: only the 'term' suggester is "
                    "implemented — {'text': ..., 'term': {...}}"
                )
            text = body.get("text")
            if not text:
                raise ValueError(f"suggester {name!r} needs 'text'")
            term = body["term"]
            from ..functions.text import tokens as _tokens

            sq = docs.sparkSession.createDataFrame(
                [(0, str(text))], "query_id long, qtext string"
            ).select("query_id", _tokens("qtext").alias("qterms"))
            out["suggest"][name] = spell_suggestions(
                vocab, sq,
                max_edits=int(term.get("max_edits", 2)),
                top_n=int(term.get("size", 3)),
                min_df=int(term.get("min_doc_freq", 1)),
                suggest_mode=term.get("suggest_mode", "missing"),
            )

    return out


#: query node kinds whose positive terms are extractable for
#: highlighting (round 13, VERDICT r12 item 6 — the snippets operator
#: is term-driven, so any node that CARRIES terms highlights;
#: multi_match highlights its terms over the request's primary text
#: field, and a sloppy phrase highlights its slots as plain terms —
#: the best-window scorer already prefers dense co-occurrence)
_HIGHLIGHT_KINDS = _MATCH_SET_KINDS + ("multi_match", "match_phrase")


def _highlight_terms(query: dict, kind: str) -> list[str]:
    if kind not in _HIGHLIGHT_KINDS:
        raise ValueError(
            "highlight needs the query's terms — use a match, bool, "
            "multi_match, or match_phrase query node"
        )
    body = query[kind]
    if kind == "bool":
        return sorted({*body.get("must", ()), *body.get("should", ())})
    return sorted({str(t) for t in body["terms"]})


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
    if "score" not in window_hits.columns:
        # round 13 (ADVICE r12 item 4): fail with a contract error, not
        # an AnalysisException from the combine expressions below
        raise ValueError(
            "rescore needs a relevance-scored first pass — the hits "
            f"frame has columns {window_hits.columns} but no 'score' "
            "(search_request maps a match_phrase primary's phrase_tf "
            "to score before rescoring)"
        )
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


# ---------------------------------------------------------------------------
# batch msearch (round 13, VERDICT r12 item 4)

#: agg kinds msearch can label per-request in ONE grouped aggregate
#: (query_id joins the group key; bucket-in-bucket and
#: significant_terms stay single-request — their backgrounds are
#: corpus-global, not per-request)
_MSEARCH_AGG_KINDS = (
    "terms",
    "histogram",
    "date_histogram",
    "extended_stats",
    "stats",
    "percentiles",
    "cardinality",
)


def _msearch_translate(requests):
    """Driver-side translation of the N request bodies into plain rows
    (N is RPC-bounded — this is request parsing, not data work).
    Returns (constraint rows, meta rows, rank-terms rows, aggs-by-name)."""
    cons, meta, qrows = [], [], []
    aggs_by_name: dict = {}
    for i, req in enumerate(requests):
        if not isinstance(req, dict) or "query" not in req:
            raise ValueError(f"request {i} needs a 'query' node")
        unknown = set(req) - {"query", "size", "aggs", "from"}
        if unknown:
            raise ValueError(
                f"msearch request {i} supports query/size/aggs/from "
                f"only; got {sorted(unknown)} (compose sort/knn/rescore/"
                "post_filter via search_request per request)"
            )
        query = req["query"]
        kind = _node_type(query)
        if kind not in _MATCH_SET_KINDS:
            raise ValueError(
                f"msearch request {i}: query must be a match-set node "
                f"({_MATCH_SET_KINDS}); got {kind!r}"
            )
        body = query[kind]
        if kind == "match":
            must, should, must_not = (), tuple(body["terms"]), ()
            min_should = 1
        else:
            if body.get("filter"):
                raise ValueError(
                    f"msearch request {i}: bool filter clauses are "
                    "single-request (heterogeneous metadata predicates "
                    "do not share one plan); use search_request"
                )
            must = tuple(body.get("must", ()))
            should = tuple(body.get("should", ()))
            must_not = tuple(body.get("must_not", ()))
            min_should = int(body.get("minimum_should_match", 1))
        rank_terms = sorted({*must, *should})
        if not rank_terms:
            raise ValueError(
                f"msearch request {i} needs a positive clause "
                "(must / should / match terms) to rank on"
            )
        for t in sorted(set(must)):
            cons.append((i, str(t), "must"))
        for t in sorted(set(should)):
            cons.append((i, str(t), "should"))
        for t in sorted(set(must_not)):
            cons.append((i, str(t), "not"))
        frm = int(req.get("from", 0))
        if frm < 0:
            raise ValueError(f"msearch request {i}: from must be >= 0")
        meta.append(
            (
                i,
                len(set(must)),
                min_should if should else 0,
                frm,
                int(req.get("size", 10)),
            )
        )
        qrows.append((i, rank_terms))
        for name, spec in (req.get("aggs") or {}).items():
            prev = aggs_by_name.setdefault(name, (spec, []))
            if prev[0] != spec:
                raise ValueError(
                    f"agg {name!r} appears with two different bodies — "
                    "msearch merges same-named aggs into one labeled "
                    "frame, so bodies must match"
                )
            prev[1].append(i)
    return cons, meta, qrows, aggs_by_name


def _msearch_agg(tagged: DataFrame, spec: dict) -> DataFrame:
    """One labeled aggregation over the query_id-tagged admissible
    rows — the single-request ``_one_agg`` semantics with ``query_id``
    joined into the group key, so every requesting query's buckets
    come out of ONE grouped aggregate."""
    kinds = set(spec) - {"aggs"}
    if len(kinds) != 1 or next(iter(kinds)) not in _MSEARCH_AGG_KINDS:
        raise ValueError(
            f"an msearch agg node is a single-key dict from "
            f"{_MSEARCH_AGG_KINDS} (plus optional nested metric "
            f"'aggs'); got {spec!r}"
        )
    (kind,) = kinds
    body = spec[kind]
    subs = spec.get("aggs") or {}
    if subs and kind not in ("terms", "histogram", "date_histogram"):
        raise ValueError(
            f"nested aggs compose with bucket kinds only; {kind!r} is "
            "a metric"
        )
    sub_cols = [_sub_agg_expr(n, s) for n, s in subs.items()]
    if kind == "terms":
        out = tagged.groupBy(
            "query_id", F.col(body["field"]).alias("value")
        ).agg(F.count("*").alias("n"), *sub_cols)
        size = body.get("size")
        if size is not None:
            from pyspark.sql import Window

            w = Window.partitionBy("query_id").orderBy(
                F.col("n").desc(), F.col("value").asc()
            )
            out = (
                out.withColumn("_r", F.row_number().over(w))
                .filter(F.col("_r") <= int(size))
                .drop("_r")
            )
        return out
    if kind in ("histogram", "date_histogram"):
        src = tagged
        if kind == "histogram":
            src = src.filter(F.col(body["field"]).isNotNull())
        key = _bucket_key_expr(kind, body).alias("bucket")
        return src.groupBy("query_id", key).agg(
            F.count("*").alias("n"), *sub_cols
        )
    if kind in ("extended_stats", "stats"):
        from .aggregations import extended_stats

        out = extended_stats(tagged, body["field"], by=("query_id",))
        if kind == "stats":
            out = out.select(
                "query_id", "n", "min_v", "max_v", "avg_v", "sum_v"
            )
        return out
    if kind == "percentiles":
        from .aggregations import percentiles

        return percentiles(
            tagged, body["field"],
            tuple(body.get("percents", (50.0, 90.0, 99.0))),
            by=("query_id",),
            exact=bool(body.get("exact", True)),
            accuracy=int(body.get("accuracy", 10_000)),
        )
    from .aggregations import cardinality

    return cardinality(
        tagged, body["field"], by=("query_id",),
        exact=bool(body.get("exact", "precision_threshold" not in body)),
    )


def msearch(
    docs: DataFrame,
    requests: list,
    *,
    doc_id_col: str = "doc_id",
    text_col: str = "text",
) -> dict:
    """ES ``_msearch`` (round 13, VERDICT r12 item 4): N independent
    search bodies answered through ONE multi-query plan — the repo's
    Q6 batch-collapse thesis (SURVEY §3.2) applied to the request
    front door, where ``search_request`` pins ``query_id=0`` and N
    user requests would otherwise mean N separate corpus plans.

    Each request is ``{"query": <match | bool node>, "size": 10,
    "from": 0, "aggs": {...}}`` — the match/bool + aggs shape; the
    one ranking window is cut at ``max(from_i + size_i)`` and a
    broadcast per-request trim slices each page (global ranks kept,
    the ``search_request`` convention).  Returns::

        {"hits": DataFrame,             # (query_id, id, score, rank),
                                        # query_id = request index,
                                        # rank ≤ that request's size
         "aggregations": {name: DataFrame}}  # query_id-labeled

    How one plan carries heterogeneous requests: the constraint lists
    become DATA — a broadcast ``(query_id, term, role)`` frame joins
    the corpus's distinct ``(id, term)`` pairs (restricted to the
    union vocabulary BEFORE the join, the ``bm25_scores`` semi-join
    discipline), and one hash aggregate per ``(query_id, id)`` checks
    every request's must / should·minimum_should_match / must_not
    counts at once.  Ranking is one multi-query ``bm25_scores`` call
    with the per-query admissible pairs as ``filter_ids`` (corpus
    statistics corpus-level, the filtered-search contract — scores
    equal search_dsl's per request, tested), then ONE ranking window
    cut to ``max(size_i)`` and a broadcast per-request trim.  Aggs
    requested under the same name (same body) by several requests run
    as ONE grouped aggregate with ``query_id`` in the group key.

    Not in the batch form (documented single-request surface —
    compose ``search_request`` per request): bool metadata ``filter``
    clauses, sort / knn / rescore / post_filter / highlight,
    bucket-in-bucket and significant_terms aggs.

    Scale: request count N is RPC-bounded (the constraint and meta
    frames broadcast); the corpus is tokenized ONCE for admissibility
    and once for scoring regardless of N — exactly the Q6 win — and
    the admissibility aggregate's exchange carries (query, doc) pairs
    restricted to the union vocabulary, not N corpus scans."""
    from ..functions.text import tokens
    from .retrieval import _score_ranked, bm25_scores

    if not requests:
        raise ValueError("msearch needs at least one request")
    spark = docs.sparkSession
    cons, meta, qrows, aggs_by_name = _msearch_translate(requests)
    cons_df = spark.createDataFrame(
        cons, "query_id long, term string, role string"
    )
    meta_df = spark.createDataFrame(
        meta, "query_id long, _nm long, _ms long, _frm int, _k int"
    )
    qframe = spark.createDataFrame(
        qrows, "query_id long, qterms array<string>"
    )

    vocab = cons_df.select("term").distinct()
    tok_pairs = (
        docs.select(
            F.col(doc_id_col).alias("id"),
            F.explode(tokens(text_col)).alias("term"),
        )
        .join(F.broadcast(vocab), "term", "left_semi")
        .distinct()
    )
    per = (
        tok_pairs.join(F.broadcast(cons_df), "term")
        .groupBy("query_id", "id")
        .agg(
            F.count_distinct(
                F.when(F.col("role") == "must", F.col("term"))
            ).alias("_nmh"),
            F.count_distinct(
                F.when(F.col("role") == "should", F.col("term"))
            ).alias("_nsh"),
            F.count(
                F.when(F.col("role") == "not", F.lit(1))
            ).alias("_nnh"),
        )
    )
    adm = (
        per.join(F.broadcast(meta_df), "query_id")
        .filter(
            (F.col("_nmh") == F.col("_nm"))
            & (F.col("_nsh") >= F.col("_ms"))
            & (F.col("_nnh") == 0)
        )
        .select("query_id", "id")
    )

    max_k = max(m[3] + m[4] for m in meta)
    scored = bm25_scores(
        docs, qframe,
        doc_id_col=doc_id_col, text_col=text_col, filter_ids=adm,
    )
    ranked = _score_ranked(
        scored.withColumn("score", F.round("score", 6)), max_k, "score"
    )
    # per-request from+size trim (global ranks kept, the
    # search_request convention): one broadcast join, no second window
    hits = (
        ranked.join(
            F.broadcast(meta_df.select("query_id", "_frm", "_k")),
            "query_id",
        )
        .filter(
            (F.col("rank") > F.col("_frm"))
            & (F.col("rank") <= F.col("_frm") + F.col("_k"))
        )
        .select("query_id", "id", "score", "rank")
    )

    aggregations = {}
    if aggs_by_name:
        tagged_all = (
            adm.alias("_adm")
            .join(
                docs.alias("_d"),
                F.col("_adm.id") == F.col(f"_d.{doc_id_col}"),
                "inner",
            )
            .select(F.col("_adm.query_id").alias("query_id"), "_d.*")
        )
        for name, (spec, qids) in aggs_by_name.items():
            tagged = (
                tagged_all
                if len(qids) == len(requests)
                else tagged_all.filter(F.col("query_id").isin(list(qids)))
            )
            aggregations[name] = _msearch_agg(tagged, spec)

    return {"hits": hits, "aggregations": aggregations}
