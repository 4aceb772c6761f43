"""Query-time synonym expansion, round 10 — the fifth
query-understanding verb.

Fuzzy fixes SPELLING, autocomplete PREFIXES, PRF mines the corpus,
MLT swaps the query for a document; synonyms inject CURATED
equivalences (Lucene/ES ``synonym_graph`` at query time): a
thesaurus ``(term, synonym, weight)`` relation expands each query
term into its synonyms at a discounted weight, and the expanded
weighted query scores through the learned-sparse dot product — the
same two-channel (α original / β expansion) composition as PRF, with
the thesaurus replacing the feedback centroid.  Query-time (rather
than index-time) expansion is the standard trade: the thesaurus can
change daily without touching the index.

Spark-first shape: queries AND thesaurus are small by contract —
the expansion is a broadcast join of the query terms against the
thesaurus, a union with the original channel, and one per-(query,
term) weight sum; the document side is the unmodified
``sparse_scores`` plan (broadcast query vocabulary, semi-restriction
below everything).  No new shuffle shape; deterministic →
exactly SQL-replayable.

A directional thesaurus is the contract (``term → synonym``):
symmetric vocabularies ship both directions; hypernym maps
deliberately don't (expand "laptop"→"computer" without making every
"computer" query match laptops).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .retrieval import _score_ranked
from .sparse import sparse_encode, sparse_scores


def expand_query_terms(
    queries: DataFrame,
    thesaurus: DataFrame,
    *,
    weight: float = 0.5,
    query_id_col: str = "query_id",
    query_terms_col: str = "qterms",
) -> DataFrame:
    """Two-channel expanded query postings —
    ``(query_id, term, weight)``.

    Original terms carry the query-side sublinear tf
    (``1 + ln tf``, the repo's query-encoder convention); each
    expansion term carries ``weight · thesaurus_weight`` per
    (original term, synonym) edge, summed when several query terms
    map to one synonym.  A synonym that IS an original term merges
    into it (one row per (query, term), weights summed) — expansion
    can only add mass, never double-count admission.
    """
    if weight < 0:
        raise ValueError("weight must be >= 0")
    orig = (
        queries.select(
            F.col(query_id_col).alias("query_id"),
            F.explode(F.col(query_terms_col)).alias("term"),
        )
        .groupBy("query_id", "term")
        .agg(
            (F.lit(1.0) + F.log(F.count("*").cast("double"))).alias("weight")
        )
    )
    th = thesaurus.select(
        "term",
        F.col("synonym").alias("_syn"),
        (F.lit(float(weight)) * F.col("weight")).alias("_w"),
    )
    exp = (
        orig.select("query_id", "term")
        .join(F.broadcast(th), "term")
        .groupBy("query_id", F.col("_syn").alias("term"))
        .agg(F.sum("_w").alias("weight"))
    )
    return (
        orig.unionByName(exp)
        .groupBy("query_id", "term")
        .agg(F.sum("weight").alias("weight"))
        .filter(F.col("weight") != 0.0)
    )


def sparse_synonym_topk(
    docs: DataFrame,
    queries: DataFrame,
    thesaurus: DataFrame,
    k: int,
    *,
    weight: float = 0.5,
    doc_id_col: str = "doc_id",
    text_col: str = "text",
    query_id_col: str = "query_id",
    query_terms_col: str = "qterms",
) -> DataFrame:
    """Synonym-expanded retrieval — ``(query_id, id, score, rank)``:
    the expanded weighted query against the corpus' tf–idf postings
    (``sparse_encode`` from-scratch here; the persisted sparse index
    serves the same triples at scale, and the gated serving form is
    pure composition — ``SparseEngine.search(expand_query_terms(q,
    thesaurus), k, method="indexed")`` — because expansion is
    query-side and never touches the snapshot).  ``weight=0`` degrades exactly
    to the unexpanded sparse ranking (zero-weight expansion rows are
    dropped before they can admit documents)."""
    enc = sparse_encode(docs, doc_id_col=doc_id_col, text_col=text_col)
    qp = expand_query_terms(
        queries, thesaurus,
        weight=weight,
        query_id_col=query_id_col, query_terms_col=query_terms_col,
    )
    return _score_ranked(sparse_scores(enc, qp), k, "score")
