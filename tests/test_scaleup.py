"""Fixture up-scaler (sources/scaleup.py) — the >sf0.1 anchor generator.

Verified at copies=2 over sf0.001 (shape-identical to the bench's
copies=10 over sf0.1): fact tables multiply, dims don't, FK edges stay
consistent (joins scale linearly, never quadratically), text is
copy-distinct (no cross-copy shingle overlap), and the registry's
headline queries run unmodified against the scaled directory.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from distributed_vector_search_system_spark.sources.scaleup import (
    scale_fixture_dir,
)

SRC = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def scaled(spark, tmp_path_factory):
    dst = str(tmp_path_factory.mktemp("scale") / "x2")
    return scale_fixture_dir(spark, SRC, dst, copies=2)


def _n(spark, d, t):
    return spark.read.parquet(f"{d}/{t}.parquet").count()


def test_fact_tables_multiply_dims_do_not(spark, scaled):
    for t in ("customer", "orders", "lineitem", "events", "documents", "embeddings"):
        assert _n(spark, scaled, t) == 2 * _n(spark, SRC, t), t
    for t in ("region", "nation"):
        assert _n(spark, scaled, t) == _n(spark, SRC, t), t


def test_fk_edges_scale_linearly(spark, scaled):
    """orders ⋈ customer and lineitem ⋈ orders produce exactly 2x the
    base join cardinality — offset keys never cross copies."""
    for d, mult in ((SRC, 1), (scaled, 2)):
        c = spark.read.parquet(f"{d}/customer.parquet")
        o = spark.read.parquet(f"{d}/orders.parquet")
        li = spark.read.parquet(f"{d}/lineitem.parquet")
        oc = o.join(c, o.o_custkey == c.c_custkey).count()
        lo = li.join(o, li.l_orderkey == o.o_orderkey).count()
        if mult == 1:
            base_oc, base_lo = oc, lo
        else:
            assert oc == 2 * base_oc
            assert lo == 2 * base_lo
    # every scaled order still finds its customer
    c2 = spark.read.parquet(f"{scaled}/customer.parquet")
    o2 = spark.read.parquet(f"{scaled}/orders.parquet")
    orphans = o2.join(c2, o2.o_custkey == c2.c_custkey, "left_anti").count()
    assert orphans == 0
    # and nation (uncopied dim) resolves for every scaled customer
    n2 = spark.read.parquet(f"{scaled}/nation.parquet")
    dangling = c2.join(n2, c2.c_nationkey == n2.n_nationkey, "left_anti").count()
    assert dangling == 0


def test_documents_copy_distinct_no_cross_copy_dups(spark, scaled):
    """Exact-dedup structure must scale LINEARLY: copy-0 text is
    verbatim, copy-1 text shares no whitespace token with any copy-0
    doc, so duplicate GROUPS double rather than every doc gaining a
    cross-copy twin."""
    from distributed_vector_search_system_spark.sources.scaleup import STRIDES

    docs = spark.read.parquet(f"{scaled}/documents.parquet")
    src = spark.read.parquet(f"{SRC}/documents.parquet")
    stride = STRIDES["doc_id"]
    c0 = docs.filter(F.col("doc_id") < stride)
    c1 = docs.filter(F.col("doc_id") >= stride)
    # copy 0 verbatim
    assert c0.select("doc_id", "text").exceptAll(
        src.select("doc_id", "text")
    ).count() == 0
    # zero cross-copy exact text matches (non-empty docs)
    cross = (
        c0.filter(F.length("text") > 0)
        .select("text")
        .join(c1.select("text"), "text")
        .count()
    )
    assert cross == 0
    # per-copy duplicate-group structure preserved: total dup pairs = 2x
    def dup_pairs(df):
        return (
            df.filter(F.length("text") > 0)
            .groupBy("text").count().filter(F.col("count") > 1)
            .select(F.sum(F.col("count") * (F.col("count") - 1) / 2).alias("p"))
            .first()["p"]
        ) or 0
    assert dup_pairs(docs) == 2 * dup_pairs(src)


def test_embeddings_jittered_not_exact_ties(spark, scaled):
    from distributed_vector_search_system_spark.sources.scaleup import STRIDES

    emb = spark.read.parquet(f"{scaled}/embeddings.parquet")
    stride = STRIDES["vec_id"]
    a = {r["vec_id"]: tuple(r["embedding"]) for r in emb.filter(F.col("vec_id") < stride).collect()}
    b = {
        r["vec_id"] - stride: tuple(r["embedding"])
        for r in emb.filter(F.col("vec_id") >= stride).collect()
    }
    assert set(a) == set(b)
    diffs = [max(abs(x - y) for x, y in zip(a[i], b[i])) for i in a]
    assert all(0 < d < 1e-3 for d in diffs)  # jittered but semantically same


def test_registry_headline_queries_run_at_scale(spark, scaled):
    """The bench's headline set runs unmodified against the scaled dir
    and returns scaled row counts where counts are data-proportional."""
    from distributed_vector_search_system_spark import registry

    qs = registry.all_queries()
    base = qs["rel_pricing_summary"](spark, SRC)
    big = qs["rel_pricing_summary"](spark, scaled)
    # same aggregate groups, 2x the underlying rows
    assert {tuple(r)[:2] for r in base.select("l_returnflag", "l_linestatus").collect()} == {
        tuple(r)[:2] for r in big.select("l_returnflag", "l_linestatus").collect()
    }
    n_base = base.agg(F.sum("count_order").alias("n")).first()["n"]
    n_big = big.agg(F.sum("count_order").alias("n")).first()["n"]
    assert n_big == 2 * n_base
    # the flagship vector query runs and respects the 2x query set
    kb_base = qs["knn_batch"](spark, SRC).select("query_id").distinct().count()
    kb_big = qs["knn_batch"](spark, scaled).select("query_id").distinct().count()
    assert kb_big == 2 * kb_base


def test_scale_is_idempotent_and_marker_committed(spark, scaled, tmp_path):
    import os

    assert os.path.exists(os.path.join(scaled, "_SCALE_OK"))
    # second call reuses without rewriting (mtime unchanged)
    before = os.path.getmtime(os.path.join(scaled, "lineitem.parquet"))
    scale_fixture_dir(spark, SRC, scaled, copies=2)
    assert os.path.getmtime(os.path.join(scaled, "lineitem.parquet")) == before


def test_near_dup_candidate_structure_scales_linearly(spark, scaled):
    """The round-5 regression the scale anchor caught: the copy marker
    must stay INSIDE its token under the analysis tokenizer, or every
    copy's docs share marker-word shingles and minhash candidates
    explode quadratically.  Invariants: (a) zero CROSS-copy minhash
    candidate pairs (copy vocabularies are disjoint; bucket equality
    across copies would be a 60-bit hash coincidence), (b) copy-0
    candidates are exactly the base corpus's (copy-0 text is
    verbatim), and (c) tokenized docs carry NO free marker tokens —
    token counts match the base doc-for-doc."""
    from distributed_vector_search_system_spark.functions.text import tokens
    from distributed_vector_search_system_spark.operators.dedup import (
        minhash_lsh_candidates,
    )
    from distributed_vector_search_system_spark.sources.scaleup import STRIDES

    docs = spark.read.parquet(f"{scaled}/documents.parquet")
    src = spark.read.parquet(f"{SRC}/documents.parquet")
    stride = STRIDES["doc_id"]

    cands = minhash_lsh_candidates(docs)
    cross = cands.filter(
        F.floor(F.col("doc_a") / stride) != F.floor(F.col("doc_b") / stride)
    ).count()
    assert cross == 0

    base_cands = {
        (r["doc_a"], r["doc_b"]) for r in minhash_lsh_candidates(src).collect()
    }
    c0_cands = {
        (r["doc_a"], r["doc_b"])
        for r in cands.filter(F.col("doc_b") < stride).collect()
    }
    assert c0_cands == base_cands

    tc = docs.select(
        (F.col("doc_id") % stride).alias("base_id"),
        F.size(tokens("text")).alias("n"),
    )
    base_tc = src.select(
        F.col("doc_id").alias("base_id"), F.size(tokens("text")).alias("n")
    )
    mismatch = (
        tc.join(base_tc.withColumnRenamed("n", "n0"), "base_id")
        .filter(F.col("n") != F.col("n0"))
        .count()
    )
    assert mismatch == 0
