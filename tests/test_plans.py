"""Physical-plan shape assertions — the scale contract.

Correctness tests prove the small-SF answer; these prove the PLAN is the
one that survives a 100 TB / 1000-executor scale-up:

* the kNN top-k is rank-limited BELOW the shuffle (WindowGroupLimit →
  per-partition partial top-k, the reference's Q3/Q4 two-level merge,
  /root/reference/src/index/shard_manager.cc:46-51,129-145);
* small dimension tables broadcast instead of shuffling the fact table;
* filters and column pruning reach the parquet scan;
* aggregates are partial+final (map-side combine before the exchange).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from distributed_vector_search_system_spark import registry
from distributed_vector_search_system_spark.tables import load_table


def _plan(df) -> str:
    return df._jdf.queryExecution().explainString(
        df.sparkSession._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            "formatted"
        )
    )


def test_knn_partial_topk_below_shuffle(spark, sf_smoke):
    """Per-partition WindowGroupLimit must fire before the exchange so the
    shuffle carries ≤ k·partitions rows per query, not the full cross join.
    knn_batch serves from the Arrow/GEMM tier (round 13): the corpus
    stays map-side in MapInPandas (queries ride the broadcast closure),
    so no join may appear at all — and the vectors table still never
    shuffles by query_id before ranking."""
    plan = _plan(registry.queries()["knn_batch"](spark, sf_smoke))
    assert "WindowGroupLimit" in plan
    # partial (Partial mode runs per input partition, pre-shuffle) + final
    assert plan.count("WindowGroupLimit") >= 2, plan
    # GEMM tier: per-batch kernel, partials-only shuffle, no join node
    assert "MapInPandas" in plan, plan
    assert "Join" not in plan, plan
    # the expr tier keeps the broadcast contract: query set broadcast,
    # vectors never shuffled by query_id before ranking
    expr_plan = _plan(registry.queries()["knn_single"](spark, sf_smoke))
    assert "BroadcastNestedLoopJoin" in expr_plan or "BroadcastHashJoin" in expr_plan


def test_knn_scan_prunes_columns(spark, sf_smoke):
    """kNN reads only (vec_id, embedding) — label must be pruned."""
    plan = _plan(registry.queries()["knn_batch"](spark, sf_smoke))
    read_schemas = [l for l in plan.splitlines() if "ReadSchema" in l]
    assert read_schemas
    assert not any("label" in l for l in read_schemas), read_schemas


def test_dim_joins_broadcast(spark, sf_smoke):
    """Region/nation/customer joins must broadcast; shuffling lineitem on
    the dim chain would be the 100 TB bottleneck."""
    plan = _plan(registry.all_queries()["rel_revenue_by_region"](spark, sf_smoke))
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan, plan


def test_filter_pushdown_reaches_scan(spark, sf_smoke):
    plan = _plan(registry.queries()["rel_pricing_summary"](spark, sf_smoke))
    pushed = [l for l in plan.splitlines() if "PushedFilters" in l]
    assert any("l_shipdate" in l for l in pushed), pushed


def test_aggregate_is_partial_then_final(spark, sf_smoke):
    plan = _plan(registry.queries()["rel_pricing_summary"](spark, sf_smoke))
    assert plan.count("HashAggregate") >= 2, plan


def test_approx_count_distinct_error_bound(spark, sf_oracle):
    """approx_count_distinct must land within 5% of exact at sf0.01
    (HLL++ rsd default 0.05)."""
    li = load_table(spark, sf_oracle, "lineitem")
    row = li.agg(
        F.approx_count_distinct("l_partkey").alias("approx"),
        F.count_distinct("l_partkey").alias("exact"),
    ).first()
    assert abs(row["approx"] - row["exact"]) <= 0.05 * row["exact"] + 1, row


# --- LLM-pipeline plan shapes (VERDICT r01 item 6): the dedup/ANN paths
# must stay bucketed equi-joins — a CartesianProduct or
# BroadcastNestedLoopJoin here is the O(n²) plan that dies at 100 TB.

import pytest


@pytest.mark.parametrize(
    "name",
    [
        "dedup_minhash_lsh",
        "dedup_simhash",
        "dedup_ngram_jaccard",
        "dedup_embedding_cosine",
        "ann_lsh_topk",
        "ann_ivf_topk",
    ],
)
def test_llm_pipeline_no_allpairs_join(spark, sf_smoke, name):
    # all_queries: the lock follows rows across rotation tiers (r9)
    plan = _plan(registry.all_queries()[name](spark, sf_smoke))
    assert "CartesianProduct" not in plan, name
    assert "BroadcastNestedLoopJoin" not in plan, name


@pytest.mark.parametrize("name", ["multimodal_features", "multimodal_frames"])
def test_multimodal_kernels_are_map_only(spark, sf_smoke, name):
    """Arrow mapInPandas feature/frame extraction must not shuffle —
    binary payloads never leave their partition."""
    plan = _plan(registry.all_queries()[name](spark, sf_smoke))
    assert "Exchange" not in plan, plan


def test_blob_column_pruned_for_metadata_only_reads(spark, sf_smoke, tmp_path):
    """A metadata-only projection over a stored multimodal table must not
    read the binary payload column (column pruning reaches the scan)."""
    docs = load_table(spark, sf_smoke, "documents").withColumn(
        "blob", F.encode(F.col("text"), "UTF-8")
    )
    path = str(tmp_path / "blobs")
    docs.select("doc_id", "lang", "blob").write.parquet(path)
    plan = _plan(spark.read.parquet(path).select("doc_id", "lang"))
    read_schemas = [l for l in plan.splitlines() if "ReadSchema" in l]
    assert read_schemas
    assert not any("blob" in l for l in read_schemas), read_schemas


def test_knn_after_mutations_partial_topk_survives_union(spark, sf_smoke):
    """The compaction union (survivors ∪ inserts) must not defeat the
    partial top-k: WindowGroupLimit still fires below the exchange for
    both the LWW window and the final per-query rank."""
    plan = _plan(registry.queries()["knn_after_mutations"](spark, sf_smoke))
    assert plan.count("WindowGroupLimit") >= 4, plan
    assert "CartesianProduct" not in plan


def test_no_unpartitioned_windows_anywhere(spark, sf_smoke):
    """No registry query may use a partition-less window function — a
    global ORDER BY window moves every row to ONE partition, the worst
    possible plan at scale.  windowspecdefinition args starting with a
    sort order (no partition exprs) betray one."""
    import re

    # corpus_pack's distributed prefix-sum deliberately carries ONE
    # unpartitioned window — over the per-bucket TOTALS frame (n_docs /
    # bucket rows, post-aggregate), never the corpus.  Its dedicated
    # plan test (test_chunking.test_pack_sequences_corpus_window_is_
    # partitioned) asserts exactly that: the corpus-wide running sum is
    # partitionBy the bucket key and the global window sees only _gsum.
    # dsl_pipeline_histogram (round-13 mid-build addendum) appends ES
    # pipeline aggs (cum_sum / deriv / moving_avg) to a GLOBAL
    # histogram: a single bucket series is one partition by
    # construction, and the windows run over the POST-AGGREGATE
    # bucket-count-sized frame, never the corpus — locked by
    # test_pipeline_histogram_windows_above_bucket_aggregate below.
    exempt = {"corpus_pack", "dsl_pipeline_histogram"}
    flagged = []
    for name, fn in sorted(registry.all_queries().items()):
        if name in exempt:
            continue
        plan = fn(spark, sf_smoke)._jdf.queryExecution().executedPlan().toString()
        for m in re.finditer(r"windowspecdefinition\(([^)]*)\)", plan):
            first = m.group(1).split(",")[0].strip()
            if "ASC" in first or "DESC" in first:
                flagged.append(name)
                break
    assert not flagged, flagged


def test_pipeline_histogram_windows_above_bucket_aggregate(spark, sf_smoke):
    """dsl_pipeline_histogram's exemption contract (see
    test_no_unpartitioned_windows_anywhere): its unpartitioned pipeline
    windows may only ever see the HISTOGRAM BUCKET series — every
    Window node's subtree must contain the bucket HashAggregate, so the
    ordered single-partition pass runs over bucket-count rows, not
    corpus rows."""
    df = registry.all_queries()["dsl_pipeline_histogram"](spark, sf_smoke)
    plan = df._jdf.queryExecution().executedPlan().toString()
    windows = list(_node_subtrees(plan, r"\bWindow\b"))
    assert windows, plan
    for line, sub in windows:
        body = "\n".join(sub)
        assert "HashAggregate" in body, (line, plan)


def test_knn_quantized_phase1_never_scans_float_column(spark, sf_smoke):
    """VERDICT r03 item 2: the driver-verified quantized plan must read
    the STORED int8 tier in phase 1 — the scan that feeds the coarse
    ranking reads (vec_id, qcodes, qscale) and must NOT touch the float
    embedding column; only the k·rerank re-rank rows do."""
    plan = _plan(registry.all_queries()["knn_quantized"](spark, sf_smoke))
    read_schemas = [l for l in plan.splitlines() if "ReadSchema" in l]
    coarse = [l for l in read_schemas if "qcodes" in l]
    assert coarse, read_schemas  # the stored tier really is scanned
    assert not any("embedding" in l for l in coarse), coarse
    # the exact re-rank still reads the float column (from a scan that
    # skips the codes)
    assert any("embedding" in l and "qcodes" not in l for l in read_schemas), (
        read_schemas
    )


def test_ivf_persisted_driver_row_prunes_partitions(spark, sf_smoke):
    """The persisted-IVF row must read only probed cell directories:
    the cell_id probe predicate shows up as a partition filter on the
    index scan, not a post-scan filter.  Resolved via all_queries() so
    the lock follows the row across rotation tiers (r11: rotated to
    the pytest tier, identical oracle)."""
    plan = _plan(registry.all_queries()["ivf_persisted_topk"](spark, sf_smoke))
    pf = [l for l in plan.splitlines() if "PartitionFilters" in l]
    assert any("cell_id" in l for l in pf), plan


def test_ivf_trained_driver_row_prunes_partitions(spark, sf_smoke):
    """Same contract for the round-6 trained-centroid row — it serves
    through the identical search path; the plan lock follows the row
    across rotation tiers (r9: rotated to the pytest tier, identical
    oracle)."""
    plan = _plan(registry.all_queries()["ivf_trained_topk"](spark, sf_smoke))
    pf = [l for l in plan.splitlines() if "PartitionFilters" in l]
    assert any("cell_id" in l for l in pf), plan


def _count_embedding_scans(plan: str) -> int:
    """Count '(N) Scan parquet' detail blocks whose Location references
    the embeddings table (formatted explain lists each scan's path in
    its detail block, not on the tree line)."""
    import re

    count = 0
    blocks = re.split(r"\n(?=\(\d+\) )", plan)
    for b in blocks:
        head = b.splitlines()[0] if b else ""
        if re.match(r"\(\d+\) Scan parquet", head) and "embeddings" in b:
            count += 1
    return count


def test_ann_lsh_single_corpus_scan(spark, sf_smoke):
    """The multi-table LSH search must compute every table's bucket in
    ONE pass over the corpus: exactly 2 scans of embeddings total (the
    corpus side + the query-set side) — the per-table join+union shape
    scanned the corpus once per table (a 4x IO multiplier at 100 TB)."""
    plan = _plan(registry.all_queries()["ann_lsh_topk"](spark, sf_smoke))
    assert _count_embedding_scans(plan) == 2, plan


def test_embedding_neardup_bounded_scans(spark, sf_smoke):
    """Single-scan blocker: one scan per join side for candidates plus
    two id-keyed joins back for the exact verify = 4 scans, independent
    of num_tables (was 2·num_tables + 2)."""
    plan = _plan(registry.queries()["dedup_embedding_cosine"](spark, sf_smoke))
    assert _count_embedding_scans(plan) <= 4, plan


def test_bm25_joins_broadcast_no_cartesian(spark, sf_smoke):
    """BM25's posting/df/stats joins must all broadcast (the corpus
    never shuffles on the term key) — no SortMergeJoin, no
    CartesianProduct in the whole plan."""
    plan = _plan(registry.all_queries()["bm25_topk"](spark, sf_smoke))
    assert "SortMergeJoin" not in plan
    assert "CartesianProduct" not in plan
    assert "BroadcastHashJoin" in plan


def _node_subtrees(plan: str, pattern: str):
    """(line, subtree-lines) for each plan node matching ``pattern``.

    Tree printouts place a node's children on later lines with the node
    name further right; the subtree ends at the first line whose name
    position is at or left of the node's.
    """
    import re

    lines = plan.splitlines()
    for i, line in enumerate(lines):
        m = re.search(pattern, line)
        if not m:
            continue
        depth = m.start()
        sub = []
        for l2 in lines[i + 1 :]:
            m2 = re.search(r"[A-Za-z]", l2)
            if not m2 or m2.start() <= depth:
                break
            sub.append(l2)
        yield line, sub


def test_bm25_query_restriction_below_tf_aggregate(spark, sf_smoke):
    """The query-vocabulary restriction must execute BELOW the tf
    aggregate (VERDICT r05 item 2): Catalyst pushes left-SEMI joins
    under aggregates but never INNER joins, so an inner join written
    above the groupBy silently shuffles every (doc, term) pair of the
    corpus to compute tf values nobody reads.  Assert every tf
    Aggregate's optimized subtree contains the LeftSemi restriction and
    no inner join (the per-query fan-out joins strictly above it)."""
    df = registry.all_queries()["bm25_topk"](spark, sf_smoke)
    plan = df._jdf.queryExecution().optimizedPlan().toString()
    tf_aggs = list(_node_subtrees(plan, r"Aggregate \[id#"))
    assert tf_aggs, plan
    for line, sub in tf_aggs:
        body = "\n".join(sub)
        assert "Join LeftSemi" in body, (line, plan)
        assert "Join Inner" not in body, (line, plan)


def test_hybrid_rrf_no_cartesian(spark, sf_smoke):
    plan = _plan(registry.all_queries()["hybrid_rrf"](spark, sf_smoke))
    assert "CartesianProduct" not in plan


def test_hybrid_indexed_reads_no_text_and_prunes_cells(spark, sf_smoke, tmp_path):
    """The fully-indexed hybrid plan must show both index contracts at
    once: the lexical leg never reads document text (only posting
    rows), and the vector leg's probe arrives as cell_id partition
    pruning.  Queries are a literal batch (an RPC batch) so the query
    derivation can't read text either."""
    from pyspark.sql import functions as F

    from distributed_vector_search_system_spark.operators.clustering import (
        kmeans_fit,
    )
    from distributed_vector_search_system_spark.operators.retrieval import (
        hybrid_rrf_indexed_topk,
        queries_from_docs,
    )
    from distributed_vector_search_system_spark.sources.ivf_index import (
        write_ivf_index,
    )
    from distributed_vector_search_system_spark.sources.posting_index import (
        write_posting_index,
    )

    docs = load_table(spark, sf_smoke, "documents")
    emb = load_table(spark, sf_smoke, "embeddings")
    posting = str(tmp_path / "posting")
    write_posting_index(docs, posting)
    cents, _ = kmeans_fit(emb, 4, max_iterations=2)
    ivf = str(tmp_path / "ivf")
    write_ivf_index(emb, ivf, cents)
    qrows = [
        (r["query_id"], list(r["qterms"]), list(r["qvec"]) if r["qvec"] else None)
        for r in queries_from_docs(docs, F.col("doc_id") % 100 == 7)
        .join(
            emb.select(
                F.col("vec_id").alias("query_id"),
                F.col("embedding").alias("qvec"),
            ),
            "query_id",
            "left",
        )
        .collect()
    ]
    q = spark.createDataFrame(
        qrows, "query_id long, qterms array<string>, qvec array<double>"
    )
    df = hybrid_rrf_indexed_topk(spark, posting, ivf, cents, q, 5, n_probe=2)
    plan = _plan(df)
    read = [l for l in plan.splitlines() if "ReadSchema" in l]
    assert not any("text" in l for l in read), read
    pf = [l for l in plan.splitlines() if "PartitionFilters" in l]
    assert any("cell_id" in l for l in pf), plan
    assert "CartesianProduct" not in plan


def test_capped_sample_partial_topk_below_shuffle(spark, sf_smoke):
    """The per-source quota must cap map-side (WindowGroupLimit) so a
    viral key ships cap x partitions rows, never its full fan-in."""
    plan = _plan(registry.all_queries()["capped_sample"](spark, sf_smoke))
    assert "WindowGroupLimit" in plan


def test_bm25_df_branch_reuses_posting_exchange(spark, sf_smoke):
    """bm25_scores' df aggregate must read the SAME tokenize→tf exchange
    the hits side builds — not re-tokenize the corpus (round 14: df is
    count_if(tf >= 1) precisely so both subtrees canonicalize equal).
    Reuse is a runtime decision under AQE, so the lock executes the
    query and inspects the final adaptive plan."""
    df = registry.all_queries()["bm25_topk"](spark, sf_smoke)
    df.collect()
    final = df._jdf.queryExecution().executedPlan().toString()
    assert "ReusedExchange" in final, final


def test_ann_lsh_single_payload_free_exchange(spark, sf_smoke):
    """ann_lsh_topk scores map-side and shares ONE query-keyed exchange
    between the dedup aggregate and the rank window (round 14): no
    second Exchange after the bucket join, and no vector payload may
    ride the shuffle."""
    plan = _plan(registry.all_queries()["ann_lsh_topk"](spark, sf_smoke))
    tree = plan.split("\n\n")[0]
    shuffles = [
        l for l in tree.splitlines()
        if ("+- Exchange" in l or ":- Exchange" in l)
    ]
    assert len(shuffles) == 1, tree
    # the exchange's input is (query_id, id, cosine) — never _v/_qv
    import re

    m = re.search(r"\(\d+\) Exchange\nInput \[\d+\]: \[([^\]]*)\]", plan)
    assert m and "_v" not in m.group(1) and "_qv" not in m.group(1), (
        m.group(1) if m else plan
    )
