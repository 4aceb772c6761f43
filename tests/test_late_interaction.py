"""Late-interaction MaxSim retrieval (operators/late_interaction.py).

Oracle parity for the maxsim_topk registry row runs in
test_oracle_parity.py; these tests pin the math against an independent
numpy recomputation, the dot-metric variant, permutation invariance,
and the plan shape (broadcast query side — the corpus never shuffles
before the first aggregate)."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from distributed_vector_search_system_spark.operators.late_interaction import (
    maxsim_topk,
)
from distributed_vector_search_system_spark.tables import load_table


def _fixture(spark, sf_dir, group=4, qmod=50):
    emb = load_table(spark, sf_dir, "embeddings")
    dv = emb.select(
        F.expr(f"vec_id div {group}").alias("doc_id"), "vec_id", "embedding"
    )
    q = (
        dv.filter(F.col("doc_id") % qmod == 3)
        .groupBy(F.col("doc_id").alias("query_id"))
        .agg(F.collect_list("embedding").alias("qvecs"))
    )
    return emb, dv, q


def _numpy_maxsim(emb_rows, group, qmod, k, metric="cosine"):
    docs: dict[int, list[np.ndarray]] = {}
    for r in emb_rows:
        docs.setdefault(r["vec_id"] // group, []).append(
            np.array(r["embedding"], dtype=np.float64)
        )

    def sim(a, b):
        if metric == "dot":
            return float(a @ b)
        return float(a @ b / (np.linalg.norm(a) * np.linalg.norm(b)))

    out = {}
    for qid, qvecs in docs.items():
        if qid % qmod != 3:
            continue
        scores = []
        for did, dvecs in docs.items():
            s = sum(max(sim(qv, dv) for dv in dvecs) for qv in qvecs)
            scores.append((round(s, 6), did))
        scores.sort(key=lambda t: (-t[0], t[1]))
        out[qid] = [
            (did, s, rank + 1) for rank, (s, did) in enumerate(scores[:k])
        ]
    return out


@pytest.mark.parametrize("metric", ["cosine", "dot"])
def test_matches_numpy(spark, sf_oracle, metric):
    emb, dv, q = _fixture(spark, sf_oracle)
    got = maxsim_topk(dv, q, 5, metric=metric).collect()
    want = _numpy_maxsim(emb.collect(), 4, 50, 5, metric=metric)
    got_by_q: dict = {}
    for r in got:
        got_by_q.setdefault(r["query_id"], []).append(
            (r["id"], round(r["maxsim"], 6), r["rank"])
        )
    assert set(got_by_q) == set(want)
    for qid, rows in got_by_q.items():
        assert sorted(rows, key=lambda t: t[2]) == want[qid], qid


def test_self_match_ranks_first(spark, sf_oracle):
    """A query that IS a document's token set must retrieve that
    document at rank 1 (every token's best match is itself, cosine 1)."""
    _, dv, q = _fixture(spark, sf_oracle)
    top = {
        r["query_id"]: r["id"]
        for r in maxsim_topk(dv, q, 1).collect()
    }
    assert top and all(qid == did for qid, did in top.items())


def test_token_order_invariance(spark, sf_oracle):
    """Σ max is permutation-invariant: reversing each query's token
    array must not change any result row."""
    _, dv, q = _fixture(spark, sf_oracle)
    qrev = q.select("query_id", F.reverse("qvecs").alias("qvecs"))
    key = lambda r: (r["query_id"], r["rank"], r["id"], r["maxsim"])  # noqa: E731
    assert sorted(map(key, maxsim_topk(dv, q, 5).collect())) == sorted(
        map(key, maxsim_topk(dv, qrev, 5).collect())
    )


def test_rejects_unknown_metric(spark, sf_smoke):
    _, dv, q = _fixture(spark, sf_smoke)
    with pytest.raises(ValueError, match="metric"):
        maxsim_topk(dv, q, 5, metric="euclid")


def test_plan_broadcasts_queries_and_streams_corpus(spark, sf_oracle):
    """The query-token side is broadcast (RPC-bounded contract) and the
    corpus reaches the first aggregate without a prior Exchange — the
    per-token max combines map-side before anything shuffles."""
    _, dv, q = _fixture(spark, sf_oracle)
    df = maxsim_topk(dv, q, 5)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastExchange" in plan
    # exactly two scans: the corpus side (consumed once) and the
    # fixture-derived query side (tiny, broadcast) — the corpus subtree
    # is never evaluated twice
    opt = df._jdf.queryExecution().optimizedPlan().toString()
    assert opt.count("] parquet") == 2


# --- two-stage serving (maxsim_ivf_topk) ------------------------------------


def _layout(spark, sf_dir):
    from distributed_vector_search_system_spark.registry.llm import (
        maxsim_ivf_layout,
    )

    return maxsim_ivf_layout(spark, sf_dir)


def _queries_arr(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings")
    return (
        emb.select(F.expr("vec_id div 4").alias("query_id"), "embedding")
        .filter(F.col("query_id") % 50 == 3)
        .groupBy("query_id")
        .agg(F.collect_list("embedding").alias("qvecs"))
    )


def test_two_stage_full_coverage_equals_exact(spark, sf_oracle):
    """Full probe + gather >= doc count: the gather phase cannot miss a
    candidate, so the two-stage plan equals the exact operator."""
    from distributed_vector_search_system_spark.operators.late_interaction import (
        maxsim_ivf_topk,
    )

    idx, store, cents = _layout(spark, sf_oracle)
    emb, dv, _ = _fixture(spark, sf_oracle)
    q = _queries_arr(spark, sf_oracle)
    ndocs = dv.select("doc_id").distinct().count()
    got = maxsim_ivf_topk(
        spark, idx, store, q, 5, cents,
        n_probe=len(cents), gather=ndocs,
    )
    want = maxsim_topk(dv, q, 5)
    key = lambda r: (r["query_id"], r["rank"], r["id"], r["maxsim"])  # noqa: E731
    assert sorted(map(key, got.collect())) == sorted(map(key, want.collect()))


def test_two_stage_plan_prunes_both_phases(spark, sf_oracle):
    """Phase 1 reads only probed cell directories (cell_id
    PartitionFilters); phase 2 reads only candidate doc buckets
    (dynamic partition pruning on the token store)."""
    from distributed_vector_search_system_spark.operators.late_interaction import (
        maxsim_ivf_topk,
    )

    idx, store, cents = _layout(spark, sf_oracle)
    q = _queries_arr(spark, sf_oracle)
    # materialize_candidates=False keeps one lazy composed plan so both
    # phases' pruning is visible in a single explain (the default
    # materializes the k-bounded candidate frame, which truncates
    # phase 1 out of the final plan — locked separately below)
    df = maxsim_ivf_topk(
        spark, idx, store, q, 5, cents, n_probe=2, gather=4,
        materialize_candidates=False,
    )
    plan = df._jdf.queryExecution().explainString(
        df.sparkSession._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            "formatted"
        )
    )
    pf = [l for l in plan.splitlines() if "PartitionFilters" in l]
    assert any("cell_id" in l for l in pf), plan
    assert any("dynamicpruning" in l for l in pf), plan


def test_two_stage_default_materializes_candidates_once(spark, sf_oracle):
    """The default path checkpoints the k-bounded candidate frame, so
    the final plan (a) prunes the token store to candidate buckets via
    the STATIC literal PartitionFilter (an RDD-backed frame no longer
    triggers DPP, so the ids are collected and pushed as literals) and
    (b) contains NO IVF probe subtree — the gather ran exactly once at
    construction instead of once per consumer branch."""
    from distributed_vector_search_system_spark.operators.late_interaction import (
        maxsim_ivf_topk,
    )

    idx, store, cents = _layout(spark, sf_oracle)
    q = _queries_arr(spark, sf_oracle)
    df = maxsim_ivf_topk(spark, idx, store, q, 5, cents, n_probe=2, gather=4)
    plan = df._jdf.queryExecution().explainString(
        df.sparkSession._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            "formatted"
        )
    )
    pf = [l for l in plan.splitlines() if "PartitionFilters" in l]
    # literal bucket pruning on the token store: id_bucket IN (…), which
    # Catalyst folds to an equality when only one bucket is hit
    assert any(
        "id_bucket" in l and (" IN " in l or " = " in l) for l in pf
    ), plan
    # phase 1 (the cell_id-pruned probe) must NOT appear: it was
    # evaluated once into the checkpointed candidate frame
    assert not any("cell_id" in l for l in pf), plan
    assert "ExistingRDD" in plan or "Scan ExistingRDD" in plan, plan
    # results must be identical to the unmaterialized composition
    lazy = maxsim_ivf_topk(
        spark, idx, store, q, 5, cents, n_probe=2, gather=4,
        materialize_candidates=False,
    )
    key = lambda r: (r["query_id"], r["rank"], r["id"], r["maxsim"])  # noqa: E731
    assert sorted(map(key, df.collect())) == sorted(map(key, lazy.collect()))


def test_two_stage_candidate_collect_is_guarded(spark, sf_oracle):
    """The materialized path's driver-held id list is BOUNDED, not
    assumed bounded (VERDICT r13 item 8): a cap breach raises with the
    lazy-DPP escape hatch named, and the default cap admits normal
    serving sizes."""
    import pytest

    from distributed_vector_search_system_spark.operators.late_interaction import (
        maxsim_ivf_topk,
    )

    idx, store, cents = _layout(spark, sf_oracle)
    q = _queries_arr(spark, sf_oracle)
    with pytest.raises(ValueError, match="materialize_candidates=False"):
        maxsim_ivf_topk(
            spark, idx, store, q, 5, cents, n_probe=2, gather=4,
            max_candidate_ids=1,
        )
    # the default cap admits the normal candidate set
    out = maxsim_ivf_topk(spark, idx, store, q, 5, cents, n_probe=2, gather=4)
    assert out.count() > 0


def test_two_stage_partial_probe_is_plausible(spark, sf_oracle):
    """Partial probes return k contiguously-ranked rows per query whose
    scores are genuine MaxSim values (each returned doc's score equals
    the exact operator's score for that (query, doc) pair)."""
    from distributed_vector_search_system_spark.operators.late_interaction import (
        maxsim_ivf_topk,
    )

    idx, store, cents = _layout(spark, sf_oracle)
    _, dv, _ = _fixture(spark, sf_oracle)
    q = _queries_arr(spark, sf_oracle)
    got = maxsim_ivf_topk(
        spark, idx, store, q, 5, cents, n_probe=2, gather=4
    ).collect()
    assert got
    exact = {
        (r["query_id"], r["id"]): r["maxsim"]
        for r in maxsim_topk(dv, q, 10**6).collect()
    }
    by_q: dict = {}
    for r in got:
        assert abs(r["maxsim"] - exact[(r["query_id"], r["id"])]) < 2e-6
        by_q.setdefault(r["query_id"], []).append(r["rank"])
    for ranks in by_q.values():
        assert sorted(ranks) == list(range(1, len(ranks) + 1))
