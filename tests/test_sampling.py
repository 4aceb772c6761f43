"""Deterministic sampling / splits / decontamination
(operators/sampling.py).  Oracle parity for the registry entries runs in
test_oracle_parity.py; these lock the selection invariants."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from distributed_vector_search_system_spark.operators.sampling import (
    decontaminate,
    hash_sample,
    hash_split,
)
from distributed_vector_search_system_spark.tables import load_table


def _docs(spark, sf):
    return load_table(spark, sf, "documents")


def test_split_exhaustive_exclusive_and_roughly_weighted(spark, sf_oracle):
    docs = _docs(spark, sf_oracle)
    n = docs.count()
    split = hash_split(docs, {"train": 0.8, "val": 0.1, "test": 0.1})
    counts = {r.split: r.n for r in split.groupBy("split").agg(F.count("*").alias("n")).collect()}
    assert sum(counts.values()) == n  # exhaustive + exclusive (one split per row)
    assert set(counts) == {"train", "val", "test"}
    assert counts["train"] > counts["val"] and counts["train"] > counts["test"]
    assert abs(counts["train"] / n - 0.8) < 0.1


def test_split_stable_under_repartition_and_growth(spark, sf_oracle):
    """A row's split must not depend on partitioning or on what other
    rows exist — the property df.sample lacks."""
    docs = _docs(spark, sf_oracle)
    full = {
        r.doc_id: r.split
        for r in hash_split(docs, {"train": 0.8, "val": 0.2}).select("doc_id", "split").collect()
    }
    subset = docs.filter(F.col("doc_id") % 3 == 0).repartition(13)
    sub = {
        r.doc_id: r.split
        for r in hash_split(subset, {"train": 0.8, "val": 0.2}).select("doc_id", "split").collect()
    }
    assert sub == {k: v for k, v in full.items() if k % 3 == 0}


def test_hash_sample_rate_and_subset_nesting(spark, sf_oracle):
    """Smaller rates must select subsets of larger rates (same seed) —
    hash-range sampling's defining property."""
    docs = _docs(spark, sf_oracle)
    n = docs.count()
    s20 = {r.doc_id for r in hash_sample(docs, 0.2).select("doc_id").collect()}
    s50 = {r.doc_id for r in hash_sample(docs, 0.5).select("doc_id").collect()}
    assert s20 <= s50
    assert abs(len(s50) / n - 0.5) < 0.15
    with pytest.raises(ValueError):
        hash_sample(docs, 1.5)


def test_decontaminate_removes_planted_overlap(spark):
    train = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog"),
            (2, "completely unrelated content about spark engines"),
            (3, "short doc"),  # < 3 tokens of overlap possible, no trigram match
        ],
        "doc_id long, text string",
    )
    bench = spark.createDataFrame(
        [(100, "we ask whether the quick brown fox can jump")],
        "doc_id long, text string",
    )
    survivors = {r.doc_id for r in decontaminate(train, bench, n=3).collect()}
    assert survivors == {2, 3}  # doc 1 shares the trigram "the quick brown"


def test_decontaminate_broadcasts_eval_side(spark, sf_oracle):
    """The train corpus must never shuffle: the eval shingle set joins
    via broadcast (no SortMergeJoin anywhere in the plan)."""
    docs = _docs(spark, sf_oracle)
    clean = decontaminate(
        docs.filter(F.col("doc_id") % 97 != 0),
        docs.filter(F.col("doc_id") % 97 == 0),
        n=3,
    )
    plan = clean._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    )
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan, plan


def test_thinned_head_rows_count_memoized_per_key(spark):
    """With a count_key, the eager df.count() runs at most once per key
    (VERDICT r04 item 7): the second derivation computes its step from
    the memo, not a fresh job — observable because we hand it a df whose
    true count DIFFERS but whose memoized step must be reused."""
    from distributed_vector_search_system_spark.operators import sampling

    df100 = spark.range(100).select(F.col("id").alias("vec_id"))
    key = "test-memo-key-thr"
    sampling._COUNT_MEMO.pop(key, None)
    rows_a = sampling.thinned_head_rows(df100, 4, seed="s", count_key=key)
    assert sampling._COUNT_MEMO[key] == 100
    # Same key, different (bigger) input: step must come from the memo
    # (still 100 → step 6), so selection equals the 100-count derivation
    # applied to the new rows — NOT what a fresh count (1000 → step 62)
    # would produce.
    df1000 = spark.range(1000).select(F.col("id").alias("vec_id"))
    rows_b = sampling.thinned_head_rows(df1000, 4, seed="s", count_key=key)
    from distributed_vector_search_system_spark.functions.hashing import (
        portable_hash64,
    )

    step = max(100 // 16, 1)
    want_b = [
        r["vec_id"]
        for r in df1000.filter(
            F.pmod(portable_hash64(F.col("vec_id").cast("string"), seed="s"),
                   F.lit(step)) == 0
        ).orderBy("vec_id").limit(4).collect()
    ]
    assert [r["vec_id"] for r in rows_b] == want_b
    # no key → always a fresh count (mutable-input contract)
    rows_c = sampling.thinned_head_rows(df100, 4, seed="s")
    assert [r["vec_id"] for r in rows_c] == [r["vec_id"] for r in rows_a]
    sampling._COUNT_MEMO.pop(key, None)


def test_temperature_sample_rebalances(spark):
    from distributed_vector_search_system_spark.operators.sampling import (
        temperature_sample,
    )

    rows = [
        (i, "big" if i < 900 else ("mid" if i < 990 else "rare"))
        for i in range(1000)
    ]
    df = spark.createDataFrame(rows, "doc_id long, source string")

    def counts(tau):
        return {
            r["source"]: r["count"]
            for r in temperature_sample(df, tau).groupBy("source").count().collect()
        }

    # tau = 1: the empirical mix IS the target — everything kept
    assert counts(1.0) == {"big": 900, "mid": 90, "rare": 10}
    c2 = counts(2.0)
    # the scarcest group keeps every row; bigger groups shed mass
    assert c2["rare"] == 10
    assert c2["big"] < 900 and c2["mid"] < 90
    # rates follow n^(1/tau - 1): the big group is cut far harder
    assert c2["big"] / 900 < c2["mid"] / 90
    # tau -> inf approaches equal group masses
    c100 = counts(100.0)
    assert max(c100.values()) <= 2 * min(c100.values())


def test_temperature_sample_deterministic_and_seeded(spark):
    from distributed_vector_search_system_spark.operators.sampling import (
        temperature_sample,
    )

    df = spark.createDataFrame(
        [(i, "a" if i % 4 else "b") for i in range(400)],
        "doc_id long, source string",
    )
    one = {r["doc_id"] for r in temperature_sample(df, 3.0).collect()}
    two = {r["doc_id"] for r in temperature_sample(df, 3.0).collect()}
    assert one == two and one
    other = {
        r["doc_id"] for r in temperature_sample(df, 3.0, seed="other").collect()
    }
    assert other != one  # disjoint seeds give independent samples


def test_temperature_sample_rejects_nonpositive_tau(spark):
    import pytest

    from distributed_vector_search_system_spark.operators.sampling import (
        temperature_sample,
    )

    df = spark.createDataFrame([(1, "a")], "doc_id long, source string")
    with pytest.raises(ValueError, match="temperature"):
        temperature_sample(df, 0.0)


def test_cluster_balanced_sample(spark):
    from distributed_vector_search_system_spark.operators.sampling import (
        cluster_balanced_sample,
    )

    # two tight clusters around (0,0) and (10,10)
    rows = [(i, [0.0 + i * 0.01, 0.0]) for i in range(20)] + [
        (100 + i, [10.0, 10.0 + i * 0.01]) for i in range(3)
    ]
    vecs = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    cents = [[0.0, 0.0], [10.0, 10.0]]
    kept = cluster_balanced_sample(vecs, cents, 5)
    by_c = {}
    for r in kept.collect():
        by_c.setdefault(r["cluster_id"], set()).add(r["id"])
    assert len(by_c[0]) == 5                  # hot cluster capped
    assert len(by_c[1]) == 3                  # small cluster untouched
    # deterministic: same call, same kept set
    again = {
        (r["id"], r["cluster_id"]) for r in
        cluster_balanced_sample(vecs, cents, 5).collect()
    }
    assert again == {
        (i, c) for c, ids in by_c.items() for i in ids
    }
    # the cut is a partial top-k (map-side truncation before exchange)
    plan = (
        cluster_balanced_sample(vecs, cents, 5)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "WindowGroupLimit" in plan
    import pytest as _pytest

    with _pytest.raises(ValueError):
        cluster_balanced_sample(vecs, cents, 0)


# -- token-budget packing (round 12) -----------------------------------------


def test_budget_pack_prefix_semantics(spark):
    from distributed_vector_search_system_spark.operators.sampling import (
        budget_pack,
    )

    rows = [
        # (doc_id, source, quality, n_tokens)
        (1, "a", 0.9, 40),
        (2, "a", 0.8, 50),
        (3, "a", 0.7, 20),   # 40+50+20 = 110 > 100: blocked
        (4, "a", 0.6, 5),    # behind the blocker: also out (prefix rule)
        (5, "b", 0.5, 100),  # exactly the budget: kept
        (6, "b", 0.4, 1),
    ]
    df = spark.createDataFrame(
        rows, "doc_id long, source string, q double, n_tokens int"
    )
    got = {
        r["doc_id"]: r["cum_tokens"]
        for r in budget_pack(
            df, 100, priority_col="q", tokens_col="n_tokens"
        ).collect()
    }
    assert got == {1: 40, 2: 90, 5: 100}


def test_budget_pack_tie_break_and_global_gate(spark):
    import pytest

    from distributed_vector_search_system_spark.operators.sampling import (
        budget_pack,
    )

    df = spark.createDataFrame(
        [(2, "a", 0.5, 60), (1, "a", 0.5, 60)],
        "doc_id long, source string, q double, n_tokens int",
    )
    got = [
        r["doc_id"]
        for r in budget_pack(
            df, 60, priority_col="q", tokens_col="n_tokens"
        ).collect()
    ]
    assert got == [1]                      # equal quality → lower id wins
    with pytest.raises(ValueError, match="ONE partition"):
        budget_pack(df, 60, priority_col="q", tokens_col="n_tokens", by=())
    assert budget_pack(
        df, 120, priority_col="q", tokens_col="n_tokens",
        by=(), allow_global=True,
    ).count() == 2
