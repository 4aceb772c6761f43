"""Property-based LWW tests for the mutable posting store: random
interleavings of doc upserts / replacements / deletes / compactions /
redeliveries, applied through ``MutablePostingIndexStore``, must always
leave the served BM25 ranking equal to the from-scratch plan over a
plain Python dict replaying the same log in seq order — the lexical
analog of tests/test_mutation_properties.py, covering the round-7
arbiter/dirty-marker/compaction state machine end to end."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from distributed_vector_search_system_spark.operators.retrieval import bm25_topk
from distributed_vector_search_system_spark.sources.posting_index import (
    MutablePostingIndexStore,
)

_IDS = st.integers(min_value=0, max_value=7)
_WORDS = ["apple", "banana", "cherry", "date", "elder", "fig"]
_TEXTS = st.lists(
    st.sampled_from(_WORDS), min_size=0, max_size=5
).map(" ".join)

_OP = st.one_of(
    st.tuples(st.just("upsert"), _IDS, _TEXTS),
    st.tuples(st.just("delete"), _IDS),
    st.tuples(st.just("compact")),
    st.tuples(st.just("redeliver")),
)

_BASE = [(i, "apple banana cherry"[: 6 * (i % 3 + 1)]) for i in range(4)]


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(ops=st.lists(_OP, min_size=1, max_size=7))
def test_store_ranking_equals_dict_replay(spark, tmp_path_factory, ops):
    root = tmp_path_factory.mktemp("pstore")
    docs = spark.createDataFrame(_BASE, "doc_id long, text string")
    store = MutablePostingIndexStore(str(root))
    store.init_base(docs)
    oracle = dict(_BASE)

    seq = 0
    pending: list[tuple] = []
    last_batch: list[tuple] | None = None

    def flush():
        nonlocal pending, last_batch
        if not pending:
            return
        store.apply_log(
            spark.createDataFrame(
                pending, "seq long, op string, doc_id long, text string"
            )
        )
        last_batch = pending
        pending = []

    for op in ops:
        if op[0] == "upsert":
            _, did, text = op
            seq += 1
            pending.append((seq, "upsert", did, text))
            oracle[did] = text
        elif op[0] == "delete":
            _, did = op
            seq += 1
            pending.append((seq, "delete", did, None))
            oracle.pop(did, None)
        elif op[0] == "compact":
            flush()
            store.compact(spark)
        else:  # redeliver: the previous batch arrives again (crash retry)
            flush()
            if last_batch is not None:
                store.apply_log(
                    spark.createDataFrame(
                        last_batch,
                        "seq long, op string, doc_id long, text string",
                    )
                )
    flush()

    q = spark.createDataFrame(
        [(0, ["banana", "cherry"])], "query_id long, qterms array<string>"
    )
    got = {
        (r["query_id"], r["rank"], r["id"], r["score"])
        for r in store.search(spark, q, 8).collect()
    }
    if not oracle:
        assert got == set()
        return
    ref = spark.createDataFrame(
        sorted(oracle.items()), "doc_id long, text string"
    )
    want = {
        (r["query_id"], r["rank"], r["id"], r["score"])
        for r in bm25_topk(ref, q, 8).collect()
    }
    assert got == want
