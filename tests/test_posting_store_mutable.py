"""MutablePostingIndexStore: LWW merge-on-read postings — O(Δ) lexical
index maintenance under doc upsert/replace/delete, equal to the
from-scratch BM25 over the equivalently mutated corpus."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from distributed_vector_search_system_spark.operators.retrieval import bm25_topk
from distributed_vector_search_system_spark.sources.posting_index import (
    MutablePostingIndexStore,
)


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def _q(spark, terms=("banana",)):
    return spark.createDataFrame(
        [(0, list(terms))], "query_id long, qterms array<string>"
    )


_BASE = [
    (1, "apple banana"),
    (2, "banana cherry banana"),
    (3, "cherry date"),
    (4, "apple date cherry"),
]

_LOG = [
    # replace doc 2: its old banana/cherry postings must die
    (1, "upsert", 2, "zebra quux"),
    # insert a strong banana doc
    (2, "upsert", 9, "banana banana banana banana"),
    # tombstone doc 4
    (3, "delete", 4, None),
    # zero-token doc: no postings, but counts in N / avgdl
    (4, "upsert", 11, "!!! ???"),
]

_MUTATED = [
    (1, "apple banana"),
    (2, "zebra quux"),
    (3, "cherry date"),
    (9, "banana banana banana banana"),
    (11, "!!! ???"),
]


def _log_df(spark, rows=_LOG):
    return spark.createDataFrame(
        rows, "seq long, op string, doc_id long, text string"
    )


def _store(spark, tmp_path, name="mstore"):
    s = MutablePostingIndexStore(str(tmp_path / name))
    s.init_base(_docs(spark, _BASE))
    return s


def _result(df):
    return {(r["query_id"], r["rank"], r["id"], r["score"]) for r in df.collect()}


def test_base_matches_from_scratch(spark, tmp_path):
    s = _store(spark, tmp_path)
    q = _q(spark, ("banana", "cherry"))
    got = _result(s.search(spark, q, 4))
    want = _result(bm25_topk(_docs(spark, _BASE), q, 4))
    assert got == want and got


def test_mutations_match_from_scratch_over_mutated_corpus(spark, tmp_path):
    """Replace kills old terms, insert ranks, delete tombstones, and
    the zero-token doc shifts N/avgdl exactly like the scan plan."""
    s = _store(spark, tmp_path)
    s.apply_log(_log_df(spark))
    q = _q(spark, ("banana", "cherry"))
    got = _result(s.search(spark, q, 5))
    want = _result(bm25_topk(_docs(spark, _MUTATED), q, 5))
    assert got == want and got
    ids = {t[2] for t in got}
    assert 9 in ids and 4 not in ids  # insert visible, tombstone gone
    assert 2 not in ids  # replaced doc no longer says banana


def test_redelivered_log_changes_nothing(spark, tmp_path):
    s = _store(spark, tmp_path)
    s.apply_log(_log_df(spark))
    q = _q(spark, ("banana", "date"))
    before = _result(s.search(spark, q, 5))
    s.apply_log(_log_df(spark))  # crash redelivery: same batch again
    assert _result(s.search(spark, q, 5)) == before


def test_compact_preserves_results_and_gcs(spark, tmp_path):
    s = _store(spark, tmp_path)
    s.apply_log(_log_df(spark))
    q = _q(spark, ("banana", "cherry", "date"))
    before = _result(s.search(spark, q, 5))
    s.compact(spark)
    assert s._current_gen() == "gen-000001"
    assert _result(s.search(spark, q, 5)) == before
    # compacted base holds only live rows; the delta dir is gone
    base, delta, muts = s._paths()
    assert not os.path.exists(delta)
    live = spark.read.parquet(base)
    assert live.filter(F.col("id").isin([2])).filter(
        F.col("term") == "banana"
    ).count() == 0
    # one winner muts row per doc: 5 live + doc 4's delete tombstone
    # (tombstones survive compaction — ADVICE r07, see
    # test_stale_predelete_upsert_redelivered_after_compaction)
    kept = spark.read.parquet(muts)
    assert kept.count() == 6
    assert kept.filter("op = 'delete'").collect()[0]["id"] == 4


def test_redelivery_across_compaction(spark, tmp_path):
    """A pre-compaction batch re-appended AFTER compaction: the kept
    winner rows out-arbitrate the stale seqs, results unchanged."""
    s = _store(spark, tmp_path)
    s.apply_log(_log_df(spark))
    s.compact(spark)
    q = _q(spark, ("banana", "cherry"))
    before = _result(s.search(spark, q, 5))
    s.apply_log(_log_df(spark))  # stale redelivery into the new gen
    assert _result(s.search(spark, q, 5)) == before


def test_stale_predelete_upsert_redelivered_after_compaction(spark, tmp_path):
    """The resurrection scenario (ADVICE r07): batch A upserts a doc,
    batch B deletes it, compaction folds both — then batch A ALONE is
    crash-redelivered.  Without the retained tombstone the stale upsert
    would find no arbiter row and win by default; with it, the delete's
    higher seq keeps the doc dead."""
    s = _store(spark, tmp_path)
    batch_a = [(1, "upsert", 4, "banana banana banana")]
    s.apply_log(_log_df(spark, batch_a))
    s.apply_log(_log_df(spark, [(2, "delete", 4, None)]))
    s.compact(spark)
    q = _q(spark, ("banana",))
    before = _result(s.search(spark, q, 5))
    assert not any(t[2] == 4 for t in before)
    s.apply_log(_log_df(spark, batch_a))  # stale pre-delete redelivery
    assert _result(s.search(spark, q, 5)) == before


def test_delete_then_reinsert_across_compaction(spark, tmp_path):
    s = _store(spark, tmp_path)
    s.apply_log(_log_df(spark))
    s.compact(spark)
    s.apply_log(
        _log_df(spark, [(5, "upsert", 4, "banana returns banana")])
    )
    q = _q(spark, ("banana",))
    got = _result(s.search(spark, q, 5))
    mutated = [r for r in _MUTATED] + [(4, "banana returns banana")]
    want = _result(bm25_topk(_docs(spark, mutated), q, 5))
    assert got == want and any(t[2] == 4 for t in got)


def test_filter_ids_restricts_results_not_stats(spark, tmp_path):
    s = _store(spark, tmp_path)
    s.apply_log(_log_df(spark))
    q = _q(spark, ("banana",))
    unfiltered = {t[2]: t[3] for t in _result(s.search(spark, q, 5))}
    flt = spark.createDataFrame([(1,)], "id long")
    got = _result(s.search(spark, q, 5, filter_ids=flt))
    assert {(t[2], t[3]) for t in got} == {(1, unfiltered[1])}


def test_append_only_api_is_guarded(spark, tmp_path):
    s = _store(spark, tmp_path)
    with pytest.raises(NotImplementedError):
        s.append_batch(_docs(spark, _BASE), 1)


# --- TextEngine integration ---------------------------------------------------


def test_text_engine_store_mode_tracks_scan_exactly(spark, tmp_path):
    from distributed_vector_search_system_spark.engine import STRONG
    from distributed_vector_search_system_spark.text_engine import TextEngine

    e = TextEngine(spark, _docs(spark, _BASE))
    e.attach_store(str(tmp_path / "estore"))
    q = _q(spark, ("banana", "cherry"))
    assert _result(e.search(q, 4, method="store")) == _result(e.search(q, 4))
    e.upsert_doc(2, "zebra quux")
    e.upsert_doc(9, "banana banana banana banana")
    e.delete_doc(4)
    # STRONG compacts: the store receives the log as O(batch) appends —
    # the base generation is untouched (no rebuild)
    got = _result(e.search(q, 5, method="store", consistency=STRONG))
    assert got == _result(e.search(q, 5))
    assert e._store._current_gen() == "gen-000000"
    assert e.index_builds == 0  # the per-epoch rebuild tier never ran


def test_text_engine_store_requires_attach(spark):
    from distributed_vector_search_system_spark.text_engine import TextEngine

    e = TextEngine(spark, _docs(spark, _BASE))
    with pytest.raises(ValueError, match="attach_store"):
        e.search(_q(spark), 3, method="store")


def test_text_engine_store_filtered(spark, tmp_path):
    from distributed_vector_search_system_spark.engine import STRONG
    from distributed_vector_search_system_spark.text_engine import TextEngine

    docs = spark.createDataFrame(
        [(i, t, l) for (i, t), l in zip(_BASE, ["en", "en", "de", "en"])],
        "doc_id long, text string, lang string",
    )
    e = TextEngine(spark, docs)
    e.attach_store(str(tmp_path / "estore"))
    q = _q(spark, ("cherry",))
    want = _result(e.search(q, 4, where="lang = 'en'"))
    got = _result(e.search(q, 4, method="store", where="lang = 'en'"))
    assert got == want and {t[2] for t in got} == {2, 4}


def test_streaming_log_sink_matches_direct_apply(spark, tmp_path):
    """End-to-end through writeStream/foreachBatch: micro-batched
    delivery of the same log yields the same live index."""
    s = _store(spark, tmp_path)
    src = str(tmp_path / "logsrc")
    _log_df(spark, _LOG[:2]).write.mode("append").parquet(src)
    _log_df(spark, _LOG[2:]).write.mode("append").parquet(src)
    stream = (
        spark.readStream.schema("seq long, op string, doc_id long, text string")
        .option("maxFilesPerTrigger", "1")
        .parquet(src)
    )
    q = s.streaming_log_sink(stream, checkpoint=str(tmp_path / "ckpt"))
    q.awaitTermination(120)
    qdf = _q(spark, ("banana", "cherry"))
    got = _result(s.search(spark, qdf, 5))
    want = _result(bm25_topk(_docs(spark, _MUTATED), qdf, 5))
    assert got == want and got


def test_delete_only_log_is_honored(spark, tmp_path):
    """A delete-only log writes NO delta postings — the clean-generation
    fast path must not mistake it for an unmutated store (the _DIRTY
    marker gates the arbiter, not the delta dir)."""
    s = _store(spark, tmp_path)
    s.apply_log(_log_df(spark, [(1, "delete", 2, None)]))
    q = _q(spark, ("banana",))
    got = _result(s.search(spark, q, 5))
    want = _result(bm25_topk(_docs(spark, [r for r in _BASE if r[0] != 2]), q, 5))
    assert got == want and all(t[2] != 2 for t in got)


def test_clean_generation_skips_arbiter(spark, tmp_path):
    """Fresh init and post-compact reads take the arbiter-free plan,
    and the DIRTY plan adds NO window either: the LWW arbiter is a
    max-aggregate (map-side combinable), so every state carries exactly
    ONE window — the rank.  The dirty plan is distinguished by its
    muts/ scan; compact removes it — and the rows come back identical."""

    def plan(df):
        return df._jdf.queryExecution().optimizedPlan().toString()

    def n_windows(df):
        return plan(df).count("Window [")

    s = _store(spark, tmp_path)
    q = _q(spark, ("banana", "cherry"))
    def n_scans(df):  # parquet relation nodes in the optimized plan
        return plan(df).count("] parquet")

    s = _store(spark, tmp_path)
    q = _q(spark, ("banana", "cherry"))
    clean = s.search(spark, q, 4)
    assert n_windows(clean) == 1  # clean: no arbiter, aggregate df
    assert n_scans(clean) == 2  # postings twice (df pass + score pass)
    s.apply_log(_log_df(spark))
    dirty = s.search(spark, q, 4)
    # dirty: the arbiter enters as max-aggregates + joins (never a
    # per-id sort window); df comes from a term-partitioned window
    # instead of a second pass.  Round 10's touched-id split keeps the
    # restricted base scanned ONCE per pass (7 scans total: base once,
    # tiny delta twice for the cross-source dedup anti-join, tiny
    # muts_log twice for the touched set, muts floor + log once for
    # the winner aggregate) and every corpus-sized subtree sits BELOW
    # broadcast joins — the only exchanges over restricted mass are
    # the df window and the score aggregate, same as a clean read.
    assert n_windows(dirty) == 2  # term-df window + rank window
    assert "seq DESC" not in plan(dirty)  # no row_number arbiter
    assert n_scans(dirty) == 7
    before = _result(s.search(spark, q, 5))
    s.compact(spark)
    after = s.search(spark, q, 4)
    assert n_windows(after) == 1  # compact restores fast path
    assert n_scans(after) == 2
    assert _result(s.search(spark, q, 5)) == before


def test_generation_pinned_reads(spark, tmp_path):
    """at(gen): the previous generation stays readable for one cycle —
    a pinned search sees the pre-compaction state while the live store
    moves on; pins are read-only; unknown generations raise."""
    import pytest as _pytest

    s = _store(spark, tmp_path)
    s.apply_log(_log_df(spark))          # batch 1 (the standard mutations)
    q = _q(spark, ("banana", "cherry"))
    state1 = _result(s.search(spark, q, 5))
    s.compact(spark)                      # gen-000001; gen-000000 retained
    gens = s.generations()
    assert gens == ["gen-000000", "gen-000001"]
    # new write AFTER the compaction: replace doc 1 with unrelated text
    s.apply_log(_log_df(spark, [(100, "upsert", 1, "zzz qqq")]))
    live = _result(s.search(spark, q, 5))
    assert live != state1                 # doc 1 lost its banana terms
    pinned = s.at("gen-000000")
    assert _result(pinned.search(spark, q, 5)) == state1  # time travel
    with _pytest.raises(ValueError, match="read-only"):
        pinned.apply_log(_log_df(spark))
    with _pytest.raises(ValueError, match="read-only"):
        pinned.compact(spark)
    with _pytest.raises(ValueError, match="unknown generation"):
        s.at("gen-999999")
    # the live handle is untouched by the view
    assert _result(s.search(spark, q, 5)) == live


def test_mixed_layout_generation_takes_full_arbiter(spark, tmp_path):
    """ADVICE r10 (medium): a generation written by the PRE-split
    layout appended post-fold arbiter rows into muts/ directly.  When
    new code then mutates it, the freshly created muts_log/ names only
    the NEW ids — a subset of the truly touched set — so the touched-id
    split would serve the legacy mutations' superseded base postings
    as "untouched winners".  The _MUTS_FLOOR layout marker gates the
    split: absent marker => full arbiter, correct results."""
    s = _store(spark, tmp_path)
    gen_dir = os.path.join(s.root, "gen-000000")
    # simulate a pre-marker generation: strip the layout certificate
    os.remove(os.path.join(gen_dir, "_MUTS_FLOOR"))
    # legacy-layout mutation: replace doc 2 (seq 1) with postings in
    # delta/ and the arbiter row appended INTO muts/ (the old layout)
    legacy = spark.createDataFrame(
        [(1, "upsert", 2, "zebra quux")],
        "seq long, op string, doc_id long, text string",
    )
    s._derive_seq(
        legacy, "doc_id", "text", seq_col="seq"
    ).write.mode("append").parquet(os.path.join(gen_dir, "delta"))
    spark.createDataFrame(
        [(2, 1, "upsert", 2)], "id long, seq long, op string, dl long"
    ).write.mode("append").parquet(os.path.join(gen_dir, "muts"))
    from distributed_vector_search_system_spark.sources.fsutil import write_marker

    write_marker(spark, os.path.join(gen_dir, "_DIRTY"), "1\n")
    # new-code mutation touching a DIFFERENT doc creates muts_log/
    s.apply_log(_log_df(spark, [(2, "upsert", 9, "banana banana banana banana")]))
    # the split must decline on the uncertified layout...
    assert s._touched_ids(spark) is None
    # ...and the read must not resurrect doc 2's old banana/cherry rows
    mutated = [
        (1, "apple banana"),
        (2, "zebra quux"),
        (3, "cherry date"),
        (4, "apple date cherry"),
        (9, "banana banana banana banana"),
    ]
    q = _q(spark, ("banana", "cherry"))
    got = _result(s.search(spark, q, 5))
    want = _result(bm25_topk(_docs(spark, mutated), q, 5))
    assert got == want and got
    # compact rewrites the layout, certifies the floor, and the split
    # resumes on the next dirty generation
    s.compact(spark)
    assert os.path.exists(
        os.path.join(s.root, s._current_gen(), "_MUTS_FLOOR")
    )
    s.apply_log(_log_df(spark, [(3, "delete", 9, None)]))
    assert s._touched_ids(spark) is not None
    got2 = _result(s.search(spark, q, 5))
    want2 = _result(bm25_topk(_docs(spark, mutated[:-1]), q, 5))
    assert got2 == want2 and got2


def test_floor_marker_written_at_init_and_split_active(spark, tmp_path):
    s = _store(spark, tmp_path, "marked")
    assert os.path.exists(os.path.join(s.root, "gen-000000", "_MUTS_FLOOR"))
    s.apply_log(_log_df(spark))
    assert s._touched_ids(spark) is not None


def test_describe_posting_store(spark, tmp_path):
    from distributed_vector_search_system_spark.sources.posting_index import (
        describe_posting_store,
    )

    s = _store(spark, tmp_path, "described")
    d0 = describe_posting_store(s, spark)
    assert d0["live_docs"] == 4 and d0["tombstones"] == 0
    assert not d0["dirty"] and d0["mutation_backlog_rows"] == 0
    assert d0["bytes"]["postings"] and d0["generation"] == "gen-000000"
    s.apply_log(_log_df(spark))
    d1 = describe_posting_store(s, spark)
    # replace(2) + insert(9) + delete(4) + zero-token insert(11)
    assert d1["dirty"] and d1["mutation_backlog_rows"] == 4
    assert d1["live_docs"] == 5 and d1["tombstones"] == 1
    s.compact(spark)
    d2 = describe_posting_store(s, spark)
    assert not d2["dirty"] and d2["mutation_backlog_rows"] == 0
    assert d2["live_docs"] == 5 and d2["generation"] == "gen-000001"
