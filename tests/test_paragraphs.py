"""Corpus-wide paragraph dedup (operators/paragraphs.py)."""

from __future__ import annotations

from pyspark.sql import functions as F

from distributed_vector_search_system_spark.operators.paragraphs import (
    explode_paragraphs,
    paragraph_dedup,
)


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_first_owner_keeps_paragraph(spark):
    docs = _docs(
        spark,
        [
            (1, "shared intro\n\nunique to one"),
            (2, "shared intro\n\nunique to two"),
            (3, "shared intro"),
        ],
    )
    got = {r["doc_id"]: r["dedup_text"] for r in paragraph_dedup(docs).collect()}
    assert got[1] == "shared intro\n\nunique to one"  # first owner keeps it
    assert got[2] == "unique to two"
    assert got[3] == ""  # everything owned elsewhere


def test_within_document_duplicates_collapse(spark):
    docs = _docs(spark, [(1, "again\n\nagain\n\nagain")])
    got = paragraph_dedup(docs).first()["dedup_text"]
    assert got == "again"


def test_paragraph_order_preserved(spark):
    docs = _docs(spark, [(1, "zz last alphabetically\n\naa first alphabetically")])
    got = paragraph_dedup(docs).first()["dedup_text"]
    assert got == "zz last alphabetically\n\naa first alphabetically"


def test_empty_paragraphs_dropped(spark):
    docs = _docs(spark, [(1, "one\n\n\n\ntwo"), (2, "   ")])
    rows = explode_paragraphs(docs).collect()
    assert {(r["doc_id"], r["paragraph"]) for r in rows} == {(1, "one"), (1, "two")}
    got = {r["doc_id"]: r["dedup_text"] for r in paragraph_dedup(docs).collect()}
    assert got[2] == ""


def test_every_document_comes_back(spark, sf_smoke):
    from distributed_vector_search_system_spark.tables import load_table

    docs = load_table(spark, sf_smoke, "documents")
    out = paragraph_dedup(docs)
    assert out.count() == docs.count()
    # no paragraph text survives twice corpus-wide
    paras = out.select(
        F.posexplode(F.split("dedup_text", "\n\n")).alias("i", "p")
    ).filter(F.trim("p") != "")
    total = paras.count()
    distinct = paras.select("p").distinct().count()
    assert total == distinct


# --- substring-level dedup (round 8) ---------------------------------------


def _sdocs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def _words(a, b):
    return " ".join(f"w{i}" for i in range(a, b))


def test_substring_dedup_finds_cross_doc_run(spark):
    """A verbatim run of >= window + stride - 1 tokens shared by two
    documents is guaranteed to contain a detected window; the first
    owner is the lower (doc_id, pos)."""
    from distributed_vector_search_system_spark.operators.paragraphs import (
        substring_dedup,
    )

    shared = _words(0, 12)  # 12 tokens >= window(8) + stride(4) - 1
    docs = _sdocs(spark, [
        (1, _words(100, 110) + " " + shared),
        (2, shared + " " + _words(200, 212)),
    ])
    dups = substring_dedup(docs, window=8, stride=4).collect()
    assert dups, "shared run must be detected"
    assert all(r["doc_id"] == 2 and r["owner_doc_id"] == 1 for r in dups)


def test_substring_dedup_exact_duplicate_docs(spark):
    """Every window of an exact duplicate doc resolves to the original."""
    from distributed_vector_search_system_spark.operators.paragraphs import (
        substring_dedup,
        substring_windows,
    )

    text = _words(0, 40)
    docs = _sdocs(spark, [(1, text), (2, text), (3, _words(500, 540))])
    n_win = substring_windows(docs, window=10).filter("id = 2").count()
    dups = substring_dedup(docs, window=10).collect()
    assert len(dups) == n_win
    assert {(r["doc_id"], r["owner_doc_id"]) for r in dups} == {(2, 1)}
    assert all(r["owner_pos"] == r["pos"] for r in dups)


def test_substring_dedup_within_doc_repetition(spark):
    """Within-document repetition counts too (pos tie-break): a
    12-token run repeated back-to-back (>= window + stride - 1 = 11
    per copy) must anchor identically in both copies, the second
    resolving to the first at the mirrored offset."""
    from distributed_vector_search_system_spark.operators.paragraphs import (
        substring_dedup,
    )

    text = _words(0, 12) + " " + _words(0, 12)
    dups = substring_dedup(
        _sdocs(spark, [(5, text)]), window=8, stride=4
    ).collect()
    assert dups
    assert all(
        r["doc_id"] == 5
        and r["owner_doc_id"] == 5
        and r["pos"] == r["owner_pos"] + 12
        for r in dups
    )


def test_substring_windows_short_docs_and_guards(spark):
    from distributed_vector_search_system_spark.operators.paragraphs import (
        substring_windows,
    )
    import pytest as _pytest

    docs = _sdocs(spark, [(1, "only three tokens")])
    assert substring_windows(docs, window=4).count() == 0
    with _pytest.raises(ValueError, match="window"):
        substring_windows(docs, window=0).count()
    with _pytest.raises(ValueError, match="stride"):
        substring_windows(docs, window=4, stride=0).count()


def test_substring_dedup_partition_independent(spark):
    from distributed_vector_search_system_spark.operators.paragraphs import (
        substring_dedup,
    )

    shared = _words(0, 30)
    rows = [(i, shared) for i in range(6)] + [
        (10 + i, _words(1000 * i, 1000 * i + 25)) for i in range(4)
    ]
    want = None
    for parts in (2, 5):
        docs = _sdocs(spark, rows).repartition(parts)
        got = sorted(
            (r["doc_id"], r["pos"], r["owner_doc_id"], r["owner_pos"])
            for r in substring_dedup(docs, window=10, stride=5).collect()
        )
        if want is None:
            want = got
        assert got == want and got
