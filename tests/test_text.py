"""Text-analysis function semantics."""

from __future__ import annotations

from pyspark.sql import functions as F

from distributed_vector_search_system_spark.functions.text import (
    FINGERPRINT_MOD,
    detect_language,
    fingerprint,
    quality_score,
    token_count,
    tokens,
    word_shingles,
)


def _one(spark, text, col):
    return spark.createDataFrame([(text,)], "text string").select(col.alias("v")).first()["v"]


def test_tokens_and_count(spark):
    assert _one(spark, "The quick  Brown-fox!! 42", tokens("text")) == [
        "the", "quick", "brown", "fox", "42",
    ]
    assert _one(spark, "", token_count("text")) == 0
    assert _one(spark, "one two three", token_count("text")) == 3


def test_word_shingles(spark):
    got = _one(spark, "a b c d", word_shingles(tokens("text"), 2))
    assert got == ["a b", "b c", "c d"]
    assert _one(spark, "solo", word_shingles(tokens("text"), 2)) == []
    # duplicates collapse
    got = _one(spark, "x y x y", word_shingles(tokens("text"), 2))
    assert sorted(got) == ["x y", "y x"]


def test_detect_language(spark):
    assert _one(spark, "the cat is in the house and a dog", detect_language("text")) == "en"
    assert _one(spark, "der hund ist mit der katze und das haus", detect_language("text")) == "de"
    assert _one(spark, "le chat est dans une maison du chien", detect_language("text")) == "fr"
    assert _one(spark, "qqq www eee", detect_language("text")) == "und"
    # tie between en and de resolves to en (profile order)
    assert _one(spark, "the der", detect_language("text")) == "en"


def test_quality_score_bounds(spark):
    hi = _one(spark, "the a of and to in is for " * 40, quality_score("text"))
    lo = _one(spark, "12345 67890", quality_score("text"))
    assert 0.0 <= lo < hi <= 1.0


def test_fingerprint_matches_python(spark):
    for text in ["hello world", "a", "spark sql engine"]:
        acc = 0
        for ch in text:
            acc = (acc * 31 + ord(ch)) % FINGERPRINT_MOD
        assert _one(spark, text, fingerprint("text")) == acc


def test_fingerprint_order_sensitive(spark):
    assert _one(spark, "ab", fingerprint("text")) != _one(spark, "ba", fingerprint("text"))


# --- PII scrubbing ---------------------------------------------------------

def test_scrub_pii_removes_urls_and_emails(spark):
    from distributed_vector_search_system_spark.functions.text import (
        pii_counts,
        scrub_pii,
    )

    rows = [
        (1, "plain text no pii"),
        (2, "mail me at alice.smith+x@sub.example.org please"),
        (3, "docs at https://example.com/a?b=1#c and http://x.io"),
        (4, "both bob@ex.co and https://ex.co/page here"),
        (5, ""),
    ]
    df = spark.createDataFrame(rows, "id long, text string")
    got = {
        r["id"]: (r["s"], r["c"]["n_urls"], r["c"]["n_emails"])
        for r in df.select(
            "id", scrub_pii("text").alias("s"), pii_counts("text").alias("c")
        ).collect()
    }
    assert got[1] == ("plain text no pii", 0, 0)
    assert got[2] == ("mail me at [REDACTED] please", 0, 1)
    assert got[3] == ("docs at [REDACTED] and [REDACTED]", 2, 0)
    assert got[4] == ("both [REDACTED] and [REDACTED] here", 1, 1)
    assert got[5] == ("", 0, 0)


def test_scrub_pii_idempotent(spark):
    from distributed_vector_search_system_spark.functions.text import scrub_pii

    df = spark.createDataFrame([(1, "x bob@ex.co y https://e.co z")], "id long, text string")
    once = df.select(scrub_pii("text").alias("s"))
    twice = once.select(scrub_pii("s").alias("s"))
    assert once.first()["s"] == twice.first()["s"]


def test_ws_tokens_vertical_tab_parity_with_duckdb(spark):
    """ADVICE r04: Java's \\s includes \\x0B (vertical tab), RE2's does
    not — ws_tokens uses an explicit class so both engines split the
    SAME way on a document containing \\v."""
    import duckdb

    from distributed_vector_search_system_spark.functions.text import (
        WS_SPLIT_RE,
        ws_tokens,
    )

    text = "alpha\x0bbeta\tgamma  delta\x0b\x0bepsilon"
    df = spark.createDataFrame([(1, text)], "id long, text string")
    got_spark = df.select(ws_tokens("text").alias("t")).first()["t"]

    con = duckdb.connect()
    got_duck = con.execute(
        "SELECT list_filter(str_split_regex(?, ?), t -> t <> '')",
        [text, WS_SPLIT_RE],
    ).fetchone()[0]
    want = ["alpha", "beta", "gamma", "delta", "epsilon"]
    assert got_spark == want
    assert got_duck == want


def test_pii_extended_classes(spark):
    """Round 11: phone + IPv4 classes, scrub-order counting (an email
    inside a URL is the URL's finding), class narrowing."""
    from distributed_vector_search_system_spark.functions.text import (
        pii_class_counts,
        scrub_pii,
    )

    rows = [
        (1, "call 555-123-4567 or (800) 555 1234 now"),
        (2, "host 10.0.0.12 and 192.168.1.1 up"),
        (3, "see https://a.io/u@b.com x@y.org 1.2.3.4"),
        (4, "clean words only"),
    ]
    df = spark.createDataFrame(rows, "id long, text string")
    got = {
        r["id"]: (r["c"]["n_urls"], r["c"]["n_emails"],
                  r["c"]["n_phones"], r["c"]["n_ipv4s"], r["s"])
        for r in df.select(
            "id",
            pii_class_counts("text").alias("c"),
            scrub_pii("text").alias("s"),
        ).collect()
    }
    assert got[1][2] == 2 and got[1][:2] == (0, 0)
    assert got[1][4] == "call [REDACTED] or [REDACTED] now"
    assert got[2][3] == 2
    # the URL swallows the embedded email; the bare email and IP count
    assert got[3][:4] == (1, 1, 0, 1)
    assert got[4] == (0, 0, 0, 0, "clean words only")
    # class narrowing: phones kept when only urls scrubbed
    kept = df.filter("id = 1").select(
        scrub_pii("text", classes=("url",)).alias("s")
    ).collect()[0]["s"]
    assert "555-123-4567" in kept
    import pytest as _pytest

    with _pytest.raises(ValueError):
        df.select(scrub_pii("text", classes=("ssn",)))
