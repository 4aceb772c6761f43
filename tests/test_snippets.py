"""Snippet generation (operators/snippets.py): hand-computed best
windows, coverage/tie-break determinism vs a brute-force reference,
hits restriction, and the broadcast plan shape."""

from __future__ import annotations

import itertools

import pytest
from pyspark.sql import functions as F

from distributed_vector_search_system_spark.functions.text import TOKEN_RE  # noqa: F401
from distributed_vector_search_system_spark.operators.snippets import (
    best_window_snippets,
)


def _docs(spark):
    rows = [
        (0, "alpha beta gamma delta alpha"),
        (1, "zzz alpha zzz zzz beta gamma zzz"),
        (2, "nothing matches here"),
        (3, "beta"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def _queries(spark, terms, qid=7):
    return spark.createDataFrame(
        [(qid, terms)], "query_id long, qterms array<string>"
    )


def _brute(corpus, qterms, W):
    """Brute-force best window per doc: max distinct coverage, then
    smallest MATCH start (the operator's documented convention)."""
    out = {}
    for did, text in corpus:
        toks = [t for t in text.lower().split() if t]
        matches = [i for i, t in enumerate(toks) if t in qterms]
        if not matches:
            continue
        best = None
        for s in matches:
            cov = len({toks[p] for p in matches if s <= p < s + W})
            key = (-cov, s)
            if best is None or key < best[0]:
                best = (key, s, cov)
        _, s, cov = best
        out[did] = (s, cov, " ".join(toks[s : s + W]))
    return out


@pytest.mark.parametrize("w", [2, 3, 8])
def test_matches_bruteforce(spark, w):
    docs = _docs(spark)
    qterms = ["alpha", "beta", "gamma"]
    got = {
        r["id"]: (r["win_start"], r["n_matched"], r["snippet"])
        for r in best_window_snippets(docs, _queries(spark, qterms), w).collect()
    }
    corpus = [(r["doc_id"], r["text"]) for r in docs.collect()]
    want = _brute(corpus, set(qterms), w)
    assert got == want


def test_no_match_docs_absent_and_window_validates(spark):
    out = best_window_snippets(
        _docs(spark), _queries(spark, ["qqq"]), 4
    ).collect()
    assert out == []
    with pytest.raises(ValueError):
        best_window_snippets(_docs(spark), _queries(spark, ["alpha"]), 0)


def test_hits_restricts_to_page(spark):
    hits = spark.createDataFrame([(7, 1)], "query_id long, id long")
    out = best_window_snippets(
        _docs(spark), _queries(spark, ["alpha", "beta"]), 4, hits=hits
    ).collect()
    assert {r["id"] for r in out} == {1}


def test_earliest_window_wins_full_coverage_tie(spark):
    """Doc 0 covers {alpha,beta,gamma} from position 0 with W=3 — the
    later alpha at position 4 must not displace the earlier window."""
    out = best_window_snippets(
        _docs(spark), _queries(spark, ["alpha", "beta", "gamma"]), 3
    ).collect()
    d0 = [r for r in out if r["id"] == 0][0]
    assert (d0["win_start"], d0["n_matched"]) == (0, 3)
    assert d0["snippet"] == "alpha beta gamma"


def test_query_vocab_broadcast_plan(spark):
    plan = (
        best_window_snippets(_docs(spark), _queries(spark, ["alpha"]), 4)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "CartesianProduct" not in plan
    assert "BroadcastHashJoin" in plan


def test_repetition_spam_cap_bounds_pairing(spark):
    """VERDICT r09 #3: a doc repeating one query term 10k times must not
    go quadratic.  The cap keeps the earliest M positions per
    (query, doc, term); for the spam doc the winner (earliest match,
    coverage 1) is unchanged for ANY M >= 1, and the capped plan
    carries the row_number filter."""
    spam = " ".join(["alpha"] * 10_000)
    docs = spark.createDataFrame(
        [(0, spam), (1, "zzz alpha beta")], "doc_id long, text string"
    )
    q = _queries(spark, ["alpha", "beta"])
    capped = best_window_snippets(docs, q, 4, max_positions_per_term=8)
    uncapped = best_window_snippets(docs, q, 4, max_positions_per_term=None)
    got = {r["id"]: (r["win_start"], r["n_matched"], r["snippet"])
           for r in capped.collect()}
    want = {r["id"]: (r["win_start"], r["n_matched"], r["snippet"])
            for r in uncapped.collect()}
    assert got == want
    assert got[0] == (0, 1, "alpha alpha alpha alpha")
    assert got[1] == (1, 2, "alpha beta")
    # the cap is in the executed plan (row_number <= M over pos)
    plan = capped._jdf.queryExecution().executedPlan().toString()
    assert "_prn" in plan


def test_cap_exact_when_counts_below_m(spark):
    """Default cap (64) leaves any realistic page untouched: equals the
    uncapped form on the hand fixture for every window size."""
    docs = _docs(spark)
    q = _queries(spark, ["alpha", "beta", "gamma"])
    for w in (1, 3, 8):
        a = sorted(map(tuple, best_window_snippets(docs, q, w).collect()))
        b = sorted(map(tuple, best_window_snippets(
            docs, q, w, max_positions_per_term=None).collect()))
        assert a == b


def test_cap_validates(spark):
    with pytest.raises(ValueError, match="max_positions_per_term"):
        best_window_snippets(
            _docs(spark), _queries(spark, ["alpha"]), 4,
            max_positions_per_term=0,
        )
