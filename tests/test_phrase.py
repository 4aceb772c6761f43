"""Exact phrase search (operators/phrase.py).

Oracle parity for phrase_topk / phrase_index_topk runs in
test_oracle_parity.py; these tests pin the anchor-intersection math on
adversarial synthetic docs (overlapping and repeated-term phrases),
scratch==indexed equality, and the indexed plan's term pushdown."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from distributed_vector_search_system_spark.operators.phrase import (
    phrase_search_index,
    phrase_topk,
    write_positional_index,
)
from distributed_vector_search_system_spark.tables import load_table

_DOCS = [
    (1, "the quick brown fox jumps over the lazy dog"),
    (2, "quick brown quick brown quick brown"),
    (3, "brown quick brown fox"),
    (4, "aa aa aa aa"),          # repeated-term phrases, overlapping
    (5, "aa bb aa bb aa"),
    (6, "zz"),                   # never matches
]


def _docs(spark):
    return spark.createDataFrame(_DOCS, "doc_id long, text string")


def _q(spark, *phrases):
    return spark.createDataFrame(
        [(i, list(p)) for i, p in enumerate(phrases)],
        "query_id long, phrase array<string>",
    )


def _result(df):
    return sorted(
        (r["query_id"], r["id"], r["phrase_tf"], r["rank"]) for r in df.collect()
    )


def _naive(phrase, qid, k):
    """Reference: count contiguous occurrences by list scan."""
    hits = []
    for did, text in _DOCS:
        w = [t for t in text.lower().split() if t]
        m = len(phrase)
        n = sum(1 for i in range(len(w) - m + 1) if w[i : i + m] == list(phrase))
        if n > 0:
            hits.append((n, did))
    hits.sort(key=lambda t: (-t[0], t[1]))
    return sorted(
        (qid, did, n, rank + 1) for rank, (n, did) in enumerate(hits[:k])
    )


def test_counts_and_order_and_overlap(spark):
    """Occurrence counts match a naive scan, including OVERLAPPING
    occurrences of repeated-term phrases ('aa aa' in 'aa aa aa aa'
    occurs 3 times) and in-order-only matching ('quick brown' but not
    'brown quick' reversed)."""
    for phrase in (
        ("quick", "brown"),
        ("brown", "quick"),
        ("aa", "aa"),
        ("aa", "bb", "aa"),
        ("the", "lazy", "dog"),
        ("dog", "lazy"),  # wrong order: zero rows for doc 1
        ("zz",),          # single-token degrade
    ):
        got = _result(phrase_topk(_docs(spark), _q(spark, phrase), 10))
        assert got == _naive(phrase, 0, 10), phrase


def test_absent_phrase_returns_no_rows(spark):
    out = phrase_topk(_docs(spark), _q(spark, ("missing", "entirely")), 5)
    assert out.count() == 0


def test_index_equals_scratch(spark, sf_oracle, tmp_path):
    from distributed_vector_search_system_spark.registry.llm import (
        _phrase_queries,
    )

    docs = load_table(spark, sf_oracle, "documents")
    path = str(tmp_path / "posidx")
    write_positional_index(docs, path)
    q = _phrase_queries(spark, sf_oracle)
    a = _result(phrase_topk(docs, q, 5))
    b = _result(phrase_search_index(spark, path, q, 5))
    assert a and a == b


def test_indexed_plan_pushes_terms_down(spark, tmp_path):
    """The phrase's terms reach the positional-index scan as
    PushedFilters — unrelated terms' row groups are skippable."""
    path = str(tmp_path / "posidx_small")
    write_positional_index(_docs(spark), path)
    df = phrase_search_index(spark, path, _q(spark, ("quick", "brown")), 5)
    plan = df._jdf.queryExecution().explainString(
        df.sparkSession._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            "formatted"
        )
    )
    pushed = [l for l in plan.splitlines() if "PushedFilters" in l]
    assert any("term" in l and ("quick" in l or "In(" in l) for l in pushed), plan


def test_text_engine_phrase_gates_and_epochs(spark, tmp_path):
    """search_phrase under the engine: STRONG sees a doc mutation, the
    positional index rebuilds per epoch (not per read), and scan ==
    indexed at every step."""
    from distributed_vector_search_system_spark.text_engine import TextEngine

    eng = TextEngine(spark, _docs(spark))
    eng.attach_index(str(tmp_path / "idx"))
    q = _q(spark, ("quick", "brown"))
    scan0 = _result(eng.search_phrase(q, 5))
    idx0 = _result(eng.search_phrase(q, 5, method="indexed"))
    idx0_again = _result(eng.search_phrase(q, 5, method="indexed"))
    assert scan0 == idx0 == idx0_again and scan0
    builds_after_reads = eng.index_builds
    # replace doc 2 ('quick brown' x3) with a phrase-free text; STRONG
    # must drop it from both paths, with exactly one positional rebuild
    eng.upsert_doc(2, "nothing here")
    s1 = _result(eng.search_phrase(q, 5, consistency="strong"))
    i1 = _result(eng.search_phrase(q, 5, consistency="strong", method="indexed"))
    assert s1 == i1 and all(t[1] != 2 for t in i1) and any(t[1] == 1 for t in i1)
    assert eng.index_builds == builds_after_reads + 1
    # prune keeps the newest positional epoch on disk
    removed = eng.prune_epochs(keep=1)
    import os
    left = os.listdir(str(tmp_path / "idx"))
    assert sum(1 for n in left if n.startswith("positional_e")) == 1


# --- proximity (unordered window) --------------------------------------------


def test_proximity_counts_match_naive(spark):
    from distributed_vector_search_system_spark.operators.phrase import (
        proximity_topk,
    )

    def naive(terms, window):
        out = {}
        ts = set(terms)
        for did, text in _DOCS:
            w = [t for t in text.lower().split() if t]
            n = 0
            for s in range(len(w)):  # same clipped-start convention
                if ts <= set(w[s : s + window]):
                    n += 1
            if n:
                out[did] = n
        return out

    for terms, window in (
        (["quick", "brown"], 3),
        (["fox", "dog"], 6),       # within 6 of each other in doc 1? spans
        (["the", "dog"], 3),
        (["aa", "bb"], 2),
        (["quick"], 1),            # single-term: every occurrence window
    ):
        q = spark.createDataFrame(
            [(0, terms)], "query_id long, terms array<string>"
        )
        got = {
            r["id"]: r["window_count"]
            for r in proximity_topk(
                _docs(spark), q, 10, window=window
            ).collect()
        }
        assert got == naive(terms, window), (terms, window)


def test_proximity_order_insensitive_and_phrase_is_stricter(spark):
    """Proximity accepts both orders; the exact phrase only one —
    'dog lazy' has proximity hits in doc 1 but zero phrase hits."""
    from distributed_vector_search_system_spark.operators.phrase import (
        proximity_topk,
    )

    q = spark.createDataFrame(
        [(0, ["dog", "lazy"])], "query_id long, terms array<string>"
    )
    prox = proximity_topk(_docs(spark), q, 10, window=3).collect()
    assert any(r["id"] == 1 for r in prox)
    ph = phrase_topk(_docs(spark), _q(spark, ("dog", "lazy")), 10).collect()
    assert all(r["id"] != 1 for r in ph)


def test_phrase_and_proximity_randomized_batch(spark):
    """200 random (doc corpus, query) cases checked in TWO Spark passes
    against pure-python references — alignment edges, repeated tokens,
    and tiny vocabularies stress the anchor math far beyond the
    hand-written cases."""
    import random

    rng = random.Random(8)
    vocab = ["a", "b", "c", "d"]
    docs = [
        (i, " ".join(rng.choice(vocab) for _ in range(rng.randint(1, 12))))
        for i in range(60)
    ]
    ddf = spark.createDataFrame(docs, "doc_id long, text string")
    phrases = [
        (qid, [rng.choice(vocab) for _ in range(rng.randint(1, 3))])
        for qid in range(20)
    ]
    qdf = spark.createDataFrame(phrases, "query_id long, phrase array<string>")

    def naive_phrase(p):
        out = {}
        for did, text in docs:
            w = text.split()
            m = len(p)
            n = sum(1 for i in range(len(w) - m + 1) if w[i : i + m] == p)
            if n:
                out[did] = n
        return out

    got = {}
    for r in phrase_topk(ddf, qdf, 10**6).collect():
        got.setdefault(r["query_id"], {})[r["id"]] = r["phrase_tf"]
    for qid, p in phrases:
        assert got.get(qid, {}) == naive_phrase(p), (qid, p)

    from distributed_vector_search_system_spark.operators.phrase import (
        proximity_topk,
    )

    terms = [
        (qid, sorted({rng.choice(vocab) for _ in range(rng.randint(1, 3))}))
        for qid in range(20)
    ]
    tdf = spark.createDataFrame(terms, "query_id long, terms array<string>")
    W = 4

    def naive_prox(ts):
        out = {}
        for did, text in docs:
            w = text.split()
            n = sum(1 for s in range(len(w)) if set(ts) <= set(w[s : s + W]))
            if n:
                out[did] = n
        return out

    gotp = {}
    for r in proximity_topk(ddf, tdf, 10**6, window=W).collect():
        gotp.setdefault(r["query_id"], {})[r["id"]] = r["window_count"]
    for qid, ts in terms:
        assert gotp.get(qid, {}) == naive_prox(ts), (qid, ts)


# -- sloppy phrase (round 12, VERDICT r11 item 3) ----------------------------


def _injective(slot_positions):
    """Brute-force: does an assignment of DISTINCT positions to slots
    exist (each slot from its own feasible set)?  Backtracking over
    slots — the exact matching reference the operator's Hall-condition
    test must agree with."""
    def rec(i, used):
        if i == len(slot_positions):
            return True
        return any(
            p not in used and rec(i + 1, used | {p})
            for p in slot_positions[i]
        )

    return rec(0, frozenset())


def _naive_slop(phrase, qid, k, slop):
    """Reference (round 13, ADVICE r12 item 1): tf = covering window
    starts s where the slots admit an INJECTIVE assignment to document
    positions with every adjusted anchor in [s, s+slop] — one token
    occurrence may satisfy only one slot of a repeated term."""
    hits = []
    for did, text in _DOCS:
        w = [t for t in text.lower().split() if t]
        slot_anchors = [
            {p - i for p, t in enumerate(w) if t == term}
            for i, term in enumerate(phrase)
        ]
        if any(not s for s in slot_anchors):
            continue
        lo = min(min(s) for s in slot_anchors) - slop
        hi = max(max(s) for s in slot_anchors)
        tf = 0
        for s in range(lo, hi + 1):
            feasible = [
                {a + i for a in anchors if s <= a <= s + slop}
                for i, anchors in enumerate(slot_anchors)
            ]
            if all(feasible) and _injective(feasible):
                tf += 1
        if tf > 0:
            hits.append((tf, did))
    hits.sort(key=lambda t: (-t[0], t[1]))
    return sorted(
        (qid, did, n, rank + 1) for rank, (n, did) in enumerate(hits[:k])
    )


def test_slop_repeated_terms_need_distinct_positions(spark):
    """ADVICE r12 item 1's verified false positive: one 'aa' occurrence
    must NOT satisfy both slots of the phrase "aa aa" — and two
    occurrences must, even slop-separated."""
    from distributed_vector_search_system_spark.operators.phrase import (
        phrase_slop_topk,
    )

    docs = spark.createDataFrame(
        [(1, "xx aa yy"), (2, "aa xx aa"), (3, "aa aa zz")],
        "doc_id long, text string",
    )
    q = _q(spark, ("aa", "aa"))
    for slop in (0, 1, 2):
        got = {r["id"] for r in phrase_slop_topk(docs, q, 5, slop=slop).collect()}
        assert 1 not in got, f"single occurrence matched at slop={slop}"
        assert 3 in got
        assert (2 in got) == (slop >= 1)


def test_slop_triple_repeat_injective(spark):
    """Three repeated slots: 'bb bb' (two occurrences) must not match
    "bb bb bb"; 'bb bb bb' must, and overlapping starts count per the
    covering convention."""
    from distributed_vector_search_system_spark.operators.phrase import (
        phrase_slop_topk,
    )

    docs = spark.createDataFrame(
        [(1, "bb bb cc"), (2, "bb bb bb"), (3, "bb cc bb dd bb")],
        "doc_id long, text string",
    )
    q = _q(spark, ("bb", "bb", "bb"))
    assert {
        r["id"] for r in phrase_slop_topk(docs, q, 5, slop=0).collect()
    } == {2}
    got4 = {r["id"] for r in phrase_slop_topk(docs, q, 5, slop=4).collect()}
    assert got4 == {2, 3}


def test_slop_zero_equals_exact(spark):
    from distributed_vector_search_system_spark.operators.phrase import (
        phrase_slop_topk,
    )

    docs = _docs(spark)
    q = _q(spark, ("quick", "brown"), ("aa", "aa"), ("aa", "bb", "aa"))
    exact = _result(phrase_topk(docs, q, 5))
    sloppy = _result(phrase_slop_topk(docs, q, 5, slop=0))
    assert sloppy == exact


def test_slop_semantics_gap_and_transposition(spark):
    """slop=1 admits one intervening token; an adjacent transposition
    costs 2 (the Lucene adjusted-position contract)."""
    from distributed_vector_search_system_spark.operators.phrase import (
        phrase_slop_topk,
    )

    docs = spark.createDataFrame(
        [(1, "quick brown fox"), (2, "fox quick")],
        "doc_id long, text string",
    )
    q = _q(spark, ("quick", "fox"))
    assert phrase_slop_topk(docs, q, 5, slop=0).count() == 0
    got1 = {
        (r["id"], r["phrase_tf"])
        for r in phrase_slop_topk(docs, q, 5, slop=1).collect()
    }
    assert got1 == {(1, 1)}          # gap of one bridged; transposition not
    got2 = {
        r["id"] for r in phrase_slop_topk(docs, q, 5, slop=2).collect()
    }
    assert got2 == {1, 2}            # transposition admitted at slop=2


def test_slop_tighter_matches_score_higher(spark):
    """A spread-0 (exact) match is covered by slop+1 starts, a
    spread-slop match by one — the monotone sloppy-weight stand-in."""
    from distributed_vector_search_system_spark.operators.phrase import (
        phrase_slop_topk,
    )

    docs = spark.createDataFrame(
        [(1, "quick fox runs"), (2, "quick brown fox")],
        "doc_id long, text string",
    )
    q = _q(spark, ("quick", "fox"))
    got = {
        r["id"]: (r["phrase_tf"], r["rank"])
        for r in phrase_slop_topk(docs, q, 5, slop=1).collect()
    }
    assert got[1] == (2, 1)          # exact: starts 0 and 1 both cover
    assert got[2] == (1, 2)          # spread 1: only start 1 covers


def test_slop_randomized_vs_naive(spark):
    import itertools

    from distributed_vector_search_system_spark.operators.phrase import (
        phrase_slop_topk,
    )

    docs = _docs(spark)
    phrases = [
        ("quick", "brown"), ("brown", "fox"), ("aa", "aa"),
        ("aa", "bb"), ("the", "dog"), ("quick", "brown", "fox"),
        ("aa", "aa", "aa"), ("aa", "bb", "aa"), ("quick", "quick"),
    ]
    for slop in (0, 1, 2, 3):
        q = _q(spark, *phrases)
        got = _result(phrase_slop_topk(docs, q, 4, slop=slop))
        want = sorted(
            itertools.chain.from_iterable(
                _naive_slop(p, qid, 4, slop) for qid, p in enumerate(phrases)
            )
        )
        assert got == want, f"slop={slop}"


def test_slop_index_equals_scratch(spark, tmp_path):
    from distributed_vector_search_system_spark.operators.phrase import (
        phrase_slop_search_index,
        phrase_slop_topk,
    )

    docs = _docs(spark)
    path = str(tmp_path / "posidx")
    write_positional_index(docs, path)
    q = _q(spark, ("quick", "fox"), ("aa", "bb"))
    scratch = _result(phrase_slop_topk(docs, q, 5, slop=2))
    served = _result(phrase_slop_search_index(spark, path, q, 5, slop=2))
    assert scratch == served


def test_slop_plan_join_below_topk_window(spark):
    """The position join (broadcast of the RPC-bounded slot frame) and
    both hash aggregates must sit BELOW the single top-k window — the
    window ranks (query, doc) phrase frequencies, never raw
    positions."""
    from distributed_vector_search_system_spark.operators.phrase import (
        phrase_slop_topk,
    )

    docs = _docs(spark)
    q = _q(spark, ("quick", "brown"))
    plan = (
        phrase_slop_topk(docs, q, 5, slop=1)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "WindowGroupLimit" in plan            # partial top-k
    assert plan.count("Window [") == 1
    # plan trees print children BELOW parents: the broadcast position
    # join must appear after (= below) the window operator
    assert plan.index("BroadcastHashJoin") > plan.index("Window [")


# -- match_phrase_prefix (round 13 addendum) ---------------------------------


def test_phrase_prefix_completes_last_term(spark):
    from distributed_vector_search_system_spark.operators.phrase import (
        phrase_prefix_topk,
    )

    docs = spark.createDataFrame(
        [
            (1, "quick brown fox"),
            (2, "quick brother hood"),
            (3, "quick zebra brown"),
            (4, "brown quick"),
        ],
        "doc_id long, text string",
    )
    q = spark.createDataFrame(
        [(0, ["quick", "bro"])], "query_id long, phrase array<string>"
    )
    got = {r["id"]: r["phrase_tf"] for r in
           phrase_prefix_topk(docs, q, 5).collect()}
    # "quick bro*" matches "quick brown" (1) and "quick brother" (2);
    # doc 3 has no completion adjacent, doc 4 is wrong order
    assert got == {1: 1, 2: 1}


def test_phrase_prefix_max_expansions_alphabetical(spark):
    from distributed_vector_search_system_spark.operators.phrase import (
        phrase_prefix_topk,
    )

    docs = spark.createDataFrame(
        [
            (1, "x ba"), (2, "x bb"), (3, "x bc"), (4, "x bd"),
        ],
        "doc_id long, text string",
    )
    q = spark.createDataFrame(
        [(0, ["x", "b"])], "query_id long, phrase array<string>"
    )
    # alphabetically-first 2 completions: ba, bb → docs 1, 2 only
    got = {r["id"] for r in
           phrase_prefix_topk(docs, q, 5, max_expansions=2).collect()}
    assert got == {1, 2}
    with pytest.raises(ValueError, match="max_expansions"):
        phrase_prefix_topk(docs, q, 5, max_expansions=0)


def test_phrase_prefix_single_token_and_tf(spark):
    from distributed_vector_search_system_spark.operators.phrase import (
        phrase_prefix_topk,
        phrase_topk,
    )

    docs = spark.createDataFrame(
        [(1, "car cart car"), (2, "cargo dog")],
        "doc_id long, text string",
    )
    q = spark.createDataFrame(
        [(0, ["car"])], "query_id long, phrase array<string>"
    )
    got = {r["id"]: r["phrase_tf"] for r in
           phrase_prefix_topk(docs, q, 5).collect()}
    # prefix "car" completes to car/cargo/cart: doc 1 has 3 matching
    # tokens, doc 2 one
    assert got == {1: 3, 2: 1}
    # a FULL last term still matches exactly like phrase_topk when the
    # vocabulary holds no extension... here it does (cargo, cart), so
    # prefix semantics are a superset of the exact phrase
    exact = {r["id"]: r["phrase_tf"] for r in
             phrase_topk(docs, q, 5).collect()}
    assert exact == {1: 2}


def test_phrase_prefix_dsl_node(spark):
    from distributed_vector_search_system_spark.operators.phrase import (
        phrase_prefix_topk,
    )
    from distributed_vector_search_system_spark.operators.querydsl import (
        search_dsl,
    )

    docs = spark.createDataFrame(
        [(1, "quick brown fox"), (2, "quick brother")],
        "doc_id long, text string",
    )
    got = search_dsl(
        docs, {"match_phrase_prefix": {"terms": ["quick", "br"]}}, 5
    )
    q = spark.createDataFrame(
        [(0, ["quick", "br"])], "query_id long, phrase array<string>"
    )
    want = phrase_prefix_topk(docs, q, 5)
    assert sorted(map(tuple, got.collect())) == sorted(
        map(tuple, want.collect())
    )
