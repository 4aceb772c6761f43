"""Property-based invariants of corpus-wide paragraph dedup (SURVEY §5.4
style): for ANY corpus the operator must satisfy

1. **idempotence** — deduping an already-deduped corpus changes nothing
   (the fixed point of a dedup pass);
2. **conservation** — the multiset of surviving paragraphs equals the
   SET of distinct non-empty input paragraphs (nothing lost, nothing
   kept twice);
3. **order preservation** — each document's surviving paragraphs are a
   subsequence of its original paragraphs.

Paragraphs are drawn from a small pool so cross-document sharing is
frequent (the interesting regime)."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from distributed_vector_search_system_spark.operators.paragraphs import (
    SEP,
    paragraph_dedup,
)

_POOL = ["alpha one", "bravo two", "charlie three", "delta four", "echo five"]
_DOC = st.lists(st.sampled_from(_POOL), min_size=0, max_size=5)
_CORPUS = st.lists(_DOC, min_size=1, max_size=5)


def _df(spark, corpus):
    rows = [(i, SEP.join(paras)) for i, paras in enumerate(corpus)]
    return spark.createDataFrame(rows, "doc_id long, text string")


def _is_subsequence(sub, seq):
    it = iter(seq)
    return all(any(s == x for x in it) for s in sub)


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)
@given(corpus=_CORPUS)
def test_paragraph_dedup_invariants(spark, corpus):
    docs = _df(spark, corpus)
    out = paragraph_dedup(docs)
    got = {r["doc_id"]: r["dedup_text"] for r in out.collect()}

    # conservation: survivors == distinct inputs, each exactly once
    survivors = [
        p for t in got.values() if t for p in t.split(SEP)
    ]
    assert sorted(survivors) == sorted({p for d in corpus for p in d})

    # order preservation per document
    for i, paras in enumerate(corpus):
        out_paras = got[i].split(SEP) if got[i] else []
        assert _is_subsequence(out_paras, paras)

    # idempotence: a second pass is the identity on the deduped corpus
    again = paragraph_dedup(
        spark.createDataFrame(
            [(i, t) for i, t in got.items()], "doc_id long, text string"
        )
    )
    assert {r["doc_id"]: r["dedup_text"] for r in again.collect()} == got
