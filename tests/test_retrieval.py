"""BM25 / RRF / MMR retrieval operators (operators/retrieval.py) and the
round-5 search-surface generalizations (range / grouped / filtered).

Exactness of bm25_topk and hybrid_rrf vs DuckDB is covered by
tests/test_oracle_parity.py; here: hand-computed tiny-corpus BM25, exact
RRF arithmetic, MMR vs an independent pure-numpy reference, and the
filtered persisted-IVF plan contract (partition pruning AND predicate
pushdown on the same probe scan)."""

from __future__ import annotations

import math

import numpy as np
import pytest
from pyspark.sql import functions as F

from distributed_vector_search_system_spark.operators.knn import (
    grouped_topk,
    knn,
    range_search,
)
from distributed_vector_search_system_spark.operators.retrieval import (
    bm25_scores,
    bm25_topk,
    hybrid_rrf_topk,
    mmr_rerank,
    queries_from_docs,
    rrf_fuse,
)
from distributed_vector_search_system_spark.operators.similarity import cosine_topk
from distributed_vector_search_system_spark.tables import load_table


def _docs(spark):
    rows = [
        (0, "spark shuffle join"),
        (1, "spark spark spark filter"),
        (2, "window merge sort"),
        (3, "spark window"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def _queries(spark, terms, qid=0):
    return spark.createDataFrame([(qid, terms)], "query_id long, qterms array<string>")


def _bm25_ref(corpus: list[list[str]], qterms: list[str], k1=1.2, b=0.75):
    """Independent plain-Python BM25 (Lucene idf)."""
    n = len(corpus)
    avgdl = sum(len(d) for d in corpus) / n
    out = {}
    for i, doc in enumerate(corpus):
        s = 0.0
        for t in set(qterms):
            tf = doc.count(t)
            if tf == 0:
                continue
            df = sum(1 for d in corpus if t in d)
            idf = math.log(1.0 + (n - df + 0.5) / (df + 0.5))
            s += idf * (tf * (k1 + 1.0)) / (tf + k1 * (1.0 - b + b * len(doc) / avgdl))
        if s > 0.0:
            out[i] = s
    return out


def test_bm25_matches_hand_computation(spark):
    docs = _docs(spark)
    got = {
        r["id"]: r["score"]
        for r in bm25_scores(docs, _queries(spark, ["spark", "merge"])).collect()
    }
    corpus = [d[1].split() for d in sorted(_docs(spark).collect())]
    want = _bm25_ref(corpus, ["spark", "merge"])
    assert set(got) == set(want)
    for i in want:
        assert got[i] == pytest.approx(want[i], rel=1e-12)


def test_bm25_topk_orders_by_score_then_id(spark):
    docs = _docs(spark)
    rows = bm25_topk(docs, _queries(spark, ["spark"]), 10).collect()
    ranks = [r["rank"] for r in sorted(rows, key=lambda r: r["rank"])]
    assert ranks == list(range(1, len(rows) + 1))
    scores = [r["score"] for r in sorted(rows, key=lambda r: r["rank"])]
    assert scores == sorted(scores, reverse=True)
    # tf=3 in doc 1 must beat tf=1 docs
    assert sorted(rows, key=lambda r: r["rank"])[0]["id"] == 1


def test_bm25_no_matching_terms_empty(spark):
    docs = _docs(spark)
    assert bm25_topk(docs, _queries(spark, ["absent"]), 5).count() == 0


def test_rrf_exact_arithmetic(spark):
    a = spark.createDataFrame(
        [(0, 10, 1), (0, 11, 2)], "query_id long, id long, rank int"
    )
    b = spark.createDataFrame(
        [(0, 11, 1), (0, 12, 2)], "query_id long, id long, rank int"
    )
    got = {r["id"]: (r["rrf"], r["rank"]) for r in rrf_fuse([a, b], 10).collect()}
    want = {
        10: round(1.0 / 61, 6),
        11: round(1.0 / 62 + 1.0 / 61, 6),
        12: round(1.0 / 62, 6),
    }
    assert {i: v[0] for i, v in got.items()} == want
    # 11 appears in both legs -> fused rank 1
    assert got[11][1] == 1


def test_hybrid_rrf_null_qvec_degrades_to_lexical(spark, sf_oracle):
    docs = load_table(spark, sf_oracle, "documents")
    emb = load_table(spark, sf_oracle, "embeddings")
    q = queries_from_docs(docs, F.col("doc_id") == 7).withColumn(
        "qvec", F.lit(None).cast("array<float>")
    )
    fused = hybrid_rrf_topk(docs, emb, q, 5, leg_k=10)
    lex = bm25_topk(docs, q, 10)
    fused_ids = {r["id"] for r in fused.collect()}
    lex_ids = {r["id"] for r in lex.collect()}
    assert fused_ids <= lex_ids and fused.count() > 0


def _mmr_ref(ids, rel, vecs, k, lam):
    """Independent greedy MMR."""
    x = np.asarray(vecs, dtype=np.float64)
    nrm = np.linalg.norm(x, axis=1)
    nrm[nrm == 0] = 1.0
    xn = x / nrm[:, None]
    sim = xn @ xn.T
    chosen, avail = [], set(range(len(ids)))
    maxsim = np.zeros(len(ids))
    first = True
    while avail and len(chosen) < k:
        best, best_score = None, None
        for i in sorted(avail, key=lambda j: ids[j]):
            pen = 0.0 if first else maxsim[i]
            s = lam * rel[i] - (1 - lam) * pen
            if best_score is None or s > best_score:
                best, best_score = i, s
        chosen.append(best)
        avail.remove(best)
        maxsim = np.maximum(maxsim, sim[:, best])
        first = False
    return [ids[i] for i in chosen]


@pytest.mark.parametrize("lam", [0.3, 0.7, 1.0])
def test_mmr_matches_numpy_reference(spark, sf_oracle, lam):
    emb = load_table(spark, sf_oracle, "embeddings")
    q = emb.filter(F.col("vec_id") == 0).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qvec")
    )
    cands = cosine_topk(emb, q, 15).join(
        emb.select(F.col("vec_id").alias("id"), "embedding"), "id"
    )
    got = [
        r["id"]
        for r in sorted(
            mmr_rerank(cands, 6, lambda_=lam).collect(), key=lambda r: r["rank"]
        )
    ]
    rows = sorted(cands.collect(), key=lambda r: r["id"])
    want = _mmr_ref(
        [r["id"] for r in rows],
        [r["cosine"] for r in rows],
        [list(r["embedding"]) for r in rows],
        6,
        lam,
    )
    assert got == want


def test_mmr_lambda_one_is_pure_relevance(spark, sf_oracle):
    emb = load_table(spark, sf_oracle, "embeddings")
    q = emb.filter(F.col("vec_id") == 42).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qvec")
    )
    top = cosine_topk(emb, q, 10)
    cands = top.join(emb.select(F.col("vec_id").alias("id"), "embedding"), "id")
    got = [
        r["id"]
        for r in sorted(
            mmr_rerank(cands, 10, lambda_=1.0).collect(), key=lambda r: r["rank"]
        )
    ]
    want = [r["id"] for r in sorted(top.collect(), key=lambda r: r["rank"])]
    assert got == want


# ---------------------------------------------------------------------------
# range / grouped / filtered search

def test_range_search_equals_bruteforce_threshold(spark, sf_oracle):
    emb = load_table(spark, sf_oracle, "embeddings")
    q = emb.filter(F.col("vec_id") == 2).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qvec")
    )
    r = 1.6
    got = range_search(emb, q, r).collect()
    full = knn(emb, q, 10**6)
    want = [x for x in full.collect() if x["distance"] <= r]
    assert {(x["id"], round(x["distance"], 6)) for x in got} == {
        (x["id"], round(x["distance"], 6)) for x in want
    }
    ranks = sorted(x["rank"] for x in got)
    assert ranks == list(range(1, len(got) + 1))


def test_grouped_topk_caps_each_group(spark, sf_oracle):
    emb = load_table(spark, sf_oracle, "embeddings")
    q = emb.filter(F.col("vec_id").isin(0, 7)).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qvec")
    )
    out = grouped_topk(emb, q, 2, group_col="label")
    per = (
        out.groupBy("query_id", "group").count().collect()
    )
    assert all(r["count"] <= 2 for r in per)
    # every (query, label) group with >=2 members yields exactly 2
    labels = emb.groupBy("label").count().collect()
    full_groups = sum(1 for r in labels if r["count"] >= 2)
    assert len([r for r in per if r["count"] == 2]) == 2 * full_groups


def test_filtered_ivf_search_prunes_and_pushes(spark, sf_smoke, tmp_path):
    from distributed_vector_search_system_spark.operators.clustering import kmeans_fit
    from distributed_vector_search_system_spark.sources.ivf_index import (
        search_ivf_index,
        write_ivf_index,
    )

    emb = load_table(spark, sf_smoke, "embeddings")
    centroids, _ = kmeans_fit(emb, 8, max_iterations=3)
    path = str(tmp_path / "ivf_filtered")
    write_ivf_index(emb, path, centroids)
    q = emb.filter(F.col("vec_id") == 4).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qvec")
    )
    out = search_ivf_index(
        spark, path, q, 5, centroids, n_probe=8, where="label % 2 = 0"
    )
    rows = out.collect()
    # n_probe = num_cells -> probes cover every cell, so the filtered
    # index search must equal brute force over the filtered corpus
    want = knn(emb.filter(F.col("label") % 2 == 0), q, 5).collect()
    assert {(r["id"], round(r["distance"], 6), r["rank"]) for r in rows} == {
        (r["id"], round(r["distance"], 6), r["rank"]) for r in want
    }
    plan = out._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    )
    pf = [l for l in plan.splitlines() if "PartitionFilters" in l]
    assert pf and any("cell_id" in l for l in pf)
    pushed = [l for l in plan.splitlines() if "PushedFilters" in l]
    assert pushed and any("label" in l for l in pushed)


def test_filtered_ivfpq_and_stream_store_agree_with_bruteforce(spark, sf_smoke, tmp_path):
    """where= on the IVF+PQ index and the streaming store: full probe
    coverage + generous rerank ⇒ exactly the k nearest MATCHING rows."""
    from distributed_vector_search_system_spark.operators.clustering import kmeans_fit
    from distributed_vector_search_system_spark.operators.pq import pq_sample_codebooks
    from distributed_vector_search_system_spark.sources.ivfpq_index import (
        search_ivfpq_index,
        write_ivfpq_index,
    )
    from distributed_vector_search_system_spark.streaming.ivf_stream import (
        IvfIndexStore,
    )

    emb = load_table(spark, sf_smoke, "embeddings")
    cents, _ = kmeans_fit(emb, 6, max_iterations=2)
    books = pq_sample_codebooks(emb, dim=64, m=8, ksub=16)
    q = emb.filter(F.col("vec_id") == 11).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qvec")
    )
    want = {
        (r["query_id"], r["id"], r["rank"])
        for r in knn(emb.filter(F.col("label") % 2 == 1), q, 4).collect()
    }

    pq_path = str(tmp_path / "ivfpq_f")
    write_ivfpq_index(emb, pq_path, cents, books)
    got_pq = {
        (r["query_id"], r["id"], r["rank"])
        for r in search_ivfpq_index(
            spark, pq_path, q, 4, cents, books, n_probe=len(cents),
            rerank=100, where="label % 2 = 1",
        ).collect()
    }
    assert got_pq == want

    store = IvfIndexStore(str(tmp_path / "stream_f"), cents)
    store.init_base(emb)
    got_stream = {
        (r["query_id"], r["id"], r["rank"])
        for r in store.search(
            spark, q, 4, n_probe=len(cents), where="label % 2 = 1"
        ).collect()
    }
    assert got_stream == want


def test_posting_index_serves_identical_bm25(spark, sf_oracle, tmp_path):
    """The persisted inverted index returns exactly the from-scratch
    bm25_topk result (same formula over precomputed stats), and its
    postings scan pushes the term predicate down — no document text is
    read at query time."""
    from distributed_vector_search_system_spark.sources.posting_index import (
        bm25_search_index,
        write_posting_index,
    )

    docs = load_table(spark, sf_oracle, "documents")
    path = str(tmp_path / "postings")
    write_posting_index(docs, path)
    # literal query set (an RPC batch): the plan assertion below checks
    # the SEARCH reads no document text, so the query-set derivation
    # must not itself scan documents
    q = spark.createDataFrame(
        [
            (r["query_id"], list(r["qterms"]))
            for r in queries_from_docs(
                docs, F.col("doc_id") % 100 == 7
            ).collect()
        ],
        "query_id long, qterms array<string>",
    )
    got = bm25_search_index(spark, path, q, 10)
    want = {
        (r["query_id"], r["id"], r["score"], r["rank"])
        for r in bm25_topk(docs, q, 10).collect()
    }
    assert {
        (r["query_id"], r["id"], r["score"], r["rank"]) for r in got.collect()
    } == want

    plan = got._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            "formatted"
        )
    )
    pushed = [l for l in plan.splitlines() if "PushedFilters" in l]
    assert any("term" in l and "IN" in l.upper() for l in pushed), pushed
    read = [l for l in plan.splitlines() if "ReadSchema" in l]
    assert not any("text" in l for l in read), read


def test_hybrid_rrf_renamed_query_id_col(spark, sf_oracle):
    """query_id_col= must rename BOTH legs (ADVICE r05: the vector leg
    hardcoded 'query_id', so a renamed lexical leg could never fuse)."""
    docs = load_table(spark, sf_oracle, "documents")
    emb = load_table(spark, sf_oracle, "embeddings")
    hq = (
        queries_from_docs(docs, F.col("doc_id") % 100 == 7)
        .join(
            emb.select(
                F.col("vec_id").alias("query_id"), F.col("embedding").alias("qvec")
            ),
            "query_id",
            "left",
        )
    )
    want = {
        (r["query_id"], r["id"], r["rank"])
        for r in hybrid_rrf_topk(docs, emb, hq, 5).collect()
    }
    renamed = hq.withColumnRenamed("query_id", "qid")
    got = {
        (r["query_id"], r["id"], r["rank"])
        for r in hybrid_rrf_topk(
            docs, emb, renamed, 5, query_id_col="qid"
        ).collect()
    }
    assert got == want


def test_hybrid_indexed_full_probe_equals_from_scratch_legs(
    spark, sf_oracle, tmp_path
):
    """At FULL probe coverage the IVF leg is exact squared-L2 top-k, and
    the posting-index leg is identical to from-scratch BM25 — so the
    fully-indexed hybrid must equal an RRF of the two from-scratch legs
    exactly.  (At n_probe < num_cells only the vector leg's membership
    may differ — that approximation is the tier's documented contract.)"""
    from distributed_vector_search_system_spark.operators.clustering import (
        kmeans_fit,
    )
    from distributed_vector_search_system_spark.operators.retrieval import (
        hybrid_rrf_indexed_topk,
    )
    from distributed_vector_search_system_spark.operators.knn import knn
    from distributed_vector_search_system_spark.sources.ivf_index import (
        write_ivf_index,
    )
    from distributed_vector_search_system_spark.sources.posting_index import (
        write_posting_index,
    )

    docs = load_table(spark, sf_oracle, "documents")
    emb = load_table(spark, sf_oracle, "embeddings")
    posting = str(tmp_path / "posting")
    write_posting_index(docs, posting)
    cents, _ = kmeans_fit(emb, 8, max_iterations=5)
    ivf = str(tmp_path / "ivf")
    write_ivf_index(emb, ivf, cents)
    q = queries_from_docs(docs, F.col("doc_id") % 100 == 7).join(
        emb.select(
            F.col("vec_id").alias("query_id"), F.col("embedding").alias("qvec")
        ),
        "query_id",
        "left",
    )
    got = {
        (r["query_id"], r["id"], r["rrf"], r["rank"])
        for r in hybrid_rrf_indexed_topk(
            spark, posting, ivf, cents, q, 10, leg_k=20, n_probe=len(cents)
        ).collect()
    }
    lex = bm25_topk(docs, q, 20)
    vec = knn(emb, q.filter(F.col("qvec").isNotNull()), 20)
    want = {
        (r["query_id"], r["id"], r["rrf"], r["rank"])
        for r in rrf_fuse(
            [lex.select("query_id", "id", "rank"),
             vec.select("query_id", "id", "rank")],
            10,
        ).collect()
    }
    assert got == want


def test_filtered_hybrid_uniform_from_scratch_and_indexed(
    spark, sf_oracle, tmp_path
):
    """Filtered hybrid search (tenant isolation): the admissible id set
    must restrict BOTH legs before their per-leg top-k, and the
    from-scratch and fully-indexed paths (at full probe coverage) must
    agree exactly — with each other and with an RRF of independently
    filtered legs."""
    from distributed_vector_search_system_spark.operators.clustering import (
        kmeans_fit,
    )
    from distributed_vector_search_system_spark.operators.knn import knn
    from distributed_vector_search_system_spark.operators.retrieval import (
        hybrid_rrf_indexed_topk,
    )
    from distributed_vector_search_system_spark.sources.ivf_index import (
        write_ivf_index,
    )
    from distributed_vector_search_system_spark.sources.posting_index import (
        write_posting_index,
    )

    docs = load_table(spark, sf_oracle, "documents")
    emb = load_table(spark, sf_oracle, "embeddings")
    ids = docs.filter(F.col("doc_id") % 2 == 0).select(
        F.col("doc_id").alias("id")
    )
    q = queries_from_docs(docs, F.col("doc_id") % 100 == 7).join(
        emb.select(
            F.col("vec_id").alias("query_id"), F.col("embedding").alias("qvec")
        ),
        "query_id",
        "left",
    )
    scratch = {
        (r["query_id"], r["id"], r["rrf"], r["rank"])
        for r in hybrid_rrf_topk(docs, emb, q, 10, filter_ids=ids).collect()
    }
    # reference: independently filtered legs, fused
    lex = bm25_topk(docs, q, 20, filter_ids=ids)
    # cosine ranking == the hybrid vector leg's; restrict the corpus
    vfiltered = emb.join(
        ids.select(F.col("id").alias("vec_id")), "vec_id", "left_semi"
    )
    vec = cosine_topk(vfiltered, q.filter(F.col("qvec").isNotNull()), 20)
    want = {
        (r["query_id"], r["id"], r["rrf"], r["rank"])
        for r in rrf_fuse(
            [lex.select("query_id", "id", "rank"),
             vec.select("query_id", "id", "rank")],
            10,
        ).collect()
    }
    assert scratch == want

    # indexed path at FULL probe: the L2 leg over normalized-free
    # fixtures ranks differently from cosine, so compare against an RRF
    # of the filtered BM25 leg and the filtered exact-L2 leg instead
    posting = str(tmp_path / "posting")
    write_posting_index(docs, posting)
    cents, _ = kmeans_fit(emb, 8, max_iterations=5)
    ivf = str(tmp_path / "ivf")
    write_ivf_index(emb, ivf, cents)
    indexed = {
        (r["query_id"], r["id"], r["rrf"], r["rank"])
        for r in hybrid_rrf_indexed_topk(
            spark, posting, ivf, cents, q, 10,
            leg_k=20, n_probe=len(cents), filter_ids=ids,
        ).collect()
    }
    l2leg = knn(vfiltered, q.filter(F.col("qvec").isNotNull()), 20)
    want_idx = {
        (r["query_id"], r["id"], r["rrf"], r["rank"])
        for r in rrf_fuse(
            [lex.select("query_id", "id", "rank"),
             l2leg.select("query_id", "id", "rank")],
            10,
        ).collect()
    }
    assert indexed == want_idx


def test_rrf_leg_order_invariant(spark):
    a = spark.createDataFrame(
        [(0, 10, 1), (0, 11, 2), (0, 12, 3)], "query_id long, id long, rank int"
    )
    b = spark.createDataFrame(
        [(0, 12, 1), (0, 10, 2)], "query_id long, id long, rank int"
    )
    ab = {(r["id"], r["rrf"], r["rank"]) for r in rrf_fuse([a, b], 5).collect()}
    ba = {(r["id"], r["rrf"], r["rank"]) for r in rrf_fuse([b, a], 5).collect()}
    assert ab == ba


def test_mmr_k_exceeding_candidates_returns_all(spark, sf_oracle):
    emb = load_table(spark, sf_oracle, "embeddings")
    q = emb.filter(F.col("vec_id") == 5).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qvec")
    )
    cands = cosine_topk(emb, q, 4).join(
        emb.select(F.col("vec_id").alias("id"), "embedding"), "id"
    )
    out = mmr_rerank(cands, 100, lambda_=0.5).collect()
    assert len(out) == 4
    assert sorted(r["rank"] for r in out) == [1, 2, 3, 4]


# ---------------------------------------------------------------------------
# merge-on-read posting index store

def _store_setup(spark, sf_oracle, tmp_path):
    from distributed_vector_search_system_spark.sources.posting_index import (
        PostingIndexStore,
    )

    docs = load_table(spark, sf_oracle, "documents")
    base = docs.filter(F.col("doc_id") < 300)
    b1 = docs.filter((F.col("doc_id") >= 300) & (F.col("doc_id") < 400))
    b2 = docs.filter(F.col("doc_id") >= 400)
    store = PostingIndexStore(str(tmp_path / "pstore"))
    store.init_base(base)
    store.append_batch(b1, 1)
    store.append_batch(b2, 2)
    q = spark.createDataFrame(
        [
            (r["query_id"], list(r["qterms"]))
            for r in queries_from_docs(
                docs, F.col("doc_id") % 100 == 7
            ).collect()
        ],
        "query_id long, qterms array<string>",
    )
    return store, docs, q


def _rows(df):
    return {(r["query_id"], r["id"], r["score"], r["rank"]) for r in df.collect()}


def test_posting_store_appends_match_from_scratch(spark, sf_oracle, tmp_path):
    """base + two appended batches serve EXACTLY the scores/ranks of the
    from-scratch plan over the full corpus (stats are additive, df is
    restricted-computed — same numbers either way)."""
    store, docs, q = _store_setup(spark, sf_oracle, tmp_path)
    got = _rows(store.search(spark, q, 10))
    want = _rows(bm25_topk(docs, q, 10))
    assert got == want


def test_posting_store_redelivery_and_compaction_idempotent(
    spark, sf_oracle, tmp_path
):
    """A redelivered batch changes nothing (content-keyed dedupe), and
    compaction preserves results exactly while folding the delta away."""
    store, docs, q = _store_setup(spark, sf_oracle, tmp_path)
    before = _rows(store.search(spark, q, 10))
    b2 = docs.filter(F.col("doc_id") >= 400)
    store.append_batch(b2, 2)  # crash-redelivery of the same batch id
    assert _rows(store.search(spark, q, 10)) == before
    gen_before = store._current_gen()
    store.compact(spark)
    assert store._current_gen() != gen_before
    assert _rows(store.search(spark, q, 10)) == before
    # compacted base carries everything; a further compact is a no-op set
    store.compact(spark)
    assert _rows(store.search(spark, q, 10)) == before


def test_filtered_bm25_uniform_across_all_three_paths(spark, sf_oracle, tmp_path):
    """Filtered lexical search (the filtered-ANN contract: restricted
    results, corpus-level idf/N/avgdl) must agree across the
    from-scratch operator (where=), the persisted index (filter_ids=),
    and the merge-on-read store (filter_ids=) — and must equal the
    UNFILTERED ranking restricted to matching docs and re-ranked, which
    is what corpus-level stats guarantee."""
    from pyspark.sql import Window

    from distributed_vector_search_system_spark.sources.posting_index import (
        PostingIndexStore,
        bm25_search_index,
        write_posting_index,
    )

    docs = load_table(spark, sf_oracle, "documents")
    pred = "source IN ('src1', 'src2', 'src3', 'src4', 'src5')"
    q = spark.createDataFrame(
        [
            (r["query_id"], list(r["qterms"]))
            for r in queries_from_docs(docs, F.col("doc_id") % 100 == 7).collect()
        ],
        "query_id long, qterms array<string>",
    )
    got = _rows(bm25_topk(docs, q, 10, where=pred))

    # reference: unfiltered scores, restrict to matching ids, re-rank
    ids = docs.filter(F.expr(pred)).select(F.col("doc_id").alias("id"))
    unfiltered = bm25_scores(docs, q).join(ids, "id", "left_semi")
    w = Window.partitionBy("query_id").orderBy(
        F.round("score", 6).desc(), F.col("id").asc()
    )
    want = _rows(
        unfiltered.withColumn("score", F.round("score", 6))
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= 10)
    )
    assert got == want

    path = str(tmp_path / "p_filter")
    write_posting_index(docs, path)
    assert _rows(bm25_search_index(spark, path, q, 10, filter_ids=ids)) == want

    store = PostingIndexStore(str(tmp_path / "p_store_filter"))
    store.init_base(docs.filter(F.col("doc_id") < 300))
    store.append_batch(docs.filter(F.col("doc_id") >= 300), 1)
    assert _rows(store.search(spark, q, 10, filter_ids=ids)) == want


def test_posting_index_stats_count_zero_token_docs(spark, tmp_path):
    """A doc that tokenizes to ZERO tokens (punctuation-only under the
    [^a-z0-9]+ tokenizer) has no posting rows but still counts toward
    N and avgdl in the from-scratch plan — the persisted index must use
    the same denominators or its idf/length normalization diverges
    (ADVICE r05: stats must come from the docs table, not from distinct
    posting ids)."""
    from distributed_vector_search_system_spark.sources.posting_index import (
        bm25_search_index,
        write_posting_index,
    )

    rows = [
        (0, "spark shuffle join"),
        (1, "spark spark spark filter"),
        (2, "!!! ??? ..."),  # zero tokens
        (3, "spark window"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    path = str(tmp_path / "p_empty")
    write_posting_index(docs, path)
    stats = spark.read.parquet(f"{path}/stats").collect()[0]
    assert stats["n_docs"] == 4  # not 3
    q = _queries(spark, ["spark", "join"])
    got = _rows(bm25_search_index(spark, path, q, 10))
    want = _rows(bm25_topk(docs, q, 10))
    assert got == want


def test_posting_store_cross_compaction_redelivery(spark, sf_oracle, tmp_path):
    """A batch redelivered AFTER a compaction (crash between the sink's
    append and its checkpoint commit, compaction in between) must still
    be deduplicated: the compacted stats log preserves batch ids, so the
    re-appended stats row collapses instead of double-counting
    n_docs/sum_dl (ADVICE r05)."""
    store, docs, q = _store_setup(spark, sf_oracle, tmp_path)
    before = _rows(store.search(spark, q, 10))
    stats_before = store._stats(spark).collect()[0]
    store.compact(spark)
    b2 = docs.filter(F.col("doc_id") >= 400)
    store.append_batch(b2, 2)  # redelivery ACROSS the compaction boundary
    stats_after = store._stats(spark).collect()[0]
    assert stats_after["n_docs"] == stats_before["n_docs"]
    assert stats_after["avgdl"] == pytest.approx(stats_before["avgdl"])
    assert _rows(store.search(spark, q, 10)) == before


def test_posting_store_streaming_sink(spark, sf_oracle, tmp_path):
    """Documents streamed through foreachBatch land exactly like batch
    appends: post-stream search == from-scratch over the union."""
    from distributed_vector_search_system_spark.sources.posting_index import (
        PostingIndexStore,
    )

    docs = load_table(spark, sf_oracle, "documents")
    base = docs.filter(F.col("doc_id") < 400)
    tail = docs.filter(F.col("doc_id") >= 400)
    src = str(tmp_path / "stream_src")
    tail.write.mode("overwrite").parquet(src)
    store = PostingIndexStore(str(tmp_path / "pstore_s"))
    store.init_base(base)
    stream = spark.readStream.schema(tail.schema).parquet(src)
    q = store.streaming_sink(stream, checkpoint=str(tmp_path / "ckpt"))
    q.awaitTermination(120)
    queries = spark.createDataFrame(
        [
            (r["query_id"], list(r["qterms"]))
            for r in queries_from_docs(docs, F.col("doc_id") % 100 == 7).collect()
        ],
        "query_id long, qterms array<string>",
    )
    got = _rows(store.search(spark, queries, 10))
    want = _rows(bm25_topk(docs, queries, 10))
    assert got == want


def test_cosine_indexed_hybrid_equals_from_scratch_exactly(
    spark, sf_oracle, tmp_path
):
    """With a COSINE index (normalized-space routing) at full probe
    coverage, the fully-indexed hybrid's vector leg is exactly the
    cosine ranking, so the whole composition must equal the
    from-scratch hybrid_rrf_topk row for row — the coherence loop the
    L2-leg variant can only approximate on unnormalized embeddings."""
    from distributed_vector_search_system_spark.functions.distance import (
        l2_normalize,
    )
    from distributed_vector_search_system_spark.operators.clustering import (
        kmeans_fit,
    )
    from distributed_vector_search_system_spark.operators.retrieval import (
        hybrid_rrf_indexed_topk,
    )
    from distributed_vector_search_system_spark.sources.ivf_index import (
        write_cosine_ivf_index,
    )
    from distributed_vector_search_system_spark.sources.posting_index import (
        write_posting_index,
    )

    docs = load_table(spark, sf_oracle, "documents")
    emb = load_table(spark, sf_oracle, "embeddings")
    posting = str(tmp_path / "posting")
    write_posting_index(docs, posting)
    norm = emb.withColumn("embedding", l2_normalize("embedding"))
    cents, _ = kmeans_fit(norm, 8, max_iterations=5)
    ivf = str(tmp_path / "cos_ivf")
    write_cosine_ivf_index(emb, ivf, cents)
    q = queries_from_docs(docs, F.col("doc_id") % 100 == 7).join(
        emb.select(
            F.col("vec_id").alias("query_id"), F.col("embedding").alias("qvec")
        ),
        "query_id",
        "left",
    )
    got = {
        (r["query_id"], r["id"], r["rrf"], r["rank"])
        for r in hybrid_rrf_indexed_topk(
            spark, posting, ivf, cents, q, 10,
            leg_k=20, n_probe=len(cents), cosine=True,
        ).collect()
    }
    want = {
        (r["query_id"], r["id"], r["rrf"], r["rank"])
        for r in hybrid_rrf_topk(docs, emb, q, 10, leg_k=20).collect()
    }
    assert got == want
