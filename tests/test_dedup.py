"""Dedup-operator semantics: exact, n-gram Jaccard, MinHash+LSH recall,
SimHash, embedding near-dup blocking."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from distributed_vector_search_system_spark.operators.dedup import (
    embedding_neardup_pairs,
    exact_dedup,
    minhash_dedup_pairs,
    minhash_lsh_candidates,
    ngram_jaccard_pairs,
    simhash,
    simhash_pairs,
)
from distributed_vector_search_system_spark.functions.text import tokens


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_exact_dedup_keeps_lowest_id(spark):
    d = _docs(spark, [(3, "a b c"), (1, "a b c"), (2, "x y"), (9, "x y")])
    got = sorted(r["doc_id"] for r in exact_dedup(d).collect())
    assert got == [1, 2]


def test_ngram_jaccard_identical_and_disjoint(spark):
    d = _docs(
        spark,
        [
            (1, "the quick brown fox jumps over the lazy dog"),
            (2, "the quick brown fox jumps over the lazy dog"),  # identical
            (3, "the quick brown fox jumps over a sleepy cat"),  # overlapping
            (4, "completely different words entirely here now"),  # disjoint
        ],
    )
    pairs = {(r["doc_a"], r["doc_b"]): r["jaccard"] for r in
             ngram_jaccard_pairs(d, 0.0, n=2).collect()}
    assert pairs[(1, 2)] == 1.0
    assert 0.0 < pairs[(1, 3)] < 1.0
    assert not any(4 in p for p in pairs)


def test_minhash_finds_planted_neardups(spark, sf_smoke):
    """The fixtures contain planted near-duplicates (Jaccard ≥ 0.9);
    LSH candidates must recover every pair the exact scan finds."""
    docs = spark.read.parquet(f"{sf_smoke}/documents.parquet")
    exact = {
        (r["doc_a"], r["doc_b"]) for r in ngram_jaccard_pairs(docs, 0.9, n=2).collect()
    }
    assert exact, "fixtures should contain planted near-dups"
    lsh = {
        (r["doc_a"], r["doc_b"])
        for r in minhash_dedup_pairs(docs, 0.9, num_hashes=16, bands=4, n=2).collect()
    }
    assert lsh == exact  # at j≥0.9 with b=4,r=4 recall is ~1 - (1-0.9^4)^4 ≈ 0.9998


def test_minhash_candidates_are_pairs_not_dupes(spark, sf_smoke):
    docs = spark.read.parquet(f"{sf_smoke}/documents.parquet").limit(100)
    cands = minhash_lsh_candidates(docs, num_hashes=16, bands=4).collect()
    seen = {(r["doc_a"], r["doc_b"]) for r in cands}
    assert len(seen) == len(cands)  # distinct
    assert all(a < b for a, b in seen)


def test_simhash_identical_zero_distance(spark):
    d = _docs(spark, [(1, "alpha beta gamma delta"), (2, "alpha beta gamma delta")])
    got = d.select(simhash(tokens("text")).alias("s")).collect()
    assert got[0]["s"] == got[1]["s"]
    pairs = simhash_pairs(d, 0).collect()
    assert [(pairs[0]["doc_a"], pairs[0]["doc_b"], pairs[0]["hamming"])] == [(1, 2, 0)]


def test_simhash_banded_matches_allpairs(spark, sf_smoke):
    """Pigeonhole: with 4x15-bit chunks, any pair at hamming ≤ 3 shares a
    chunk, so the banded scale path finds exactly the all-pairs result."""
    docs = spark.read.parquet(f"{sf_smoke}/documents.parquet").limit(150)
    full = {(r["doc_a"], r["doc_b"], r["hamming"])
            for r in simhash_pairs(docs, 3).collect()}
    banded = {(r["doc_a"], r["doc_b"], r["hamming"])
              for r in simhash_pairs(docs, 3, banded=True, band_bits=15).collect()}
    assert banded == full


def test_embedding_neardup_blocked_equals_filtered_bruteforce(spark, sf_smoke):
    emb = spark.read.parquet(f"{sf_smoke}/embeddings.parquet").limit(200)
    blocked = {(r["id_a"], r["id_b"]) for r in
               embedding_neardup_pairs(emb, 0.3, block_col="label").collect()}
    brute = embedding_neardup_pairs(emb, 0.3)  # cross-join path
    lbl = emb.select(F.col("vec_id").alias("id_a"), F.col("label").alias("la"))
    lbr = emb.select(F.col("vec_id").alias("id_b"), F.col("label").alias("lb"))
    brute_same_label = {
        (r["id_a"], r["id_b"])
        for r in brute.join(lbl, "id_a").join(lbr, "id_b")
        .filter(F.col("la") == F.col("lb")).collect()
    }
    assert blocked == brute_same_label


def test_resolve_chain_collapses_to_one_rep(spark):
    """a-b and b-c pairs (no direct a-c edge) must all resolve to a —
    label propagation crosses the transitive link."""
    from distributed_vector_search_system_spark.operators.dedup import (
        duplicate_clusters,
        resolve_duplicates,
    )

    ids = spark.createDataFrame([(1,), (2,), (3,), (9,)], "doc_id long")
    pairs = spark.createDataFrame([(1, 2), (2, 3)], "doc_a long, doc_b long")
    comp = {r["doc_id"]: r["cluster_rep"] for r in duplicate_clusters(ids, pairs).collect()}
    assert comp == {1: 1, 2: 1, 3: 1, 9: 9}
    docs = ids.withColumn("text", ids.doc_id.cast("string"))
    kept = sorted(r["doc_id"] for r in resolve_duplicates(docs, pairs).collect())
    assert kept == [1, 9]


def test_resolve_long_chain_pointer_jumping(spark):
    """Regression: a 64-node path graph (diameter 63) must converge well
    inside max_iterations via pointer jumping (O(log d) rounds)."""
    from distributed_vector_search_system_spark.operators.dedup import duplicate_clusters

    n = 64
    ids = spark.createDataFrame([(i,) for i in range(n)], "doc_id long")
    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(n - 1)], "doc_a long, doc_b long"
    )
    got = duplicate_clusters(ids, pairs, max_iterations=10)
    assert {r["cluster_rep"] for r in got.collect()} == {0}


# --- df-capped Jaccard blocker (VERDICT r02 item 2) ---------------------

def test_ngram_df_cap_bounds_hot_shingle(spark):
    """One stop-shingle in EVERY doc must not quadratically explode the
    blocker: with a df cap, candidate pairs come only from rare shingles
    (O(docs) here), and the qualifying pairs keep their exact scores."""
    n_docs = 60
    rows = []
    for i in range(n_docs):
        # every doc starts with the same stop-bigram; each doc then has
        # unique filler, except 0/1 and 2/3 which are near-dup pairs
        base = i - (i % 2) if i < 4 else i
        rows.append(
            (i, f"of the unique{base}a unique{base}b unique{base}c unique{base}d")
        )
    d = _docs(spark, rows)
    capped = {
        (r["doc_a"], r["doc_b"]): r["jaccard"]
        for r in ngram_jaccard_pairs(d, 0.5, n=2, max_block_df=5).collect()
    }
    assert set(capped) == {(0, 1), (2, 3)}
    assert all(j == 1.0 for j in capped.values())

    # and the capped blocker's candidate count is linear, not quadratic:
    # the "of the"/"the uniqueXa" hot shingles are excluded, so the only
    # join keys left are the per-pair unique shingles
    from distributed_vector_search_system_spark.operators.dedup import (
        with_shingles,
    )
    sh = with_shingles(d, n=2)
    ex = sh.select(F.col("doc_id").alias("_id"), F.explode("shingles").alias("_sh"))
    dfc = ex.groupBy("_sh").agg(F.count("*").alias("df"))
    hot = dfc.filter(F.col("df") > 5).count()
    assert hot >= 1  # the stop-shingle really is hot


def test_ngram_df_cap_noop_on_fixture(spark, sf_smoke):
    """On the fixture corpus the registered cap (10% of docs) drops
    nothing the qualifying pairs rely on — capped == uncapped."""
    docs = spark.read.parquet(f"{sf_smoke}/documents.parquet")
    uncapped = {
        (r["doc_a"], r["doc_b"]): round(r["jaccard"], 9)
        for r in ngram_jaccard_pairs(docs, 0.5, n=2).collect()
    }
    capped = {
        (r["doc_a"], r["doc_b"]): round(r["jaccard"], 9)
        for r in ngram_jaccard_pairs(docs, 0.5, n=2, max_block_df=0.1).collect()
    }
    assert capped == uncapped


def test_ngram_df_cap_exactness_envelope_property(spark):
    """Property: capped == {uncapped pairs sharing ≥1 shingle with
    df ≤ τ} — the exact characterization of what the cap may drop, on
    randomized corpora with planted dups and a forced stop-shingle."""
    import random

    from distributed_vector_search_system_spark.operators.dedup import (
        with_shingles,
    )

    rng = random.Random(7)
    vocab = [f"w{i}" for i in range(30)]
    for trial in range(4):
        tau = rng.choice([2, 4, 8])
        rows = []
        for i in range(24):
            words = ["stop", "word"] + rng.choices(vocab, k=6)
            rows.append((i, " ".join(words)))
            if i % 5 == 0:  # planted near-dup of the previous doc
                rows.append((100 + i, " ".join(words[:-1] + ["tail"])))
        d = _docs(spark, rows)
        uncapped = {
            (r["doc_a"], r["doc_b"]): round(r["jaccard"], 9)
            for r in ngram_jaccard_pairs(d, 0.5, n=2).collect()
        }
        capped = {
            (r["doc_a"], r["doc_b"]): round(r["jaccard"], 9)
            for r in ngram_jaccard_pairs(d, 0.5, n=2, max_block_df=tau).collect()
        }
        # compute which uncapped pairs share a rare shingle
        sh = {
            r["doc_id"]: set(r["shingles"])
            for r in with_shingles(d, n=2).collect()
        }
        df = {}
        for s in sh.values():
            for g in s:
                df[g] = df.get(g, 0) + 1
        expected = {
            p: j
            for p, j in uncapped.items()
            if any(df[g] <= tau for g in sh[p[0]] & sh[p[1]])
        }
        assert capped == expected, (trial, tau)


def test_simhash_banded_exactness_envelope_property(spark):
    """Property: at band_bits=4 (15 chunks over 60 bits), the banded
    candidate path equals all-pairs for max_hamming = 14 — the exact
    pigeonhole envelope — on randomized corpora."""
    import random

    rng = random.Random(11)
    vocab = [f"t{i}" for i in range(40)]
    for trial in range(3):
        rows = []
        for i in range(20):
            words = rng.choices(vocab, k=rng.randint(3, 10))
            rows.append((i, " ".join(words)))
            if i % 4 == 0:  # perturbed copy → small hamming distance
                rows.append((200 + i, " ".join(words + [rng.choice(vocab)])))
        d = _docs(spark, rows)
        banded = {
            (r["doc_a"], r["doc_b"], r["hamming"])
            for r in simhash_pairs(d, 14, banded=True, band_bits=4).collect()
        }
        allpairs = {
            (r["doc_a"], r["doc_b"], r["hamming"])
            for r in simhash_pairs(d, 14, banded=False).collect()
        }
        assert banded == allpairs, trial


# --- LSH-blocked embedding near-dup (VERDICT r02 item 4) ----------------

def _lsh_collides(V, a, b, *, dim, planes_n, tables, seed=42, probe=1):
    import numpy as np

    from distributed_vector_search_system_spark.operators.similarity import (
        _hyperplanes,
    )

    for t in range(tables):
        planes = _hyperplanes(dim, planes_n, seed + 1000 * t)
        ba = int(((V[a] @ planes.T) > 0) @ (1 << np.arange(planes_n)))
        bb = int(((V[b] @ planes.T) > 0) @ (1 << np.arange(planes_n)))
        if bin(ba ^ bb).count("1") <= probe:
            return True
    return False


def test_embedding_lsh_blocker_exact_envelope(spark, sf_smoke):
    """The LSH blocker's exactness envelope, characterized exactly:
    lsh-blocked == {label-blocked pairs whose buckets are within ham<=1
    in at least one table}, with every surviving pair keeping its exact
    cosine (the verify step is un-approximated)."""
    import numpy as np

    from distributed_vector_search_system_spark.operators.dedup import (
        embedding_neardup_pairs_lsh,
    )

    emb = spark.read.parquet(f"{sf_smoke}/embeddings.parquet")
    label_blocked = {
        (r["id_a"], r["id_b"]): round(r["cosine"], 9)
        for r in embedding_neardup_pairs(emb, 0.4, block_col="label").collect()
    }
    lsh_blocked = {
        (r["id_a"], r["id_b"]): round(r["cosine"], 9)
        for r in embedding_neardup_pairs_lsh(
            emb, 0.4, dim=64, num_planes=6, num_tables=4, block_col="label"
        ).collect()
    }
    rows = emb.select("vec_id", "embedding").collect()
    V = {r["vec_id"]: np.array(r["embedding"], dtype=np.float64) for r in rows}
    expected = {
        p: c
        for p, c in label_blocked.items()
        if _lsh_collides(V, *p, dim=64, planes_n=6, tables=4)
    }
    assert lsh_blocked == expected


def test_embedding_lsh_blocker_noop_at_driver_sf(spark, sf_oracle):
    """At the driver's correctness scale (sf0.01) the registered params
    keep EVERY qualifying within-label pair — lsh-blocked ==
    label-blocked, the measurement behind registry/llm.py's choice."""
    from distributed_vector_search_system_spark.operators.dedup import (
        embedding_neardup_pairs_lsh,
    )

    emb = spark.read.parquet(f"{sf_oracle}/embeddings.parquet")
    label_blocked = {
        (r["id_a"], r["id_b"]): round(r["cosine"], 9)
        for r in embedding_neardup_pairs(emb, 0.4, block_col="label").collect()
    }
    lsh_blocked = {
        (r["id_a"], r["id_b"]): round(r["cosine"], 9)
        for r in embedding_neardup_pairs_lsh(
            emb, 0.4, dim=64, num_planes=6, num_tables=4, block_col="label"
        ).collect()
    }
    assert lsh_blocked == label_blocked
    assert len(lsh_blocked) == 5


def test_embedding_lsh_blocker_bounded_key(spark):
    """Join-key cardinality is (block x 2^planes) regardless of how few
    block values exist: with ONE label value the bare-label blocker is a
    full all-pairs join, while the LSH blocker still partitions."""
    import numpy as np

    from distributed_vector_search_system_spark.operators.dedup import (
        embedding_neardup_pairs_lsh,
    )

    rng = np.random.RandomState(3)
    rows = [(i, 0, rng.randn(16).tolist()) for i in range(40)]
    # two planted near-dup pairs (tiny perturbation -> cosine ~ 1)
    rows.append((100, 0, (np.array(rows[5][2]) + 0.01).tolist()))
    rows.append((101, 0, (np.array(rows[9][2]) + 0.01).tolist()))
    emb = spark.createDataFrame(
        rows, "vec_id long, label int, embedding array<double>"
    )
    got = {
        (r["id_a"], r["id_b"])
        for r in embedding_neardup_pairs_lsh(
            emb, 0.95, dim=16, num_planes=6, num_tables=4, block_col="label"
        ).collect()
    }
    assert {(5, 100), (9, 101)} <= got
    plan = embedding_neardup_pairs_lsh(
        emb, 0.95, dim=16, num_planes=6, num_tables=4, block_col="label"
    )._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoop" not in plan


def test_ngram_fractional_cap_builds_plan_without_jobs(spark, sf_smoke):
    """ADVICE r03: a fractional max_block_df used to run an eager
    docs.count() action at plan-BUILD time (an extra corpus scan per
    invocation).  τ is now a broadcast scalar inside the plan, so
    building the DataFrame must launch zero Spark jobs."""
    docs = spark.read.parquet(f"{sf_smoke}/documents.parquet")
    sc = spark.sparkContext
    group = "ngram-plan-build-probe"
    sc.setJobGroup(group, "plan build must be lazy")
    try:
        df = ngram_jaccard_pairs(docs, 0.5, n=2, max_block_df=0.1)
        jobs = sc.statusTracker().getJobIdsForGroup(group)
        assert jobs == [], f"plan build launched jobs: {jobs}"
    finally:
        sc.setJobGroup("", "")
    # and the in-plan τ produces the same result as before the fix
    assert df.count() == ngram_jaccard_pairs(docs, 0.5, n=2).count()


def test_simhash_band_combo_exact_and_bounded(spark, sf_oracle):
    """Multi-index (combo) banding returns EXACTLY the single-chunk
    banded result at the same radius (pigeonhole holds for every
    c <= nb - max_hamming), and rejects a combo beyond the bound."""
    from distributed_vector_search_system_spark.tables import load_table

    docs = load_table(spark, sf_oracle, "documents")
    base = {
        (r["doc_a"], r["doc_b"], r["hamming"])
        for r in simhash_pairs(docs, 12, banded=True, band_bits=4).collect()
    }
    assert base  # fixture has near-dup structure at this radius
    for combo in (2, 3):
        got = {
            (r["doc_a"], r["doc_b"], r["hamming"])
            for r in simhash_pairs(
                docs, 12, banded=True, band_bits=4, band_combo=combo
            ).collect()
        }
        assert got == base, combo
    with pytest.raises(ValueError, match="band_combo"):
        simhash_pairs(docs, 12, banded=True, band_bits=4, band_combo=4)
