"""Benchmark harness: runs the engine's headline queries at
$SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) on
local[$SPARK_GRAFT_CPUS] and prints ONE JSON line.

Each query is forced end-to-end with the noop sink (full execution, no
driver collect overhead).  Timings include plan + execution, excluding
SparkSession startup.

Measurement hygiene (VERDICT r03 item 1): single-shot timings at sf0.1
swing ±30% with machine load, making noise and regression
indistinguishable round-over-round.  Round-4 calibration made the
variance concrete: back-to-back identical runs of the same plan swung
3× (knn_batch steady 1.86 s vs 5.37 s minutes apart, zero code change)
— this box is a VM with heavy host CPU-steal.  The harness therefore
runs the whole measurement REPEATS (default 3) times, each in a FRESH
python/JVM subprocess — so every repeat's first pass is genuinely cold
(fresh whole-stage-codegen JIT, fresh parquet footers) — and reports
the per-query MIN across repeats as the headline (the least-interfered
observation is the best estimator of true plan cost under external
noise; a median still absorbs steal spikes), with MEDIANs and the
per-run total spread alongside so host variance is visible per round.

Tiers reported:

- ``queries`` / ``value`` — first-run (cold) per-query MIN over
  repeats for the original 7-query headline set; ``value`` is the sum
  of those mins (so it can undercut every individual run's total —
  that is the point: it estimates the plan's cost with the least host
  interference).  ``median_queries`` and ``per_run_cold_totals`` sit
  alongside for spread.  Headline queries are timed BEFORE any storage
  tier is materialized, so the cold numbers stay comparable with
  rounds 1-3 (which warmed only one query).
- ``steady_state_queries`` / ``steady_state_total_sec`` — second run of
  the identical plan within each session, min over repeats.  The
  scale-relevant number: one-time costs amortize to zero over a 100 TB
  scan.
- ``fast_tier_queries`` / ``fast_tier_steady_queries`` — the
  approximate/compressed/bucketed tiers a 100 TB deployment actually
  serves from (int8 quantized, multi-table LSH, IVF, persisted
  partition-pruned IVF, PQ, IVF+PQ, co-bucketed compaction), timed
  after their one-time builds (index/tier BUILD time is a write-path
  cost, excluded from per-query read timings).

Output contract (VERDICT r05 item 1): the LAST stdout line is a COMPACT
summary JSON (< 1800 chars, asserted) — the external driver captures
only a ~2000-char stdout tail, and round 5's single fat line outgrew it
and lost the round's perf record.  Per-tier per-query numbers, the
recall curve, the d768 section, and the scale anchor are written to
``BENCH_DETAIL.json`` next to this file.
"""

from __future__ import annotations

import json
import os
import re
import statistics
import subprocess
import sys
import time

# Headline set: flagship vector search, mutation replay + search,
# heavy aggregation, multi-way join, sessionization window.
HEADLINE = [
    "knn_batch",
    "knn_after_mutations",
    "mutations_compact",
    "rel_pricing_summary",
    "rel_revenue_by_region",
    "rel_events_sessions",
    "rel_replay_fold",
]

# Lexical/hybrid retrieval (round 5): BM25 and BM25+cosine RRF over the
# documents corpus — timed alongside but reported in their own section
# (they scan documents, not embeddings; different growth class).
RETRIEVAL = [
    "bm25_topk",
    "hybrid_rrf",
    # round 6: the INDEXED serving paths — query-time reads are posting
    # lists / probed cells, not corpus bytes (builds excluded, like the
    # vector tiers')
    "bm25_index_topk",
    "hybrid_indexed_rrf",
    # round 8: the two new retrieval families — positional (indexed
    # exact phrase; build excluded via the per-process layout memo) and
    # late interaction (two-stage token-routed MaxSim)
    "phrase_index_topk",
    "maxsim_ivf_topk",
    # round 9: the learned-sparse family — from-scratch (encoder +
    # dot product, the bm25_topk analog) vs served from the persisted
    # term-clustered index (build excluded via the per-process memo)
    "sparse_topk",
    "sparse_index_topk",
]

# The 100 TB serving tiers (quantized IO / bucketed ANN / physically
# pruned IVF) — timed per-round, reported outside the headline total.
FAST_TIERS = [
    "knn_quantized",
    "ann_lsh_topk",
    "ann_ivf_topk",
    "ivf_persisted_topk",
    "ivf_trained_topk",
    "ann_cosine_ivf_topk",
    "ann_pq_topk",
    "ann_ivfpq_topk",
    "ann_cosine_ivfpq_topk",
    "mutations_compact_bucketed",
    # round 9: the compression ladder's int8 and 1-bit rungs under cell
    # pruning (sources/ivfsq_index.py, sources/ivfbin_index.py) — the
    # remaining fast-tier rows are unchanged for round-over-round
    # comparability; section totals grow by exactly these two rows
    "ann_sq8_topk",
    "ann_ivfbin_topk",
]

_WORKER_ENV = "SPARK_GRAFT_BENCH_WORKER"

#: recall@5 tracking for the ANN serving ladder (VERDICT r04 item 1):
#: the trained-centroid tiers have no SQL-replayable oracle, so their
#: quality knob — the recall-vs-n_probe curve — is measured per round
#: here.  One pass, not repeated: recall is a deterministic function of
#: the data (timings are what host noise perturbs, and the timing
#: sections already handle that).
RECALL_K = 5
RECALL_NPROBES = [1, 2, 4, 6, 8]


def _measure_recall(sf_dir: str) -> dict:
    """Recall@K of the serving tiers vs the exact-kNN baseline."""
    import tempfile

    from pyspark.sql import functions as F

    from distributed_vector_search_system_spark.operators.clustering import (
        kmeans_fit,
    )
    from distributed_vector_search_system_spark.operators.knn import knn
    from distributed_vector_search_system_spark.operators.pq import pq_fit
    from distributed_vector_search_system_spark.registry.vector import (
        _ivf_thinned_centroids,
    )
    from distributed_vector_search_system_spark.session import get_spark
    from distributed_vector_search_system_spark.sources.ivf_index import (
        search_ivf_index,
        write_ivf_index,
    )
    from distributed_vector_search_system_spark.sources.ivfpq_index import (
        search_ivfpq_index,
        write_ivfpq_index,
    )
    from distributed_vector_search_system_spark.tables import load_table

    spark = get_spark(app_name="dvss-bench-recall")
    emb = load_table(spark, sf_dir, "embeddings")
    dim = len(emb.select("embedding").first()[0])
    q = emb.filter(F.col("vec_id") % 100 == 7).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qvec")
    )
    exact = {
        (r["query_id"], r["id"]) for r in knn(emb, q, RECALL_K).collect()
    }

    def recall(df) -> float:
        got = {(r["query_id"], r["id"]) for r in df.collect()}
        return round(len(got & exact) / len(exact), 4)

    cents, _ = kmeans_fit(emb, 10, max_iterations=15)
    books, _ = pq_fit(emb, dim=dim, m=8, ksub=16, max_iterations=8)
    root = tempfile.mkdtemp(prefix="dvss_bench_recall_")
    ivf_r2 = os.path.join(root, "ivf_r2")
    write_ivf_index(emb, ivf_r2, cents, replicas=2)
    ivfpq_r2 = os.path.join(root, "ivfpq_r2")
    write_ivfpq_index(emb, ivfpq_r2, cents, books, replicas=2)

    out: dict = {"k": RECALL_K, "num_cells": 10, "replicas": 2}
    out["trained_ivf_r2"] = {
        str(np): recall(
            search_ivf_index(
                spark, ivf_r2, q, RECALL_K, cents, n_probe=np, replicated=True
            )
        )
        for np in RECALL_NPROBES
    }
    # two rerank depths: at rerank=20 the ADC coarse ranking (m=8,
    # ksub=16) is the binding constraint — recall saturates at ~0.77
    # regardless of n_probe; rerank=50 recovers to within a few points
    # of the IVF ceiling (0.93 / 1.0 at n_probe 4 / 8).  The knob that
    # matters is rerank depth vs codebook coarseness, not probes.
    for rr in (20, 50):
        out[f"trained_ivfpq_r2_rerank{rr}"] = {
            str(np): recall(
                search_ivfpq_index(
                    spark, ivfpq_r2, q, RECALL_K, cents, books,
                    n_probe=np, rerank=rr, replicated=True,
                )
            )
            for np in (4, 8)
        }
    out["adc_only_nprobe4"] = recall(
        search_ivfpq_index(
            spark, ivfpq_r2, q, RECALL_K, cents, books,
            n_probe=4, rerank=0, replicated=True,
        )
    )
    # SQ8 middle rung (round 8): the int8 coarse ordering is near-exact
    # (per-component error <= scale/2), so the SHALLOW rerank=3 should
    # sit at the IVF ceiling where PQ needs rerank≈50 — the ladder's
    # no-training / low-rerank trade on the record
    from distributed_vector_search_system_spark.sources.ivfsq_index import (
        search_ivf_sq8_index,
        write_ivf_sq8_index,
    )

    sq8_r2 = os.path.join(root, "sq8_r2")
    write_ivf_sq8_index(emb, sq8_r2, cents, replicas=2)
    out["trained_sq8_r2_rerank3"] = {
        str(np): recall(
            search_ivf_sq8_index(
                spark, sq8_r2, q, RECALL_K, cents,
                n_probe=np, rerank=3, replicated=True,
            )
        )
        for np in (4, 8)
    }
    out["sq8_coarse_only_nprobe4"] = recall(
        search_ivf_sq8_index(
            spark, sq8_r2, q, RECALL_K, cents,
            n_probe=4, rerank=0, replicated=True,
        )
    )
    # binary (1-bit) rung: Hamming carries direction only, so its
    # exact-rerank recall vs depth sits between the sign-agnostic PQ
    # ADC and the near-exact int8 ordering — the ladder's bottom rung
    # on the record
    from distributed_vector_search_system_spark.operators.quantize import (
        binary_knn,
    )

    # depths 4-16 sit at 0.45-0.70 at this geometry (d=64); 32/64 are
    # the shortlist-sizing depths the docstring rule cites (VERDICT r08
    # item 7: state what depth reaches >=0.9)
    out["binary_rerank"] = {
        str(rr): recall(binary_knn(emb, q, RECALL_K, dim, rerank=rr))
        for rr in (4, 8, 16, 32, 64)
    }
    # IVF+binary rung (round 9, sources/ivfbin_index.py): the 1-bit
    # codes composed with cell pruning — recall-vs-rerank next to SQ8's
    # so the whole ladder reads off one section.  The cell routing adds
    # the same probe-miss term the other rungs pay, ON TOP of the
    # Hamming ordering's own depth requirement.
    from distributed_vector_search_system_spark.sources.ivfbin_index import (
        search_ivf_binary_index,
        write_ivf_binary_index,
    )

    bin_r2 = os.path.join(root, "bin_r2")
    write_ivf_binary_index(emb, bin_r2, cents, dim, replicas=2)
    for rr in (16, 64):
        out[f"trained_ivfbin_r2_rerank{rr}"] = {
            str(np): recall(
                search_ivf_binary_index(
                    spark, bin_r2, q, RECALL_K, cents,
                    n_probe=np, rerank=rr, replicated=True,
                )
            )
            for np in (4, 8)
        }
    # residual encoding (round 5): the classic-IVFPQ refinement whose
    # payoff is exactly this ADC-only line — same geometry, residual
    # codebooks + per-cell query LUTs
    from distributed_vector_search_system_spark.operators.pq import (
        pq_residual_codebooks,
    )

    res_books = pq_residual_codebooks(
        emb, cents, dim=dim, m=8, ksub=16, trained=True, max_iterations=8
    )
    ivfpq_res = os.path.join(root, "ivfpq_res")
    write_ivfpq_index(
        emb, ivfpq_res, cents, res_books, replicas=2, residual=True
    )
    out["adc_only_residual_nprobe4"] = recall(
        search_ivfpq_index(
            spark, ivfpq_res, q, RECALL_K, cents, res_books,
            n_probe=4, rerank=0, replicated=True, residual=True,
        )
    )
    # cosine-IVFPQ leg (round 7): the compressed COSINE serving tier —
    # same geometry in normalized space, recall against exact cosine
    # top-k.  Completes the ladder: production embedding search is
    # cosine AND compressed, so this line is the one that matters.
    from distributed_vector_search_system_spark.functions.distance import (
        l2_normalize,
    )
    from distributed_vector_search_system_spark.operators.similarity import (
        cosine_topk,
    )
    from distributed_vector_search_system_spark.sources.ivfpq_index import (
        search_cosine_ivfpq_index,
        write_cosine_ivfpq_index,
    )

    # match the cosine tier's build contract: zero-norm vectors are
    # excluded BEFORE normalizing (write_cosine_ivfpq_index / _norm_emb
    # do the same) — a zero vector would inject NaN rows into
    # kmeans_fit/pq_fit and poison the trained centroids (ADVICE r07)
    from distributed_vector_search_system_spark.functions.distance import l2_norm

    norm = (
        emb.filter(l2_norm(F.col("embedding")) > 0.0)
        .withColumn("embedding", l2_normalize("embedding"))
        .localCheckpoint(eager=True)
    )
    ncents, _ = kmeans_fit(norm, 10, max_iterations=15)
    nbooks, _ = pq_fit(norm, dim=dim, m=8, ksub=16, max_iterations=8)
    cos_idx = os.path.join(root, "cos_ivfpq_r2")
    write_cosine_ivfpq_index(emb, cos_idx, ncents, nbooks, replicas=2)
    exact_cos = {
        (r["query_id"], r["id"]) for r in cosine_topk(emb, q, RECALL_K).collect()
    }

    def recall_cos(df) -> float:
        got = {(r["query_id"], r["id"]) for r in df.collect()}
        return round(len(got & exact_cos) / len(exact_cos), 4)

    out["cosine_ivfpq_r2_rerank50"] = {
        str(np): recall_cos(
            search_cosine_ivfpq_index(
                spark, cos_idx, q, RECALL_K, ncents, nbooks,
                n_probe=np, rerank=50, replicated=True,
            )
        )
        for np in (4, 8)
    }
    # the oracle-replayable hash-sampled tier (the ann_recall driver
    # row's configuration) for contrast with the trained curve
    sampled = _ivf_thinned_centroids(spark, sf_dir)
    sampled_idx = os.path.join(root, "ivf_sampled")
    write_ivf_index(emb, sampled_idx, sampled)
    out["sampled_ivf_nprobe4"] = recall(
        search_ivf_index(spark, sampled_idx, q, RECALL_K, sampled, n_probe=4)
    )
    # round 9: the sparse family's quality knob — impact pruning's
    # recall@10 vs the exact dot product, per min_impact_frac (the
    # lexical analog of the rerank-depth curves above; deterministic,
    # one pass).  The fixture queries are the registry row's.
    from distributed_vector_search_system_spark.operators.sparse import (
        prune_postings,
        sparse_encode,
        sparse_encode_queries,
        sparse_topk,
    )
    from distributed_vector_search_system_spark.functions.text import tokens

    docs = load_table(spark, sf_dir, "documents")
    sq = sparse_encode_queries(
        docs.filter(F.expr("doc_id % 100 = 7")).select(
            F.col("doc_id").alias("query_id"),
            F.array_join(F.slice(tokens("text"), 1, 8), " ").alias("qtext"),
        )
    )
    enc = sparse_encode(docs)
    sp_exact = {
        (r["query_id"], r["id"]) for r in sparse_topk(enc, sq, 10).collect()
    }

    def recall_sp(df) -> float:
        got = {(r["query_id"], r["id"]) for r in df.collect()}
        return round(len(got & sp_exact) / len(sp_exact), 4)

    out["sparse_prune_recall10"] = {
        str(frac): recall_sp(
            sparse_topk(prune_postings(enc, min_impact_frac=frac), sq, 10)
        )
        for frac in (0.3, 0.5, 0.7)
    }
    # champion-list (rank-capped) curve — the fixture's flat vocabulary
    # is this tier's adversarial case (see cap_postings docstring);
    # record it honestly per round
    from distributed_vector_search_system_spark.operators.sparse import (
        cap_postings,
    )

    out["sparse_cap_recall10"] = {
        str(cap): recall_sp(sparse_topk(cap_postings(enc, cap), sq, 10))
        for cap in (16, 64, 256)
    }
    # round 10 (VERDICT r09 item 2): the FAVORABLE-geometry measurement
    # — a Zipf vocabulary with heavy-tailed weights, the distribution
    # champion lists exist for — next to the flat-vocab adversarial
    # curve above, both truncated-score and candidates+exact-rescore.
    from distributed_vector_search_system_spark.operators.sparse import (
        sparse_champion_rescore_topk,
    )
    from distributed_vector_search_system_spark.sources.synthetic import (
        synthetic_zipf_postings,
        synthetic_zipf_queries,
    )

    zenc = synthetic_zipf_postings(spark, 20_000, 50_000, 40).cache()
    zq = synthetic_zipf_queries(spark, 30, 50_000, 6).cache()
    z_exact = {
        (r["query_id"], r["id"]) for r in sparse_topk(zenc, zq, 10).collect()
    }

    def recall_z(df) -> float:
        got = {(r["query_id"], r["id"]) for r in df.collect()}
        return round(len(got & z_exact) / len(z_exact), 4)

    out["sparse_cap_recall10_zipf"] = {
        str(cap): recall_z(sparse_topk(cap_postings(zenc, cap), zq, 10))
        for cap in (16, 64, 256)
    }
    out["sparse_rescore_recall10_zipf"] = {
        str(cap): recall_z(
            sparse_champion_rescore_topk(zenc, zq, 10, per_term_cap=cap)
        )
        for cap in (16, 64, 256)
    }
    # round 10: Matryoshka prefix rungs — recall@K vs exact COSINE
    # across d' × shortlist.  The fixtures are not MRL-trained (no
    # model runs in-container), so this is the honest FLOOR an MRL
    # encoder lifts (operators/matryoshka.py docstring); the sizing
    # signal is the shortlist multiplier each d' needs to recover.
    from distributed_vector_search_system_spark.operators.matryoshka import (
        matryoshka_topk,
    )
    from distributed_vector_search_system_spark.operators.similarity import (
        cosine_topk,
    )

    cos_exact = {
        (r["query_id"], r["id"])
        for r in cosine_topk(emb, q, RECALL_K).collect()
    }

    def recall_c(df) -> float:
        got = {(r["query_id"], r["id"]) for r in df.collect()}
        return round(len(got & cos_exact) / len(cos_exact), 4)

    out["matryoshka_recall5"] = {
        f"d{dp}_sl{sl}": recall_c(
            matryoshka_topk(emb, q, RECALL_K, d_prime=dp, shortlist=sl)
        )
        for dp in (8, 16, 32)
        for sl in (20, 50, 200)
    }
    spark.stop()
    return out


def _measure_once(sf_dir: str) -> dict:
    """One full measurement pass in THIS process (one fresh JVM)."""
    from distributed_vector_search_system_spark import registry
    from distributed_vector_search_system_spark.registry.vector import (
        bucketed_mutation_tables,
        cosine_ivf_index,
        cosine_ivfpq_index,
        ivfbin_index,
        ivfpq_index,
        persisted_ivf_index,
        pq_tier,
        quantized_tier,
        sq8_index,
        trained_ivf_index,
    )
    from distributed_vector_search_system_spark.session import get_spark

    spark = get_spark(app_name="dvss-bench")
    # resolved-master echo (round 14, VERDICT r13 item 2): captured
    # before stop() so the artifact itself proves which master /
    # parallelism the run used
    master = spark.sparkContext.master
    parallelism = spark.sparkContext.defaultParallelism
    qs = registry.all_queries()  # headline names may sit in either tier
    names = [n for n in HEADLINE if n in qs]
    fast = [n for n in FAST_TIERS if n in qs]
    retrieval = [n for n in RETRIEVAL if n in qs]
    # warm the JVM + parquet footers with ONE query — the same warm-up
    # rounds 1-3 used, keeping headline cold timings round-comparable
    qs[names[0]](spark, sf_dir).write.format("noop").mode("overwrite").save()

    cold: dict[str, float] = {}
    steady: dict[str, float] = {}

    def _time(name: str) -> None:
        t0 = time.perf_counter()
        qs[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
        cold[name] = round(time.perf_counter() - t0, 4)
        t1 = time.perf_counter()
        qs[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
        steady[name] = round(time.perf_counter() - t1, 4)

    for name in names:
        _time(name)
    # CPU-scaling probe (round 14, VERDICT r13 item 2): every sf0.1
    # registry query is fixed-per-job-overhead-bound (the driver's
    # 8-core run measured FASTER than 32-core on all seven headline
    # rows — pure noise), and the embeddings fixture is one parquet
    # file = ONE scan task, so core count is invisible to the timed
    # rows.  This row exists solely to make parallelism observable:
    # a compute-bound exact-kNN fold (O(Q·N·d) zip_with work) spread
    # over an explicit round-robin repartition, so wall-clock tracks
    # cores and the low-core/high-core ratio is ≥2 when the harness
    # honors $SPARK_GRAFT_CPUS.  Reported as its own summary key —
    # NOT added to ``queries`` so the headline total stays
    # round-comparable.
    scaling_probe = None
    if os.environ.get("SPARK_GRAFT_BENCH_SCALING_PROBE", "1") != "0":
        from pyspark.sql import functions as F

        from distributed_vector_search_system_spark.operators.knn import knn
        from distributed_vector_search_system_spark.tables import load_table

        emb = load_table(spark, sf_dir, "embeddings").repartition(64)
        probe_q = emb.filter(F.col("vec_id") % 9 == 3).select(
            F.col("vec_id").alias("query_id"), F.col("embedding").alias("qvec")
        )
        spark.sparkContext.setJobDescription("bench: cpu scaling probe")
        t0 = time.perf_counter()
        knn(emb, probe_q, 10, method="expr").write.format("noop").mode(
            "overwrite"
        ).save()
        scaling_probe = round(time.perf_counter() - t0, 4)
        spark.sparkContext.setJobDescription(None)
    # storage tiers materialize only AFTER the headline measurements
    # (one-time build cost, excluded from per-query timings — and their
    # JVM churn must not warm or GC-pressure the headline numbers).
    # Build seconds are RECORDED (BENCH_DETAIL "tier_build_sec"): at
    # 100 TB the write path is the compaction-cadence budget, and an
    # index whose build regresses 10x is a real regression even if
    # every read stays fast.
    from distributed_vector_search_system_spark.registry.llm import (
        _hybrid_posting_index,
    )

    builds: dict[str, float] = {}

    def _build(name: str, fn) -> None:
        t0 = time.perf_counter()
        fn(spark, sf_dir)
        builds[name] = round(time.perf_counter() - t0, 4)

    _build("quantized_tier", quantized_tier)
    _build("persisted_ivf_index", persisted_ivf_index)
    _build("trained_ivf_index", trained_ivf_index)
    _build("cosine_ivf_index", cosine_ivf_index)
    _build("pq_tier", pq_tier)
    _build("ivfpq_index", ivfpq_index)
    _build("cosine_ivfpq_index", cosine_ivfpq_index)
    _build("bucketed_mutation_tables", bucketed_mutation_tables)
    # Measurement-consistency fix (round 13): the round-9 sq8/ivfbin
    # rungs were never added to this build list, so their one-time index
    # materialization (memoized per process) landed INSIDE their cold
    # query timings — the only two fast-tier rows whose cold number was
    # build+query while the other ten were query-only (r12:
    # ann_sq8_topk 3.40 cold vs 1.10 steady, the gap being the build).
    # Build them up front like every other tier and record the seconds
    # in tier_build_sec; the queries keep their entries — their cold
    # number simply stops double-counting the write path, per this
    # file's own "BUILD time is a write-path cost" contract.
    _build("sq8_index", sq8_index)
    _build("ivfbin_index", ivfbin_index)
    for name in fast:
        _time(name)
    # the indexed retrieval rows' one-time posting-index build must not
    # pollute their cold timings (persisted_ivf_index is already built)
    _build("posting_index", _hybrid_posting_index)
    from distributed_vector_search_system_spark.registry.llm import (
        maxsim_ivf_layout,
        phrase_index,
    )

    _build("positional_index", phrase_index)
    _build("maxsim_token_layout", maxsim_ivf_layout)
    from distributed_vector_search_system_spark.registry.llm import (
        _sparse_index_path,
    )

    _build("sparse_index", _sparse_index_path)
    for name in retrieval:
        _time(name)
    spark.stop()
    return {
        "cold": cold,
        "steady": steady,
        "headline": names,
        "fast": fast,
        "retrieval": retrieval,
        "builds": builds,
        "scaling_probe": scaling_probe,
        "master": master,
        "parallelism": parallelism,
    }


def _agg_by_query(
    runs: list[dict], tier: str, names: list[str], fn
) -> dict[str, float]:
    return {n: round(fn(r[tier][n] for r in runs), 4) for n in names}


#: reference-width bench (VERDICT r04 item 3): the reference serves
#: d=768 (config/node1.textproto:13) while every fixture is d=64.  One
#: deterministic synthetic corpus at the real width, timing the tiers
#: whose cost is width-sensitive: expr vs GEMM exact kNN (the crossover
#: moves with d), int8 coarse scan, PQ ADC (m=8 -> dsub=96 — fat
#: codebook literals stress plan build).
D768_N = int(os.environ.get("SPARK_GRAFT_BENCH_D768_N", "20000"))


def _measure_d768() -> dict:
    import time

    from pyspark.sql import functions as F

    from distributed_vector_search_system_spark.operators.knn import knn
    from distributed_vector_search_system_spark.operators.matryoshka import (
        matryoshka_topk,
    )
    from distributed_vector_search_system_spark.operators.pq import (
        pq_adc_topk,
        pq_encode,
        pq_sample_codebooks,
    )
    from distributed_vector_search_system_spark.operators.quantize import (
        quantized_knn,
    )
    from distributed_vector_search_system_spark.session import get_spark
    from distributed_vector_search_system_spark.sources.synthetic import (
        synthetic_vectors,
    )

    spark = get_spark(app_name="dvss-bench-d768")
    corpus = synthetic_vectors(spark, D768_N, 768).localCheckpoint(eager=True)
    queries = corpus.filter(F.col("vec_id") % 1000 == 7).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qvec")
    )
    from distributed_vector_search_system_spark.operators.quantize import (
        quantize_vectors,
    )

    books = pq_sample_codebooks(corpus, dim=768, m=8, ksub=16)
    tier = pq_encode(corpus, books).localCheckpoint(eager=True)
    int8_tier = quantize_vectors(corpus).localCheckpoint(eager=True)

    def t(df_builder) -> float:
        t0 = time.perf_counter()
        df_builder().write.format("noop").mode("overwrite").save()
        return round(time.perf_counter() - t0, 4)

    out = {"n": D768_N, "dim": 768, "n_queries": D768_N // 1000}
    # warm once, then MIN over 2 timed runs: a single-shot second run is
    # still exposed to host steal — r05 recorded pq_adc_only at 12.5 s
    # from one steal spike (noise spread 1.226 that run) where calm-host
    # reruns give 1.6 s, below pq_adc as the mode's design requires
    # (VERDICT r05 item 6 root cause)
    for name, fn in (
        ("knn_expr", lambda: knn(corpus, queries, 10, method="expr")),
        ("knn_numpy", lambda: knn(corpus, queries, 10, method="numpy")),
        ("knn_quantized", lambda: quantized_knn(int8_tier, queries, 10, rerank=4)),
        (
            "knn_quantized_numpy",
            lambda: quantized_knn(
                int8_tier, queries, 10, rerank=4, coarse_method="numpy"
            ),
        ),
        ("pq_adc", lambda: pq_adc_topk(tier, queries, 10, books, rerank=10)),
        ("pq_adc_only", lambda: pq_adc_topk(tier, queries, 10, books, rerank=0)),
        # round 10: Matryoshka at the width it exists for — a d'=96
        # coarse pass is 1/8th of knn_expr's flops at d=768, rescore
        # bounded at shortlist x |queries| full vectors.  The d64
        # fixtures cannot show this (the slice overhead eats the
        # saving); here is the honest test of the rung's cost claim.
        (
            "matryoshka_d96",
            lambda: matryoshka_topk(
                corpus, queries, 10, d_prime=96, shortlist=50
            ),
        ),
    ):
        t(fn)
        out[name] = min(t(fn), t(fn))
    # expr↔GEMM crossover vs QUERY COUNT (round 14, VERDICT r13 item 7):
    # the engine's AUTO_GEMM_MIN_DIM dispatches on dimension alone, so
    # the Q-axis of the crossover goes on the record each round.  At
    # d=768 the GEMM tier wins at every Q measured — including Q=1
    # (0.40 vs 0.44 s at round-14 calibration), where the Arrow corpus
    # serialization is the GEMM tier's whole cost; at Q≥4 it wins ≥1.5×
    # and grows with Q (expr is O(Q·N·d) fold work, GEMM amortizes the
    # corpus transfer).  The threshold therefore STAYS at 256: the only
    # mis-dispatched corner is (d≈256, Q=1), measured ~0.18 vs ~0.34 s
    # — a fixed sub-second penalty against a multi-× batch win.
    for qtag, mod in (("q1", D768_N), ("q4", D768_N // 4)):
        qn = corpus.filter(F.col("vec_id") % mod == 0).select(
            F.col("vec_id").alias("query_id"), F.col("embedding").alias("qvec")
        )
        for m in ("expr", "numpy"):
            fn = lambda: knn(corpus, qn, 10, method=m)  # noqa: B023
            t(fn)
            out[f"knn_{m}_{qtag}"] = min(t(fn), t(fn))
    spark.stop()
    return out


#: >sf0.1 scale anchor (VERDICT r04 item 4): one measured point above
#: the shipped fixtures.  A 10x key-offset copy of $SPARK_GRAFT_SF_DIR
#: (sources/scaleup.py — FK-consistent, copy-distinct text so dedup
#: scales linearly) is materialized once into .scale_cache/, then:
#:
#: - registry rows whose work is corpus-proportional (aggregation /
#:   window / compaction / dedup joins / lexical retrieval) are timed
#:   once per dir — single-shot, because a 10x ratio is far above
#:   timing noise and double-execution doubled the section's cost;
#: - the vector tiers are timed at OPERATOR level with a FIXED 8-query
#:   set present at both scales, so their measured growth is pure
#:   corpus scaling (expected ~linear).  The registry's vector rows
#:   scale their query set with the corpus (fixed %-predicate ⇒
#:   O(Q x N) work, ~copies² in sf) — correct behavior, but it
#:   measures query-batch growth, not plan scaling, and at 10x it made
#:   the section take the better part of an hour (round-5 calibration:
#:   knn_batch alone was 91 s per execution at 10x).
#:
#: SUPERLINEAR = ratio worse than copies x2 slack — the regression the
#: anchor exists to catch (e.g. a pair-explosion in the dedup joins).
SCALE_COPIES = int(os.environ.get("SPARK_GRAFT_BENCH_SCALE_COPIES", "10"))

#: corpus-proportional registry rows timed at both scales.  Two rows
#: are deliberately ABSENT (round-5 calibration, measured at 10x):
#: - dedup_simhash_loose (pytest tier): hamming <= 12 of 60 bits forces
#:   4-bit pigeonhole chunks whose join keys have only 16 values —
#:   candidates grow ~N²/16 BY CONSTRUCTION (1117.9 s at 10x, measured
#:   once).  Not a plan regression, a radius choice; the driver row
#:   dedup_simhash is the production radius (h=3, 15-bit chunks) since
#:   round 6 and is anchored below (r05: 10.2 -> 48.1 s, ~linear).
#: - hybrid_rrf: its registered query set scales with the corpus
#:   (doc_id %-predicate), so its vector leg is O(Q x N) — ~34x at 10x,
#:   measured once.  The fixed-query variant below isolates corpus
#:   scaling.
_SCALE_ROWS = [
    "rel_pricing_summary",
    "rel_revenue_by_region",
    "rel_events_sessions",
    "rel_replay_fold",
    "mutations_compact",
    "dedup_exact",
    "dedup_minhash_lsh",
    "dedup_simhash",
    "bm25_topk",
    # round 9 (VERDICT r08 item 2): the last dedup granularity —
    # winnowed 20-token span fingerprints, one first-owner shuffle;
    # copy-distinct text means cross-copy spans never collide, so the
    # expected shape is the corpus-linear gram+winnow cost
    "substring_dedup",
]

#: fixed query ids for the vector-tier anchor (all < 2000, so present
#: at sf0.1 and in copy 0 of every scaled dir)
_SCALE_QUERY_IDS = [7, 107, 207, 307, 407, 507, 607, 707]


def _measure_scale(sf_dir: str) -> dict:
    import time

    from pyspark.sql import functions as F

    from distributed_vector_search_system_spark import registry
    from distributed_vector_search_system_spark.operators.knn import knn
    from distributed_vector_search_system_spark.operators.pq import (
        pq_adc_topk,
        pq_sample_codebooks,
    )
    from distributed_vector_search_system_spark.operators.quantize import (
        quantized_knn,
    )
    from distributed_vector_search_system_spark.operators.similarity import (
        ann_ivf_topk,
    )
    from distributed_vector_search_system_spark.session import get_spark
    from distributed_vector_search_system_spark.sources.scaleup import (
        scale_fixture_dir,
    )
    from distributed_vector_search_system_spark.tables import load_table

    spark = get_spark(app_name="dvss-bench-scale")
    dst = os.path.join(
        os.path.dirname(os.path.abspath(__file__)),
        ".scale_cache",
        f"{os.path.basename(os.path.normpath(sf_dir))}x{SCALE_COPIES}",
    )
    t0 = time.perf_counter()
    scale_fixture_dir(spark, sf_dir, dst, copies=SCALE_COPIES)
    gen_s = round(time.perf_counter() - t0, 1)

    qs = registry.all_queries()
    rows = [n for n in _SCALE_ROWS if n in qs]
    # one light warm so the first timed row doesn't pay JVM/JIT startup
    qs[rows[0]](spark, sf_dir).write.format("noop").mode("overwrite").save()

    def once(builder) -> float:
        t1 = time.perf_counter()
        builder().write.format("noop").mode("overwrite").save()
        return round(time.perf_counter() - t1, 4)

    def vector_ops(d: str) -> dict:
        from distributed_vector_search_system_spark.operators.retrieval import (
            hybrid_rrf_indexed_topk,
            hybrid_rrf_topk,
            queries_from_docs,
        )
        from distributed_vector_search_system_spark.sources.posting_index import (
            bm25_search_index,
            write_posting_index,
        )

        emb = load_table(spark, d, "embeddings")
        docs = load_table(spark, d, "documents")
        ev = load_table(spark, d, "events")
        dim = len(emb.select("embedding").first()[0])
        q = emb.filter(F.col("vec_id").isin(_SCALE_QUERY_IDS)).select(
            F.col("vec_id").alias("query_id"), F.col("embedding").alias("qvec")
        )
        hq = queries_from_docs(
            docs, F.col("doc_id").isin(_SCALE_QUERY_IDS)
        ).join(
            emb.select(
                F.col("vec_id").alias("query_id"), F.col("embedding").alias("qvec")
            ),
            "query_id",
            "left",
        )
        books = pq_sample_codebooks(emb, dim=dim, m=8, ksub=16)
        # posting-index anchor (VERDICT r05 item 7): the index build is a
        # one-time write-path cost (excluded, like the vector tiers'
        # builds); the timed row is query-time search only.  The
        # up-scaler's copy-distinct tokens mean the fixed copy-0 query
        # vocabulary's posting lists do NOT grow with copies, so the
        # indexed path should be ~flat where from-scratch bm25_topk pays
        # the full corpus tokenize+restrict at any scale.  The index
        # lives at a DETERMINISTIC per-dir path under .scale_cache and
        # is overwritten each run — a fresh mkdtemp per run would
        # accumulate full posting indexes in /tmp with no reclamation.
        idx = os.path.join(
            os.path.dirname(os.path.abspath(__file__)),
            ".scale_cache",
            f"posting_{os.path.basename(os.path.normpath(d))}",
        )
        write_posting_index(docs, idx)
        lexq = queries_from_docs(docs, F.col("doc_id").isin(_SCALE_QUERY_IDS))
        # persisted-IVF anchor (VERDICT r06 item 5): the partition-pruned
        # vector serving path, measured (not just plan-asserted) at 10x.
        # Cells grow with the corpus but the probe set stays n_probe of
        # num_cells, so probed BYTES grow ~linearly with cell size while
        # the logical ann_fixedq_ivf row (no physical layout) re-scans
        # the whole corpus; expected ratio well below its 4.51 — the
        # point of persisting the index.  Build excluded (write path),
        # same discipline as the posting index; deterministic path under
        # .scale_cache, overwritten per run.
        from distributed_vector_search_system_spark.registry.vector import (
            _ivf_thinned_centroids,
        )
        from distributed_vector_search_system_spark.sources.ivf_index import (
            search_ivf_index,
            write_ivf_index,
        )

        cents = _ivf_thinned_centroids(spark, d)
        ivf_idx = os.path.join(
            os.path.dirname(os.path.abspath(__file__)),
            ".scale_cache",
            f"ivfidx_{os.path.basename(os.path.normpath(d))}",
        )
        write_ivf_index(emb, ivf_idx, cents)
        # id-bucketed rerank store (VERDICT r07 item 4): the store-backed
        # two-phase tier next to the plain one measures the DPP re-rank's
        # crossover — the store adds a ~fixed DPP-subquery cost while the
        # plain broadcast re-rank re-scans the whole float column, so the
        # store row should scale FLATTER than knn_fixedq_quantized even
        # though phase 1 (the int8 scan) grows for both.  Build excluded
        # (write path), deterministic path, overwritten per run.
        from distributed_vector_search_system_spark.sources.rerank_store import (
            write_rerank_store,
        )

        rr_store = os.path.join(
            os.path.dirname(os.path.abspath(__file__)),
            ".scale_cache",
            f"rrstore_{os.path.basename(os.path.normpath(d))}",
        )
        write_rerank_store(emb, rr_store)
        # round-9 anchors (VERDICT r08 item 2): the round-8 families'
        # linearity claims were design arguments — measure them.
        #
        # positional phrase index: term pushdown means the fixed copy-0
        # phrase terms' posting rows do NOT grow with copies (the
        # up-scaler's copy-distinct tokens), so expect ~flat like
        # bm25_index_topk.  Build excluded (write path), deterministic
        # path under .scale_cache, overwritten per run.
        from distributed_vector_search_system_spark.functions.text import (
            tokens as _tok,
        )
        from distributed_vector_search_system_spark.operators.phrase import (
            phrase_search_index,
            write_positional_index,
        )

        ph_idx = os.path.join(
            os.path.dirname(os.path.abspath(__file__)),
            ".scale_cache",
            f"phraseidx_{os.path.basename(os.path.normpath(d))}",
        )
        write_positional_index(docs, ph_idx)
        phq = (
            docs.filter(F.col("doc_id").isin(_SCALE_QUERY_IDS))
            .select(F.col("doc_id").alias("query_id"), _tok("text").alias("_w"))
            .filter(F.size("_w") >= 4)
            .select("query_id", F.slice("_w", 2, 3).alias("phrase"))
        )
        # two-stage MaxSim: per-token routing over a token-level cosine
        # IVF index + DPP-bounded token-store gather.  Probed cells grow
        # with the corpus (cell size ~linear in copies) while the gather
        # stays candidate-bounded — expect ~linear with a small slope.
        # Same pseudo-doc construction as the registry row (4 token
        # vectors per doc), static trained centroids at both scales.
        from distributed_vector_search_system_spark.operators.late_interaction import (  # noqa: E501
            maxsim_ivf_topk,
        )
        from distributed_vector_search_system_spark.registry.trained_cents import (
            COSINE_CENTROIDS_SF001,
        )
        from distributed_vector_search_system_spark.sources.ivf_index import (
            write_cosine_ivf_index,
        )

        dv = emb.select(
            F.expr("vec_id div 4").alias("doc_id"), "vec_id", "embedding"
        )
        ms_idx = os.path.join(
            os.path.dirname(os.path.abspath(__file__)),
            ".scale_cache",
            f"maxsimivf_{os.path.basename(os.path.normpath(d))}",
        )
        ms_store = os.path.join(
            os.path.dirname(os.path.abspath(__file__)),
            ".scale_cache",
            f"maxsimstore_{os.path.basename(os.path.normpath(d))}",
        )
        write_cosine_ivf_index(dv, ms_idx, COSINE_CENTROIDS_SF001)
        write_rerank_store(dv, ms_store, id_col="doc_id")
        mq = (
            emb.select(F.expr("vec_id div 4").alias("query_id"), "embedding")
            .filter(F.col("query_id").isin(_SCALE_QUERY_IDS))
            .groupBy("query_id")
            .agg(F.collect_list("embedding").alias("qvecs"))
        )
        # binary rung: phase 1 is a full scan of the packed sign bits
        # (~64x smaller than the float column) + bounded exact re-rank —
        # expect ~linear with the smallest slope of the scan tiers.
        from distributed_vector_search_system_spark.operators.quantize import (
            binary_knn,
        )

        # round-9 sparse anchor: the term-clustered weighted-postings
        # index under fixed copy-0 queries — the up-scaler's
        # copy-distinct tokens keep the queried terms' posting lists
        # size-invariant, so expect ~flat like bm25_index_topk (the
        # from-scratch sparse_topk pays the full encoder at any scale
        # and is deliberately NOT anchored: its growth class is the
        # corpus tokenize, already covered by bm25/dedup anchors).
        # Build excluded (write path), deterministic path, overwritten
        # per run.
        from distributed_vector_search_system_spark.operators.sparse import (
            sparse_encode_queries,
        )
        from distributed_vector_search_system_spark.sources.sparse_index import (
            sparse_search_index,
            write_sparse_index,
        )

        from distributed_vector_search_system_spark.operators.collapse import (
            collapse_topk as _clps,
        )
        from distributed_vector_search_system_spark.operators.complete import (
            prefix_completions as _cmpl,
        )
        from distributed_vector_search_system_spark.operators.fuzzy import (
            bm25_fuzzy_topk as _fz,
        )
        from distributed_vector_search_system_spark.operators.fuzzy import (
            corpus_vocabulary as _cv,
        )
        from distributed_vector_search_system_spark.operators.contamination import (  # noqa: E501
            contamination_overlap as _contam,
        )
        from distributed_vector_search_system_spark.operators.matryoshka import (
            matryoshka_topk as _mrl,
        )
        from distributed_vector_search_system_spark.operators.mlt import (
            bm25_mlt_topk as _mlt,
        )
        from distributed_vector_search_system_spark.operators.scoring import (
            field_value_factor as _fvf,
        )
        from distributed_vector_search_system_spark.operators.scoring import (
            function_score as _fsc,
        )
        from distributed_vector_search_system_spark.operators.facets import (
            histogram_for_hits as _histh,
        )
        from distributed_vector_search_system_spark.operators.facets import (
            significant_terms as _sig,
        )
        from distributed_vector_search_system_spark.functions.analysis import (
            STOPWORDS_EN as _SW,
        )
        from distributed_vector_search_system_spark.functions.analysis import (
            analyze_text as _antext,
        )
        from distributed_vector_search_system_spark.operators.aggregations import (
            extended_stats as _xstats,
        )
        from distributed_vector_search_system_spark.operators.aggregations import (
            percentiles as _pctl,
        )
        from distributed_vector_search_system_spark.operators.aggregations import (
            top_hits as _thits,
        )
        from distributed_vector_search_system_spark.operators.percolate import (
            percolate as _perc,
        )
        from distributed_vector_search_system_spark.operators.retrieval import (
            bm25_topk as _bm25,
        )
        from distributed_vector_search_system_spark.operators.phrase import (
            phrase_slop_topk as _pslop,
        )
        from distributed_vector_search_system_spark.operators.querydsl import (
            msearch as _msearch,
            search_request as _sreq,
        )
        from distributed_vector_search_system_spark.operators.spell import (
            spell_suggestions as _spellsug,
        )

        sp_idx = os.path.join(
            os.path.dirname(os.path.abspath(__file__)),
            ".scale_cache",
            f"sparseidx_{os.path.basename(os.path.normpath(d))}",
        )
        write_sparse_index(docs, sp_idx)
        spq = sparse_encode_queries(
            docs.filter(F.col("doc_id").isin(_SCALE_QUERY_IDS)).select(
                F.col("doc_id").alias("query_id"),
                F.array_join(F.slice(_tok("text"), 1, 8), " ").alias("qtext"),
            )
        )
        # hoisted: the hybrid anchor's query vector is fetched once,
        # not inside the timed lambda; pinned to the smallest query_id
        # so base and 10x runs time the SAME vector (ADVICE r12 item 5
        # — an unordered limit(1) could pick different rows per run)
        _hyvec = [
            float(x)
            for x in q.orderBy("query_id").limit(1).collect()[0]["qvec"]
        ]
        return {
            "knn_fixedq_expr": lambda: knn(emb, q, 10),
            "knn_fixedq_numpy": lambda: knn(emb, q, 10, method="numpy"),
            "knn_fixedq_quantized": lambda: quantized_knn(emb, q, 10),
            "quantized_fixedq_store": lambda: quantized_knn(
                emb, q, 10, rerank_store=rr_store
            ),
            "hybrid_fixedq_indexed": lambda: hybrid_rrf_indexed_topk(
                spark, idx, ivf_idx, cents, hq, 10
            ),
            "ann_fixedq_ivf": lambda: ann_ivf_topk(
                emb, q, 10, thin_count_key=f"{d}:embeddings"
            ),
            "pq_fixedq_adc": lambda: pq_adc_topk(emb, q, 10, books),
            "hybrid_fixedq_rrf": lambda: hybrid_rrf_topk(docs, emb, hq, 10),
            "bm25_index_topk": lambda: bm25_search_index(spark, idx, lexq, 10),
            "ivf_fixedq_persisted": lambda: search_ivf_index(
                spark, ivf_idx, q, 10, cents, n_probe=4
            ),
            "knn_fixedq_binary": lambda: binary_knn(emb, q, 10, dim, rerank=16),
            "phrase_fixedq_index": lambda: phrase_search_index(
                spark, ph_idx, phq, 5
            ),
            "maxsim_fixedq_ivf": lambda: maxsim_ivf_topk(
                spark, ms_idx, ms_store, mq, 5, COSINE_CENTROIDS_SF001,
                n_probe=4, gather=8,
            ),
            "sparse_fixedq_index": lambda: sparse_search_index(
                spark, sp_idx, spq, 10
            ),
            # champion tier: impact_rank <= B pushdown bounds per-term
            # IO at B rows at ANY corpus size — this row should be the
            # flattest sparse number (the exact row is already ~flat
            # here because the up-scaler keeps fixed-query posting
            # lists size-invariant; at real Zipfian growth the cap is
            # what holds the bound)
            "sparse_fixedq_champion": lambda: sparse_search_index(
                spark, sp_idx, spq, 10, per_term_cap=64
            ),
            # round-10 anchors — the query-understanding family.
            # two-stage champion+rescore: candidates bounded at B rows
            # per term, rescore bounded by the candidate set — expect
            # ~flat like the champion row (one extra term-IN scan).
            "sparse_fixedq_rescore": lambda: sparse_search_index(
                spark, sp_idx, spq, 10, per_term_cap=64,
                rescore_candidates=True,
            ),
            # fuzzy expansion: the vocabulary aggregate is the one
            # corpus-growth term (copy-distinct tokens make |V| grow
            # ~linearly with copies here — worst case; real vocab grows
            # ~Heaps-sublinearly); levenshtein is map-side over it.
            # Expect ~linear dominated by the distinct aggregate.
            "fuzzy_fixedq_bm25": lambda: _fz(
                docs,
                lexq.select(
                    "query_id",
                    F.transform(
                        "qterms", lambda t: F.concat(t, F.lit("x"))
                    ).alias("qterms"),
                ),
                10,
            ),
            # autocomplete: same vocabulary aggregate + broadcast
            # startswith — expect the same growth class as fuzzy.
            "complete_fixedq": lambda: _cmpl(
                _cv(docs),
                docs.filter(F.col("doc_id").isin(_SCALE_QUERY_IDS)).select(
                    F.col("doc_id").alias("prefix_id"),
                    F.substring(
                        F.element_at(_tok("text"), 1), 1, 3
                    ).alias("prefix"),
                ),
                5,
            ),
            # field collapsing downstream of the INDEXED lexical leg:
            # the collapse itself touches hits + a 2-column pruned
            # attribute scan — expect ~flat + the pruned-scan slope.
            "collapse_fixedq_indexed": lambda: _clps(
                bm25_search_index(spark, idx, lexq, 20), docs, "source", 10
            ),
            # round-10 anchors (cont.) — MLT / function scoring /
            # Matryoshka / decontamination.
            #
            # more-like-this, from-scratch form: pays the corpus
            # encode (tokenize + tf + df) like bm25_topk — expect
            # ~linear in that growth class; the selection window and
            # second pass are seed/vocabulary-bounded.
            "mlt_fixedq_bm25": lambda: _mlt(
                docs,
                docs.filter(F.col("doc_id").isin(_SCALE_QUERY_IDS)).select(
                    F.col("doc_id").alias("seed_id")
                ),
                10, max_query_terms=8, min_df=2,
            ),
            # function scoring downstream of the INDEXED lexical leg:
            # hits are k-bounded; the factor side is a 2-column pruned
            # corpus scan semi-restricted by broadcast hit ids —
            # expect ~flat + the pruned-scan slope (collapse's class).
            "function_score_fixedq": lambda: _fsc(
                bm25_search_index(spark, idx, lexq, 20).select(
                    "query_id", "id", "score"
                ),
                _fvf(docs, "n_chars"),
                10,
            ),
            # Matryoshka two-stage: the coarse pass scans the corpus
            # at d'/d of the flops (no materialized prefix here — the
            # from-scratch form), rescore candidate-bounded — expect
            # ~linear with a slope well under knn_fixedq_expr's.
            "matryoshka_fixedq": lambda: _mrl(
                emb, q, 10, d_prime=16, shortlist=50
            ),
            # decontamination audit against a FIXED benchmark: the
            # corpus shingle explode is the linear term; the benchmark
            # side is broadcast and constant — expect ~linear,
            # map-side dominated (no corpus self-join exists).
            "contamination_fixedq": lambda: _contam(
                docs,
                docs.filter(F.col("doc_id").isin(_SCALE_QUERY_IDS)).select(
                    F.col("doc_id").alias("bench_id"),
                    F.array_join(F.slice(_tok("text"), 1, 10), " ").alias(
                        "text"
                    ),
                ),
                n=3,
            ),
            # significant terms over the INDEXED leg's k-bounded hits:
            # foreground is match-set-bounded; the one corpus-growth
            # term is the background df aggregate, semi-restricted to
            # the (fixed-query, size-invariant) foreground vocabulary
            # — expect ~linear in the tokenize, like bm25_topk's class.
            "sig_terms_fixedq": lambda: _sig(
                bm25_search_index(spark, idx, lexq, 20).select(
                    "query_id", "id"
                ),
                docs,
                5,
            ),
            # per-match-set histogram downstream of the indexed leg:
            # hits k-bounded + a 1-column pruned attribute scan —
            # collapse/function_score's ~flat class.
            "hist_fixedq_hits": lambda: _histh(
                bm25_search_index(spark, idx, lexq, 20).select(
                    "query_id", "id"
                ),
                docs,
                "n_chars",
                width=250.0,
            ),
            # round-11 anchors.  percolate: fixed copy-0 registry vs
            # the whole corpus — map-side tokenize + broadcast joins,
            # expect ~linear (contamination's class).
            "percolate_fixedreg": lambda: _perc(
                docs,
                docs.filter(F.col("doc_id").isin(_SCALE_QUERY_IDS)).select(
                    F.col("doc_id").alias("query_id"),
                    F.slice(_tok("text"), 1, 4).alias("qterms"),
                ),
                min_match=2,
            ),
            # spell suggester: expansion target is the vocabulary
            # (copy-distinct tokens make it grow linearly HERE; real
            # corpora grow ~Heaps) — fuzzy_fixedq_bm25's class.
            "spell_fixedq": lambda: _spellsug(
                _cv(docs),
                lexq.select(
                    "query_id",
                    F.transform(
                        "qterms", lambda t: F.concat(t, F.lit("x"))
                    ).alias("qterms"),
                ),
                max_edits=2,
                top_n=3,
            ),
            # analyzed retrieval: bm25_topk's corpus-linear class plus
            # the stop+stem expression chain — the anchor shows the
            # analyzer adds expression-only cost, no new exchange.
            "stemmed_fixedq_bm25": lambda: _bm25(
                docs.withColumn(
                    "text", _antext("text", stopwords=_SW, stem=True)
                ),
                lexq,
                10,
            ),
            # metric aggregations over events: one hash aggregate with
            # map-side combine (stats), the GK sketch (serving
            # percentile tier), and the partial-top-k window — all
            # expected ~linear in the events mass.
            "agg_fixedq_stats": lambda: _xstats(
                ev, "value", by=("event_type",)
            ),
            "agg_fixedq_pctl_approx": lambda: _pctl(
                ev, "value", (50.0, 90.0, 99.0),
                by=("event_type",), exact=False,
            ),
            "agg_fixedq_tophits": lambda: _thits(
                ev.select("event_type", "event_id", "value"),
                3, "value", by=("event_type",), tie_col="event_id",
            ),
            # round-12 anchors.  Sloppy phrase (slop=2): the positions
            # explode is one row per corpus TOKEN (the positional-
            # intersection class, ~linear); the start explode is the
            # constant slop+1, never data-sized.
            "slop_fixedq_phrase": lambda: _pslop(
                docs,
                docs.filter(F.col("doc_id").isin(_SCALE_QUERY_IDS)).select(
                    F.col("doc_id").alias("query_id"),
                    F.slice(_tok("text"), 2, 3).alias("phrase"),
                ),
                5, slop=2,
            ),
            # full request (query + aggs): the BM25 tokenize is the
            # corpus-linear term; the copy-distinct up-scaler keeps the
            # fixed term's match set in copy 0, so the match-set-
            # restricted aggregates stay constant-sized — expect
            # bm25_topk's growth class, no new exchange class.
            "request_fixedq_aggs": lambda: _sreq(
                docs,
                {"query": {"match": {"terms": ["spark"]}},
                 "aggs": {"by_source": {
                     "terms": {"field": "source"},
                     "aggs": {"avg_chars": {"avg": {"field": "n_chars"}}},
                 }}},
            )["aggregations"]["by_source"],
            # rescore: first pass = bm25's corpus-linear class; the
            # second (phrase) pass tokenizes ONLY the k-bounded window
            # — expect bm25_topk's class with the window cost constant.
            "rescore_fixedq_phrase": lambda: _sreq(
                docs,
                {"query": {"match": {"terms": ["spark"]}}, "size": 10,
                 "rescore": {"window_size": 30, "query": {
                     "rescore_query": {"match_phrase": {
                         "terms": ["table", "hash"], "slop": 1}},
                     "rescore_query_weight": 0.5}}},
            )["hits"],
            # knn + query hybrid: the exact knn leg's scan is the
            # knn_fixedq_expr class, the text leg bm25's; fusion adds
            # one id-keyed hash aggregate over leg-bounded rows.
            "knnhybrid_fixedq": lambda: _sreq(
                docs,
                {"query": {"match": {"terms": ["spark"]}}, "size": 10,
                 "knn": {"query_vector": _hyvec, "k": 20, "boost": 2.0}},
                vectors=emb,
            )["hits"],
            # batch msearch (round 13): 3 heterogeneous requests
            # through ONE multi-query plan — the corpus tokenizes once
            # for admissibility and once for scoring regardless of N,
            # so expect bm25's corpus-linear class, NOT 3× it.
            "msearch_fixedq_batch3": lambda: _msearch(
                docs,
                [
                    {"query": {"match": {"terms": ["vector", "stream"]}},
                     "size": 10},
                    {"query": {"bool": {"must": ["spark", "data"],
                                        "must_not": ["join"]}}, "size": 5},
                    {"query": {"bool": {"should": ["scan", "sort",
                                                   "filter"],
                                        "minimum_should_match": 2}},
                     "size": 8},
                ],
            )["hits"],
            # pre-filtered knn (round 13): the label predicate is
            # map-side on the vector frame — the knn leg keeps
            # knn_fixedq_expr's scan class with ~10× less candidate
            # mass past the filter.
            "knnfiltered_fixedq": lambda: _sreq(
                docs,
                {"query": {"match": {"terms": ["spark"]}}, "size": 10,
                 "knn": {"query_vector": _hyvec, "k": 20, "boost": 2.0,
                         "filter": [{"term": {"label": 3}}]}},
                vectors=emb,
            )["hits"],
        }

    out: dict = {
        "copies": SCALE_COPIES,
        "generate_sec": gen_s,
        "fixed_query_count": len(_SCALE_QUERY_IDS),
        "queries": {},
    }

    def record(name: str, tb: float, ts: float) -> None:
        ratio = round(ts / tb, 2) if tb > 0 else float("inf")
        verdict = "~linear" if ratio <= 2 * SCALE_COPIES else "SUPERLINEAR"
        row = {
            "base_sec": tb,
            "scaled_sec": ts,
            "ratio": ratio,
            "verdict": verdict,
        }
        if tb < 1.0 and ratio < 1.0:
            # a scaled run "faster" than its base is a host-noise
            # artifact of a sub-second denominator, not a real
            # sublinearity claim (VERDICT r10) — flag it so readers
            # don't quote the ratio
            row["noise_caveat"] = "sub-second base; ratio unreliable"
        elif ratio < 0.8:
            # a 10x-data run measured meaningfully FASTER than base on
            # a multi-second denominator is cache/JIT state, never
            # scaling (VERDICT r11 item 7: knn_fixedq_numpy's 0.42 on a
            # 1.9-2.8 s base escaped the sub-second rule) — stamp any
            # sub-0.8 speedup regardless of base
            row["noise_caveat"] = (
                f"speedup at {SCALE_COPIES}x data; host/JIT state, "
                "ratio unreliable"
            )
        out["queries"][name] = row

    for name in rows:
        record(
            name,
            once(lambda: qs[name](spark, sf_dir)),
            once(lambda: qs[name](spark, dst)),
        )
    base_ops, scaled_ops = vector_ops(sf_dir), vector_ops(dst)
    for name in base_ops:
        record(name, once(base_ops[name]), once(scaled_ops[name]))
    spark.stop()
    return out


def _measure_maintenance(sf_dir: str) -> dict:
    """O(corpus) vs O(Δ) lexical index maintenance — the write-path
    number that decides the indexing strategy at 100 TB: a compacted
    write can either REBUILD the posting index (re-tokenize the whole
    corpus: ``write_posting_index``) or fold the mutation batch into
    the LWW merge-on-read store (``MutablePostingIndexStore.apply_log``,
    O(batch)).  Also times one query against each so the merge-on-read
    overhead is on the record.  The store init (one corpus scan, EVER)
    is reported separately — it is not a per-write cost."""
    import shutil
    import tempfile
    import time

    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from distributed_vector_search_system_spark.operators.retrieval import (
        queries_from_docs,
    )
    from distributed_vector_search_system_spark.session import get_spark
    from distributed_vector_search_system_spark.sources.posting_index import (
        MutablePostingIndexStore,
        bm25_search_index,
        write_posting_index,
    )
    from distributed_vector_search_system_spark.tables import load_table

    spark = get_spark(app_name="dvss-bench-maint")
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    root = tempfile.mkdtemp(prefix="dvss_bench_maint_")

    def _qtimes(fn, repeats: int = 5) -> tuple[float, float]:
        """(cold, steady) for one query: first run is the cold number,
        steady is the MIN of the remaining repeats — the same estimator
        the headline uses.  Single-shot timings put one GC pause or
        steal spike into one load-bearing number (r09's committed
        1.56x/1.86x dirty-read figures were exactly that artifact;
        VERDICT r09 item 6).  Five repeats, not three: the dirty/clean
        comparisons divide sub-second numbers, and min-of-2 still let
        the RATIO swing ±40% across otherwise-calm runs (observed
        1.4-2.0x for the same code in round 10)."""
        out = []
        for _ in range(max(repeats, 2)):
            t1 = time.perf_counter()
            fn()
            out.append(time.perf_counter() - t1)
        return round(out[0], 4), round(min(out[1:]), 4)

    try:
        # warm the session so neither contender pays JVM/JIT startup
        docs.write.format("noop").mode("overwrite").save()
        # ~0.3% of the corpus mutates per cadence: replacements + deletes
        ups = docs.filter(F.col("doc_id") % 600 == 1)
        dels = docs.filter(F.col("doc_id") % 600 == 2).select("doc_id")
        w = Window.orderBy("doc_id")  # ~200 rows — the tiny-log sort is fine
        log = (
            ups.select("doc_id", "text", F.lit("upsert").alias("op"))
            .unionByName(
                dels.select(
                    "doc_id", F.lit(None).cast("string").alias("text"),
                    F.lit("delete").alias("op"),
                )
            )
            .withColumn("seq", F.row_number().over(w).cast("long"))
        )
        batch_rows = log.count()

        t0 = time.perf_counter()
        write_posting_index(docs, os.path.join(root, "rebuilt"))
        rebuild_s = round(time.perf_counter() - t0, 4)

        store = MutablePostingIndexStore(os.path.join(root, "store"))
        t0 = time.perf_counter()
        store.init_base(docs)
        init_s = round(time.perf_counter() - t0, 4)
        t0 = time.perf_counter()
        store.apply_log(log)
        apply_s = round(time.perf_counter() - t0, 4)

        q = queries_from_docs(docs, F.col("doc_id") % 100 == 7)
        t0 = time.perf_counter()
        bm25_search_index(
            spark, os.path.join(root, "rebuilt"), q, 10
        ).write.format("noop").mode("overwrite").save()
        rebuilt_q_s = round(time.perf_counter() - t0, 4)
        # cold = first read (pays the one-off per-write stats memo +
        # plan codegen); steady = min over repeats — what every further
        # read between writes costs, the number the dirty-read-tax
        # contract is about (VERDICT r07 item 3, r09 item 6)
        store_q_s, store_q_steady_s = _qtimes(
            lambda: store.search(spark, q, 10)
            .write.format("noop").mode("overwrite").save()
        )
        # compact() folds the delta through the arbiter into a clean
        # generation; reads then skip the LWW joins (the _DIRTY gate),
        # so the merge-on-read tax lasts exactly one compaction cadence
        t0 = time.perf_counter()
        store.compact(spark)
        compact_s = round(time.perf_counter() - t0, 4)
        store_cq_s, store_cq_steady_s = _qtimes(
            lambda: store.search(spark, q, 10)
            .write.format("noop").mode("overwrite").save()
        )
        # round 9: the SPARSE store's same write-path decision — a
        # compacted write either re-encodes + rewrites the whole
        # term-clustered index (write_sparse_index) or folds the
        # mutation batch into the merge-on-read store (apply_log,
        # O(batch); weights travel with the mutations so the apply
        # does zero encoding).  One dirty + one compacted read each,
        # mirroring the lexical numbers above.
        from distributed_vector_search_system_spark.functions.text import (
            tokens as _tok9,
        )
        from distributed_vector_search_system_spark.operators.sparse import (
            collect_doc_vectors,
            sparse_encode,
            sparse_encode_queries,
        )
        from distributed_vector_search_system_spark.sources.sparse_index import (
            MutableSparseIndexStore,
            write_sparse_index,
        )

        t0 = time.perf_counter()
        write_sparse_index(docs, os.path.join(root, "sp_rebuilt"))
        sp_rebuild_s = round(time.perf_counter() - t0, 4)
        sstore = MutableSparseIndexStore(os.path.join(root, "sp_store"))
        t0 = time.perf_counter()
        sstore.init_base(collect_doc_vectors(sparse_encode(docs)))
        sp_init_s = round(time.perf_counter() - t0, 4)
        sp_log = (
            ups.select(
                F.col("doc_id").alias("id"),
                F.lit("upsert").alias("op"),
                _tok9("text").alias("terms"),
            )
            .withColumn(
                "weights",
                F.transform("terms", lambda _: F.lit(1.0)),
            )
            .unionByName(
                dels.select(
                    F.col("doc_id").alias("id"),
                    F.lit("delete").alias("op"),
                    F.lit(None).cast("array<string>").alias("terms"),
                    F.lit(None).cast("array<double>").alias("weights"),
                )
            )
            .withColumn("seq", F.row_number().over(Window.orderBy("id")).cast("long"))
        )
        t0 = time.perf_counter()
        sstore.apply_log(sp_log.select("seq", "op", "id", "terms", "weights"))
        sp_apply_s = round(time.perf_counter() - t0, 4)
        sq = sparse_encode_queries(
            docs.filter(F.col("doc_id") % 100 == 7).select(
                F.col("doc_id").alias("query_id"),
                F.array_join(F.slice(_tok9("text"), 1, 8), " ").alias("qtext"),
            )
        )
        sp_dirty_q_s, sp_dirty_q_steady_s = _qtimes(
            lambda: sstore.search(spark, sq, 10)
            .write.format("noop").mode("overwrite").save()
        )
        t0 = time.perf_counter()
        sstore.compact(spark)
        sp_compact_s = round(time.perf_counter() - t0, 4)
        sp_clean_q_s, sp_clean_q_steady_s = _qtimes(
            lambda: sstore.search(spark, sq, 10)
            .write.format("noop").mode("overwrite").save()
        )
        # --- the tax AT SCALE (round 10, VERDICT r09 item 6): the
        # sf0.1 ratio is dominated by a CONSTANT per-read stage-launch
        # overhead over a sub-second clean query, so it swings with the
        # denominator (r08 read 1.36x, a calm r10 re-measure 1.69x with
        # BOTH absolutes improved).  Measuring the same dirty-vs-clean
        # pair at 10x the corpus pins the analysis empirically: the
        # constant vanishes relative to the scan and the ratio falls
        # toward 1 (~1.04x measured).  Reuses the scale section's
        # cached fixture; skipped (empty keys) when it is absent.
        scaled_dirty_steady = scaled_clean_steady = None
        scaled_sp_dirty_steady = scaled_sp_clean_steady = None
        scale_dir = os.path.join(
            os.path.dirname(os.path.abspath(__file__)),
            ".scale_cache",
            f"{os.path.basename(os.path.normpath(sf_dir))}x{SCALE_COPIES}",
        )
        if os.environ.get(
            "SPARK_GRAFT_BENCH_MAINT_SCALE", "1"
        ) != "0" and os.path.exists(os.path.join(scale_dir, "_SCALE_OK")):
            xdocs = load_table(spark, scale_dir, "documents").select(
                "doc_id", "text"
            )
            xups = xdocs.filter(F.col("doc_id") % 600 == 1)
            xdels = xdocs.filter(F.col("doc_id") % 600 == 2).select("doc_id")
            xlog = (
                xups.select("doc_id", "text", F.lit("upsert").alias("op"))
                .unionByName(
                    xdels.select(
                        "doc_id",
                        F.lit(None).cast("string").alias("text"),
                        F.lit("delete").alias("op"),
                    )
                )
                .withColumn(
                    "seq", F.row_number().over(Window.orderBy("doc_id")).cast("long")
                )
            )
            xstore = MutablePostingIndexStore(os.path.join(root, "xstore"))
            xstore.init_base(xdocs)
            xstore.apply_log(xlog)
            xq = queries_from_docs(xdocs, F.col("doc_id") % 1000 == 7)
            _, scaled_dirty_steady = _qtimes(
                lambda: xstore.search(spark, xq, 10)
                .write.format("noop").mode("overwrite").save()
            )
            xstore.compact(spark)
            _, scaled_clean_steady = _qtimes(
                lambda: xstore.search(spark, xq, 10)
                .write.format("noop").mode("overwrite").save()
            )
            # sparse sibling at 10x — the same constant-overhead
            # question for the fourth store family (its sf0.1 ratio
            # ~2x is the largest of the stores; if it is the same
            # per-read constant, it must fall at 10x like lexical's)
            xenc = collect_doc_vectors(sparse_encode(xdocs))
            xsstore = MutableSparseIndexStore(os.path.join(root, "xsp"))
            xsstore.init_base(xenc)
            xsp_log = (
                xups.select(
                    F.col("doc_id").alias("id"),
                    F.lit("upsert").alias("op"),
                    _tok9("text").alias("terms"),
                )
                .withColumn(
                    "weights", F.transform("terms", lambda _: F.lit(1.0))
                )
                .unionByName(
                    xdels.select(
                        F.col("doc_id").alias("id"),
                        F.lit("delete").alias("op"),
                        F.lit(None).cast("array<string>").alias("terms"),
                        F.lit(None).cast("array<double>").alias("weights"),
                    )
                )
                .withColumn(
                    "seq",
                    F.row_number().over(Window.orderBy("id")).cast("long"),
                )
            )
            xsstore.apply_log(
                xsp_log.select("seq", "op", "id", "terms", "weights")
            )
            xsq = sparse_encode_queries(
                xdocs.filter(F.col("doc_id") % 1000 == 7).select(
                    F.col("doc_id").alias("query_id"),
                    F.array_join(F.slice(_tok9("text"), 1, 8), " ").alias(
                        "qtext"
                    ),
                )
            )
            _, scaled_sp_dirty_steady = _qtimes(
                lambda: xsstore.search(spark, xsq, 10)
                .write.format("noop").mode("overwrite").save()
            )
            xsstore.compact(spark)
            _, scaled_sp_clean_steady = _qtimes(
                lambda: xsstore.search(spark, xsq, 10)
                .write.format("noop").mode("overwrite").save()
            )
    finally:
        shutil.rmtree(root, ignore_errors=True)
        spark.stop()
    out = {
        "mutation_batch_rows": batch_rows,
        "full_rebuild_sec": rebuild_s,
        "store_delta_apply_sec": apply_s,
        "store_init_once_sec": init_s,
        "store_compact_sec": compact_s,
        "rebuilt_index_query_sec": rebuilt_q_s,
        "store_merge_on_read_query_sec": store_q_s,
        "store_merge_on_read_query_steady_sec": store_q_steady_s,
        "store_compacted_query_sec": store_cq_s,
        "store_compacted_query_steady_sec": store_cq_steady_s,
        "dirty_over_compacted_steady": round(
            store_q_steady_s / store_cq_steady_s, 3
        ),
        "sparse_full_rebuild_sec": sp_rebuild_s,
        "sparse_store_delta_apply_sec": sp_apply_s,
        "sparse_store_init_once_sec": sp_init_s,
        "sparse_store_compact_sec": sp_compact_s,
        "sparse_store_dirty_query_sec": sp_dirty_q_s,
        "sparse_store_dirty_query_steady_sec": sp_dirty_q_steady_s,
        "sparse_store_compacted_query_sec": sp_clean_q_s,
        "sparse_store_compacted_query_steady_sec": sp_clean_q_steady_s,
        "sparse_dirty_over_compacted_steady": round(
            sp_dirty_q_steady_s / sp_clean_q_steady_s, 3
        ),
    }
    if scaled_dirty_steady is not None:
        out["scaled_store_dirty_query_steady_sec"] = scaled_dirty_steady
        out["scaled_store_compacted_query_steady_sec"] = scaled_clean_steady
        out["scaled_dirty_over_compacted_steady"] = round(
            scaled_dirty_steady / scaled_clean_steady, 3
        )
        out["scaled_copies"] = SCALE_COPIES
    if scaled_sp_dirty_steady is not None:
        out["scaled_sparse_dirty_query_steady_sec"] = scaled_sp_dirty_steady
        out["scaled_sparse_compacted_query_steady_sec"] = (
            scaled_sp_clean_steady
        )
        out["scaled_sparse_dirty_over_compacted_steady"] = round(
            scaled_sp_dirty_steady / scaled_sp_clean_steady, 3
        )
    return out


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1).rstrip(".")) if m else -1.0

    if os.environ.get(_WORKER_ENV) == "recall":
        print(json.dumps(_measure_recall(sf_dir)))
        return
    if os.environ.get(_WORKER_ENV) == "d768":
        print(json.dumps(_measure_d768()))
        return
    if os.environ.get(_WORKER_ENV) == "scale":
        print(json.dumps(_measure_scale(sf_dir)))
        return
    if os.environ.get(_WORKER_ENV) == "maint":
        print(json.dumps(_measure_maintenance(sf_dir)))
        return
    if os.environ.get(_WORKER_ENV):
        print(json.dumps(_measure_once(sf_dir)))
        return

    repeats = max(int(os.environ.get("SPARK_GRAFT_BENCH_REPEATS", "3")), 1)

    # host-state capture (round 13, VERDICT r12 item 7): the headline
    # has drifted ±15% across driver runs with bit-identical code, and
    # "host state" was asserted, not measured.  Record 1-min loadavg
    # and a concurrent-Spark-JVM census at run start and end so the
    # next drift is attributable from the artifact alone: a calm run
    # shows load ≲ a few cores and zero foreign Spark processes.
    def _host_state() -> dict:
        try:
            load = [round(x, 2) for x in os.getloadavg()]
        except OSError:  # pragma: no cover - non-POSIX
            load = []
        procs = 0
        try:
            me = os.getpid()
            for pid in os.listdir("/proc"):
                if not pid.isdigit() or int(pid) == me:
                    continue
                try:
                    with open(f"/proc/{pid}/cmdline", "rb") as f:
                        cmd = f.read().decode("utf-8", "replace")
                except OSError:
                    continue
                if "org.apache.spark" in cmd or "pyspark-shell" in cmd:
                    procs += 1
        except OSError:  # pragma: no cover - no /proc
            procs = -1
        return {"loadavg_1_5_15": load, "concurrent_spark_jvms": procs}

    host_pre = _host_state()

    def _one_run() -> dict:
        proc = subprocess.run(
            [sys.executable, os.path.abspath(__file__)],
            env={**os.environ, _WORKER_ENV: "1"},
            capture_output=True,
            text=True,
            check=True,
        )
        line = [l for l in proc.stdout.splitlines() if l.strip().startswith("{")][-1]
        return json.loads(line)

    runs: list[dict] = [_one_run() for _ in range(repeats)]
    # adaptive noise gate (VERDICT r09 item 5): two consecutive rounds
    # committed artifacts from contended hosts (r9 spread 2.262).  When
    # the cold-total spread across repeats exceeds the gate, escalate
    # 3→5 repeats so the per-query min has more shots at a calm window,
    # and RECORD the escalation — a flagged artifact is honest even
    # when the host never calms down.
    _NOISE_GATE = float(os.environ.get("SPARK_GRAFT_BENCH_NOISE_GATE", "1.5"))
    _MAX_REPEATS = max(
        int(os.environ.get("SPARK_GRAFT_BENCH_MAX_REPEATS", "5")), repeats
    )

    def _spread(rs: list[dict]) -> float:
        totals = [sum(r["cold"][n] for n in rs[0]["headline"]) for r in rs]
        return max(totals) / min(totals)

    noise_escalated = False
    while _spread(runs) > _NOISE_GATE and len(runs) < _MAX_REPEATS:
        noise_escalated = True
        runs.append(_one_run())
    repeats = len(runs)

    def _section(mode: str) -> dict:
        proc = subprocess.run(
            [sys.executable, os.path.abspath(__file__)],
            env={**os.environ, _WORKER_ENV: mode},
            capture_output=True,
            text=True,
            check=True,
        )
        line = [l for l in proc.stdout.splitlines() if l.strip().startswith("{")][-1]
        return json.loads(line)

    recall_section: dict = {}
    if os.environ.get("SPARK_GRAFT_BENCH_RECALL", "1") != "0":
        recall_section = _section("recall")
    d768_section: dict = {}
    if os.environ.get("SPARK_GRAFT_BENCH_D768", "1") != "0":
        d768_section = _section("d768")
    scale_section: dict = {}
    if os.environ.get("SPARK_GRAFT_BENCH_SCALE", "1") != "0":
        scale_section = _section("scale")
    maint_section: dict = {}
    if os.environ.get("SPARK_GRAFT_BENCH_MAINT", "1") != "0":
        maint_section = _section("maint")

    headline, fast = runs[0]["headline"], runs[0]["fast"]
    retrieval = runs[0].get("retrieval", [])
    cold = _agg_by_query(runs, "cold", headline, min)
    steady = _agg_by_query(runs, "steady", headline, min)
    fast_cold = _agg_by_query(runs, "cold", fast, min)
    fast_steady = _agg_by_query(runs, "steady", fast, min)
    retrieval_cold = _agg_by_query(runs, "cold", retrieval, min)
    retrieval_steady = _agg_by_query(runs, "steady", retrieval, min)
    run_totals = [round(sum(r["cold"][n] for n in headline), 4) for r in runs]
    steady_run_totals = [
        round(sum(r["steady"][n] for n in headline), 4) for r in runs
    ]
    # Full per-section detail goes to a FILE; the driver captures only
    # the last ~2000 chars of stdout, and round 5's single fat JSON line
    # outgrew that window, losing the round's independent perf record
    # (VERDICT r05 item 1).  The final printed line is a compact summary
    # that must stay comfortably under the window.
    build_names = sorted(runs[0].get("builds", {}))
    detail = {
        "tier_build_sec": {
            n: round(min(r["builds"][n] for r in runs), 4) for n in build_names
        },
        "fast_tier_queries": fast_cold,
        "fast_tier_steady_queries": fast_steady,
        "retrieval_queries": retrieval_cold,
        "retrieval_steady_queries": retrieval_steady,
        "median_queries": _agg_by_query(runs, "cold", headline, statistics.median),
        "median_steady_queries": _agg_by_query(
            runs, "steady", headline, statistics.median
        ),
        "recall_vs_nprobe": recall_section,
        "d768": d768_section,
        "scale_anchor": scale_section,
        "lexical_maintenance": maint_section,
        "per_run_cold_totals": run_totals,
        "per_run_steady_totals": steady_run_totals,
        "host_state": {"pre": host_pre, "post": _host_state()},
        "repeats": repeats,
        "sf": sf,
        "master": runs[0].get("master"),
        "default_parallelism": runs[0].get("parallelism"),
        "sf_dir": sf_dir,
        "scaling_probe_runs": [r.get("scaling_probe") for r in runs],
    }
    detail_path = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "BENCH_DETAIL.json"
    )
    with open(detail_path, "w", encoding="utf-8") as f:
        json.dump(detail, f, indent=1)
    summary = {
        "metric": "headline_queries_total_sec",
        "value": round(sum(cold.values()), 4),
        "unit": "sec",
        "estimator": "per-query min over repeats",
        "queries": cold,
        "steady_state_total_sec": round(sum(steady.values()), 4),
        "steady_state_queries": steady,
        "fast_tier_total_sec": round(sum(fast_cold.values()), 4),
        "fast_tier_steady_total_sec": round(sum(fast_steady.values()), 4),
        "retrieval_total_sec": round(sum(retrieval_cold.values()), 4),
        "retrieval_steady_total_sec": round(sum(retrieval_steady.values()), 4),
        "host_noise_spread": round(max(run_totals) / min(run_totals), 3),
        "noise_escalated": noise_escalated,
        "host_load_1m_pre": (host_pre["loadavg_1_5_15"] or [None])[0],
        "host_spark_jvms_pre": host_pre["concurrent_spark_jvms"],
        "repeats": repeats,
        "sf": sf,
        # resolved-execution echo + CPU-scaling probe (round 14, VERDICT
        # r13 item 2): the artifact states which master/core count it
        # ran on, and scaling_probe_sec is the one row built to be
        # compute-bound and partition-spread — its low-core/high-core
        # ratio is the parallelism signal the overhead-bound sf0.1
        # queries cannot provide.  Additions only; every pre-existing
        # key is unchanged.
        "master": runs[0].get("master"),
        "cpus_env": os.environ.get("SPARK_GRAFT_CPUS", "32"),
        "scaling_probe_sec": (
            round(
                min(
                    r["scaling_probe"]
                    for r in runs
                    if r.get("scaling_probe") is not None
                ),
                4,
            )
            if any(r.get("scaling_probe") is not None for r in runs)
            else None
        ),
        "detail_file": "BENCH_DETAIL.json",
    }
    line = json.dumps(summary)
    assert len(line) < 1800, f"summary line {len(line)} chars — shrink it"
    print(line)


if __name__ == "__main__":
    sys.exit(main())
