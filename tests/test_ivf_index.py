"""Persisted IVF index (sources/ivf_index.py): cell-partitioned storage,
physically pruned probes."""

from __future__ import annotations

from pyspark.sql import functions as F

from distributed_vector_search_system_spark.operators.clustering import kmeans_fit
from distributed_vector_search_system_spark.operators.similarity import ann_ivf_topk
from distributed_vector_search_system_spark.sources.ivf_index import (
    search_ivf_index,
    write_ivf_index,
)
from distributed_vector_search_system_spark.tables import load_table


def _setup(spark, sf, tmp_path, num_cells=8):
    emb = load_table(spark, sf, "embeddings")
    centroids, _ = kmeans_fit(emb, num_cells, max_iterations=3)
    path = str(tmp_path / "ivf")
    write_ivf_index(emb, path, centroids)
    q = emb.filter(F.col("vec_id") % 60 == 3).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qvec")
    )
    return emb, centroids, path, q


def test_index_search_matches_in_memory_ivf(spark, sf_smoke, tmp_path):
    """The persisted-index search must return exactly what the in-memory
    IVF plan returns for the same centroids and n_probe."""
    emb, centroids, path, q = _setup(spark, sf_smoke, tmp_path)
    got = {
        (r.query_id, r.rank): (r.id, round(r.distance, 6))
        for r in search_ivf_index(spark, path, q, 5, centroids, n_probe=3).collect()
    }
    want = {
        (r.query_id, r.rank): (r.id, round(r.distance, 6))
        for r in ann_ivf_topk(emb, q, 5, centroids=centroids, n_probe=3).collect()
    }
    assert got == want and got


def test_probes_prune_partitions(spark, sf_smoke, tmp_path):
    """cell_id must appear in the scan's PartitionFilters, and a pruned
    probe must read strictly fewer files than the full index."""
    emb, centroids, path, q = _setup(spark, sf_smoke, tmp_path)
    one_q = q.limit(1)
    probed = search_ivf_index(spark, path, one_q, 5, centroids, n_probe=2)
    plan = probed._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    )
    pf = [l for l in plan.splitlines() if "PartitionFilters" in l]
    assert pf and any("cell_id" in l for l in pf), plan

    import glob

    total_files = len(glob.glob(path + "/cell_id=*/*.parquet"))
    pruned = spark.read.parquet(path).filter(F.col("cell_id").isin([0, 1]))
    read_files = pruned.select(F.input_file_name()).distinct().count()
    assert read_files < total_files



import pytest


@pytest.fixture(scope="module")
def cosine_ivf(spark, sf_oracle, tmp_path_factory):
    """Shared cosine-tier artifacts: normalized-space centroids plus a
    replicas=1 and a replicas=2 index over the same corpus — built once
    per module (review r06: the three cosine tests each re-ran
    kmeans_fit and rebuilt identical indexes)."""
    from distributed_vector_search_system_spark.functions.distance import (
        l2_normalize,
    )
    from distributed_vector_search_system_spark.sources.ivf_index import (
        write_cosine_ivf_index,
    )

    emb = load_table(spark, sf_oracle, "embeddings")
    norm = emb.withColumn("embedding", l2_normalize("embedding"))
    cents, _ = kmeans_fit(norm, 8, max_iterations=5)
    root = tmp_path_factory.mktemp("cosine_ivf")
    p1 = str(root / "r1")
    write_cosine_ivf_index(emb, p1, cents)
    p2 = str(root / "r2")
    write_cosine_ivf_index(emb, p2, cents, replicas=2)
    return {"emb": emb, "cents": cents, "r1": p1, "r2": p2}


def test_cosine_ivf_full_probe_equals_cosine_topk(spark, cosine_ivf):
    """At full probe coverage the cosine IVF tier must return exactly
    cosine_topk's rows: normalized-space L2 rank == cosine rank, and
    cos = 1 - d^2/2 recovers the exact similarity (to float noise)."""
    from distributed_vector_search_system_spark.operators.similarity import (
        cosine_topk,
    )
    from distributed_vector_search_system_spark.sources.ivf_index import (
        search_cosine_ivf_index,
    )

    emb, cents = cosine_ivf["emb"], cosine_ivf["cents"]
    q = emb.filter(F.col("vec_id") % 100 == 7).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qvec")
    )
    got = search_cosine_ivf_index(
        spark, cosine_ivf["r1"], q, 5, cents, n_probe=len(cents)
    ).collect()
    want = {
        (r["query_id"], r["id"], r["rank"]): r["cosine"]
        for r in cosine_topk(emb, q, 5).collect()
    }
    assert {(r["query_id"], r["id"], r["rank"]) for r in got} == set(want)
    for r in got:
        assert abs(r["cosine"] - want[(r["query_id"], r["id"], r["rank"])]) < 1e-9


def test_cosine_ivf_partial_probe_subset_and_filter(spark, cosine_ivf):
    """Partial probes return plausible cosine rows (subset semantics),
    and filter_ids composes: every result id is admissible and equals
    the filtered-corpus full-probe answer at full coverage."""
    from distributed_vector_search_system_spark.operators.similarity import (
        cosine_topk,
    )
    from distributed_vector_search_system_spark.sources.ivf_index import (
        search_cosine_ivf_index,
    )

    emb, cents, path = cosine_ivf["emb"], cosine_ivf["cents"], cosine_ivf["r1"]
    q = emb.filter(F.col("vec_id") % 100 == 7).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qvec")
    )
    partial = search_cosine_ivf_index(spark, path, q, 5, cents, n_probe=2)
    for r in partial.collect():
        assert -1.0 - 1e-9 <= r["cosine"] <= 1.0 + 1e-9

    ids = emb.filter(F.col("vec_id") % 2 == 0).select(
        F.col("vec_id").alias("id")
    )
    got = {
        (r["query_id"], r["id"], r["rank"])
        for r in search_cosine_ivf_index(
            spark, path, q, 5, cents, n_probe=len(cents), filter_ids=ids
        ).collect()
    }
    femb = emb.filter(F.col("vec_id") % 2 == 0)
    want = {
        (r["query_id"], r["id"], r["rank"])
        for r in cosine_topk(femb, q, 5).collect()
    }
    assert got == want


def test_cosine_ivf_replicated_full_probe_equals_cosine_topk(spark, cosine_ivf):
    """Replication composes with the cosine tier: replicas=2 + dedup at
    full probe must still equal cosine_topk exactly."""
    from distributed_vector_search_system_spark.operators.similarity import (
        cosine_topk,
    )
    from distributed_vector_search_system_spark.sources.ivf_index import (
        search_cosine_ivf_index,
    )

    emb, cents = cosine_ivf["emb"], cosine_ivf["cents"]
    q = emb.filter(F.col("vec_id") % 100 == 7).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qvec")
    )
    got = {
        (r["query_id"], r["id"], r["rank"])
        for r in search_cosine_ivf_index(
            spark, cosine_ivf["r2"], q, 5, cents, n_probe=len(cents),
            replicated=True,
        ).collect()
    }
    want = {
        (r["query_id"], r["id"], r["rank"])
        for r in cosine_topk(emb, q, 5).collect()
    }
    assert got == want


def test_cosine_search_rejects_l2_index(spark, cosine_ivf, tmp_path):
    """The persisted _METRIC marker must stop the cosine converter from
    reading a plain L2 index (unbounded 'cosine' values otherwise)."""
    import pytest as _pytest

    from distributed_vector_search_system_spark.sources.ivf_index import (
        search_cosine_ivf_index,
    )

    emb, cents = cosine_ivf["emb"], cosine_ivf["cents"]
    l2_path = str(tmp_path / "plain_l2")
    write_ivf_index(emb, l2_path, cents)
    q = emb.limit(1).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qvec")
    )
    with _pytest.raises(ValueError, match="not a cosine index"):
        search_cosine_ivf_index(spark, l2_path, q, 5, cents)


# --- incremental rebalancing: hot-cell splitting (round 8) -------------------


def test_split_hot_cells_rebalances_and_preserves_search(spark, tmp_path):
    """A skewed layout: one dominant cell.  After split_hot_cells, (a)
    the row multiset is preserved exactly, (b) the hot cell's max size
    shrinks, (c) cold cells' files are untouched on disk, (d) full-probe
    search over the NEW centroid list equals exact kNN, same as before."""
    import os

    from pyspark.sql import functions as F

    from distributed_vector_search_system_spark.operators.knn import knn
    from distributed_vector_search_system_spark.sources.ivf_index import (
        cell_stats,
        search_ivf_index,
        split_hot_cells,
        write_ivf_index,
    )

    # 3 far-apart regions; region 0 has 60 rows (hot), others 8 each
    rows = []
    vid = 0
    for n, base in ((60, 0.0), (8, 100.0), (8, 200.0)):
        for i in range(n):
            rows.append((vid, [base + (i % 10) * 1.5, base + (i // 10) * 2.0], 0))
            vid += 1
    emb = spark.createDataFrame(
        rows, "vec_id long, embedding array<double>, label int"
    )
    cents = [[2.0, 2.0], [100.0, 100.0], [200.0, 200.0]]
    path = str(tmp_path / "skewed_ivf")
    write_ivf_index(emb, path, cents)
    before = {r["cell_id"]: r["n_rows"] for r in cell_stats(spark, path).collect()}
    assert before[0] == 60
    cold_listing = {
        d: sorted(os.listdir(os.path.join(path, d)))
        for d in os.listdir(path)
        if d.startswith("cell_id=") and d != "cell_id=0"
    }

    new_cents = split_hot_cells(spark, path, cents, max_rows=30, factor=2)
    assert len(new_cents) == 4  # one split: replace + append
    assert new_cents[1] == cents[1] and new_cents[2] == cents[2]

    after = {r["cell_id"]: r["n_rows"] for r in cell_stats(spark, path).collect()}
    assert sum(after.values()) == sum(before.values())  # no row lost/duped
    assert max(after[c] for c in (0, 3)) < 60  # the hot cell actually split
    assert after[1] == 8 and after[2] == 8
    # ids preserved exactly (multiset equality via distinct ids + count)
    got_ids = sorted(
        r["vec_id"] for r in spark.read.parquet(path).select("vec_id").collect()
    )
    assert got_ids == sorted(r[0] for r in rows)
    # cold partitions untouched byte-for-byte (same file listing)
    for d, files in cold_listing.items():
        assert sorted(os.listdir(os.path.join(path, d))) == files, d

    q = emb.filter(F.col("vec_id").isin([0, 30, 61, 70])).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qvec")
    )
    got = search_ivf_index(
        spark, path, q, 5, new_cents, n_probe=len(new_cents)
    )
    want = knn(emb, q, 5)
    key = lambda r: (r["query_id"], r["rank"], r["id"], round(r["distance"], 6))  # noqa: E731
    assert sorted(map(key, got.collect())) == sorted(map(key, want.collect()))


def test_split_hot_cells_noop_below_threshold(spark, tmp_path):
    from distributed_vector_search_system_spark.sources.ivf_index import (
        split_hot_cells,
        write_ivf_index,
    )

    emb = spark.createDataFrame(
        [(i, [float(i), 0.0], 0) for i in range(12)],
        "vec_id long, embedding array<double>, label int",
    )
    cents = [[0.0, 0.0], [11.0, 0.0]]
    path = str(tmp_path / "small_ivf")
    write_ivf_index(emb, path, cents)
    assert split_hot_cells(spark, path, cents, max_rows=100) == cents


def test_split_failure_preserves_staged_rows(spark, tmp_path, monkeypatch):
    """ADVICE r08 (medium): a failure AFTER the live partition is
    dropped but BEFORE the rewrite commits must not lose the hot cell's
    rows — the staged copy survives and the raised error names it."""
    import re
    import shutil

    import distributed_vector_search_system_spark.sources.ivf_index as ivf_mod

    rows = [(i, [float(i % 7), float(i % 5)], 0) for i in range(40)]
    emb = spark.createDataFrame(
        rows, "vec_id long, embedding array<double>, label int"
    )
    cents = [[3.0, 2.0], [500.0, 500.0]]  # everything lands in cell 0
    path = str(tmp_path / "fail_ivf")
    ivf_mod.write_ivf_index(emb, path, cents)

    def _boom(*_a, **_kw):
        raise RuntimeError("injected reassignment failure")

    # nearest_centroid_expr is invoked when building the REASSIGNED
    # rows — strictly after the hot partition rmtree (kmeans_fit uses
    # its own module-local reference and is unaffected)
    monkeypatch.setattr(ivf_mod, "nearest_centroid_expr", _boom)
    with pytest.raises(
        RuntimeError, match="staged copies of the hot cells"
    ) as exc_info:
        ivf_mod.split_hot_cells(spark, path, cents, max_rows=10, factor=2)
    monkeypatch.undo()

    stage_root = re.search(r"preserved under (\S+) ", str(exc_info.value)).group(1)
    try:
        staged = spark.read.parquet(f"{stage_root}/cell_0")
        # the live partition is gone mid-split, but EVERY dropped row is
        # recoverable from the preserved stage
        assert sorted(
            r["vec_id"] for r in staged.select("vec_id").collect()
        ) == list(range(40))
    finally:
        shutil.rmtree(stage_root, ignore_errors=True)
