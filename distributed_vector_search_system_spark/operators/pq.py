"""Product quantization (PQ) storage tier with ADC search.

The reference stores full float32 vectors and scans them exactly (FAISS
IndexFlatL2, src/index/vector_shard.cc:34-45).  The int8 scalar tier
(``operators.quantize``) buys 4×; PQ is the next rung on the same
ladder — the compression FAISS's ``IndexIVFPQ`` family uses: split each
vector into ``m`` contiguous subvectors, vector-quantize every subspace
against its own ``ksub``-entry codebook, and store only the ``m``
one-byte codes.  A 64-dim float32 vector (256 B) becomes 8 B — 32×
less scan IO, the tier a 100 TB corpus actually serves coarse search
from.

Search is classic ADC (asymmetric distance computation): per query,
precompute the ``m × ksub`` table of squared-L2 distances between the
query's subvectors and every codebook centroid (tiny, computed once per
query *on the broadcast query side*), then a candidate's approximate
distance is just ``m`` table lookups + adds per (query, vector) pair —
no per-pair float arithmetic over the full dimension.  An exact re-rank
on the float column (same two-phase shape as ``quantized_knn``)
restores exact distances for the final top-k.

Everything is expression-tier (JVM codegen, no Python in the loop):

- codebooks are driver-held literals (``m·ksub·dsub`` doubles — a few
  KB), broadcast into the plan exactly like IVF centroids;
- ``pq_encode`` is map-only (argmin over codebook literals per
  subspace, the ``array_sort``-over-structs pattern of
  ``clustering.nearest_centroid_expr``);
- the ADC scan is ``aggregate(transform(codes, (c, j) → lut[j][c]))``
  over the stored ``array<tinyint>`` — whole-stage codegen, and the
  only shuffle in phase 1 is the per-query partial top-k merge
  (WindowGroupLimit, identical to ``operators.knn``).

Two codebook sources, same split as IVF:

- ``pq_sample_codebooks`` — deterministic zero-iteration codebooks
  (portable-hash-thinned row sample, sliced per subspace), exactly
  replayable in SQL → the oracle-verified registry path;
- ``pq_fit`` — joint Lloyd training over all subspaces at once (ONE
  shuffle per iteration for all ``m`` codebooks, not ``m`` separate
  k-means runs), for real deployments; pytest-verified via recall and
  monotone WCSS instead of a SQL replay.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.distance import squared_l2, squared_l2_lit_sql
from ..functions.hashing import portable_hash64
from .knn import merge_topk

#: hash-thinning seed for sample codebooks — domain-separated from IVF's
PQ_THIN_SEED = "pq"


def _check_geometry(dim: int, m: int, ksub: int) -> int:
    if dim % m != 0:
        raise ValueError(f"dim={dim} not divisible by m={m}")
    if not 1 <= ksub <= 127:
        # codes are stored as tinyint; 127 keeps the +1 headroom trivial
        raise ValueError(f"ksub must be in [1, 127], got {ksub}")
    return dim // m


def subvector_expr(vector_col, j: int, dsub: int) -> Column:
    """Subvector ``j`` (0-based) of a vector column: elements
    ``[j·dsub, (j+1)·dsub)``."""
    v = F.col(vector_col) if isinstance(vector_col, str) else vector_col
    return F.slice(v, j * dsub + 1, dsub)


def pq_sample_codebooks(
    vectors: DataFrame,
    *,
    dim: int,
    m: int = 8,
    ksub: int = 16,
    id_col: str = "vec_id",
    vector_col: str = "embedding",
    count_key: str | None = None,
) -> list[list[list[float]]]:
    """Deterministic codebooks: the first ``ksub`` portable-hash-thinned
    rows (by id order), sliced into ``m`` subvectors — the zero-iteration
    special case of PQ training, chosen so a SQL oracle can replay
    codebook selection bit-for-bit (same sampler as ``ann_ivf_topk``'s
    centroid thinning — ``sampling.thinned_head_rows``, whose edge
    semantics the replay oracles depend on: fewer than ``ksub``
    survivors yields smaller codebooks on BOTH engines identically)."""
    from .sampling import thinned_head_rows

    dsub = _check_geometry(dim, m, ksub)
    rows = thinned_head_rows(
        vectors.select(F.col(id_col).alias("_id"), F.col(vector_col).alias("_v")),
        ksub,
        seed=PQ_THIN_SEED,
        id_col="_id",
        count_key=count_key,
    )
    full = [[float(x) for x in r["_v"]] for r in rows]
    return [
        [vec[j * dsub : (j + 1) * dsub] for vec in full] for j in range(m)
    ]


def _encode_sql(vector_col: str, codebooks: list[list[list[float]]], dsub: int) -> str:
    """One parsed SQL string for the full code array (see
    ``similarity.lsh_bucket_expr`` for why not per-literal Columns):
    per subspace, argmin over codebook literals with lowest-index
    tie-break via ``array_sort`` over (distance, code) structs."""
    v = f"`{vector_col}`"
    per_sub = []
    for j, book in enumerate(codebooks):
        sub = f"slice({v}, {j * dsub + 1}, {dsub})"
        structs = ", ".join(
            f"named_struct('d', {squared_l2_lit_sql(sub, c)}, 'z', {z})"
            for z, c in enumerate(book)
        )
        per_sub.append(f"CAST(array_sort(array({structs}))[0].z AS TINYINT)")
    return f"array({', '.join(per_sub)})"


def pq_encode(
    vectors: DataFrame,
    codebooks: list[list[list[float]]],
    *,
    vector_col: str = "embedding",
    codes_col: str = "pq_codes",
) -> DataFrame:
    """Map-only PQ encoding: adds an ``array<tinyint>`` column of ``m``
    per-subspace codebook indices.  At scale this is the one-time write
    path of the PQ tier (like ``quantize.quantize_vectors``)."""
    m = len(codebooks)
    dsub = len(codebooks[0][0])
    return vectors.withColumn(
        codes_col, F.expr(_encode_sql(vector_col, codebooks, dsub))
    )


def _lut_sql(query_vector_col: str, codebooks: list[list[list[float]]], dsub: int) -> str:
    """SQL for the per-query ADC lookup table: ``lut[j][z]`` = squared-L2
    between query subvector ``j`` and codebook entry ``z``.  Computed
    once per query row (queries are small and broadcast), NOT per
    (query, vector) pair — that asymmetry is the whole point of ADC."""
    q = f"`{query_vector_col}`"
    subs = []
    for j, book in enumerate(codebooks):
        sub = f"slice({q}, {j * dsub + 1}, {dsub})"
        entries = ", ".join(squared_l2_lit_sql(sub, c) for c in book)
        subs.append(f"array({entries})")
    return f"array({', '.join(subs)})"


def adc_distance_expr(codes_col: str, lut_col: str) -> Column:
    """ADC distance: ``Σ_j lut[j][codes[j]]`` — m lookups + adds per
    pair, sequential left-fold (same order as the oracle's per-subspace
    sum)."""
    return F.expr(
        f"aggregate(transform(`{codes_col}`, (c, j) -> "
        f"element_at(element_at(`{lut_col}`, j + 1), CAST(c AS INT) + 1)), "
        f"0.0D, (acc, x) -> acc + x)"
    )


def pq_adc_topk(
    vectors: DataFrame,
    queries: DataFrame,
    k: int,
    codebooks: list[list[list[float]]],
    *,
    rerank: int = 4,
    rerank_store: str | None = None,
    id_col: str = "vec_id",
    vector_col: str = "embedding",
    query_id_col: str = "query_id",
    query_vector_col: str = "qvec",
    codes_col: str = "pq_codes",
) -> DataFrame:
    """Two-phase PQ search: ADC coarse scan over the stored codes, exact
    squared-L2 re-rank of the surviving ``k·rerank`` candidates.

    If ``codes_col`` exists on ``vectors`` (the stored PQ tier written
    by :func:`pq_encode`), phase 1 reads ONLY it — the 32× coarse-IO
    win.  Otherwise codes are derived on the fly (correctness-
    identical; not the 100 TB path).

    **Phase-2 IO** (VERDICT r06 finding #1): the default candidate join
    back to the float column scans the whole big side (broadcast hash
    joins probe every row), so without ``rerank_store=`` the tier saves
    re-rank *compute*, not float-column *IO*.  For the 100 TB path pass
    ``rerank_store=`` an id-bucketed layout written by
    :func:`sources.rerank_store.write_rerank_store`: phase 2 then
    joins the candidate frame on ``(id_bucket, id)`` and dynamic
    partition pruning reads only the buckets holding candidates —
    identical results, one lazy plan, re-rank bytes bounded by
    ``|candidates| × bucket_rows`` rows.  With a cell
    structure available, prefer ``sources.ivfpq_index`` (re-rank
    bounded by probed cells) outright.

    Output matches :func:`operators.knn.knn`: (query_id, id, distance,
    rank) with EXACT distances — the approximation only picks which
    candidates reach phase 2.

    ``rerank=0`` = ADC-only mode: phase 2 is skipped and ``distance``
    is the APPROXIMATE ADC reconstruction distance — for latency-
    critical serving where the exact re-rank join is the tail (its
    ranking quality is tracked in bench's recall section).
    """
    m = len(codebooks)
    dsub = len(codebooks[0][0])
    if codes_col not in vectors.columns:
        vectors = pq_encode(
            vectors, codebooks, vector_col=vector_col, codes_col=codes_col
        )
    q_lut = queries.select(
        F.col(query_id_col).alias("query_id"),
        F.col(query_vector_col).alias("_qv"),
        F.expr(_lut_sql(query_vector_col, codebooks, dsub)).alias("_lut"),
    )
    coarse = (
        vectors.select(F.col(id_col).alias("id"), F.col(codes_col).alias("_codes"))
        .join(F.broadcast(q_lut), how="cross")
        .select(
            "query_id",
            "id",
            adc_distance_expr("_codes", "_lut").alias("_adc"),
        )
    )
    if rerank == 0:
        return merge_topk(
            coarse.select("query_id", "id", F.col("_adc").alias("distance")), k
        )
    # per-query partial top-(k·rerank) — WindowGroupLimit keeps the
    # shuffle at candidate-triples size, same shape as quantized_knn.
    # Candidates rank on rank_key(_adc) (the repo-wide distance-space
    # key): PQ codes duplicate heavily, so exact ADC ties at the
    # candidate boundary are common and a raw-double cut would be
    # ulp-sensitive; the oracle cuts on the identical round_even key.
    from pyspark.sql import Window

    from ..functions.distance import rank_key

    w = Window.partitionBy("query_id").orderBy(rank_key("_adc").asc(), F.col("id").asc())
    cands = (
        coarse.withColumn("_crank", F.row_number().over(w))
        .filter(F.col("_crank") <= k * rerank)
        .select("query_id", "id")
    )
    if rerank_store is not None:
        from ..sources.rerank_store import bounded_rerank

        return bounded_rerank(
            vectors.sparkSession,
            rerank_store,
            cands,
            queries,
            k,
            id_col=id_col,
            vector_col=vector_col,
            query_id_col=query_id_col,
            query_vector_col=query_vector_col,
        )
    full = vectors.select(F.col(id_col).alias("id"), F.col(vector_col).alias("_fv"))
    qv = queries.select(
        F.col(query_id_col).alias("query_id"), F.col(query_vector_col).alias("_qv")
    )
    exact = (
        cands.join(full, on="id")
        .join(F.broadcast(qv), on="query_id")
        .select(
            "query_id", "id", squared_l2(F.col("_fv"), F.col("_qv")).alias("distance")
        )
    )
    return merge_topk(exact, k)


def centroid_array_sql(centroids: list[list[float]]) -> str:
    """One parsed literal ``array<array<double>>`` of centroids —
    ``element_at(..., cell + 1)`` then indexes a centroid row without
    per-literal py4j calls (the lsh_bucket_expr lesson)."""
    rows = ", ".join(
        "array(" + ", ".join(f"{float(x)!r}D" for x in c) + ")" for c in centroids
    )
    return f"array({rows})"


def residual_expr(vector_col, cell_col, centroids: list[list[float]]) -> Column:
    """Residual ``x − centroid[cell]`` as a map-side expression (double
    precision).  The IVFPQ refinement: residuals concentrate around the
    origin, so the same ``m × ksub`` code budget quantizes them with
    far less error than raw vectors — the lever that matters when the
    ADC ranking itself is served (``rerank=0``)."""
    if not isinstance(vector_col, str) or not isinstance(cell_col, str):
        raise TypeError("residual_expr takes column NAMES (parsed-SQL tier)")
    cents = centroid_array_sql(centroids)
    return F.expr(
        f"zip_with(`{vector_col}`, element_at({cents}, CAST(`{cell_col}` AS INT) + 1), "
        f"(a, b) -> CAST(a AS DOUBLE) - b)"
    )


def pq_residual_codebooks(
    vectors: DataFrame,
    centroids: list[list[float]],
    *,
    dim: int,
    m: int = 8,
    ksub: int = 16,
    id_col: str = "vec_id",
    vector_col: str = "embedding",
    trained: bool = False,
    **fit_kwargs,
) -> list[list[list[float]]]:
    """Codebooks over the RESIDUAL distribution ``x − centroid[cell(x)]``
    (cell = nearest centroid): the training counterpart of residual
    IVF+PQ encoding.  ``trained=True`` runs :func:`pq_fit` on the
    residuals; default is the deterministic sample (same sampler
    contract as :func:`pq_sample_codebooks`)."""
    from .clustering import nearest_centroid_expr

    res = vectors.withColumn(
        "_cell", nearest_centroid_expr(F.col(vector_col), centroids)
    ).withColumn("_res", residual_expr(vector_col, "_cell", centroids))
    if trained:
        books, _ = pq_fit(
            res, dim=dim, m=m, ksub=ksub, id_col=id_col, vector_col="_res",
            **fit_kwargs,
        )
        return books
    return pq_sample_codebooks(
        res, dim=dim, m=m, ksub=ksub, id_col=id_col, vector_col="_res"
    )


def pq_fit(
    vectors: DataFrame,
    *,
    dim: int,
    m: int = 8,
    ksub: int = 16,
    max_iterations: int = 10,
    tol: float = 1e-6,
    id_col: str = "vec_id",
    vector_col: str = "embedding",
) -> tuple[list[list[list[float]]], int]:
    """Joint Lloyd training of all ``m`` subspace codebooks at once.

    Each iteration is ONE distributed pass: every vector's ``m``
    subvectors are assigned to their subspace's nearest codebook entry
    map-side (one argmin expression per subspace — no explode of the
    data), then a single per-(subspace, code, position) average with
    map-side partial aggregation updates all codebooks together.  m
    separate ``kmeans_fit`` runs would scan the corpus ``m × iters``
    times; this scans it ``iters`` times total.

    Returns ``(codebooks, iterations_run)``; initialization is
    :func:`pq_sample_codebooks` so training is reproducible run-to-run.
    Empty codes keep their previous centroid (standard Lloyd fix).
    """
    dsub = _check_geometry(dim, m, ksub)
    books = pq_sample_codebooks(
        vectors, dim=dim, m=m, ksub=ksub, id_col=id_col, vector_col=vector_col
    )
    iterations = 0
    for _ in range(max_iterations):
        iterations += 1
        enc = pq_encode(vectors, books, vector_col=vector_col, codes_col="_codes")
        # one explode of (sub, pos, val) triples keyed by the assigned
        # code — single shuffle with partial aggregation for ALL books
        per_dim = (
            enc.select(
                F.posexplode(vector_col).alias("_pos", "_val"), F.col("_codes")
            )
            .select(
                (F.col("_pos") / dsub).cast("int").alias("sub"),
                F.pmod(F.col("_pos"), F.lit(dsub)).alias("pos"),
                F.col("_val").cast("double").alias("val"),
                F.expr("_codes[CAST(_pos / " + str(dsub) + " AS INT)]").alias("z"),
            )
            .groupBy("sub", "z", "pos")
            .agg(F.avg("val").alias("v"))
            .collect()
        )
        new_books = [[list(c) for c in book] for book in books]
        acc: dict[tuple[int, int], dict[int, float]] = {}
        for r in per_dim:
            acc.setdefault((r["sub"], r["z"]), {})[r["pos"]] = r["v"]
        for (j, z), dims in acc.items():
            new_books[j][z] = [dims[p] for p in sorted(dims)]
        shift = max(
            sum((a - b) * (a - b) for a, b in zip(old, new))
            for ob, nb in zip(books, new_books)
            for old, new in zip(ob, nb)
        )
        books = new_books
        if shift < tol:
            break
    return books, iterations


def pq_reconstruction_mse(
    vectors: DataFrame,
    codebooks: list[list[list[float]]],
    *,
    vector_col: str = "embedding",
) -> float:
    """Mean squared reconstruction error over the corpus — the PQ
    training objective (sum of per-subspace WCSS); used to verify
    ``pq_fit`` improves on the sample codebooks."""
    m = len(codebooks)
    dsub = len(codebooks[0][0])
    enc = pq_encode(vectors, codebooks, vector_col=vector_col, codes_col="_codes")
    q_lut = _lut_sql(vector_col, codebooks, dsub)
    err = enc.select(
        F.expr(q_lut).alias("_lut"), F.col("_codes")
    ).select(adc_distance_expr("_codes", "_lut").alias("e"))
    row = err.agg(F.avg("e").alias("mse")).first()
    return float(row["mse"])
