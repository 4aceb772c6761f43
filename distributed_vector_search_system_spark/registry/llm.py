"""LLM-data-pipeline query surface (north-star extensions; BASELINE.json).

Dedup (exact / n-gram Jaccard / MinHash+LSH / SimHash / embedding
cosine), similarity search (exact + ANN), text analysis (langid,
quality, token stats, fingerprint), multimodal binary columns.

Oracle portability: every hash that must match across engines is the
md5-prefix hash (``functions.hashing.portable_hash64``); SQL oracles
rebuild signatures term-for-term.  ANN and mapInPandas feature queries
are weak-checked (rows-only) — their quality/recall guarantees live in
pytest instead.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.text import (
    LANG_PROFILES,
    WS_SPLIT_RE,
    detect_language,
    fingerprint,
    quality_score,
    token_count,
    tokens,
)
from ..operators.dedup import (
    embedding_neardup_pairs_lsh,
    exact_dedup,
    minhash_dedup_pairs,
    ngram_jaccard_pairs,
    simhash_pairs,
)
from ..operators.multimodal import extract_features, sample_frames, with_blob_metadata
from ..operators.similarity import ann_ivf_topk, ann_lsh_topk, cosine_topk
from ..tables import load_table

# ---------------------------------------------------------------------------
# shared DuckDB SQL fragments (must mirror functions/text.py exactly)

_TOKS = "list_filter(string_split_regex(lower(text), '[^a-z0-9]+'), x -> x <> '')"
_SHINGLES = "list_distinct(list_transform(range(1, len(w)), i -> w[i] || ' ' || w[i+1]))"


def _hash_sql(expr: str) -> str:
    return f"CAST(('0x' || substr(md5({expr}), 1, 15)) AS BIGINT)"


_SQL_COSINE = (
    "(SELECT SUM(CAST(u.a AS DOUBLE) * CAST(u.b AS DOUBLE)) / "
    "(SQRT(SUM(CAST(u.a AS DOUBLE) * CAST(u.a AS DOUBLE))) * "
    "SQRT(SUM(CAST(u.b AS DOUBLE) * CAST(u.b AS DOUBLE)))) "
    "FROM (SELECT UNNEST({x}) AS a, UNNEST({y}) AS b) u)"
)

# ---------------------------------------------------------------------------
# dedup: exact

def q_dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return exact_dedup(docs).select("doc_id", "n_chars")


_DEDUP_EXACT_SQL = """
SELECT doc_id, n_chars FROM (
  SELECT doc_id, n_chars,
         ROW_NUMBER() OVER (PARTITION BY md5(text) ORDER BY doc_id) AS rn
  FROM documents
) WHERE rn = 1
"""

# dedup: n-gram Jaccard (word bigrams, threshold 0.5).  The REGISTERED
# plan uses the df-capped blocker (τ = ceil(0.1·|docs|)) so the
# driver-verified plan is the one whose worst join key is bounded at any
# scale (VERDICT r02 item 2); the oracle replays the identical cap.  On
# this fixture the cap is a measured no-op (max shingle df = 46 of 500
# docs at sf0.01; every qualifying pair's rarest shared shingle has
# df ≤ 23), so results equal the uncapped plan.

_NGRAM_DF_CAP = 0.1


def q_dedup_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return ngram_jaccard_pairs(docs, 0.5, n=2, max_block_df=_NGRAM_DF_CAP).select(
        "doc_a", "doc_b", F.round("jaccard", 6).alias("jaccard")
    )


# τ must be computed with the SAME double arithmetic as Python's
# math.ceil(0.1 * n): DuckDB decimal literals default to DECIMAL, whose
# exact product can ceil differently (0.1·500 = 50 in decimal but
# 50.000000000000007 → 51 in binary double), hence the explicit CAST.
_NGRAM_JACCARD_SQL = f"""
WITH toks AS (SELECT doc_id, {_TOKS} AS w FROM documents),
sh AS (SELECT doc_id, {_SHINGLES} AS s FROM toks),
ex AS (SELECT doc_id, UNNEST(s) AS shingle FROM sh),
sizes AS (SELECT doc_id, len(s) AS n FROM sh),
rare AS (
  SELECT shingle FROM ex GROUP BY shingle
  HAVING COUNT(*) <= CEIL(CAST({_NGRAM_DF_CAP} AS DOUBLE) * (SELECT COUNT(*) FROM documents))
),
cand AS (
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
  FROM ex a JOIN ex b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
  WHERE a.shingle IN (SELECT shingle FROM rare)
),
inter AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS i
  FROM ex a JOIN ex b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
  GROUP BY 1, 2
)
SELECT i.doc_a, i.doc_b,
       ROUND(CAST(i.i AS DOUBLE) / CAST(sa.n + sb.n - i.i AS DOUBLE), 6) AS jaccard
FROM inter i
JOIN cand c ON c.doc_a = i.doc_a AND c.doc_b = i.doc_b
JOIN sizes sa ON sa.doc_id = i.doc_a
JOIN sizes sb ON sb.doc_id = i.doc_b
WHERE CAST(i.i AS DOUBLE) / CAST(sa.n + sb.n - i.i AS DOUBLE) >= 0.5
"""

# dedup: MinHash + LSH (16 hashes, 4 bands, verify at 0.5)

_NUM_HASHES, _BANDS = 16, 4


def q_dedup_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return minhash_dedup_pairs(
        docs, 0.5, num_hashes=_NUM_HASHES, bands=_BANDS, n=2
    ).select("doc_a", "doc_b", F.round("jaccard", 6).alias("jaccard"))


_R = _NUM_HASHES // _BANDS

# affine (one-hash) MinHash: base md5 hash once per shingle, then
# (a_i*h + b_i) mod P per permutation — constants shared with
# operators.dedup.minhash_coeffs so signatures match bit-for-bit
from ..operators.dedup import MINHASH_P, minhash_coeffs  # noqa: E402

_SIG_ITEMS = ", ".join(
    f"list_min(list_transform(hv, v -> (v * {a} + {b}) % {MINHASH_P}))"
    for a, b in minhash_coeffs(_NUM_HASHES)
)
_MINHASH_CTES = f"""toks AS (SELECT doc_id, {_TOKS} AS w FROM documents),
sh AS (SELECT doc_id, {_SHINGLES} AS s FROM toks WHERE len({_SHINGLES}) > 0),
hashed AS (
  SELECT doc_id, s, list_transform(s, x -> {_hash_sql("x")} % {MINHASH_P}) AS hv
  FROM sh
),
sig AS (
  SELECT doc_id, s, [{_SIG_ITEMS}] AS sg
  FROM hashed
),
banded AS (
  SELECT doc_id, b.band,
    {_hash_sql("array_to_string(list_transform(sg[b.band * " + str(_R) + " + 1 : b.band * " + str(_R) + " + " + str(_R) + "], v -> CAST(v AS VARCHAR)), ',')")} AS bucket
  FROM sig, (SELECT UNNEST(range(0, {_BANDS})) AS band) b
),
cand AS (
  SELECT DISTINCT l.doc_id AS doc_a, r.doc_id AS doc_b
  FROM banded l JOIN banded r ON l.band = r.band AND l.bucket = r.bucket
  WHERE l.doc_id < r.doc_id
),
ex AS (SELECT doc_id, UNNEST(s) AS shingle FROM sh),
sizes AS (SELECT doc_id, len(s) AS n FROM sh),
inter AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS i
  FROM ex a JOIN ex b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
  GROUP BY 1, 2
),
verified AS (
  SELECT i.doc_a, i.doc_b,
         CAST(i.i AS DOUBLE) / CAST(sa.n + sb.n - i.i AS DOUBLE) AS j
  FROM inter i
  JOIN cand c ON c.doc_a = i.doc_a AND c.doc_b = i.doc_b
  JOIN sizes sa ON sa.doc_id = i.doc_a
  JOIN sizes sb ON sb.doc_id = i.doc_b
)
"""

_MINHASH_SQL = f"""
WITH {_MINHASH_CTES}
SELECT doc_a, doc_b, ROUND(j, 6) AS jaccard FROM verified WHERE j >= 0.5
"""

# dedup: cluster resolution — pairs → connected components → per-doc
# representative.  Spark side is iterative min-label propagation
# (operators.dedup.duplicate_clusters); the oracle computes the same
# components with a recursive CTE (transitive closure is tiny at sf0.01).

def q_dedup_resolve(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.dedup import duplicate_clusters

    docs = load_table(spark, sf_dir, "documents")
    pairs = minhash_dedup_pairs(docs, 0.5, num_hashes=_NUM_HASHES, bands=_BANDS, n=2)
    return duplicate_clusters(docs.select("doc_id"), pairs)


_RESOLVE_SQL = f"""
WITH RECURSIVE {_MINHASH_CTES},
pairs AS (SELECT doc_a, doc_b FROM verified WHERE j >= 0.5),
edges AS (SELECT doc_a AS a, doc_b AS b FROM pairs
          UNION SELECT doc_b, doc_a FROM pairs),
reach(a, b) AS (
  SELECT a, b FROM edges
  UNION
  SELECT r.a, e.b FROM reach r JOIN edges e ON r.b = e.a
)
SELECT d.doc_id, LEAST(d.doc_id, COALESCE(MIN(r.b), d.doc_id)) AS cluster_rep
FROM documents d LEFT JOIN reach r ON r.a = d.doc_id
GROUP BY d.doc_id
"""

# dedup: SimHash (60-bit portable hash), banded scale path: candidates
# come from a (chunk_index, chunk_value) equi-join; by pigeonhole a pair
# within (chunks − 1) differing bits agrees on ≥1 chunk, so banding is
# exact for the radius (VERDICT r01 item 4).  The all-pairs formulation
# survives only inside the DuckDB oracle, the ground truth the banded
# plan must reproduce.
#
# The DRIVER row is the PRODUCTION radius — hamming ≤ 3 with 15-bit
# chunks (60/15 = 4 chunks, pigeonhole-exact for ≤ 3): join keys carry
# 2^15 values, so buckets shrink as ~N/2^15 and candidates stay ~linear
# (measured at the 10× scale anchor: 10.2 → 48.1 s).  The LOOSE radius
# (hamming ≤ 12 → 4-bit chunks whose keys have only 16 values —
# candidates ~N²/16 BY CONSTRUCTION, 1117.9 s at 10×) is demoted to the
# pytest tier as dedup_simhash_loose (VERDICT r05 item 3): the
# independently-verified row must be the plan you would run at 100×.

_SIMHASH_BITS = 60
_SIMHASH_MAXHAM = 3
_SIMHASH_BAND_BITS = 15  # 4 chunks → pigeonhole-exact for hamming ≤ 3
_SIMHASH_LOOSE_MAXHAM = 12
_SIMHASH_LOOSE_BAND_BITS = 4  # 15 chunks → exact for ≤ 14, but 16-value keys


def q_dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return simhash_pairs(
        docs, _SIMHASH_MAXHAM, banded=True, band_bits=_SIMHASH_BAND_BITS
    )


def q_dedup_simhash_loose(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Loose-radius variant — quadratic-by-construction bucket keys;
    fixture-scale only (see the radius note above)."""
    docs = load_table(spark, sf_dir, "documents")
    return simhash_pairs(
        docs, _SIMHASH_LOOSE_MAXHAM, banded=True,
        band_bits=_SIMHASH_LOOSE_BAND_BITS,
    )


def _simhash_oracle(max_hamming: int) -> str:
    bit_sums = ",\n    ".join(
        f"SUM(CASE WHEN (h >> {i}) & 1 = 1 THEN 1 ELSE -1 END) AS b{i}"
        for i in range(_SIMHASH_BITS)
    )
    assemble = " + ".join(
        f"(CASE WHEN b{i} > 0 THEN CAST({1 << i} AS BIGINT) ELSE 0 END)"
        for i in range(_SIMHASH_BITS)
    )
    return f"""
WITH toks AS (SELECT doc_id, list_distinct({_TOKS}) AS w FROM documents),
ex AS (SELECT doc_id, {_hash_sql("UNNEST(w)")} AS h FROM toks),
bits AS (SELECT doc_id, {bit_sums} FROM ex GROUP BY doc_id),
sigs AS (SELECT doc_id, {assemble} AS sig FROM bits)
SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
       CAST(bit_count(xor(a.sig, b.sig)) AS INT) AS hamming
FROM sigs a JOIN sigs b ON a.doc_id < b.doc_id
WHERE bit_count(xor(a.sig, b.sig)) <= {max_hamming}
"""


# dedup: embedding cosine near-dup ((label, LSH-bucket)-blocked, threshold 0.4).
# The REGISTERED plan blocks on the composite (label, sign-LSH bucket)
# key across 4 plane tables with 1-bit multiprobe (VERDICT r02 item 4):
# with bare-label blocking, C label values degrade to C within-block
# all-pairs joins; the composite key's cardinality is C·2^6 per table,
# bounded at any scale.  Parameters (6 planes, 4 tables, ham≤1) were
# chosen by measuring on the fixture: every within-label pair at
# cosine ≥ 0.4 survives the blocker, so results equal the label-only
# plan, with ~2.6× fewer candidate pairs.  The oracle replays the
# identical planes as SQL literals (the minhash_coeffs pattern).

_EMB_LSH_DIM, _EMB_LSH_PLANES, _EMB_LSH_TABLES, _EMB_LSH_SEED = 64, 6, 4, 42


def q_dedup_embedding_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    return embedding_neardup_pairs_lsh(
        emb, 0.4,
        dim=_EMB_LSH_DIM, num_planes=_EMB_LSH_PLANES,
        num_tables=_EMB_LSH_TABLES, seed=_EMB_LSH_SEED,
        block_col="label",
    ).select("id_a", "id_b", F.round("cosine", 6).alias("cosine"))


def _emb_neardup_oracle() -> str:
    from ..operators.similarity import _hyperplanes

    b_cols, conds = [], []
    for t in range(_EMB_LSH_TABLES):
        planes = _hyperplanes(_EMB_LSH_DIM, _EMB_LSH_PLANES, _EMB_LSH_SEED + 1000 * t)
        b_cols.append(f"{_lsh_bucket_sql('embedding', planes)} AS b{t}")
        conds.append(f"bit_count(xor(a.b{t}, b.b{t})) <= 1")
    cos = _SQL_COSINE.format(x="a.embedding", y="b.embedding")
    return f"""
WITH vb AS (SELECT vec_id, label, embedding, {", ".join(b_cols)} FROM embeddings),
pairs AS (
  SELECT a.vec_id AS id_a, b.vec_id AS id_b, {cos} AS c
  FROM vb a JOIN vb b
    ON a.label = b.label AND a.vec_id < b.vec_id
   AND ({" OR ".join(conds)})
)
SELECT id_a, id_b, ROUND(c, 6) AS cosine FROM pairs WHERE c >= 0.4
"""

# ---------------------------------------------------------------------------
# similarity search

def q_ann_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    q = emb.filter(F.col("vec_id") % 100 == 7).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qvec")
    )
    return cosine_topk(emb, q, 5).select(
        "query_id", "id", F.round("cosine", 6).alias("cosine"), "rank"
    )


_ANN_COSINE_SQL = f"""
WITH q AS (SELECT vec_id AS query_id, embedding AS qe FROM embeddings WHERE vec_id % 100 = 7),
scored AS (
  SELECT q.query_id, v.vec_id AS id,
         {_SQL_COSINE.format(x="q.qe", y="v.embedding")} AS c
  FROM q CROSS JOIN embeddings v
),
ranked AS (
  SELECT query_id, id, c,
         CAST(ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY c DESC, id) AS INT) AS rank
  FROM scored
)
SELECT query_id, id, ROUND(c, 6) AS cosine, rank FROM ranked WHERE rank <= 5
"""


def q_ann_lsh_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    q = emb.filter(F.col("vec_id") % 100 == 7).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qvec")
    )
    return ann_lsh_topk(emb, q, 5, dim=64).select(
        "query_id", "id", F.round("cosine", 6).alias("cosine"), "rank"
    )


def q_ann_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    q = emb.filter(F.col("vec_id") % 100 == 7).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qvec")
    )
    return ann_ivf_topk(emb, q, 5, thin_count_key=f"{sf_dir}:embeddings").select(
        "query_id", "id", F.round("distance", 6).alias("distance"), "rank"
    )


# --- ANN replay oracles ----------------------------------------------------
# Both approximate paths are DETERMINISTIC plans (seeded hyperplanes,
# hash-thinned centroid sampling), so the oracle replays the whole
# bucket→probe→exact-re-rank pipeline in SQL with the plane/centroid
# constants embedded as literals — the same pattern that makes MinHash
# signatures oracle-exact (minhash_coeffs literals above).  VERDICT r02
# items 1c/1d.

_SQL_SQ_L2 = (
    "(SELECT SUM((CAST(u.a AS DOUBLE) - CAST(u.b AS DOUBLE)) * "
    "(CAST(u.a AS DOUBLE) - CAST(u.b AS DOUBLE))) "
    "FROM (SELECT UNNEST({x}) AS a, UNNEST({y}) AS b) u)"
)


def _lsh_bucket_sql(vec_expr: str, planes) -> str:
    """DuckDB rendering of ``similarity.lsh_bucket_expr`` for literal
    hyperplanes: per plane, sign of the dot product sets one bit."""
    terms = []
    for i, plane in enumerate(planes):
        arr = "[" + ", ".join(repr(float(x)) for x in plane) + "]"
        dot = (
            f"(SELECT SUM(CAST(u.a AS DOUBLE) * u.b) "
            f"FROM (SELECT UNNEST({vec_expr}) AS a, UNNEST({arr}) AS b) u)"
        )
        terms.append(f"(CASE WHEN {dot} > 0 THEN {1 << i} ELSE 0 END)")
    return "(" + " + ".join(terms) + ")"


_LSH_DIM, _LSH_PLANES, _LSH_TABLES, _LSH_SEED = 64, 6, 4, 42


def _ann_lsh_oracle() -> str:
    from ..operators.similarity import _hyperplanes

    vb_cols, qb_cols, conds = [], [], []
    for t in range(_LSH_TABLES):
        planes = _hyperplanes(_LSH_DIM, _LSH_PLANES, _LSH_SEED + 1000 * t)
        bucket = _lsh_bucket_sql("embedding", planes)
        vb_cols.append(f"{bucket} AS b{t}")
        qb_cols.append(f"{bucket} AS b{t}")
        # multiprobe_bits=1: the query's own bucket plus every bucket one
        # hamming bit away (operators/similarity.ann_lsh_topk)
        probes = [f"v.b{t} = q.b{t}"] + [
            f"v.b{t} = xor(q.b{t}, {1 << i})" for i in range(_LSH_PLANES)
        ]
        conds.append("(" + " OR ".join(probes) + ")")
    cos = _SQL_COSINE.format(x="c.qe", y="c.embedding")
    return f"""
WITH vb AS (SELECT vec_id, embedding, {", ".join(vb_cols)} FROM embeddings),
qb AS (SELECT vec_id AS query_id, embedding AS qe, {", ".join(qb_cols)}
       FROM embeddings WHERE vec_id % 100 = 7),
cand AS (
  SELECT q.query_id, v.vec_id AS id, q.qe, v.embedding
  FROM qb q JOIN vb v ON {" OR ".join(conds)}
),
scored AS (SELECT c.query_id, c.id, {cos} AS c FROM cand c),
ranked AS (
  SELECT query_id, id, c,
         CAST(ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY c DESC, id) AS INT) AS rank
  FROM scored
)
SELECT query_id, id, ROUND(c, 6) AS cosine, rank FROM ranked WHERE rank <= 5
"""


def _ann_ivf_oracle() -> str:
    from ..functions.hashing import portable_hash64_sql
    from ..operators.similarity import IVF_THIN_SEED

    h = portable_hash64_sql("CAST(vec_id AS VARCHAR)", seed=IVF_THIN_SEED)
    l2_vc = _SQL_SQ_L2.format(x="v.embedding", y="c.cvec")
    l2_qc = _SQL_SQ_L2.format(x="q.qe", y="c.cvec")
    l2_qa = _SQL_SQ_L2.format(x="qp.qe", y="a.embedding")
    # replays ann_ivf_topk defaults: num_cells=16 (thin step = n//64),
    # n_probe=4, k=5; ties on (distance, cell_id) break identically to
    # Spark's array_sort over (d, cid) structs
    return f"""
WITH nt AS (SELECT GREATEST(COUNT(*) // 64, 1) AS step FROM embeddings),
cents AS (
  SELECT vec_id AS cell_id, embedding AS cvec
  FROM embeddings, nt
  WHERE ({h}) % step = 0
  ORDER BY vec_id LIMIT 16
),
vd AS (SELECT v.vec_id, v.embedding, c.cell_id, {l2_vc} AS d
       FROM embeddings v CROSS JOIN cents c),
asg AS (SELECT vec_id, embedding, cell_id FROM
        (SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY d, cell_id) AS rn
         FROM vd)
        WHERE rn = 1),
q AS (SELECT vec_id AS query_id, embedding AS qe FROM embeddings WHERE vec_id % 100 = 7),
qd AS (SELECT q.query_id, q.qe, c.cell_id, {l2_qc} AS d FROM q CROSS JOIN cents c),
qp AS (SELECT query_id, qe, cell_id FROM
       (SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY d, cell_id) AS rn
        FROM qd)
       WHERE rn <= 4),
scored AS (SELECT qp.query_id, a.vec_id AS id, {l2_qa} AS distance
           FROM qp JOIN asg a ON a.cell_id = qp.cell_id),
ranked AS (SELECT query_id, id, distance,
           CAST(ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY round_even((distance) * 1e6, 0) / 1e6, id) AS INT) AS rank
           FROM scored)
SELECT query_id, id, ROUND(distance, 6) AS distance, rank FROM ranked WHERE rank <= 5
"""


# --- ANN recall as a tracked correctness row -------------------------------
# Recall is THE number an ANN user tunes (n_probe, tables, planes trade
# recall for cost), so it must be a driver-verified row, not only a
# pytest floor (VERDICT r02 item 5 / r03 item 4).  Both tiers are
# deterministic, so per-query hit counts against the exact top-k are
# exactly oracle-checkable: the oracle replays approximate AND exact
# pipelines and counts the same intersections.

def q_ann_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-query top-k hit counts of EVERY approximate tier against the
    exact top-k — one tracked row showing the recall/cost knob of the
    whole serving ladder (LSH, IVF, int8, PQ, IVF+PQ)."""
    from ..operators.knn import knn
    from ..operators.pq import pq_adc_topk
    from ..operators.quantize import quantized_knn
    from ..sources.ivfpq_index import search_ivfpq_index
    from .vector import _ivf_thinned_centroids, ivfpq_index, pq_books, pq_tier

    emb = load_table(spark, sf_dir, "embeddings")
    q = emb.filter(F.col("vec_id") % 100 == 7).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qvec")
    )
    exact_cos = cosine_topk(emb, q, 5).select("query_id", "id")
    exact_l2 = knn(emb, q, 5).select("query_id", "id")
    lsh = ann_lsh_topk(emb, q, 5, dim=64).select("query_id", "id")
    ivf = ann_ivf_topk(emb, q, 5, thin_count_key=f"{sf_dir}:embeddings").select(
        "query_id", "id"
    )
    quant = quantized_knn(emb, q, 5, rerank=3).select("query_id", "id")
    pq = pq_adc_topk(
        pq_tier(spark, sf_dir), q, 5, pq_books(spark, sf_dir), rerank=10
    ).select("query_id", "id")
    ivfpq = search_ivfpq_index(
        spark,
        ivfpq_index(spark, sf_dir),
        q,
        5,
        _ivf_thinned_centroids(spark, sf_dir),
        pq_books(spark, sf_dir),
        n_probe=4,
        rerank=10,
    ).select("query_id", "id")

    def hits(exact: DataFrame, approx: DataFrame, name: str) -> DataFrame:
        return (
            exact.join(approx, on=["query_id", "id"], how="left_semi")
            .groupBy("query_id")
            .agg(F.count("*").alias(name))
        )

    out = q.select("query_id")
    for approx, exact, name in (
        (lsh, exact_cos, "lsh_hits"),
        (ivf, exact_l2, "ivf_hits"),
        (quant, exact_l2, "quant_hits"),
        (pq, exact_l2, "pq_hits"),
        (ivfpq, exact_l2, "ivfpq_hits"),
    ):
        out = out.join(hits(exact, approx, name), "query_id", "left")
    return out.select(
        "query_id",
        *[
            F.coalesce(n, F.lit(0)).cast("int").alias(n)
            for n in ("lsh_hits", "ivf_hits", "quant_hits", "pq_hits", "ivfpq_hits")
        ],
        F.lit(5).cast("int").alias("k"),
    )


def _ann_recall_oracle() -> str:
    exact_cos = _ANN_COSINE_SQL
    exact_l2 = f"""
WITH q AS (SELECT vec_id AS query_id, embedding AS qe FROM embeddings WHERE vec_id % 100 = 7),
scored AS (
  SELECT q.query_id, v.vec_id AS id,
         {_SQL_SQ_L2.format(x="q.qe", y="v.embedding")} AS distance
  FROM q CROSS JOIN embeddings v
),
ranked AS (
  SELECT query_id, id,
         ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY round_even((distance) * 1e6, 0) / 1e6, id) AS rank
  FROM scored
)
SELECT query_id, id FROM ranked WHERE rank <= 5
"""
    from .vector import _ivfpq_oracle, _pq_topk_oracle, _qknn_oracle

    return f"""
WITH ec AS ({exact_cos}),
el AS ({exact_l2}),
lsh AS ({_ann_lsh_oracle()}),
ivf AS ({_ann_ivf_oracle()}),
qnt AS ({_qknn_oracle("vec_id % 100 = 7", 5, 3)}),
pqt AS ({_pq_topk_oracle()}),
ivq AS ({_ivfpq_oracle("vec_id % 100 = 7")}),
qs AS (SELECT vec_id AS query_id FROM embeddings WHERE vec_id % 100 = 7),
lh AS (SELECT e.query_id, COUNT(*) AS c FROM ec e
       JOIN lsh a ON a.query_id = e.query_id AND a.id = e.id GROUP BY 1),
ih AS (SELECT e.query_id, COUNT(*) AS c FROM el e
       JOIN ivf a ON a.query_id = e.query_id AND a.id = e.id GROUP BY 1),
qh AS (SELECT e.query_id, COUNT(*) AS c FROM el e
       JOIN qnt a ON a.query_id = e.query_id AND a.id = e.id GROUP BY 1),
ph AS (SELECT e.query_id, COUNT(*) AS c FROM el e
       JOIN pqt a ON a.query_id = e.query_id AND a.id = e.id GROUP BY 1),
vh AS (SELECT e.query_id, COUNT(*) AS c FROM el e
       JOIN ivq a ON a.query_id = e.query_id AND a.id = e.id GROUP BY 1)
SELECT q.query_id,
       CAST(COALESCE(lh.c, 0) AS INT) AS lsh_hits,
       CAST(COALESCE(ih.c, 0) AS INT) AS ivf_hits,
       CAST(COALESCE(qh.c, 0) AS INT) AS quant_hits,
       CAST(COALESCE(ph.c, 0) AS INT) AS pq_hits,
       CAST(COALESCE(vh.c, 0) AS INT) AS ivfpq_hits,
       CAST(5 AS INT) AS k
FROM qs q
LEFT JOIN lh ON lh.query_id = q.query_id
LEFT JOIN ih ON ih.query_id = q.query_id
LEFT JOIN qh ON qh.query_id = q.query_id
LEFT JOIN ph ON ph.query_id = q.query_id
LEFT JOIN vh ON vh.query_id = q.query_id
"""


# ---------------------------------------------------------------------------
# text analysis

def q_text_language_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return docs.select(
        "doc_id", detect_language("text").alias("pred_lang"), F.col("lang").alias("tagged_lang")
    )


def _langid_oracle() -> str:
    score_cols = ",\n  ".join(
        "len(list_intersect(w, ["
        + ", ".join(f"'{s}'" for s in words)
        + f"])) AS s_{lang}"
        for lang, words in LANG_PROFILES
    )
    best = "GREATEST(" + ", ".join(f"s_{lang}" for lang, _ in LANG_PROFILES) + ")"
    case = "CASE " + " ".join(
        f"WHEN s_{lang} = best AND best > 0 THEN '{lang}'" for lang, _ in LANG_PROFILES
    ) + " ELSE 'und' END"
    return f"""
WITH toks AS (SELECT doc_id, lang, list_distinct({_TOKS}) AS w FROM documents),
scored AS (SELECT doc_id, lang, {score_cols} FROM toks),
final AS (SELECT doc_id, lang, {best} AS best, * FROM scored)
SELECT doc_id, {case} AS pred_lang, lang AS tagged_lang FROM final
"""


def q_text_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        token_count("text").alias("n_tokens"),
        quality_score("text").alias("quality"),
    )


_EN_STOP = ", ".join(f"'{s}'" for s in LANG_PROFILES[0][1])
_TEXT_QUALITY_SQL = f"""
WITH t AS (
  SELECT doc_id, {_TOKS} AS w, list_distinct({_TOKS}) AS dw, text FROM documents
),
m AS (
  SELECT doc_id, CAST(len(w) AS INT) AS n_tokens,
    CASE WHEN len(dw) = 0 THEN 0.0
         ELSE CAST(len(list_intersect(dw, [{_EN_STOP}])) AS DOUBLE) / CAST(len(dw) AS DOUBLE)
    END AS stop_ratio,
    CASE WHEN length(text) = 0 THEN 0.0
         ELSE CAST(length(text) - length(regexp_replace(text, '[0-9]', '', 'g')) AS DOUBLE)
              / CAST(length(text) AS DOUBLE)
    END AS dig_ratio
  FROM t
)
SELECT doc_id, n_tokens,
  ROUND(LEAST(CAST(n_tokens AS DOUBLE), 300.0) / 300.0 * 0.2
        + stop_ratio * 0.5 + (1.0 - dig_ratio) * 0.3, 6) AS quality
FROM m
"""


def q_text_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return (
        docs.select("source", token_count("text").alias("n"), "n_chars")
        .groupBy("source")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n").alias("total_tokens"),
            F.round(F.avg("n"), 4).alias("avg_tokens"),
            F.max("n_chars").alias("max_chars"),
        )
    )


_TOKEN_STATS_SQL = f"""
WITH t AS (SELECT source, CAST(len({_TOKS}) AS BIGINT) AS n, n_chars FROM documents)
SELECT source, COUNT(*) AS n_docs, CAST(SUM(n) AS BIGINT) AS total_tokens,
       ROUND(AVG(n), 4) AS avg_tokens, MAX(n_chars) AS max_chars
FROM t GROUP BY source
"""


def q_doc_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return docs.select("doc_id", fingerprint("text").alias("fp"))


_FINGERPRINT_SQL = """
SELECT doc_id,
  list_reduce(
    list_prepend(CAST(0 AS BIGINT),
      list_transform(range(1, length(text) + 1), i -> CAST(ord(text[i]) AS BIGINT))),
    (a, b) -> (a * 31 + b) % 2147483647) AS fp
FROM documents
"""

# ---------------------------------------------------------------------------
# multimodal binary columns (blob synthesized deterministically from text)

def _with_blob(docs: DataFrame) -> DataFrame:
    return docs.withColumn("blob", F.encode(F.col("text"), "UTF-8"))


def q_multimodal_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _with_blob(load_table(spark, sf_dir, "documents"))
    return with_blob_metadata(docs).select("doc_id", "n_bytes", "sha256", "magic")


# DuckDB 1.0 lacks sha256/hex over BLOB — the fixture text is ASCII so the
# utf-8 blob bytes equal the string bytes; hash/hex the string instead.
_MULTIMODAL_META_SQL = """
SELECT doc_id,
  CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
  sha256(text) AS sha256,
  hex(substring(text, 1, 4)) AS magic
FROM documents
"""


def q_multimodal_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Byte-statistics features per blob, serialized to a CSV of
    micro-unit integers (``floor(float32(v)·1e6 + 0.5)``) because the
    driver's canonicalizer cannot hash array cells (the
    ``vector_centroids`` encoding, CORRECTNESS_r01/r02).  The kernel's
    stats are bit-identical doubles across engines (see
    ``extract_features``), so the float32 storage cast is the only
    rounding step and the oracle replays it with ``CAST(x AS REAL)``.
    ``floor(x+0.5)`` instead of ROUND: Spark and DuckDB disagree on
    ROUND's half-rule for doubles."""
    docs = _with_blob(load_table(spark, sf_dir, "documents"))
    feats = extract_features(docs)
    return feats.select(
        "doc_id",
        F.concat_ws(
            ",",
            F.transform(
                "features",
                lambda v: F.floor(v.cast("double") * 1e6 + F.lit(0.5))
                .cast("long")
                .cast("string"),
            ),
        ).alias("features_csv"),
        F.size("features").alias("dim"),
    )


# the blob is encode(text) and the fixture text is ASCII, so byte values
# are ord() of each char; stats replay the kernel's exact-integer-sum
# formulas (see operators/multimodal.extract_features) and the float32
# storage cast.
_FEATURES_CSV = (
    "array_to_string(list_transform(f, "
    "x -> CAST(CAST(FLOOR(CAST(CAST(x AS REAL) AS DOUBLE) * 1000000 + 0.5) "
    "AS BIGINT) AS VARCHAR)), ',')"
)

_MULTIMODAL_FEATURES_SQL = f"""
WITH ex AS (
  SELECT doc_id,
         UNNEST(list_transform(range(1, length(text) + 1),
                               i -> CAST(ord(text[i]) AS BIGINT))) AS v
  FROM documents WHERE length(text) > 0
),
st AS (
  SELECT doc_id,
    CAST(COUNT(*) AS DOUBLE) AS n,
    CAST(SUM(v) AS DOUBLE) AS s,
    CAST(SUM(v * v) AS DOUBLE) AS ss,
    quantile_cont(CAST(v AS DOUBLE), 0.25) AS q1,
    quantile_cont(CAST(v AS DOUBLE), 0.50) AS q2,
    quantile_cont(CAST(v AS DOUBLE), 0.75) AS q3,
    CAST(MIN(v) AS DOUBLE) AS mn,
    CAST(MAX(v) AS DOUBLE) AS mx
  FROM ex GROUP BY doc_id
),
feat AS (
  SELECT doc_id,
         [s / n, SQRT(GREATEST((ss - s * s / n) / n, 0.0)), q1, q2, q3, mn, mx, n] AS f
  FROM st
  UNION ALL
  SELECT doc_id, [0.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0] AS f
  FROM documents WHERE length(text) = 0
)
SELECT doc_id, {_FEATURES_CSV} AS features_csv, CAST(8 AS INT) AS dim
FROM feat
"""


def q_multimodal_frames(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _with_blob(load_table(spark, sf_dir, "documents"))
    frames = sample_frames(docs, frame_size=64, num_frames=4)
    return frames.select(
        "doc_id", "frame_index", F.octet_length("frame").alias("frame_bytes")
    )


# replay of sample_frames' byte arithmetic (operators/multimodal.py):
# off_i = (i · max(L-64, 0)) // 3, frame i covers [off_i, off_i+64) of an
# L-byte blob → octet_length = min(64, L - off_i); empty blobs emit no
# frames.  Pure integer arithmetic, so the oracle is exact.
_MULTIMODAL_FRAMES_SQL = """
WITH d AS (
  SELECT doc_id, CAST(octet_length(encode(text)) AS BIGINT) AS L
  FROM documents WHERE octet_length(encode(text)) > 0
),
fr AS (SELECT doc_id, UNNEST(range(0, 4)) AS i, L FROM d)
SELECT doc_id,
       CAST(i AS INT) AS frame_index,
       CAST(LEAST(64, L - (i * GREATEST(L - 64, 0)) // 3) AS INT) AS frame_bytes
FROM fr
"""


QUERIES = {
    "dedup_exact": q_dedup_exact,
    "dedup_ngram_jaccard": q_dedup_ngram_jaccard,
    "dedup_minhash_lsh": q_dedup_minhash_lsh,
    "dedup_simhash": q_dedup_simhash,
    "dedup_resolve": q_dedup_resolve,
    "dedup_embedding_cosine": q_dedup_embedding_cosine,
    "ann_cosine_topk": q_ann_cosine_topk,
    "ann_lsh_topk": q_ann_lsh_topk,
    "ann_ivf_topk": q_ann_ivf_topk,
    "ann_recall": q_ann_recall,
    "text_language_id": q_text_language_id,
    "text_quality": q_text_quality,
    "text_token_stats": q_text_token_stats,
    "doc_fingerprint": q_doc_fingerprint,
    "multimodal_meta": q_multimodal_meta,
    "multimodal_features": q_multimodal_features,
}

ORACLES = {
    "dedup_exact": _DEDUP_EXACT_SQL,
    "dedup_ngram_jaccard": _NGRAM_JACCARD_SQL,
    "dedup_minhash_lsh": _MINHASH_SQL,
    "dedup_simhash": _simhash_oracle(_SIMHASH_MAXHAM),
    "dedup_resolve": _RESOLVE_SQL,
    "dedup_embedding_cosine": _emb_neardup_oracle(),
    "ann_cosine_topk": _ANN_COSINE_SQL,
    "ann_lsh_topk": _ann_lsh_oracle(),
    "ann_ivf_topk": _ann_ivf_oracle(),
    "ann_recall": _ann_recall_oracle(),
    "text_language_id": _langid_oracle(),
    "text_quality": _TEXT_QUALITY_SQL,
    "text_token_stats": _TOKEN_STATS_SQL,
    "doc_fingerprint": _FINGERPRINT_SQL,
    "multimodal_meta": _MULTIMODAL_META_SQL,
    "multimodal_features": _MULTIMODAL_FEATURES_SQL,
}

# ---------------------------------------------------------------------------
# pytest-only tier: additional training-data-pipeline coverage beyond the
# driver's 50-entry window (verified by tests/test_oracle_parity.py).

# TF-IDF top terms per document — the classic retrieval / data-curation
# scoring op: tf = cnt/doclen, idf = ln(N/df).  Ranking happens on the
# ROUNDED score: mathematically-equal scores computed via different
# expressions (2·ln(10) vs ln(100)) differ in the last ulp across
# engines, and rounding to 6 dp before ranking makes the tie explicit so
# the term tie-break decides identically on both sides.

def q_text_tfidf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select("doc_id", F.explode(tokens("text")).alias("term"))
    tf = toks.groupBy("doc_id", "term").agg(F.count("*").alias("cnt"))
    dl = toks.groupBy("doc_id").agg(F.count("*").alias("dlen"))
    dfreq = tf.groupBy("term").agg(F.count("*").alias("df"))
    ndocs = docs.agg(F.count("*").alias("n_docs"))
    score = F.round(
        (F.col("cnt").cast("double") / F.col("dlen").cast("double"))
        * F.log(F.col("n_docs").cast("double") / F.col("df").cast("double")),
        6,
    )
    scored = (
        tf.join(dl, "doc_id")
        .join(dfreq, "term")
        .crossJoin(F.broadcast(ndocs))
        .select("doc_id", "term", score.alias("tfidf"))
    )
    from pyspark.sql import Window

    w = Window.partitionBy("doc_id").orderBy(F.col("tfidf").desc(), F.col("term"))
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("int"))
        .filter(F.col("rank") <= 3)
        .select("doc_id", "term", "tfidf", "rank")
    )


_TFIDF_SQL = f"""
WITH toks AS (SELECT doc_id, UNNEST({_TOKS}) AS term FROM documents),
tf AS (SELECT doc_id, term, COUNT(*) AS cnt FROM toks GROUP BY 1, 2),
dl AS (SELECT doc_id, COUNT(*) AS dlen FROM toks GROUP BY 1),
dfreq AS (SELECT term, COUNT(*) AS df FROM tf GROUP BY 1),
nd AS (SELECT COUNT(*) AS n_docs FROM documents),
scored AS (
  SELECT tf.doc_id, tf.term,
         ROUND((CAST(cnt AS DOUBLE) / CAST(dlen AS DOUBLE))
               * LN(CAST(n_docs AS DOUBLE) / CAST(df AS DOUBLE)), 6) AS tfidf
  FROM tf JOIN dl USING (doc_id) JOIN dfreq USING (term) CROSS JOIN nd
),
ranked AS (
  SELECT doc_id, term, tfidf,
         CAST(ROW_NUMBER() OVER (PARTITION BY doc_id
                                 ORDER BY tfidf DESC, term) AS INT) AS rank
  FROM scored
)
SELECT doc_id, term, tfidf, rank FROM ranked WHERE rank <= 3
"""

# vocabulary statistics: top-5 terms per source by raw frequency —
# integer-only, the vocab-building pass of a tokenizer-training pipeline

def q_text_vocab_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    docs = load_table(spark, sf_dir, "documents")
    counts = (
        docs.select("source", F.explode(tokens("text")).alias("term"))
        .groupBy("source", "term")
        .agg(F.count("*").alias("cnt"))
    )
    w = Window.partitionBy("source").orderBy(F.col("cnt").desc(), F.col("term"))
    return (
        counts.withColumn("rank", F.row_number().over(w).cast("int"))
        .filter(F.col("rank") <= 5)
        .select("source", "term", "cnt", "rank")
    )


_VOCAB_SQL = f"""
WITH toks AS (SELECT source, UNNEST({_TOKS}) AS term FROM documents),
counts AS (SELECT source, term, COUNT(*) AS cnt FROM toks GROUP BY 1, 2),
ranked AS (
  SELECT source, term, cnt,
         CAST(ROW_NUMBER() OVER (PARTITION BY source
                                 ORDER BY cnt DESC, term) AS INT) AS rank
  FROM counts
)
SELECT source, term, cnt, rank FROM ranked WHERE rank <= 5
"""

# PII scrub: the fixture corpus is clean, so both engines splice the SAME
# deterministic URLs/emails into the text, then scrub and audit.  The
# md5 of the scrubbed text is the full-content equality check.

def q_text_pii_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions.text import pii_counts, scrub_pii

    docs = load_table(spark, sf_dir, "documents")
    dirty = F.concat(
        F.col("text"),
        F.when(F.col("doc_id") % 7 == 0, F.lit(" contact bob@example.com now"))
        .otherwise(F.lit("")),
        F.when(F.col("doc_id") % 11 == 0, F.lit(" see https://example.com/data?id=1 too"))
        .otherwise(F.lit("")),
    )
    d = docs.select("doc_id", dirty.alias("dirty"))
    return d.select(
        "doc_id",
        pii_counts("dirty").getField("n_urls").alias("n_urls"),
        pii_counts("dirty").getField("n_emails").alias("n_emails"),
        F.length(scrub_pii("dirty")).cast("int").alias("scrubbed_len"),
        F.md5(F.encode(scrub_pii("dirty"), "UTF-8")).alias("scrubbed_md5"),
    )


_PII_SQL = """
WITH d AS (
  SELECT doc_id,
         text
         || CASE WHEN doc_id % 7 = 0 THEN ' contact bob@example.com now' ELSE '' END
         || CASE WHEN doc_id % 11 = 0 THEN ' see https://example.com/data?id=1 too' ELSE '' END
         AS dirty
  FROM documents
),
s AS (
  SELECT doc_id, dirty,
         regexp_replace(regexp_replace(dirty, 'https?://[^\\s]+', '[REDACTED]', 'g'),
                        '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}',
                        '[REDACTED]', 'g') AS scrubbed
  FROM d
)
SELECT doc_id,
  CAST(len(regexp_extract_all(dirty, 'https?://[^\\s]+')) AS INT) AS n_urls,
  CAST(len(regexp_extract_all(regexp_replace(dirty, 'https?://[^\\s]+', '', 'g'),
                              '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}')) AS INT)
    AS n_emails,
  CAST(length(scrubbed) AS INT) AS scrubbed_len,
  md5(scrubbed) AS scrubbed_md5
FROM s
"""

# media-kind routing by magic bytes: the fixture blob is synthesized from
# text, so both engines prepend the SAME deterministic container headers
# (JPEG / PNG / RIFF by doc_id % 4) before classifying

def q_multimodal_magic(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.multimodal import classify_media

    docs = load_table(spark, sf_dir, "documents")
    header = (
        F.when(F.col("doc_id") % 4 == 0, F.lit(bytes.fromhex("FFD8FFE0")))
        .when(F.col("doc_id") % 4 == 1, F.lit(bytes.fromhex("89504E470D0A1A0A")))
        .when(F.col("doc_id") % 4 == 2, F.lit(b"RIFF"))
        .otherwise(F.lit(b""))
    )
    blobs = docs.select(
        "doc_id", F.concat(header, F.encode(F.col("text"), "UTF-8")).alias("blob")
    )
    return classify_media(blobs).select(
        "doc_id", "media_kind", F.octet_length("blob").cast("long").alias("n_bytes")
    )


_MAGIC_SQL = r"""
WITH b AS (
  SELECT doc_id,
    CASE CAST(doc_id % 4 AS INT)
      WHEN 0 THEN '\xFF\xD8\xFF\xE0'::BLOB || encode(text)
      WHEN 1 THEN '\x89\x50\x4E\x47\x0D\x0A\x1A\x0A'::BLOB || encode(text)
      WHEN 2 THEN 'RIFF'::BLOB || encode(text)
      ELSE encode(text)
    END AS blob
  FROM documents
)
SELECT doc_id,
  CASE WHEN substr(hex(blob), 1, 6)  = 'FFD8FF'     THEN 'jpeg'
       WHEN substr(hex(blob), 1, 8)  = '89504E47'   THEN 'png'
       WHEN substr(hex(blob), 1, 8)  = '47494638'   THEN 'gif'
       WHEN substr(hex(blob), 1, 8)  = '52494646'   THEN 'wav'
       WHEN substr(hex(blob), 1, 10) = '255044462D' THEN 'pdf'
       ELSE 'unknown' END AS media_kind,
  CAST(octet_length(blob) AS BIGINT) AS n_bytes
FROM b
"""

# end-to-end curation pipeline: the flagship composition a training-data
# team actually runs — language gate → quality gate → exact dedup
# (lowest-id survivor per content hash) → per-source corpus stats.  One
# dataflow: three map-side expression gates, ONE shuffle for the dedup
# window, one partial+final aggregate.  At 100 TB the gates cut the
# corpus before anything shuffles, which is the whole point of running
# them first.

def q_curation_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions.text import detect_language, quality_score, token_count
    from ..operators.dedup import exact_dedup

    docs = load_table(spark, sf_dir, "documents")
    scored = docs.select(
        "doc_id",
        "source",
        "text",
        detect_language("text").alias("pred_lang"),
        quality_score("text").alias("quality"),
        token_count("text").alias("n_tokens"),
    )
    kept = scored.filter((F.col("pred_lang") == "en") & (F.col("quality") >= 0.36))
    deduped = exact_dedup(kept)
    return deduped.groupBy("source").agg(
        F.count("*").alias("n_docs"),
        F.sum(F.col("n_tokens").cast("bigint")).alias("total_tokens"),
        F.round(F.avg("quality"), 6).alias("avg_quality"),
    )


def _curation_oracle() -> str:
    score_cols = ",\n  ".join(
        "len(list_intersect(dw, ["
        + ", ".join(f"'{s}'" for s in words)
        + f"])) AS s_{lang}"
        for lang, words in LANG_PROFILES
    )
    best = "GREATEST(" + ", ".join(f"s_{lang}" for lang, _ in LANG_PROFILES) + ")"
    case = "CASE " + " ".join(
        f"WHEN s_{lang} = best AND best > 0 THEN '{lang}'" for lang, _ in LANG_PROFILES
    ) + " ELSE 'und' END"
    en_stop = ", ".join(f"'{s}'" for s in LANG_PROFILES[0][1])
    return f"""
WITH t AS (
  SELECT doc_id, source, text, {_TOKS} AS w, list_distinct({_TOKS}) AS dw
  FROM documents
),
scored AS (SELECT doc_id, source, text, w, dw, {score_cols} FROM t),
lang AS (SELECT *, {best} AS best FROM scored),
q AS (
  SELECT doc_id, source, text, {case} AS pred_lang,
    CAST(len(w) AS INT) AS n_tokens,
    ROUND(LEAST(CAST(len(w) AS DOUBLE), 300.0) / 300.0 * 0.2
      + (CASE WHEN len(dw) = 0 THEN 0.0
              ELSE CAST(len(list_intersect(dw, [{en_stop}])) AS DOUBLE)
                   / CAST(len(dw) AS DOUBLE) END) * 0.5
      + (1.0 - CASE WHEN length(text) = 0 THEN 0.0
               ELSE CAST(length(text) - length(regexp_replace(text, '[0-9]', '', 'g')) AS DOUBLE)
                    / CAST(length(text) AS DOUBLE) END) * 0.3, 6) AS quality
  FROM lang
),
kept AS (SELECT * FROM q WHERE pred_lang = 'en' AND quality >= 0.36),
dedup AS (
  SELECT * FROM (
    SELECT *, ROW_NUMBER() OVER (PARTITION BY md5(text) ORDER BY doc_id) AS rn
    FROM kept)
  WHERE rn = 1
)
SELECT source, COUNT(*) AS n_docs,
  CAST(SUM(n_tokens) AS BIGINT) AS total_tokens,
  ROUND(AVG(quality), 6) AS avg_quality
FROM dedup GROUP BY source
"""


# deterministic corpus selection (operators/sampling.py): hash-range
# splits and benchmark decontamination — selection must be reproducible
# across runs/engines/partitionings, so it derives from the portable
# content hash, never from df.sample's partition-seeded RNG.

def q_hash_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic 20% corpus sample (operators/sampling.hash_sample):
    selection derives from the portable content hash, never from
    df.sample's partition-seeded RNG, so the SAME rows are chosen on any
    cluster layout — verified row-for-row, not just by count (VERDICT
    r02 item 8 / r03 item 6)."""
    from ..operators.sampling import hash_sample

    docs = load_table(spark, sf_dir, "documents")
    return hash_sample(docs, 0.2).select("doc_id", "source", "n_chars")


def _hash_sample_oracle() -> str:
    from ..functions.hashing import portable_hash64_sql
    from ..operators.sampling import BUCKETS

    h = portable_hash64_sql("CAST(doc_id AS VARCHAR)", seed="sample")
    return f"""
SELECT doc_id, source, n_chars FROM documents
WHERE ({h}) % {BUCKETS} < {int(0.2 * BUCKETS)}
"""


def q_corpus_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.sampling import hash_split

    docs = load_table(spark, sf_dir, "documents")
    split = hash_split(docs, {"train": 0.8, "val": 0.1, "test": 0.1})
    return split.groupBy("split").agg(
        F.count("*").alias("n_docs"),
        F.sum(F.col("n_chars").cast("bigint")).alias("total_chars"),
    )


def _split_oracle() -> str:
    from ..functions.hashing import portable_hash64_sql

    h = portable_hash64_sql("CAST(doc_id AS VARCHAR)", seed="split")
    return f"""
WITH b AS (SELECT doc_id, n_chars, ({h}) % 10000 AS bkt FROM documents)
SELECT CASE WHEN bkt < 8000 THEN 'train'
            WHEN bkt < 9000 THEN 'val'
            ELSE 'test' END AS split,
       COUNT(*) AS n_docs,
       CAST(SUM(n_chars) AS BIGINT) AS total_chars
FROM b GROUP BY 1
"""


def q_corpus_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark-leak guard: docs sharing any word trigram with the
    'benchmark' slice (doc_id % 97 == 0) are dropped from the train
    side; survivors counted per source."""
    from ..operators.sampling import decontaminate

    docs = load_table(spark, sf_dir, "documents")
    eval_corpus = docs.filter(F.col("doc_id") % 97 == 0)
    train = docs.filter(F.col("doc_id") % 97 != 0)
    clean = decontaminate(train, eval_corpus, n=3)
    return clean.groupBy("source").agg(F.count("*").alias("n_clean"))


_TRIGRAMS = (
    "list_distinct(list_transform(range(1, len(w) - 1), "
    "i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2]))"
)

_DECONTAM_SQL = f"""
WITH toks AS (SELECT doc_id, source, {_TOKS} AS w FROM documents),
sh AS (SELECT doc_id, source, {_TRIGRAMS} AS s FROM toks),
ev AS (SELECT DISTINCT UNNEST(s) AS g FROM sh WHERE doc_id % 97 = 0),
tr AS (SELECT doc_id, source, UNNEST(s) AS g FROM sh WHERE doc_id % 97 <> 0),
tainted AS (SELECT DISTINCT tr.doc_id FROM tr JOIN ev ON tr.g = ev.g)
SELECT d.source, COUNT(*) AS n_clean
FROM documents d
WHERE d.doc_id % 97 <> 0
  AND NOT EXISTS (SELECT 1 FROM tainted t WHERE t.doc_id = d.doc_id)
GROUP BY d.source
"""


# --- repetition quality signals + corpus-wide paragraph dedup --------------
# Round-4 additions (functions/repetition.py, operators/paragraphs.py):
# the Gopher-style repetition gate and the C4-style first-owner
# paragraph dedup, both fully SQL-expressible → exact oracles.

def q_text_repetition(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions.repetition import (
        MAX_DUP_LINE_FRAC,
        MAX_DUP_PARAGRAPH_FRAC,
        MAX_TOP_BIGRAM_FRAC,
        dup_line_frac,
        dup_paragraph_frac,
        top_bigram_frac,
    )

    docs = load_table(spark, sf_dir, "documents")
    # two-step projection: each HOF signal (CodegenFallback, no
    # subexpression elimination) evaluates ONCE; the flag and the
    # rounded outputs derive from the materialized columns
    raw = docs.select(
        "doc_id",
        dup_line_frac("text").alias("_lf"),
        dup_paragraph_frac("text").alias("_pf"),
        top_bigram_frac("text").alias("_gf"),
    )
    return raw.select(
        "doc_id",
        F.round("_lf", 6).alias("dup_line_frac"),
        F.round("_pf", 6).alias("dup_paragraph_frac"),
        F.round("_gf", 6).alias("top_bigram_frac"),
        (
            (F.col("_lf") > MAX_DUP_LINE_FRAC)
            | (F.col("_pf") > MAX_DUP_PARAGRAPH_FRAC)
            | (F.col("_gf") > MAX_TOP_BIGRAM_FRAC)
        ).alias("repetition_flagged"),
    )


def _repetition_oracle() -> str:
    # thresholds + whitespace class interpolated from the SHARED
    # constants (functions/repetition.py, functions/text.py) so editing
    # the Python side can never silently desync the oracle (ADVICE r04)
    from ..functions.repetition import (
        MAX_DUP_LINE_FRAC,
        MAX_DUP_PARAGRAPH_FRAC,
        MAX_TOP_BIGRAM_FRAC,
    )
    from ..functions.text import WS_SPLIT_RE

    return rf"""
WITH base AS (
  SELECT doc_id,
    list_filter(str_split(text, chr(10)), p -> trim(p) <> '') AS ln,
    list_filter(str_split(text, chr(10) || chr(10)), p -> trim(p) <> '') AS pr,
    list_filter(str_split_regex(lower(text), '{WS_SPLIT_RE}'), t -> t <> '') AS toks
  FROM documents
),
bg AS (
  SELECT doc_id, ln, pr,
    list_transform(range(1, greatest(len(toks), 1)), i ->
      list_extract(toks, i) || ' ' || list_extract(toks, i + 1)) AS g
  FROM base
),
sc AS (
  SELECT doc_id,
    CASE WHEN len(ln) = 0 THEN 0.0
         ELSE 1.0 - CAST(len(list_distinct(ln)) AS DOUBLE) / len(ln) END AS lf,
    CASE WHEN len(pr) = 0 THEN 0.0
         ELSE 1.0 - CAST(len(list_distinct(pr)) AS DOUBLE) / len(pr) END AS pf,
    CASE WHEN len(g) = 0 THEN 0.0 ELSE
      CAST(list_max(list_transform(list_distinct(g),
           x -> len(list_filter(g, y -> y = x)))) AS DOUBLE) / len(g)
    END AS gf
  FROM bg
)
SELECT doc_id, ROUND(lf, 6) AS dup_line_frac, ROUND(pf, 6) AS dup_paragraph_frac,
       ROUND(gf, 6) AS top_bigram_frac,
       (lf > {MAX_DUP_LINE_FRAC} OR pf > {MAX_DUP_PARAGRAPH_FRAC}
        OR gf > {MAX_TOP_BIGRAM_FRAC}) AS repetition_flagged
FROM sc
"""


def q_paragraph_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.paragraphs import paragraph_dedup

    docs = load_table(spark, sf_dir, "documents")
    return paragraph_dedup(docs)


_PARAGRAPH_DEDUP_SQL = """
WITH px AS (
  SELECT doc_id, unnest(ps) AS paragraph, generate_subscripts(ps, 1) AS idx
  FROM (SELECT doc_id, str_split(text, chr(10) || chr(10)) AS ps FROM documents)
),
pnz AS (SELECT * FROM px WHERE trim(paragraph) <> ''),
first AS (
  SELECT doc_id, idx, paragraph FROM
    (SELECT *, ROW_NUMBER() OVER (PARTITION BY paragraph ORDER BY doc_id, idx) AS rn
     FROM pnz)
  WHERE rn = 1
),
rebuilt AS (
  SELECT doc_id, string_agg(paragraph, chr(10) || chr(10) ORDER BY idx) AS dedup_text
  FROM first GROUP BY doc_id
)
SELECT d.doc_id, COALESCE(r.dedup_text, '') AS dedup_text
FROM documents d LEFT JOIN rebuilt r ON d.doc_id = r.doc_id
"""


# --- quality-gated sampling (quantile threshold as broadcast scalar) -------

_QGATE_LOW_RATE_BUCKETS = 2500  # below-median tier kept at 25%


def q_quality_gated_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Curation by quality quantile: at-or-above the exact median
    survives whole; the below-median tier is hash-downsampled to 25%.

    The threshold is an exact interpolated percentile computed as a
    1-row BROADCAST scalar — never a global NTILE/rank window (banned
    repo-wide: a partition-less window single-threads the corpus).
    Both engines interpolate identically (Spark PERCENTILE ≡ DuckDB
    QUANTILE_CONT) over the round-6 quality scores, so the >= gate is
    deterministic cross-engine."""
    from ..functions.hashing import portable_hash64

    docs = load_table(spark, sf_dir, "documents")
    scored = docs.select("doc_id", quality_score("text").alias("quality"))
    thr = scored.agg(F.percentile("quality", F.lit(0.5)).alias("_thr"))
    keep_low = (
        F.pmod(
            portable_hash64(F.col("doc_id").cast("string"), seed="qgate"),
            F.lit(10000),
        )
        < _QGATE_LOW_RATE_BUCKETS
    )
    premium = F.col("quality") >= F.col("_thr")
    return (
        scored.join(F.broadcast(thr))
        .filter(premium | keep_low)
        .select("doc_id", "quality", premium.alias("premium"))
    )


def _qgate_oracle() -> str:
    from ..functions.hashing import portable_hash64_sql

    h = portable_hash64_sql("CAST(doc_id AS VARCHAR)", seed="qgate")
    return f"""
WITH s AS (SELECT doc_id, quality FROM ({_TEXT_QUALITY_SQL})),
t AS (SELECT quantile_cont(quality, 0.5) AS thr FROM s)
SELECT doc_id, quality, quality >= thr AS premium
FROM s, t
WHERE quality >= thr OR ({h}) % 10000 < {_QGATE_LOW_RATE_BUCKETS}
"""


# --- token-window chunking + stratified corpus rebalancing -----------------

_CHUNK_W, _CHUNK_OVERLAP = 32, 8
_CHUNK_STRIDE = _CHUNK_W - _CHUNK_OVERLAP


def q_text_chunking(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.chunking import chunk_documents

    docs = load_table(spark, sf_dir, "documents")
    return chunk_documents(
        docs, chunk_tokens=_CHUNK_W, overlap=_CHUNK_OVERLAP
    )


_CHUNK_SQL = rf"""
WITH toks AS (
  SELECT doc_id,
    list_filter(str_split_regex(text, '{WS_SPLIT_RE}'), t -> t <> '') AS w
  FROM documents
),
nz AS (SELECT doc_id, w, len(w) AS n FROM toks WHERE len(w) > 0),
st AS (SELECT doc_id, w, n,
       unnest(range(1, greatest(n - {_CHUNK_OVERLAP}, 1) + 1, {_CHUNK_STRIDE})) AS s
       FROM nz)
SELECT doc_id,
       CAST((s - 1) // {_CHUNK_STRIDE} AS INT) AS chunk_id,
       CAST(len(list_slice(w, s, least(s + {_CHUNK_W - 1}, n))) AS INT) AS n_tokens,
       array_to_string(list_slice(w, s, least(s + {_CHUNK_W - 1}, n)), ' ') AS chunk_text
FROM st
"""

#: language rebalancing recipe — zh deliberately absent (dropped), the
#: others at staggered rates, exercising both semantics of the operator
_STRAT_FRACTIONS = {"en": 0.25, "de": 0.5, "fr": 0.75, "es": 1.0}


def q_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.sampling import stratified_sample

    docs = load_table(spark, sf_dir, "documents")
    return stratified_sample(docs, "lang", _STRAT_FRACTIONS).select("doc_id", "lang")


def _stratified_oracle() -> str:
    from ..functions.hashing import portable_hash64_sql
    from ..operators.sampling import BUCKETS

    h = portable_hash64_sql("CAST(doc_id AS VARCHAR)", seed="strat")
    arms = " ".join(
        f"WHEN '{k}' THEN ({h}) % {BUCKETS} < {int(v * BUCKETS)}"
        for k, v in _STRAT_FRACTIONS.items()
    )
    return f"""
SELECT doc_id, lang FROM documents
WHERE CASE lang {arms} ELSE FALSE END
"""


# the flagship curation composition is DRIVER-tier (promoted in round 2);
# it is defined below with the other composition queries, so register it
# here after the definitions
QUERIES["curation_pipeline"] = q_curation_pipeline
ORACLES["curation_pipeline"] = _curation_oracle()

# deterministic hash sampling is DRIVER-tier as of round 4 (VERDICT r03
# item 6): the selection layer of every corpus pipeline, verified
# row-for-row
QUERIES["hash_sample"] = q_hash_sample
ORACLES["hash_sample"] = _hash_sample_oracle()

# round-5 flagships (lexical BM25, hybrid BM25+cosine RRF) are
# DRIVER-tier per the r04 item-2 rotation policy; they are defined and
# registered below, after their oracle builders.

# ---------------------------------------------------------------------------
# Round-5: lexical retrieval + hybrid fusion (operators/retrieval.py).
# BM25 and RRF are fully SQL-expressible → exact oracles; MMR is greedy/
# iterative → weak-checked here, exactness vs a pure-numpy reference in
# tests/test_retrieval.py.

_HYBRID_QPRED = "doc_id % 100 = 7"
_HYBRID_LEG_K = 20
_HYBRID_K = 10


def _retrieval_queries(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.retrieval import queries_from_docs

    docs = load_table(spark, sf_dir, "documents")
    return queries_from_docs(docs, F.expr(_HYBRID_QPRED))


def q_bm25_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.retrieval import bm25_topk

    docs = load_table(spark, sf_dir, "documents")
    return bm25_topk(docs, _retrieval_queries(spark, sf_dir), _HYBRID_K)


def q_hybrid_rrf(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.retrieval import hybrid_rrf_topk

    docs = load_table(spark, sf_dir, "documents")
    emb = load_table(spark, sf_dir, "embeddings")
    q = _retrieval_queries(spark, sf_dir).join(
        emb.select(
            F.col("vec_id").alias("query_id"), F.col("embedding").alias("qvec")
        ),
        "query_id",
        "left",
    )
    return hybrid_rrf_topk(docs, emb, q, _HYBRID_K, leg_k=_HYBRID_LEG_K)


def q_mmr_rerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Diversity re-rank of an exact-cosine top-20 candidate list
    (weak-checked: greedy selection has no SQL form; exactness vs a
    pure-numpy reference lives in tests/test_retrieval.py)."""
    from ..operators.retrieval import mmr_rerank

    emb = load_table(spark, sf_dir, "embeddings")
    q = emb.filter(F.col("vec_id") % 250 == 2).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qvec")
    )
    cands = cosine_topk(emb, q, 20).join(
        emb.select(F.col("vec_id").alias("id"), "embedding"), "id"
    )
    out = mmr_rerank(cands, 5, lambda_=0.7)
    return out.select(
        "query_id", "id", F.round("relevance", 6).alias("relevance"), "rank"
    )


def _bm25_scored_ctes(
    leg_k: int | None = None,
    qpred: str = _HYBRID_QPRED,
    docs_rel: str = "documents",
) -> str:
    """Shared BM25 CTE chain ending in ``bm25_ranked (query_id, id,
    score6, brank)``; thresholds interpolate the Python constants
    (oracle-drift lesson, ADVICE r04).  ``docs_rel`` swaps the corpus
    relation (the doc-mutations oracle replays the LWW fold as a CTE
    and scores over it)."""
    from ..operators.retrieval import BM25_B, BM25_K1

    return f"""
toks AS (SELECT doc_id, {_TOKS} AS w FROM {docs_rel}),
q AS (SELECT doc_id AS query_id, list_distinct(list_slice(w, 1, 3)) AS qts
      FROM toks WHERE {qpred}),
qt AS (SELECT query_id, UNNEST(qts) AS term FROM q),
dl AS (SELECT doc_id AS id, len(w) AS dl FROM toks),
tfx AS (SELECT doc_id AS id, UNNEST(w) AS term FROM toks),
tfc AS (SELECT id, term, COUNT(*) AS tf FROM tfx GROUP BY 1, 2),
stats AS (SELECT COUNT(*) AS n_docs, AVG(CAST(dl AS DOUBLE)) AS avgdl FROM dl),
dfq AS (SELECT term, COUNT(DISTINCT id) AS df FROM tfc
        WHERE term IN (SELECT DISTINCT term FROM qt) GROUP BY 1),
bm25_scored AS (
  SELECT qt.query_id, tfc.id,
         SUM(LN(1.0 + (s.n_docs - d.df + 0.5) / (d.df + 0.5))
             * (tfc.tf * ({BM25_K1} + 1.0))
             / (tfc.tf + {BM25_K1} * (1.0 - {BM25_B}
                + {BM25_B} * CAST(dl.dl AS DOUBLE) / s.avgdl))) AS score
  FROM qt
  JOIN tfc ON tfc.term = qt.term
  JOIN dfq d ON d.term = qt.term
  JOIN dl ON dl.id = tfc.id
  CROSS JOIN stats s
  GROUP BY 1, 2
),
bm25_ranked AS (
  SELECT query_id, id, score6,
         CAST(ROW_NUMBER() OVER (PARTITION BY query_id
                                 ORDER BY score6 DESC, id) AS INT) AS brank
  FROM (SELECT query_id, id, ROUND(score, 6) AS score6 FROM bm25_scored)
)"""


def _bm25_oracle() -> str:
    return f"""
WITH {_bm25_scored_ctes()}
SELECT query_id, id, score6 AS score, brank AS rank
FROM bm25_ranked WHERE brank <= {_HYBRID_K}
"""


def _hybrid_oracle() -> str:
    from ..operators.retrieval import RRF_K

    cos = _SQL_COSINE.format(x="vq.qv", y="v.embedding")
    return f"""
WITH {_bm25_scored_ctes()},
vq AS (SELECT q.query_id, e.embedding AS qv FROM q
       JOIN embeddings e ON e.vec_id = q.query_id),
vs AS (SELECT vq.query_id, v.vec_id AS id, ROUND({cos}, 6) AS cos
       FROM vq CROSS JOIN embeddings v),
vr AS (SELECT query_id, id,
              CAST(ROW_NUMBER() OVER (PARTITION BY query_id
                                      ORDER BY cos DESC, id) AS INT) AS rank
       FROM vs),
legs AS (
  SELECT query_id, id, rank FROM vr WHERE rank <= {_HYBRID_LEG_K}
  UNION ALL
  SELECT query_id, id, brank AS rank FROM bm25_ranked WHERE brank <= {_HYBRID_LEG_K}
),
fused AS (SELECT query_id, id, ROUND(SUM(1.0 / ({RRF_K} + rank)), 6) AS rrf
          FROM legs GROUP BY 1, 2)
SELECT query_id, id, rrf, rank FROM (
  SELECT *, CAST(ROW_NUMBER() OVER (PARTITION BY query_id
                                    ORDER BY rrf DESC, id) AS INT) AS rank
  FROM fused)
WHERE rank <= {_HYBRID_K}
"""


# --- streaming posting-index end-to-end row (round 6, VERDICT r05
# item 9): the lexical analog of ivf_stream_topk.  The merge-on-read
# posting store ingests the corpus as base + two appended batches, takes
# a crash-REDELIVERED batch, compacts, then takes the same batch
# redelivered AGAIN across the compaction boundary (the ADVICE r05
# stats-log contract) — and its search must equal the from-scratch BM25
# over the full corpus, which is exactly what the DuckDB oracle
# computes.  Pytest tier this round (the window is full at 50); the
# natural round-7 rotation candidate.

_BM25_STREAM_QPRED = "doc_id % 100 = 13"
_BM25_STREAM_STATE: dict[str, object] = {}


def bm25_stream_store(spark: SparkSession, sf_dir: str):
    import os as _os
    import tempfile

    from ..sources.posting_index import PostingIndexStore

    store = _BM25_STREAM_STATE.get(sf_dir)
    if store is None:
        docs = load_table(spark, sf_dir, "documents")
        name = _os.path.basename(_os.path.normpath(sf_dir)) or "sf"
        root = _os.path.join(
            tempfile.gettempdir(), f"dvss_spark_bm25stream_{_os.getpid()}", name
        )
        store = PostingIndexStore(root)
        store.init_base(docs.filter(F.col("doc_id") % 5 < 3))
        store.append_batch(docs.filter(F.col("doc_id") % 5 == 3), 1)
        store.append_batch(docs.filter(F.col("doc_id") % 5 == 4), 2)
        store.append_batch(docs.filter(F.col("doc_id") % 5 == 3), 1)  # redelivery
        store.compact(spark)
        # redelivery ACROSS the compaction boundary: batch ids are
        # preserved by compact(), so this must also change nothing
        store.append_batch(docs.filter(F.col("doc_id") % 5 == 4), 2)
        _BM25_STREAM_STATE[sf_dir] = store
    return store


def q_bm25_stream_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.retrieval import queries_from_docs

    store = bm25_stream_store(spark, sf_dir)
    docs = load_table(spark, sf_dir, "documents")
    q = queries_from_docs(docs, F.expr(_BM25_STREAM_QPRED))
    return store.search(spark, q, _HYBRID_K)


def _bm25_stream_oracle() -> str:
    return f"""
WITH {_bm25_scored_ctes(qpred=_BM25_STREAM_QPRED)}
SELECT query_id, id, score6 AS score, brank AS rank
FROM bm25_ranked WHERE brank <= {_HYBRID_K}
"""


# --- fully-indexed hybrid search (round 6) ---------------------------------
# hybrid_rrf serves both legs from scratch (corpus re-scan per batch);
# hybrid_indexed_rrf is the 100 TB serving shape — lexical leg from the
# persisted posting index (term-pushdown, no text read), vector leg from
# the persisted IVF index (cell_id PartitionFilters).  The oracle
# replays EVERYTHING: the BM25 chain, the thinned-centroid selection,
# cell assignment, probe routing, the per-query L2 leg, and the RRF
# fusion — so the pytest tier checks the composed indexed plan end to
# end against ground truth.

_HYBRID_IDX_STATE: dict[str, str] = {}


def _hybrid_posting_index(spark: SparkSession, sf_dir: str) -> str:
    import os as _os
    import tempfile

    from ..sources.posting_index import write_posting_index

    path = _HYBRID_IDX_STATE.get(sf_dir)
    if path is None:
        name = _os.path.basename(_os.path.normpath(sf_dir)) or "sf"
        path = _os.path.join(
            tempfile.gettempdir(), f"dvss_spark_posting_{_os.getpid()}", name
        )
        write_posting_index(load_table(spark, sf_dir, "documents"), path)
        _HYBRID_IDX_STATE[sf_dir] = path
    return path


def q_bm25_index_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25 served from the persisted posting index — same queries as
    the bm25_topk driver row, and by the index's exactness contract the
    same results, so the row REUSES bm25_topk's oracle verbatim (the
    mutations_compact_bucketed pattern: layout changes, values don't)."""
    from ..sources.posting_index import bm25_search_index

    path = _hybrid_posting_index(spark, sf_dir)
    return bm25_search_index(
        spark, path, _retrieval_queries(spark, sf_dir), _HYBRID_K
    )


def q_hybrid_indexed_rrf(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.retrieval import hybrid_rrf_indexed_topk
    from .vector import _IVF_NPROBE, persisted_ivf_index

    posting = _hybrid_posting_index(spark, sf_dir)
    ivf_path, cents = persisted_ivf_index(spark, sf_dir)
    emb = load_table(spark, sf_dir, "embeddings")
    q = _retrieval_queries(spark, sf_dir).join(
        emb.select(
            F.col("vec_id").alias("query_id"), F.col("embedding").alias("qvec")
        ),
        "query_id",
        "left",
    )
    return hybrid_rrf_indexed_topk(
        spark, posting, ivf_path, cents, q, _HYBRID_K,
        leg_k=_HYBRID_LEG_K, n_probe=_IVF_NPROBE,
    )


def _hybrid_indexed_oracle() -> str:
    from ..functions.hashing import portable_hash64_sql
    from ..operators.retrieval import RRF_K
    from ..operators.similarity import IVF_THIN_SEED
    from .vector import _IVF_NPROBE, _IVF_NUM_CELLS, _SQL_SQ_L2

    h = portable_hash64_sql("CAST(vec_id AS VARCHAR)", seed=IVF_THIN_SEED)
    l2_vc = _SQL_SQ_L2.format(q="v.embedding", v="c.cvec")
    l2_qc = _SQL_SQ_L2.format(q="iq.qe", v="c.cvec")
    l2_qa = _SQL_SQ_L2.format(q="qp.qe", v="a.embedding")
    return f"""
WITH {_bm25_scored_ctes()},
nt AS (SELECT GREATEST(COUNT(*) // {_IVF_NUM_CELLS * 4}, 1) AS step FROM embeddings),
sel AS (
  SELECT vec_id, embedding FROM embeddings, nt
  WHERE ({h}) % step = 0
  ORDER BY vec_id LIMIT {_IVF_NUM_CELLS}
),
cents AS (
  SELECT CAST(ROW_NUMBER() OVER (ORDER BY vec_id) - 1 AS INT) AS cell_id,
         embedding AS cvec
  FROM sel
),
vd AS (SELECT v.vec_id, v.embedding, c.cell_id, {l2_vc} AS d
       FROM embeddings v CROSS JOIN cents c),
asg AS (SELECT vec_id, embedding, cell_id FROM
        (SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY d, cell_id) AS rn
         FROM vd)
        WHERE rn = 1),
iq AS (SELECT q.query_id, e.embedding AS qe FROM q
       JOIN embeddings e ON e.vec_id = q.query_id),
qd AS (SELECT iq.query_id, iq.qe, c.cell_id, {l2_qc} AS d FROM iq CROSS JOIN cents c),
qp AS (SELECT query_id, qe, cell_id FROM
       (SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY d, cell_id) AS rn
        FROM qd)
       WHERE rn <= {_IVF_NPROBE}),
iscored AS (SELECT qp.query_id, a.vec_id AS id, ROUND({l2_qa}, 6) AS distance
            FROM qp JOIN asg a ON a.cell_id = qp.cell_id),
iranked AS (SELECT query_id, id,
            CAST(ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY distance, id) AS INT) AS rank
            FROM iscored),
legs AS (
  SELECT query_id, id, rank FROM iranked WHERE rank <= {_HYBRID_LEG_K}
  UNION ALL
  SELECT query_id, id, brank AS rank FROM bm25_ranked WHERE brank <= {_HYBRID_LEG_K}
),
fused AS (SELECT query_id, id, ROUND(SUM(1.0 / ({RRF_K} + rank)), 6) AS rrf
          FROM legs GROUP BY 1, 2)
SELECT query_id, id, rrf, rank FROM (
  SELECT *, CAST(ROW_NUMBER() OVER (PARTITION BY query_id
                                    ORDER BY rrf DESC, id) AS INT) AS rank
  FROM fused)
WHERE rank <= {_HYBRID_K}
"""


# --- filtered lexical search (round 6) --------------------------------------
# The BM25 analog of the filtered-ANN contract: results restricted to
# metadata-matching docs, idf / N / avgdl corpus-level (per-doc scores
# are independent given the stats, so the filtered ranking equals the
# unfiltered ranking restricted to matching docs).

_BM25_FILTER_PRED = "source IN ('src1', 'src2', 'src3', 'src4', 'src5')"


def q_bm25_filtered(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.retrieval import bm25_topk

    docs = load_table(spark, sf_dir, "documents")
    return bm25_topk(
        docs, _retrieval_queries(spark, sf_dir), _HYBRID_K,
        where=_BM25_FILTER_PRED,
    )


def _bm25_filtered_oracle() -> str:
    return f"""
WITH {_bm25_scored_ctes()},
flt AS (
  SELECT query_id, id, ROUND(score, 6) AS score6 FROM bm25_scored
  WHERE id IN (SELECT doc_id FROM documents WHERE {_BM25_FILTER_PRED})
)
SELECT query_id, id, score6 AS score, rank FROM (
  SELECT *, CAST(ROW_NUMBER() OVER (PARTITION BY query_id
                                    ORDER BY score6 DESC, id) AS INT) AS rank
  FROM flt)
WHERE rank <= {_HYBRID_K}
"""


# --- per-source quota sampling (round 5) ----------------------------------

_CAP_PER_SOURCE = 20


def q_capped_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """At most N docs per source by stable hash order (crawl-curation
    domain quota; operators/sampling.capped_per_key_sample)."""
    from ..operators.sampling import capped_per_key_sample

    docs = load_table(spark, sf_dir, "documents")
    return capped_per_key_sample(docs, "source", _CAP_PER_SOURCE).select(
        "doc_id", "source"
    )


def _capped_sample_oracle() -> str:
    from ..functions.hashing import portable_hash64_sql

    h = portable_hash64_sql("CAST(doc_id AS VARCHAR)", seed="cap")
    return f"""
SELECT doc_id, source FROM (
  SELECT doc_id, source,
         ROW_NUMBER() OVER (PARTITION BY source ORDER BY ({h}), doc_id) AS rk
  FROM documents
) WHERE rk <= {_CAP_PER_SOURCE}
"""


# driver-tier registration of the round-5 retrieval flagships (see the
# rotation note above hash_sample)
QUERIES["bm25_topk"] = q_bm25_topk
ORACLES["bm25_topk"] = _bm25_oracle()
QUERIES["hybrid_rrf"] = q_hybrid_rrf
ORACLES["hybrid_rrf"] = _hybrid_oracle()

# round-7 rotation (VERDICT r06 item 2): the round-6 retrieval
# flagships — fully-indexed hybrid, streaming posting store, filtered
# lexical, indexed BM25 — move INTO the driver window so the
# independent oracle checks them (four thin relational rows demoted in
# exchange — registry/relational.py)
QUERIES["hybrid_indexed_rrf"] = q_hybrid_indexed_rrf
ORACLES["hybrid_indexed_rrf"] = _hybrid_indexed_oracle()
QUERIES["bm25_stream_topk"] = q_bm25_stream_topk
ORACLES["bm25_stream_topk"] = _bm25_stream_oracle()
QUERIES["bm25_filtered"] = q_bm25_filtered
ORACLES["bm25_filtered"] = _bm25_filtered_oracle()
QUERIES["bm25_index_topk"] = q_bm25_index_topk
# the index serves IDENTICAL numbers to the from-scratch plan
ORACLES["bm25_index_topk"] = _bm25_oracle()


# --- TextEngine doc-mutation serving (round 7): the lexical analog of
# knn_after_mutations — leader-ordered upsert/replace/delete on the
# documents table (reference M1/M2/R11 semantics via
# operators/mutations.apply_mutations), STRONG-gated, served from the
# per-epoch posting index (text_engine.TextEngine).  The oracle replays
# the LWW fold as a docs_mut CTE and runs the identical BM25 chain over
# it; mutated ids are chosen OFF the query predicate (% 100 = 7) so the
# query set is byte-identical on both engines.
_DOCMUT_REPLACE = (13, "vector batch vector window vector merge")
_DOCMUT_INSERT = (10_000_013, "window window batch vector key stream")
_DOCMUT_DELETE = 17


def q_bm25_doc_mutations(spark: SparkSession, sf_dir: str) -> DataFrame:
    import os
    import tempfile

    from ..text_engine import TextEngine

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    eng = TextEngine(spark, docs)
    eng.attach_index(
        os.path.join(tempfile.gettempdir(), f"dvss_spark_textmut_{os.getpid()}")
    )
    eng.upsert_doc(*_DOCMUT_REPLACE)
    eng.upsert_doc(*_DOCMUT_INSERT)
    eng.delete_doc(_DOCMUT_DELETE)
    return eng.search(
        _retrieval_queries(spark, sf_dir), _HYBRID_K,
        consistency="strong", method="indexed",
    )


_TEMP_TAU = 2.0


def q_temperature_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-based source rebalancing (operators/sampling.
    temperature_sample, the multilingual-BERT/mT5 exponentiated mixing
    rule at τ=2): over-represented sources are hash-downsampled toward
    ``q_s ∝ (n_s/N)^(1/τ)``; the scarcest source keeps every row.  The
    oracle replays the closed-form rate (the normalizer cancels:
    ``rate_s = n_s^(1/τ−1) / max_t n_t^(1/τ−1)``) and the identical
    portable-hash bucket rule."""
    from ..operators.sampling import temperature_sample

    docs = load_table(spark, sf_dir, "documents")
    return temperature_sample(docs, _TEMP_TAU).select("doc_id", "source")


def _temperature_sample_oracle() -> str:
    from ..functions.hashing import portable_hash64_sql
    from ..operators.sampling import BUCKETS

    expo = 1.0 / _TEMP_TAU - 1.0
    h = portable_hash64_sql("CAST(d.doc_id AS VARCHAR)", seed="temp")
    return f"""
WITH c AS (
  SELECT source, POW(CAST(COUNT(*) AS DOUBLE), {expo!r}) AS w
  FROM documents GROUP BY 1
),
r AS (SELECT source, w / (SELECT MAX(w) FROM c) AS rate FROM c)
SELECT d.doc_id, d.source
FROM documents d JOIN r USING (source)
WHERE (({h}) % {BUCKETS}) < ROUND(rate * {BUCKETS}, 0)
"""


_PACK_BUDGET = 512


def q_corpus_pack(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GPT-style sequence-packing layout (operators/chunking.
    pack_sequences): documents laid into fixed 512-token training
    windows by a DISTRIBUTED two-level prefix-sum; the oracle replays
    the equivalent single-window running sum (integer addition is
    associative, so the two forms agree exactly)."""
    from ..operators.chunking import pack_sequences

    docs = load_table(spark, sf_dir, "documents")
    return pack_sequences(docs, _PACK_BUDGET)


def _corpus_pack_oracle() -> str:
    return f"""
WITH toks AS (
  SELECT doc_id AS id, CAST(len({_TOKS}) AS BIGINT) AS n_tokens FROM documents
),
c AS (
  SELECT id, n_tokens,
         CAST(COALESCE(SUM(n_tokens) OVER (
           ORDER BY id ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
         ), 0) AS BIGINT) AS cum
  FROM toks
)
SELECT id, n_tokens,
       CAST(cum // {_PACK_BUDGET} AS BIGINT) AS bin_id,
       CAST(cum % {_PACK_BUDGET} AS BIGINT) AS bin_offset
FROM c
"""


def q_hybrid_engine_rrf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The ENGINE-SERVED hybrid front door (text_engine.HybridEngine):
    full-probe cosine-IVF vector leg + per-epoch posting-index lexical
    leg, fused under one consistency level — independently checked
    against the SAME DuckDB oracle as the from-scratch ``hybrid_rrf``
    (at full probe coverage the engine path equals it exactly; both
    legs rank on 6-decimal-rounded scores)."""
    import os
    import tempfile

    from ..engine import VectorEngine
    from ..text_engine import HybridEngine, TextEngine

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    emb = load_table(spark, sf_dir, "embeddings")
    root = os.path.join(
        tempfile.gettempdir(), f"dvss_spark_hybeng_{os.getpid()}"
    )
    ve = VectorEngine(spark, emb)
    ve.attach_index(os.path.join(root, "vec"), num_cells=8, n_probe=8)
    te = TextEngine(spark, docs)
    te.attach_index(os.path.join(root, "lex"))
    q = _retrieval_queries(spark, sf_dir).join(
        emb.select(
            F.col("vec_id").alias("query_id"), F.col("embedding").alias("qvec")
        ),
        "query_id",
        "left",
    )
    return HybridEngine(ve, te).search(
        q, _HYBRID_K, leg_k=_HYBRID_LEG_K,
        vector_method="cosine_ivf", text_method="indexed",
    )


def q_bm25_store_mutations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The IDENTICAL doc-mutation scenario served from the INCREMENTAL
    LWW posting store (sources/posting_index.MutablePostingIndexStore)
    instead of the per-epoch rebuild tier — O(Δ) maintenance, same
    oracle: store state must equal the compacted snapshot by
    construction."""
    import os
    import tempfile

    from ..text_engine import TextEngine

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    eng = TextEngine(spark, docs)
    root = os.path.join(
        tempfile.gettempdir(), f"dvss_spark_textstore_{os.getpid()}"
    )
    import shutil

    shutil.rmtree(root, ignore_errors=True)  # stale manifest from a prior run
    eng.attach_store(root)
    eng.upsert_doc(*_DOCMUT_REPLACE)
    eng.upsert_doc(*_DOCMUT_INSERT)
    eng.delete_doc(_DOCMUT_DELETE)
    return eng.search(
        _retrieval_queries(spark, sf_dir), _HYBRID_K,
        consistency="strong", method="store",
    )


def _bm25_doc_mutations_oracle() -> str:
    rid, rtext = _DOCMUT_REPLACE
    iid, itext = _DOCMUT_INSERT
    return f"""
WITH docs_mut AS (
  SELECT doc_id, text FROM documents
  WHERE doc_id NOT IN ({rid}, {iid}, {_DOCMUT_DELETE})
  UNION ALL SELECT CAST({rid} AS BIGINT), '{rtext}'
  UNION ALL SELECT CAST({iid} AS BIGINT), '{itext}'
),
{_bm25_scored_ctes(docs_rel="docs_mut")}
SELECT query_id, id, score6 AS score, brank AS rank
FROM bm25_ranked WHERE brank <= {_HYBRID_K}
"""


# round-7 rotation: the TextEngine doc-mutation serving row joins the
# driver window (the round's new engine surface under the independent
# oracle); multimodal_frames moves to the pytest tier with the identical
# DuckDB comparison (multimodal keeps meta+features driver-green).
QUERIES["bm25_doc_mutations"] = q_bm25_doc_mutations
ORACLES["bm25_doc_mutations"] = _bm25_doc_mutations_oracle()

EXTRA_QUERIES: dict = {
    "temperature_sample": q_temperature_sample,
    "corpus_pack": q_corpus_pack,
    "hybrid_engine_rrf": q_hybrid_engine_rrf,
    "bm25_store_mutations": q_bm25_store_mutations,
    "multimodal_frames": q_multimodal_frames,
    "text_tfidf_topk": q_text_tfidf_topk,
    "text_vocab_topk": q_text_vocab_topk,
    "text_pii_scrub": q_text_pii_scrub,
    "multimodal_magic": q_multimodal_magic,
    "corpus_split": q_corpus_split,
    "corpus_decontaminate": q_corpus_decontaminate,
    "text_repetition": q_text_repetition,
    "paragraph_dedup": q_paragraph_dedup,
    "text_chunking": q_text_chunking,
    "stratified_sample": q_stratified_sample,
    "quality_gated_sample": q_quality_gated_sample,
    "mmr_rerank": q_mmr_rerank,
    "capped_sample": q_capped_sample,
    "dedup_simhash_loose": q_dedup_simhash_loose,
}
EXTRA_ORACLES: dict = {
    "temperature_sample": _temperature_sample_oracle(),
    "corpus_pack": _corpus_pack_oracle(),
    # the engine-served hybrid equals the from-scratch hybrid at full
    # probe — the SAME oracle independently checks both paths
    "hybrid_engine_rrf": _hybrid_oracle(),
    "bm25_store_mutations": _bm25_doc_mutations_oracle(),
    "multimodal_frames": _MULTIMODAL_FRAMES_SQL,
    "text_tfidf_topk": _TFIDF_SQL,
    "text_vocab_topk": _VOCAB_SQL,
    "text_pii_scrub": _PII_SQL,
    "multimodal_magic": _MAGIC_SQL,
    "corpus_split": _split_oracle(),
    "corpus_decontaminate": _DECONTAM_SQL,
    "text_repetition": _repetition_oracle(),
    "paragraph_dedup": _PARAGRAPH_DEDUP_SQL,
    "text_chunking": _CHUNK_SQL,
    "stratified_sample": _stratified_oracle(),
    "quality_gated_sample": _qgate_oracle(),
    # mmr_rerank: weak-checked (greedy/iterative — no SQL form)
    "capped_sample": _capped_sample_oracle(),
    "dedup_simhash_loose": _simhash_oracle(_SIMHASH_LOOSE_MAXHAM),
}


# round-8 rotation (VERDICT r07 item 2, the established policy): round
# 7's four pytest-tier flagships — the engine-served hybrid, the O(Δ)
# mutable-posting-store serving row, distributed sequence packing, and
# temperature-based corpus mixing — join the driver window for
# independent verification; thin vector/relational rows leave in
# exchange (registry/vector.py, registry/relational.py) and keep the
# IDENTICAL DuckDB comparison in the pytest tier.
for _name in (
    "temperature_sample",
    "corpus_pack",
    "hybrid_engine_rrf",
    "bm25_store_mutations",
):
    QUERIES[_name] = EXTRA_QUERIES.pop(_name)
    ORACLES[_name] = EXTRA_ORACLES.pop(_name)
del _name


# --- substring-level dedup (round 8, VERDICT r07 item 5) --------------------

_SUBSTR_WINDOW = 20
_SUBSTR_STRIDE = 10


def q_substring_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact-substring dedup (operators/paragraphs.substring_dedup —
    the bounded Spark shape of Lee et al. 2021): 20-token span
    fingerprints, WINNOWED anchors (content-defined argmin per
    10-position window — alignment-robust, Schleimer et al. 2003),
    duplicated spans resolved to their corpus-wide first owner.
    Completes the dedup ladder's last granularity (document /
    paragraph / n-gram / SUBSTRING); the oracle replays the full
    gram → winnow → first-owner construction."""
    from ..operators.paragraphs import substring_dedup

    docs = load_table(spark, sf_dir, "documents")
    return substring_dedup(
        docs, window=_SUBSTR_WINDOW, stride=_SUBSTR_STRIDE
    )


def _substring_dedup_oracle() -> str:
    from ..functions.hashing import portable_hash64_sql
    from ..operators.paragraphs import SUBSTR_SEED

    w, s = _SUBSTR_WINDOW, _SUBSTR_STRIDE
    gram = portable_hash64_sql(
        f"array_to_string(tok[i : i + {w - 1}], ' ')", seed=SUBSTR_SEED
    )
    return f"""
WITH toks AS (
  SELECT doc_id, {_TOKS} AS tok FROM documents
  WHERE len({_TOKS}) >= {w}
),
g AS (
  SELECT doc_id,
         list_transform(range(1, CAST(len(tok) AS BIGINT) - {w} + 2),
                        i -> {gram}) AS grams
  FROM toks
),
a AS (
  SELECT doc_id, grams,
         list_distinct(list_transform(
           range(1, greatest(1, CAST(len(grams) AS BIGINT) - {s} + 1) + 1),
           i -> i - 1
                + list_position(grams[i : i + least({s}, len(grams)) - 1],
                                list_min(grams[i : i + least({s}, len(grams)) - 1]))
                - 1)) AS anchors
  FROM g
),
wins AS (
  SELECT doc_id, CAST(pos AS BIGINT) AS pos,
         grams[CAST(pos + 1 AS BIGINT)] AS fp
  FROM a, UNNEST(anchors) AS u(pos)
),
ranked AS (
  SELECT doc_id, pos,
         FIRST_VALUE(doc_id) OVER win AS owner_doc_id,
         FIRST_VALUE(pos) OVER win AS owner_pos,
         ROW_NUMBER() OVER win AS rn
  FROM wins
  WINDOW win AS (PARTITION BY fp ORDER BY doc_id, pos)
)
SELECT doc_id, pos, owner_doc_id, owner_pos FROM ranked WHERE rn > 1
"""


EXTRA_QUERIES["substring_dedup"] = q_substring_dedup
EXTRA_ORACLES["substring_dedup"] = _substring_dedup_oracle()


# --- fused serving from BOTH incremental stores (round 8) --------------------
# Round 8 gave the vector engine the O(Δ) merge-on-read tier the text
# engine got in round 7; this row proves the two COMPOSE: doc mutations
# and vector mutations flow to their stores as deltas, and the fused
# HybridEngine read (vector_method='store' + text_method='store') under
# one STRONG gate must equal the oracle's replay of BOTH LWW folds —
# BM25 over the mutated documents fused with the store-probe IVF over
# the mutated embeddings.  No full index rebuild happens on either leg.

_VECMUT_REPLACE = (3, 9, 2003)      # vec 3 takes vec 9's embedding
_VECMUT_INSERT = (1_000_003, 7, 7)  # new id borrowing vec 7's embedding
_VECMUT_DELETE = 4


def q_hybrid_store_mutations(spark: SparkSession, sf_dir: str) -> DataFrame:
    import os
    import shutil
    import tempfile

    from ..engine import VectorEngine
    from ..text_engine import HybridEngine, TextEngine

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    emb = load_table(spark, sf_dir, "embeddings")
    root = os.path.join(
        tempfile.gettempdir(), f"dvss_spark_hybstore_{os.getpid()}"
    )
    shutil.rmtree(root, ignore_errors=True)  # stale stores from a prior run
    ve = VectorEngine(spark, emb.select("vec_id", "embedding", "label"))
    ve.attach_store(os.path.join(root, "vec"))
    te = TextEngine(spark, docs)
    te.attach_store(os.path.join(root, "lex"))
    src = {
        r["vec_id"]: list(r["embedding"])
        for r in emb.filter(
            F.col("vec_id").isin([_VECMUT_REPLACE[1], _VECMUT_INSERT[1]])
        ).collect()
    }
    ve.upsert(_VECMUT_REPLACE[0], src[_VECMUT_REPLACE[1]],
              label=_VECMUT_REPLACE[2])
    ve.delete(_VECMUT_DELETE)
    ve.upsert(_VECMUT_INSERT[0], src[_VECMUT_INSERT[1]],
              label=_VECMUT_INSERT[2])
    te.upsert_doc(*_DOCMUT_REPLACE)
    te.upsert_doc(*_DOCMUT_INSERT)
    te.delete_doc(_DOCMUT_DELETE)
    q = _retrieval_queries(spark, sf_dir).join(
        emb.select(
            F.col("vec_id").alias("query_id"), F.col("embedding").alias("qvec")
        ),
        "query_id",
        "left",
    )
    return HybridEngine(ve, te).search(
        q, _HYBRID_K, leg_k=_HYBRID_LEG_K,
        vector_method="store", text_method="store", consistency="strong",
    )


def _hybrid_store_mutations_oracle() -> str:
    from ..functions.hashing import portable_hash64_sql
    from ..operators.retrieval import RRF_K
    from ..operators.similarity import IVF_THIN_SEED
    from .vector import _IVF_NPROBE, _IVF_NUM_CELLS, _SQL_SQ_L2

    rid, rtext = _DOCMUT_REPLACE
    iid, itext = _DOCMUT_INSERT
    h = portable_hash64_sql("CAST(vec_id AS VARCHAR)", seed=IVF_THIN_SEED)
    l2_vc = _SQL_SQ_L2.format(q="v.embedding", v="c.cvec")
    l2_qc = _SQL_SQ_L2.format(q="vq.qv", v="c.cvec")
    l2_qa = _SQL_SQ_L2.format(q="qp.qv", v="a.embedding")
    return f"""
WITH docs_mut AS (
  SELECT doc_id, text FROM documents
  WHERE doc_id NOT IN ({rid}, {iid}, {_DOCMUT_DELETE})
  UNION ALL SELECT CAST({rid} AS BIGINT), '{rtext}'
  UNION ALL SELECT CAST({iid} AS BIGINT), '{itext}'
),
{_bm25_scored_ctes(docs_rel="docs_mut")},
mut AS (
  SELECT vec_id, embedding FROM embeddings
  WHERE vec_id NOT IN ({_VECMUT_REPLACE[0]}, {_VECMUT_DELETE})
  UNION ALL
  SELECT CAST({_VECMUT_REPLACE[0]} AS BIGINT),
         (SELECT embedding FROM embeddings WHERE vec_id = {_VECMUT_REPLACE[1]})
  UNION ALL
  SELECT CAST({_VECMUT_INSERT[0]} AS BIGINT),
         (SELECT embedding FROM embeddings WHERE vec_id = {_VECMUT_INSERT[1]})
),
nt AS (SELECT GREATEST(COUNT(*) // {_IVF_NUM_CELLS * 4}, 1) AS step FROM embeddings),
sel AS (
  SELECT vec_id, embedding FROM embeddings, nt
  WHERE ({h}) % step = 0
  ORDER BY vec_id LIMIT {_IVF_NUM_CELLS}
),
cents AS (
  SELECT CAST(ROW_NUMBER() OVER (ORDER BY vec_id) - 1 AS INT) AS cell_id,
         embedding AS cvec
  FROM sel
),
vd AS (SELECT v.vec_id, v.embedding, c.cell_id, {l2_vc} AS d
       FROM mut v CROSS JOIN cents c),
asg AS (SELECT vec_id, embedding, cell_id FROM
        (SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY d, cell_id) AS rn
         FROM vd)
        WHERE rn = 1),
vq AS (SELECT q.query_id, e.embedding AS qv FROM q
       JOIN embeddings e ON e.vec_id = q.query_id),
qd AS (SELECT vq.query_id, vq.qv, c.cell_id, {l2_qc} AS d FROM vq CROSS JOIN cents c),
qp AS (SELECT query_id, qv, cell_id FROM
       (SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY d, cell_id) AS rn
        FROM qd)
       WHERE rn <= {_IVF_NPROBE}),
vscored AS (SELECT qp.query_id, a.vec_id AS id, {l2_qa} AS distance
            FROM qp JOIN asg a ON a.cell_id = qp.cell_id),
vr AS (SELECT query_id, id,
       CAST(ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY round_even((distance) * 1e6, 0) / 1e6, id) AS INT) AS rank
       FROM vscored),
legs AS (
  SELECT query_id, id, rank FROM vr WHERE rank <= {_HYBRID_LEG_K}
  UNION ALL
  SELECT query_id, id, brank AS rank FROM bm25_ranked WHERE brank <= {_HYBRID_LEG_K}
),
fused AS (SELECT query_id, id, ROUND(SUM(1.0 / ({RRF_K} + rank)), 6) AS rrf
          FROM legs GROUP BY 1, 2)
SELECT query_id, id, rrf, rank FROM (
  SELECT *, CAST(ROW_NUMBER() OVER (PARTITION BY query_id
                                    ORDER BY rrf DESC, id) AS INT) AS rank
  FROM fused)
WHERE rank <= {_HYBRID_K}
"""


EXTRA_QUERIES["hybrid_store_mutations"] = q_hybrid_store_mutations
EXTRA_ORACLES["hybrid_store_mutations"] = _hybrid_store_mutations_oracle()


# --- late-interaction MaxSim retrieval (round 8) -----------------------------
# The third retrieval scoring family (operators/late_interaction.py):
# multi-vector documents scored Σ_i max_j sim(q_i, d_j).  The fixture
# has one embedding per id, so multi-vector docs are derived
# deterministically: four consecutive vec_ids form one pseudo-document
# (doc_key = vec_id // 4) and the query reuses a pseudo-document's own
# token set — exact, fully SQL-replayable (cosine per pair, MAX per
# query token, SUM per doc, rounded rank).

_MAXSIM_GROUP = 4
_MAXSIM_QPRED_SQL = "doc_key % 50 = 3"
_MAXSIM_K = 5


def q_maxsim_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.late_interaction import maxsim_topk

    emb = load_table(spark, sf_dir, "embeddings")
    dv = emb.select(
        F.expr(f"vec_id div {_MAXSIM_GROUP}").alias("doc_id"),
        "vec_id",
        "embedding",
    )
    q = (
        dv.filter(F.col("doc_id") % 50 == 3)
        .groupBy(F.col("doc_id").alias("query_id"))
        .agg(F.collect_list("embedding").alias("qvecs"))
    )
    return maxsim_topk(dv, q, _MAXSIM_K)


def _maxsim_oracle() -> str:
    cos = _SQL_COSINE.format(x="qt.qv", y="d.embedding")
    return f"""
WITH dv AS (SELECT vec_id // {_MAXSIM_GROUP} AS doc_key, vec_id, embedding
            FROM embeddings),
qt AS (SELECT doc_key AS query_id, vec_id AS qtok, embedding AS qv
       FROM dv WHERE {_MAXSIM_QPRED_SQL}),
pair AS (SELECT qt.query_id, qt.qtok, d.doc_key AS id, {cos} AS s
         FROM qt CROSS JOIN dv d),
mx AS (SELECT query_id, qtok, id, MAX(s) AS ms FROM pair GROUP BY 1, 2, 3),
sc AS (SELECT query_id, id, ROUND(SUM(ms), 6) AS maxsim FROM mx GROUP BY 1, 2)
SELECT query_id, id, maxsim, rank FROM (
  SELECT *, CAST(ROW_NUMBER() OVER (PARTITION BY query_id
                                    ORDER BY maxsim DESC, id) AS INT) AS rank
  FROM sc)
WHERE rank <= {_MAXSIM_K}
"""


EXTRA_QUERIES["maxsim_topk"] = q_maxsim_topk
EXTRA_ORACLES["maxsim_topk"] = _maxsim_oracle()


# --- two-stage MaxSim serving (round 8) --------------------------------------
# The ColBERT gather-then-rescore plan as an oracle row: every query
# token routes through the cosine IVF index (probed-cell pruning),
# keeps its `gather` best docs by best-token cosine, and the candidate
# union re-scores exactly from the doc-bucketed token store.  The
# oracle replays centroid routing, per-token probes, the replicated
# min-distance collapse, the rounded gather cut, the candidate union,
# and the exact MaxSim — end to end in SQL.

_MAXSIM_IVF_NPROBE = 4
_MAXSIM_IVF_GATHER = 8
_MAXSIM_IVF_STATE: dict[str, tuple[str, str, list[list[float]]]] = {}


def maxsim_ivf_layout(
    spark: SparkSession, sf_dir: str
) -> tuple[str, str, list[list[float]]]:
    """Token-level cosine IVF index + doc-bucketed token store over the
    pseudo-document corpus, built once per process."""
    import os as _os
    import tempfile

    from ..sources.ivf_index import write_cosine_ivf_index
    from ..sources.rerank_store import write_rerank_store
    from .trained_cents import COSINE_CENTROIDS_SF001

    state = _MAXSIM_IVF_STATE.get(sf_dir)
    if state is None:
        emb = load_table(spark, sf_dir, "embeddings")
        dv = emb.select(
            F.expr(f"vec_id div {_MAXSIM_GROUP}").alias("doc_id"),
            "vec_id",
            "embedding",
        )
        name = _os.path.basename(_os.path.normpath(sf_dir)) or "sf"
        root = _os.path.join(
            tempfile.gettempdir(), f"dvss_spark_maxsim_{_os.getpid()}", name
        )
        idx = _os.path.join(root, "tok_ivf")
        store = _os.path.join(root, "tok_store")
        cents = COSINE_CENTROIDS_SF001
        write_cosine_ivf_index(dv, idx, cents)
        write_rerank_store(dv, store, id_col="doc_id")
        state = (idx, store, cents)
        _MAXSIM_IVF_STATE[sf_dir] = state
    return state


def q_maxsim_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.late_interaction import maxsim_ivf_topk

    idx, store, cents = maxsim_ivf_layout(spark, sf_dir)
    emb = load_table(spark, sf_dir, "embeddings")
    q = (
        emb.select(
            F.expr(f"vec_id div {_MAXSIM_GROUP}").alias("query_id"), "embedding"
        )
        .filter(F.col("query_id") % 50 == 3)
        .groupBy("query_id")
        .agg(F.collect_list("embedding").alias("qvecs"))
    )
    return maxsim_ivf_topk(
        spark, idx, store, q, _MAXSIM_K, cents,
        n_probe=_MAXSIM_IVF_NPROBE, gather=_MAXSIM_IVF_GATHER,
    )


def _maxsim_ivf_oracle() -> str:
    from .trained_cents import COSINE_CENTROIDS_SF001
    from .vector import _SQL_L2NORM, _SQL_SQ_L2

    rows = ",\n  ".join(
        f"({i}, [{', '.join(repr(x) for x in c)}]::DOUBLE[])"
        for i, c in enumerate(COSINE_CENTROIDS_SF001)
    )
    l2_vc = _SQL_SQ_L2.format(q="v.e", v="c.cvec")
    l2_qc = _SQL_SQ_L2.format(q="qt.qe", v="c.cvec")
    l2_qa = _SQL_SQ_L2.format(q="qp.qe", v="a.e")
    cos_exact = _SQL_COSINE.format(x="qr.qv", y="d.embedding")
    norm_col = _SQL_L2NORM.format(x="embedding")
    return f"""
WITH cents(cell_id, cvec) AS (VALUES
  {rows}
),
dv AS (SELECT vec_id // {_MAXSIM_GROUP} AS doc_key, vec_id, embedding,
              {norm_col} AS nrm
       FROM embeddings),
nv AS (SELECT doc_key, vec_id,
              list_transform(embedding, v -> CAST(v AS DOUBLE) / nrm) AS e
       FROM dv WHERE nrm > 0),
asg AS (SELECT doc_key, vec_id, e, cell_id FROM
        (SELECT v.*, c.cell_id,
                ROW_NUMBER() OVER (PARTITION BY v.vec_id
                                   ORDER BY {l2_vc}, c.cell_id) AS rn
         FROM nv v CROSS JOIN cents c)
        WHERE rn = 1),
qt AS (SELECT doc_key AS query_id, vec_id AS qtok, e AS qe
       FROM nv WHERE doc_key % 50 = 3),
qp AS (SELECT query_id, qtok, qe, cell_id FROM
       (SELECT qt.*, c.cell_id,
               ROW_NUMBER() OVER (PARTITION BY qt.qtok
                                  ORDER BY {l2_qc}, c.cell_id) AS rn
        FROM qt CROSS JOIN cents c)
       WHERE rn <= {_MAXSIM_IVF_NPROBE}),
tokhit AS (SELECT qp.query_id, qp.qtok, a.doc_key AS id,
                  MIN({l2_qa}) AS d
           FROM qp JOIN asg a ON a.cell_id = qp.cell_id
           GROUP BY 1, 2, 3),
grank AS (SELECT query_id, qtok, id,
          CAST(ROW_NUMBER() OVER (PARTITION BY qtok
               ORDER BY ROUND(1.0 - d / 2.0, 6) DESC, id) AS INT) AS rnk
          FROM tokhit),
cand AS (SELECT DISTINCT query_id, id FROM grank WHERE rnk <= {_MAXSIM_IVF_GATHER}),
qr AS (SELECT doc_key AS query_id, vec_id AS qtok, embedding AS qv
       FROM dv WHERE doc_key % 50 = 3),
pair AS (SELECT qr.query_id, qr.qtok, d.doc_key AS id, {cos_exact} AS s
         FROM qr
         JOIN cand ON cand.query_id = qr.query_id
         JOIN dv d ON d.doc_key = cand.id),
mx AS (SELECT query_id, qtok, id, MAX(s) AS ms FROM pair GROUP BY 1, 2, 3),
sc AS (SELECT query_id, id, ROUND(SUM(ms), 6) AS maxsim FROM mx GROUP BY 1, 2)
SELECT query_id, id, maxsim, rank FROM (
  SELECT *, CAST(ROW_NUMBER() OVER (PARTITION BY query_id
                                    ORDER BY maxsim DESC, id) AS INT) AS rank
  FROM sc)
WHERE rank <= {_MAXSIM_K}
"""


EXTRA_QUERIES["maxsim_ivf_topk"] = q_maxsim_ivf_topk
EXTRA_ORACLES["maxsim_ivf_topk"] = _maxsim_ivf_oracle()


# --- mutable token store (round 9, sources/token_store.py) -------------------
# MaxSim under the mutation discipline (VERDICT r08 item 5): the
# late-interaction family gets the same doc-granular LWW merge-on-read
# store the vector and lexical families already have.  The scenario
# exercises every fold subtlety across TWO pushes (cross-push total
# order): doc%40==1 is upserted twice (push-1 negated tokens, push-2
# REVERSED tokens — direction-changing transforms, so a wrong LWW
# winner flips cosine rankings, never a cosmetic scale), doc%40==2 is
# deleted then REVIVED with negated tokens (tombstone must lose to the
# newer upsert), doc%40==3 is tombstoned (must vanish).  The read is
# the exact merge-on-read tier on the DIRTY generation — the oracle
# replays the final fold directly and the maxsim aggregate end-to-end.

_TOKSTORE_STATE: dict[str, str] = {}


def _maxsim_pseudo_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, pos, embedding): four consecutive vec_ids = one doc."""
    emb = load_table(spark, sf_dir, "embeddings")
    return emb.select(
        F.expr(f"vec_id div {_MAXSIM_GROUP}").alias("doc_id"),
        (F.col("vec_id") % _MAXSIM_GROUP).cast("int").alias("pos"),
        "embedding",
    )


def maxsim_token_store(spark: SparkSession, sf_dir: str):
    """Build the mutated store once per process: init from the
    pseudo-doc corpus, then two mutation pushes (monotone seqs)."""
    import os as _os
    import tempfile

    from ..sources.token_store import MutableTokenStore
    from .trained_cents import COSINE_CENTROIDS_SF001

    path = _TOKSTORE_STATE.get(sf_dir)
    if path is None:
        name = _os.path.basename(_os.path.normpath(sf_dir)) or "sf"
        path = _os.path.join(
            tempfile.gettempdir(), f"dvss_spark_tokstore_{_os.getpid()}", name
        )
        dv = _maxsim_pseudo_tokens(spark, sf_dir)
        store = MutableTokenStore(path)
        store.init_base(dv, COSINE_CENTROIDS_SF001)
        docs = (
            dv.groupBy("doc_id")
            .agg(
                F.array_sort(
                    F.collect_list(F.struct("pos", "embedding"))
                ).alias("_ts")
            )
            .select(
                "doc_id",
                F.transform("_ts", lambda s: s["embedding"]).alias("tokens"),
            )
        )
        neg = F.transform(
            "tokens", lambda v: F.transform(v, lambda x: -x)
        )
        rev = F.transform("tokens", F.reverse)
        nulltoks = F.lit(None).cast("array<array<float>>")
        log1 = (
            docs.filter(F.col("doc_id") % 40 == 1)
            .select(
                "doc_id", F.lit("upsert").alias("op"), neg.alias("tokens")
            )
            .unionByName(
                docs.filter(F.col("doc_id") % 40 == 2).select(
                    "doc_id", F.lit("delete").alias("op"),
                    nulltoks.alias("tokens"),
                )
            )
            .withColumn("seq", (F.lit(1_000_000) + F.col("doc_id")))
        )
        log2 = (
            docs.filter(F.col("doc_id") % 40 == 1)
            .select(
                "doc_id", F.lit("upsert").alias("op"), rev.alias("tokens")
            )
            .unionByName(
                docs.filter(F.col("doc_id") % 40 == 2).select(
                    "doc_id", F.lit("upsert").alias("op"),
                    neg.alias("tokens"),
                )
            )
            .unionByName(
                docs.filter(F.col("doc_id") % 40 == 3).select(
                    "doc_id", F.lit("delete").alias("op"),
                    nulltoks.alias("tokens"),
                )
            )
            .withColumn("seq", (F.lit(2_000_000) + F.col("doc_id")))
        )
        store.apply_log(log1)
        store.apply_log(log2)
        _TOKSTORE_STATE[sf_dir] = path
    from ..sources.token_store import MutableTokenStore as _MTS

    return _MTS(path)


def q_maxsim_store_mutations(spark: SparkSession, sf_dir: str) -> DataFrame:
    store = maxsim_token_store(spark, sf_dir)
    dv = _maxsim_pseudo_tokens(spark, sf_dir)
    q = (
        dv.filter(F.col("doc_id") % 50 == 3)
        .groupBy(F.col("doc_id").alias("query_id"))
        .agg(F.collect_list("embedding").alias("qvecs"))
    )
    return store.search(spark, q, _MAXSIM_K)


def _maxsim_store_oracle() -> str:
    cos = _SQL_COSINE.format(x="qt.qv", y="d.embedding")
    return f"""
WITH dv0 AS (SELECT vec_id // {_MAXSIM_GROUP} AS doc_key, vec_id, embedding
             FROM embeddings),
live AS (
  SELECT doc_key,
         CASE WHEN doc_key % 40 = 1 THEN list_reverse(embedding)
              WHEN doc_key % 40 = 2 THEN list_transform(embedding, x -> -x)
              ELSE embedding END AS embedding
  FROM dv0 WHERE doc_key % 40 <> 3
),
qt AS (SELECT doc_key AS query_id, vec_id AS qtok, embedding AS qv
       FROM dv0 WHERE {_MAXSIM_QPRED_SQL}),
pair AS (SELECT qt.query_id, qt.qtok, d.doc_key AS id, {cos} AS s
         FROM qt CROSS JOIN live d),
mx AS (SELECT query_id, qtok, id, MAX(s) AS ms FROM pair GROUP BY 1, 2, 3),
sc AS (SELECT query_id, id, ROUND(SUM(ms), 6) AS maxsim FROM mx GROUP BY 1, 2)
SELECT query_id, id, maxsim, rank FROM (
  SELECT *, CAST(ROW_NUMBER() OVER (PARTITION BY query_id
                                    ORDER BY maxsim DESC, id) AS INT) AS rank
  FROM sc)
WHERE rank <= {_MAXSIM_K}
"""


EXTRA_QUERIES["maxsim_store_mutations"] = q_maxsim_store_mutations
EXTRA_ORACLES["maxsim_store_mutations"] = _maxsim_store_oracle()


# --- token-store bulk retention (round 10, VERDICT r09 missing #3) -----------
# The governance verb on the LAST store family that lacked it: a
# delete_ids sweep lands AFTER a mutation push, so the sweep's verdict
# is evaluated against the folded state (swept ids that were upserted
# in the push vanish; swept ids the push already tombstoned are
# no-ops).  The oracle replays fold-then-filter directly.

_TOKRET_STATE: dict[str, str] = {}


def q_maxsim_retention_delete(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sweep doc%30==7 through a token store that already absorbed one
    push (doc%40==1 negated, doc%40==2 tombstoned), then exact MaxSim
    over the dirty generation — equals fold-then-filter."""
    import os as _os
    import shutil
    import tempfile

    from ..sources.token_store import MutableTokenStore
    from .trained_cents import COSINE_CENTROIDS_SF001

    path = _TOKRET_STATE.get(sf_dir)
    if path is None:
        name = _os.path.basename(_os.path.normpath(sf_dir)) or "sf"
        path = _os.path.join(
            tempfile.gettempdir(), f"dvss_spark_tokret_{_os.getpid()}", name
        )
        shutil.rmtree(path, ignore_errors=True)
        dv = _maxsim_pseudo_tokens(spark, sf_dir)
        store = MutableTokenStore(path)
        store.init_base(dv, COSINE_CENTROIDS_SF001)
        docs = (
            dv.groupBy("doc_id")
            .agg(
                F.array_sort(
                    F.collect_list(F.struct("pos", "embedding"))
                ).alias("_ts")
            )
            .select(
                "doc_id",
                F.transform("_ts", lambda s: s["embedding"]).alias("tokens"),
            )
        )
        neg = F.transform("tokens", lambda v: F.transform(v, lambda x: -x))
        nulltoks = F.lit(None).cast("array<array<float>>")
        log1 = (
            docs.filter(F.col("doc_id") % 40 == 1)
            .select("doc_id", F.lit("upsert").alias("op"), neg.alias("tokens"))
            .unionByName(
                docs.filter(F.col("doc_id") % 40 == 2).select(
                    "doc_id", F.lit("delete").alias("op"),
                    nulltoks.alias("tokens"),
                )
            )
            .withColumn("seq", (F.lit(1_000_000) + F.col("doc_id")))
        )
        store.apply_log(log1)
        swept = dv.select("doc_id").distinct().filter(
            F.col("doc_id") % 30 == 7
        )
        store.delete_ids(swept, id_col="doc_id")
        _TOKRET_STATE[sf_dir] = path
    from ..sources.token_store import MutableTokenStore as _MTS

    store = _MTS(path)
    dv = _maxsim_pseudo_tokens(spark, sf_dir)
    q = (
        dv.filter(F.col("doc_id") % 50 == 3)
        .groupBy(F.col("doc_id").alias("query_id"))
        .agg(F.collect_list("embedding").alias("qvecs"))
    )
    return store.search(spark, q, _MAXSIM_K)


def _maxsim_retention_oracle() -> str:
    cos = _SQL_COSINE.format(x="qt.qv", y="d.embedding")
    return f"""
WITH dv0 AS (SELECT vec_id // {_MAXSIM_GROUP} AS doc_key, vec_id, embedding
             FROM embeddings),
live AS (
  SELECT doc_key,
         CASE WHEN doc_key % 40 = 1 THEN list_transform(embedding, x -> -x)
              ELSE embedding END AS embedding
  FROM dv0 WHERE doc_key % 40 <> 2 AND doc_key % 30 <> 7
),
qt AS (SELECT doc_key AS query_id, vec_id AS qtok, embedding AS qv
       FROM dv0 WHERE {_MAXSIM_QPRED_SQL}),
pair AS (SELECT qt.query_id, qt.qtok, d.doc_key AS id, {cos} AS s
         FROM qt CROSS JOIN live d),
mx AS (SELECT query_id, qtok, id, MAX(s) AS ms FROM pair GROUP BY 1, 2, 3),
sc AS (SELECT query_id, id, ROUND(SUM(ms), 6) AS maxsim FROM mx GROUP BY 1, 2)
SELECT query_id, id, maxsim, rank FROM (
  SELECT *, CAST(ROW_NUMBER() OVER (PARTITION BY query_id
                                    ORDER BY maxsim DESC, id) AS INT) AS rank
  FROM sc)
WHERE rank <= {_MAXSIM_K}
"""


EXTRA_QUERIES["maxsim_retention_delete"] = q_maxsim_retention_delete
EXTRA_ORACLES["maxsim_retention_delete"] = _maxsim_retention_oracle()


# --- exact phrase search (round 8, operators/phrase.py) ----------------------
# The third classic lexical query class (after ranked BM25 and boolean
# filtered): positional intersection — slot i voting anchor pos−i,
# COUNT(*)==m per anchor is the full-phrase test.  Phrases are derived
# deterministically from the corpus (tokens 2..4 of each query doc, a
# CONSECUTIVE slice, unlike the BM25 rows' distinct-token prefix).
# The indexed row serves the identical result from the term-clustered
# positional index and therefore SHARES the oracle verbatim (the
# bucketed-compaction precedent).

_PHRASE_QPRED = "doc_id % 100 = 11"
_PHRASE_K = 5
_PHRASE_IDX_STATE: dict[str, str] = {}


def _phrase_queries(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions.text import tokens as _tok

    docs = load_table(spark, sf_dir, "documents")
    return (
        docs.select(F.col("doc_id").alias("query_id"), _tok("text").alias("_w"))
        .filter(F.expr(_PHRASE_QPRED.replace("doc_id", "query_id")))
        .filter(F.size("_w") >= 4)
        .select("query_id", F.slice("_w", 2, 3).alias("phrase"))
    )


def q_phrase_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.phrase import phrase_topk

    docs = load_table(spark, sf_dir, "documents")
    return phrase_topk(docs, _phrase_queries(spark, sf_dir), _PHRASE_K)


def phrase_index(spark: SparkSession, sf_dir: str) -> str:
    import os as _os
    import tempfile

    from ..operators.phrase import write_positional_index

    path = _PHRASE_IDX_STATE.get(sf_dir)
    if path is None:
        name = _os.path.basename(_os.path.normpath(sf_dir)) or "sf"
        path = _os.path.join(
            tempfile.gettempdir(), f"dvss_spark_phraseidx_{_os.getpid()}", name
        )
        write_positional_index(load_table(spark, sf_dir, "documents"), path)
        _PHRASE_IDX_STATE[sf_dir] = path
    return path


def q_phrase_index_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.phrase import phrase_search_index

    return phrase_search_index(
        spark, phrase_index(spark, sf_dir),
        _phrase_queries(spark, sf_dir), _PHRASE_K,
    )


def _phrase_oracle() -> str:
    return f"""
WITH toks AS (SELECT doc_id, {_TOKS} AS w FROM documents),
qs AS (SELECT doc_id AS query_id, list_slice(w, 2, 4) AS phrase FROM toks
       WHERE {_PHRASE_QPRED} AND len(w) >= 4),
qslot AS (SELECT query_id, len(phrase) AS m,
                 UNNEST(range(1, len(phrase) + 1)) AS slot, phrase
          FROM qs),
qterm AS (SELECT query_id, m, slot, phrase[slot] AS term FROM qslot),
px AS (SELECT doc_id AS id, w, UNNEST(range(1, len(w) + 1)) AS pos FROM toks),
tp AS (SELECT id, pos, w[pos] AS term FROM px),
hit AS (SELECT q.query_id, t.id, t.pos - q.slot AS anchor, q.m
        FROM qterm q JOIN tp t USING (term)),
anch AS (SELECT query_id, id, anchor, m, COUNT(*) AS ns
         FROM hit GROUP BY 1, 2, 3, 4),
pf AS (SELECT query_id, id, COUNT(*) AS phrase_tf
       FROM anch WHERE ns = m GROUP BY 1, 2)
SELECT query_id, id, phrase_tf, rank FROM (
  SELECT *, CAST(ROW_NUMBER() OVER (PARTITION BY query_id
                                    ORDER BY phrase_tf DESC, id) AS INT) AS rank
  FROM pf)
WHERE rank <= {_PHRASE_K}
"""


EXTRA_QUERIES["phrase_topk"] = q_phrase_topk
EXTRA_ORACLES["phrase_topk"] = _phrase_oracle()
# identical result from the positional index — shares the oracle
EXTRA_QUERIES["phrase_index_topk"] = q_phrase_index_topk
EXTRA_ORACLES["phrase_index_topk"] = _phrase_oracle()


# --- proximity search (round 8, operators/phrase.py) -------------------------
# The unordered positional query class next to the exact phrase: a
# length-W sliding window must contain ALL query terms; score = number
# of such windows.  Same fixture-derived query shape as the BM25 rows
# (first-3 distinct tokens), disjoint predicate.

_PROX_QPRED = "doc_id % 100 = 19"
_PROX_WINDOW = 6
_PROX_K = 5


def q_proximity_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.phrase import proximity_topk
    from ..operators.retrieval import queries_from_docs

    docs = load_table(spark, sf_dir, "documents")
    q = queries_from_docs(docs, F.expr(_PROX_QPRED))
    return proximity_topk(
        docs, q, _PROX_K, window=_PROX_WINDOW, terms_col="qterms"
    )


def _proximity_oracle() -> str:
    return f"""
WITH toks AS (SELECT doc_id, {_TOKS} AS w FROM documents),
qs AS (SELECT doc_id AS query_id, list_distinct(list_slice(w, 1, 3)) AS ts
       FROM toks WHERE {_PROX_QPRED}),
qterm AS (SELECT query_id, len(ts) AS m, UNNEST(ts) AS term FROM qs),
px AS (SELECT doc_id AS id, w, UNNEST(range(1, len(w) + 1)) AS pos FROM toks),
tp AS (SELECT id, pos, w[pos] AS term FROM px),
hits AS (SELECT q.query_id, t.id, q.m, q.term,
                UNNEST(range(GREATEST(t.pos - {_PROX_WINDOW - 1}, 1),
                             t.pos + 1)) AS s
         FROM qterm q JOIN tp t USING (term)),
wins AS (SELECT query_id, id, s, m, COUNT(DISTINCT term) AS nt
         FROM hits GROUP BY 1, 2, 3, 4),
pf AS (SELECT query_id, id, COUNT(*) AS window_count
       FROM wins WHERE nt = m GROUP BY 1, 2)
SELECT query_id, id, window_count, rank FROM (
  SELECT *, CAST(ROW_NUMBER() OVER (PARTITION BY query_id
                                    ORDER BY window_count DESC, id) AS INT) AS rank
  FROM pf)
WHERE rank <= {_PROX_K}
"""


EXTRA_QUERIES["proximity_topk"] = q_proximity_topk
EXTRA_ORACLES["proximity_topk"] = _proximity_oracle()


# round-9 rotation (VERDICT r08 item 1, the established policy): round
# 8's retrieval flagships — the fused dual-store mutation row (doc +
# vector mutations through BOTH merge-on-read stores, one STRONG hybrid
# read), ColBERT-style exact MaxSim, and exact phrase search — join the
# driver window for independent verification.  Four expression-tier
# rows leave in exchange (hash sampling, language id, fingerprinting,
# multimodal metadata — all single-pass map-only plans whose families
# stay driver-covered via temperature_sample / text_quality /
# doc-level curation_pipeline / multimodal_features) and keep the
# IDENTICAL DuckDB comparison in the pytest tier.
for _name in ("hybrid_store_mutations", "maxsim_topk", "phrase_topk"):
    QUERIES[_name] = EXTRA_QUERIES.pop(_name)
    ORACLES[_name] = EXTRA_ORACLES.pop(_name)
for _name in (
    "hash_sample",
    "text_language_id",
    "doc_fingerprint",
    "multimodal_meta",
):
    EXTRA_QUERIES[_name] = QUERIES.pop(_name)
    EXTRA_ORACLES[_name] = ORACLES.pop(_name)
del _name


# round-9 close rotation (same policy, applied at round end): the
# mutable token store's two-push LWW fold — the round's retrieval
# flagship, MaxSim under the mutation discipline — joins the driver
# window.  The token-stats expression row leaves in exchange: a
# single-pass map-only plan whose family stays driver-covered
# (text_quality, curation_pipeline) and whose IDENTICAL DuckDB
# comparison moves to the pytest tier.
QUERIES["maxsim_store_mutations"] = EXTRA_QUERIES.pop("maxsim_store_mutations")
ORACLES["maxsim_store_mutations"] = EXTRA_ORACLES.pop("maxsim_store_mutations")
EXTRA_QUERIES["text_token_stats"] = QUERIES.pop("text_token_stats")
EXTRA_ORACLES["text_token_stats"] = ORACLES.pop("text_token_stats")


# ---------------------------------------------------------------------------
# Round-9: learned-sparse retrieval (operators/sparse.py,
# sources/sparse_index.py) — the third retrieval leg between dense
# vectors and BM25.  Sublinear tf–idf encoding (the deterministic
# stand-in for a SPLADE-style model; every operator is generic in the
# weights), weighted dot-product top-k, static impact pruning (the
# approximate tier is a pure function of the weights, so even IT gets
# an exact DuckDB replay), the persisted term-clustered index, and
# min-max score-normalized convex fusion of the sparse + dense legs.

_SPARSE_QPRED = _HYBRID_QPRED
_SPARSE_QN = 8
_SPARSE_K = 10
_SPARSE_LEG_K = 20
_SPARSE_PRUNE_FRAC = 0.5
_SPARSE_W_SPARSE = 0.6
_SPARSE_W_DENSE = 0.4


def _sparse_fixture_queries(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sparse query set: each selected doc's first 8 tokens (duplicates
    KEPT — query-side tf must be exercisable, unlike the distinct-ed
    BM25 qterms) re-joined to text; the [a-z0-9]+ tokenizer re-splits
    a space-joined token list to exactly the same tokens."""
    docs = load_table(spark, sf_dir, "documents")
    return docs.filter(F.expr(_SPARSE_QPRED)).select(
        F.col("doc_id").alias("query_id"),
        F.array_join(F.slice(tokens("text"), 1, _SPARSE_QN), " ").alias("qtext"),
    )


def q_sparse_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """From-scratch learned-sparse top-k — the ORACLE-CARRYING row.

    Deliberately re-runs ``sparse_encode`` (tokenize + per-doc tf + a
    corpus df shuffle) per invocation: the in-container tf–idf encoder
    is a stand-in for the model that produces weights offline, so this
    row pays a multi-scan encode the serving path never does.  The
    serving shape is ``sparse_index_topk`` (encode once at build;
    1.28 s vs 2.10 s steady at sf0.1, anchor-flat 0.88 at 10×) — the
    same stance as from-scratch ``bm25_topk`` vs ``bm25_index_topk``
    (VERDICT r09 What's-wrong #4)."""
    from ..operators.sparse import sparse_encode, sparse_encode_queries, sparse_topk

    docs = load_table(spark, sf_dir, "documents")
    qp = sparse_encode_queries(_sparse_fixture_queries(spark, sf_dir))
    return sparse_topk(sparse_encode(docs), qp, _SPARSE_K)


def q_sparse_pruned_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Impact-pruned tier: keep postings ≥ frac·term-max, then the same
    dot-product top-k.  Deterministic in the weights → exact oracle."""
    from ..operators.sparse import (
        prune_postings,
        sparse_encode,
        sparse_encode_queries,
        sparse_topk,
    )

    docs = load_table(spark, sf_dir, "documents")
    qp = sparse_encode_queries(_sparse_fixture_queries(spark, sf_dir))
    pruned = prune_postings(
        sparse_encode(docs), min_impact_frac=_SPARSE_PRUNE_FRAC
    )
    return sparse_topk(pruned, qp, _SPARSE_K)


_SPARSE_IDX_STATE: dict[str, str] = {}


def _sparse_index_path(spark: SparkSession, sf_dir: str) -> str:
    import os as _os
    import tempfile

    from ..sources.sparse_index import write_sparse_index

    path = _SPARSE_IDX_STATE.get(sf_dir)
    if path is None:
        name = _os.path.basename(_os.path.normpath(sf_dir)) or "sf"
        path = _os.path.join(
            tempfile.gettempdir(), f"dvss_spark_sparse_{_os.getpid()}", name
        )
        write_sparse_index(load_table(spark, sf_dir, "documents"), path)
        _SPARSE_IDX_STATE[sf_dir] = path
    return path


def q_sparse_index_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Served from the persisted term-clustered index — identical rows
    to q_sparse_topk by the exactness contract (weights persisted,
    same score join), so the row reuses the from-scratch oracle."""
    from ..operators.sparse import sparse_encode_queries
    from ..sources.sparse_index import sparse_search_index

    qp = sparse_encode_queries(_sparse_fixture_queries(spark, sf_dir))
    return sparse_search_index(
        spark, _sparse_index_path(spark, sf_dir), qp, _SPARSE_K
    )


def q_hybrid_weighted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Min-max score-normalized convex fusion (0.6 sparse + 0.4 dense
    cosine) — the score-aware alternative to RRF, over the two legs
    whose scores are calibrated per query."""
    from ..operators.sparse import (
        fuse_weighted,
        sparse_encode,
        sparse_encode_queries,
        sparse_topk,
    )

    docs = load_table(spark, sf_dir, "documents")
    emb = load_table(spark, sf_dir, "embeddings")
    q = _sparse_fixture_queries(spark, sf_dir)
    sleg = sparse_topk(
        sparse_encode(docs), sparse_encode_queries(q), _SPARSE_LEG_K
    )
    vq = q.join(
        emb.select(F.col("vec_id").alias("query_id"), F.col("embedding").alias("qvec")),
        "query_id",
    ).select("query_id", "qvec")
    vleg = cosine_topk(emb, vq, _SPARSE_LEG_K, round_scores=6).withColumnRenamed(
        "cosine", "score"
    )
    return fuse_weighted(
        [(sleg, _SPARSE_W_SPARSE), (vleg, _SPARSE_W_DENSE)], _SPARSE_K
    )


def _sparse_ctes(qpred: str = _SPARSE_QPRED, docs_rel: str = "documents") -> str:
    """Shared sparse CTE chain ending in ``sparse_ranked (query_id, id,
    score6, srank)`` — the encoder (sublinear tf × Lucene idf), the
    query-side sublinear tf, the dot product, round-then-rank."""
    return f"""
stoks AS (SELECT doc_id, {_TOKS} AS w FROM {docs_rel}),
sn AS (SELECT COUNT(*) AS n_docs FROM stoks),
sdt AS (SELECT doc_id AS id, UNNEST(w) AS term FROM stoks),
sdtf AS (SELECT id, term, COUNT(*) AS tf FROM sdt GROUP BY 1, 2),
sdf AS (SELECT term, COUNT(*) AS df FROM sdtf GROUP BY 1),
sw AS (SELECT id, sdtf.term,
              (1.0 + LN(CAST(tf AS DOUBLE)))
              * LN(1.0 + (sn.n_docs - sdf.df + 0.5) / (sdf.df + 0.5)) AS weight
       FROM sdtf JOIN sdf ON sdf.term = sdtf.term CROSS JOIN sn),
sq AS (SELECT doc_id AS query_id, list_slice(w, 1, {_SPARSE_QN}) AS qts
       FROM stoks WHERE {qpred}),
sqt AS (SELECT query_id, UNNEST(qts) AS term FROM sq),
sqw AS (SELECT query_id, term, 1.0 + LN(CAST(COUNT(*) AS DOUBLE)) AS qweight
        FROM sqt GROUP BY 1, 2),
sparse_scored AS (
  SELECT sqw.query_id, sw.id, SUM(sqw.qweight * sw.weight) AS score
  FROM sqw JOIN sw ON sw.term = sqw.term GROUP BY 1, 2),
sparse_ranked AS (
  SELECT query_id, id, score6,
         CAST(ROW_NUMBER() OVER (PARTITION BY query_id
                                 ORDER BY score6 DESC, id) AS INT) AS srank
  FROM (SELECT query_id, id, ROUND(score, 6) AS score6 FROM sparse_scored))"""


def _sparse_oracle() -> str:
    return f"""
WITH {_sparse_ctes()}
SELECT query_id, id, score6 AS score, srank AS rank
FROM sparse_ranked WHERE srank <= {_SPARSE_K}
"""


def _sparse_pruned_oracle() -> str:
    return f"""
WITH {_sparse_ctes()},
smax AS (SELECT term, MAX(weight) AS max_w FROM sw GROUP BY 1),
swp AS (SELECT sw.id, sw.term, sw.weight FROM sw
        JOIN smax ON smax.term = sw.term
        WHERE sw.weight >= {_SPARSE_PRUNE_FRAC} * smax.max_w),
pruned_scored AS (
  SELECT sqw.query_id, swp.id, SUM(sqw.qweight * swp.weight) AS score
  FROM sqw JOIN swp ON swp.term = sqw.term GROUP BY 1, 2),
pruned_ranked AS (
  SELECT query_id, id, score6,
         CAST(ROW_NUMBER() OVER (PARTITION BY query_id
                                 ORDER BY score6 DESC, id) AS INT) AS prank
  FROM (SELECT query_id, id, ROUND(score, 6) AS score6 FROM pruned_scored))
SELECT query_id, id, score6 AS score, prank AS rank
FROM pruned_ranked WHERE prank <= {_SPARSE_K}
"""


def _hybrid_weighted_oracle() -> str:
    cos = _SQL_COSINE.format(x="hvq.qv", y="v.embedding")
    lo = "MIN(s) OVER (PARTITION BY query_id)"
    hi = "MAX(s) OVER (PARTITION BY query_id)"
    norm = f"CASE WHEN {hi} > {lo} THEN (s - {lo}) / ({hi} - {lo}) ELSE 1.0 END"
    return f"""
WITH {_sparse_ctes()},
hvq AS (SELECT sq.query_id, e.embedding AS qv FROM sq
        JOIN embeddings e ON e.vec_id = sq.query_id),
hvs AS (SELECT hvq.query_id, v.vec_id AS id, ROUND({cos}, 6) AS cs
        FROM hvq CROSS JOIN embeddings v),
hvr AS (SELECT query_id, id, cs,
               CAST(ROW_NUMBER() OVER (PARTITION BY query_id
                                       ORDER BY cs DESC, id) AS INT) AS vrank
        FROM hvs),
sleg AS (SELECT query_id, id, score6 AS s FROM sparse_ranked
         WHERE srank <= {_SPARSE_LEG_K}),
vleg AS (SELECT query_id, id, cs AS s FROM hvr WHERE vrank <= {_SPARSE_LEG_K}),
snorm AS (SELECT query_id, id, {_SPARSE_W_SPARSE} * ({norm}) AS c FROM sleg),
vnorm AS (SELECT query_id, id, {_SPARSE_W_DENSE} * ({norm}) AS c FROM vleg),
fsum AS (SELECT query_id, id, SUM(c) AS fused
         FROM (SELECT * FROM snorm UNION ALL SELECT * FROM vnorm)
         GROUP BY 1, 2),
franked AS (
  SELECT query_id, id, fused6,
         CAST(ROW_NUMBER() OVER (PARTITION BY query_id
                                 ORDER BY fused6 DESC, id) AS INT) AS frank
  FROM (SELECT query_id, id, ROUND(fused, 6) AS fused6 FROM fsum))
SELECT query_id, id, fused6 AS fused, frank AS rank
FROM franked WHERE frank <= {_SPARSE_K}
"""


EXTRA_QUERIES["sparse_topk"] = q_sparse_topk
EXTRA_ORACLES["sparse_topk"] = _sparse_oracle()
EXTRA_QUERIES["sparse_pruned_topk"] = q_sparse_pruned_topk
EXTRA_ORACLES["sparse_pruned_topk"] = _sparse_pruned_oracle()
EXTRA_QUERIES["sparse_index_topk"] = q_sparse_index_topk
EXTRA_ORACLES["sparse_index_topk"] = _sparse_oracle()
EXTRA_QUERIES["hybrid_weighted"] = q_hybrid_weighted
EXTRA_ORACLES["hybrid_weighted"] = _hybrid_weighted_oracle()


# ---------------------------------------------------------------------------
# Round-9: faceted search (operators/facets.py) — the navigation half of
# the serving surface: value counts per attribute over the admissible /
# matching set, beside (not instead of) the ranked page.

_FACET_WHERE = "n_chars >= 200"
_FACET_TOPN = 5


def q_doc_facets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus facets over a filtered admissible set: lang, source, and
    the bucketed-length idiom for numeric attributes (bucket in the
    projection, facet the bucket)."""
    from ..operators.facets import topn_facet_counts

    docs = load_table(spark, sf_dir, "documents").withColumn(
        "len_bucket", (F.floor(F.col("n_chars") / 400) * 400).cast("long")
    )
    return topn_facet_counts(
        docs, ["lang", "source", "len_bucket"], _FACET_TOPN, where=_FACET_WHERE
    )


def q_bm25_facets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-query facets over the BM25 MATCH SET (every doc sharing a
    query term — what a search UI's sidebar counts), not the top-k
    page."""
    from ..operators.facets import facets_for_hits
    from ..operators.retrieval import bm25_scores

    docs = load_table(spark, sf_dir, "documents")
    hits = bm25_scores(docs, _retrieval_queries(spark, sf_dir))
    return facets_for_hits(hits, docs, ["lang", "source"])


def _doc_facets_oracle() -> str:
    return f"""
WITH base AS (
  SELECT lang, source, CAST((n_chars // 400) * 400 AS BIGINT) AS len_bucket
  FROM documents WHERE {_FACET_WHERE}
),
c AS (
  SELECT 'lang' AS facet, COALESCE(CAST(lang AS VARCHAR), 'null') AS value,
         COUNT(*) AS cnt FROM base GROUP BY 2
  UNION ALL
  SELECT 'source', COALESCE(CAST(source AS VARCHAR), 'null'), COUNT(*)
  FROM base GROUP BY 2
  UNION ALL
  SELECT 'len_bucket', COALESCE(CAST(len_bucket AS VARCHAR), 'null'), COUNT(*)
  FROM base GROUP BY 2
),
r AS (
  SELECT facet, value, CAST(cnt AS BIGINT) AS count,
         CAST(ROW_NUMBER() OVER (PARTITION BY facet
                                 ORDER BY cnt DESC, value) AS INT) AS frank
  FROM c
)
SELECT facet, value, count, frank FROM r WHERE frank <= {_FACET_TOPN}
"""


def _bm25_facets_oracle() -> str:
    return f"""
WITH {_bm25_scored_ctes()},
fh AS (
  SELECT b.query_id, d.lang, d.source
  FROM bm25_scored b JOIN documents d ON d.doc_id = b.id
),
c AS (
  SELECT query_id, 'lang' AS facet,
         COALESCE(CAST(lang AS VARCHAR), 'null') AS value, COUNT(*) AS cnt
  FROM fh GROUP BY 1, 3
  UNION ALL
  SELECT query_id, 'source', COALESCE(CAST(source AS VARCHAR), 'null'), COUNT(*)
  FROM fh GROUP BY 1, 3
)
SELECT query_id, facet, value, CAST(cnt AS BIGINT) AS count FROM c
"""


EXTRA_QUERIES["doc_facets"] = q_doc_facets
EXTRA_ORACLES["doc_facets"] = _doc_facets_oracle()
EXTRA_QUERIES["bm25_facets"] = q_bm25_facets
EXTRA_ORACLES["bm25_facets"] = _bm25_facets_oracle()


# ---------------------------------------------------------------------------
# Round-9: trimodal hybrid — all three retrieval legs (BM25 lexical,
# learned-sparse, dense cosine) fused by min-max weighted fusion under
# ONE query id space.  The composition row proving the serving surface
# closes over every family: each leg keeps its own query representation
# (qterms / weighted terms / embedding) exactly as a production hybrid
# does, and fuse_weighted is leg-count-agnostic.

_TRI_W_BM25 = 0.3
_TRI_W_SPARSE = 0.4
_TRI_W_DENSE = 0.3


def q_hybrid_trimodal(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.retrieval import bm25_topk
    from ..operators.sparse import (
        fuse_weighted,
        sparse_encode,
        sparse_encode_queries,
        sparse_topk,
    )

    docs = load_table(spark, sf_dir, "documents")
    emb = load_table(spark, sf_dir, "embeddings")
    bleg = bm25_topk(docs, _retrieval_queries(spark, sf_dir), _SPARSE_LEG_K)
    q = _sparse_fixture_queries(spark, sf_dir)
    sleg = sparse_topk(
        sparse_encode(docs), sparse_encode_queries(q), _SPARSE_LEG_K
    )
    vq = q.join(
        emb.select(F.col("vec_id").alias("query_id"), F.col("embedding").alias("qvec")),
        "query_id",
    ).select("query_id", "qvec")
    vleg = cosine_topk(emb, vq, _SPARSE_LEG_K, round_scores=6).withColumnRenamed(
        "cosine", "score"
    )
    return fuse_weighted(
        [(bleg, _TRI_W_BM25), (sleg, _TRI_W_SPARSE), (vleg, _TRI_W_DENSE)],
        _SPARSE_K,
    )


def _hybrid_trimodal_oracle() -> str:
    cos = _SQL_COSINE.format(x="hvq.qv", y="v.embedding")
    lo = "MIN(s) OVER (PARTITION BY query_id)"
    hi = "MAX(s) OVER (PARTITION BY query_id)"
    norm = f"CASE WHEN {hi} > {lo} THEN (s - {lo}) / ({hi} - {lo}) ELSE 1.0 END"
    return f"""
WITH {_bm25_scored_ctes(leg_k=_SPARSE_LEG_K)},
{_sparse_ctes()},
hvq AS (SELECT sq.query_id, e.embedding AS qv FROM sq
        JOIN embeddings e ON e.vec_id = sq.query_id),
hvs AS (SELECT hvq.query_id, v.vec_id AS id, ROUND({cos}, 6) AS cs
        FROM hvq CROSS JOIN embeddings v),
hvr AS (SELECT query_id, id, cs,
               CAST(ROW_NUMBER() OVER (PARTITION BY query_id
                                       ORDER BY cs DESC, id) AS INT) AS vrank
        FROM hvs),
bleg AS (SELECT query_id, id, score6 AS s FROM bm25_ranked
         WHERE brank <= {_SPARSE_LEG_K}),
sleg AS (SELECT query_id, id, score6 AS s FROM sparse_ranked
         WHERE srank <= {_SPARSE_LEG_K}),
vleg AS (SELECT query_id, id, cs AS s FROM hvr WHERE vrank <= {_SPARSE_LEG_K}),
bnorm AS (SELECT query_id, id, {_TRI_W_BM25} * ({norm}) AS c FROM bleg),
snorm AS (SELECT query_id, id, {_TRI_W_SPARSE} * ({norm}) AS c FROM sleg),
vnorm AS (SELECT query_id, id, {_TRI_W_DENSE} * ({norm}) AS c FROM vleg),
fsum AS (SELECT query_id, id, SUM(c) AS fused
         FROM (SELECT * FROM bnorm UNION ALL SELECT * FROM snorm
               UNION ALL SELECT * FROM vnorm)
         GROUP BY 1, 2),
franked AS (
  SELECT query_id, id, fused6,
         CAST(ROW_NUMBER() OVER (PARTITION BY query_id
                                 ORDER BY fused6 DESC, id) AS INT) AS frank
  FROM (SELECT query_id, id, ROUND(fused, 6) AS fused6 FROM fsum))
SELECT query_id, id, fused6 AS fused, frank AS rank
FROM franked WHERE frank <= {_SPARSE_K}
"""


EXTRA_QUERIES["hybrid_trimodal"] = q_hybrid_trimodal
EXTRA_ORACLES["hybrid_trimodal"] = _hybrid_trimodal_oracle()


# ---------------------------------------------------------------------------
# Round-9: the sparse family under the mutation discipline —
# MutableSparseIndexStore (sources/sparse_index.py).  TWO pushes with
# cross-batch LWW: doc 7's model re-encoded vector is replaced AGAIN in
# the second batch (the higher seq must win across batches), doc 107 is
# deleted then revived with a new vector, and an absent-id delete
# no-ops.  Weights travel WITH the mutations (the learned-sparse
# contract: the model, not the store, owns the weights), so the oracle
# replays the fold as encoder output minus the mutated ids plus the
# literal vectors.

def q_sparse_store_mutations(spark: SparkSession, sf_dir: str) -> DataFrame:
    import os as _os
    import shutil
    import tempfile

    from ..operators.sparse import collect_doc_vectors, sparse_encode
    from ..operators.sparse import sparse_encode_queries
    from ..sources.sparse_index import MutableSparseIndexStore

    docs = load_table(spark, sf_dir, "documents")
    root = _os.path.join(
        tempfile.gettempdir(), f"dvss_spark_sparsestore_{_os.getpid()}",
        _os.path.basename(_os.path.normpath(sf_dir)) or "sf",
    )
    shutil.rmtree(root, ignore_errors=True)  # stale store from a prior run
    store = MutableSparseIndexStore(root)
    store.init_base(collect_doc_vectors(sparse_encode(docs)))
    schema = (
        "seq long, op string, id long, terms array<string>, "
        "weights array<double>"
    )
    store.apply_log(
        spark.createDataFrame(
            [
                (1, "upsert", 7, ["alpha", "beta"], [1.0, 2.0]),
                (2, "delete", 107, None, None),
            ],
            schema,
        )
    )
    store.apply_log(
        spark.createDataFrame(
            [
                (3, "upsert", 7, ["gamma"], [3.0]),          # supersedes seq 1
                (4, "upsert", 107, ["alpha", "delta"], [0.5, 1.5]),  # revive
                (5, "delete", 999999999, None, None),        # absent-id no-op
            ],
            schema,
        )
    )
    qp = sparse_encode_queries(_sparse_fixture_queries(spark, sf_dir))
    return store.search(spark, qp, _SPARSE_K)


def _sparse_store_oracle() -> str:
    return f"""
WITH {_sparse_ctes()},
fold AS (
  SELECT id, term, weight FROM sw WHERE id NOT IN (7, 107)
  UNION ALL
  SELECT * FROM (VALUES
    (CAST(7 AS BIGINT), 'gamma', CAST(3.0 AS DOUBLE)),
    (CAST(107 AS BIGINT), 'alpha', CAST(0.5 AS DOUBLE)),
    (CAST(107 AS BIGINT), 'delta', CAST(1.5 AS DOUBLE))
  ) t(id, term, weight)
),
mut_scored AS (
  SELECT sqw.query_id, fold.id, SUM(sqw.qweight * fold.weight) AS score
  FROM sqw JOIN fold ON fold.term = sqw.term GROUP BY 1, 2),
mut_ranked AS (
  SELECT query_id, id, score6,
         CAST(ROW_NUMBER() OVER (PARTITION BY query_id
                                 ORDER BY score6 DESC, id) AS INT) AS mrank
  FROM (SELECT query_id, id, ROUND(score, 6) AS score6 FROM mut_scored))
SELECT query_id, id, score6 AS score, mrank AS rank
FROM mut_ranked WHERE mrank <= {_SPARSE_K}
"""


EXTRA_QUERIES["sparse_store_mutations"] = q_sparse_store_mutations
EXTRA_ORACLES["sparse_store_mutations"] = _sparse_store_oracle()


# ---------------------------------------------------------------------------
# Round-9: snippet generation (operators/snippets.py) — the length-W
# token window covering the most distinct query terms per (query,
# matching doc), earliest window on ties; the highlighting half of the
# serving surface next to facets.  The exhaustive (un-paged) form is
# the oracle row; serving composes it with a ranked leg via hits=.

_SNIP_W = 8


def q_search_snippets(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.snippets import best_window_snippets

    docs = load_table(spark, sf_dir, "documents")
    return best_window_snippets(
        docs, _retrieval_queries(spark, sf_dir), _SNIP_W
    )


def _snippets_oracle() -> str:
    return f"""
WITH toks AS (SELECT doc_id, {_TOKS} AS w FROM documents),
q AS (SELECT doc_id AS query_id, list_distinct(list_slice(w, 1, 3)) AS qts
      FROM toks WHERE {_HYBRID_QPRED}),
qt AS (SELECT query_id, UNNEST(qts) AS term FROM q),
tp AS (SELECT id, pos, w[pos] AS term FROM
       (SELECT doc_id AS id, w, UNNEST(range(1, len(w) + 1)) AS pos FROM toks)),
m AS (SELECT qt.query_id, tp.id, tp.pos, qt.term FROM qt JOIN tp USING (term)),
st AS (SELECT DISTINCT query_id, id, pos AS s FROM m),
cov AS (SELECT st.query_id, st.id, st.s, m.term
        FROM st JOIN m ON m.query_id = st.query_id AND m.id = st.id
        WHERE m.pos >= st.s AND m.pos < st.s + {_SNIP_W}),
sc AS (SELECT query_id, id, s, COUNT(DISTINCT term) AS n FROM cov GROUP BY 1, 2, 3),
win AS (SELECT query_id, id, s, n FROM
        (SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id, id
                                      ORDER BY n DESC, s) AS rn FROM sc)
        WHERE rn = 1)
SELECT win.query_id, win.id,
       CAST(win.s - 1 AS INT) AS win_start,
       CAST(win.n AS INT) AS n_matched,
       array_to_string(
         list_slice(t.w, win.s, LEAST(win.s + {_SNIP_W - 1}, len(t.w))), ' '
       ) AS snippet
FROM win JOIN toks t ON t.doc_id = win.id
"""


EXTRA_QUERIES["search_snippets"] = q_search_snippets
EXTRA_ORACLES["search_snippets"] = _snippets_oracle()


# round-9 NEW-capability rotation (applied at round end, the
# established close policy): this round's flagships — the learned-
# sparse family's exact foundation and its two-push LWW store fold,
# the trimodal fusion composing all three retrieval legs, and snippet
# highlighting — join the driver window for their independent check
# THIS round.  Four rows leave in exchange (a fifth leaves from the
# vector module for retention_delete): temperature_sample and
# corpus_pack were r8 rotations already driver-verified green in
# CORRECTNESS_r08, text_quality's expression family stays covered by
# curation_pipeline, and dedup_simhash's family keeps exact/minhash/
# ngram/resolve/embedding rows in the window.  Every demoted row keeps
# the IDENTICAL DuckDB comparison in the pytest tier.
for _name in (
    "sparse_topk",
    "sparse_store_mutations",
    "hybrid_trimodal",
    "search_snippets",
):
    QUERIES[_name] = EXTRA_QUERIES.pop(_name)
    ORACLES[_name] = EXTRA_ORACLES.pop(_name)
for _name in (
    "temperature_sample",
    "corpus_pack",
    "text_quality",
    "dedup_simhash",
):
    EXTRA_QUERIES[_name] = QUERIES.pop(_name)
    EXTRA_ORACLES[_name] = ORACLES.pop(_name)
del _name


# (paired demotion for the vector-side retention_delete promotion)
EXTRA_QUERIES["ann_lsh_topk"] = QUERIES.pop("ann_lsh_topk")
EXTRA_ORACLES["ann_lsh_topk"] = ORACLES.pop("ann_lsh_topk")


# ---------------------------------------------------------------------------
# Round-9: the SparseEngine surface — the same TWO-push scenario as
# sparse_store_mutations, but driven through the ENGINE (leader-ordered
# engine-lifetime seqs, consistency gates, O(Δ) pushes at the strong
# read's compaction) and served from the attached store.  Same fold →
# REUSES the store row's oracle verbatim (the mutations_compact_
# bucketed pattern: the serving path changes, the values cannot).

def q_sparse_engine_store(spark: SparkSession, sf_dir: str) -> DataFrame:
    import os as _os
    import shutil
    import tempfile

    from ..operators.sparse import collect_doc_vectors, sparse_encode
    from ..operators.sparse import sparse_encode_queries
    from ..sparse_engine import SparseEngine

    docs = load_table(spark, sf_dir, "documents")
    eng = SparseEngine(
        spark,
        collect_doc_vectors(sparse_encode(docs)),
    )
    root = _os.path.join(
        tempfile.gettempdir(), f"dvss_spark_sparseeng_{_os.getpid()}",
        _os.path.basename(_os.path.normpath(sf_dir)) or "sf",
    )
    shutil.rmtree(root, ignore_errors=True)  # stale store from a prior run
    eng.attach_store(root)
    qp = sparse_encode_queries(_sparse_fixture_queries(spark, sf_dir))
    # push 1
    eng.upsert_doc_vector(7, ["alpha", "beta"], [1.0, 2.0])
    eng.delete_doc(107)
    eng.search(qp, _SPARSE_K, consistency="strong", method="store")
    # push 2: supersede 7 across pushes, revive 107, absent-id no-op
    eng.upsert_doc_vector(7, ["gamma"], [3.0])
    eng.upsert_doc_vector(107, ["alpha", "delta"], [0.5, 1.5])
    eng.delete_doc(999999999)
    return eng.search(qp, _SPARSE_K, consistency="strong", method="store")


EXTRA_QUERIES["sparse_engine_store"] = q_sparse_engine_store
EXTRA_ORACLES["sparse_engine_store"] = _sparse_store_oracle()


# ---------------------------------------------------------------------------
# Round-9: the champion-list (rank-capped) sparse tier — cardinality-
# bounded per-term IO (operators/sparse.cap_postings; served with a
# pushed-down impact_rank predicate from the index).  Deterministic
# rank → exact ROW_NUMBER replay, even though the tier is approximate.

_SPARSE_CAP = 64


def q_sparse_champion_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.sparse import sparse_encode_queries
    from ..sources.sparse_index import sparse_search_index

    qp = sparse_encode_queries(_sparse_fixture_queries(spark, sf_dir))
    return sparse_search_index(
        spark, _sparse_index_path(spark, sf_dir), qp, _SPARSE_K,
        per_term_cap=_SPARSE_CAP,
    )


def _sparse_champion_oracle() -> str:
    return f"""
WITH {_sparse_ctes()},
swr AS (SELECT id, term, weight,
               ROW_NUMBER() OVER (PARTITION BY term
                                  ORDER BY weight DESC, id) AS ir
        FROM sw),
swc AS (SELECT id, term, weight FROM swr WHERE ir <= {_SPARSE_CAP}),
champ_scored AS (
  SELECT sqw.query_id, swc.id, SUM(sqw.qweight * swc.weight) AS score
  FROM sqw JOIN swc ON swc.term = sqw.term GROUP BY 1, 2),
champ_ranked AS (
  SELECT query_id, id, score6,
         CAST(ROW_NUMBER() OVER (PARTITION BY query_id
                                 ORDER BY score6 DESC, id) AS INT) AS crank
  FROM (SELECT query_id, id, ROUND(score, 6) AS score6 FROM champ_scored))
SELECT query_id, id, score6 AS score, crank AS rank
FROM champ_ranked WHERE crank <= {_SPARSE_K}
"""


EXTRA_QUERIES["sparse_champion_topk"] = q_sparse_champion_topk
EXTRA_ORACLES["sparse_champion_topk"] = _sparse_champion_oracle()


# ---------------------------------------------------------------------------
# Round-9: boolean term constraints (operators/boolean.py) under BM25 —
# the AND/OR/NOT admissibility layer composed with ranking through the
# established filter_ids= contract (restriction BEFORE the rank;
# corpus-level stats, the filtered-search convention).

_BOOL_ALL = ("a", "the")
_BOOL_NONE = ("of",)


def q_bm25_boolean(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.boolean import boolean_matching_ids
    from ..operators.retrieval import bm25_topk

    docs = load_table(spark, sf_dir, "documents")
    adm = boolean_matching_ids(
        docs, all_of=_BOOL_ALL, none_of=_BOOL_NONE
    )
    return bm25_topk(
        docs, _retrieval_queries(spark, sf_dir), _HYBRID_K, filter_ids=adm
    )


def _bm25_boolean_oracle() -> str:
    all_list = ", ".join(f"'{t}'" for t in _BOOL_ALL)
    none_list = ", ".join(f"'{t}'" for t in _BOOL_NONE)
    return f"""
WITH {_bm25_scored_ctes()},
bdt AS (SELECT doc_id AS id, UNNEST(list_distinct(w)) AS term FROM toks),
bpos AS (SELECT id FROM bdt WHERE term IN ({all_list})
         GROUP BY id HAVING COUNT(DISTINCT term) = {len(_BOOL_ALL)}),
bneg AS (SELECT DISTINCT id FROM bdt WHERE term IN ({none_list})),
badm AS (SELECT id FROM bpos WHERE id NOT IN (SELECT id FROM bneg)),
bool_ranked AS (
  SELECT query_id, id, score6,
         CAST(ROW_NUMBER() OVER (PARTITION BY query_id
                                 ORDER BY score6 DESC, id) AS INT) AS rank
  FROM (SELECT s.query_id, s.id, ROUND(s.score, 6) AS score6
        FROM bm25_scored s JOIN badm USING (id)))
SELECT query_id, id, score6 AS score, rank
FROM bool_ranked WHERE rank <= {_HYBRID_K}
"""


EXTRA_QUERIES["bm25_boolean"] = q_bm25_boolean
EXTRA_ORACLES["bm25_boolean"] = _bm25_boolean_oracle()


# round-10 opening rotation (VERDICT r09 item 1, the established
# policy): round 9's late flagships — the SparseEngine surface (the
# fourth engine, whose engine-lifetime seq discipline most deserves
# independent checking), the champion-list rank-capped tier, boolean
# AND/OR/NOT admissibility, corpus facets, and weighted hybrid fusion
# — join the driver window for their independent check THIS round.
# Five rows leave in exchange, each family keeping driver coverage:
# dedup_ngram_jaccard (exact/minhash/resolve/embedding stay),
# ann_recall (thin measurement row; the ANN ladder keeps nine driver
# rows), ann_cosine_topk and ann_ivf_topk (the cosine/IVF families
# keep ann_cosine_ivf_topk / ann_cosine_ivfpq_topk / ivf_persisted_
# topk / ivf_stream_topk / ann_ivfbin_topk), and hybrid_rrf (the
# hybrid family keeps indexed/engine/store/trimodal driver rows).
# Every demoted row keeps the IDENTICAL DuckDB comparison in the
# pytest tier.
for _name in (
    "sparse_engine_store",
    "sparse_champion_topk",
    "bm25_boolean",
    "doc_facets",
    "hybrid_weighted",
):
    QUERIES[_name] = EXTRA_QUERIES.pop(_name)
    ORACLES[_name] = EXTRA_ORACLES.pop(_name)
for _name in (
    "dedup_ngram_jaccard",
    "ann_recall",
    "ann_cosine_topk",
    "ann_ivf_topk",
    "hybrid_rrf",
):
    EXTRA_QUERIES[_name] = QUERIES.pop(_name)
    EXTRA_ORACLES[_name] = ORACLES.pop(_name)
del _name


# ---------------------------------------------------------------------------
# Round-10: champion-list candidates + EXACT rescoring — the full
# two-stage plan (operators/sparse.sparse_champion_rescore_topk),
# served from the persisted index (pushed impact_rank candidates +
# a second term-IN rescore scan).  Deterministic → exact SQL replay:
# the oracle proposes from the ROW_NUMBER-capped postings and rescores
# candidates over the uncapped postings.

def q_sparse_rescore_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.sparse import sparse_encode_queries
    from ..sources.sparse_index import sparse_search_index

    qp = sparse_encode_queries(_sparse_fixture_queries(spark, sf_dir))
    return sparse_search_index(
        spark, _sparse_index_path(spark, sf_dir), qp, _SPARSE_K,
        per_term_cap=_SPARSE_CAP, rescore_candidates=True,
    )


def _sparse_rescore_oracle() -> str:
    return f"""
WITH {_sparse_ctes()},
swr AS (SELECT id, term, weight,
               ROW_NUMBER() OVER (PARTITION BY term
                                  ORDER BY weight DESC, id) AS ir
        FROM sw),
swc AS (SELECT id, term, weight FROM swr WHERE ir <= {_SPARSE_CAP}),
cand AS (SELECT DISTINCT sqw.query_id, swc.id
         FROM sqw JOIN swc ON swc.term = sqw.term),
resc AS (
  SELECT sqw.query_id, sw.id, SUM(sqw.qweight * sw.weight) AS score
  FROM sqw JOIN sw ON sw.term = sqw.term
  JOIN cand ON cand.query_id = sqw.query_id AND cand.id = sw.id
  GROUP BY 1, 2),
resc_ranked AS (
  SELECT query_id, id, score6,
         CAST(ROW_NUMBER() OVER (PARTITION BY query_id
                                 ORDER BY score6 DESC, id) AS INT) AS rrank
  FROM (SELECT query_id, id, ROUND(score, 6) AS score6 FROM resc))
SELECT query_id, id, score6 AS score, rrank AS rank
FROM resc_ranked WHERE rrank <= {_SPARSE_K}
"""


EXTRA_QUERIES["sparse_rescore_topk"] = q_sparse_rescore_topk
EXTRA_ORACLES["sparse_rescore_topk"] = _sparse_rescore_oracle()


# ---------------------------------------------------------------------------
# Round-10: the query-understanding / serving-UX family — fuzzy term
# matching, autocomplete, field collapsing, pseudo-relevance feedback
# (operators/fuzzy.py, complete.py, collapse.py, feedback.py).  Every
# member is deterministic by construction and carries an exact DuckDB
# replay, including the two approximate-looking ones (fuzzy expansion
# caps rank on (df, term); PRF selection ranks on 6-decimal rounded
# centroid weights).

_FUZZY_EDITS = 1
_FUZZY_EXPANSIONS = 10


def q_bm25_fuzzy_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Typo-tolerant BM25: every fixture query term is corrupted with a
    one-character suffix (edit distance 1 from the real vocabulary
    term), then recovered through edit-distance expansion."""
    from ..operators.fuzzy import bm25_fuzzy_topk

    docs = load_table(spark, sf_dir, "documents")
    typod = _retrieval_queries(spark, sf_dir).select(
        "query_id",
        F.transform("qterms", lambda t: F.concat(t, F.lit("x"))).alias("qterms"),
    )
    return bm25_fuzzy_topk(
        docs, typod, _HYBRID_K,
        max_edits=_FUZZY_EDITS, max_expansions=_FUZZY_EXPANSIONS,
    )


def _bm25_fuzzy_oracle() -> str:
    from ..operators.retrieval import BM25_B, BM25_K1

    return f"""
WITH toks AS (SELECT doc_id, {_TOKS} AS w FROM documents),
q AS (SELECT doc_id AS query_id, list_distinct(list_slice(w, 1, 3)) AS qts
      FROM toks WHERE {_HYBRID_QPRED}),
qx AS (SELECT DISTINCT query_id, UNNEST(qts) || 'x' AS qterm FROM q),
vx AS (SELECT doc_id AS id, UNNEST(w) AS term FROM toks),
vocab AS (SELECT term, COUNT(DISTINCT id) AS vdf FROM vx GROUP BY 1),
expd AS (
  SELECT DISTINCT query_id, term FROM (
    SELECT qx.query_id, qx.qterm, v.term,
           ROW_NUMBER() OVER (PARTITION BY qx.query_id, qx.qterm
                              ORDER BY v.vdf DESC, v.term) AS xrn
    FROM qx JOIN vocab v
      ON abs(length(v.term) - length(qx.qterm)) <= {_FUZZY_EDITS}
     AND levenshtein(v.term, qx.qterm) <= {_FUZZY_EDITS})
  WHERE xrn <= {_FUZZY_EXPANSIONS}),
dl AS (SELECT doc_id AS id, len(w) AS dl FROM toks),
tfc AS (SELECT id, term, COUNT(*) AS tf FROM vx GROUP BY 1, 2),
stats AS (SELECT COUNT(*) AS n_docs, AVG(CAST(dl AS DOUBLE)) AS avgdl FROM dl),
dfq AS (SELECT term, COUNT(DISTINCT id) AS df FROM tfc
        WHERE term IN (SELECT DISTINCT term FROM expd) GROUP BY 1),
fz_scored AS (
  SELECT e.query_id, tfc.id,
         SUM(LN(1.0 + (s.n_docs - d.df + 0.5) / (d.df + 0.5))
             * (tfc.tf * ({BM25_K1} + 1.0))
             / (tfc.tf + {BM25_K1} * (1.0 - {BM25_B}
                + {BM25_B} * CAST(dl.dl AS DOUBLE) / s.avgdl))) AS score
  FROM expd e
  JOIN tfc ON tfc.term = e.term
  JOIN dfq d ON d.term = e.term
  JOIN dl ON dl.id = tfc.id
  CROSS JOIN stats s
  GROUP BY 1, 2),
fz_ranked AS (
  SELECT query_id, id, score6,
         CAST(ROW_NUMBER() OVER (PARTITION BY query_id
                                 ORDER BY score6 DESC, id) AS INT) AS frank
  FROM (SELECT query_id, id, ROUND(score, 6) AS score6 FROM fz_scored))
SELECT query_id, id, score6 AS score, frank AS rank
FROM fz_ranked WHERE frank <= {_HYBRID_K}
"""


EXTRA_QUERIES["bm25_fuzzy_topk"] = q_bm25_fuzzy_topk
EXTRA_ORACLES["bm25_fuzzy_topk"] = _bm25_fuzzy_oracle()


_COMPLETE_QPRED = "doc_id % 100 = 23"
_COMPLETE_K = 5
_COMPLETE_MIN_DF = 2


def q_prefix_complete(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Autocomplete: the first 3 characters of each selected doc's
    first token, completed from the corpus vocabulary (df desc)."""
    from ..functions.text import tokens
    from ..operators.complete import prefix_completions
    from ..operators.fuzzy import corpus_vocabulary

    docs = load_table(spark, sf_dir, "documents")
    prefixes = docs.filter(F.expr(_COMPLETE_QPRED)).select(
        F.col("doc_id").alias("prefix_id"),
        F.substring(F.element_at(tokens("text"), 1), 1, 3).alias("prefix"),
    )
    return prefix_completions(
        corpus_vocabulary(docs), prefixes, _COMPLETE_K,
        min_df=_COMPLETE_MIN_DF,
    )


def _prefix_complete_oracle() -> str:
    return f"""
WITH toks AS (SELECT doc_id, {_TOKS} AS w FROM documents),
vx AS (SELECT doc_id AS id, UNNEST(w) AS term FROM toks),
vocab AS (SELECT term, COUNT(DISTINCT id) AS df FROM vx GROUP BY 1),
px AS (SELECT doc_id AS prefix_id, substr(w[1], 1, 3) AS prefix
       FROM toks WHERE {_COMPLETE_QPRED}),
m AS (SELECT px.prefix_id, v.term, v.df
      FROM px JOIN vocab v ON starts_with(v.term, px.prefix)
      WHERE v.df >= {_COMPLETE_MIN_DF})
SELECT prefix_id, term, df, rank FROM (
  SELECT prefix_id, term, df,
         CAST(ROW_NUMBER() OVER (PARTITION BY prefix_id
                                 ORDER BY df DESC, term) AS INT) AS rank
  FROM m)
WHERE rank <= {_COMPLETE_K}
"""


EXTRA_QUERIES["prefix_complete"] = q_prefix_complete
EXTRA_ORACLES["prefix_complete"] = _prefix_complete_oracle()


_COLLAPSE_LEG_K = 20
_COLLAPSE_K = 10


def q_bm25_collapse(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Field collapsing: the BM25 page collapsed to the best hit per
    ``source`` value, survivors re-ranked."""
    from ..operators.collapse import collapse_topk
    from ..operators.retrieval import bm25_topk

    docs = load_table(spark, sf_dir, "documents")
    hits = bm25_topk(
        docs, _retrieval_queries(spark, sf_dir), _COLLAPSE_LEG_K
    )
    return collapse_topk(hits, docs, "source", _COLLAPSE_K, per_group=1)


def _bm25_collapse_oracle() -> str:
    return f"""
WITH {_bm25_scored_ctes()},
page AS (SELECT query_id, id, score6 FROM bm25_ranked
         WHERE brank <= {_COLLAPSE_LEG_K}),
attrs AS (SELECT doc_id AS id,
                 COALESCE(CAST(source AS VARCHAR), 'null') AS grp
          FROM documents),
grouped AS (
  SELECT p.query_id, p.id, a.grp, p.score6,
         ROW_NUMBER() OVER (PARTITION BY p.query_id, a.grp
                            ORDER BY p.score6 DESC, p.id) AS grn
  FROM page p JOIN attrs a USING (id)),
kept AS (SELECT query_id, id, grp, score6 FROM grouped WHERE grn <= 1)
SELECT query_id, id, grp AS "group", score6 AS score, rank FROM (
  SELECT *, CAST(ROW_NUMBER() OVER (PARTITION BY query_id
                                    ORDER BY score6 DESC, id) AS INT) AS rank
  FROM kept)
WHERE rank <= {_COLLAPSE_K}
"""


EXTRA_QUERIES["bm25_collapse"] = q_bm25_collapse
EXTRA_ORACLES["bm25_collapse"] = _bm25_collapse_oracle()


_PRF_FB_DOCS = 5
_PRF_FB_TERMS = 5
_PRF_ALPHA = 1.0
_PRF_BETA = 0.5


def q_bm25_prf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pseudo-relevance feedback: BM25 first pass → Rocchio centroid
    expansion in tf–idf space → weighted second pass."""
    from ..operators.feedback import bm25_prf_topk

    docs = load_table(spark, sf_dir, "documents")
    return bm25_prf_topk(
        docs, _retrieval_queries(spark, sf_dir), _HYBRID_K,
        fb_docs=_PRF_FB_DOCS, fb_terms=_PRF_FB_TERMS,
        alpha=_PRF_ALPHA, beta=_PRF_BETA,
    )


def _bm25_prf_oracle() -> str:
    return f"""
WITH {_bm25_scored_ctes()},
{_sparse_ctes()},
fb AS (SELECT query_id, id FROM bm25_ranked WHERE brank <= {_PRF_FB_DOCS}),
nfb AS (SELECT query_id, COUNT(*) AS n FROM fb GROUP BY 1),
cent AS (
  SELECT fb.query_id, sw.term,
         ROUND(SUM(sw.weight) / ANY_VALUE(nfb.n), 6) AS fb_weight
  FROM fb JOIN sw ON sw.id = fb.id JOIN nfb ON nfb.query_id = fb.query_id
  GROUP BY 1, 2),
orig AS (SELECT query_id, UNNEST(qts) AS term FROM q),
fresh AS (SELECT c.* FROM cent c LEFT JOIN orig o
          ON o.query_id = c.query_id AND o.term = c.term
          WHERE o.term IS NULL),
sel AS (SELECT query_id, term, fb_weight FROM (
          SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                    ORDER BY fb_weight DESC, term) AS frn
          FROM fresh)
        WHERE frn <= {_PRF_FB_TERMS}),
alpha_ch AS (SELECT query_id, term,
                    {_PRF_ALPHA} * (1.0 + LN(CAST(COUNT(*) AS DOUBLE))) AS wq
             FROM orig GROUP BY 1, 2),
beta_ch AS (SELECT query_id, term, {_PRF_BETA} * fb_weight AS wq FROM sel),
qp AS (SELECT query_id, term, SUM(wq) AS wq FROM (
         SELECT * FROM alpha_ch UNION ALL SELECT * FROM beta_ch)
       GROUP BY 1, 2 HAVING SUM(wq) <> 0),
prf_scored AS (
  SELECT qp.query_id, sw.id, SUM(qp.wq * sw.weight) AS score
  FROM qp JOIN sw ON sw.term = qp.term GROUP BY 1, 2),
prf_ranked AS (
  SELECT query_id, id, score6,
         CAST(ROW_NUMBER() OVER (PARTITION BY query_id
                                 ORDER BY score6 DESC, id) AS INT) AS prank
  FROM (SELECT query_id, id, ROUND(score, 6) AS score6 FROM prf_scored))
SELECT query_id, id, score6 AS score, prank AS rank
FROM prf_ranked WHERE prank <= {_HYBRID_K}
"""


EXTRA_QUERIES["bm25_prf_topk"] = q_bm25_prf_topk
EXTRA_ORACLES["bm25_prf_topk"] = _bm25_prf_oracle()


# ---------------------------------------------------------------------------
# round 10: more-like-this, function scoring, Matryoshka adaptive retrieval

_MLT_SEED_PRED = "doc_id % 100 = 7"
_MLT_TERMS = 8
_MLT_MIN_DF = 2
_MLT_K = 10


def q_bm25_mlt_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """More-like-this: tf–idf representative-term selection from seed
    docs (df-gated), BM25 retrieval with the selected terms, seed
    excluded — operators/mlt.py, exactly SQL-replayed end to end."""
    from ..operators.mlt import bm25_mlt_topk

    docs = load_table(spark, sf_dir, "documents")
    seeds = docs.filter(F.expr(_MLT_SEED_PRED)).select(
        F.col("doc_id").alias("seed_id")
    )
    return bm25_mlt_topk(
        docs, seeds, _MLT_K,
        max_query_terms=_MLT_TERMS, min_df=_MLT_MIN_DF,
    )


def _bm25_mlt_oracle() -> str:
    from ..operators.retrieval import BM25_B, BM25_K1

    return f"""
WITH {_sparse_ctes()},
seeds AS (SELECT doc_id AS query_id FROM documents WHERE {_MLT_SEED_PRED}),
gated AS (SELECT sw.id AS query_id, sw.term, sw.weight
          FROM sw
          JOIN seeds ON seeds.query_id = sw.id
          JOIN sdf ON sdf.term = sw.term
          WHERE sdf.df >= {_MLT_MIN_DF}),
sel AS (SELECT query_id, term FROM (
          SELECT query_id, term,
                 ROW_NUMBER() OVER (PARTITION BY query_id
                     ORDER BY ROUND(weight, 6) DESC, term) AS rn
          FROM gated) WHERE rn <= {_MLT_TERMS}),
mstats AS (SELECT COUNT(*) AS n_docs, AVG(CAST(len(w) AS DOUBLE)) AS avgdl
           FROM stoks),
mdl AS (SELECT doc_id AS id, len(w) AS dl FROM stoks),
mscored AS (
  SELECT sel.query_id, t.id,
         SUM(LN(1.0 + (s.n_docs - d.df + 0.5) / (d.df + 0.5))
             * (t.tf * ({BM25_K1} + 1.0))
             / (t.tf + {BM25_K1} * (1.0 - {BM25_B}
                + {BM25_B} * CAST(dl.dl AS DOUBLE) / s.avgdl))) AS score
  FROM sel
  JOIN sdtf t ON t.term = sel.term
  JOIN sdf d ON d.term = sel.term
  JOIN mdl dl ON dl.id = t.id
  CROSS JOIN mstats s
  WHERE t.id <> sel.query_id
  GROUP BY 1, 2),
mranked AS (
  SELECT query_id, id, score6,
         CAST(ROW_NUMBER() OVER (PARTITION BY query_id
                                 ORDER BY score6 DESC, id) AS INT) AS mrank
  FROM (SELECT query_id, id, ROUND(score, 6) AS score6 FROM mscored))
SELECT query_id, id, score6 AS score, mrank AS rank
FROM mranked WHERE mrank <= {_MLT_K}
"""


EXTRA_QUERIES["bm25_mlt_topk"] = q_bm25_mlt_topk
EXTRA_ORACLES["bm25_mlt_topk"] = _bm25_mlt_oracle()


_FS_WEIGHT = 0.1
_FS_K = 5
_DECAY_ORIGIN = 500.0
_DECAY_SCALE = 300.0
_DECAY_RATE = 0.5


def q_function_score_boost(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Field-value-factor boost (log1p length prior) composed onto the
    BM25 leg's k-bounded hits, re-ranked — operators/scoring.py."""
    from ..operators.retrieval import bm25_topk
    from ..operators.scoring import field_value_factor, function_score

    docs = load_table(spark, sf_dir, "documents")
    hits = bm25_topk(docs, _retrieval_queries(spark, sf_dir), _HYBRID_K).select(
        "query_id", "id", "score"
    )
    fvf = field_value_factor(
        docs, "n_chars", weight=_FS_WEIGHT, modifier="log1p"
    )
    return function_score(hits, fvf, _FS_K)


def _function_score_boost_oracle() -> str:
    return f"""
WITH {_bm25_scored_ctes()},
hits AS (SELECT query_id, id, score6 FROM bm25_ranked WHERE brank <= {_HYBRID_K}),
fac AS (SELECT doc_id AS id,
               {_FS_WEIGHT} * LN(1.0 + CAST(n_chars AS DOUBLE)) AS factor
        FROM documents),
fscored AS (SELECT h.query_id, h.id,
                   ROUND(h.score6 * COALESCE(f.factor, 1.0), 6) AS score
            FROM hits h LEFT JOIN fac f ON f.id = h.id),
franked AS (SELECT query_id, id, score,
                   CAST(ROW_NUMBER() OVER (PARTITION BY query_id
                        ORDER BY score DESC, id) AS INT) AS rank
            FROM fscored)
SELECT query_id, id, score, rank FROM franked WHERE rank <= {_FS_K}
"""


EXTRA_QUERIES["function_score_boost"] = q_function_score_boost
EXTRA_ORACLES["function_score_boost"] = _function_score_boost_oracle()


def q_function_score_decay(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gaussian decay around a length origin composed onto the BM25
    leg — the recency-decay shape (the operator is unit-agnostic; the
    fixtures carry no timestamp column, so the decayed field is the
    length prior)."""
    from ..operators.retrieval import bm25_topk
    from ..operators.scoring import decay_factor, function_score

    docs = load_table(spark, sf_dir, "documents")
    hits = bm25_topk(docs, _retrieval_queries(spark, sf_dir), _HYBRID_K).select(
        "query_id", "id", "score"
    )
    fac = decay_factor(
        docs, "n_chars",
        origin=_DECAY_ORIGIN, scale=_DECAY_SCALE, decay=_DECAY_RATE,
        kind="gauss",
    )
    return function_score(hits, fac, _FS_K)


def _function_score_decay_oracle() -> str:
    import math

    return f"""
WITH {_bm25_scored_ctes()},
hits AS (SELECT query_id, id, score6 FROM bm25_ranked WHERE brank <= {_HYBRID_K}),
facd AS (SELECT doc_id AS id,
                GREATEST(0.0, ABS(CAST(n_chars AS DOUBLE) - {_DECAY_ORIGIN!r})
                         - 0.0) / {_DECAY_SCALE!r} AS d
         FROM documents),
fac AS (SELECT id, EXP({math.log(_DECAY_RATE)!r} * (d * d)) AS factor FROM facd),
fscored AS (SELECT h.query_id, h.id,
                   ROUND(h.score6 * COALESCE(f.factor, 1.0), 6) AS score
            FROM hits h LEFT JOIN fac f ON f.id = h.id),
franked AS (SELECT query_id, id, score,
                   CAST(ROW_NUMBER() OVER (PARTITION BY query_id
                        ORDER BY score DESC, id) AS INT) AS rank
            FROM fscored)
SELECT query_id, id, score, rank FROM franked WHERE rank <= {_FS_K}
"""


EXTRA_QUERIES["function_score_decay"] = q_function_score_decay
EXTRA_ORACLES["function_score_decay"] = _function_score_decay_oracle()


_MRL_QPRED = "vec_id % 100 = 7"
_MRL_DP = 16
_MRL_SHORTLIST = 50
_MRL_K = 5


def q_ann_matryoshka_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Matryoshka adaptive retrieval: d′-prefix coarse shortlist →
    exact full-dim cosine rescore (operators/matryoshka.py) — the
    approximate rung keeps an exact two-stage SQL replay."""
    from ..operators.matryoshka import matryoshka_topk

    emb = load_table(spark, sf_dir, "embeddings")
    q = emb.filter(F.expr(_MRL_QPRED)).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qvec")
    )
    return matryoshka_topk(
        emb, q, _MRL_K, d_prime=_MRL_DP, shortlist=_MRL_SHORTLIST
    ).select("query_id", "id", F.round("cosine", 6).alias("cosine"), "rank")


def _ann_matryoshka_oracle() -> str:
    coarse = _SQL_COSINE.format(
        x=f"q.qe[1:{_MRL_DP}]", y=f"v.embedding[1:{_MRL_DP}]"
    )
    full = _SQL_COSINE.format(x="q.qe", y="v.embedding")
    return f"""
WITH q AS (SELECT vec_id AS query_id, embedding AS qe
           FROM embeddings WHERE {_MRL_QPRED}),
coarse AS (SELECT q.query_id, v.vec_id AS id, {coarse} AS c
           FROM q CROSS JOIN embeddings v),
shortl AS (SELECT query_id, id FROM (
             SELECT query_id, id,
                    ROW_NUMBER() OVER (PARTITION BY query_id
                                       ORDER BY c DESC, id) AS rn
             FROM coarse) WHERE rn <= {_MRL_SHORTLIST}),
resc AS (SELECT s.query_id, s.id, {full} AS c
         FROM shortl s
         JOIN q ON q.query_id = s.query_id
         JOIN embeddings v ON v.vec_id = s.id),
ranked AS (SELECT query_id, id, c,
                  CAST(ROW_NUMBER() OVER (PARTITION BY query_id
                       ORDER BY c DESC, id) AS INT) AS rank
           FROM resc)
SELECT query_id, id, ROUND(c, 6) AS cosine, rank
FROM ranked WHERE rank <= {_MRL_K}
"""


EXTRA_QUERIES["ann_matryoshka_topk"] = q_ann_matryoshka_topk
EXTRA_ORACLES["ann_matryoshka_topk"] = _ann_matryoshka_oracle()


# ---------------------------------------------------------------------------
# round 10: benchmark decontamination (n-gram overlap audit + the verb)

_CONTAM_BENCH_PRED = "doc_id % 97 = 3"
_CONTAM_N = 3
_CONTAM_BENCH_TOKENS = 10
_CONTAM_MIN_OVERLAP = 2

#: n=3 shingle rendering of functions.text.word_shingles for DuckDB —
#: shingle i = w[i..i+2] space-joined, first-occurrence distinct
_SHINGLES3 = (
    "list_distinct(list_transform(range(1, len({col}) - 1), "
    "i -> {col}[i] || ' ' || {col}[i+1] || ' ' || {col}[i+2]))"
)


def _contam_bench(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The fixture 'benchmark': eval items cut from the corpus' own
    documents (first N tokens of every 97th doc) — guaranteeing real
    overlap structure without shipping an eval set in-container."""
    from ..functions.text import tokens as _tokens

    docs = load_table(spark, sf_dir, "documents")
    return docs.filter(F.expr(_CONTAM_BENCH_PRED)).select(
        F.col("doc_id").alias("bench_id"),
        F.array_join(
            F.slice(_tokens("text"), 1, _CONTAM_BENCH_TOKENS), " "
        ).alias("text"),
    )


def q_contamination_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-(training doc, benchmark item) shared n-gram audit —
    operators/contamination.py."""
    from ..operators.contamination import contamination_overlap

    docs = load_table(spark, sf_dir, "documents")
    return contamination_overlap(
        docs, _contam_bench(spark, sf_dir), n=_CONTAM_N
    )


_CONTAM_CTES = f"""
toksc AS (SELECT doc_id, {_TOKS} AS w FROM documents),
bt AS (SELECT doc_id AS bench_id, list_slice(w, 1, {_CONTAM_BENCH_TOKENS}) AS bw
       FROM toksc WHERE {_CONTAM_BENCH_PRED}),
bsh AS (SELECT bench_id, {_SHINGLES3.format(col="bw")} AS s FROM bt),
bex AS (SELECT bench_id, UNNEST(s) AS shingle FROM bsh),
bsz AS (SELECT bench_id, len(s) AS bn FROM bsh),
dsh AS (SELECT doc_id, {_SHINGLES3.format(col="w")} AS s FROM toksc),
dex AS (SELECT doc_id, UNNEST(s) AS shingle FROM dsh),
chits AS (SELECT d.doc_id, b.bench_id, COUNT(*) AS overlap
          FROM dex d JOIN bex b ON b.shingle = d.shingle
          GROUP BY 1, 2)"""


def _contamination_overlap_oracle() -> str:
    return f"""
WITH {_CONTAM_CTES}
SELECT h.doc_id, h.bench_id, h.overlap, z.bn AS bench_shingles,
       ROUND(CAST(h.overlap AS DOUBLE) / z.bn, 6) AS frac
FROM chits h JOIN bsz z ON z.bench_id = h.bench_id
"""


EXTRA_QUERIES["contamination_overlap"] = q_contamination_overlap
EXTRA_ORACLES["contamination_overlap"] = _contamination_overlap_oracle()


def q_decontaminate_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The pipeline verb: the corpus minus docs sharing >= min_overlap
    n-grams with any benchmark item."""
    from ..operators.contamination import decontaminate

    docs = load_table(spark, sf_dir, "documents")
    return decontaminate(
        docs, _contam_bench(spark, sf_dir),
        n=_CONTAM_N, min_overlap=_CONTAM_MIN_OVERLAP,
    ).select("doc_id", "lang", "source", "n_chars")


def _decontaminate_oracle() -> str:
    return f"""
WITH {_CONTAM_CTES}
SELECT doc_id, lang, source, n_chars FROM documents
WHERE doc_id NOT IN (
  SELECT DISTINCT doc_id FROM chits WHERE overlap >= {_CONTAM_MIN_OVERLAP})
"""


EXTRA_QUERIES["decontaminate_docs"] = q_decontaminate_docs
EXTRA_ORACLES["decontaminate_docs"] = _decontaminate_oracle()


# round-11 opening rotation (the established per-round policy,
# VERDICT r09 item 1 precedent): round 10's late flagships join the
# driver window for their independent check — the query-understanding
# family's typo and feedback legs (bm25_fuzzy_topk, bm25_prf_topk),
# more-like-this (bm25_mlt_topk, the fourth query-understanding verb),
# Matryoshka adaptive retrieval (ann_matryoshka_topk, the
# adaptive-dimension ANN rung), benchmark decontamination
# (contamination_overlap, the governance audit), and function scoring
# (function_score_boost, the ranking-composition layer).  Six rows
# leave in exchange — three here, three in registry/vector.py — each
# family keeping driver coverage: dedup_exact (minhash/embedding/
# resolve stay), bm25_filtered (the filtered-search contract keeps
# knn_filtered driver-side; bm25 keeps five driver rows), and
# hybrid_indexed_rrf (hybrid keeps engine/weighted/trimodal/store
# rows).  Every demoted row keeps the IDENTICAL DuckDB comparison in
# the pytest tier.
for _name in (
    "bm25_fuzzy_topk",
    "bm25_prf_topk",
    "bm25_mlt_topk",
    "ann_matryoshka_topk",
    "contamination_overlap",
    "function_score_boost",
):
    QUERIES[_name] = EXTRA_QUERIES.pop(_name)
    ORACLES[_name] = EXTRA_ORACLES.pop(_name)
for _name in (
    "dedup_exact",
    "bm25_filtered",
    "hybrid_indexed_rrf",
):
    EXTRA_QUERIES[_name] = QUERIES.pop(_name)
    EXTRA_ORACLES[_name] = ORACLES.pop(_name)
del _name


# ---------------------------------------------------------------------------
# round 10: percolation (reverse search) and synonym expansion

_PERC_PRED = "doc_id % 101 = 5"
_PERC_MIN_MATCH = 2


def q_percolate_matches(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reverse search: every document matched against a registry of
    stored boolean queries (min_match=2 of each query's terms, one
    negative term) — operators/percolate.py."""
    from ..functions.text import tokens as _tokens
    from ..operators.percolate import percolate

    docs = load_table(spark, sf_dir, "documents")
    stored = docs.filter(F.expr(_PERC_PRED)).select(
        F.col("doc_id").alias("query_id"),
        F.slice(_tokens("text"), 1, 4).alias("qterms"),
        F.slice(_tokens("text"), 6, 1).alias("none_terms"),
    )
    return percolate(
        docs, stored,
        min_match=_PERC_MIN_MATCH, none_terms_col="none_terms",
    )


def _percolate_oracle() -> str:
    return f"""
WITH ptoks AS (SELECT doc_id, {_TOKS} AS w FROM documents),
st AS (SELECT doc_id AS query_id,
              list_distinct(list_slice(w, 1, 4)) AS qt,
              list_distinct(list_slice(w, 6, 6)) AS nt
       FROM ptoks WHERE {_PERC_PRED}),
pq AS (SELECT query_id, UNNEST(qt) AS term,
              LEAST({_PERC_MIN_MATCH}, len(qt)) AS required
       FROM st WHERE len(qt) >= 1),
dex AS (SELECT doc_id, UNNEST(list_distinct(w)) AS term FROM ptoks),
m AS (SELECT d.doc_id, q.query_id,
             CAST(COUNT(*) AS BIGINT) AS matched,
             ANY_VALUE(q.required) AS required
      FROM dex d JOIN pq q ON q.term = d.term
      GROUP BY 1, 2
      HAVING COUNT(*) >= ANY_VALUE(q.required)),
nq AS (SELECT query_id, UNNEST(nt) AS term FROM st),
veto AS (SELECT DISTINCT d.doc_id, n.query_id
         FROM dex d JOIN nq n ON n.term = d.term)
SELECT m.doc_id, m.query_id, m.matched, m.required
FROM m LEFT JOIN veto v
  ON v.doc_id = m.doc_id AND v.query_id = m.query_id
WHERE v.doc_id IS NULL
"""


EXTRA_QUERIES["percolate_matches"] = q_percolate_matches
EXTRA_ORACLES["percolate_matches"] = _percolate_oracle()


_SYN_WEIGHT = 0.5
_SYN_K = 10


def _syn_thesaurus(spark: SparkSession, sf_dir: str, q: DataFrame) -> DataFrame:
    """Deterministic fixture thesaurus: each distinct query term maps
    to the alphabetically-smallest OTHER corpus term sharing its
    2-char prefix (equi-join on the prefix, broadcast query side, one
    min aggregate — the construction is itself scale-shaped).  Stands
    in for a curated synonym file; the operator takes any
    (term, synonym, weight) frame."""
    from ..functions.text import tokens as _tokens

    docs = load_table(spark, sf_dir, "documents")
    vocab = (
        docs.select(F.explode(_tokens("text")).alias("_vt"))
        .distinct()
        .withColumn("_p2", F.substring("_vt", 1, 2))
    )
    qt = (
        q.select(F.explode("qterms").alias("_qt"))
        .distinct()
        .withColumn("_p2", F.substring("_qt", 1, 2))
    )
    return (
        vocab.join(F.broadcast(qt), "_p2")
        .filter(F.col("_vt") != F.col("_qt"))
        .groupBy(F.col("_qt").alias("term"))
        .agg(F.min("_vt").alias("synonym"))
        .select("term", "synonym", F.lit(1.0).alias("weight"))
    )


def q_sparse_synonym_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Synonym-expanded retrieval: two-channel (original + discounted
    thesaurus expansion) weighted query over the tf-idf postings —
    operators/synonyms.py."""
    from ..operators.synonyms import sparse_synonym_topk

    docs = load_table(spark, sf_dir, "documents")
    q = _retrieval_queries(spark, sf_dir)
    return sparse_synonym_topk(
        docs, q, _syn_thesaurus(spark, sf_dir, q), _SYN_K,
        weight=_SYN_WEIGHT,
    )


def _sparse_synonym_oracle() -> str:
    return f"""
WITH {_sparse_ctes()},
synq AS (SELECT doc_id AS query_id, list_distinct(list_slice(w, 1, 3)) AS qts
         FROM stoks WHERE {_HYBRID_QPRED}),
synqt AS (SELECT query_id, UNNEST(qts) AS term FROM synq),
synvocab AS (SELECT DISTINCT term, substr(term, 1, 2) AS p2 FROM sdt),
syndqt AS (SELECT DISTINCT term AS qt, substr(term, 1, 2) AS p2 FROM synqt),
thes AS (SELECT d.qt AS term, MIN(v.term) AS synonym, 1.0 AS tw
         FROM synvocab v JOIN syndqt d ON d.p2 = v.p2
         WHERE v.term <> d.qt GROUP BY 1),
synorig AS (SELECT query_id, term,
                   1.0 + LN(CAST(COUNT(*) AS DOUBLE)) AS weight
            FROM synqt GROUP BY 1, 2),
synexp AS (SELECT o.query_id, t.synonym AS term,
                  SUM({_SYN_WEIGHT} * t.tw) AS weight
           FROM (SELECT DISTINCT query_id, term FROM synorig) o
           JOIN thes t ON t.term = o.term
           GROUP BY 1, 2),
synqp AS (SELECT query_id, term, SUM(weight) AS weight FROM (
            SELECT * FROM synorig UNION ALL SELECT * FROM synexp)
          GROUP BY 1, 2 HAVING SUM(weight) <> 0),
synscored AS (
  SELECT synqp.query_id, sw.id, SUM(synqp.weight * sw.weight) AS score
  FROM synqp JOIN sw ON sw.term = synqp.term GROUP BY 1, 2),
synranked AS (
  SELECT query_id, id, score6,
         CAST(ROW_NUMBER() OVER (PARTITION BY query_id
                                 ORDER BY score6 DESC, id) AS INT) AS srnk
  FROM (SELECT query_id, id, ROUND(score, 6) AS score6 FROM synscored))
SELECT query_id, id, score6 AS score, srnk AS rank
FROM synranked WHERE srnk <= {_SYN_K}
"""


EXTRA_QUERIES["sparse_synonym_topk"] = q_sparse_synonym_topk
EXTRA_ORACLES["sparse_synonym_topk"] = _sparse_synonym_oracle()


# ---------------------------------------------------------------------------
# round 10: histogram facets + significant terms (search analytics)

_HIST_WIDTH = 200.0
_HIST_HITS_WIDTH = 250.0
_SIG_TOP = 5
_SIG_MIN_FG = 2


def q_doc_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-interval histogram over the corpus length column —
    operators/facets.histogram_facet (ES histogram aggregation)."""
    from ..operators.facets import histogram_facet

    docs = load_table(spark, sf_dir, "documents")
    return histogram_facet(docs, "n_chars", width=_HIST_WIDTH)


_DOC_HISTOGRAM_SQL = f"""
SELECT 0.0 + FLOOR((CAST(n_chars AS DOUBLE) - 0.0) / {_HIST_WIDTH!r})
           * {_HIST_WIDTH!r} AS bucket,
       CAST(COUNT(*) AS BIGINT) AS count
FROM documents WHERE n_chars IS NOT NULL GROUP BY 1
"""

EXTRA_QUERIES["doc_histogram"] = q_doc_histogram
EXTRA_ORACLES["doc_histogram"] = _DOC_HISTOGRAM_SQL


def q_bm25_hits_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-query match-set histogram (the facet-sidebar date/length
    bars) — operators/facets.histogram_for_hits over the BM25 match
    set."""
    from ..operators.facets import histogram_for_hits
    from ..operators.retrieval import bm25_scores

    docs = load_table(spark, sf_dir, "documents")
    hits = bm25_scores(docs, _retrieval_queries(spark, sf_dir)).select(
        "query_id", "id"
    )
    return histogram_for_hits(
        hits, docs, "n_chars", width=_HIST_HITS_WIDTH
    )


def _bm25_hits_histogram_oracle() -> str:
    return f"""
WITH {_bm25_scored_ctes()},
hset AS (SELECT DISTINCT query_id, id FROM bm25_scored),
hb AS (SELECT h.query_id,
              0.0 + FLOOR((CAST(d.n_chars AS DOUBLE) - 0.0)
                          / {_HIST_HITS_WIDTH!r}) * {_HIST_HITS_WIDTH!r}
                AS bucket
       FROM hset h JOIN documents d ON d.doc_id = h.id
       WHERE d.n_chars IS NOT NULL)
SELECT query_id, bucket, CAST(COUNT(*) AS BIGINT) AS count
FROM hb GROUP BY 1, 2
"""


EXTRA_QUERIES["bm25_hits_histogram"] = q_bm25_hits_histogram
EXTRA_ORACLES["bm25_hits_histogram"] = _bm25_hits_histogram_oracle()


def q_bm25_sig_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Significant terms (JLH) of each query's BM25 match set vs the
    corpus background — operators/facets.significant_terms."""
    from ..operators.facets import significant_terms
    from ..operators.retrieval import bm25_scores

    docs = load_table(spark, sf_dir, "documents")
    hits = bm25_scores(docs, _retrieval_queries(spark, sf_dir)).select(
        "query_id", "id"
    )
    return significant_terms(
        hits, docs, _SIG_TOP, min_fg_df=_SIG_MIN_FG
    )


def _bm25_sig_terms_oracle() -> str:
    return f"""
WITH {_bm25_scored_ctes()},
hset AS (SELECT DISTINCT query_id, id FROM bm25_scored),
msz AS (SELECT query_id, COUNT(*) AS m FROM hset GROUP BY 1),
dterms AS (SELECT doc_id AS id, UNNEST(list_distinct(w)) AS term FROM toks),
fg AS (SELECT h.query_id, d.term, CAST(COUNT(*) AS BIGINT) AS fg_df
       FROM dterms d JOIN hset h ON h.id = d.id
       GROUP BY 1, 2 HAVING COUNT(*) >= {_SIG_MIN_FG}),
bg AS (SELECT term, CAST(COUNT(*) AS BIGINT) AS bg_df FROM dterms
       WHERE term IN (SELECT DISTINCT term FROM fg) GROUP BY 1),
nn AS (SELECT COUNT(*) AS n FROM documents),
sc AS (SELECT fg.query_id, fg.term, fg.fg_df, bg.bg_df,
              ROUND((fg.fg_df / msz.m - bg.bg_df / nn.n)
                    * (fg.fg_df / msz.m) / (bg.bg_df / nn.n), 6) AS jlh
       FROM fg
       JOIN bg ON bg.term = fg.term
       JOIN msz ON msz.query_id = fg.query_id
       CROSS JOIN nn),
rk AS (SELECT query_id, term, fg_df, bg_df, jlh,
              CAST(ROW_NUMBER() OVER (PARTITION BY query_id
                   ORDER BY jlh DESC, term) AS INT) AS rank
       FROM sc)
SELECT query_id, term, fg_df, bg_df, jlh, rank
FROM rk WHERE rank <= {_SIG_TOP}
"""


EXTRA_QUERIES["bm25_sig_terms"] = q_bm25_sig_terms
EXTRA_ORACLES["bm25_sig_terms"] = _bm25_sig_terms_oracle()


# ---------------------------------------------------------------------------
# round 10: stateless deep pagination (search_after)

_PAGE_K = 5


def q_bm25_page2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Page 2 via search_after: page 1's last-row cursor resumes the
    BM25 ranking exactly — operators/pagination.py."""
    from ..operators.pagination import page_cursor, search_after
    from ..operators.retrieval import bm25_scores, bm25_topk

    docs = load_table(spark, sf_dir, "documents")
    q = _retrieval_queries(spark, sf_dir)
    page1 = bm25_topk(docs, q, _PAGE_K)
    scored = bm25_scores(docs, q)
    return search_after(scored, page_cursor(page1), _PAGE_K)


def _bm25_page2_oracle() -> str:
    return f"""
WITH {_bm25_scored_ctes()},
lastr AS (SELECT query_id, MAX(brank) AS lb FROM bm25_ranked
          WHERE brank <= {_PAGE_K} GROUP BY 1),
cur AS (SELECT b.query_id, b.score6 AS a_s, b.id AS a_i
        FROM bm25_ranked b
        JOIN lastr l ON l.query_id = b.query_id AND b.brank = l.lb),
nxt AS (SELECT b.query_id, b.id, b.score6,
               CAST(ROW_NUMBER() OVER (PARTITION BY b.query_id
                    ORDER BY b.score6 DESC, b.id) AS INT) AS rank
        FROM bm25_ranked b
        LEFT JOIN cur c ON c.query_id = b.query_id
        WHERE c.query_id IS NULL
           OR b.score6 < c.a_s
           OR (b.score6 = c.a_s AND b.id > c.a_i))
SELECT query_id, id, score6 AS score, rank FROM nxt WHERE rank <= {_PAGE_K}
"""


EXTRA_QUERIES["bm25_page2"] = q_bm25_page2
EXTRA_ORACLES["bm25_page2"] = _bm25_page2_oracle()


# ---------------------------------------------------------------------------
# round 10: offline ranking evaluation (rank_eval)

_EVAL_K = 10


def q_bm25_rank_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """rank_eval of the BM25 leg against pseudo-qrels cut from the
    learned-sparse ranking (rel = 11 − sparse rank) — a deterministic
    cross-leg agreement measurement; real judgments slot in as the
    same (query_id, id, rel) frame.  operators/rank_eval.py."""
    from ..operators.rank_eval import rank_eval
    from ..operators.retrieval import bm25_topk
    from ..operators.sparse import (
        sparse_encode,
        sparse_encode_queries,
        sparse_topk,
    )

    docs = load_table(spark, sf_dir, "documents")
    results = bm25_topk(docs, _retrieval_queries(spark, sf_dir), _EVAL_K)
    qp = sparse_encode_queries(_sparse_fixture_queries(spark, sf_dir))
    qrels = sparse_topk(sparse_encode(docs), qp, _EVAL_K).select(
        "query_id",
        "id",
        (F.lit(11) - F.col("rank")).cast("double").alias("rel"),
    )
    return rank_eval(results, qrels, _EVAL_K)


def _bm25_rank_eval_oracle() -> str:
    return f"""
WITH {_bm25_scored_ctes()},
{_sparse_ctes()},
eqr AS (SELECT query_id, id, CAST(11 - srank AS DOUBLE) AS rel
        FROM sparse_ranked WHERE srank <= {_EVAL_K}),
epage AS (SELECT b.query_id, b.brank AS rnk, COALESCE(q.rel, 0.0) AS rel
          FROM bm25_ranked b
          LEFT JOIN eqr q ON q.query_id = b.query_id AND q.id = b.id
          WHERE b.brank <= {_EVAL_K}),
egot AS (SELECT query_id,
                SUM((POW(2.0, rel) - 1.0) / LOG2(rnk + 1.0)) AS dcg,
                MIN(CASE WHEN rel > 0 THEN rnk END) AS frst,
                SUM(CASE WHEN rel > 0 THEN 1 ELSE 0 END) AS hits
         FROM epage GROUP BY 1),
eideal AS (SELECT query_id,
                  SUM((POW(2.0, rel) - 1.0) / LOG2(irnk + 1.0)) AS idcg
           FROM (SELECT query_id, id, rel,
                        ROW_NUMBER() OVER (PARTITION BY query_id
                            ORDER BY rel DESC, id) AS irnk
                 FROM eqr WHERE rel > 0)
           WHERE irnk <= {_EVAL_K} GROUP BY 1),
enrel AS (SELECT query_id, COUNT(*) AS nrel FROM eqr WHERE rel > 0
          GROUP BY 1),
ejq AS (SELECT DISTINCT query_id FROM eqr)
SELECT ejq.query_id,
  ROUND(CASE WHEN eideal.idcg IS NOT NULL AND eideal.idcg > 0
             THEN COALESCE(egot.dcg, 0.0) / eideal.idcg ELSE 0.0 END,
        6) AS ndcg,
  ROUND(COALESCE(1.0 / egot.frst, 0.0), 6) AS mrr,
  ROUND(COALESCE(egot.hits, 0) / {float(_EVAL_K)!r}, 6) AS precision,
  ROUND(CASE WHEN enrel.nrel IS NOT NULL
             THEN COALESCE(egot.hits, 0) / enrel.nrel ELSE 0.0 END,
        6) AS recall
FROM ejq
LEFT JOIN egot ON egot.query_id = ejq.query_id
LEFT JOIN eideal ON eideal.query_id = ejq.query_id
LEFT JOIN enrel ON enrel.query_id = ejq.query_id
"""


EXTRA_QUERIES["bm25_rank_eval"] = q_bm25_rank_eval
EXTRA_ORACLES["bm25_rank_eval"] = _bm25_rank_eval_oracle()


def q_percolate_scored(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scored percolation: the boolean match set with per-pair BM25
    relevance — operators/percolate.percolate_scored (alert
    prioritization)."""
    from ..functions.text import tokens as _tokens
    from ..operators.percolate import percolate_scored

    docs = load_table(spark, sf_dir, "documents")
    stored = docs.filter(F.expr(_PERC_PRED)).select(
        F.col("doc_id").alias("query_id"),
        F.slice(_tokens("text"), 1, 4).alias("qterms"),
        F.slice(_tokens("text"), 6, 1).alias("none_terms"),
    )
    return percolate_scored(
        docs, stored,
        min_match=_PERC_MIN_MATCH, none_terms_col="none_terms",
    )


def _percolate_scored_oracle() -> str:
    from ..operators.retrieval import BM25_B, BM25_K1

    return f"""
WITH ptoks AS (SELECT doc_id, {_TOKS} AS w FROM documents),
st AS (SELECT doc_id AS query_id,
              list_distinct(list_slice(w, 1, 4)) AS qt,
              list_distinct(list_slice(w, 6, 6)) AS nt
       FROM ptoks WHERE {_PERC_PRED}),
pq AS (SELECT query_id, UNNEST(qt) AS term,
              LEAST({_PERC_MIN_MATCH}, len(qt)) AS required
       FROM st WHERE len(qt) >= 1),
dex AS (SELECT doc_id, UNNEST(list_distinct(w)) AS term FROM ptoks),
m AS (SELECT d.doc_id, q.query_id,
             CAST(COUNT(*) AS BIGINT) AS matched,
             ANY_VALUE(q.required) AS required
      FROM dex d JOIN pq q ON q.term = d.term
      GROUP BY 1, 2
      HAVING COUNT(*) >= ANY_VALUE(q.required)),
nq AS (SELECT query_id, UNNEST(nt) AS term FROM st),
veto AS (SELECT DISTINCT d.doc_id, n.query_id
         FROM dex d JOIN nq n ON n.term = d.term),
adm AS (SELECT m.doc_id, m.query_id, m.matched, m.required
        FROM m LEFT JOIN veto v
          ON v.doc_id = m.doc_id AND v.query_id = m.query_id
        WHERE v.doc_id IS NULL),
pdl AS (SELECT doc_id AS id, len(w) AS dl FROM ptoks),
ptf AS (SELECT doc_id AS id, term, COUNT(*) AS tf
        FROM (SELECT doc_id, UNNEST(w) AS term FROM ptoks)
        GROUP BY 1, 2),
pstats AS (SELECT COUNT(*) AS n_docs, AVG(CAST(dl AS DOUBLE)) AS avgdl
           FROM pdl),
pdf AS (SELECT term, COUNT(DISTINCT id) AS df FROM ptf
        WHERE term IN (SELECT DISTINCT term FROM pq) GROUP BY 1),
pscored AS (
  SELECT pq.query_id, t.id AS doc_id,
         SUM(LN(1.0 + (s.n_docs - d.df + 0.5) / (d.df + 0.5))
             * (t.tf * ({BM25_K1} + 1.0))
             / (t.tf + {BM25_K1} * (1.0 - {BM25_B}
                + {BM25_B} * CAST(dl.dl AS DOUBLE) / s.avgdl))) AS score
  FROM pq
  JOIN ptf t ON t.term = pq.term
  JOIN pdf d ON d.term = pq.term
  JOIN pdl dl ON dl.id = t.id
  CROSS JOIN pstats s
  GROUP BY 1, 2)
SELECT a.doc_id, a.query_id, a.matched, a.required,
       ROUND(p.score, 6) AS score
FROM adm a
JOIN pscored p ON p.doc_id = a.doc_id AND p.query_id = a.query_id
"""


EXTRA_QUERIES["percolate_scored"] = q_percolate_scored
EXTRA_ORACLES["percolate_scored"] = _percolate_scored_oracle()


# round-11 opening rotation (VERDICT r10 item 1, the established
# per-round policy): round 10's late flagships — none of them ever
# independently driver-verified — join the driver window:
# percolate_matches (reverse search, the round's most novel verb;
# min_match + negative-veto semantics), sparse_synonym_topk (thesaurus
# expansion over the learned-sparse leg), bm25_sig_terms (significant
# terms, JLH vs corpus background), bm25_rank_eval (offline ranking
# evaluation: nDCG/MRR/P@k/R@k), bm25_page2 (stateless search_after
# pagination), and sparse_rescore_topk (champion candidates + exact
# rescore, the measured Zipf-recall tier).  Six long-green rows leave
# in exchange — three here, three in registry/vector.py — each family
# keeping driver coverage: bm25_stream_topk (BM25 keeps topk / index /
# doc_mutations / store_mutations / boolean driver rows), dedup_resolve
# (dedup keeps minhash_lsh + embedding_cosine), hybrid_store_mutations
# (hybrid keeps engine_rrf / weighted / trimodal; the merge-on-read
# store family keeps knn/bm25/sparse/maxsim _store_mutations rows).
# Every demoted row keeps the IDENTICAL DuckDB comparison in the
# pytest tier.
for _name in (
    "percolate_matches",
    "sparse_synonym_topk",
    "bm25_sig_terms",
    "bm25_rank_eval",
    "bm25_page2",
    "sparse_rescore_topk",
):
    QUERIES[_name] = EXTRA_QUERIES.pop(_name)
    ORACLES[_name] = EXTRA_ORACLES.pop(_name)
for _name in (
    "bm25_stream_topk",
    "dedup_resolve",
    "hybrid_store_mutations",
):
    EXTRA_QUERIES[_name] = QUERIES.pop(_name)
    EXTRA_ORACLES[_name] = ORACLES.pop(_name)
del _name


# ---------------------------------------------------------------------------
# round 11: mutable standing-query registry (sources/percolator_store.py)
# — percolation after register + update + unregister equals the
# fold-then-match replay (VERDICT r10 item 2, the *_store_mutations
# pattern on the fifth mutable surface)


def q_percolate_store_matches(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Percolation against a MUTATED standing-query registry: init the
    LWW store from the percolate_matches registry, then (seq 1) update
    every odd-id standing query to a 1-of-3 disjunctive form, (seq 2)
    unregister every id divisible by 3, (seq 3) register new
    2-of-3 alerts — and match the corpus against the folded view.
    Exercises per-query min_match (NULL = conjunctive) end-to-end."""
    import os as _os
    import shutil
    import tempfile

    from ..functions.text import tokens as _tokens
    from ..operators.percolate import percolate
    from ..sources.percolator_store import PercolatorStore

    docs = load_table(spark, sf_dir, "documents")
    root = _os.path.join(
        tempfile.gettempdir(), f"dvss_spark_percstore_{_os.getpid()}",
        _os.path.basename(_os.path.normpath(sf_dir)) or "sf",
    )
    shutil.rmtree(root, ignore_errors=True)  # stale store from a prior run
    store = PercolatorStore(root)
    store.init_base(
        docs.filter(F.expr(_PERC_PRED)).select(
            F.col("doc_id").alias("query_id"),
            F.slice(_tokens("text"), 1, 4).alias("qterms"),
            F.slice(_tokens("text"), 6, 1).alias("none_terms"),
        )
    )
    upd = docs.filter(F.expr(_PERC_PRED)).filter("doc_id % 2 = 1").select(
        F.lit(1).cast("long").alias("seq"),
        F.lit("upsert").alias("op"),
        F.col("doc_id").alias("query_id"),
        F.slice(_tokens("text"), 2, 3).alias("qterms"),
        F.lit(None).cast("array<string>").alias("none_terms"),
        F.lit(1).cast("int").alias("min_match"),
    )
    dels = docs.filter(F.expr(_PERC_PRED)).filter("doc_id % 3 = 0").select(
        F.lit(2).cast("long").alias("seq"),
        F.lit("delete").alias("op"),
        F.col("doc_id").alias("query_id"),
        F.lit(None).cast("array<string>").alias("qterms"),
        F.lit(None).cast("array<string>").alias("none_terms"),
        F.lit(None).cast("int").alias("min_match"),
    )
    news = docs.filter("doc_id % 211 = 3").select(
        F.lit(3).cast("long").alias("seq"),
        F.lit("upsert").alias("op"),
        (F.col("doc_id") + F.lit(1000000)).alias("query_id"),
        F.slice(_tokens("text"), 1, 3).alias("qterms"),
        F.lit(None).cast("array<string>").alias("none_terms"),
        F.lit(2).cast("int").alias("min_match"),
    )
    store.apply_log(upd)
    store.apply_log(dels.unionByName(news))
    return percolate(
        docs, store.registry_view(spark),
        none_terms_col="none_terms", min_match_col="min_match",
    )


def _percolate_store_oracle() -> str:
    return f"""
WITH ptoks AS (SELECT doc_id, {_TOKS} AS w FROM documents),
st0 AS (SELECT doc_id AS query_id,
               list_distinct(list_slice(w, 1, 4)) AS qt,
               list_distinct(list_slice(w, 6, 6)) AS nt,
               CAST(NULL AS INT) AS mm
        FROM ptoks WHERE {_PERC_PRED}),
upd AS (SELECT doc_id AS query_id,
               list_distinct(list_slice(w, 2, 4)) AS qt,
               CAST(NULL AS VARCHAR[]) AS nt,
               1 AS mm
        FROM ptoks WHERE {_PERC_PRED} AND doc_id % 2 = 1),
newq AS (SELECT doc_id + 1000000 AS query_id,
                list_distinct(list_slice(w, 1, 3)) AS qt,
                CAST(NULL AS VARCHAR[]) AS nt,
                2 AS mm
         FROM ptoks WHERE doc_id % 211 = 3),
delq AS (SELECT doc_id AS query_id FROM ptoks
         WHERE {_PERC_PRED} AND doc_id % 3 = 0),
folded AS (
  SELECT * FROM st0
  WHERE query_id NOT IN (SELECT query_id FROM upd)
    AND query_id NOT IN (SELECT query_id FROM delq)
  UNION ALL
  SELECT * FROM upd WHERE query_id NOT IN (SELECT query_id FROM delq)
  UNION ALL
  SELECT * FROM newq),
pq AS (SELECT query_id, UNNEST(qt) AS term,
              CASE WHEN mm IS NULL THEN len(qt)
                   ELSE LEAST(GREATEST(1, mm), len(qt)) END AS required
       FROM folded WHERE len(qt) >= 1),
dex AS (SELECT doc_id, UNNEST(list_distinct(w)) AS term FROM ptoks),
m AS (SELECT d.doc_id, q.query_id,
             CAST(COUNT(*) AS BIGINT) AS matched,
             ANY_VALUE(q.required) AS required
      FROM dex d JOIN pq q ON q.term = d.term
      GROUP BY 1, 2
      HAVING COUNT(*) >= ANY_VALUE(q.required)),
nq AS (SELECT query_id, UNNEST(nt) AS term FROM folded),
veto AS (SELECT DISTINCT d.doc_id, n.query_id
         FROM dex d JOIN nq n ON n.term = d.term)
SELECT m.doc_id, m.query_id, m.matched, m.required
FROM m LEFT JOIN veto v
  ON v.doc_id = m.doc_id AND v.query_id = m.query_id
WHERE v.doc_id IS NULL
"""


EXTRA_QUERIES["percolate_store_matches"] = q_percolate_store_matches
EXTRA_ORACLES["percolate_store_matches"] = _percolate_store_oracle()


# ---------------------------------------------------------------------------
# round 11: recency decay scoring over the events fixture (VERDICT r10
# item 5 — the fixtures' only timestamps exercise the ES date-decay
# contract end-to-end: origin "now", scale in days, offset plateau)

#: fixed "now" for determinism: 2024-01-31 00:00:00 UTC in epoch ms
#: (the day after the events fixture's last timestamp)
_REC_ORIGIN_MS = 1706659200000
_REC_SCALE_D = 7.0    # half-boost at 1 + 7 days of staleness
_REC_OFFSET_D = 1.0   # ≤ 1 day old counts as fresh (flat plateau)


def q_function_score_recency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Date-decay recency boost: each doc's freshness is its user's
    last event timestamp (fixture convention doc_id = user_id; docs
    without events keep their relevance score — the neutral-factor
    path), turned into an age-in-days column and composed onto the
    BM25 leg with the ES ``exp`` decay (origin "now", offset plateau,
    half-life at offset+scale) — operators/scoring.py over a
    ``unix_millis`` projection, so the timestamp path is exercised
    end-to-end, not just the unit-agnostic core."""
    from ..operators.retrieval import bm25_topk
    from ..operators.scoring import decay_factor, function_score

    docs = load_table(spark, sf_dir, "documents")
    ev = load_table(spark, sf_dir, "events")
    hits = bm25_topk(docs, _retrieval_queries(spark, sf_dir), _HYBRID_K).select(
        "query_id", "id", "score"
    )
    # the fixture ts is TIMESTAMP_NTZ; the UTC-session cast makes
    # unix_millis read the same wall clock DuckDB's epoch_ms reads
    age = ev.groupBy(F.col("user_id").alias("doc_id")).agg(
        (
            (F.lit(_REC_ORIGIN_MS) - F.unix_millis(F.max("ts").cast("timestamp")))
            / F.lit(86400000.0)
        ).alias("age_days")
    )
    fac = decay_factor(
        age, "age_days",
        origin=0.0, scale=_REC_SCALE_D, offset=_REC_OFFSET_D,
        decay=_DECAY_RATE, kind="exp",
    )
    return function_score(hits, fac, _FS_K)


def _function_score_recency_oracle() -> str:
    import math

    return f"""
WITH {_bm25_scored_ctes()},
hits AS (SELECT query_id, id, score6 FROM bm25_ranked WHERE brank <= {_HYBRID_K}),
recage AS (SELECT user_id AS id,
                  ({_REC_ORIGIN_MS} - epoch_ms(MAX(ts))) / 86400000.0 AS age
           FROM events GROUP BY 1),
facd AS (SELECT id,
                GREATEST(0.0, ABS(age - 0.0) - {_REC_OFFSET_D!r})
                  / {_REC_SCALE_D!r} AS d
         FROM recage),
fac AS (SELECT id, EXP({math.log(_DECAY_RATE)!r} * d) AS factor FROM facd),
fscored AS (SELECT h.query_id, h.id,
                   ROUND(h.score6 * COALESCE(f.factor, 1.0), 6) AS score
            FROM hits h LEFT JOIN fac f ON f.id = h.id),
franked AS (SELECT query_id, id, score,
                   CAST(ROW_NUMBER() OVER (PARTITION BY query_id
                        ORDER BY score DESC, id) AS INT) AS rank
            FROM fscored)
SELECT query_id, id, score, rank FROM franked WHERE rank <= {_FS_K}
"""


EXTRA_QUERIES["function_score_recency"] = q_function_score_recency
EXTRA_ORACLES["function_score_recency"] = _function_score_recency_oracle()


# ---------------------------------------------------------------------------
# round 11: metric aggregations (operators/aggregations.py) — the ES
# extended_stats / percentiles / cardinality / top_hits family next to
# the round-10 bucket aggregations.  Exact tiers carry the oracles;
# the approximate tiers (GK percentile sketch, HLL++) are the 100 TB
# path, property-tested in tests/test_aggregations.py.

_TOPHITS_K = 3


def q_events_extended_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-event-type extended stats of the value metric — one hash
    aggregate with map-side partial combine."""
    from ..operators.aggregations import extended_stats

    ev = load_table(spark, sf_dir, "events")
    return extended_stats(ev, "value", by=("event_type",))


def _events_extended_stats_oracle() -> str:
    return """
SELECT event_type,
       COUNT(value) AS n,
       ROUND(MIN(value), 6) AS min_v,
       ROUND(MAX(value), 6) AS max_v,
       ROUND(SUM(value), 6) AS sum_v,
       ROUND(AVG(value), 6) AS avg_v,
       ROUND(SUM(value * value), 6) AS sum_sq,
       ROUND(VAR_POP(value), 6) AS variance,
       ROUND(STDDEV_POP(value), 6) AS std_dev
FROM events GROUP BY 1
"""


EXTRA_QUERIES["events_extended_stats"] = q_events_extended_stats
EXTRA_ORACLES["events_extended_stats"] = _events_extended_stats_oracle()


def q_events_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-event-type exact p50/p90/p99 of the value metric (linear
    interpolation, the quantile_cont contract) — the oracle tier; the
    GK-sketch tier serves at scale."""
    from ..operators.aggregations import percentiles

    ev = load_table(spark, sf_dir, "events")
    return percentiles(ev, "value", (50.0, 90.0, 99.0), by=("event_type",))


def _events_percentiles_oracle() -> str:
    return """
SELECT event_type,
       ROUND(quantile_cont(value, 0.50), 6) AS p50,
       ROUND(quantile_cont(value, 0.90), 6) AS p90,
       ROUND(quantile_cont(value, 0.99), 6) AS p99
FROM events GROUP BY 1
"""


EXTRA_QUERIES["events_percentiles"] = q_events_percentiles
EXTRA_ORACLES["events_percentiles"] = _events_percentiles_oracle()


def q_events_top_hits(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-event-type top-3 events by (value desc, event_id asc) —
    the per-bucket exemplar verb; partial top-k truncates each
    partition before the exchange."""
    from ..operators.aggregations import top_hits

    ev = load_table(spark, sf_dir, "events").select(
        "event_type", "event_id", "value"
    )
    return top_hits(
        ev, _TOPHITS_K, "value", by=("event_type",), tie_col="event_id"
    ).select(
        "event_type", "event_id", F.round("value", 6).alias("value"), "rank"
    )


def _events_top_hits_oracle() -> str:
    return f"""
SELECT event_type, event_id, ROUND(value, 6) AS value, rank FROM (
  SELECT event_type, event_id, value,
         CAST(ROW_NUMBER() OVER (PARTITION BY event_type
              ORDER BY value DESC, event_id) AS INT) AS rank
  FROM events)
WHERE rank <= {_TOPHITS_K}
"""


EXTRA_QUERIES["events_top_hits"] = q_events_top_hits
EXTRA_ORACLES["events_top_hits"] = _events_top_hits_oracle()


def q_docs_source_cardinality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct sources per language over the documents table — the
    exact cardinality tier (HLL++ serves at scale, tested within its
    rsd against this)."""
    from ..operators.aggregations import cardinality

    docs = load_table(spark, sf_dir, "documents")
    return cardinality(docs, "source", by=("lang",))


def _docs_source_cardinality_oracle() -> str:
    return """
SELECT lang, CAST(COUNT(DISTINCT source) AS BIGINT) AS n_distinct
FROM documents GROUP BY 1
"""


EXTRA_QUERIES["docs_source_cardinality"] = q_docs_source_cardinality
EXTRA_ORACLES["docs_source_cardinality"] = _docs_source_cardinality_oracle()


# ---------------------------------------------------------------------------
# round 11: spell suggestion ("did you mean") — the sixth
# query-understanding verb (operators/spell.py)

_SPELL_QPRED = "doc_id % 100 = 41"
_SPELL_EDITS = 2
_SPELL_TOPN = 3
_SPELL_MIN_DF = 2


def _spell_typod_queries(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixture queries with every term corrupted by a one-character
    suffix — distance 1 from its real vocabulary term."""
    from ..functions.text import tokens as _tokens

    docs = load_table(spark, sf_dir, "documents")
    return docs.filter(F.expr(_SPELL_QPRED)).select(
        F.col("doc_id").alias("query_id"),
        F.transform(
            F.array_distinct(F.slice(_tokens("text"), 1, 3)),
            lambda t: F.concat(t, F.lit("x")),
        ).alias("qterms"),
    )


def q_spell_suggest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES term-suggester (missing mode): per misspelled query term the
    top corrections by (edit distance, df desc, term) from the corpus
    vocabulary — operators/spell.py."""
    from ..operators.fuzzy import corpus_vocabulary
    from ..operators.spell import spell_suggestions

    docs = load_table(spark, sf_dir, "documents")
    return spell_suggestions(
        corpus_vocabulary(docs),
        _spell_typod_queries(spark, sf_dir),
        max_edits=_SPELL_EDITS, top_n=_SPELL_TOPN, min_df=_SPELL_MIN_DF,
    )


def _spell_suggest_oracle() -> str:
    return f"""
WITH toks AS (SELECT doc_id, {_TOKS} AS w FROM documents),
q AS (SELECT doc_id AS query_id, list_distinct(list_slice(w, 1, 3)) AS qts
      FROM toks WHERE {_SPELL_QPRED}),
qx AS (SELECT DISTINCT query_id, UNNEST(qts) || 'x' AS source_term FROM q),
vx AS (SELECT doc_id AS id, UNNEST(w) AS term FROM toks),
vocab AS (SELECT term, CAST(COUNT(DISTINCT id) AS BIGINT) AS df FROM vx
          GROUP BY 1 HAVING COUNT(DISTINCT id) >= {_SPELL_MIN_DF}),
missing AS (SELECT query_id, source_term FROM qx
            WHERE source_term NOT IN (SELECT term FROM vocab)),
cand AS (SELECT m.query_id, m.source_term, v.term AS suggestion,
                CAST(levenshtein(v.term, m.source_term) AS INT) AS distance,
                v.df
         FROM missing m JOIN vocab v
           ON levenshtein(v.term, m.source_term) BETWEEN 1 AND {_SPELL_EDITS}),
ranked AS (SELECT *, CAST(ROW_NUMBER() OVER (
                 PARTITION BY query_id, source_term
                 ORDER BY distance, df DESC, suggestion) AS INT) AS srank
           FROM cand)
SELECT query_id, source_term, suggestion, distance, df, srank
FROM ranked WHERE srank <= {_SPELL_TOPN}
"""


EXTRA_QUERIES["spell_suggest"] = q_spell_suggest
EXTRA_ORACLES["spell_suggest"] = _spell_suggest_oracle()


def q_bm25_spell_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """did-you-mean composition: misspelled queries are rewritten to
    their top corrections and ranked with the unmodified BM25 — the
    single-best-correction sibling of bm25_fuzzy_topk's expansion."""
    from ..operators.fuzzy import corpus_vocabulary
    from ..operators.retrieval import bm25_topk
    from ..operators.spell import did_you_mean

    docs = load_table(spark, sf_dir, "documents")
    corrected = did_you_mean(
        corpus_vocabulary(docs),
        _spell_typod_queries(spark, sf_dir),
        max_edits=_SPELL_EDITS, min_df=_SPELL_MIN_DF,
    )
    return bm25_topk(docs, corrected, _HYBRID_K)


def _bm25_spell_oracle() -> str:
    from ..operators.retrieval import BM25_B, BM25_K1

    return f"""
WITH toks AS (SELECT doc_id, {_TOKS} AS w FROM documents),
q AS (SELECT doc_id AS query_id, list_distinct(list_slice(w, 1, 3)) AS qts
      FROM toks WHERE {_SPELL_QPRED}),
qx AS (SELECT DISTINCT query_id, UNNEST(qts) || 'x' AS source_term FROM q),
vx AS (SELECT doc_id AS id, UNNEST(w) AS term FROM toks),
vocab AS (SELECT term, COUNT(DISTINCT id) AS df FROM vx
          GROUP BY 1 HAVING COUNT(DISTINCT id) >= {_SPELL_MIN_DF}),
missing AS (SELECT query_id, source_term FROM qx
            WHERE source_term NOT IN (SELECT term FROM vocab)),
best AS (SELECT query_id, source_term, suggestion FROM (
           SELECT m.query_id, m.source_term, v.term AS suggestion,
                  ROW_NUMBER() OVER (PARTITION BY m.query_id, m.source_term
                       ORDER BY levenshtein(v.term, m.source_term),
                                v.df DESC, v.term) AS srn
           FROM missing m JOIN vocab v
             ON levenshtein(v.term, m.source_term)
                BETWEEN 1 AND {_SPELL_EDITS})
         WHERE srn = 1),
cq AS (SELECT DISTINCT qx.query_id,
              COALESCE(b.suggestion, qx.source_term) AS term
       FROM qx LEFT JOIN best b
         ON b.query_id = qx.query_id AND b.source_term = qx.source_term),
dl AS (SELECT doc_id AS id, len(w) AS dl FROM toks),
tfc AS (SELECT id, term, COUNT(*) AS tf FROM vx GROUP BY 1, 2),
stats AS (SELECT COUNT(*) AS n_docs, AVG(CAST(dl AS DOUBLE)) AS avgdl FROM dl),
dfq AS (SELECT term, COUNT(DISTINCT id) AS df FROM tfc
        WHERE term IN (SELECT DISTINCT term FROM cq) GROUP BY 1),
sp_scored AS (
  SELECT c.query_id, tfc.id,
         SUM(LN(1.0 + (s.n_docs - d.df + 0.5) / (d.df + 0.5))
             * (tfc.tf * ({BM25_K1} + 1.0))
             / (tfc.tf + {BM25_K1} * (1.0 - {BM25_B}
                + {BM25_B} * CAST(dl.dl AS DOUBLE) / s.avgdl))) AS score
  FROM cq c
  JOIN tfc ON tfc.term = c.term
  JOIN dfq d ON d.term = c.term
  JOIN dl ON dl.id = tfc.id
  CROSS JOIN stats s
  GROUP BY 1, 2),
sp_ranked AS (
  SELECT query_id, id, score6,
         CAST(ROW_NUMBER() OVER (PARTITION BY query_id
                                 ORDER BY score6 DESC, id) AS INT) AS srnk
  FROM (SELECT query_id, id, ROUND(score, 6) AS score6 FROM sp_scored))
SELECT query_id, id, score6 AS score, srnk AS rank
FROM sp_ranked WHERE srnk <= {_HYBRID_K}
"""


EXTRA_QUERIES["bm25_spell_topk"] = q_bm25_spell_topk
EXTRA_ORACLES["bm25_spell_topk"] = _bm25_spell_oracle()


# ---------------------------------------------------------------------------
# round 11: index-time analysis chain (functions/analysis.py) —
# stopword removal + S-stemming rewriting the indexed text, every
# downstream operator unchanged

_STEM_QPRED = "doc_id % 100 = 59"

_SQL_STOPLIST = ", ".join(f"'{s}'" for s in (
    "a", "an", "and", "are", "as", "at", "be", "but", "by", "for",
    "if", "in", "into", "is", "it", "no", "not", "of", "on", "or",
    "such", "that", "the", "their", "then", "there", "these", "they",
    "this", "to", "was", "will", "with",
))


def _sql_s_stem(t: str) -> str:
    """The Harman S-stemmer as a DuckDB CASE expression — rule-for-rule
    the suffix-dispatch Column form in functions/analysis.s_stem
    (exception suffixes short-circuit to the unchanged word)."""
    return f"""CASE
  WHEN length({t}) < 3 THEN {t}
  WHEN {t} LIKE '%eies' OR {t} LIKE '%aies' THEN {t}
  WHEN {t} LIKE '%ies' THEN substr({t}, 1, length({t}) - 3) || 'y'
  WHEN {t} LIKE '%aes' OR {t} LIKE '%ees' OR {t} LIKE '%oes' THEN {t}
  WHEN {t} LIKE '%es' THEN substr({t}, 1, length({t}) - 1)
  WHEN {t} LIKE '%us' OR {t} LIKE '%ss' THEN {t}
  WHEN {t} LIKE '%s' THEN substr({t}, 1, length({t}) - 1)
  ELSE {t} END"""


def q_bm25_stemmed_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Analyzed retrieval: the corpus is re-indexed through the
    stop+stem analysis chain (one withColumn — the whole index-time
    integration), queries arrive PLURALIZED and are analyzed query-side
    with the same chain, and the unmodified BM25 ranks: "tables"
    matches "table", stopwords cost nothing."""
    from ..functions.analysis import STOPWORDS_EN, analyze_text, s_stem
    from ..functions.text import tokens as _tokens
    from ..operators.retrieval import bm25_topk

    docs = load_table(spark, sf_dir, "documents")
    analyzed = docs.withColumn(
        "text", analyze_text("text", stopwords=STOPWORDS_EN, stem=True)
    )
    q = docs.filter(F.expr(_STEM_QPRED)).select(
        F.col("doc_id").alias("query_id"),
        F.transform(
            F.array_distinct(F.slice(_tokens("text"), 1, 3)),
            lambda t: s_stem(F.concat(t, F.lit("s"))),
        ).alias("qterms"),
    )
    return bm25_topk(analyzed, q, _HYBRID_K)


def _bm25_stemmed_oracle() -> str:
    from ..operators.retrieval import BM25_B, BM25_K1

    stem_x = _sql_s_stem("x")
    stem_q = _sql_s_stem("(qt0 || 's')")
    return f"""
WITH toks AS (SELECT doc_id, {_TOKS} AS w FROM documents),
atoks AS (SELECT doc_id,
                 list_transform(
                   list_filter(w, x -> x NOT IN ({_SQL_STOPLIST})),
                   x -> {stem_x}) AS w
          FROM toks),
q AS (SELECT doc_id AS query_id, list_distinct(list_slice(w, 1, 3)) AS qts
      FROM toks WHERE {_STEM_QPRED}),
qs AS (SELECT DISTINCT query_id, {stem_q} AS term
       FROM (SELECT query_id, UNNEST(qts) AS qt0 FROM q)),
vx AS (SELECT doc_id AS id, UNNEST(w) AS term FROM atoks),
dl AS (SELECT doc_id AS id, len(w) AS dl FROM atoks),
tfc AS (SELECT id, term, COUNT(*) AS tf FROM vx GROUP BY 1, 2),
stats AS (SELECT COUNT(*) AS n_docs, AVG(CAST(dl AS DOUBLE)) AS avgdl FROM dl),
dfq AS (SELECT term, COUNT(DISTINCT id) AS df FROM tfc
        WHERE term IN (SELECT DISTINCT term FROM qs) GROUP BY 1),
st_scored AS (
  SELECT qs.query_id, tfc.id,
         SUM(LN(1.0 + (s.n_docs - d.df + 0.5) / (d.df + 0.5))
             * (tfc.tf * ({BM25_K1} + 1.0))
             / (tfc.tf + {BM25_K1} * (1.0 - {BM25_B}
                + {BM25_B} * CAST(dl.dl AS DOUBLE) / s.avgdl))) AS score
  FROM qs
  JOIN tfc ON tfc.term = qs.term
  JOIN dfq d ON d.term = qs.term
  JOIN dl ON dl.id = tfc.id
  CROSS JOIN stats s
  GROUP BY 1, 2),
st_ranked AS (
  SELECT query_id, id, score6,
         CAST(ROW_NUMBER() OVER (PARTITION BY query_id
                                 ORDER BY score6 DESC, id) AS INT) AS strk
  FROM (SELECT query_id, id, ROUND(score, 6) AS score6 FROM st_scored))
SELECT query_id, id, score6 AS score, strk AS rank
FROM st_ranked WHERE strk <= {_HYBRID_K}
"""


EXTRA_QUERIES["bm25_stemmed_topk"] = q_bm25_stemmed_topk
EXTRA_ORACLES["bm25_stemmed_topk"] = _bm25_stemmed_oracle()


# round-11 CLOSE rotation (the established per-round policy): this
# round's flagships join the driver window for their independent
# check — percolate_store_matches (the mutable standing-query
# registry: register + update + unregister vs the fold-then-match
# replay), function_score_recency (ES date-decay on real timestamps),
# spell_suggest (the sixth query-understanding verb),
# bm25_stemmed_topk (the index-time analysis chain end-to-end),
# events_percentiles and events_top_hits (the metric-aggregation
# family's exact tiers).  Six long-green rows leave in exchange —
# five here, one (ann_knn_join) in registry/vector.py — each family
# keeping driver coverage: sparse_topk (sparse keeps champion /
# rescore / synonym / engine_store / store_mutations driver rows),
# hybrid_trimodal (hybrid keeps engine_rrf + weighted), search_snippets
# (the serving surface keeps doc_facets / bm25_sig_terms / bm25_page2),
# curation_pipeline (the text tier keeps multimodal_features), and
# maxsim_topk (MaxSim keeps maxsim_store_mutations).  Every demoted
# row keeps the IDENTICAL DuckDB comparison in the pytest tier.
for _name in (
    "percolate_store_matches",
    "function_score_recency",
    "spell_suggest",
    "bm25_stemmed_topk",
    "events_percentiles",
    "events_top_hits",
):
    QUERIES[_name] = EXTRA_QUERIES.pop(_name)
    ORACLES[_name] = EXTRA_ORACLES.pop(_name)
for _name in (
    "sparse_topk",
    "hybrid_trimodal",
    "search_snippets",
    "curation_pipeline",
    "maxsim_topk",
):
    EXTRA_QUERIES[_name] = QUERIES.pop(_name)
    EXTRA_ORACLES[_name] = ORACLES.pop(_name)
del _name


# ---------------------------------------------------------------------------
# round 11 (post-close): calendar date_histogram + pipeline
# aggregations (operators/aggregations.py) — the time-series half of
# the metric-aggregation family

_PIPE_WINDOW = 3


def q_events_date_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-event-type DAILY buckets (calendar date_trunc, ISO weeks'
    sibling) with count + sum(value) — one hash aggregate whose
    exchange carries bucket cardinality only."""
    from ..operators.aggregations import date_histogram

    ev = load_table(spark, sf_dir, "events")
    return date_histogram(
        ev, "ts", interval="day", by=("event_type",), value_col="value"
    )


def _events_date_histogram_oracle() -> str:
    return """
SELECT event_type, CAST(date_trunc('day', ts) AS TIMESTAMP) AS bucket,
       CAST(COUNT(*) AS BIGINT) AS n,
       ROUND(SUM(value), 6) AS sum_v
FROM events GROUP BY 1, 2
"""


EXTRA_QUERIES["events_date_histogram"] = q_events_date_histogram
EXTRA_ORACLES["events_date_histogram"] = _events_date_histogram_oracle()


def q_events_pipeline_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES pipeline aggregations over the daily series: cumulative
    count, bucket-over-bucket derivative (NULL on each type's first
    day, the ES contract), trailing 3-day moving average — ordered
    windows over buckets-per-type partitions (bounded by the time
    range, not the corpus)."""
    from ..operators.aggregations import date_histogram, pipeline_aggs

    ev = load_table(spark, sf_dir, "events")
    daily = date_histogram(ev, "ts", interval="day", by=("event_type",))
    return pipeline_aggs(
        daily, "n", order_col="bucket", by=("event_type",),
        window=_PIPE_WINDOW,
    )


def _events_pipeline_oracle() -> str:
    return f"""
WITH dh AS (SELECT event_type,
                   CAST(date_trunc('day', ts) AS TIMESTAMP) AS bucket,
                   CAST(COUNT(*) AS BIGINT) AS n
            FROM events GROUP BY 1, 2)
SELECT event_type, bucket, n,
       ROUND(SUM(CAST(n AS DOUBLE)) OVER (
         PARTITION BY event_type ORDER BY bucket
         ROWS UNBOUNDED PRECEDING), 6) AS cum_sum,
       ROUND(CAST(n AS DOUBLE) - LAG(CAST(n AS DOUBLE)) OVER (
         PARTITION BY event_type ORDER BY bucket), 6) AS deriv,
       ROUND(AVG(CAST(n AS DOUBLE)) OVER (
         PARTITION BY event_type ORDER BY bucket
         ROWS {_PIPE_WINDOW - 1} PRECEDING), 6) AS moving_avg
FROM dh
"""


EXTRA_QUERIES["events_pipeline_daily"] = q_events_pipeline_daily
EXTRA_ORACLES["events_pipeline_daily"] = _events_pipeline_oracle()


# ---------------------------------------------------------------------------
# round 11 (post-close): ES boosting query — soft negative demotion
# composed onto the BM25 leg (operators/scoring.py)

_BOOSTING_NEG_TERM = "data"
_BOOSTING_NB = 0.3


def q_bm25_boosting(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Boosting query: BM25 hits whose doc contains the negative term
    are demoted by negative_boost (never excluded) and re-ranked —
    the soft complement of boolean NOT."""
    from ..functions.text import tokens as _tokens
    from ..operators.retrieval import bm25_topk
    from ..operators.scoring import boosting_score

    docs = load_table(spark, sf_dir, "documents")
    hits = bm25_topk(docs, _retrieval_queries(spark, sf_dir), _HYBRID_K).select(
        "query_id", "id", "score"
    )
    neg = docs.filter(
        F.array_contains(_tokens("text"), _BOOSTING_NEG_TERM)
    ).select(F.col("doc_id").alias("id"))
    return boosting_score(hits, neg, _FS_K, negative_boost=_BOOSTING_NB)


def _bm25_boosting_oracle() -> str:
    return f"""
WITH {_bm25_scored_ctes()},
hits AS (SELECT query_id, id, score6 FROM bm25_ranked WHERE brank <= {_HYBRID_K}),
neg AS (SELECT doc_id AS id FROM
        (SELECT doc_id, {_TOKS} AS w FROM documents)
        WHERE list_contains(w, '{_BOOSTING_NEG_TERM}')),
bscored AS (SELECT h.query_id, h.id,
                   ROUND(CASE WHEN n.id IS NOT NULL
                              THEN h.score6 * {_BOOSTING_NB}
                              ELSE h.score6 END, 6) AS score
            FROM hits h LEFT JOIN neg n ON n.id = h.id),
branked AS (SELECT query_id, id, score,
                   CAST(ROW_NUMBER() OVER (PARTITION BY query_id
                        ORDER BY score DESC, id) AS INT) AS rank
            FROM bscored)
SELECT query_id, id, score, rank FROM branked WHERE rank <= {_FS_K}
"""


EXTRA_QUERIES["bm25_boosting"] = q_bm25_boosting
EXTRA_ORACLES["bm25_boosting"] = _bm25_boosting_oracle()


# ---------------------------------------------------------------------------
# round 11 (post-close): four-class PII audit + scrub (phones and IPv4
# join the url/email pair — functions/text.py PII_PATTERNS).  The
# fixture corpus is clean, so both engines splice the SAME
# deterministic findings before scrubbing (the text_pii_scrub idiom).


def q_pii_audit_extended(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions.text import pii_class_counts, scrub_pii

    docs = load_table(spark, sf_dir, "documents")
    dirty = F.concat(
        F.col("text"),
        F.when(F.col("doc_id") % 7 == 0, F.lit(" contact bob@example.com now"))
        .otherwise(F.lit("")),
        F.when(F.col("doc_id") % 11 == 0, F.lit(" see https://example.com/data?id=1 too"))
        .otherwise(F.lit("")),
        F.when(F.col("doc_id") % 5 == 0, F.lit(" call 555-123-4567 first"))
        .otherwise(F.lit("")),
        F.when(F.col("doc_id") % 13 == 0, F.lit(" host 10.0.0.12 up"))
        .otherwise(F.lit("")),
    )
    d = docs.select("doc_id", dirty.alias("dirty"))
    c = pii_class_counts("dirty")
    return d.select(
        "doc_id",
        c.getField("n_urls").alias("n_urls"),
        c.getField("n_emails").alias("n_emails"),
        c.getField("n_phones").alias("n_phones"),
        c.getField("n_ipv4s").alias("n_ipv4s"),
        F.length(scrub_pii("dirty")).cast("int").alias("scrubbed_len"),
        F.md5(F.encode(scrub_pii("dirty"), "UTF-8")).alias("scrubbed_md5"),
    )


_PII_EXT_URL = r"https?://[^\s]+"
_PII_EXT_EMAIL = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
_PII_EXT_PHONE = r"(?:\+1[-. ]?)?(?:\(\d{3}\)[-. ]?|\d{3}[-. ])\d{3}[-. ]\d{4}\b"
_PII_EXT_IPV4 = r"\b(?:\d{1,3}\.){3}\d{1,3}\b"

_PII_EXT_SQL = f"""
WITH d AS (
  SELECT doc_id,
         text
         || CASE WHEN doc_id % 7 = 0 THEN ' contact bob@example.com now' ELSE '' END
         || CASE WHEN doc_id % 11 = 0 THEN ' see https://example.com/data?id=1 too' ELSE '' END
         || CASE WHEN doc_id % 5 = 0 THEN ' call 555-123-4567 first' ELSE '' END
         || CASE WHEN doc_id % 13 = 0 THEN ' host 10.0.0.12 up' ELSE '' END
         AS dirty
  FROM documents
),
c AS (
  SELECT doc_id, dirty,
         regexp_replace(dirty, '{_PII_EXT_URL}', '', 'g') AS no_url,
         regexp_replace(regexp_replace(dirty, '{_PII_EXT_URL}', '[REDACTED]', 'g'),
                        '{_PII_EXT_EMAIL}', '[REDACTED]', 'g') AS s2
  FROM d
),
c2 AS (
  SELECT doc_id, dirty, no_url,
         regexp_replace(no_url, '{_PII_EXT_EMAIL}', '', 'g') AS no_email,
         regexp_replace(s2, '{_PII_EXT_PHONE}', '[REDACTED]', 'g') AS s3
  FROM c
),
c3 AS (
  SELECT doc_id, dirty, no_url, no_email,
         regexp_replace(no_email, '{_PII_EXT_PHONE}', '', 'g') AS no_phone,
         regexp_replace(s3, '{_PII_EXT_IPV4}', '[REDACTED]', 'g') AS scrubbed
  FROM c2
)
SELECT doc_id,
  CAST(len(regexp_extract_all(dirty, '{_PII_EXT_URL}')) AS INT) AS n_urls,
  CAST(len(regexp_extract_all(no_url, '{_PII_EXT_EMAIL}')) AS INT) AS n_emails,
  CAST(len(regexp_extract_all(no_email, '{_PII_EXT_PHONE}')) AS INT) AS n_phones,
  CAST(len(regexp_extract_all(no_phone, '{_PII_EXT_IPV4}')) AS INT) AS n_ipv4s,
  CAST(length(scrubbed) AS INT) AS scrubbed_len,
  md5(scrubbed) AS scrubbed_md5
FROM c3
"""


EXTRA_QUERIES["pii_audit_extended"] = q_pii_audit_extended
EXTRA_ORACLES["pii_audit_extended"] = _PII_EXT_SQL


# ---------------------------------------------------------------------------
# round 11 (post-close): composite bucket pagination, matrix stats,
# rare terms, seeded random scoring

_COMPOSITE_SIZE = 10


def q_docs_composite_page2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES composite aggregation, page 2: the (lang, source) buckets
    strictly after page 1's last key — the cursor predicate sits BELOW
    the aggregate, so page N aggregates only keys past the cursor."""
    from ..operators.aggregations import composite_buckets

    docs = load_table(spark, sf_dir, "documents")
    page1 = composite_buckets(
        docs, ("lang", "source"), _COMPOSITE_SIZE, value_col="n_chars"
    ).collect()
    last = page1[-1]
    return composite_buckets(
        docs, ("lang", "source"), _COMPOSITE_SIZE,
        after=(last["lang"], last["source"]), value_col="n_chars",
    )


def _docs_composite_oracle() -> str:
    return f"""
WITH b AS (
  SELECT lang, source, CAST(COUNT(*) AS BIGINT) AS n,
         ROUND(SUM(CAST(n_chars AS DOUBLE)), 6) AS sum_v,
         ROW_NUMBER() OVER (ORDER BY lang, source) AS brn
  FROM documents
  WHERE lang IS NOT NULL AND source IS NOT NULL
  GROUP BY 1, 2)
SELECT lang, source, n, sum_v FROM b
WHERE brn > {_COMPOSITE_SIZE} AND brn <= {2 * _COMPOSITE_SIZE}
"""


EXTRA_QUERIES["docs_composite_page2"] = q_docs_composite_page2
EXTRA_ORACLES["docs_composite_page2"] = _docs_composite_oracle()


def q_events_matrix_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES matrix_stats: per-event-type covariance/correlation between
    the value metric and the event's age in days — does the metric
    drift over the fixture's 30-day window."""
    from ..operators.aggregations import matrix_stats

    ev = load_table(spark, sf_dir, "events").withColumn(
        "age_days",
        (
            F.lit(_REC_ORIGIN_MS)
            - F.unix_millis(F.col("ts").cast("timestamp"))
        )
        / F.lit(86400000.0),
    )
    return matrix_stats(ev, "value", "age_days", by=("event_type",))


def _events_matrix_oracle() -> str:
    return f"""
SELECT event_type,
       CAST(COUNT(*) AS BIGINT) AS n,
       ROUND(AVG(value), 6) AS mean_a,
       ROUND(AVG(age), 6) AS mean_b,
       ROUND(COVAR_POP(value, age), 6) AS covariance,
       ROUND(CORR(value, age), 6) AS correlation
FROM (SELECT event_type, value,
             ({_REC_ORIGIN_MS} - epoch_ms(ts)) / 86400000.0 AS age
      FROM events
      WHERE value IS NOT NULL AND ts IS NOT NULL)
GROUP BY 1
"""


EXTRA_QUERIES["events_matrix_stats"] = q_events_matrix_stats
EXTRA_ORACLES["events_matrix_stats"] = _events_matrix_oracle()


def q_docs_rare_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES rare_terms over a corpus with SPLICED singletons (the flat
    fixture vocabulary has no natural long tail, so both engines
    append one unique canary token to every 97th doc — the PII-splice
    idiom): max_doc_count=1 recovers exactly the canaries plus any
    natural singletons."""
    from ..operators.facets import rare_terms

    docs = load_table(spark, sf_dir, "documents")
    spiked = docs.withColumn(
        "text",
        F.when(
            F.col("doc_id") % 97 == 0,
            F.concat(
                F.col("text"),
                F.lit(" canarytok"),
                F.col("doc_id").cast("string"),
            ),
        ).otherwise(F.col("text")),
    )
    return rare_terms(spiked, 1)


def _docs_rare_terms_oracle() -> str:
    return f"""
WITH d AS (SELECT doc_id,
                  text || CASE WHEN doc_id % 97 = 0
                               THEN ' canarytok' || CAST(doc_id AS VARCHAR)
                               ELSE '' END AS text
           FROM documents),
vx AS (SELECT doc_id, UNNEST({_TOKS}) AS term FROM d)
SELECT term, CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS df
FROM vx GROUP BY 1 HAVING COUNT(DISTINCT doc_id) <= 1
"""


EXTRA_QUERIES["docs_rare_terms"] = q_docs_rare_terms
EXTRA_ORACLES["docs_rare_terms"] = _docs_rare_terms_oracle()


_RND_SEED = 42


def q_function_score_random(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Seeded random_score jitter summed onto the BM25 leg — the
    deterministic A/B-bucketing form (portable content hash of
    (seed, id), identical in the oracle)."""
    from ..operators.retrieval import bm25_topk
    from ..operators.scoring import function_score, random_score_factor

    docs = load_table(spark, sf_dir, "documents")
    hits = bm25_topk(docs, _retrieval_queries(spark, sf_dir), _HYBRID_K).select(
        "query_id", "id", "score"
    )
    return function_score(
        hits, random_score_factor(docs, _RND_SEED), _FS_K, mode="sum"
    )


def _function_score_random_oracle() -> str:
    from ..functions.hashing import portable_hash64_sql

    h = portable_hash64_sql("CAST(doc_id AS VARCHAR)", seed=_RND_SEED)
    return f"""
WITH {_bm25_scored_ctes()},
hits AS (SELECT query_id, id, score6 FROM bm25_ranked WHERE brank <= {_HYBRID_K}),
fac AS (SELECT doc_id AS id,
               CAST(({h}) % 1000000 AS DOUBLE) / 1e6 AS factor
        FROM documents),
fscored AS (SELECT h.query_id, h.id,
                   ROUND(h.score6 + COALESCE(f.factor, 0.0), 6) AS score
            FROM hits h LEFT JOIN fac f ON f.id = h.id),
franked AS (SELECT query_id, id, score,
                   CAST(ROW_NUMBER() OVER (PARTITION BY query_id
                        ORDER BY score DESC, id) AS INT) AS rank
            FROM fscored)
SELECT query_id, id, score, rank FROM franked WHERE rank <= {_FS_K}
"""


EXTRA_QUERIES["function_score_random"] = q_function_score_random
EXTRA_ORACLES["function_score_random"] = _function_score_random_oracle()


# ---------------------------------------------------------------------------
# round 11 (post-close): term vectors (ES _termvectors) — per-doc
# term stats for a requested id set (operators/termvectors.py)

_TV_PRED = "doc_id % 100 = 31"


def q_doc_term_vectors(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.termvectors import term_vectors

    docs = load_table(spark, sf_dir, "documents")
    ids = docs.filter(F.expr(_TV_PRED)).select(F.col("doc_id").alias("id"))
    return term_vectors(docs, ids)


def _term_vectors_oracle() -> str:
    return f"""
WITH toks AS (SELECT doc_id, {_TOKS} AS w FROM documents),
req AS (SELECT doc_id FROM documents WHERE {_TV_PRED}),
tp AS (SELECT t.doc_id, p - 1 AS pos, t.w[p] AS term
       FROM toks t JOIN req USING (doc_id),
            LATERAL UNNEST(range(1, len(t.w) + 1)) u(p)),
tv AS (SELECT doc_id, term,
              CAST(COUNT(*) AS BIGINT) AS tf,
              array_to_string(list_sort(list(pos)), ',') AS positions
       FROM tp GROUP BY 1, 2),
dfq AS (SELECT term, CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS df
        FROM (SELECT doc_id, UNNEST(w) AS term FROM toks)
        WHERE term IN (SELECT DISTINCT term FROM tv)
        GROUP BY 1)
SELECT tv.doc_id, tv.term, tv.tf, tv.positions, dfq.df
FROM tv LEFT JOIN dfq USING (term)
"""


EXTRA_QUERIES["doc_term_vectors"] = q_doc_term_vectors
EXTRA_ORACLES["doc_term_vectors"] = _term_vectors_oracle()


# ---------------------------------------------------------------------------
# round 11 (post-close): cross-index search with per-index boost
# (operators/retrieval.multi_index_topk) — each language partition is
# its own "index" with its OWN corpus statistics

_MIDX_BOOST_FR = 1.5


def q_multi_index_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.retrieval import bm25_topk, multi_index_topk

    docs = load_table(spark, sf_dir, "documents")
    q = _retrieval_queries(spark, sf_dir)
    en = bm25_topk(docs.filter("lang = 'en'"), q, _HYBRID_K).select(
        "query_id", "id", "score"
    )
    fr = bm25_topk(docs.filter("lang = 'fr'"), q, _HYBRID_K).select(
        "query_id", "id", "score"
    )
    return multi_index_topk(
        [("en", en, 1.0), ("fr", fr, _MIDX_BOOST_FR)], _HYBRID_K
    )


def _multi_index_oracle() -> str:
    from ..operators.retrieval import BM25_B, BM25_K1

    def leg(p: str, lang: str) -> str:
        return f"""
{p}toks AS (SELECT doc_id, w FROM alltoks WHERE lang = '{lang}'),
{p}dl AS (SELECT doc_id AS id, len(w) AS dl FROM {p}toks),
{p}tfc AS (SELECT id, term, COUNT(*) AS tf FROM
           (SELECT doc_id AS id, UNNEST(w) AS term FROM {p}toks)
           GROUP BY 1, 2),
{p}stats AS (SELECT COUNT(*) AS n_docs, AVG(CAST(dl AS DOUBLE)) AS avgdl
             FROM {p}dl),
{p}dfq AS (SELECT term, COUNT(DISTINCT id) AS df FROM {p}tfc
           WHERE term IN (SELECT DISTINCT term FROM mqt) GROUP BY 1),
{p}scored AS (
  SELECT mqt.query_id, t.id,
         SUM(LN(1.0 + (s.n_docs - d.df + 0.5) / (d.df + 0.5))
             * (t.tf * ({BM25_K1} + 1.0))
             / (t.tf + {BM25_K1} * (1.0 - {BM25_B}
                + {BM25_B} * CAST(dl.dl AS DOUBLE) / s.avgdl))) AS score
  FROM mqt
  JOIN {p}tfc t ON t.term = mqt.term
  JOIN {p}dfq d ON d.term = mqt.term
  JOIN {p}dl dl ON dl.id = t.id
  CROSS JOIN {p}stats s
  GROUP BY 1, 2),
{p}ranked AS (
  SELECT query_id, id, score6,
         ROW_NUMBER() OVER (PARTITION BY query_id
                            ORDER BY score6 DESC, id) AS r
  FROM (SELECT query_id, id, ROUND(score, 6) AS score6 FROM {p}scored))"""

    return f"""
WITH alltoks AS (SELECT doc_id, lang, {_TOKS} AS w FROM documents),
mq AS (SELECT doc_id AS query_id, list_distinct(list_slice(w, 1, 3)) AS qts
       FROM alltoks WHERE {_HYBRID_QPRED}),
mqt AS (SELECT query_id, UNNEST(qts) AS term FROM mq),
{leg("mien", "en")},
{leg("mifr", "fr")},
fused AS (
  SELECT query_id, 'en' AS index, id, ROUND(score6 * 1.0, 6) AS score
  FROM mienranked WHERE r <= {_HYBRID_K}
  UNION ALL
  SELECT query_id, 'fr' AS index, id, ROUND(score6 * {_MIDX_BOOST_FR}, 6)
  FROM mifrranked WHERE r <= {_HYBRID_K}),
mranked AS (
  SELECT query_id, index, id, score,
         CAST(ROW_NUMBER() OVER (PARTITION BY query_id
              ORDER BY score DESC, index, id) AS INT) AS rank
  FROM fused)
SELECT query_id, index, id, score, rank
FROM mranked WHERE rank <= {_HYBRID_K}
"""


EXTRA_QUERIES["multi_index_topk"] = q_multi_index_topk
EXTRA_ORACLES["multi_index_topk"] = _multi_index_oracle()


# ---------------------------------------------------------------------------
# round 11 (post-close): wildcard term queries (operators/fuzzy.py) —
# the fourth term-level query type (exact / fuzzy / prefix / wildcard)

_WILD_EXPANSIONS = 10


def q_bm25_wildcard_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wildcard retrieval: each fixture query term becomes a 2-char
    prefix-star pattern, expanded df-ranked against the vocabulary and
    ranked with the unmodified BM25."""
    from ..functions.text import tokens as _tokens
    from ..operators.fuzzy import bm25_wildcard_topk

    docs = load_table(spark, sf_dir, "documents")
    pats = docs.filter(F.expr(_HYBRID_QPRED)).select(
        F.col("doc_id").alias("query_id"),
        F.transform(
            F.array_distinct(F.slice(_tokens("text"), 1, 3)),
            lambda t: F.concat(F.substring(t, 1, 2), F.lit("*")),
        ).alias("qpatterns"),
    )
    return bm25_wildcard_topk(
        docs, pats, _HYBRID_K, max_expansions=_WILD_EXPANSIONS
    )


def _bm25_wildcard_oracle() -> str:
    from ..operators.retrieval import BM25_B, BM25_K1

    return f"""
WITH toks AS (SELECT doc_id, {_TOKS} AS w FROM documents),
q AS (SELECT doc_id AS query_id, list_distinct(list_slice(w, 1, 3)) AS qts
      FROM toks WHERE {_HYBRID_QPRED}),
wpat AS (SELECT DISTINCT query_id, substr(qt, 1, 2) || '*' AS pat
         FROM (SELECT query_id, UNNEST(qts) AS qt FROM q)),
wrx AS (SELECT query_id, pat,
               '^' || replace(replace(pat, '*', '.*'), '?', '.') || '$' AS rx
        FROM wpat),
vx AS (SELECT doc_id AS id, UNNEST(w) AS term FROM toks),
vocab AS (SELECT term, COUNT(DISTINCT id) AS vdf FROM vx GROUP BY 1),
wexp AS (
  SELECT DISTINCT query_id, term FROM (
    SELECT r.query_id, r.pat, v.term,
           ROW_NUMBER() OVER (PARTITION BY r.query_id, r.pat
                              ORDER BY v.vdf DESC, v.term) AS xrn
    FROM wrx r JOIN vocab v ON regexp_matches(v.term, r.rx))
  WHERE xrn <= {_WILD_EXPANSIONS}),
dl AS (SELECT doc_id AS id, len(w) AS dl FROM toks),
tfc AS (SELECT id, term, COUNT(*) AS tf FROM vx GROUP BY 1, 2),
stats AS (SELECT COUNT(*) AS n_docs, AVG(CAST(dl AS DOUBLE)) AS avgdl FROM dl),
dfq AS (SELECT term, COUNT(DISTINCT id) AS df FROM tfc
        WHERE term IN (SELECT DISTINCT term FROM wexp) GROUP BY 1),
wc_scored AS (
  SELECT e.query_id, tfc.id,
         SUM(LN(1.0 + (s.n_docs - d.df + 0.5) / (d.df + 0.5))
             * (tfc.tf * ({BM25_K1} + 1.0))
             / (tfc.tf + {BM25_K1} * (1.0 - {BM25_B}
                + {BM25_B} * CAST(dl.dl AS DOUBLE) / s.avgdl))) AS score
  FROM wexp e
  JOIN tfc ON tfc.term = e.term
  JOIN dfq d ON d.term = e.term
  JOIN dl ON dl.id = tfc.id
  CROSS JOIN stats s
  GROUP BY 1, 2),
wc_ranked AS (
  SELECT query_id, id, score6,
         CAST(ROW_NUMBER() OVER (PARTITION BY query_id
                                 ORDER BY score6 DESC, id) AS INT) AS wrk
  FROM (SELECT query_id, id, ROUND(score, 6) AS score6 FROM wc_scored))
SELECT query_id, id, score6 AS score, wrk AS rank
FROM wc_ranked WHERE wrk <= {_HYBRID_K}
"""


EXTRA_QUERIES["bm25_wildcard_topk"] = q_bm25_wildcard_topk
EXTRA_ORACLES["bm25_wildcard_topk"] = _bm25_wildcard_oracle()


# ---------------------------------------------------------------------------
# round 11 (post-close): query DSL front door (operators/querydsl.py)
# — one oracle row through the bool path; every other node type is
# equivalence-tested against its already-oracled operator

_DSL_MUST = "spark"
_DSL_NOT = "join"
_DSL_K = 10


def q_dsl_bool_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.querydsl import search_dsl

    docs = load_table(spark, sf_dir, "documents")
    return search_dsl(
        docs,
        {"bool": {"must": [_DSL_MUST], "must_not": [_DSL_NOT]}},
        _DSL_K,
    )


def _dsl_bool_oracle() -> str:
    from ..operators.retrieval import BM25_B, BM25_K1

    return f"""
WITH toks AS (SELECT doc_id, {_TOKS} AS w FROM documents),
adm AS (SELECT doc_id AS id FROM toks
        WHERE list_contains(w, '{_DSL_MUST}')
          AND NOT list_contains(w, '{_DSL_NOT}')),
dl AS (SELECT doc_id AS id, len(w) AS dl FROM toks),
vx AS (SELECT doc_id AS id, UNNEST(w) AS term FROM toks),
tfc AS (SELECT id, term, COUNT(*) AS tf FROM vx
        WHERE term = '{_DSL_MUST}' GROUP BY 1, 2),
stats AS (SELECT COUNT(*) AS n_docs, AVG(CAST(dl AS DOUBLE)) AS avgdl FROM dl),
dfq AS (SELECT term, COUNT(DISTINCT id) AS df FROM tfc GROUP BY 1),
ds_scored AS (
  SELECT CAST(0 AS BIGINT) AS query_id, tfc.id,
         SUM(LN(1.0 + (s.n_docs - d.df + 0.5) / (d.df + 0.5))
             * (tfc.tf * ({BM25_K1} + 1.0))
             / (tfc.tf + {BM25_K1} * (1.0 - {BM25_B}
                + {BM25_B} * CAST(dl.dl AS DOUBLE) / s.avgdl))) AS score
  FROM tfc
  JOIN dfq d ON d.term = tfc.term
  JOIN dl ON dl.id = tfc.id
  CROSS JOIN stats s
  WHERE tfc.id IN (SELECT id FROM adm)
  GROUP BY 1, 2),
ds_ranked AS (
  SELECT query_id, id, score6,
         CAST(ROW_NUMBER() OVER (PARTITION BY query_id
                                 ORDER BY score6 DESC, id) AS INT) AS drk
  FROM (SELECT query_id, id, ROUND(score, 6) AS score6 FROM ds_scored))
SELECT query_id, id, score6 AS score, drk AS rank
FROM ds_ranked WHERE drk <= {_DSL_K}
"""


EXTRA_QUERIES["dsl_bool_topk"] = q_dsl_bool_topk
EXTRA_ORACLES["dsl_bool_topk"] = _dsl_bool_oracle()


# ---------------------------------------------------------------------------
# round 11 (post-close): ES _explain — the per-term BM25 score
# decomposition of a ranked page's pairs (operators/termvectors.py)


def q_bm25_explain(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explain the top-5 BM25 hits of the fixture queries: per-term
    tf/df/dl/idf/weight whose per-pair SUM is the ranked score —
    relevance debugging as a first-class verb."""
    from ..operators.retrieval import bm25_topk
    from ..operators.termvectors import bm25_explain

    docs = load_table(spark, sf_dir, "documents")
    q = _retrieval_queries(spark, sf_dir)
    pairs = bm25_topk(docs, q, _FS_K).select("query_id", "id")
    return bm25_explain(docs, q, pairs)


def _bm25_explain_oracle() -> str:
    from ..operators.retrieval import BM25_B, BM25_K1

    return f"""
WITH {_bm25_scored_ctes()},
req AS (SELECT query_id, id FROM bm25_ranked WHERE brank <= {_FS_K}),
xdl AS (SELECT doc_id AS id, len(w) AS dl FROM toks),
xtf AS (SELECT t.id, t.term, t.tf, xdl.dl FROM tfc t JOIN xdl ON xdl.id = t.id
        WHERE t.term IN (SELECT DISTINCT term FROM qt)),
expl AS (
  SELECT qt.query_id, x.id, x.term,
         CAST(x.tf AS BIGINT) AS tf,
         CAST(d.df AS BIGINT) AS df,
         CAST(x.dl AS BIGINT) AS dl,
         ROUND(LN(1.0 + (s.n_docs - d.df + 0.5) / (d.df + 0.5)), 6) AS idf,
         ROUND(LN(1.0 + (s.n_docs - d.df + 0.5) / (d.df + 0.5))
               * (x.tf * ({BM25_K1} + 1.0))
               / (x.tf + {BM25_K1} * (1.0 - {BM25_B}
                  + {BM25_B} * CAST(x.dl AS DOUBLE) / s.avgdl)), 6) AS weight
  FROM qt
  JOIN xtf x ON x.term = qt.term
  JOIN dfq d ON d.term = qt.term
  CROSS JOIN stats s)
SELECT e.query_id, e.id, e.term, e.tf, e.df, e.dl, e.idf, e.weight
FROM expl e JOIN req r ON r.query_id = e.query_id AND r.id = e.id
"""


EXTRA_QUERIES["bm25_explain"] = q_bm25_explain
EXTRA_ORACLES["bm25_explain"] = _bm25_explain_oracle()


# ---------------------------------------------------------------------------
# round 12 (opening rotation, VERDICT r11 item 1): promote the six
# round-11 addendum flagships — none of which has ever been
# driver-verified — into the 50-row driver window: dsl_bool_topk (the
# query-DSL front door's translation layer most deserves independent
# checking), bm25_explain (score decomposition), multi_index_topk
# (per-corpus BM25 statistics), bm25_wildcard_topk (fourth term-level
# query type), events_date_histogram (calendar buckets), and
# docs_composite_page2 (stateless bucket pagination).  Demote six
# long-green rows whose families keep driver coverage: bm25_topk
# (nine BM25 rows remain incl. bm25_index_topk / bm25_stemmed_topk),
# hybrid_weighted (hybrid keeps hybrid_engine_rrf), percolate_matches
# (keeps percolate_store_matches), bm25_boolean (boolean semantics
# keep dsl_bool_topk's bool node), bm25_fuzzy_topk (term expansion
# keeps bm25_wildcard_topk + spell_suggest), and function_score_boost
# (keeps function_score_recency).  Every demoted row keeps the
# IDENTICAL DuckDB comparison in the pytest tier.
for _name in (
    "dsl_bool_topk",
    "bm25_explain",
    "multi_index_topk",
    "bm25_wildcard_topk",
    "events_date_histogram",
    "docs_composite_page2",
):
    QUERIES[_name] = EXTRA_QUERIES.pop(_name)
    ORACLES[_name] = EXTRA_ORACLES.pop(_name)
for _name in (
    "bm25_topk",
    "hybrid_weighted",
    "percolate_matches",
    "bm25_boolean",
    "bm25_fuzzy_topk",
    "function_score_boost",
):
    EXTRA_QUERIES[_name] = QUERIES.pop(_name)
    EXTRA_ORACLES[_name] = ORACLES.pop(_name)
del _name


# ---------------------------------------------------------------------------
# round 12: full ES request composition (operators/querydsl.
# search_request, VERDICT r11 item 2) — query + aggs + post_filter in
# ONE call with the real ES semantics: aggregations cover the query's
# ENTIRE match set (not the top-k page) and post_filter restricts the
# hits AFTER the aggregations.  The oracle replays BOTH halves in one
# DuckDB statement over a long-format (section, key, n, v) union:
# 'hit' rows carry (id, rank, score), 'agg:by_source' rows the terms
# agg, 'agg:chars' rows the melted extended_stats.

_DRQ_PF = "sort"


def q_dsl_query_aggs(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.querydsl import search_request

    docs = load_table(spark, sf_dir, "documents")
    out = search_request(
        docs,
        {
            "query": {"bool": {"must": [_DSL_MUST], "must_not": [_DSL_NOT]}},
            "size": _DSL_K,
            "aggs": {
                "by_source": {"terms": {"field": "source"}},
                "chars": {"extended_stats": {"field": "n_chars"}},
            },
            "post_filter": {"match": {"terms": [_DRQ_PF]}},
        },
    )
    hits = out["hits"].select(
        F.lit("hit").alias("section"),
        F.col("id").cast("string").alias("key"),
        F.col("rank").cast("long").alias("n"),
        F.col("score").cast("double").alias("v"),
    )
    src = out["aggregations"]["by_source"].select(
        F.lit("agg:by_source").alias("section"),
        F.col("value").cast("string").alias("key"),
        F.col("n").cast("long").alias("n"),
        F.lit(None).cast("double").alias("v"),
    )
    chars = out["aggregations"]["chars"].select(
        F.expr(
            "stack(8, 'n', CAST(n AS DOUBLE), 'min_v', min_v, "
            "'max_v', max_v, 'sum_v', sum_v, 'avg_v', avg_v, "
            "'sum_sq', sum_sq, 'variance', variance, "
            "'std_dev', std_dev) AS (key, v)"
        )
    ).select(
        F.lit("agg:chars").alias("section"),
        "key",
        F.lit(None).cast("long").alias("n"),
        F.col("v").cast("double").alias("v"),
    )
    return hits.unionByName(src).unionByName(chars)


def _dsl_query_aggs_oracle() -> str:
    from ..operators.retrieval import BM25_B, BM25_K1

    return f"""
WITH toks AS (SELECT doc_id, {_TOKS} AS w FROM documents),
adm AS (SELECT doc_id AS id FROM toks
        WHERE list_contains(w, '{_DSL_MUST}')
          AND NOT list_contains(w, '{_DSL_NOT}')),
pf AS (SELECT doc_id AS id FROM toks WHERE list_contains(w, '{_DRQ_PF}')),
dl AS (SELECT doc_id AS id, len(w) AS dl FROM toks),
vx AS (SELECT doc_id AS id, UNNEST(w) AS term FROM toks),
tfc AS (SELECT id, term, COUNT(*) AS tf FROM vx
        WHERE term = '{_DSL_MUST}' GROUP BY 1, 2),
stats AS (SELECT COUNT(*) AS n_docs, AVG(CAST(dl AS DOUBLE)) AS avgdl FROM dl),
dfq AS (SELECT term, COUNT(DISTINCT id) AS df FROM tfc GROUP BY 1),
ds_scored AS (
  SELECT tfc.id,
         SUM(LN(1.0 + (s.n_docs - d.df + 0.5) / (d.df + 0.5))
             * (tfc.tf * ({BM25_K1} + 1.0))
             / (tfc.tf + {BM25_K1} * (1.0 - {BM25_B}
                + {BM25_B} * CAST(dl.dl AS DOUBLE) / s.avgdl))) AS score
  FROM tfc
  JOIN dfq d ON d.term = tfc.term
  JOIN dl ON dl.id = tfc.id
  CROSS JOIN stats s
  WHERE tfc.id IN (SELECT id FROM adm)
    AND tfc.id IN (SELECT id FROM pf)
  GROUP BY 1),
ds_ranked AS (
  SELECT id, score6,
         ROW_NUMBER() OVER (ORDER BY score6 DESC, id) AS drk
  FROM (SELECT id, ROUND(score, 6) AS score6 FROM ds_scored)),
adocs AS (SELECT * FROM documents WHERE doc_id IN (SELECT id FROM adm)),
cst AS (SELECT COUNT(v) AS n, ROUND(MIN(v), 6) AS min_v,
               ROUND(MAX(v), 6) AS max_v, ROUND(SUM(v), 6) AS sum_v,
               ROUND(AVG(v), 6) AS avg_v, ROUND(SUM(v * v), 6) AS sum_sq,
               ROUND(VAR_POP(v), 6) AS variance,
               ROUND(STDDEV_POP(v), 6) AS std_dev
        FROM (SELECT CAST(n_chars AS DOUBLE) AS v FROM adocs))
SELECT 'hit' AS section, CAST(id AS VARCHAR) AS key,
       CAST(drk AS BIGINT) AS n, score6 AS v
FROM ds_ranked WHERE drk <= {_DSL_K}
UNION ALL
SELECT 'agg:by_source', source, CAST(COUNT(*) AS BIGINT),
       CAST(NULL AS DOUBLE)
FROM adocs GROUP BY source
UNION ALL
SELECT 'agg:chars', u.key, CAST(NULL AS BIGINT), u.v
FROM cst, LATERAL (
  SELECT 'n' AS key, CAST(cst.n AS DOUBLE) AS v
  UNION ALL SELECT 'min_v', cst.min_v
  UNION ALL SELECT 'max_v', cst.max_v
  UNION ALL SELECT 'sum_v', cst.sum_v
  UNION ALL SELECT 'avg_v', cst.avg_v
  UNION ALL SELECT 'sum_sq', cst.sum_sq
  UNION ALL SELECT 'variance', cst.variance
  UNION ALL SELECT 'std_dev', cst.std_dev) u
"""


EXTRA_QUERIES["dsl_query_aggs"] = q_dsl_query_aggs
EXTRA_ORACLES["dsl_query_aggs"] = _dsl_query_aggs_oracle()


# ---------------------------------------------------------------------------
# round 12: sloppy phrase / proximity (operators/phrase.
# phrase_slop_topk, VERDICT r11 item 3) — ES match_phrase with slop:
# slot i votes the ADJUSTED anchor pos−i and the phrase matches at
# start s iff the slots admit an INJECTIVE assignment to document
# positions with all adjusted anchors in [s, s+slop] (Lucene's
# acceptance test; adjacent transposition costs 2; repeated query
# terms need DISTINCT token occurrences — round 13, ADVICE r12
# item 1).  Injectivity is the Hall condition over each term's slot
# pairs: for every lo ≤ hi, at least `req` (= the term's slots inside
# [lo, hi]) distinct positions in [s+lo, s+slop+hi] — exact for the
# staircase feasibility intervals (operators/phrase._slop_anchor_topk
# docstring).  phrase_tf counts covering window starts (tighter match
# → more covering starts — the monotone sloppy-weight stand-in).
# Same deterministic corpus-derived phrase set as phrase_topk; slop=2
# so transpositions and one-gap insertions actually change the result
# vs the exact row.

_SLOP = 2


def q_phrase_slop_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.phrase import phrase_slop_topk

    docs = load_table(spark, sf_dir, "documents")
    return phrase_slop_topk(
        docs, _phrase_queries(spark, sf_dir), _PHRASE_K, slop=_SLOP
    )


def _phrase_slop_oracle() -> str:
    return f"""
WITH toks AS (SELECT doc_id, {_TOKS} AS w FROM documents),
qs AS (SELECT doc_id AS query_id, list_slice(w, 2, 4) AS phrase FROM toks
       WHERE {_PHRASE_QPRED} AND len(w) >= 4),
qslot AS (SELECT query_id, len(phrase) AS m,
                 UNNEST(range(1, len(phrase) + 1)) AS slot, phrase
          FROM qs),
qterm AS (SELECT query_id, m, slot, phrase[slot] AS term FROM qslot),
qpr AS (SELECT a.query_id, a.term, a.slot AS lo, b.slot AS hi,
               COUNT(*) AS req
        FROM qterm a
        JOIN qterm b ON b.query_id = a.query_id AND b.term = a.term
                    AND a.slot <= b.slot
        JOIN qterm c ON c.query_id = a.query_id AND c.term = a.term
                    AND c.slot BETWEEN a.slot AND b.slot
        GROUP BY 1, 2, 3, 4),
npq AS (SELECT query_id, COUNT(*) AS np FROM qpr GROUP BY 1),
px AS (SELECT doc_id AS id, w, UNNEST(range(1, len(w) + 1)) AS pos FROM toks),
tp AS (SELECT id, pos, w[pos] AS term FROM px),
cand AS (SELECT DISTINCT query_id, id, strt FROM (
           SELECT q.query_id, t.id,
                  UNNEST(range(t.pos - q.slot - {_SLOP},
                               t.pos - q.slot + 1)) AS strt
           FROM qterm q JOIN tp t USING (term))),
hv AS (SELECT c.query_id, c.id, c.strt, p.term, p.lo, p.hi, p.req,
              COUNT(DISTINCT t.pos) AS have
       FROM cand c
       JOIN qpr p USING (query_id)
       JOIN tp t ON t.id = c.id AND t.term = p.term
               AND t.pos BETWEEN c.strt + p.lo
                             AND c.strt + {_SLOP} + p.hi
       GROUP BY 1, 2, 3, 4, 5, 6, 7),
sat AS (SELECT query_id, id, strt, COUNT(*) AS sat FROM hv
        WHERE have >= req GROUP BY 1, 2, 3),
pf AS (SELECT s.query_id, s.id, COUNT(*) AS phrase_tf
       FROM sat s JOIN npq n USING (query_id)
       WHERE s.sat = n.np GROUP BY 1, 2)
SELECT query_id, id, phrase_tf, rank FROM (
  SELECT *, CAST(ROW_NUMBER() OVER (PARTITION BY query_id
                                    ORDER BY phrase_tf DESC, id) AS INT) AS rank
  FROM pf)
WHERE rank <= {_PHRASE_K}
"""


EXTRA_QUERIES["phrase_slop_topk"] = q_phrase_slop_topk
EXTRA_ORACLES["phrase_slop_topk"] = _phrase_slop_oracle()


# ---------------------------------------------------------------------------
# round 12: percolator-store STREAMING round trip (VERDICT r11 item 9)
# — the push pipeline end-to-end: the registry mutations of
# percolate_store_matches arrive via streaming_log_sink in TWO runs
# over one checkpoint (sink restart), then the corpus arrives as a doc
# stream percolated by percolate_stream(store) in TWO runs over one
# checkpoint (alert restart — the second run percolates ONLY the newly
# arrived docs, so a double-percolated pair would duplicate a row and
# fail the oracle's exact row count).  End state must land exactly
# where the batch path does, so the row SHARES
# percolate_store_matches' fold-then-match oracle verbatim (the
# ivf_stream_topk / phrase_index_topk precedent).


def q_percolate_stream_store(spark: SparkSession, sf_dir: str) -> DataFrame:
    import os as _os
    import shutil
    import tempfile

    from ..functions.text import tokens as _tokens
    from ..operators.percolate import percolate_stream
    from ..sources.percolator_store import PercolatorStore

    docs = load_table(spark, sf_dir, "documents")
    root = _os.path.join(
        tempfile.gettempdir(), f"dvss_spark_percstream_{_os.getpid()}",
        _os.path.basename(_os.path.normpath(sf_dir)) or "sf",
    )
    shutil.rmtree(root, ignore_errors=True)
    store = PercolatorStore(_os.path.join(root, "store"))
    store.init_base(
        docs.filter(F.expr(_PERC_PRED)).select(
            F.col("doc_id").alias("query_id"),
            F.slice(_tokens("text"), 1, 4).alias("qterms"),
            F.slice(_tokens("text"), 6, 1).alias("none_terms"),
        )
    )

    # -- registry mutations arrive BY STREAM (two sink runs, one ckpt)
    upd = docs.filter(F.expr(_PERC_PRED)).filter("doc_id % 2 = 1").select(
        F.lit(1).cast("long").alias("seq"),
        F.lit("upsert").alias("op"),
        F.col("doc_id").alias("query_id"),
        F.slice(_tokens("text"), 2, 3).alias("qterms"),
        F.lit(None).cast("array<string>").alias("none_terms"),
        F.lit(1).cast("int").alias("min_match"),
    )
    dels = docs.filter(F.expr(_PERC_PRED)).filter("doc_id % 3 = 0").select(
        F.lit(2).cast("long").alias("seq"),
        F.lit("delete").alias("op"),
        F.col("doc_id").alias("query_id"),
        F.lit(None).cast("array<string>").alias("qterms"),
        F.lit(None).cast("array<string>").alias("none_terms"),
        F.lit(None).cast("int").alias("min_match"),
    )
    news = docs.filter("doc_id % 211 = 3").select(
        F.lit(3).cast("long").alias("seq"),
        F.lit("upsert").alias("op"),
        (F.col("doc_id") + F.lit(1000000)).alias("query_id"),
        F.slice(_tokens("text"), 1, 3).alias("qterms"),
        F.lit(None).cast("array<string>").alias("none_terms"),
        F.lit(2).cast("int").alias("min_match"),
    )
    log_src = _os.path.join(root, "log_src")
    log_ckpt = _os.path.join(root, "log_ckpt")
    log_schema = (
        "seq long, op string, query_id long, qterms array<string>, "
        "none_terms array<string>, min_match int"
    )
    upd.write.mode("append").parquet(log_src)
    sink = store.streaming_log_sink(
        spark.readStream.schema(log_schema).parquet(log_src),
        checkpoint=log_ckpt,
    )
    sink.awaitTermination(300)
    dels.unionByName(news).write.mode("append").parquet(log_src)
    sink = store.streaming_log_sink(          # sink RESTART, same ckpt
        spark.readStream.schema(log_schema).parquet(log_src),
        checkpoint=log_ckpt,
    )
    sink.awaitTermination(300)

    # -- the corpus arrives as a DOC STREAM across a checkpoint restart
    doc_src = _os.path.join(root, "doc_src")
    doc_ckpt = _os.path.join(root, "doc_ckpt")
    alerts = _os.path.join(root, "alerts")
    doc_schema = "doc_id long, text string"
    half = docs.select("doc_id", "text")
    half.filter("doc_id % 2 = 0").write.mode("append").parquet(doc_src)
    q = percolate_stream(
        spark.readStream.schema(doc_schema).parquet(doc_src), store, alerts,
        checkpoint=doc_ckpt,
        none_terms_col="none_terms", min_match_col="min_match",
    )
    q.awaitTermination(300)
    half.filter("doc_id % 2 = 1").write.mode("append").parquet(doc_src)
    q = percolate_stream(                     # alert RESTART, same ckpt
        spark.readStream.schema(doc_schema).parquet(doc_src), store, alerts,
        checkpoint=doc_ckpt,
        none_terms_col="none_terms", min_match_col="min_match",
    )
    q.awaitTermination(300)
    return spark.read.parquet(alerts)


EXTRA_QUERIES["percolate_stream_store"] = q_percolate_stream_store
# end state must equal the batch path's — oracle shared verbatim
EXTRA_ORACLES["percolate_stream_store"] = _percolate_store_oracle()


# ---------------------------------------------------------------------------
# round 12: ES rescore (operators/querydsl._apply_rescore) — the
# classic phrase-rescore pattern: cheap bag-of-words first pass over
# the corpus, exact proximity only over the k-bounded window.  The
# oracle replays BOTH passes: the BM25 chain ranked to the window,
# then the sloppy-phrase covering-start counts computed ONLY for
# window docs, combined per score_mode=total and re-ranked.

_RES_PHRASE = ("table", "hash")
_RES_WINDOW = 30
_RES_RW = 0.5


def q_dsl_rescore_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.querydsl import search_request

    docs = load_table(spark, sf_dir, "documents")
    return search_request(
        docs,
        {
            "query": {"match": {"terms": [_DSL_MUST]}},
            "size": _DSL_K,
            "rescore": {
                "window_size": _RES_WINDOW,
                "query": {
                    "rescore_query": {
                        "match_phrase": {
                            "terms": list(_RES_PHRASE), "slop": 1,
                        }
                    },
                    "query_weight": 1.0,
                    "rescore_query_weight": _RES_RW,
                    "score_mode": "total",
                },
            },
        },
    )["hits"]


def _dsl_rescore_oracle() -> str:
    from ..operators.retrieval import BM25_B, BM25_K1

    return f"""
WITH toks AS (SELECT doc_id, {_TOKS} AS w FROM documents),
dl AS (SELECT doc_id AS id, len(w) AS dl FROM toks),
vx AS (SELECT doc_id AS id, UNNEST(w) AS term FROM toks),
tfc AS (SELECT id, term, COUNT(*) AS tf FROM vx
        WHERE term = '{_DSL_MUST}' GROUP BY 1, 2),
stats AS (SELECT COUNT(*) AS n_docs, AVG(CAST(dl AS DOUBLE)) AS avgdl FROM dl),
dfq AS (SELECT term, COUNT(DISTINCT id) AS df FROM tfc GROUP BY 1),
fp AS (
  SELECT tfc.id,
         SUM(LN(1.0 + (s.n_docs - d.df + 0.5) / (d.df + 0.5))
             * (tfc.tf * ({BM25_K1} + 1.0))
             / (tfc.tf + {BM25_K1} * (1.0 - {BM25_B}
                + {BM25_B} * CAST(dl.dl AS DOUBLE) / s.avgdl))) AS score
  FROM tfc
  JOIN dfq d ON d.term = tfc.term
  JOIN dl ON dl.id = tfc.id
  CROSS JOIN stats s
  GROUP BY 1),
win AS (
  SELECT id, score6 FROM (
    SELECT id, ROUND(score, 6) AS score6,
           ROW_NUMBER() OVER (ORDER BY ROUND(score, 6) DESC, id) AS wrank
    FROM fp)
  WHERE wrank <= {_RES_WINDOW}),
qsl AS (SELECT * FROM (VALUES (1, '{_RES_PHRASE[0]}'),
                              (2, '{_RES_PHRASE[1]}')) AS t(slot, term)),
px AS (SELECT doc_id AS id, w, UNNEST(range(1, len(w) + 1)) AS pos
       FROM toks WHERE doc_id IN (SELECT id FROM win)),
tp AS (SELECT id, pos, w[pos] AS term FROM px),
hit AS (SELECT t.id, q.slot, t.pos - q.slot AS anchor
        FROM qsl q JOIN tp t USING (term)),
st AS (SELECT id, slot, UNNEST(range(anchor - 1, anchor + 1)) AS strt
       FROM hit),
wins AS (SELECT id, strt, COUNT(DISTINCT slot) AS ns FROM st GROUP BY 1, 2),
ptf AS (SELECT id, CAST(COUNT(*) AS DOUBLE) AS sec
        FROM wins WHERE ns = 2 GROUP BY 1),
comb AS (
  SELECT w.id,
         ROUND(w.score6 + {_RES_RW} * COALESCE(p.sec, 0.0), 6) AS score
  FROM win w LEFT JOIN ptf p USING (id))
SELECT CAST(0 AS BIGINT) AS query_id, id, score,
       CAST(rnk AS INT) AS rank
FROM (SELECT *, ROW_NUMBER() OVER (ORDER BY score DESC, id) AS rnk FROM comb)
WHERE rnk <= {_DSL_K}
"""


EXTRA_QUERIES["dsl_rescore_topk"] = q_dsl_rescore_topk
EXTRA_ORACLES["dsl_rescore_topk"] = _dsl_rescore_oracle()


# ---------------------------------------------------------------------------
# round 12: nested sub-aggregations (operators/querydsl._sub_agg_expr)
# — ES metric aggs nested inside a terms bucket, computed in the
# bucket's SINGLE hash aggregate (no second shuffle; plan-tested in
# tests/test_querydsl.py).  The row drives the full request path:
# bool-query match set → terms buckets over source → per-bucket
# avg / min / max / value_count / exact cardinality.


def q_dsl_terms_subaggs(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.querydsl import search_request

    docs = load_table(spark, sf_dir, "documents")
    return search_request(
        docs,
        {
            "query": {"bool": {"must": [_DSL_MUST], "must_not": [_DSL_NOT]}},
            "aggs": {
                "by_source": {
                    "terms": {"field": "source"},
                    "aggs": {
                        "avg_chars": {"avg": {"field": "n_chars"}},
                        "min_chars": {"min": {"field": "n_chars"}},
                        "max_chars": {"max": {"field": "n_chars"}},
                        "n_langs": {"cardinality": {"field": "lang"}},
                        "n_vals": {"value_count": {"field": "n_chars"}},
                    },
                }
            },
        },
    )["aggregations"]["by_source"]


def _dsl_terms_subaggs_oracle() -> str:
    return f"""
WITH toks AS (SELECT doc_id, {_TOKS} AS w FROM documents),
adm AS (SELECT doc_id AS id FROM toks
        WHERE list_contains(w, '{_DSL_MUST}')
          AND NOT list_contains(w, '{_DSL_NOT}')),
adocs AS (SELECT * FROM documents WHERE doc_id IN (SELECT id FROM adm))
SELECT source AS value, CAST(COUNT(*) AS BIGINT) AS n,
       ROUND(AVG(CAST(n_chars AS DOUBLE)), 6) AS avg_chars,
       ROUND(MIN(CAST(n_chars AS DOUBLE)), 6) AS min_chars,
       ROUND(MAX(CAST(n_chars AS DOUBLE)), 6) AS max_chars,
       CAST(COUNT(DISTINCT lang) AS BIGINT) AS n_langs,
       CAST(COUNT(n_chars) AS BIGINT) AS n_vals
FROM adocs GROUP BY source
"""


EXTRA_QUERIES["dsl_terms_subaggs"] = q_dsl_terms_subaggs
EXTRA_ORACLES["dsl_terms_subaggs"] = _dsl_terms_subaggs_oracle()


# ---------------------------------------------------------------------------
# round 12: search_after on a FIELD SORT (the sorted-pagination half of
# the cursor family; bm25_page2 is the relevance-ranked half).  Page 1
# runs first and its last (sort value, id) tuple becomes the cursor;
# the oracle replays the whole flow as rows 11..20 of the admissible
# set's total (n_chars asc, id) order — which is exactly what a
# correct strictly-after cursor must return.


def q_dsl_sorted_page2(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.querydsl import search_request

    docs = load_table(spark, sf_dir, "documents")
    base = {
        "query": {"bool": {"must": [_DSL_MUST], "must_not": [_DSL_NOT]}},
        "sort": [{"n_chars": "asc"}],
        "size": _DSL_K,
    }
    p1 = search_request(docs, base)["hits"]
    last = p1.orderBy(F.col("rank").desc()).limit(1).collect()[0]
    return search_request(
        docs, {**base, "search_after": [last["n_chars"], last["id"]]}
    )["hits"]


def _dsl_sorted_page2_oracle() -> str:
    return f"""
WITH toks AS (SELECT doc_id, {_TOKS} AS w FROM documents),
adm AS (SELECT doc_id AS id FROM toks
        WHERE list_contains(w, '{_DSL_MUST}')
          AND NOT list_contains(w, '{_DSL_NOT}')),
srt AS (SELECT CAST(0 AS BIGINT) AS query_id, doc_id AS id, n_chars,
               ROW_NUMBER() OVER (ORDER BY n_chars ASC, doc_id ASC) AS rn
        FROM documents WHERE doc_id IN (SELECT id FROM adm))
SELECT query_id, id, n_chars, CAST(rn - {_DSL_K} AS INT) AS rank
FROM srt WHERE rn > {_DSL_K} AND rn <= {2 * _DSL_K}
"""


EXTRA_QUERIES["dsl_sorted_page2"] = q_dsl_sorted_page2
EXTRA_ORACLES["dsl_sorted_page2"] = _dsl_sorted_page2_oracle()


# ---------------------------------------------------------------------------
# round 12: top-level knn + query hybrid (operators/querydsl.
# _knn_fused) — the ES 8 request shape: combined = BM25 + boost ·
# l2_norm similarity (1/(1+d²)), knn leg the exact squared-L2 top-k on
# the shared id space, fusion one union + hash aggregate.  The query
# vector is vec_id 7's embedding (a driver-side scalar fetch, the
# probe-cell convention), referenced literally in the oracle.

_KNN_HY_VID = 7
_KNN_HY_K = 20
_KNN_HY_BOOST = 2.0


def q_dsl_knn_hybrid(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.querydsl import search_request

    docs = load_table(spark, sf_dir, "documents")
    emb = load_table(spark, sf_dir, "embeddings")
    qv = emb.filter(F.col("vec_id") == _KNN_HY_VID).select(
        "embedding"
    ).collect()[0]["embedding"]
    return search_request(
        docs,
        {
            "query": {"match": {"terms": [_DSL_MUST]}},
            "size": _DSL_K,
            "knn": {
                "query_vector": list(qv),
                "k": _KNN_HY_K,
                "boost": _KNN_HY_BOOST,
            },
        },
        vectors=emb,
    )["hits"]


def _dsl_knn_hybrid_oracle() -> str:
    from ..operators.retrieval import BM25_B, BM25_K1
    from .vector import _SQL_SQ_L2

    d = _SQL_SQ_L2.format(q="qe.qe", v="v.embedding")
    return f"""
WITH toks AS (SELECT doc_id, {_TOKS} AS w FROM documents),
dl AS (SELECT doc_id AS id, len(w) AS dl FROM toks),
vx AS (SELECT doc_id AS id, UNNEST(w) AS term FROM toks),
tfc AS (SELECT id, term, COUNT(*) AS tf FROM vx
        WHERE term = '{_DSL_MUST}' GROUP BY 1, 2),
stats AS (SELECT COUNT(*) AS n_docs, AVG(CAST(dl AS DOUBLE)) AS avgdl FROM dl),
dfq AS (SELECT term, COUNT(DISTINCT id) AS df FROM tfc GROUP BY 1),
fp AS (
  SELECT tfc.id,
         SUM(LN(1.0 + (s.n_docs - d.df + 0.5) / (d.df + 0.5))
             * (tfc.tf * ({BM25_K1} + 1.0))
             / (tfc.tf + {BM25_K1} * (1.0 - {BM25_B}
                + {BM25_B} * CAST(dl.dl AS DOUBLE) / s.avgdl))) AS score
  FROM tfc
  JOIN dfq d ON d.term = tfc.term
  JOIN dl ON dl.id = tfc.id
  CROSS JOIN stats s
  GROUP BY 1),
qe AS (SELECT embedding AS qe FROM embeddings WHERE vec_id = {_KNN_HY_VID}),
vd AS (SELECT v.vec_id AS id, {d} AS dist FROM embeddings v CROSS JOIN qe),
kt AS (SELECT id, dist FROM (
         SELECT *, ROW_NUMBER() OVER (
           ORDER BY round_even((dist) * 1e6, 0) / 1e6, id) AS rn
         FROM vd)
       WHERE rn <= {_KNN_HY_K}),
contrib AS (
  SELECT id, score AS c FROM fp
  UNION ALL
  SELECT id, {_KNN_HY_BOOST} / (1.0 + dist) FROM kt),
comb AS (SELECT id, ROUND(SUM(c), 6) AS score FROM contrib GROUP BY 1)
SELECT CAST(0 AS BIGINT) AS query_id, id, score, CAST(rnk AS INT) AS rank
FROM (SELECT *, ROW_NUMBER() OVER (ORDER BY score DESC, id) AS rnk FROM comb)
WHERE rnk <= {_DSL_K}
"""


EXTRA_QUERIES["dsl_knn_hybrid"] = q_dsl_knn_hybrid
EXTRA_ORACLES["dsl_knn_hybrid"] = _dsl_knn_hybrid_oracle()


# ---------------------------------------------------------------------------
# round 13: PRE-FILTERED kNN + post_filter over hybrid hits (VERDICT
# r12 items 2+3; operators/querydsl._knn_prefilter).  The ES 8
# request shape "search MY documents": knn.filter restricts the
# candidate vectors BEFORE the top-k cut (label = 3 — a map-side
# predicate on the vector frame, PushedFilters-locked in
# tests/test_querydsl.py), the text leg is the full "spark" match
# set, fusion is the union + one hash aggregate, and post_filter then
# restricts the FINAL fused hits by its own match set (docs without
# "join") with scores untouched — the contract deviation VERDICT r12
# item 3 flagged (ES allows post_filter with knn) closed.  Exact
# replay: filter → top-k → fusion → post_filter → page.

_KNF_VID = 7
_KNF_K = 20
_KNF_BOOST = 2.0
_KNF_LABEL = 3


def q_dsl_knn_filtered(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.querydsl import search_request

    docs = load_table(spark, sf_dir, "documents")
    emb = load_table(spark, sf_dir, "embeddings")
    qv = emb.filter(F.col("vec_id") == _KNF_VID).select(
        "embedding"
    ).collect()[0]["embedding"]
    return search_request(
        docs,
        {
            "query": {"match": {"terms": [_DSL_MUST]}},
            "size": _DSL_K,
            "post_filter": {"bool": {"must_not": [_DSL_NOT]}},
            "knn": {
                "query_vector": list(qv),
                "k": _KNF_K,
                "boost": _KNF_BOOST,
                "filter": [{"term": {"label": _KNF_LABEL}}],
            },
        },
        vectors=emb,
    )["hits"]


def _dsl_knn_filtered_oracle() -> str:
    from ..operators.retrieval import BM25_B, BM25_K1
    from .vector import _SQL_SQ_L2

    d = _SQL_SQ_L2.format(q="qe.qe", v="v.embedding")
    return f"""
WITH toks AS (SELECT doc_id, {_TOKS} AS w FROM documents),
dl AS (SELECT doc_id AS id, len(w) AS dl FROM toks),
vx AS (SELECT doc_id AS id, UNNEST(w) AS term FROM toks),
tfc AS (SELECT id, term, COUNT(*) AS tf FROM vx
        WHERE term = '{_DSL_MUST}' GROUP BY 1, 2),
stats AS (SELECT COUNT(*) AS n_docs, AVG(CAST(dl AS DOUBLE)) AS avgdl FROM dl),
dfq AS (SELECT term, COUNT(DISTINCT id) AS df FROM tfc GROUP BY 1),
fp AS (
  SELECT tfc.id,
         SUM(LN(1.0 + (s.n_docs - d.df + 0.5) / (d.df + 0.5))
             * (tfc.tf * ({BM25_K1} + 1.0))
             / (tfc.tf + {BM25_K1} * (1.0 - {BM25_B}
                + {BM25_B} * CAST(dl.dl AS DOUBLE) / s.avgdl))) AS score
  FROM tfc
  JOIN dfq d ON d.term = tfc.term
  JOIN dl ON dl.id = tfc.id
  CROSS JOIN stats s
  GROUP BY 1),
qe AS (SELECT embedding AS qe FROM embeddings WHERE vec_id = {_KNF_VID}),
vd AS (SELECT v.vec_id AS id, {d} AS dist FROM embeddings v CROSS JOIN qe
       WHERE v.label = {_KNF_LABEL}),
kt AS (SELECT id, dist FROM (
         SELECT *, ROW_NUMBER() OVER (
           ORDER BY round_even((dist) * 1e6, 0) / 1e6, id) AS rn
         FROM vd)
       WHERE rn <= {_KNF_K}),
contrib AS (
  SELECT id, score AS c FROM fp
  UNION ALL
  SELECT id, {_KNF_BOOST} / (1.0 + dist) FROM kt),
comb AS (SELECT id, ROUND(SUM(c), 6) AS score FROM contrib GROUP BY 1),
pfset AS (SELECT doc_id AS id FROM toks
          WHERE NOT list_contains(w, '{_DSL_NOT}')),
surv AS (SELECT c.id, c.score FROM comb c JOIN pfset p ON p.id = c.id)
SELECT CAST(0 AS BIGINT) AS query_id, id, score, CAST(rnk AS INT) AS rank
FROM (SELECT *, ROW_NUMBER() OVER (ORDER BY score DESC, id) AS rnk FROM surv)
WHERE rnk <= {_DSL_K}
"""


EXTRA_QUERIES["dsl_knn_filtered"] = q_dsl_knn_filtered
EXTRA_ORACLES["dsl_knn_filtered"] = _dsl_knn_filtered_oracle()


# ---------------------------------------------------------------------------
# round 13: bucket-in-bucket sub-aggregations (VERDICT r12 item 3 —
# operators/querydsl._nested_bucket_agg).  ES's most common faceting
# shape, "per source, the language breakdown": a terms agg nested
# inside a terms parent, long-format (value, by_lang, n, avg_chars) —
# ONE hash aggregate over the composite (source, lang) key carrying
# the grandchild metric; the parent's size=5 shaping (top sources by
# TOTAL doc count, desc then key asc) re-aggregates the bucket-sized
# composite output and semi-joins back, never re-scanning the match
# set.  The query restricts to the bool match set first, so the whole
# request path (match set → semi-join → composite aggregate → parent
# shaping) is replayed in one statement.

_NBK_SIZE = 5


def q_dsl_nested_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.querydsl import search_request

    docs = load_table(spark, sf_dir, "documents")
    return search_request(
        docs,
        {
            "query": {"bool": {"must": [_DSL_MUST], "must_not": [_DSL_NOT]}},
            "aggs": {
                "by_source": {
                    "terms": {"field": "source", "size": _NBK_SIZE},
                    "aggs": {
                        "by_lang": {
                            "terms": {"field": "lang"},
                            "aggs": {
                                "avg_chars": {"avg": {"field": "n_chars"}}
                            },
                        }
                    },
                }
            },
        },
    )["aggregations"]["by_source"]


def _dsl_nested_buckets_oracle() -> str:
    return f"""
WITH toks AS (SELECT doc_id, {_TOKS} AS w FROM documents),
adm AS (SELECT doc_id AS id FROM toks
        WHERE list_contains(w, '{_DSL_MUST}')
          AND NOT list_contains(w, '{_DSL_NOT}')),
adocs AS (SELECT * FROM documents WHERE doc_id IN (SELECT id FROM adm)),
comp AS (SELECT source AS value, lang AS by_lang,
                CAST(COUNT(*) AS BIGINT) AS n,
                ROUND(AVG(CAST(n_chars AS DOUBLE)), 6) AS avg_chars
         FROM adocs GROUP BY 1, 2),
keep AS (SELECT value FROM (
           SELECT value, SUM(n) AS tot,
                  ROW_NUMBER() OVER (ORDER BY SUM(n) DESC, value ASC) AS pr
           FROM comp GROUP BY value)
         WHERE pr <= {_NBK_SIZE})
SELECT c.value, c.by_lang, c.n, c.avg_chars
FROM comp c JOIN keep k ON k.value = c.value
"""


EXTRA_QUERIES["dsl_nested_buckets"] = q_dsl_nested_buckets
EXTRA_ORACLES["dsl_nested_buckets"] = _dsl_nested_buckets_oracle()


# ---------------------------------------------------------------------------
# round 13: batch msearch (VERDICT r12 item 4 — operators/querydsl.
# msearch).  THREE heterogeneous requests (a plain match, a bool with
# must + must_not, a bool with minimum_should_match=2) answered
# through ONE multi-query plan with real query_ids — the repo's Q6
# batch-collapse thesis applied to the request front door.  The
# oracle replays the whole batch in one statement: the constraint
# lists as a VALUES relation, one admissibility aggregate over the
# vocabulary-restricted (id, term) pairs, one shared-statistics BM25
# score per (query, doc) restricted to each query's own admissible
# set, and per-request page sizes from the meta VALUES.

_MSR_REQS = [
    {"query": {"match": {"terms": ["vector", "stream"]}}, "size": 10},
    {"query": {"bool": {"must": ["spark", "data"],
                        "must_not": ["join"]}}, "size": 5},
    {"query": {"bool": {"should": ["scan", "sort", "filter"],
                        "minimum_should_match": 2}}, "size": 8},
]


def q_dsl_msearch(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.querydsl import msearch

    docs = load_table(spark, sf_dir, "documents")
    return msearch(docs, _MSR_REQS)["hits"]


def _dsl_msearch_oracle() -> str:
    from ..operators.retrieval import BM25_B, BM25_K1

    return f"""
WITH cons(query_id, term, role) AS (VALUES
  (0, 'vector', 'should'), (0, 'stream', 'should'),
  (1, 'spark', 'must'), (1, 'data', 'must'), (1, 'join', 'not'),
  (2, 'scan', 'should'), (2, 'sort', 'should'), (2, 'filter', 'should')),
qmeta(query_id, nm, ms, k) AS (VALUES (0, 0, 1, 10), (1, 2, 0, 5),
                                      (2, 0, 2, 8)),
toks AS (SELECT doc_id, {_TOKS} AS w FROM documents),
dl AS (SELECT doc_id AS id, len(w) AS dl FROM toks),
vx AS (SELECT doc_id AS id, UNNEST(w) AS term FROM toks),
pairs AS (SELECT DISTINCT id, term FROM vx
          WHERE term IN (SELECT DISTINCT term FROM cons)),
per AS (SELECT c.query_id, p.id,
               COUNT(DISTINCT CASE WHEN c.role = 'must'
                                   THEN c.term END) AS nmh,
               COUNT(DISTINCT CASE WHEN c.role = 'should'
                                   THEN c.term END) AS nsh,
               COUNT(CASE WHEN c.role = 'not' THEN 1 END) AS nnh
        FROM pairs p JOIN cons c USING (term) GROUP BY 1, 2),
adm AS (SELECT per.query_id, per.id
        FROM per JOIN qmeta m USING (query_id)
        WHERE per.nmh = m.nm AND per.nsh >= m.ms AND per.nnh = 0),
qt AS (SELECT DISTINCT query_id, term FROM cons WHERE role <> 'not'),
tfc AS (SELECT id, term, COUNT(*) AS tf FROM vx
        WHERE term IN (SELECT DISTINCT term FROM qt) GROUP BY 1, 2),
stats AS (SELECT COUNT(*) AS n_docs, AVG(CAST(dl AS DOUBLE)) AS avgdl FROM dl),
dfq AS (SELECT term, COUNT(DISTINCT id) AS df FROM tfc GROUP BY 1),
sc AS (
  SELECT q.query_id, tfc.id,
         ROUND(SUM(LN(1.0 + (s.n_docs - d.df + 0.5) / (d.df + 0.5))
             * (tfc.tf * ({BM25_K1} + 1.0))
             / (tfc.tf + {BM25_K1} * (1.0 - {BM25_B}
                + {BM25_B} * CAST(dl.dl AS DOUBLE) / s.avgdl))), 6) AS score
  FROM tfc
  JOIN qt q ON q.term = tfc.term
  JOIN dfq d ON d.term = tfc.term
  JOIN dl ON dl.id = tfc.id
  CROSS JOIN stats s
  WHERE (q.query_id, tfc.id) IN (SELECT (query_id, id) FROM adm)
  GROUP BY 1, 2)
SELECT CAST(query_id AS BIGINT) AS query_id, id, score,
       CAST(rnk AS INT) AS rank
FROM (SELECT sc.*, m.k, ROW_NUMBER() OVER (
        PARTITION BY sc.query_id ORDER BY score DESC, id) AS rnk
      FROM sc JOIN qmeta m USING (query_id))
WHERE rnk <= k
"""


EXTRA_QUERIES["dsl_msearch"] = q_dsl_msearch
EXTRA_ORACLES["dsl_msearch"] = _dsl_msearch_oracle()


# round 13 (cont.): msearch's LABELED aggregations — two requests
# sharing one agg body run as ONE grouped aggregate with query_id in
# the group key (operators/querydsl._msearch_agg); the oracle replays
# both requests' admissible sets and the per-request source counts in
# one statement.

_MSA_REQS = [
    {"query": {"match": {"terms": ["vector", "stream"]}},
     "aggs": {"by_source": {"terms": {"field": "source", "size": 5}}}},
    {"query": {"bool": {"must": ["spark"], "must_not": ["join"]}},
     "aggs": {"by_source": {"terms": {"field": "source", "size": 5}}}},
]


def q_dsl_msearch_aggs(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.querydsl import msearch

    docs = load_table(spark, sf_dir, "documents")
    return msearch(docs, _MSA_REQS)["aggregations"]["by_source"]


def _dsl_msearch_aggs_oracle() -> str:
    return f"""
WITH toks AS (SELECT doc_id, {_TOKS} AS w FROM documents),
adm AS (
  SELECT 0 AS query_id, doc_id AS id FROM toks
  WHERE list_contains(w, 'vector') OR list_contains(w, 'stream')
  UNION ALL
  SELECT 1 AS query_id, doc_id AS id FROM toks
  WHERE list_contains(w, 'spark') AND NOT list_contains(w, 'join')),
comp AS (SELECT a.query_id, d.source AS value,
                CAST(COUNT(*) AS BIGINT) AS n
         FROM adm a JOIN documents d ON d.doc_id = a.id
         GROUP BY 1, 2)
SELECT CAST(query_id AS BIGINT) AS query_id, value, n
FROM (SELECT comp.*, ROW_NUMBER() OVER (
        PARTITION BY query_id ORDER BY n DESC, value ASC) AS r
      FROM comp)
WHERE r <= 5
"""


EXTRA_QUERIES["dsl_msearch_aggs"] = q_dsl_msearch_aggs
EXTRA_ORACLES["dsl_msearch_aggs"] = _dsl_msearch_aggs_oracle()


# ---------------------------------------------------------------------------
# round 13 (cont.): the remaining ES bucket-agg kinds — range /
# filters / missing (operators/querydsl._one_agg).  ES ranges are
# [from, to) and may OVERLAP (a doc lands in every range it
# satisfies), so the bucket key is a map-side MEMBERSHIP ARRAY (one
# when() per range — a request constant), exploded into ONE hash
# aggregate with the sub-agg metric riding along; the oracle replays
# the overlap as a UNION ALL of the range predicates in one
# statement.  Deliberately overlapping bounds (200-400 vs 300-*)
# prove per-range independence.

_RNG_RANGES = ((None, 200.0), (200.0, 400.0), (300.0, None))


def q_dsl_range_aggs(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.querydsl import search_request

    docs = load_table(spark, sf_dir, "documents")
    return search_request(
        docs,
        {
            "query": {"bool": {"must": [_DSL_MUST], "must_not": [_DSL_NOT]}},
            "aggs": {
                "chars": {
                    "range": {
                        "field": "n_chars",
                        "ranges": [
                            {
                                **({} if f is None else {"from": f}),
                                **({} if t is None else {"to": t}),
                            }
                            for f, t in _RNG_RANGES
                        ],
                    },
                    "aggs": {"avg_chars": {"avg": {"field": "n_chars"}}},
                }
            },
        },
    )["aggregations"]["chars"]


def _dsl_range_aggs_oracle() -> str:
    legs = []
    for f, t in _RNG_RANGES:
        key = f"{'*' if f is None else f}-{'*' if t is None else t}"
        conds = ["n_chars IS NOT NULL"]
        if f is not None:
            conds.append(f"CAST(n_chars AS DOUBLE) >= {f}")
        if t is not None:
            conds.append(f"CAST(n_chars AS DOUBLE) < {t}")
        legs.append(
            f"SELECT '{key}' AS key, doc_id, n_chars FROM adocs "
            f"WHERE {' AND '.join(conds)}"
        )
    union = "\nUNION ALL\n".join(legs)
    return f"""
WITH toks AS (SELECT doc_id, {_TOKS} AS w FROM documents),
adm AS (SELECT doc_id AS id FROM toks
        WHERE list_contains(w, '{_DSL_MUST}')
          AND NOT list_contains(w, '{_DSL_NOT}')),
adocs AS (SELECT * FROM documents WHERE doc_id IN (SELECT id FROM adm)),
tagged AS ({union})
SELECT key, CAST(COUNT(*) AS BIGINT) AS n,
       ROUND(AVG(CAST(n_chars AS DOUBLE)), 6) AS avg_chars
FROM tagged GROUP BY key
"""


EXTRA_QUERIES["dsl_range_aggs"] = q_dsl_range_aggs
EXTRA_ORACLES["dsl_range_aggs"] = _dsl_range_aggs_oracle()


# round 13 (cont.): top_hits as a terms sub-aggregation — "per
# source, the 2 longest documents" — delegating to the oracled
# top_hits window operator with the parent field as the bucket key
# (WindowGroupLimit truncates per bucket before the exchange).  The
# oracle replays the per-bucket window in one statement.

_THB_SIZE = 2


def q_dsl_top_hits_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.querydsl import search_request

    docs = load_table(spark, sf_dir, "documents")
    return search_request(
        docs,
        {
            "query": {"bool": {"must": [_DSL_MUST], "must_not": [_DSL_NOT]}},
            "aggs": {
                "longest": {
                    "terms": {"field": "source"},
                    "aggs": {
                        "top": {
                            "top_hits": {
                                "size": _THB_SIZE,
                                "sort": [{"n_chars": "desc"}],
                            }
                        }
                    },
                }
            },
        },
    )["aggregations"]["longest"]


def _dsl_top_hits_buckets_oracle() -> str:
    return f"""
WITH toks AS (SELECT doc_id, {_TOKS} AS w FROM documents),
adm AS (SELECT doc_id AS id FROM toks
        WHERE list_contains(w, '{_DSL_MUST}')
          AND NOT list_contains(w, '{_DSL_NOT}')),
adocs AS (SELECT * FROM documents WHERE doc_id IN (SELECT id FROM adm))
SELECT source AS value, doc_id, n_chars, CAST(rn AS INT) AS rank
FROM (SELECT source, doc_id, n_chars,
             ROW_NUMBER() OVER (PARTITION BY source
                                ORDER BY n_chars DESC, doc_id ASC) AS rn
      FROM adocs)
WHERE rn <= {_THB_SIZE}
"""


EXTRA_QUERIES["dsl_top_hits_buckets"] = q_dsl_top_hits_buckets
EXTRA_ORACLES["dsl_top_hits_buckets"] = _dsl_top_hits_buckets_oracle()


# ---------------------------------------------------------------------------
# round 13 (cont.): dis_max (operators/querydsl.search_dsl) — ES's
# best-clause-wins compound: per doc, max leg score + tie_breaker ×
# the other legs' ("best field wins, near-ties nudge").  Legs here
# are a plain match and a bool with a veto — one UNION of the legs'
# full scored sets + ONE hash aggregate (max + tie·(sum−max)), no
# per-leg join.  The oracle replays both BM25 legs off shared corpus
# statistics and the dis_max combine in one statement.

_DM_TIE = 0.3
_DM_TERMS = ("table", "hash")


def q_dsl_dis_max(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.querydsl import search_dsl

    docs = load_table(spark, sf_dir, "documents")
    return search_dsl(
        docs,
        {
            "dis_max": {
                "queries": [
                    {"match": {"terms": list(_DM_TERMS)}},
                    {"bool": {"must": [_DSL_MUST],
                              "must_not": [_DSL_NOT]}},
                ],
                "tie_breaker": _DM_TIE,
            }
        },
        _DSL_K,
    )


def _dsl_dis_max_oracle() -> str:
    from ..operators.retrieval import BM25_B, BM25_K1

    w_expr = (
        f"LN(1.0 + (s.n_docs - d.df + 0.5) / (d.df + 0.5))"
        f" * (tfc.tf * ({BM25_K1} + 1.0))"
        f" / (tfc.tf + {BM25_K1} * (1.0 - {BM25_B}"
        f" + {BM25_B} * CAST(dl.dl AS DOUBLE) / s.avgdl))"
    )
    return f"""
WITH toks AS (SELECT doc_id, {_TOKS} AS w FROM documents),
dl AS (SELECT doc_id AS id, len(w) AS dl FROM toks),
vx AS (SELECT doc_id AS id, UNNEST(w) AS term FROM toks),
tfc AS (SELECT id, term, COUNT(*) AS tf FROM vx
        WHERE term IN ('{_DM_TERMS[0]}', '{_DM_TERMS[1]}', '{_DSL_MUST}')
        GROUP BY 1, 2),
stats AS (SELECT COUNT(*) AS n_docs, AVG(CAST(dl AS DOUBLE)) AS avgdl FROM dl),
dfq AS (SELECT term, COUNT(DISTINCT id) AS df FROM tfc GROUP BY 1),
leg1 AS (
  SELECT tfc.id, SUM({w_expr}) AS score
  FROM tfc
  JOIN dfq d ON d.term = tfc.term
  JOIN dl ON dl.id = tfc.id
  CROSS JOIN stats s
  WHERE tfc.term IN ('{_DM_TERMS[0]}', '{_DM_TERMS[1]}')
  GROUP BY 1),
adm AS (SELECT doc_id AS id FROM toks
        WHERE list_contains(w, '{_DSL_MUST}')
          AND NOT list_contains(w, '{_DSL_NOT}')),
leg2 AS (
  SELECT tfc.id, SUM({w_expr}) AS score
  FROM tfc
  JOIN dfq d ON d.term = tfc.term
  JOIN dl ON dl.id = tfc.id
  CROSS JOIN stats s
  WHERE tfc.term = '{_DSL_MUST}'
    AND tfc.id IN (SELECT id FROM adm)
  GROUP BY 1),
unioned AS (SELECT * FROM leg1 UNION ALL SELECT * FROM leg2),
comb AS (SELECT id,
                ROUND(MAX(score)
                      + {_DM_TIE} * (SUM(score) - MAX(score)), 6) AS score
         FROM unioned GROUP BY 1)
SELECT CAST(0 AS BIGINT) AS query_id, id, score, CAST(rnk AS INT) AS rank
FROM (SELECT *, ROW_NUMBER() OVER (ORDER BY score DESC, id) AS rnk FROM comb)
WHERE rnk <= {_DSL_K}
"""


EXTRA_QUERIES["dsl_dis_max"] = q_dsl_dis_max
EXTRA_ORACLES["dsl_dis_max"] = _dsl_dis_max_oracle()


# round 13 (cont.): field collapsing through the request front door —
# "size" best hits, at most one per source, EXACT over the full
# scored match set like ES (a collapse of a pre-cut page would lose
# whole groups).  The oracle replays BM25 → round → per-(group)
# window → global re-rank in one statement.

_CLP_K = 10


def q_dsl_collapse_page(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.querydsl import search_request

    docs = load_table(spark, sf_dir, "documents")
    return search_request(
        docs,
        {
            "query": {"match": {"terms": [_DSL_MUST]}},
            "size": _CLP_K,
            "collapse": {"field": "source"},
        },
    )["hits"]


def _dsl_collapse_page_oracle() -> str:
    from ..operators.retrieval import BM25_B, BM25_K1

    return f"""
WITH toks AS (SELECT doc_id, {_TOKS} AS w FROM documents),
dl AS (SELECT doc_id AS id, len(w) AS dl FROM toks),
vx AS (SELECT doc_id AS id, UNNEST(w) AS term FROM toks),
tfc AS (SELECT id, term, COUNT(*) AS tf FROM vx
        WHERE term = '{_DSL_MUST}' GROUP BY 1, 2),
stats AS (SELECT COUNT(*) AS n_docs, AVG(CAST(dl AS DOUBLE)) AS avgdl FROM dl),
dfq AS (SELECT term, COUNT(DISTINCT id) AS df FROM tfc GROUP BY 1),
sc AS (
  SELECT tfc.id,
         ROUND(SUM(LN(1.0 + (s.n_docs - d.df + 0.5) / (d.df + 0.5))
             * (tfc.tf * ({BM25_K1} + 1.0))
             / (tfc.tf + {BM25_K1} * (1.0 - {BM25_B}
                + {BM25_B} * CAST(dl.dl AS DOUBLE) / s.avgdl))), 6) AS score
  FROM tfc
  JOIN dfq d ON d.term = tfc.term
  JOIN dl ON dl.id = tfc.id
  CROSS JOIN stats s
  GROUP BY 1),
grp AS (SELECT sc.id, COALESCE(CAST(d.source AS VARCHAR), 'null') AS "group",
               sc.score
        FROM sc JOIN documents d ON d.doc_id = sc.id),
best AS (SELECT * FROM (
           SELECT grp.*, ROW_NUMBER() OVER (
             PARTITION BY "group" ORDER BY score DESC, id ASC) AS gr
           FROM grp)
         WHERE gr <= 1)
SELECT CAST(0 AS BIGINT) AS query_id, id, "group", score,
       CAST(rnk AS INT) AS rank
FROM (SELECT best.*, ROW_NUMBER() OVER (ORDER BY score DESC, id ASC) AS rnk
      FROM best)
WHERE rnk <= {_CLP_K}
"""


EXTRA_QUERIES["dsl_collapse_page"] = q_dsl_collapse_page
EXTRA_ORACLES["dsl_collapse_page"] = _dsl_collapse_page_oracle()


# ---------------------------------------------------------------------------
# round 13 addendum: the filter agg (ES's single-bucket narrow: "of
# the matches, the long ones — count and average") + the terms
# IN-list filter clause, both through the request front door in one
# row: a bool query whose filter context uses the new terms clause,
# then a filter agg with metric sub-aggs over the match set.

_FAG_MIN_CHARS = 300
_FAG_LANGS = ("en", "de")


def q_dsl_filter_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.querydsl import search_request

    docs = load_table(spark, sf_dir, "documents")
    return search_request(
        docs,
        {
            "query": {"bool": {
                "must": [_DSL_MUST],
                "filter": [{"terms": {"lang": list(_FAG_LANGS)}}],
            }},
            "aggs": {
                "long_docs": {
                    "filter": [
                        {"range": {"n_chars": {"gte": _FAG_MIN_CHARS}}}
                    ],
                    "aggs": {
                        "avg_chars": {"avg": {"field": "n_chars"}},
                        "max_chars": {"max": {"field": "n_chars"}},
                    },
                }
            },
        },
    )["aggregations"]["long_docs"]


def _dsl_filter_agg_oracle() -> str:
    return f"""
WITH toks AS (SELECT doc_id, {_TOKS} AS w, lang, n_chars FROM documents),
adm AS (SELECT doc_id AS id FROM toks
        WHERE lang IN ('{_FAG_LANGS[0]}', '{_FAG_LANGS[1]}')
          AND list_contains(w, '{_DSL_MUST}')),
adocs AS (SELECT * FROM documents WHERE doc_id IN (SELECT id FROM adm))
SELECT CAST(COUNT(*) AS BIGINT) AS n,
       ROUND(AVG(CAST(n_chars AS DOUBLE)), 6) AS avg_chars,
       ROUND(MAX(CAST(n_chars AS DOUBLE)), 6) AS max_chars
FROM adocs WHERE n_chars >= {_FAG_MIN_CHARS}
"""


EXTRA_QUERIES["dsl_filter_agg"] = q_dsl_filter_agg
EXTRA_ORACLES["dsl_filter_agg"] = _dsl_filter_agg_oracle()


# round 13 addendum (cont.): min_score — the ES score floor.  Every
# scored page is rank-ordered by score desc, so the floor keeps a
# PREFIX of ranks (no re-rank needed — asserted in tests); with
# track_total_hits the total counts the score-qualified set, the ES
# contract.  One replay: BM25, round, floor, rank, page.

_MSC_FLOOR = 1.0


def q_dsl_min_score_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.querydsl import search_request

    docs = load_table(spark, sf_dir, "documents")
    return search_request(
        docs,
        {
            "query": {"match": {"terms": [_DSL_MUST]}},
            "size": _DSL_K,
            "min_score": _MSC_FLOOR,
        },
    )["hits"]


def _dsl_min_score_oracle() -> str:
    from ..operators.retrieval import BM25_B, BM25_K1

    return f"""
WITH toks AS (SELECT doc_id, {_TOKS} AS w FROM documents),
dl AS (SELECT doc_id AS id, len(w) AS dl FROM toks),
vx AS (SELECT doc_id AS id, UNNEST(w) AS term FROM toks),
tfc AS (SELECT id, term, COUNT(*) AS tf FROM vx
        WHERE term = '{_DSL_MUST}' GROUP BY 1, 2),
stats AS (SELECT COUNT(*) AS n_docs, AVG(CAST(dl AS DOUBLE)) AS avgdl FROM dl),
dfq AS (SELECT term, COUNT(DISTINCT id) AS df FROM tfc GROUP BY 1),
sc AS (
  SELECT tfc.id,
         ROUND(SUM(LN(1.0 + (s.n_docs - d.df + 0.5) / (d.df + 0.5))
             * (tfc.tf * ({BM25_K1} + 1.0))
             / (tfc.tf + {BM25_K1} * (1.0 - {BM25_B}
                + {BM25_B} * CAST(dl.dl AS DOUBLE) / s.avgdl))), 6) AS score
  FROM tfc
  JOIN dfq d ON d.term = tfc.term
  JOIN dl ON dl.id = tfc.id
  CROSS JOIN stats s
  GROUP BY 1)
SELECT CAST(0 AS BIGINT) AS query_id, id, score, CAST(rnk AS INT) AS rank
FROM (SELECT *, ROW_NUMBER() OVER (ORDER BY score DESC, id) AS rnk FROM sc)
WHERE rnk <= {_DSL_K} AND score >= {_MSC_FLOOR}
"""


EXTRA_QUERIES["dsl_min_score_topk"] = q_dsl_min_score_topk
EXTRA_ORACLES["dsl_min_score_topk"] = _dsl_min_score_oracle()


# round 13 addendum (cont.): boxplot + percentile_ranks over the
# match set — the ES distribution verbs completing the metric family
# (quartiles = quantile_cont linear interpolation, the percentiles
# tier convention; percentile_ranks is a counting ratio and therefore
# its own oracle tier).  One request, two frames; this row carries
# the boxplot half (percentile_ranks shares the replay shape and is
# pytest-covered).


def q_dsl_boxplot(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.querydsl import search_request

    docs = load_table(spark, sf_dir, "documents")
    return search_request(
        docs,
        {
            "query": {"bool": {"must": [_DSL_MUST], "must_not": [_DSL_NOT]}},
            "aggs": {"chars_box": {"boxplot": {"field": "n_chars"}}},
        },
    )["aggregations"]["chars_box"]


def _dsl_boxplot_oracle() -> str:
    return f"""
WITH toks AS (SELECT doc_id, {_TOKS} AS w FROM documents),
adm AS (SELECT doc_id AS id FROM toks
        WHERE list_contains(w, '{_DSL_MUST}')
          AND NOT list_contains(w, '{_DSL_NOT}')),
v AS (SELECT CAST(n_chars AS DOUBLE) AS x FROM documents
      WHERE doc_id IN (SELECT id FROM adm))
SELECT ROUND(MIN(x), 6) AS min_v,
       ROUND(quantile_cont(x, 0.25), 6) AS q1,
       ROUND(quantile_cont(x, 0.5), 6) AS q2,
       ROUND(quantile_cont(x, 0.75), 6) AS q3,
       ROUND(MAX(x), 6) AS max_v
FROM v
"""


EXTRA_QUERIES["dsl_boxplot"] = q_dsl_boxplot
EXTRA_ORACLES["dsl_boxplot"] = _dsl_boxplot_oracle()


# round 13 addendum (cont.): the sampler agg — "what do the BEST
# matches look like": metric sub-aggs over only the top-shard_size
# scored docs of the match set (the exact global version of ES's
# per-shard heuristic).  The oracle replays BM25 → round → top-N cut
# → metrics in one statement.

_SMP_N = 25


def q_dsl_sampler_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.querydsl import search_request

    docs = load_table(spark, sf_dir, "documents")
    return search_request(
        docs,
        {
            "query": {"match": {"terms": [_DSL_MUST]}},
            "aggs": {
                "best": {
                    "sampler": {"shard_size": _SMP_N},
                    "aggs": {
                        "avg_chars": {"avg": {"field": "n_chars"}},
                        "n_sources": {"cardinality": {"field": "source"}},
                    },
                }
            },
        },
    )["aggregations"]["best"]


def _dsl_sampler_oracle() -> str:
    from ..operators.retrieval import BM25_B, BM25_K1

    return f"""
WITH toks AS (SELECT doc_id, {_TOKS} AS w FROM documents),
dl AS (SELECT doc_id AS id, len(w) AS dl FROM toks),
vx AS (SELECT doc_id AS id, UNNEST(w) AS term FROM toks),
tfc AS (SELECT id, term, COUNT(*) AS tf FROM vx
        WHERE term = '{_DSL_MUST}' GROUP BY 1, 2),
stats AS (SELECT COUNT(*) AS n_docs, AVG(CAST(dl AS DOUBLE)) AS avgdl FROM dl),
dfq AS (SELECT term, COUNT(DISTINCT id) AS df FROM tfc GROUP BY 1),
sc AS (
  SELECT tfc.id,
         ROUND(SUM(LN(1.0 + (s.n_docs - d.df + 0.5) / (d.df + 0.5))
             * (tfc.tf * ({BM25_K1} + 1.0))
             / (tfc.tf + {BM25_K1} * (1.0 - {BM25_B}
                + {BM25_B} * CAST(dl.dl AS DOUBLE) / s.avgdl))), 6) AS score
  FROM tfc
  JOIN dfq d ON d.term = tfc.term
  JOIN dl ON dl.id = tfc.id
  CROSS JOIN stats s
  GROUP BY 1),
top AS (SELECT id FROM (
          SELECT id, ROW_NUMBER() OVER (ORDER BY score DESC, id) AS rn
          FROM sc)
        WHERE rn <= {_SMP_N})
SELECT CAST(COUNT(*) AS BIGINT) AS n,
       ROUND(AVG(CAST(n_chars AS DOUBLE)), 6) AS avg_chars,
       CAST(COUNT(DISTINCT source) AS BIGINT) AS n_sources
FROM documents WHERE doc_id IN (SELECT id FROM top)
"""


EXTRA_QUERIES["dsl_sampler_agg"] = q_dsl_sampler_agg
EXTRA_ORACLES["dsl_sampler_agg"] = _dsl_sampler_oracle()


# round 13 addendum (cont.): multi_terms — terms over a COMPOSITE of
# fields ("per (source, lang)") in one hash aggregate on the field
# tuple, the ES order contract (count desc, key tuple asc) applied to
# bucket-count-sized output only.

_MTR_SIZE = 8


def q_dsl_multi_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.querydsl import search_request

    docs = load_table(spark, sf_dir, "documents")
    return search_request(
        docs,
        {
            "query": {"bool": {"must": [_DSL_MUST], "must_not": [_DSL_NOT]}},
            "aggs": {
                "sl": {
                    "multi_terms": {
                        "terms": [{"field": "source"}, {"field": "lang"}],
                        "size": _MTR_SIZE,
                    },
                    "aggs": {"avg_chars": {"avg": {"field": "n_chars"}}},
                }
            },
        },
    )["aggregations"]["sl"]


def _dsl_multi_terms_oracle() -> str:
    return f"""
WITH toks AS (SELECT doc_id, {_TOKS} AS w FROM documents),
adm AS (SELECT doc_id AS id FROM toks
        WHERE list_contains(w, '{_DSL_MUST}')
          AND NOT list_contains(w, '{_DSL_NOT}')),
adocs AS (SELECT * FROM documents WHERE doc_id IN (SELECT id FROM adm)),
comp AS (SELECT source, lang, CAST(COUNT(*) AS BIGINT) AS n,
                ROUND(AVG(CAST(n_chars AS DOUBLE)), 6) AS avg_chars
         FROM adocs GROUP BY 1, 2)
SELECT source, lang, n, avg_chars
FROM (SELECT comp.*, ROW_NUMBER() OVER (
        ORDER BY n DESC, source ASC, lang ASC) AS r FROM comp)
WHERE r <= {_MTR_SIZE}
"""


EXTRA_QUERIES["dsl_multi_terms"] = q_dsl_multi_terms
EXTRA_ORACLES["dsl_multi_terms"] = _dsl_multi_terms_oracle()


# round 13 addendum (cont.): pipeline aggs through the request — a
# histogram over n_chars with cum_sum / derivative / moving_avg
# appended by the oracled pipeline_aggs operator (ordered windows over
# the BUCKET-sized series; a global series is one partition by
# construction).  Full replay: match set → buckets → window columns.

_PLH_WIDTH = 100.0
_PLH_WIN = 3


def q_dsl_pipeline_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.querydsl import search_request

    docs = load_table(spark, sf_dir, "documents")
    return search_request(
        docs,
        {
            "query": {"bool": {"must": [_DSL_MUST], "must_not": [_DSL_NOT]}},
            "aggs": {
                "h": {
                    "histogram": {"field": "n_chars",
                                  "interval": _PLH_WIDTH},
                    "pipeline": {"window": _PLH_WIN},
                }
            },
        },
    )["aggregations"]["h"]


def _dsl_pipeline_histogram_oracle() -> str:
    return f"""
WITH toks AS (SELECT doc_id, {_TOKS} AS w FROM documents),
adm AS (SELECT doc_id AS id FROM toks
        WHERE list_contains(w, '{_DSL_MUST}')
          AND NOT list_contains(w, '{_DSL_NOT}')),
adocs AS (SELECT * FROM documents WHERE doc_id IN (SELECT id FROM adm)
            AND n_chars IS NOT NULL),
b AS (SELECT FLOOR(CAST(n_chars AS DOUBLE) / {_PLH_WIDTH}) * {_PLH_WIDTH}
               AS bucket,
             CAST(COUNT(*) AS BIGINT) AS count
      FROM adocs GROUP BY 1)
SELECT bucket, count,
       ROUND(SUM(CAST(count AS DOUBLE)) OVER (
         ORDER BY bucket ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
         6) AS cum_sum,
       ROUND(CAST(count AS DOUBLE) - LAG(CAST(count AS DOUBLE), 1) OVER (
         ORDER BY bucket), 6) AS deriv,
       ROUND(AVG(CAST(count AS DOUBLE)) OVER (
         ORDER BY bucket ROWS BETWEEN {_PLH_WIN - 1} PRECEDING
         AND CURRENT ROW), 6) AS moving_avg
FROM b
"""


EXTRA_QUERIES["dsl_pipeline_histogram"] = q_dsl_pipeline_histogram
EXTRA_ORACLES["dsl_pipeline_histogram"] = _dsl_pipeline_histogram_oracle()


# round 13 addendum (cont.): match_phrase_prefix — search-as-you-type
# (operators/phrase.phrase_prefix_topk).  The last phrase element is a
# PREFIX completed to the alphabetically-first max_expansions
# vocabulary terms (the Lucene term-dictionary contract); the
# disjunction rides the exact anchor intersection unchanged because
# one document position holds one token and so matches at most one
# completion.  Queries are corpus-derived (2 fixed tokens + the third
# token's 3-char prefix); the oracle replays vocabulary → ranked
# expansion → slot union → anchor votes in one statement.

_PPX_PRED = "doc_id % 100 = 17"
_PPX_K = 5
_PPX_EXP = 5


def q_phrase_prefix_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions.text import tokens
    from ..operators.phrase import phrase_prefix_topk

    docs = load_table(spark, sf_dir, "documents")
    q = (
        docs.select(
            F.col("doc_id").alias("query_id"), tokens("text").alias("w")
        )
        .filter(F.expr(_PPX_PRED.replace("doc_id", "query_id")))
        .filter(F.size("w") >= 3)
        .select(
            "query_id",
            F.array(
                F.col("w")[0],
                F.col("w")[1],
                F.substring(F.col("w")[2], 1, 3),
            ).alias("phrase"),
        )
    )
    return phrase_prefix_topk(docs, q, _PPX_K, max_expansions=_PPX_EXP)


def _phrase_prefix_oracle() -> str:
    return f"""
WITH toks AS (SELECT doc_id, {_TOKS} AS w FROM documents),
qs AS (SELECT doc_id AS query_id, w[1] AS t1, w[2] AS t2,
              substr(w[3], 1, 3) AS pfx
       FROM toks WHERE {_PPX_PRED} AND len(w) >= 3),
vocab AS (SELECT DISTINCT term FROM
            (SELECT UNNEST(w) AS term FROM toks)),
exp AS (SELECT query_id, term FROM (
          SELECT q.query_id, v.term,
                 ROW_NUMBER() OVER (PARTITION BY q.query_id
                                    ORDER BY v.term ASC) AS r
          FROM qs q JOIN vocab v ON starts_with(v.term, q.pfx))
        WHERE r <= {_PPX_EXP}),
qslot AS (SELECT query_id, 1 AS slot, t1 AS term FROM qs
          UNION ALL SELECT query_id, 2, t2 FROM qs
          UNION ALL SELECT query_id, 3, term FROM exp),
px AS (SELECT doc_id AS id, w, UNNEST(range(1, len(w) + 1)) AS pos FROM toks),
tp AS (SELECT id, pos, w[pos] AS term FROM px),
hit AS (SELECT q.query_id, t.id, q.slot, t.pos - q.slot AS anchor
        FROM qslot q JOIN tp t USING (term)),
anch AS (SELECT query_id, id, anchor, COUNT(*) AS ns
         FROM hit GROUP BY 1, 2, 3),
pf AS (SELECT query_id, id, COUNT(*) AS phrase_tf
       FROM anch WHERE ns = 3 GROUP BY 1, 2)
SELECT query_id, id, phrase_tf, rank FROM (
  SELECT *, CAST(ROW_NUMBER() OVER (PARTITION BY query_id
                                    ORDER BY phrase_tf DESC, id) AS INT)
              AS rank
  FROM pf)
WHERE rank <= {_PPX_K}
"""


EXTRA_QUERIES["phrase_prefix_topk"] = q_phrase_prefix_topk
EXTRA_ORACLES["phrase_prefix_topk"] = _phrase_prefix_oracle()


# ---------------------------------------------------------------------------
# round 12: bool FILTER CONTEXT (operators/querydsl._filter_predicate)
# — ES's unscored metadata clauses (range / term / exists) ANDed into
# the bool admissible set; surviving docs keep corpus-level BM25
# scores (the filtered-search contract), and the predicate pushes to
# the parquet scan (plan-tested).


def q_dsl_bool_filter_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.querydsl import search_dsl

    docs = load_table(spark, sf_dir, "documents")
    return search_dsl(
        docs,
        {"bool": {
            "must": [_DSL_MUST],
            "must_not": [_DSL_NOT],
            "filter": [
                {"range": {"n_chars": {"gte": 150, "lt": 450}}},
                {"term": {"lang": "en"}},
                {"exists": {"field": "source"}},
            ],
        }},
        _DSL_K,
    )


def _dsl_bool_filter_oracle() -> str:
    from ..operators.retrieval import BM25_B, BM25_K1

    return f"""
WITH toks AS (SELECT doc_id, {_TOKS} AS w FROM documents),
meta AS (SELECT doc_id AS id FROM documents
         WHERE n_chars >= 150 AND n_chars < 450
           AND lang = 'en' AND source IS NOT NULL),
adm AS (SELECT doc_id AS id FROM toks
        WHERE list_contains(w, '{_DSL_MUST}')
          AND NOT list_contains(w, '{_DSL_NOT}')
          AND doc_id IN (SELECT id FROM meta)),
dl AS (SELECT doc_id AS id, len(w) AS dl FROM toks),
vx AS (SELECT doc_id AS id, UNNEST(w) AS term FROM toks),
tfc AS (SELECT id, term, COUNT(*) AS tf FROM vx
        WHERE term = '{_DSL_MUST}' GROUP BY 1, 2),
stats AS (SELECT COUNT(*) AS n_docs, AVG(CAST(dl AS DOUBLE)) AS avgdl FROM dl),
dfq AS (SELECT term, COUNT(DISTINCT id) AS df FROM tfc GROUP BY 1),
ds_scored AS (
  SELECT CAST(0 AS BIGINT) AS query_id, tfc.id,
         SUM(LN(1.0 + (s.n_docs - d.df + 0.5) / (d.df + 0.5))
             * (tfc.tf * ({BM25_K1} + 1.0))
             / (tfc.tf + {BM25_K1} * (1.0 - {BM25_B}
                + {BM25_B} * CAST(dl.dl AS DOUBLE) / s.avgdl))) AS score
  FROM tfc
  JOIN dfq d ON d.term = tfc.term
  JOIN dl ON dl.id = tfc.id
  CROSS JOIN stats s
  WHERE tfc.id IN (SELECT id FROM adm)
  GROUP BY 1, 2),
ds_ranked AS (
  SELECT query_id, id, score6,
         CAST(ROW_NUMBER() OVER (PARTITION BY query_id
                                 ORDER BY score6 DESC, id) AS INT) AS drk
  FROM (SELECT query_id, id, ROUND(score, 6) AS score6 FROM ds_scored))
SELECT query_id, id, score6 AS score, drk AS rank
FROM ds_ranked WHERE drk <= {_DSL_K}
"""


EXTRA_QUERIES["dsl_bool_filter_topk"] = q_dsl_bool_filter_topk
EXTRA_ORACLES["dsl_bool_filter_topk"] = _dsl_bool_filter_oracle()


# ---------------------------------------------------------------------------
# round 12: token-budget packing (operators/sampling.budget_pack) —
# the corpus-budgeting step: per source, keep the best-quality docs
# (quality_score, id tiebreak) while the running token total stays
# within the budget.  Window cum-sum replay; prefix semantics (an
# over-budget doc blocks everything behind it).

_BP_BUDGET = 800


def q_budget_pack_by_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.sampling import budget_pack

    docs = load_table(spark, sf_dir, "documents")
    prepared = docs.select(
        "doc_id",
        "source",
        token_count("text").alias("n_tokens"),
        quality_score("text").alias("quality"),
    )
    return budget_pack(
        prepared, _BP_BUDGET,
        priority_col="quality", tokens_col="n_tokens", by=("source",),
    )


def _budget_pack_oracle() -> str:
    return f"""
WITH t AS (
  SELECT doc_id, source, {_TOKS} AS w, list_distinct({_TOKS}) AS dw, text
  FROM documents
),
m AS (
  SELECT doc_id, source, CAST(len(w) AS INT) AS n_tokens,
    CASE WHEN len(dw) = 0 THEN 0.0
         ELSE CAST(len(list_intersect(dw, [{_EN_STOP}])) AS DOUBLE) / CAST(len(dw) AS DOUBLE)
    END AS stop_ratio,
    CASE WHEN length(text) = 0 THEN 0.0
         ELSE CAST(length(text) - length(regexp_replace(text, '[0-9]', '', 'g')) AS DOUBLE)
              / CAST(length(text) AS DOUBLE)
    END AS dig_ratio
  FROM t
),
q AS (
  SELECT doc_id, source, n_tokens,
         ROUND(LEAST(CAST(n_tokens AS DOUBLE), 300.0) / 300.0 * 0.2
               + stop_ratio * 0.5 + (1.0 - dig_ratio) * 0.3, 6) AS quality
  FROM m
),
c AS (
  SELECT doc_id, source, n_tokens, quality,
         SUM(CAST(n_tokens AS BIGINT)) OVER (
           PARTITION BY source ORDER BY quality DESC, doc_id ASC
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_tokens
  FROM q
)
SELECT doc_id, source, n_tokens, quality, cum_tokens
FROM c WHERE cum_tokens <= {_BP_BUDGET}
"""


EXTRA_QUERIES["budget_pack_by_source"] = q_budget_pack_by_source
EXTRA_ORACLES["budget_pack_by_source"] = _budget_pack_oracle()


# ---------------------------------------------------------------------------
# round 12 (close rotation): promote the six round-12 flagships into
# the driver window — dsl_query_aggs (VERDICT item 2: query + aggs +
# post_filter in one request), phrase_slop_topk (item 3: sloppy
# phrase), percolate_stream_store (item 9: the push pipeline across
# checkpoint restarts), dsl_rescore_topk (two-pass phrase rescore),
# dsl_knn_hybrid (ES 8 text+vector fusion), dsl_bool_filter_topk
# (metadata filter context).  Demote six long-green rows whose
# families keep driver coverage: bm25_mlt_topk / bm25_prf_topk (query
# understanding keeps spell_suggest + bm25_wildcard_topk),
# bm25_sig_terms (analytics keeps events_percentiles /
# events_date_histogram / docs_composite_page2), doc_facets (faceting
# keeps dsl_query_aggs' terms agg + events_date_histogram),
# events_top_hits (the metric-agg family keeps two driver rows), and
# sparse_rescore_topk (sparse keeps store/engine/champion/synonym).
# Every demoted row keeps the IDENTICAL DuckDB comparison in the
# pytest tier.
for _name in (
    "dsl_query_aggs",
    "phrase_slop_topk",
    "percolate_stream_store",
    "dsl_rescore_topk",
    "dsl_knn_hybrid",
    "dsl_bool_filter_topk",
):
    QUERIES[_name] = EXTRA_QUERIES.pop(_name)
    ORACLES[_name] = EXTRA_ORACLES.pop(_name)
for _name in (
    "bm25_mlt_topk",
    "bm25_prf_topk",
    "bm25_sig_terms",
    "doc_facets",
    "events_top_hits",
    "sparse_rescore_topk",
):
    EXTRA_QUERIES[_name] = QUERIES.pop(_name)
    EXTRA_ORACLES[_name] = ORACLES.pop(_name)
del _name


# ---------------------------------------------------------------------------
# round 12 (post-close): minimum_should_match (operators/boolean.
# _combine min_should) — ES's "at least N of these" contract: the
# should clause becomes a >= N distinct-matched-terms aggregate (the
# all_of machinery generalized), unsatisfiable N returns nothing,
# ranking unchanged (BM25 over the positive terms restricted to the
# stricter set — corpus-level statistics as always).

_MSM_TERMS = ("vector", "stream", "hash")


def q_dsl_min_should_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.querydsl import search_dsl

    docs = load_table(spark, sf_dir, "documents")
    return search_dsl(
        docs,
        {"bool": {"should": list(_MSM_TERMS), "minimum_should_match": 2}},
        _DSL_K,
    )


def _dsl_min_should_oracle() -> str:
    from ..operators.retrieval import BM25_B, BM25_K1

    terms_sql = ", ".join(f"'{t}'" for t in sorted(_MSM_TERMS))
    return f"""
WITH toks AS (SELECT doc_id, {_TOKS} AS w FROM documents),
adm AS (SELECT id FROM (
          SELECT doc_id AS id, COUNT(DISTINCT term) AS ns
          FROM (SELECT doc_id, UNNEST(list_distinct(w)) AS term FROM toks)
          WHERE term IN ({terms_sql})
          GROUP BY 1)
        WHERE ns >= 2),
dl AS (SELECT doc_id AS id, len(w) AS dl FROM toks),
vx AS (SELECT doc_id AS id, UNNEST(w) AS term FROM toks),
tfc AS (SELECT id, term, COUNT(*) AS tf FROM vx
        WHERE term IN ({terms_sql}) GROUP BY 1, 2),
stats AS (SELECT COUNT(*) AS n_docs, AVG(CAST(dl AS DOUBLE)) AS avgdl FROM dl),
dfq AS (SELECT term, COUNT(DISTINCT id) AS df FROM tfc GROUP BY 1),
ds_scored AS (
  SELECT CAST(0 AS BIGINT) AS query_id, tfc.id,
         SUM(LN(1.0 + (s.n_docs - d.df + 0.5) / (d.df + 0.5))
             * (tfc.tf * ({BM25_K1} + 1.0))
             / (tfc.tf + {BM25_K1} * (1.0 - {BM25_B}
                + {BM25_B} * CAST(dl.dl AS DOUBLE) / s.avgdl))) AS score
  FROM tfc
  JOIN dfq d ON d.term = tfc.term
  JOIN dl ON dl.id = tfc.id
  CROSS JOIN stats s
  WHERE tfc.id IN (SELECT id FROM adm)
  GROUP BY 1, 2),
ds_ranked AS (
  SELECT query_id, id, score6,
         CAST(ROW_NUMBER() OVER (PARTITION BY query_id
                                 ORDER BY score6 DESC, id) AS INT) AS drk
  FROM (SELECT query_id, id, ROUND(score, 6) AS score6 FROM ds_scored))
SELECT query_id, id, score6 AS score, drk AS rank
FROM ds_ranked WHERE drk <= {_DSL_K}
"""


EXTRA_QUERIES["dsl_min_should_topk"] = q_dsl_min_should_topk
EXTRA_ORACLES["dsl_min_should_topk"] = _dsl_min_should_oracle()


# ---------------------------------------------------------------------------
# round 12 (post-close): multi_match (querydsl) — the same terms
# scored against several text fields, each with its OWN corpus
# statistics and a ^boost; best_fields takes the best single field
# per doc.  The fixture has one text column, so the row synthesizes
# the classic second field — a title (the doc's first five tokens) —
# exactly reproducible in SQL via list_slice.

_MM_TERMS = ("spark", "table")
_MM_TITLE_N = 5


def q_dsl_multi_match_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions.text import tokens as _tokens
    from ..operators.querydsl import search_dsl

    docs = load_table(spark, sf_dir, "documents").withColumn(
        "title", F.array_join(F.slice(_tokens("text"), 1, _MM_TITLE_N), " ")
    )
    return search_dsl(
        docs,
        {"multi_match": {"terms": list(_MM_TERMS),
                         "fields": ["title^2", "text"],
                         "type": "best_fields"}},
        _DSL_K,
    )


def _dsl_multi_match_oracle() -> str:
    from ..operators.retrieval import BM25_B, BM25_K1

    terms_sql = ", ".join(f"'{t}'" for t in sorted(_MM_TERMS))

    def leg(ctes_prefix: str, wexpr: str, weight: float) -> str:
        p = ctes_prefix
        return f"""
{p}tk AS (SELECT doc_id, {wexpr} AS w FROM toks),
{p}dl AS (SELECT doc_id AS id, len(w) AS dl FROM {p}tk),
{p}vx AS (SELECT doc_id AS id, UNNEST(w) AS term FROM {p}tk),
{p}tf AS (SELECT id, term, COUNT(*) AS tf FROM {p}vx
          WHERE term IN ({terms_sql}) GROUP BY 1, 2),
{p}st AS (SELECT COUNT(*) AS n_docs, AVG(CAST(dl AS DOUBLE)) AS avgdl
          FROM {p}dl),
{p}df AS (SELECT term, COUNT(DISTINCT id) AS df FROM {p}tf GROUP BY 1),
{p}sc AS (
  SELECT t.id,
         {weight} * SUM(LN(1.0 + (s.n_docs - d.df + 0.5) / (d.df + 0.5))
             * (t.tf * ({BM25_K1} + 1.0))
             / (t.tf + {BM25_K1} * (1.0 - {BM25_B}
                + {BM25_B} * CAST(l.dl AS DOUBLE) / s.avgdl))) AS c
  FROM {p}tf t
  JOIN {p}df d ON d.term = t.term
  JOIN {p}dl l ON l.id = t.id
  CROSS JOIN {p}st s
  GROUP BY 1)"""

    return f"""
WITH toks AS (SELECT doc_id, {_TOKS} AS w FROM documents),
{leg("t_", f"list_slice(w, 1, {_MM_TITLE_N})", 2.0)},
{leg("b_", "w", 1.0)},
allc AS (SELECT id, c FROM t_sc UNION ALL SELECT id, c FROM b_sc),
comb AS (SELECT id, ROUND(MAX(c), 6) AS score FROM allc GROUP BY 1)
SELECT CAST(0 AS BIGINT) AS query_id, id, score, CAST(rnk AS INT) AS rank
FROM (SELECT *, ROW_NUMBER() OVER (ORDER BY score DESC, id) AS rnk FROM comb)
WHERE rnk <= {_DSL_K}
"""


EXTRA_QUERIES["dsl_multi_match_topk"] = q_dsl_multi_match_topk
EXTRA_ORACLES["dsl_multi_match_topk"] = _dsl_multi_match_oracle()


# ---------------------------------------------------------------------------
# round 12 (post-close): constant_score (querydsl) — filter-context
# matching with relevance off: every admitted doc scores exactly
# `boost`, ties resolve on id, so the page is the admissible set's
# first k ids.


def q_dsl_constant_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.querydsl import search_dsl

    docs = load_table(spark, sf_dir, "documents")
    return search_dsl(
        docs,
        {"constant_score": {
            "filter": {"bool": {"must": [_DSL_MUST], "must_not": [_DSL_NOT]}},
            "boost": 1.5,
        }},
        _DSL_K,
    )


def _dsl_constant_score_oracle() -> str:
    return f"""
WITH toks AS (SELECT doc_id, {_TOKS} AS w FROM documents),
adm AS (SELECT doc_id AS id FROM toks
        WHERE list_contains(w, '{_DSL_MUST}')
          AND NOT list_contains(w, '{_DSL_NOT}'))
SELECT CAST(0 AS BIGINT) AS query_id, id, CAST(1.5 AS DOUBLE) AS score,
       CAST(rnk AS INT) AS rank
FROM (SELECT id, ROW_NUMBER() OVER (ORDER BY id) AS rnk FROM adm)
WHERE rnk <= {_DSL_K}
"""


EXTRA_QUERIES["dsl_constant_score"] = q_dsl_constant_score
EXTRA_ORACLES["dsl_constant_score"] = _dsl_constant_score_oracle()


# ---------------------------------------------------------------------------
# round 12 (post-close): INDEXED analyzed retrieval — the index-time
# analysis chain actually hitting a persisted index: the posting index
# is WRITTEN over the stop+stem-analyzed text (that is what
# "index-time" means operationally), pluralized queries are analyzed
# query-side, and the unmodified indexed BM25 serves.  By the index's
# exactness contract the results equal the from-scratch analyzed row,
# so the row SHARES bm25_stemmed_topk's oracle verbatim (the
# bm25_index_topk / phrase_index_topk precedent).

_STEM_IDX_STATE: dict[str, str] = {}


def _stemmed_posting_index(spark: SparkSession, sf_dir: str) -> str:
    import os as _os
    import tempfile

    from ..functions.analysis import STOPWORDS_EN, analyze_text
    from ..sources.posting_index import write_posting_index

    path = _STEM_IDX_STATE.get(sf_dir)
    if path is None:
        name = _os.path.basename(_os.path.normpath(sf_dir)) or "sf"
        path = _os.path.join(
            tempfile.gettempdir(), f"dvss_spark_stemidx_{_os.getpid()}", name
        )
        analyzed = load_table(spark, sf_dir, "documents").withColumn(
            "text", analyze_text("text", stopwords=STOPWORDS_EN, stem=True)
        )
        write_posting_index(analyzed, path)
        _STEM_IDX_STATE[sf_dir] = path
    return path


def q_bm25_stemmed_index_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions.analysis import s_stem
    from ..functions.text import tokens as _tokens
    from ..sources.posting_index import bm25_search_index

    docs = load_table(spark, sf_dir, "documents")
    q = docs.filter(F.expr(_STEM_QPRED)).select(
        F.col("doc_id").alias("query_id"),
        F.transform(
            F.array_distinct(F.slice(_tokens("text"), 1, 3)),
            lambda t: s_stem(F.concat(t, F.lit("s"))),
        ).alias("qterms"),
    )
    return bm25_search_index(
        spark, _stemmed_posting_index(spark, sf_dir), q, _HYBRID_K
    )


EXTRA_QUERIES["bm25_stemmed_index_topk"] = q_bm25_stemmed_index_topk
EXTRA_ORACLES["bm25_stemmed_index_topk"] = _bm25_stemmed_oracle()


# ---------------------------------------------------------------------------
# round 12 (post-close): doc-value fields + offset pagination on the
# request path — hits carry requested metadata columns (hit ids
# broadcast-semi-restrict the pruned attribute scan, the collapse
# discipline) and `from` slices the global ranking (ranks 6..15 here).


def q_dsl_fields_page(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.querydsl import search_request

    docs = load_table(spark, sf_dir, "documents")
    return search_request(
        docs,
        {"query": {"bool": {"must": [_DSL_MUST], "must_not": [_DSL_NOT]}},
         "size": _DSL_K, "from": 5,
         "fields": ["source", "n_chars"]},
    )["hits"]


def _dsl_fields_page_oracle() -> str:
    from ..operators.retrieval import BM25_B, BM25_K1

    return f"""
WITH toks AS (SELECT doc_id, {_TOKS} AS w FROM documents),
adm AS (SELECT doc_id AS id FROM toks
        WHERE list_contains(w, '{_DSL_MUST}')
          AND NOT list_contains(w, '{_DSL_NOT}')),
dl AS (SELECT doc_id AS id, len(w) AS dl FROM toks),
vx AS (SELECT doc_id AS id, UNNEST(w) AS term FROM toks),
tfc AS (SELECT id, term, COUNT(*) AS tf FROM vx
        WHERE term = '{_DSL_MUST}' GROUP BY 1, 2),
stats AS (SELECT COUNT(*) AS n_docs, AVG(CAST(dl AS DOUBLE)) AS avgdl FROM dl),
dfq AS (SELECT term, COUNT(DISTINCT id) AS df FROM tfc GROUP BY 1),
ds_scored AS (
  SELECT CAST(0 AS BIGINT) AS query_id, tfc.id,
         SUM(LN(1.0 + (s.n_docs - d.df + 0.5) / (d.df + 0.5))
             * (tfc.tf * ({BM25_K1} + 1.0))
             / (tfc.tf + {BM25_K1} * (1.0 - {BM25_B}
                + {BM25_B} * CAST(dl.dl AS DOUBLE) / s.avgdl))) AS score
  FROM tfc
  JOIN dfq d ON d.term = tfc.term
  JOIN dl ON dl.id = tfc.id
  CROSS JOIN stats s
  WHERE tfc.id IN (SELECT id FROM adm)
  GROUP BY 1, 2),
ds_ranked AS (
  SELECT query_id, id, score6,
         CAST(ROW_NUMBER() OVER (PARTITION BY query_id
                                 ORDER BY score6 DESC, id) AS INT) AS drk
  FROM (SELECT query_id, id, ROUND(score, 6) AS score6 FROM ds_scored))
SELECT r.query_id, r.id, r.score6 AS score, r.drk AS rank,
       d.source, d.n_chars
FROM ds_ranked r JOIN documents d ON d.doc_id = r.id
WHERE r.drk > 5 AND r.drk <= {5 + _DSL_K}
"""


EXTRA_QUERIES["dsl_fields_page"] = q_dsl_fields_page
EXTRA_ORACLES["dsl_fields_page"] = _dsl_fields_page_oracle()


# ---------------------------------------------------------------------------
# round 12 (post-close): significant_terms as a request AGGREGATION —
# "what is this result set about" over the query's FULL match set
# (foreground = every admissible doc, not a ranked page; background =
# the whole corpus — the JLH contract), wired through search_request's
# aggs body alongside the metric kinds.


def q_dsl_request_sigterms(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.querydsl import search_request

    docs = load_table(spark, sf_dir, "documents")
    return search_request(
        docs,
        {"query": {"bool": {"must": [_DSL_MUST], "must_not": [_DSL_NOT]}},
         "aggs": {"about": {"significant_terms":
                            {"top_n": 10, "min_fg_df": 3}}}},
    )["aggregations"]["about"]


def _dsl_request_sigterms_oracle() -> str:
    return f"""
WITH toks AS (SELECT doc_id, {_TOKS} AS w FROM documents),
adm AS (SELECT doc_id AS id FROM toks
        WHERE list_contains(w, '{_DSL_MUST}')
          AND NOT list_contains(w, '{_DSL_NOT}')),
hset AS (SELECT CAST(0 AS BIGINT) AS query_id, id FROM adm),
msz AS (SELECT query_id, COUNT(*) AS m FROM hset GROUP BY 1),
dterms AS (SELECT doc_id AS id, UNNEST(list_distinct(w)) AS term FROM toks),
fg AS (SELECT h.query_id, d.term, CAST(COUNT(*) AS BIGINT) AS fg_df
       FROM dterms d JOIN hset h ON h.id = d.id
       GROUP BY 1, 2 HAVING COUNT(*) >= 3),
bg AS (SELECT term, CAST(COUNT(*) AS BIGINT) AS bg_df FROM dterms
       WHERE term IN (SELECT DISTINCT term FROM fg) GROUP BY 1),
nn AS (SELECT COUNT(*) AS n FROM documents),
sc AS (SELECT fg.query_id, fg.term, fg.fg_df, bg.bg_df,
              ROUND((fg.fg_df / msz.m - bg.bg_df / nn.n)
                    * (fg.fg_df / msz.m) / (bg.bg_df / nn.n), 6) AS jlh
       FROM fg
       JOIN bg ON bg.term = fg.term
       JOIN msz ON msz.query_id = fg.query_id
       CROSS JOIN nn),
rk AS (SELECT query_id, term, fg_df, bg_df, jlh,
              CAST(ROW_NUMBER() OVER (PARTITION BY query_id
                   ORDER BY jlh DESC, term) AS INT) AS rank
       FROM sc)
SELECT query_id, term, fg_df, bg_df, jlh, rank
FROM rk WHERE rank <= 10
"""


EXTRA_QUERIES["dsl_request_sigterms"] = q_dsl_request_sigterms
EXTRA_ORACLES["dsl_request_sigterms"] = _dsl_request_sigterms_oracle()


# ---------------------------------------------------------------------------
# round-13 close rotation (VERDICT r12 item 1, the established
# policy): promote the round-12 addendum flagships — none of that
# capability was independently verified — and demote six long-green
# rows whose families keep driver coverage:
# - bm25_stemmed_topk → bm25_stemmed_index_topk (the same analysis
#   chain, now exercised through the persisted posting index);
# - multi_index_topk → dsl_multi_match_topk (the per-field-statistics
#   subtlety carried through the DSL front door, with ^boosts);
# - bm25_page2 → dsl_sorted_page2 (the pagination family swaps the
#   relevance cursor for the sorted search_after cursor);
# - dsl_bool_topk → dsl_min_should_topk (minimum_should_match
#   generalizes the bool row; dsl_bool_filter_topk stays too);
# - events_percentiles → dsl_terms_subaggs (analytics keeps
#   events_date_histogram + docs_composite_page2; the percentile math
#   keeps its identical DuckDB comparison in the pytest tier);
# - bm25_explain → dsl_request_sigterms (significant_terms regains a
#   driver row after bm25_sig_terms's r12 demotion; explain is
#   translation-only and stays pytest-locked).
# Every demoted row keeps the IDENTICAL DuckDB comparison in the
# pytest tier; the window stays exactly 50.
for _name in (
    "dsl_multi_match_topk",
    "dsl_min_should_topk",
    "dsl_terms_subaggs",
    "dsl_sorted_page2",
    "dsl_request_sigterms",
    "bm25_stemmed_index_topk",
):
    QUERIES[_name] = EXTRA_QUERIES.pop(_name)
    ORACLES[_name] = EXTRA_ORACLES.pop(_name)
for _name in (
    "bm25_stemmed_topk",
    "multi_index_topk",
    "bm25_page2",
    "dsl_bool_topk",
    "events_percentiles",
    "bm25_explain",
):
    EXTRA_QUERIES[_name] = QUERIES.pop(_name)
    EXTRA_ORACLES[_name] = ORACLES.pop(_name)
del _name
