"""Vector distance/similarity kernels.

Two tiers, both distributed:

1. **Expression tier** (default): pure ``pyspark.sql.functions`` column
   expressions (``zip_with`` + ``aggregate``).  Stays inside JVM
   whole-stage codegen — no Python in the loop — and is the tier the
   DuckDB correctness oracle mirrors term-for-term.
2. **NumPy tier** (hot path): Arrow-batched kernels used by
   ``operators.knn.knn(..., method="numpy")`` — one BLAS matrix
   multiply per Arrow batch instead of per-row expression evaluation.

Semantics note: the reference uses FAISS ``IndexFlatL2`` which returns
**squared** L2 (no sqrt) — reference src/index/vector_shard.cc:41.  All
arithmetic is done in double to keep cross-engine (Spark vs DuckDB
oracle) results bit-comparable; float32 inputs are promoted first.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _to_double(col: Column) -> Column:
    return col.cast("double")


def squared_l2(a, b) -> Column:
    """Squared L2 distance between two array<float|double> columns.

    Matches FAISS IndexFlatL2 (squared, un-rooted) — reference
    src/index/vector_shard.cc:41.  Element-wise ``(a-b)^2`` in double,
    sequential left-fold sum (same order as the oracle's UNNEST sum).
    """
    diffs = F.zip_with(
        a, b, lambda x, y: (_to_double(x) - _to_double(y)) * (_to_double(x) - _to_double(y))
    )
    return F.aggregate(diffs, F.lit(0.0), lambda acc, x: acc + x)


def dot_product(a, b) -> Column:
    prods = F.zip_with(a, b, lambda x, y: _to_double(x) * _to_double(y))
    return F.aggregate(prods, F.lit(0.0), lambda acc, x: acc + x)


def l2_norm(a) -> Column:
    return F.sqrt(
        F.aggregate(a, F.lit(0.0), lambda acc, x: acc + _to_double(x) * _to_double(x))
    )


def cosine_similarity(a, b) -> Column:
    """Cosine similarity in double; 0.0 for zero-norm inputs."""
    num = dot_product(a, b)
    den = l2_norm(a) * l2_norm(b)
    return F.when(den == 0.0, F.lit(0.0)).otherwise(num / den)


def cosine_from_norms(a, b, norm_a, norm_b) -> Column:
    """:func:`cosine_similarity` with the per-side norms PRE-computed.

    Pair-producing joins (query × corpus, candidate pairs) that call
    ``cosine_similarity`` evaluate THREE array folds per pair — dot,
    ‖a‖, ‖b‖ — although each norm depends on one side only.  Projecting
    ``l2_norm`` onto each input BEFORE the join and calling this
    instead leaves one fold (the dot) per pair: at Q queries × N rows
    that is 3·Q·N folds → Q·N + Q + N.  Bit-identical results: the
    norms are the same ``l2_norm`` expression over the same column, and
    the ``when(den == 0)`` / divide structure is unchanged — only WHERE
    the norm subexpressions evaluate moves (guide §1.2 "don't compute
    things you throw away", §2.3 project-before-the-exchange applied to
    expression work)."""
    den = norm_a * norm_b
    return F.when(den == 0.0, F.lit(0.0)).otherwise(dot_product(a, b) / den)


def l2_normalize(a) -> Column:
    """Unit-normalized copy of the vector (double); a zero-norm vector
    stays all-zero (it has no direction — callers that need cosine
    semantics should exclude such rows, see the cosine IVF tier)."""
    v = F.col(a) if isinstance(a, str) else a
    n = l2_norm(v)
    return F.when(n == 0.0, F.transform(v, lambda x: F.lit(0.0))).otherwise(
        F.transform(v, lambda x: _to_double(x) / n)
    )


#: decimal places of the repo-wide top-k rank key (see :func:`rank_key`)
RANK_KEY_DECIMALS = 6

#: the DuckDB-side rank key — bit-identical to :func:`rank_key` and
#: ``np.round(x, 6)`` (all three are IEEE ``rint(x * 1e6) / 1e6`` on
#: doubles; equality probed in tests/test_knn.py::test_rank_key_parity)
RANK_KEY_SQL = "round_even(({x}) * 1e6, 0) / 1e6"


def rank_key(c) -> Column:
    """The repo-wide ORDER key for distance-space top-k: the 6-decimal
    HALF-EVEN rounding ``rint(x * 1e6) / 1e6``.

    Why rank on a rounded key at all: BLAS accumulates in a batch-size-
    dependent order, so the SAME vector scanned in two different Arrow
    batches can produce last-ulp-different distances — ranking raw
    doubles would let Spark partitioning decide which of two duplicate
    vectors survives a top-k cut (found by the round-7 duplicate-heavy
    property run).  Rounding to 6 decimals collapses the ulp noise while
    keeping 1e-6 discrimination; ties then break on ``id``.

    Why THIS rounding: ``rint`` (IEEE round-half-even on the scaled
    double) is the one rule all three engines can compute bit-
    identically — ``np.round(x, 6)`` is literally ``rint(x*1e6)/1e6``,
    Spark SQL ``rint`` is ``Math.rint``, and DuckDB ``round_even``
    matches (:data:`RANK_KEY_SQL`).  ``F.round`` (Spark HALF_UP on the
    decimal string) and DuckDB ``ROUND`` can each disagree with the
    numpy kernels at exact half-boundaries (ADVICE r07), so they are
    used only for rounding OUTPUT columns, never for ranking.
    """
    col = F.col(c) if isinstance(c, str) else c
    scale = F.lit(float(10 ** RANK_KEY_DECIMALS))
    return F.call_function("rint", col * scale) / scale


# --- SQL-string builders for expressions over LITERAL vectors --------------
# Building a literal-vector expression out of Column objects costs one
# py4j round-trip per element (64-dim plane → ~70 JVM calls, an LSH
# bucket expression → thousands); at 4 tables × 6 planes × 2 sides that
# made DataFrame CONSTRUCTION dominate ann_lsh_topk/ann_ivf_topk
# wall-clock (~4-5 s build vs ~1 s execution at sf0.1).  These builders
# emit the SAME Catalyst operations (zip_with + left-fold aggregate in
# double, identical op order → bit-identical results and unchanged
# oracles) as ONE SQL string parsed in a single call.

def sql_double_lit(x: float) -> str:
    """Exact Spark-SQL DOUBLE literal: ``repr`` round-trips the value and
    ``D`` makes the parser read it as double (bare decimals parse as
    DECIMAL)."""
    return f"{float(x)!r}D"


def sql_double_array(vals) -> str:
    return f"array({', '.join(sql_double_lit(x) for x in vals)})"


def dot_lit_sql(vec_sql: str, lits) -> str:
    """SQL for ``dot_product(vec, literal_array)`` — same zip_with +
    sequential-fold shape as the Column tier."""
    return (
        f"aggregate(zip_with({vec_sql}, {sql_double_array(lits)}, "
        f"(a, b) -> CAST(a AS DOUBLE) * b), 0.0D, (acc, x) -> acc + x)"
    )


def squared_l2_lit_sql(vec_sql: str, lits) -> str:
    """SQL for ``squared_l2(vec, literal_array)`` — identical op order to
    the Column tier, so results are bit-comparable."""
    return (
        f"aggregate(zip_with({vec_sql}, {sql_double_array(lits)}, "
        f"(x, y) -> (CAST(x AS DOUBLE) - CAST(y AS DOUBLE)) "
        f"* (CAST(x AS DOUBLE) - CAST(y AS DOUBLE))), "
        f"0.0D, (acc, x) -> acc + x)"
    )
