"""Data-layout operators: Z-order clustering for multi-column data skipping.

At 100 TB the cheapest rows are the ones never read.  Parquet scans skip
whole row groups when the pushed-down predicate falls outside a group's
column min/max statistics — but statistics only help if the layout
clusters the filtered columns.  A sort on ``ts`` gives perfect skipping
on ``ts`` and none on ``user_id``; interleaving the bits of both (a
Z-order / Morton curve) gives useful min/max locality on BOTH columns at
once, which is why every large table format (Delta OPTIMIZE ZORDER BY,
Iceberg sort orders) ships it.

Spark-first shape: the Z-key is a pure codegen expression (no UDF), the
rewrite is one ``repartitionByRange + sortWithinPartitions`` on that key
— a single range shuffle, the same cost as any global sort — and the
benefit accrues to every later scan.

The reference engine has no layout optimizer (its FAISS index is scanned
fully, src/index/vector_shard.cc:72-94); this exists for the relational /
training-data surface where predicate scans dominate.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: bits per dimension in the interleaved key (16 → 2 cols fit a long
#: with room to spare; 21 is the max for 3 cols)
DEFAULT_BITS = 16


def _normalize(col: Column, lo: Column, hi: Column, bits: int) -> Column:
    """Map a numeric column onto [0, 2^bits) by linear range scaling —
    min/max come from the caller (one cheap agg, or known bounds)."""
    span = (hi - lo).cast("double")
    unit = F.when(span <= 0.0, F.lit(0.0)).otherwise(
        (col.cast("double") - lo.cast("double")) / span
    )
    max_code = F.lit((1 << bits) - 1)
    return F.least(max_code, F.floor(unit * (1 << bits)).cast("long"))


def zorder_key(
    cols: list[Column | str],
    ranges: list[tuple[float, float]],
    *,
    bits: int = DEFAULT_BITS,
) -> Column:
    """Morton key: bit-interleave the range-normalized columns.

    ``ranges[i] = (min, max)`` of ``cols[i]`` — supply from a prior
    ``df.agg(min, max)`` or from table metadata.  Pure expression: the
    whole key stays inside whole-stage codegen.
    """
    if len(cols) != len(ranges):
        raise ValueError("one (min, max) range per column")
    if bits * len(cols) > 63:
        # shiftleft by ≥64 wraps mod 64 on the JVM, silently corrupting
        # the interleaved key (wrong clustering, no error) — fail instead
        raise ValueError(
            f"bits*len(cols) = {bits * len(cols)} exceeds 63: the interleaved "
            f"key must fit a signed long; lower bits (≤ {63 // len(cols)} for "
            f"{len(cols)} columns)"
        )
    codes = [
        _normalize(
            F.col(c) if isinstance(c, str) else c, F.lit(lo), F.lit(hi), bits
        )
        for c, (lo, hi) in zip(cols, ranges)
    ]
    n = len(codes)
    key = F.lit(0).cast("long")
    for b in range(bits):
        for i, code in enumerate(codes):
            bit = F.shiftright(code, b).bitwiseAND(F.lit(1))
            key = key + F.shiftleft(bit, b * n + i)
    return key


def zorder_write(
    df: DataFrame,
    path: str,
    cols: list[str],
    ranges: list[tuple[float, float]],
    *,
    bits: int = DEFAULT_BITS,
    num_files: int | None = None,
    rows_per_rowgroup: int | None = None,
) -> None:
    """Rewrite ``df`` clustered on the Z-curve of ``cols``.

    One range shuffle on the Z-key (balanced output files), sort within
    partitions, drop the key before writing — the layout, not the
    column, is the product.  ``rows_per_rowgroup`` shrinks parquet row
    groups so min/max pruning has finer granularity (at scale you'd
    tune ``parquet.block.size`` instead).
    """
    keyed = df.withColumn("_zkey", zorder_key(list(cols), ranges, bits=bits))
    parts = keyed.repartitionByRange(
        *([num_files] if num_files else []), F.col("_zkey")
    ).sortWithinPartitions("_zkey")
    writer = parts.drop("_zkey").write.mode("overwrite")
    if rows_per_rowgroup:
        writer = writer.option("parquet.block.size", rows_per_rowgroup * 256)
    writer.parquet(path)


def rowgroups_matching(
    path: str, col: str, lo, hi
) -> tuple[int, int]:
    """Data-skipping audit: (matching, total) parquet row groups whose
    [min, max] statistics overlap ``[lo, hi]`` for ``col`` — what a
    statistics-pruning scan would actually read.  Driver-side metadata
    only; no row data is touched."""
    import glob
    import os

    import pyarrow.parquet as pq

    matching = total = 0
    for f in glob.glob(os.path.join(path, "*.parquet")):
        pf = pq.ParquetFile(f)
        idx = pf.schema_arrow.get_field_index(col)
        for rg in range(pf.metadata.num_row_groups):
            st = pf.metadata.row_group(rg).column(idx).statistics
            total += 1
            if st is None or st.min is None:
                matching += 1  # no stats → must read
            elif not (st.max < lo or st.min > hi):
                matching += 1
    return matching, total
