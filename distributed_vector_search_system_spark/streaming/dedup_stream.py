"""Streaming deduplication — the ingest-side gate of a training-data
pipeline.

Batch dedup (operators/dedup.py) answers "which existing rows are
duplicates"; this module keeps duplicates from *entering* the corpus in
the first place, as data arrives.  Two Spark-native levels:

- ``dedup_stream_exact``: ``dropDuplicatesWithinWatermark`` on a key
  (doc_id, or a content hash for exact-content dedup).  State is bounded
  by the watermark: a key's dedup state is dropped once the watermark
  passes ``ts + delay``, so memory is O(keys per window), not O(all
  keys ever) — the only formulation that survives an unbounded stream.
- ``dedup_stream_fingerprint``: same operator keyed on a *near-dup*
  fingerprint computed map-side (SimHash bucket / MinHash band from
  functions.text — any expression-tier fingerprint), so near-duplicates
  within the watermark horizon collapse too.

Exactly-once note: ``dropDuplicatesWithinWatermark`` only guarantees
one-per-key for events inside the watermark horizon; a duplicate
arriving later than ``delay`` after the first is emitted again.  That is
the same contract as every watermarked streaming dedup (state must be
droppable), and downstream batch dedup remains the backstop — the two
layers compose, they don't compete.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def content_key(text_col="text") -> Column:
    """Deterministic exact-content key: sha2 over the UTF-8 bytes —
    collision-safe at corpus scale (2^-128 at 10^12 docs)."""
    c = F.col(text_col) if isinstance(text_col, str) else text_col
    return F.sha2(F.encode(c, "UTF-8"), 256)


def dedup_stream_exact(
    stream: DataFrame,
    *,
    key_cols: list[str] | None = None,
    ts_col: str = "ts",
    delay: str = "10 minutes",
) -> DataFrame:
    """First occurrence per key within the watermark horizon.

    ``key_cols`` defaults to a content hash of ``text`` (added as
    ``content_key``).  The watermark bounds state: keys older than
    ``delay`` are evicted from the dedup state store.
    """
    if key_cols is None:
        stream = stream.withColumn("content_key", content_key())
        key_cols = ["content_key"]
    from .windows import with_event_time_watermark

    return with_event_time_watermark(stream, ts_col, delay).dropDuplicatesWithinWatermark(
        key_cols
    )


def dedup_stream_fingerprint(
    stream: DataFrame,
    fingerprint: Column,
    *,
    ts_col: str = "ts",
    delay: str = "10 minutes",
    out_col: str = "fingerprint",
) -> DataFrame:
    """Near-dup streaming gate: keep the first document per fingerprint
    bucket within the horizon.  ``fingerprint`` is any map-side
    expression (e.g. ``functions.text.simhash64`` truncated to bands) —
    no shuffle beyond the dedup state exchange itself."""
    from .windows import with_event_time_watermark

    keyed = stream.withColumn(out_col, fingerprint)
    return with_event_time_watermark(keyed, ts_col, delay).dropDuplicatesWithinWatermark(
        [out_col]
    )
