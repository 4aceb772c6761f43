"""JSONL corpus source/sink — the de-facto interchange format for
training-data corpora (one JSON object per line, splittable, appendable).

The reference ingests only its own binary index files (S1,
src/index/vector_shard.cc:30-44); a training-data engine additionally
has to meet corpora where they live.  Scale rules baked in:

- **Explicit schema, never inference.**  ``spark.read.json`` without a
  schema runs a full extra pass over 100 TB just to guess types — every
  reader here takes (or derives) a declared schema.
- **Corrupt-record quarantine, not job failure.**  Real crawled corpora
  contain broken lines; ``PERMISSIVE`` mode routes them to a
  ``_corrupt_record`` column so ingest keeps running and the bad lines
  stay auditable (``DROPMALFORMED`` silently destroys data — never).
- **Embeddings ride as JSON arrays** and land as ``array<float>``
  columns — the parquet-side schema is identical, so every operator
  downstream is format-agnostic.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

#: documents.parquet fixture schema (FIXTURES.md), as the JSONL contract
DOCUMENTS_JSONL_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("source", T.StringType(), True),
        T.StructField("lang", T.StringType(), True),
        T.StructField("text", T.StringType(), True),
        T.StructField("n_chars", T.IntegerType(), True),
    ]
)


def read_jsonl(
    spark: SparkSession,
    path: str,
    schema: T.StructType,
    *,
    quarantine: bool = True,
) -> DataFrame:
    """Schema-first JSONL reader.  With ``quarantine`` the returned frame
    carries a ``_corrupt_record`` column: NULL for clean rows, the raw
    line for broken ones — filter/route it downstream."""
    full = schema
    if quarantine:
        full = T.StructType(
            list(schema.fields) + [T.StructField("_corrupt_record", T.StringType(), True)]
        )
    return (
        spark.read.schema(full)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_corrupt_record")
        .json(path)
    )


def write_jsonl(df: DataFrame, path: str, *, mode: str = "overwrite") -> None:
    df.write.mode(mode).json(path)


def clean_and_quarantined(jsonl: DataFrame) -> tuple[DataFrame, DataFrame]:
    """Split a quarantine-mode read into (clean rows, corrupt lines).

    Spark refuses queries that reference ONLY the internal corrupt-record
    column of a json scan (SPARK-21610); caching the parsed frame first
    is the documented contract for inspecting corrupt rows."""
    from pyspark.sql import functions as F

    jsonl = jsonl.cache()
    corrupt = F.col("_corrupt_record").isNotNull()
    return (
        jsonl.filter(~corrupt).drop("_corrupt_record"),
        jsonl.filter(corrupt).select(F.col("_corrupt_record").alias("raw_line")),
    )
