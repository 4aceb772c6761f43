"""Tiny filesystem-portable marker IO for persisted index directories.

Persisted stores carry small sidecar markers next to their parquet
partitions — the cosine tier's ``_METRIC``, the rerank store's
``_BUCKET_ROWS``.  Reading/writing those with local ``open()`` breaks
the moment the index path is ``hdfs://`` / ``s3a://`` (ADVICE r06: a
valid remote cosine index would be rejected as "not a cosine index"),
so markers go through the same Hadoop ``FileSystem`` abstraction the
parquet data uses — whatever filesystem ``spark.read.parquet(path)``
can reach, these helpers can too.

Driver-side, O(bytes-of-marker); never on the data path.
"""

from __future__ import annotations

from pyspark.sql import SparkSession


def _fs_and_path(spark: SparkSession, path: str):
    jvm = spark._jvm
    hpath = jvm.org.apache.hadoop.fs.Path(path)
    fs = hpath.getFileSystem(spark._jsc.hadoopConfiguration())
    return fs, hpath


def write_marker(spark: SparkSession, path: str, content: str) -> None:
    """Write ``content`` to ``path`` (overwrite) via the Hadoop FS API."""
    fs, hpath = _fs_and_path(spark, path)
    out = fs.create(hpath, True)
    try:
        out.write(bytearray(content.encode("ascii")))
    finally:
        out.close()


def delete_path(spark: SparkSession, path: str) -> bool:
    """Recursively delete ``path`` via the Hadoop FS API (ADVICE r09:
    ``shutil.rmtree`` on a staging directory only works on a local
    filesystem — on ``hdfs://`` / ``s3a://`` the stage would silently
    persist forever).  Returns True if something was deleted."""
    fs, hpath = _fs_and_path(spark, path)
    if not fs.exists(hpath):
        return False
    return bool(fs.delete(hpath, True))


def read_marker(spark: SparkSession, path: str) -> str | None:
    """Read ``path`` as ASCII text, or None if it does not exist."""
    fs, hpath = _fs_and_path(spark, path)
    if not fs.exists(hpath):
        return None
    stream = fs.open(hpath)
    try:
        # commons-io ships with Spark; py4j maps the returned byte[] to
        # Python bytes (reading into a passed buffer would not — py4j
        # passes arrays by value, so in-place reads never propagate)
        data = spark._jvm.org.apache.commons.io.IOUtils.toByteArray(stream)
        return bytes(data).decode("ascii")
    finally:
        stream.close()
