"""Multimodal (binary) column handling for training-data pipelines.

Design (north-star): image/audio/video payloads are opaque ``binary``
columns with typed metadata alongside.  The Spark-side plumbing —
schema, Arrow batch shape, mapInPandas signatures, partitioning — is
real and tested; the actual perceptual decode (JPEG→pixels, PCM
resample, video frame extraction) is stubbed because the codecs are not
in this container: ``decode_image`` raises ``NotImplementedError``
unless PIL is importable, and the deterministic byte-level feature
extractor stands in for a real model embedding.

At scale each stage is a map-only Arrow pass: no shuffle, binary
payloads never leave their partition, and column pruning keeps the blob
column out of queries that only touch metadata.
"""

from __future__ import annotations

from typing import Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

FEATURE_DIM = 8


def with_blob_metadata(df: DataFrame, blob_col: str = "blob") -> DataFrame:
    """Typed metadata projection over an opaque binary column —
    expression tier only (codegen, prunable)."""
    b = F.col(blob_col)
    return df.withColumns(
        {
            "n_bytes": F.octet_length(b).cast("long"),
            "sha256": F.sha2(b, 256),
            "magic": F.hex(F.substring(b, 1, 4)),
        }
    )


#: magic-byte signatures (hex prefixes), checked in order — the
#: container-format sniff every multimodal ingest pipeline runs before
#: routing blobs to the right decoder
MEDIA_MAGIC: tuple[tuple[str, str], ...] = (
    ("jpeg", "FFD8FF"),
    ("png", "89504E47"),
    ("gif", "47494638"),
    ("wav", "52494646"),  # RIFF container
    ("pdf", "255044462D"),
)


def classify_media(df: DataFrame, blob_col: str = "blob", out_col: str = "media_kind") -> DataFrame:
    """Route blobs by magic bytes — expression tier (hex prefix compare
    on the first 8 bytes), map-only, blob never leaves the executor.
    Unrecognized prefixes classify as 'unknown'."""
    h = F.hex(F.substring(F.col(blob_col), 1, 8))
    expr = F.lit("unknown")
    for kind, sig in reversed(MEDIA_MAGIC):
        expr = F.when(h.startswith(sig), F.lit(kind)).otherwise(expr)
    return df.withColumn(out_col, expr)


def extract_features(
    df: DataFrame, blob_col: str = "blob", id_col: str = "doc_id"
) -> DataFrame:
    """Arrow-batched feature extraction over binary payloads.

    Stand-in for a model encoder: a deterministic FEATURE_DIM-vector of
    byte statistics (mean, std, quartiles, entropy-ish counts) computed
    per blob with numpy.  The mapInPandas shape (binary in → fixed-size
    float array out) is exactly what a real CLIP/whisper encoder UDF
    uses.

    Cross-engine determinism: every stat derives from EXACT integer
    sums (``sum(x)`` / ``sum(x²)`` of byte values are integer-exact in
    double for any realistic blob) through a FIXED operation order
    (``var = (ss - s*s/n)/n``), so a SQL oracle replaying the same
    formula over the same bytes produces bit-identical doubles — no
    summation-order ulp drift, unlike a naive ``a.std()`` (pairwise vs
    sequential summation).  Quartiles are linear interpolation at
    q∈{.25,.5,.75}: the fractional index has ≤2 fractional bits, so
    interpolation between integer byte values is also exact.
    """
    import numpy as np
    import pandas as pd

    schema = f"{id_col} long, features array<float>"

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = []
            for blob in pdf[blob_col]:
                a = np.frombuffer(bytes(blob), dtype=np.uint8).astype(np.float64)
                if a.size == 0:
                    feats.append([0.0] * FEATURE_DIM)
                    continue
                q = np.percentile(a, [25, 50, 75])
                n = float(a.size)
                s = float(a.sum())        # integer-exact
                ss = float((a * a).sum())  # integer-exact
                var = (ss - s * s / n) / n
                feats.append(
                    [
                        s / n,
                        float(np.sqrt(max(var, 0.0))),
                        float(q[0]),
                        float(q[1]),
                        float(q[2]),
                        float(a.min()),
                        float(a.max()),
                        n,
                    ]
                )
            yield pd.DataFrame({id_col: pdf[id_col], "features": feats})

    return df.select(id_col, blob_col).mapInPandas(run, schema=schema)


def sample_frames(
    df: DataFrame,
    *,
    frame_size: int,
    num_frames: int,
    blob_col: str = "blob",
    id_col: str = "doc_id",
) -> DataFrame:
    """Deterministic "frame sampling": slice ``num_frames`` evenly-spaced
    ``frame_size``-byte windows out of each blob (the video-frame-sample
    plumbing with a byte-slice stand-in for an actual demuxer).
    Emits one row per (id, frame_index) — the explode happens inside the
    Arrow batch, so output partitioning follows input partitioning.
    """
    import pandas as pd

    schema = f"{id_col} long, frame_index int, frame binary"

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, frames = [], [], []
            for rid, blob in zip(pdf[id_col], pdf[blob_col]):
                raw = bytes(blob)
                if not raw:
                    continue
                for i in range(num_frames):
                    off = (i * max(len(raw) - frame_size, 0)) // max(num_frames - 1, 1)
                    ids.append(rid)
                    idxs.append(i)
                    frames.append(raw[off : off + frame_size])
            yield pd.DataFrame({id_col: ids, "frame_index": idxs, "frame": frames})

    return df.select(id_col, blob_col).mapInPandas(run, schema=schema)


def decode_image(df: DataFrame, blob_col: str = "blob", id_col: str = "doc_id") -> DataFrame:
    """Real image decode (requires PIL, not present in this container).

    The Spark plumbing is identical to :func:`extract_features`; only the
    per-blob kernel differs.  Raises NotImplementedError when PIL is
    unavailable rather than silently faking pixel data.
    """
    try:
        import PIL.Image  # noqa: F401
    except ImportError as e:
        raise NotImplementedError(
            "image decode requires PIL, which is not installed in this "
            "environment; use extract_features() for the deterministic "
            "byte-level stand-in"
        ) from e

    import io
    from typing import Iterator as _It

    import pandas as pd
    import PIL.Image as Image

    schema = f"{id_col} long, width int, height int, mode string"

    def run(batches: _It[pd.DataFrame]) -> _It[pd.DataFrame]:
        for pdf in batches:
            rows = {"width": [], "height": [], "mode": []}
            for blob in pdf[blob_col]:
                img = Image.open(io.BytesIO(bytes(blob)))
                rows["width"].append(img.width)
                rows["height"].append(img.height)
                rows["mode"].append(img.mode)
            yield pd.DataFrame({id_col: pdf[id_col], **rows})

    return df.select(id_col, blob_col).mapInPandas(run, schema=schema)
