"""Multimodal binary-column plumbing: metadata projection, Arrow feature
extraction (exact vs local numpy), deterministic frame sampling, and the
decode stub contract."""

from __future__ import annotations

import hashlib

import numpy as np
import pytest
from pyspark.sql import functions as F

from distributed_vector_search_system_spark.operators.multimodal import (
    FEATURE_DIM,
    decode_image,
    extract_features,
    sample_frames,
    with_blob_metadata,
)


def _blobs(spark, rows):
    df = spark.createDataFrame(rows, "doc_id long, payload string")
    return df.select("doc_id", F.encode("payload", "UTF-8").alias("blob"))


def test_blob_metadata(spark):
    d = _blobs(spark, [(1, "hello world"), (2, "")])
    got = {r["doc_id"]: r for r in with_blob_metadata(d).collect()}
    assert got[1]["n_bytes"] == 11
    assert got[1]["sha256"] == hashlib.sha256(b"hello world").hexdigest()
    assert got[1]["magic"] == "68656C6C".upper() or got[1]["magic"].lower() == "68656c6c"
    assert got[2]["n_bytes"] == 0


def test_extract_features_matches_numpy(spark):
    payloads = [(1, "abcdefgh" * 10), (2, "z"), (3, "0123 4567 89")]
    d = _blobs(spark, payloads)
    got = {r["doc_id"]: r["features"] for r in extract_features(d).collect()}
    for doc_id, text in payloads:
        a = np.frombuffer(text.encode(), dtype=np.uint8).astype(np.float64)
        q = np.percentile(a, [25, 50, 75])
        expect = [a.mean(), a.std(), q[0], q[1], q[2], a.min(), a.max(), float(len(a))]
        assert len(got[doc_id]) == FEATURE_DIM
        np.testing.assert_allclose(got[doc_id], expect, rtol=1e-6)


def test_extract_features_empty_blob(spark):
    d = _blobs(spark, [(1, "")])
    got = extract_features(d).collect()
    assert got[0]["features"] == [0.0] * FEATURE_DIM


def test_sample_frames_deterministic_slices(spark):
    text = "".join(chr(65 + i % 26) for i in range(100))  # 100 bytes
    d = _blobs(spark, [(7, text)])
    frames = {r["frame_index"]: bytes(r["frame"]) for r in
              sample_frames(d, frame_size=10, num_frames=4).collect()}
    raw = text.encode()
    assert len(frames) == 4
    for i in range(4):
        off = (i * (len(raw) - 10)) // 3
        assert frames[i] == raw[off : off + 10]


def test_sample_frames_partitioning_preserved(spark):
    d = _blobs(spark, [(i, "x" * 50) for i in range(20)]).repartition(4)
    out = sample_frames(d, frame_size=8, num_frames=2)
    assert out.rdd.getNumPartitions() == 4  # map-only: no shuffle introduced
    assert out.count() == 40


def test_decode_image_stub_contract(spark):
    d = _blobs(spark, [(1, "not a real jpeg")])
    try:
        import PIL  # noqa: F401

        has_pil = True
    except ImportError:
        has_pil = False
    if has_pil:
        pytest.skip("PIL present; stub contract not applicable")
    with pytest.raises(NotImplementedError):
        decode_image(d)


def test_classify_media_magic_bytes(spark):
    from distributed_vector_search_system_spark.operators.multimodal import (
        classify_media,
    )

    rows = [
        (1, bytes.fromhex("FFD8FFE0") + b"rest"),
        (2, bytes.fromhex("89504E470D0A1A0A") + b"rest"),
        (3, b"GIF8" + bytes([0x39]) + b"a"),
        (4, b"RIFFxxxxWAVE"),
        (5, b"%PDF-1.7"),
        (6, b"just text"),
        (7, b""),
    ]
    df = spark.createDataFrame(rows, "doc_id long, blob binary")
    got = {r["doc_id"]: r["media_kind"] for r in classify_media(df).collect()}
    assert got == {1: "jpeg", 2: "png", 3: "gif", 4: "wav", 5: "pdf",
                   6: "unknown", 7: "unknown"}
