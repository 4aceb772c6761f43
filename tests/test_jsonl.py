"""JSONL corpus source (sources/jsonl.py): schema-first round-trip and
corrupt-line quarantine."""

from __future__ import annotations

from distributed_vector_search_system_spark.sources.jsonl import (
    DOCUMENTS_JSONL_SCHEMA,
    clean_and_quarantined,
    read_jsonl,
    write_jsonl,
)
from distributed_vector_search_system_spark.tables import load_table


def test_documents_roundtrip(spark, sf_smoke, tmp_path):
    docs = load_table(spark, sf_smoke, "documents")
    path = str(tmp_path / "docs_jsonl")
    write_jsonl(docs, path)
    back = read_jsonl(spark, path, DOCUMENTS_JSONL_SCHEMA, quarantine=False)
    cols = sorted(docs.columns)
    want = {tuple(r) for r in docs.select(*cols).collect()}
    got = {tuple(r) for r in back.select(*cols).collect()}
    assert got == want


def test_corrupt_lines_quarantined_not_fatal(spark, tmp_path):
    p = tmp_path / "mixed.jsonl"
    p.write_text(
        '{"doc_id": 1, "source": "a", "lang": "en", "text": "ok", "n_chars": 2}\n'
        "this line is not json at all\n"
        '{"doc_id": 2, "source": "b", "lang": "en", "text": "fine", "n_chars": 4}\n'
        '{"doc_id": "NOT_A_NUMBER", "text": "type mismatch"}\n'
    )
    raw = read_jsonl(spark, str(p), DOCUMENTS_JSONL_SCHEMA)
    clean, bad = clean_and_quarantined(raw)
    assert {r.doc_id for r in clean.collect()} == {1, 2}
    bad_lines = [r.raw_line for r in bad.collect()]
    assert len(bad_lines) == 2
    assert any("not json" in l for l in bad_lines)
