"""Validated JSONL/CSV ingest: every line lands in exactly one of
valid/quarantine (the F4 reject-but-consume contract applied to files),
re-running a batch is idempotent, and schema drift follows the
tolerant-reader rules (extra fields dropped, missing fields NULL)."""

import os

import pytest
from pyspark.sql import types as T

from qucosa_fcrepo_reportingdb_spark.sources.files import (
    ingest_to_store,
    read_csv_validated,
    read_jsonl_validated,
)

SCHEMA = T.StructType([
    T.StructField("doc_id", T.LongType()),
    T.StructField("text", T.StringType()),
    T.StructField("lang", T.StringType()),
])


@pytest.fixture()
def jsonl_path(tmp_path):
    p = tmp_path / "batch.jsonl"
    p.write_text("\n".join([
        '{"doc_id": 1, "text": "hello world", "lang": "en"}',
        '{"doc_id": 2, "text": "bonjour", "lang": "fr", "extra": 42}',
        'this is not json at all',
        '{"doc_id": 4, "text": "missing lang field"}',
        '{"broken": ',
    ]) + "\n")
    return str(p)


def test_jsonl_split_routes_every_line(spark, jsonl_path):
    valid, quarantine = read_jsonl_validated(spark, jsonl_path, SCHEMA)
    v = {r.doc_id: r for r in valid.collect()}
    q = [r.raw_line for r in quarantine.collect()]
    assert set(v) == {1, 2, 4}
    assert len(q) == 2                      # every input line in exactly one
    assert "not json" in q[0] or "not json" in q[1]
    # tolerant reader: extra field dropped, missing field NULL
    assert v[2].lang == "fr"
    assert "extra" not in valid.columns
    assert v[4].lang is None


def test_jsonl_declared_schema_controls_types(spark, jsonl_path):
    valid, _ = read_jsonl_validated(spark, jsonl_path, SCHEMA)
    assert dict(valid.dtypes) == {
        "doc_id": "bigint", "text": "string", "lang": "string"}


def test_csv_split_and_quarantine(spark, tmp_path):
    p = tmp_path / "batch.csv"
    p.write_text(
        "doc_id,text,lang\n"
        "1,hello,en\n"
        "notanumber,oops,fr\n"
        "3,ok,de\n")
    valid, quarantine = read_csv_validated(spark, str(p), SCHEMA)
    assert {r.doc_id for r in valid.collect()} == {1, 3}
    assert quarantine.count() == 1
    assert "notanumber" in quarantine.collect()[0].raw_line


def test_ingest_to_store_idempotent(spark, store, jsonl_path):
    stats = ingest_to_store(spark, store, jsonl_path, SCHEMA,
                            table="file_docs", key_cols=["doc_id"])
    assert stats == {"valid": 3, "quarantined": 2}
    assert store.read("file_docs").count() == 3
    # re-running the same batch must not duplicate rows on EITHER side
    # (T4/T6 — quarantine evidence included, merged on content hash)
    stats2 = ingest_to_store(spark, store, jsonl_path, SCHEMA,
                             table="file_docs", key_cols=["doc_id"])
    assert stats2 == {"valid": 3, "quarantined": 2}
    assert store.read("file_docs").count() == 3
    assert store.read("file_docs_quarantine").count() == 2


def test_ingest_directory_of_files(spark, store, tmp_path):
    # splittable-source contract: a directory ingests as one batch
    for i in range(3):
        (tmp_path / f"part{i}.jsonl").write_text(
            f'{{"doc_id": {i + 10}, "text": "doc {i}", "lang": "en"}}\n')
    valid, quarantine = read_jsonl_validated(spark, str(tmp_path), SCHEMA)
    assert valid.count() == 3
    assert quarantine.count() == 0


def test_stream_validated_ingest_matches_batch(spark, store, tmp_path):
    """Streaming form == batch form: files arriving over 'time' (three
    microbatches via maxFilesPerTrigger=1) produce exactly the batch
    reader's valid/quarantine split, idempotently."""
    from qucosa_fcrepo_reportingdb_spark.streaming.jobs import (
        stream_validated_ingest,
    )

    src = tmp_path / "landing"
    src.mkdir()
    (src / "a.jsonl").write_text(
        '{"doc_id": 1, "text": "one", "lang": "en"}\n'
        'garbage line\n')
    (src / "b.jsonl").write_text(
        '{"doc_id": 2, "text": "two", "lang": "de"}\n')
    (src / "c.jsonl").write_text(
        '{"doc_id": 1, "text": "one v2", "lang": "en"}\n'   # key update
        '{"oops": \n')

    q = stream_validated_ingest(
        spark, str(src), store, SCHEMA, "stream_docs", ["doc_id"],
        checkpoint_dir=str(tmp_path / "ckpt"))
    q.awaitTermination(120)

    rows = {r.doc_id: r.text for r in store.read("stream_docs").collect()}
    assert rows[2] == "two"
    assert rows[1] in ("one", "one v2")   # last-wins across microbatches
    assert store.read("stream_docs_quarantine").count() == 2

    # restart over the same checkpoint: no new batches, state unchanged
    q2 = stream_validated_ingest(
        spark, str(src), store, SCHEMA, "stream_docs", ["doc_id"],
        checkpoint_dir=str(tmp_path / "ckpt"))
    q2.awaitTermination(120)
    assert store.read("stream_docs").count() == 2
    assert store.read("stream_docs_quarantine").count() == 2


def test_ingest_intra_batch_duplicate_key_single_row(spark, store, tmp_path):
    """Two versions of the same key in ONE batch leave exactly one row
    in the keyed table (merge_upsert dedupes changes-vs-stored, not
    changes-vs-changes — the ingest dedupes keys first)."""
    p = tmp_path / "dup.jsonl"
    p.write_text(
        '{"doc_id": 1, "text": "v1", "lang": "en"}\n'
        '{"doc_id": 1, "text": "v2", "lang": "en"}\n')
    stats = ingest_to_store(spark, store, str(p), SCHEMA,
                            table="dup_docs", key_cols=["doc_id"])
    assert stats["valid"] == 1
    assert store.read("dup_docs").count() == 1


def test_csv_header_variants_never_land_as_data(spark, tmp_path):
    """ADVICE r5: byte-equality header detection let quoted/spaced
    header variants parse as data rows under an all-string schema, and
    a reordered header evaded it entirely. Layer 1 (normalized match)
    drops quote/space variants; layer 2 routes a reordered header to
    the QUARANTINE. No header shape may reach the valid table."""
    str_schema = T.StructType([
        T.StructField("k", T.StringType()),
        T.StructField("v", T.StringType()),
    ])
    p = tmp_path / "h.csv"
    p.write_text(
        'k,v\n'            # canonical header
        '"k","v"\n'        # quoted header variant
        ' k , v \n'        # space-padded header variant
        'v,k\n'            # reordered header (layer 2)
        'a,1\n'
        'b,2\n')
    valid, quarantine = read_csv_validated(spark, str(p), str_schema)
    assert sorted((r.k, r.v) for r in valid.collect()) == \
        [("a", "1"), ("b", "2")]
    q = [r.raw_line for r in quarantine.collect()]
    assert q == ["v,k"]   # evidence, not silence

    # typed schemas keep working: header variants can't cast to long ->
    # layer 1 drops the normalized ones, the cast quarantines any other
    p2 = tmp_path / "h2.csv"
    p2.write_text('"doc_id","text","lang"\n5,x,en\n')
    valid2, quarantine2 = read_csv_validated(spark, str(p2), SCHEMA)
    assert [r.doc_id for r in valid2.collect()] == [5]
    assert quarantine2.count() == 0
