"""Structured Streaming wrappers: incremental results must equal their
batch equivalents (the §2.5 semantics, Spark-native)."""

from datetime import datetime

from pyspark.sql import functions as F
from pyspark.sql import types as T

from qucosa_fcrepo_reportingdb_spark import schemas
from qucosa_fcrepo_reportingdb_spark.sources.oai import OAI_HEADER_TABLE
from qucosa_fcrepo_reportingdb_spark.streaming.jobs import (
    stream_dedupe_latest,
    stream_events_hourly,
    stream_header_merges,
)

EVENT_SCHEMA = T.StructType([
    T.StructField("event_id", T.LongType()),
    T.StructField("ts", T.TimestampType()),
    T.StructField("event_type", T.StringType()),
    T.StructField("value", T.DoubleType()),
])


def _write_events(spark, path):
    rows = [
        (1, datetime(2024, 1, 1, 10, 5), "view", 1.0),
        (2, datetime(2024, 1, 1, 10, 55), "view", 2.0),
        (3, datetime(2024, 1, 1, 11, 5), "click", 4.0),
        (4, datetime(2024, 1, 1, 11, 45), "view", 8.0),
    ]
    spark.createDataFrame(rows, EVENT_SCHEMA).coalesce(1) \
        .write.mode("overwrite").parquet(path)


def test_streaming_hourly_matches_batch(spark, tmp_path):
    src = str(tmp_path / "events")
    _write_events(spark, src)
    q, name = stream_events_hourly(spark, src, EVENT_SCHEMA,
                                   str(tmp_path / "ckpt"))
    try:
        q.processAllAvailable()
        got = {(r.hour, r.event_type): (r.n_events, r.sum_value)
               for r in spark.table(name).collect()}
    finally:
        q.stop()
    assert got == {
        (datetime(2024, 1, 1, 10), "view"): (2, 3.0),
        (datetime(2024, 1, 1, 11), "click"): (1, 4.0),
        (datetime(2024, 1, 1, 11), "view"): (1, 8.0),
    }


def test_streaming_merge_foreachbatch(spark, store, tmp_path):
    d1 = datetime(2015, 1, 1)
    d2 = datetime(2016, 1, 1)
    batches = [
        [("a", d1, ["s"], False), ("b", d1, None, False)],
        [("b", d2, ["x"], True), ("c", d1, None, False)],  # b updated
    ]
    src = str(tmp_path / "headers")
    for i, rows in enumerate(batches):
        spark.createDataFrame(rows, schemas.OAI_HEADER_SCHEMA).coalesce(1) \
            .write.mode("append").parquet(src)

    epochs = []
    q = stream_header_merges(
        spark, src, store, OAI_HEADER_TABLE, str(tmp_path / "ck"),
        batch_hook=lambda df, e: epochs.append(e))
    q.awaitTermination(120)
    rows = {r.record_identifier: r for r in store.read(OAI_HEADER_TABLE).collect()}
    assert set(rows) == {"a", "b", "c"}
    assert rows["b"].datestamp == d2 and rows["b"].status_is_deleted is True
    assert len(epochs) >= 1


def test_streaming_dedupe_first_arrival_per_key(spark, tmp_path):
    src = str(tmp_path / "ev")
    _write_events(spark, src)
    q, name = stream_dedupe_latest(spark, src, EVENT_SCHEMA,
                                   key="event_type", order="ts",
                                   checkpoint_dir=str(tmp_path / "ck2"))
    try:
        q.processAllAvailable()
        out = spark.table(name).collect()
    finally:
        q.stop()
    # one row per event_type within the watermark horizon
    assert sorted(r.event_type for r in out) == ["click", "view"]


def test_stream_sessionize_stateful(spark, tmp_path):
    from qucosa_fcrepo_reportingdb_spark.streaming.jobs import stream_sessionize
    rows = [
        (1, datetime(2024, 1, 1, 10, 0), "view", 1.0),
        (2, datetime(2024, 1, 1, 10, 10), "view", 1.0),   # same session
        (3, datetime(2024, 1, 1, 12, 0), "view", 1.0),    # gap -> session 1
        (4, datetime(2024, 1, 1, 12, 5), "click", 1.0),
    ]
    ev_schema = T.StructType([
        T.StructField("event_id", T.LongType()),
        T.StructField("ts", T.TimestampType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("value", T.DoubleType()),
    ])
    src = str(tmp_path / "sess")
    df = spark.createDataFrame([(e, t_, et, v, 7) for e, t_, et, v in rows],
                               ev_schema.add("user_id", T.LongType()))
    df.coalesce(1).write.mode("overwrite").parquet(src)
    q, name = stream_sessionize(spark, src, df.schema, gap_seconds=1800,
                                checkpoint_dir=str(tmp_path / "ck"))
    try:
        q.processAllAvailable()
        got = {r.event_id: r.session_seq for r in spark.table(name).collect()}
    finally:
        q.stop()
    assert got == {1: 0, 2: 0, 3: 1, 4: 1}
