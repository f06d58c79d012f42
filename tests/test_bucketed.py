"""BucketedKeyTable: partition-pruned merges that rewrite only affected
buckets — the 100 TB merge path."""

import os
from datetime import datetime

from pyspark.sql import functions as F

from qucosa_fcrepo_reportingdb_spark import schemas
from qucosa_fcrepo_reportingdb_spark.operators.bucketed import BucketedKeyTable

D1 = datetime(2015, 1, 1)
D2 = datetime(2016, 1, 1)


def headers(spark, rows):
    return spark.createDataFrame(rows, schemas.OAI_HEADER_SCHEMA)


def _bucket_mtimes(path):
    out = {}
    for entry in os.listdir(path):
        if entry.startswith("bucket="):
            d = os.path.join(path, entry)
            out[entry] = max(os.path.getmtime(os.path.join(d, f))
                             for f in os.listdir(d))
    return out


def test_merge_correctness(spark, tmp_path):
    tbl = BucketedKeyTable(spark, str(tmp_path / "t"), "record_identifier",
                           n_buckets=8)
    tbl.init(headers(spark, [(f"id{i}", D1, None, False) for i in range(50)]))
    tbl.merge(headers(spark, [("id3", D2, ["x"], True), ("new1", D2, [], False)]),
              order_by=["datestamp"])
    rows = {r.record_identifier: r for r in tbl.read().collect()}
    assert len(rows) == 51
    assert rows["id3"].datestamp == D2 and rows["id3"].status_is_deleted is True
    assert rows["id7"].datestamp == D1


def test_merge_rewrites_only_affected_buckets(spark, tmp_path):
    path = str(tmp_path / "t")
    tbl = BucketedKeyTable(spark, path, "record_identifier", n_buckets=16)
    tbl.init(headers(spark, [(f"id{i}", D1, None, False) for i in range(200)]))
    before = _bucket_mtimes(path)
    affected = tbl.merge(headers(spark, [("id3", D2, None, True)]),
                         order_by=["datestamp"])
    after = _bucket_mtimes(path)
    assert len(affected) == 1
    changed = {b for b in after if after[b] != before.get(b)}
    assert changed == {f"bucket={affected[0]}"}


def test_merge_scan_is_partition_pruned(spark, tmp_path):
    tbl = BucketedKeyTable(spark, str(tmp_path / "t"), "record_identifier",
                           n_buckets=16)
    tbl.init(headers(spark, [(f"id{i}", D1, None, False) for i in range(100)]))
    pruned = tbl.read_buckets([3, 5])
    plan = pruned._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "bucket" in plan
    n_parts = pruned.select("bucket").distinct().count()
    assert n_parts <= 2


def test_merge_is_idempotent(spark, tmp_path):
    tbl = BucketedKeyTable(spark, str(tmp_path / "t"), "record_identifier",
                           n_buckets=8)
    tbl.init(headers(spark, [(f"id{i}", D1, None, False) for i in range(20)]))
    change = headers(spark, [("id3", D2, ["x"], True)])
    tbl.merge(change, order_by=["datestamp"])
    snap1 = sorted(map(tuple, tbl.read().collect()))
    tbl.merge(change, order_by=["datestamp"])
    snap2 = sorted(map(tuple, tbl.read().collect()))
    assert snap1 == snap2
