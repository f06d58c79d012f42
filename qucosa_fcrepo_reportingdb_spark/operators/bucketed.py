"""Hash-bucketed keyed tables: the 100 TB merge path.

The plain merge (operators/maintenance.merge_upsert + TableStore.overwrite)
rewrites the whole table per batch — fine for the reference's workload
shape, unacceptable at 100 TB. This module stores a keyed table
hash-partitioned into N buckets (directory partition `bucket=K` with
K = pmod(hash(key), N)) so that a merge:

1. computes the affected buckets from the change set (distinct bucket ids,
   at most N integers — the only driver-side collect),
2. reads ONLY those buckets (partition pruning: the scan's PartitionFilters
   carry `bucket IN (...)`),
3. rewrites ONLY those buckets (dynamic partition overwrite).

Write amplification per batch drops from O(table) to
O(table * touched_buckets / N); with change keys clustered (the usual CDC
shape) that is a small constant. The same bucket column co-locates
repeated merges: every merge shuffles changes by the same function, so
bucket files stay key-disjoint and a bucket join needs no repartition.

Atomicity: dynamic partition overwrite commits per partition via the
parquet committer — a crashed merge leaves some buckets old and some new,
but the merge is idempotent (same input -> same result), so re-running the
batch converges; this is exactly the reference's recovery stance
(MetsProcessor.java:148-157).
"""

from __future__ import annotations

import os
from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from qucosa_fcrepo_reportingdb_spark.operators.maintenance import (
    last_wins_dedupe,
)

BUCKET_COL = "bucket"


class BucketedKeyTable:
    """A keyed table persisted as bucket-partitioned parquet."""

    def __init__(self, spark: SparkSession, path: str, key: str,
                 n_buckets: int = 64):
        self.spark = spark
        self.path = path
        self.key = key
        self.n_buckets = n_buckets

    def _with_bucket(self, df: DataFrame) -> DataFrame:
        return df.withColumn(
            BUCKET_COL, F.pmod(F.hash(F.col(self.key)), F.lit(self.n_buckets))
        )

    def exists(self) -> bool:
        return os.path.exists(os.path.join(self.path, "_SUCCESS")) or any(
            e.startswith(f"{BUCKET_COL}=") for e in (
                os.listdir(self.path) if os.path.isdir(self.path) else [])
        )

    def init(self, df: DataFrame) -> None:
        """Create the table from an initial snapshot."""
        (self._with_bucket(df)
         .repartition(self.n_buckets, BUCKET_COL)
         .write.mode("overwrite").partitionBy(BUCKET_COL)
         .parquet(self.path))

    def read(self) -> DataFrame:
        return self.spark.read.parquet(self.path).drop(BUCKET_COL)

    def read_buckets(self, buckets: Sequence[int]) -> DataFrame:
        """Partition-pruned scan: only the named buckets are read."""
        df = self.spark.read.parquet(self.path)
        return df.filter(F.col(BUCKET_COL).isin(list(buckets)))

    def merge(self, changes: DataFrame,
              order_by: Sequence[str] | None = None) -> list[int]:
        """Keyed upsert touching only the buckets present in `changes`.
        Returns the list of rewritten bucket ids."""
        changes = self._with_bucket(changes)
        if order_by:
            changes = last_wins_dedupe(changes, [self.key], order_by)
        affected = [r[0] for r in
                    changes.select(BUCKET_COL).distinct().collect()]
        if not affected:
            return []

        current = self.read_buckets(affected)
        cols = current.columns  # includes bucket
        survivors = current.join(
            changes.select(self.key), on=self.key, how="left_anti")
        merged = survivors.select(*cols).unionByName(changes.select(*cols))

        # dynamic overwrite: only partitions present in `merged` (== the
        # affected buckets) are replaced
        with _partition_overwrite_dynamic(self.spark):
            (merged.repartition(len(affected), BUCKET_COL)
             .write.mode("overwrite").partitionBy(BUCKET_COL)
             .parquet(self.path))
        return sorted(affected)


class _partition_overwrite_dynamic:
    def __init__(self, spark: SparkSession):
        self.spark = spark
        self.prev = None

    def __enter__(self):
        self.prev = self.spark.conf.get(
            "spark.sql.sources.partitionOverwriteMode", "static")
        self.spark.conf.set(
            "spark.sql.sources.partitionOverwriteMode", "dynamic")

    def __exit__(self, *exc):
        self.spark.conf.set(
            "spark.sql.sources.partitionOverwriteMode", self.prev)
