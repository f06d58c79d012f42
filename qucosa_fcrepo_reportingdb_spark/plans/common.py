"""Shared helpers for the query surface.

Numeric policy for oracle-verified queries: aggregate double columns through
DECIMAL internally and emit DOUBLE. Decimal addition is exact and
associative, so the result is independent of partitioning/aggregation order
— Spark's partial aggregates and DuckDB's scan order then produce
bit-identical values, which the driver's value-hash compare requires.
Plain SUM(double) would differ in final bits between engines.
"""

from __future__ import annotations

import os

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from qucosa_fcrepo_reportingdb_spark.memo import session_memo

# scale 4 covers the 2-decimal money columns exactly; precision 28 leaves
# room for sums over billions of rows at 100 TB scale.
DEC = "decimal(28,4)"
# wider type for products (price * (1-discount) needs scale 8)
DEC_WIDE = "decimal(38,8)"


def t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Lazy parquet scan for one table; Catalyst prunes columns/filters.

    Defensively pins the session timezone to UTC: the driver may hand us a
    session with a local TZ, which would shift every collected timestamp
    relative to DuckDB's UTC-naive values.

    events.parquet has stored TIMESTAMP(NANOS) in some driver datasets
    (vanilla Spark rejects it; read nanos as long and truncate to
    microseconds — the same truncation DuckDB applies) and plain
    TIMESTAMP(MICROS, isAdjustedToUTC=false) in others, which Spark 4
    infers as TIMESTAMP_NTZ. NTZ breaks epoch arithmetic
    (cast-to-bigint / unix_timestamp are analysis errors on NTZ), so
    normalize every NTZ column to TIMESTAMP — under the pinned UTC
    session the wall-clock values are unchanged, and collected values
    match DuckDB's naive reading bit-for-bit. The cast happens on top of
    the scan, so column pruning/filter pushdown still reach parquet.

    The LAZY scan frame is memoized per (session, dataset, table) —
    r15: every `spark.read.parquet` call re-lists the path and re-reads
    parquet footers on the driver (measured ~100-130 ms per call at
    sf0.1; at 100 TB the relisting is the multi-second driver stall
    guide §6/§7.3 warns about), and a query touching six tables paid it
    six times PER INVOCATION. A deployment reads catalog tables whose
    schema and file index are resolved once; the memo is that seam. No
    data is cached — the frame is an unexecuted scan, so every action
    still computes from parquet.

    INVALIDATION CONTRACT (ADVICE r15): Spark snapshots the parquet
    file index when the DataFrame is created, so any writer that
    rewrites or appends to <sf_dir>/<name>.parquet IN PLACE must call
    memo.clear_session_memo(spark) (or end the session) before the next
    read, or it will see the stale listing / fail on vacated files.
    The test datasets are immutable, so only dataset-rotation or
    regeneration tooling is in scope; tests/conftest.py and the
    regeneration tools already clear it."""
    if spark.conf.get("spark.sql.session.timeZone") != "UTC":
        spark.conf.set("spark.sql.session.timeZone", "UTC")

    def build() -> DataFrame:
        if name == "events":
            spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
            df = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
            if df.schema["ts"].dataType.simpleString() == "bigint":
                df = df.withColumn(
                    "ts", F.timestamp_micros(F.expr("ts div 1000")))
        else:
            df = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
        ntz = [f.name for f in df.schema.fields
               if f.dataType.simpleString() == "timestamp_ntz"]
        for c in ntz:
            df = df.withColumn(c, F.col(c).cast("timestamp"))
        return df

    return session_memo(spark, ("scan", sf_dir, name), build)


def fan_out(df: DataFrame, *key_cols: str) -> DataFrame:
    """Spread a small scan across the session's parallelism before a
    compute-heavy map stage (signature hashing, pandas UDF decode).

    Tiny parquet files arrive as one input split, serializing everything
    downstream; a 1-file scan also defeats AQE (it coalesces by bytes, not
    compute cost). At 100 TB the scan already has thousands of splits and
    this is a no-op — the guard keeps the explicit shuffle out of big-data
    plans."""
    target = df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() >= target:
        return df
    return df.repartition(target, *key_cols) if key_cols else df.repartition(target)


def dsum(col, alias: str) -> Column:
    """Exact sum of a double column, emitted as DOUBLE via
    decimal -> string -> double.

    Decimal accumulation makes the SUM exact and order-independent. The
    final conversion goes THROUGH A STRING on purpose: a direct in-engine
    decimal->double cast is not cross-engine-safe once the unscaled decimal
    exceeds 2^53 (DuckDB converts int128->double then divides — two
    roundings; the JVM rounds once). Both engines render the same exact
    digit string and both parse it with correctly-rounded IEEE semantics,
    so the doubles are bit-identical at any magnitude AND survive every
    collection path (fetchall Decimals vs pandas float64)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.sum(c.cast(DEC)).cast("string").cast("double").alias(alias)


def dsum_wide(col, alias: str) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return F.sum(c.cast(DEC_WIDE)).cast("string").cast("double").alias(alias)


def davg(col, alias: str) -> Column:
    """Exact-sum average: via-string double sum divided by count — one
    IEEE division of bit-identical operands on each engine."""
    c = F.col(col) if isinstance(col, str) else col
    return (F.sum(c.cast(DEC)).cast("string").cast("double")
            / F.count(c).cast("double")).alias(alias)


def sql_dsum(expr: str, alias: str) -> str:
    return (f"CAST(CAST(SUM(CAST({expr} AS DECIMAL(28,4))) AS VARCHAR)"
            f" AS DOUBLE) AS {alias}")


def sql_dsum_wide(expr: str, alias: str) -> str:
    return (f"CAST(CAST(SUM(CAST({expr} AS DECIMAL(38,8))) AS VARCHAR)"
            f" AS DOUBLE) AS {alias}")


def sql_davg(expr: str, alias: str) -> str:
    return (f"(CAST(CAST(SUM(CAST({expr} AS DECIMAL(28,4))) AS VARCHAR)"
            f" AS DOUBLE) / CAST(COUNT({expr}) AS DOUBLE)) AS {alias}")
