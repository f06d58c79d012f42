"""JDBC source/sink for the production deployment shape (the reference
writes PostgreSQL: PostgrePersistenceService.java).

Spark's JDBC writer supports append/overwrite only — the reference's
`INSERT ... ON CONFLICT DO UPDATE` (S5/S6) has no built-in equivalent — so
upsert goes through the staging-table pattern:

  1. write the change batch to a staging table (append, partitioned JDBC
     write with `batchsize`),
  2. one server-side `INSERT ... SELECT ... ON CONFLICT (key) DO UPDATE`
     from staging into the target (SQL generated here, executed over a
     single driver-side connection),
  3. truncate staging.

This keeps the per-row work inside the database (set-based, one statement)
and the transfer inside Spark's partitioned JDBC writer — the same split
the reference uses between JDBC batching and SQL (C3), minus the
row-at-a-time loop.

The SQL builders are pure and dialect-parameterized: "postgres" is the
production target (the reference's ON CONFLICT forms), "derby" the ANSI
MERGE forms that tests/test_jdbc_sql.py executes end-to-end against the
embedded Derby bundled with Spark. Read paths push down predicates via
Spark's JDBC source options (partitionColumn/lowerBound/upperBound for
parallel scans).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession


def read_jdbc(spark: SparkSession, url: str, table: str,
              properties: dict[str, str] | None = None,
              partition_column: str | None = None,
              num_partitions: int = 8,
              lower_bound=None, upper_bound=None) -> DataFrame:
    """Parallel JDBC scan: with a numeric/date partition column the scan
    fans out across `num_partitions` connections; Catalyst pushes filters
    and column pruning into the generated queries."""
    reader = (spark.read.format("jdbc")
              .option("url", url)
              .option("dbtable", table))
    for k, v in (properties or {}).items():
        reader = reader.option(k, v)
    if partition_column is not None:
        if lower_bound is None or upper_bound is None:
            # str(None) would reach Spark's JDBC source as the literal
            # "None" and die with an opaque parse error at load()
            raise ValueError(
                "partition_column requires explicit lower_bound and "
                "upper_bound")
        reader = (reader.option("partitionColumn", partition_column)
                  .option("numPartitions", str(num_partitions))
                  .option("lowerBound", str(lower_bound))
                  .option("upperBound", str(upper_bound)))
    return reader.load()


def write_append_jdbc(df: DataFrame, url: str, table: str,
                      properties: dict[str, str] | None = None,
                      batch_size: int = 1000) -> None:
    """S7-style append (checkpoint log): partitioned batched insert."""
    writer = (df.write.format("jdbc").mode("append")
              .option("url", url)
              .option("dbtable", table)
              .option("batchsize", str(batch_size)))
    for k, v in (properties or {}).items():
        writer = writer.option(k, v)
    writer.save()


def upsert_sql(target: str, staging: str, columns: Sequence[str],
               keys: Sequence[str], dialect: str = "postgres") -> str:
    """S5/S6 merge statement: staging -> target, last write wins per key.
    (reference: PostgrePersistenceService.java:224,420 — the same ON
    CONFLICT form, but set-based from staging instead of per-row batch.)

    dialect="postgres" emits the reference's INSERT..ON CONFLICT;
    dialect="derby" emits standard MERGE INTO (what the embedded Derby
    the executed round-trip test runs on understands — and incidentally
    the ANSI form most other warehouses accept)."""
    cols = ", ".join(f'"{c}"' for c in columns)
    keycols = ", ".join(f'"{k}"' for k in keys)
    nonkeys = [c for c in columns if c not in keys]
    if dialect == "postgres":
        if not nonkeys:  # all-key table: nothing to update on conflict
            return (
                f'INSERT INTO "{target}" ({cols}) '
                f'SELECT {cols} FROM "{staging}" '
                f"ON CONFLICT ({keycols}) DO NOTHING"
            )
        updates = ", ".join(f'"{c}" = EXCLUDED."{c}"' for c in nonkeys)
        return (
            f'INSERT INTO "{target}" ({cols}) '
            f'SELECT {cols} FROM "{staging}" '
            f"ON CONFLICT ({keycols}) DO UPDATE SET {updates}"
        )
    if dialect == "derby":
        on = " AND ".join(f't."{k}" = s."{k}"' for k in keys)
        updates = ", ".join(f'"{c}" = s."{c}"' for c in nonkeys)
        values = ", ".join(f's."{c}"' for c in columns)
        merge = (
            f'MERGE INTO "{target}" t USING "{staging}" s ON {on} '
        )
        if nonkeys:
            merge += f"WHEN MATCHED THEN UPDATE SET {updates} "
        merge += f"WHEN NOT MATCHED THEN INSERT ({cols}) VALUES ({values})"
        return merge
    raise ValueError(f"unknown dialect: {dialect}")


def conditional_delete_sql(target: str, staging: str,
                           compare_cols: Sequence[str],
                           dialect: str = "postgres") -> str:
    """S8 optimistic-concurrency delete: remove target rows whose FULL
    tuple matches a staging row (null-safe comparison), i.e. rows
    unmodified since they were read.

    postgres: DELETE..USING with IS NOT DISTINCT FROM; derby: correlated
    EXISTS with the expanded null-safe equality (Derby has neither)."""
    if dialect == "postgres":
        cond = " AND ".join(
            f't."{c}" IS NOT DISTINCT FROM s."{c}"' for c in compare_cols)
        return (
            f'DELETE FROM "{target}" t USING "{staging}" s WHERE {cond}'
        )
    if dialect == "derby":
        cond = " AND ".join(
            f'(t."{c}" = s."{c}" OR (t."{c}" IS NULL AND s."{c}" IS NULL))'
            for c in compare_cols)
        return (
            f'DELETE FROM "{target}" t WHERE EXISTS '
            f'(SELECT 1 FROM "{staging}" s WHERE {cond})'
        )
    raise ValueError(f"unknown dialect: {dialect}")


def retention_sql(target: str, ts_col: str, id_col: str,
                  dialect: str = "postgres") -> str:
    """S9 retention: prune rows older than a cutoff but never the newest
    (by insertion order; PostgrePersistenceService.java:172-216).
    Placeholder: %s for psycopg2-style execution, ? for raw JDBC."""
    ph = "%s" if dialect == "postgres" else "?"
    return (
        f'DELETE FROM "{target}" WHERE "{ts_col}" <= {ph} '
        f'AND "{id_col}" <> (SELECT MAX("{id_col}") FROM "{target}")'
    )


def upsert_via_staging(df: DataFrame, url: str, target: str,
                       keys: Sequence[str],
                       order_by: Sequence[str] | None = None,
                       properties: dict[str, str] | None = None,
                       staging_suffix: str = "_staging",
                       dialect: str = "postgres") -> str:
    """Full upsert flow. Returns the merge SQL it runs; execution needs a
    live database reachable from `url` (tests/test_jdbc_sql.py runs the
    whole flow against embedded Derby, the production shape is postgres).

    Two safeguards around the staging table: (1) the batch is deduplicated
    per key before the write — PostgreSQL's ON CONFLICT DO UPDATE raises
    'cannot affect row a second time' if one statement touches a key
    twice; (2) staging is cleared BEFORE the batch lands, so rows left
    over from a previously-failed merge cannot clobber newer values. The
    merge + truncate then run in one transaction."""
    from qucosa_fcrepo_reportingdb_spark.operators.maintenance import (
        last_wins_dedupe,
    )
    staging = f"{target}{staging_suffix}"
    if order_by:
        df = last_wins_dedupe(df, keys, order_by)
    else:
        df = df.dropDuplicates(list(keys))
    _execute_driver_side(url, [f'TRUNCATE TABLE "{staging}"'], properties)
    write_append_jdbc(df, url, staging, properties)
    sql = upsert_sql(target, staging, df.columns, keys, dialect=dialect)
    _execute_driver_side(url, [sql, f'TRUNCATE TABLE "{staging}"'],
                         properties)
    return sql


def _execute_driver_side(url: str, statements: Sequence[str],
                         properties: dict[str, str] | None = None) -> None:
    """Run server-side statements over one JVM DriverManager connection
    (same mechanism Spark's JDBC source uses internally)."""
    from pyspark.sql import SparkSession

    spark = SparkSession.getActiveSession()
    if spark is None:
        raise RuntimeError("no active SparkSession")
    jvm = spark._jvm
    props = jvm.java.util.Properties()
    for k, v in (properties or {}).items():
        props.setProperty(k, v)
    conn = jvm.java.sql.DriverManager.getConnection(url, props)
    try:
        conn.setAutoCommit(False)
        stmt = conn.createStatement()
        try:
            for sql in statements:
                stmt.execute(sql)
            conn.commit()
        except Exception:
            # roll back BEFORE close: closing with an open transaction
            # throws on embedded Derby (SQLSTATE 25001), which would
            # mask the original SQL error and leak the connection
            conn.rollback()
            raise
        finally:
            stmt.close()
    finally:
        conn.close()
