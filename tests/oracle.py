"""Local replica of the driver's correctness gate: run a Spark query and its
DuckDB oracle SQL side-by-side, compare row count, column names, and
order-insensitive values (exact equality after canonical normalization).

If a query passes here at sf0.001/sf0.01 it should pass the driver's
value-hash compare; floats are compared exactly (not approximately) on
purpose — queries must be written so both engines produce bit-identical
results (integer/decimal internal arithmetic, sequential folds for array
math, deterministic tie-breaks)."""

from __future__ import annotations

import datetime as dt
import math
from decimal import Decimal

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def duckdb_connection(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    return con


def _norm(v):
    if v is None:
        return None
    if isinstance(v, Decimal):
        return float(v)
    if isinstance(v, float):
        # canonicalize -0.0 and NaN so hashing is stable
        if math.isnan(v):
            return "NaN"
        return v + 0.0
    if isinstance(v, dt.datetime):
        return v.replace(tzinfo=None).isoformat()
    if isinstance(v, dt.date):
        return v.isoformat()
    if isinstance(v, (list, tuple)):
        return tuple(_norm(x) for x in v)
    if isinstance(v, dict):
        return tuple(sorted((k, _norm(x)) for k, x in v.items()))
    if isinstance(v, bytes):
        return v.hex()
    return v


def _sort_key(row):
    # None sorts before any value without ever comparing across types
    return tuple((v is not None, "" if v is None else str(v)) for v in row)


def _canonical(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    sorted_cols = [cols[i] for i in order]
    canon = sorted(
        (tuple(_norm(row[i]) for i in order) for row in rows),
        key=_sort_key,
    )
    return sorted_cols, canon


def compare(spark_df, con: duckdb.DuckDBPyConnection, sql: str) -> dict:
    s_cols = spark_df.columns
    s_rows = [tuple(r) for r in spark_df.collect()]
    rel = con.execute(sql)
    d_cols = [d[0] for d in rel.description]
    d_rows = rel.fetchall()

    result = {"rows_spark": len(s_rows), "rows_duckdb": len(d_rows)}
    sc, srows = _canonical(s_cols, s_rows)
    dc, drows = _canonical(d_cols, d_rows)
    result["columns_match"] = sc == dc
    result["count_match"] = len(s_rows) == len(d_rows)
    result["values_match"] = srows == drows
    result["ok"] = (result["columns_match"] and result["count_match"]
                    and result["values_match"])
    if not result["columns_match"]:
        result["detail"] = f"spark cols {sc} != duckdb cols {dc}"
    elif not result["values_match"]:
        diff_s = [r for r in srows if r not in drows][:3]
        diff_d = [r for r in drows if r not in srows][:3]
        result["detail"] = f"spark-only {diff_s} | duckdb-only {diff_d}"
    return result
