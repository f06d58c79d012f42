"""EXECUTED checks for the PostgreSQL-dialect SQL text (sources/jdbc.py).

The Derby matrix (test_jdbc_sql.py) executes the ANSI MERGE variant; the
production strings — INSERT .. ON CONFLICT (PostgrePersistenceService.java:224)
and DELETE .. USING .. IS NOT DISTINCT FROM (:420) — were until round 6
unit-tested as text only. DuckDB accepts both constructs, so the same
upsert / optimistic-delete / retention semantics run here against the
actual postgres-dialect strings, including the all-columns-are-keys
DO NOTHING edge."""

import duckdb
import pytest

from qucosa_fcrepo_reportingdb_spark.sources.jdbc import (
    conditional_delete_sql,
    retention_sql,
    upsert_sql,
)

COLS = ["record_identifier", "datestamp", "set_spec", "status_is_deleted"]
DDL = ('"record_identifier" VARCHAR NOT NULL, "datestamp" BIGINT, '
       '"set_spec" VARCHAR, "status_is_deleted" BOOLEAN')


@pytest.fixture()
def con():
    c = duckdb.connect()
    c.execute(f'CREATE TABLE "HEADERS" ({DDL}, '
              f'PRIMARY KEY ("record_identifier"))')
    c.execute(f'CREATE TABLE "HEADERS_STAGING" ({DDL})')
    yield c
    c.close()


def _rows(con):
    return {r[0]: r for r in
            con.execute('SELECT * FROM "HEADERS" ORDER BY 1').fetchall()}


def _stage(con, rows):
    con.execute('DELETE FROM "HEADERS_STAGING"')
    con.executemany('INSERT INTO "HEADERS_STAGING" VALUES (?, ?, ?, ?)',
                    rows)


def test_on_conflict_upsert_insert_then_update(con):
    sql = upsert_sql("HEADERS", "HEADERS_STAGING", COLS,
                     ["record_identifier"], dialect="postgres")
    assert "ON CONFLICT" in sql and "EXCLUDED" in sql
    _stage(con, [("qucosa:1", 100, "a", False),
                 ("qucosa:2", 200, "b", False)])
    con.execute(sql)
    assert {k: v[1] for k, v in _rows(con).items()} == {
        "qucosa:1": 100, "qucosa:2": 200}
    # second batch: update matched key, insert new one
    _stage(con, [("qucosa:2", 250, "b2", True),
                 ("qucosa:3", 300, "c", False)])
    con.execute(sql)
    rows = _rows(con)
    assert {k: v[1] for k, v in rows.items()} == {
        "qucosa:1": 100, "qucosa:2": 250, "qucosa:3": 300}
    assert rows["qucosa:2"][2] == "b2" and rows["qucosa:2"][3] is True


def test_on_conflict_all_key_columns_do_nothing(con):
    """All-columns-are-keys edge: nothing to update on conflict, so the
    builder emits DO NOTHING — re-inserting an existing tuple must be a
    no-op, not an error (and not a duplicate)."""
    con.execute('CREATE TABLE "TAGS" ("k" VARCHAR, "v" VARCHAR, '
                'PRIMARY KEY ("k", "v"))')
    con.execute('CREATE TABLE "TAGS_STAGING" ("k" VARCHAR, "v" VARCHAR)')
    sql = upsert_sql("TAGS", "TAGS_STAGING", ["k", "v"], ["k", "v"],
                     dialect="postgres")
    assert sql.endswith("DO NOTHING")
    con.executemany('INSERT INTO "TAGS_STAGING" VALUES (?, ?)',
                    [("a", "1"), ("b", "2")])
    con.execute(sql)
    con.execute(sql)                      # replay: at-least-once delivery
    assert con.execute('SELECT COUNT(*) FROM "TAGS"').fetchone()[0] == 2


def test_delete_using_is_not_distinct_from(con):
    """Optimistic delete executed: clean rows (including a NULL column,
    the null-safe branch) are removed; a concurrently-modified row
    survives."""
    con.executemany('INSERT INTO "HEADERS" VALUES (?, ?, ?, ?)',
                    [("qucosa:1", 100, "a", False),
                     ("qucosa:2", 200, None, False),
                     ("qucosa:3", 300, "c", False)])
    # worker read all three; row 3 is then modified by someone else
    _stage(con, [("qucosa:1", 100, "a", False),
                 ("qucosa:2", 200, None, False),
                 ("qucosa:3", 300, "c", False)])
    con.execute('UPDATE "HEADERS" SET "datestamp" = 999 '
                'WHERE "record_identifier" = \'qucosa:3\'')
    con.execute(conditional_delete_sql("HEADERS", "HEADERS_STAGING", COLS,
                                       dialect="postgres"))
    rows = _rows(con)
    assert set(rows) == {"qucosa:3"} and rows["qucosa:3"][1] == 999


def test_retention_sql_keeps_newest(con):
    con.execute('CREATE TABLE "runs" ("id" BIGINT, "ts" BIGINT)')
    con.executemany('INSERT INTO "runs" VALUES (?, ?)',
                    [(1, 10), (2, 20), (3, 30)])
    sql = retention_sql("runs", "ts", "id", dialect="postgres")
    con.execute(sql.replace("%s", "1000"))   # cutoff above every row
    assert con.execute('SELECT "id", "ts" FROM "runs"').fetchall() == \
        [(3, 30)]
