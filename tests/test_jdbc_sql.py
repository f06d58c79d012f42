"""JDBC production-sink tests, two layers:

1. SQL builders (pure text — the PostgreSQL production dialect, which no
   database in this sandbox can execute).
2. EXECUTED round-trips against embedded Derby (bundled with Spark), the
   counterpart of the reference's PostgrePersistenceServiceTestIT
   (PostgrePersistenceServiceTestIT.java:335-494): the same staging-table
   upsert / optimistic conditional-delete / keep-newest-retention flows
   run end-to-end through Spark's JDBC writer + a driver-side connection,
   in the Derby dialect.
"""

import pytest
from pyspark.sql import Row

from qucosa_fcrepo_reportingdb_spark.sources.jdbc import (
    _execute_driver_side,
    conditional_delete_sql,
    read_jdbc,
    retention_sql,
    upsert_sql,
    upsert_via_staging,
    write_append_jdbc,
)


def test_upsert_sql_shape():
    sql = upsert_sql(
        "OAIHeader", "OAIHeader_staging",
        ["recordIdentifier", "datestamp", "setSpec", "statusIsDeleted"],
        ["recordIdentifier"])
    assert sql == (
        'INSERT INTO "OAIHeader" ("recordIdentifier", "datestamp", '
        '"setSpec", "statusIsDeleted") '
        'SELECT "recordIdentifier", "datestamp", "setSpec", '
        '"statusIsDeleted" FROM "OAIHeader_staging" '
        'ON CONFLICT ("recordIdentifier") DO UPDATE SET '
        '"datestamp" = EXCLUDED."datestamp", '
        '"setSpec" = EXCLUDED."setSpec", '
        '"statusIsDeleted" = EXCLUDED."statusIsDeleted"'
    )


def test_conditional_delete_is_null_safe_full_tuple():
    sql = conditional_delete_sql(
        "OAIHeader", "processed", ["recordIdentifier", "datestamp"])
    assert "IS NOT DISTINCT FROM" in sql
    assert 't."recordIdentifier" IS NOT DISTINCT FROM s."recordIdentifier"' in sql
    assert sql.startswith('DELETE FROM "OAIHeader" t USING "processed" s')


def test_retention_never_deletes_newest():
    sql = retention_sql("OAIRunResult", "timestampOfRun", "ID")
    assert '"ID" <> (SELECT MAX("ID") FROM "OAIRunResult")' in sql
    assert '"timestampOfRun" <= %s' in sql


# ---------------------------------------------------------------------------
# executed round-trips (embedded Derby)
# ---------------------------------------------------------------------------
@pytest.fixture()
def derby(spark, request):
    """One in-memory Derby database per test, with the header tables the
    reference's IT fixture creates (schema shape from
    PostgrePersistenceServiceTestIT.java / persistence DDL)."""
    name = f"t{abs(hash(request.node.name)) % 10**9}"
    url = f"jdbc:derby:memory:{name};create=true"
    ddl_cols = ('"record_identifier" VARCHAR(128) NOT NULL, '
                '"datestamp" BIGINT, '
                '"set_spec" VARCHAR(256), '
                '"status_is_deleted" BOOLEAN')
    _execute_driver_side(url, [
        f'CREATE TABLE "HEADERS" ({ddl_cols}, '
        f'PRIMARY KEY ("record_identifier"))',
        f'CREATE TABLE "HEADERS_STAGING" ({ddl_cols})',
    ])
    yield url
    try:
        _execute_driver_side(f"jdbc:derby:memory:{name};drop=true", [])
    except Exception:
        pass  # drop reports via SQLException even on success


def _rows(spark, url, table="HEADERS"):
    return {r.record_identifier: r for r in
            read_jdbc(spark, url, f'"{table}"').collect()}


def test_executed_upsert_insert_then_update(spark, derby):
    """S5 executed: first batch inserts, second batch updates matched keys
    and inserts new ones — last write wins per key, like the reference's
    ON CONFLICT path (PostgrePersistenceService.java:219-280)."""
    b1 = spark.createDataFrame([
        Row(record_identifier="qucosa:1", datestamp=100, set_spec="a",
            status_is_deleted=False),
        Row(record_identifier="qucosa:2", datestamp=200, set_spec="b",
            status_is_deleted=False),
    ])
    upsert_via_staging(b1, derby, "HEADERS", keys=["record_identifier"],
                       dialect="derby", staging_suffix="_STAGING")
    assert {k: v.datestamp for k, v in _rows(spark, derby).items()} == {
        "qucosa:1": 100, "qucosa:2": 200}

    b2 = spark.createDataFrame([
        Row(record_identifier="qucosa:2", datestamp=250, set_spec="b2",
            status_is_deleted=True),
        Row(record_identifier="qucosa:3", datestamp=300, set_spec="c",
            status_is_deleted=False),
    ])
    upsert_via_staging(b2, derby, "HEADERS", keys=["record_identifier"],
                       dialect="derby", staging_suffix="_STAGING")
    rows = _rows(spark, derby)
    assert {k: v.datestamp for k, v in rows.items()} == {
        "qucosa:1": 100, "qucosa:2": 250, "qucosa:3": 300}
    assert rows["qucosa:2"].set_spec == "b2"
    assert rows["qucosa:2"].status_is_deleted is True


def test_executed_upsert_intra_batch_last_wins(spark, derby):
    """A batch carrying the same key twice must collapse before the merge
    (PostgreSQL would raise 'cannot affect row a second time'; Derby
    rejects duplicate MATCHED rows the same way)."""
    b = spark.createDataFrame([
        Row(record_identifier="qucosa:1", datestamp=100, set_spec="old",
            status_is_deleted=False),
        Row(record_identifier="qucosa:1", datestamp=150, set_spec="new",
            status_is_deleted=False),
    ])
    upsert_via_staging(b, derby, "HEADERS", keys=["record_identifier"],
                       order_by=["datestamp"], dialect="derby",
                       staging_suffix="_STAGING")
    rows = _rows(spark, derby)
    assert len(rows) == 1 and rows["qucosa:1"].set_spec == "new"


def test_executed_conditional_delete_optimistic(spark, derby):
    """S8 executed: delete removes ONLY rows whose full tuple still
    matches what the worker read — a concurrently-modified row survives
    (the optimistic-concurrency contract,
    PostgrePersistenceService.java:414-482), and NULL columns compare
    equal (the null-safe branch)."""
    seed = spark.createDataFrame([
        Row(record_identifier="qucosa:1", datestamp=100, set_spec="a",
            status_is_deleted=False),
        Row(record_identifier="qucosa:3", datestamp=300, set_spec="c",
            status_is_deleted=False),
    ])
    upsert_via_staging(seed, derby, "HEADERS", keys=["record_identifier"],
                       dialect="derby", staging_suffix="_STAGING")
    # row 2 has a NULL set_spec: inserted driver-side because Spark's
    # Derby dialect setNull()s string columns as CLOB, which Derby
    # rejects against VARCHAR — a writer quirk, not a semantics gap (the
    # null-safe DELETE below still executes against the NULL tuple)
    _execute_driver_side(derby, [
        'INSERT INTO "HEADERS" VALUES (\'qucosa:2\', 200, NULL, false)'])
    # worker read rows 1-3; row 3 is then modified by someone else
    _execute_driver_side(derby, [
        'UPDATE "HEADERS" SET "datestamp" = 999 '
        'WHERE "record_identifier" = \'qucosa:3\''])
    # processed batch = what the worker READ (pre-modification tuples)
    write_append_jdbc(seed, derby, '"HEADERS_STAGING"')
    _execute_driver_side(derby, [
        'INSERT INTO "HEADERS_STAGING" VALUES (\'qucosa:2\', 200, NULL, '
        'false)'])
    cols = ["record_identifier", "datestamp", "set_spec",
            "status_is_deleted"]
    _execute_driver_side(derby, [
        conditional_delete_sql("HEADERS", "HEADERS_STAGING", cols,
                               dialect="derby")])
    rows = _rows(spark, derby)
    # 1 (clean) and 2 (clean, NULL set_spec) deleted; 3 (modified) survives
    assert set(rows) == {"qucosa:3"}
    assert rows["qucosa:3"].datestamp == 999


def test_executed_retention_keeps_newest(spark, derby):
    """S9 executed: prune everything at/below the cutoff EXCEPT the
    newest row by id — the checkpoint log must never go empty
    (PostgrePersistenceService.java:172-216)."""
    _execute_driver_side(derby, [
        'CREATE TABLE "runs" ("id" BIGINT NOT NULL, "ts" BIGINT, '
        'PRIMARY KEY ("id"))',
        'INSERT INTO "runs" VALUES (1, 10), (2, 20), (3, 30)'])
    sql = retention_sql("runs", "ts", "id", dialect="derby") \
        .replace("?", "1000")  # every row is below the cutoff
    _execute_driver_side(derby, [sql])
    rows = read_jdbc(spark, derby, '"runs"').collect()
    assert [(r.id, r.ts) for r in rows] == [(3, 30)]


def test_failed_statement_surfaces_original_error_and_rolls_back(spark, derby):
    """A failing statement must raise the ORIGINAL SQL error (closing a
    connection with an open transaction would otherwise throw Derby's
    25001 and mask it), roll the transaction back atomically, and leave
    the database usable for the next call."""
    ins = ("INSERT INTO \"HEADERS\" VALUES ('{rid}', "
           "100, 'a', FALSE)")
    _execute_driver_side(derby, [ins.format(rid="ok-1")])
    with pytest.raises(Exception) as exc:
        _execute_driver_side(derby, [
            ins.format(rid="ok-2"),
            "INSERT INTO NoSuchTable VALUES (1)",
        ])
    msg = str(exc.value)
    assert "NOSUCHTABLE" in msg.upper()      # the real error, not 25001
    assert "25001" not in msg
    # the failed batch rolled back atomically: ok-2 must NOT be present
    assert set(_rows(spark, derby)) == {"ok-1"}
    # database still healthy after the failure
    _execute_driver_side(derby, [ins.format(rid="ok-3")])
    assert set(_rows(spark, derby)) == {"ok-1", "ok-3"}
