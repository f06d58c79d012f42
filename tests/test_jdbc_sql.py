"""SQL builders for the JDBC production sinks (no live DB in this
environment — statement generation is the testable surface)."""

from qucosa_fcrepo_reportingdb_spark.sources.jdbc import (
    conditional_delete_sql,
    retention_sql,
    upsert_sql,
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
