"""Table-maintenance operators: keyed merge upsert, optimistic-concurrency
conditional delete, retention pruning.

These re-express the reference's SQL sinks as pure DataFrame transforms
(current_table, changes) -> new_table, so they compose with any storage
layer (TableStore overwrite locally; Delta/Iceberg MERGE at cluster scale):

- merge_upsert      <- INSERT ... ON CONFLICT (key) DO UPDATE
                       (reference: PostgrePersistenceService.java:219-280 for
                       OAIHeader S5, :414-482 for ReportingDocuments S6)
- conditional_delete <- DELETE ... WHERE key=? AND <full tuple unchanged>
                       (reference: PostgrePersistenceService.java:345-403 S8;
                       semantics contract PersistenceService.java:72-86)
- retain_recent     <- DELETE FROM run results older than cutoff but always
                       keep the newest row (reference:
                       PostgrePersistenceService.java:172-216 S9)

Scale notes (100 TB posture):
- merge_upsert is a single shuffle on the merge key: the last-wins dedupe
  (window) and the anti-join both hash-partition by `key`, and AQE reuses
  the exchange. If `changes` is small relative to the table (the usual CDC
  shape) the anti-join broadcasts the change-key set automatically.
- No driver-side collect anywhere; everything is keyed and partitionable
  by record_identifier.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def last_wins_dedupe(changes: DataFrame, keys: Sequence[str],
                     order_by: Sequence[str]) -> DataFrame:
    """A4: within one change batch, keep only the newest row per key.

    The reference gets this implicitly from upserting page-by-page in order
    (later page wins — PostgrePersistenceServiceTestIT.java:393-415); a
    set-oriented merge needs it explicit.
    """
    w = Window.partitionBy(*keys).orderBy(*[F.col(c).desc() for c in order_by])
    return (
        changes.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )


def merge_upsert(current: DataFrame, changes: DataFrame, keys: Sequence[str],
                 order_by: Sequence[str] | None = None) -> DataFrame:
    """S5/S6: keyed upsert — rows in `changes` replace same-key rows in
    `current`; new keys are inserted.

    Equivalent SQL: MERGE INTO current USING changes ON keys
                    WHEN MATCHED THEN UPDATE WHEN NOT MATCHED THEN INSERT.
    Implemented as left_anti(current, change_keys) UNION changes so it runs
    on plain parquet. Idempotent: applying the same batch twice yields the
    same table.
    """
    if order_by:
        changes = last_wins_dedupe(changes, keys, order_by)
    cols = current.columns
    survivors = current.join(
        changes.select(*keys), on=list(keys), how="left_anti"
    )
    return survivors.select(*cols).unionByName(changes.select(*cols))


def conditional_delete(current: DataFrame, processed: DataFrame,
                       compare_cols: Sequence[str]) -> DataFrame:
    """S8: optimistic-concurrency delete — remove a row only if the FULL
    tuple (key + datestamp + status ...) still equals what was read; a row
    modified at the source between read and delete survives and is
    reprocessed next cycle (T6 — nothing is ever too late).

    Returns the new table (rows NOT deleted). Null-safe equality (eqNullSafe)
    matches the reference's treatment of nullable columns; array columns
    (set_spec) compare element-wise, which Spark joins support natively.
    """
    cond = [current[c].eqNullSafe(processed[c]) for c in compare_cols]
    return current.join(processed.select(*compare_cols), on=cond, how="left_anti")


def surviving_headers(before: DataFrame, after: DataFrame,
                      keys: Sequence[str]) -> DataFrame:
    """The reference returns the not-deleted survivors from S8
    (PostgrePersistenceService.java:377-395) so the caller can log/retry:
    survivors = processed rows whose key is still present after the delete."""
    return before.join(after.select(*keys), on=list(keys), how="left_semi")


def retain_recent(checkpoints: DataFrame, cutoff, ts_col: str = "timestamp_of_run",
                  id_col: str = "run_id") -> DataFrame:
    """S9: prune checkpoint history older than `cutoff` but ALWAYS keep the
    newest row (by id_col, i.e. insertion order) even if it is old.

    reference: PostgrePersistenceService.java:172-216 (max-ID probe at :177,
    guarded DELETE at :200); tested PostgrePersistenceServiceTestIT.java:231-321.

    The newest-row guard is a 1-row broadcast (max aggregate), not a window
    over the whole table — at scale the checkpoint table is tiny anyway.
    """
    max_id = checkpoints.agg(F.max(id_col).alias("__max_id"))
    return (
        checkpoints.crossJoin(F.broadcast(max_id))
        .filter((F.col(ts_col) > F.lit(cutoff)) | (F.col(id_col) == F.col("__max_id")))
        .drop("__max_id")
    )


def latest_checkpoint(checkpoints: DataFrame, id_col: str = "run_id") -> DataFrame:
    """S3/A2: newest checkpoint = max run_id (insertion order, NOT max
    timestamp — PostgrePersistenceService.java:101, tested
    PostgrePersistenceServiceTestIT.java:195-221). Expressed as
    order-by-desc + limit 1 so Catalyst turns it into a TakeOrderedAndProject
    (no full sort)."""
    return checkpoints.orderBy(F.col(id_col).desc()).limit(1)


def keyed_diff(old: DataFrame, new: DataFrame,
               keys: Sequence[str]) -> DataFrame:
    """Change-data-feed between two snapshots of a keyed table: one row
    per changed key with op in ('insert', 'delete', 'update'). The
    downstream-sync primitive the reference's consumers would need to
    react to reporting-table changes without rescanning (the engine's
    analog of Delta CDF / Debezium snapshots diffing).

    Plan: ONE full-outer shuffle join on the key columns; change
    detection compares the non-key tuples as structs (null-safe by
    construction — struct equality treats NULL fields positionally, the
    same 3-valued-logic escape conditional_delete uses). Unchanged rows
    are dropped before the result materializes, so output is
    O(changes), not O(table)."""
    val_cols = [c for c in new.columns if c not in keys]
    o = old.select(*keys, F.struct(*val_cols).alias("_old"))
    n = new.select(*keys, F.struct(*val_cols).alias("_new"))
    joined = o.join(n, list(keys), "full_outer")
    return (
        joined.withColumn(
            "op",
            F.when(F.col("_old").isNull(), F.lit("insert"))
             .when(F.col("_new").isNull(), F.lit("delete"))
             .when(~F.col("_old").eqNullSafe(F.col("_new")),
                   F.lit("update")))
        .filter(F.col("op").isNotNull())
        .select(*keys, "op",
                F.col("_old").alias("before"), F.col("_new").alias("after"))
    )
