"""Schema-validated file ingest (JSONL / CSV) with corrupt-row routing.

The reference ingests exactly one wire format (OAI/METS XML over HTTP);
a corpus pipeline also receives line-delimited exports. This module is
the file-shaped analog of the XML path's F4 semantics
(MetsProcessor.java:209-216 — reject the record, keep the evidence,
consume the input anyway): every input line lands in exactly one of
(valid rows under the declared schema) or (quarantine rows carrying the
raw line), and ingest never throws on malformed data.

Scale notes: both paths are single-pass over splittable line formats, so
a 100 TB directory parallelizes by file split with no driver
involvement. Both read as text and parse with from_json/from_csv —
expressions, not a second source, so the quarantine split is plain
column logic and stays lazy (the native sources reject a plan whose
pruned column set is corrupt-record-only, e.g. quarantine.count();
SPARK-21610's documented workaround is caching the scan — a non-starter
at 100 TB). The declared schema skips inference — one pass, no type
drift between batches.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from qucosa_fcrepo_reportingdb_spark.memo import cut_lineage

CORRUPT_COL = "_corrupt_record"


def _with_corrupt_col(schema: T.StructType) -> T.StructType:
    """PERMISSIVE capture requires the corrupt column IN the parse schema;
    returns a copy, never mutates the caller's schema."""
    if CORRUPT_COL in schema.fieldNames():
        return schema
    return T.StructType(
        list(schema.fields) + [T.StructField(CORRUPT_COL, T.StringType())])


def read_jsonl_validated(spark: SparkSession, path: str,
                         schema: T.StructType) -> tuple[DataFrame, DataFrame]:
    """Line-delimited JSON under an explicit schema.

    Returns (valid, quarantine). A line is quarantined if it is not
    parseable JSON. Fields present in the line but absent from the
    schema are dropped (projection, not an error); schema fields absent
    from the line are NULL — the tolerant-reader contract that lets
    producers evolve ahead of consumers. Blank lines are ignored (they
    are line-format padding, not records)."""
    full = _with_corrupt_col(schema)
    data_cols = [f.name for f in schema.fields if f.name != CORRUPT_COL]
    parsed = (
        spark.read.text(path)
        .filter(F.length(F.trim("value")) > 0)
        .select(
            F.col("value").alias("raw_line"),
            F.from_json(
                "value", full,
                {"mode": "PERMISSIVE",
                 "columnNameOfCorruptRecord": CORRUPT_COL}).alias("r"),
        )
    )
    bad = F.col("r").isNull() | F.col(f"r.{CORRUPT_COL}").isNotNull()
    valid = (parsed.filter(~bad)
             .select(*[F.col(f"r.{c}").alias(c) for c in data_cols]))
    quarantine = parsed.filter(bad).select("raw_line")
    return valid, quarantine


def read_csv_validated(spark: SparkSession, path: str,
                       schema: T.StructType,
                       header: bool = True) -> tuple[DataFrame, DataFrame]:
    """CSV under an explicit schema; a row with the wrong column count or
    an uncastable value is quarantined with its raw text.

    Same text-scan + parse-expression shape as the JSONL path — the
    native CSV source can't serve a lazily-split quarantine at all
    (column pruning under `.count()` reduces the referenced set to the
    corrupt column alone, which the file source rejects; SPARK-21610's
    documented workaround is caching, a non-starter at 100 TB). With
    header=True, header detection is two-layered:

    1. NORMALIZED line match (per-field trim + unquote == declared
       column list, in order) is silently dropped in every file part —
       byte-equality alone would let `"id","v"` or `id, v` parse as
       data under an all-string schema.
    2. A PARSED row whose value multiset equals the column-name set
       (a reordered or otherwise layer-1-evading header) is routed to
       the QUARANTINE, not the valid table — it is evidence of a
       malformed producer, not silent structure.

    Residuals, documented: (layer 1) a genuine data row spelling exactly
    the declared header is indistinguishable from a header line-wise and
    is dropped — the cost of split-parallel scanning, where "first line
    of the file" is not an O(1) property of a line. (Layer 2) the
    multiset match quarantines any genuine all-string data row whose
    values happen to be a PERMUTATION of the column names (e.g. a
    two-string-column table containing the row (`v`, `id`) under header
    `id,v`) — a false positive by construction, accepted because such a
    row is line-wise indistinguishable from a reordered header; the
    quarantine keeps its raw text, so a downstream audit can recover
    it."""
    full = _with_corrupt_col(schema)
    data_cols = [f.name for f in schema.fields if f.name != CORRUPT_COL]
    ddl = ", ".join(f"{f.name} {f.dataType.simpleString()}"
                    for f in full.fields)
    lines = (spark.read.text(path)
             .filter(F.length(F.trim("value")) > 0))
    name_arr = F.array(*[F.lit(c) for c in data_cols])
    if header:
        norm = F.transform(
            F.split(F.col("value"), ","),
            lambda f: F.regexp_replace(F.trim(f), r'^"(.*)"$', "$1"))
        lines = lines.filter(~norm.eqNullSafe(name_arr))
    parsed = lines.select(
        F.col("value").alias("raw_line"),
        F.from_csv(
            "value", ddl,
            {"mode": "PERMISSIVE",
             "columnNameOfCorruptRecord": CORRUPT_COL}).alias("r"),
    )
    header_like = F.lit(False)
    if header:
        vals = F.array(*[F.col(f"r.{c}").cast("string")
                         for c in data_cols])
        header_like = F.array_sort(vals).eqNullSafe(
            F.array_sort(name_arr))
    bad = (F.col("r").isNull() | F.col(f"r.{CORRUPT_COL}").isNotNull()
           | header_like)
    valid = (parsed.filter(~bad)
             .select(*[F.col(f"r.{c}").alias(c) for c in data_cols]))
    quarantine = parsed.filter(bad).select("raw_line")
    return valid, quarantine


def ingest_to_store(spark: SparkSession, store, path: str,
                    schema: T.StructType, table: str,
                    key_cols: list[str],
                    fmt: str = "jsonl") -> dict[str, int]:
    """File batch -> table store with at-least-once, reject-but-consume
    semantics, idempotent on BOTH sides (the T4/T6 contract): valid rows
    MERGE into `table` on `key_cols`; corrupt lines MERGE into
    `<table>_quarantine` keyed by their content hash — an appended
    quarantine would duplicate the reject evidence on every retry of the
    same batch, inflating reject-rate monitoring N-fold after N retries.
    Returns counts for the run report."""
    reader = read_jsonl_validated if fmt == "jsonl" else read_csv_validated
    valid, quarantine = reader(spark, path, schema)
    # one row per key before the merge: merge_upsert dedupes changes
    # against the STORED rows, not against each other, so two versions of
    # a record in one batch would both land. Line formats carry no
    # ordering column — the intra-batch winner is arbitrary-but-single;
    # producers needing deterministic last-wins add a version column.
    valid = (valid.dropDuplicates(list(key_cols))
             .transform(cut_lineage))              # count + write read one scan
    quarantine = (quarantine
                  .withColumn("line_hash", F.sha2("raw_line", 256))
                  .transform(cut_lineage))
    n_valid = valid.count()
    n_quarantined = quarantine.count()
    if n_valid:
        store.merge_keyed(table, valid, keys=key_cols, schema=schema)
    if n_quarantined:
        store.merge_keyed(f"{table}_quarantine", quarantine,
                          keys=["line_hash"], schema=quarantine.schema)
    return {"valid": n_valid, "quarantined": n_quarantined}
