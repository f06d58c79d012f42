"""Explicit StructTypes for the engine's managed tables.

The reference declares fixed DDL (reference:
src/main/db/createSequencesAndTablesProductionDB.sql) and validates rows at
object construction (OaiHeader.java:48-53, OaiRunResult.java:77-99,
ReportingDocumentMetadata.java:46-65). Here the schema IS the StructType —
never inferred — and validation is a DataFrame filter (see
functions/filters.py:validate_reporting_documents).

Type mapping per SURVEY.md §1.4:
  varchar(256)      -> StringType
  varchar(256)[]    -> ArrayType(StringType)   (setSpec — the one nested type)
  timestamptz       -> TimestampType (session TZ pinned to UTC)
  boolean           -> BooleanType
  ID sequence       -> explicit run_id LongType managed by the checkpoint
                       writer (monotonically_increasing_id is NOT stable
                       across batches — SURVEY.md §1.4)
"""

from __future__ import annotations

from pyspark.sql import types as T

# --- oai_run_result: harvest checkpoint log --------------------------------
# reference: createSequencesAndTablesProductionDB.sql:19-28.
# "last run" = max run_id (insertion order), NOT max timestamp
# (PostgrePersistenceService.java:101).
OAI_RUN_RESULT_SCHEMA = T.StructType([
    T.StructField("run_id", T.LongType(), False),
    T.StructField("timestamp_of_run", T.TimestampType(), False),
    T.StructField("response_date", T.TimestampType(), False),
    # three-valued: NULL (absent) | '' (explicit empty token) | value
    # (OaiRunResult.java:60-65,124-131)
    T.StructField("resumption_token", T.StringType(), True),
    T.StructField("resumption_token_expiration_date", T.TimestampType(), True),
    T.StructField("next_from_timestamp", T.TimestampType(), True),
])

# --- oai_header: CDC work queue --------------------------------------------
# reference: createSequencesAndTablesProductionDB.sql:45-52.
OAI_HEADER_SCHEMA = T.StructType([
    T.StructField("record_identifier", T.StringType(), False),   # natural PK
    T.StructField("datestamp", T.TimestampType(), False),
    T.StructField("set_spec", T.ArrayType(T.StringType()), True),
    T.StructField("status_is_deleted", T.BooleanType(), True),
])

# --- reporting_documents: reporting fact table ------------------------------
# reference: createSequencesAndTablesProductionDB.sql:71-79.
REPORTING_DOCUMENTS_SCHEMA = T.StructType([
    T.StructField("record_identifier", T.StringType(), False),   # natural PK
    T.StructField("mandator", T.StringType(), False),
    T.StructField("document_type", T.StringType(), False),
    T.StructField("distribution_date", T.TimestampType(), False),
    T.StructField("header_last_modified", T.TimestampType(), False),
])

# --- parsed OAI page (flattened; FIXTURES.md §4) ----------------------------
OAI_PAGE_SCHEMA = T.StructType([
    T.StructField("response_date", T.TimestampType(), True),
    T.StructField("request_verb", T.StringType(), True),
    T.StructField("headers", T.ArrayType(T.StructType([
        T.StructField("record_identifier", T.StringType(), False),
        T.StructField("datestamp", T.TimestampType(), True),
        T.StructField("set_spec", T.ArrayType(T.StringType()), True),
        T.StructField("status_is_deleted", T.BooleanType(), True),
    ])), True),
    T.StructField("resumption_token", T.StringType(), True),
    T.StructField("resumption_token_expiration", T.TimestampType(), True),
    T.StructField("errors", T.MapType(T.StringType(), T.StringType()), True),
])

# --- extracted METS metadata before validation (FIXTURES.md §5) --------------
METS_EXTRACT_SCHEMA = T.StructType([
    T.StructField("record_identifier", T.StringType(), False),
    T.StructField("mandator", T.StringType(), True),
    T.StructField("document_type", T.StringType(), True),
    T.StructField("distribution_date_raw", T.StringType(), True),
])
