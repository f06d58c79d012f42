"""Row filters and validation (SURVEY.md §2.2 F1-F5).

The reference validates at value-object construction and silently drops
invalid rows (ReportingDocumentMetadata.java:49-58 throws ->
MetsProcessor.java:209-216 catches and skips). Here validation is a
DataFrame predicate with an explicit quarantine split so bad rows are
observable instead of vanishing — but, like the reference, they are still
CONSUMED from the queue (F4: the header is processed regardless).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from qucosa_fcrepo_reportingdb_spark.functions.timestamps import is_blank

# F1: keep real documents, drop Fedora system objects
# (reference: QucosaDocumentFilter.java:27-47; 13 -> 6 rows on the
# ListIdentifiersToFilter.xml corpus, OaiHarvesterTest.java:126-155).
QUCOSA_ID_PATTERN = r".+qucosa:\d+"


def qucosa_document_filter(df: DataFrame,
                           id_col: str = "record_identifier") -> DataFrame:
    """F1: regex ID filter. rlike is JVM-side and codegen'd; at scale this
    runs inside the scan stage right after the parquet read."""
    return df.filter(F.col(id_col).rlike(QUCOSA_ID_PATTERN))


def identity_filter(df: DataFrame) -> DataFrame:
    """F2: default pass-through (OaiHarvesterBuilder.java:35-40)."""
    return df


def valid_header_predicate() -> Column:
    """F3: reject rows with null key or datestamp on queue scan
    (PostgrePersistenceService.java:301-312)."""
    return (F.col("record_identifier").isNotNull()
            & F.col("datestamp").isNotNull())


def validate_reporting_documents(df: DataFrame) -> tuple[DataFrame, DataFrame]:
    """F4: split extracted METS rows into (valid, quarantined).

    Valid requires non-blank mandator AND non-blank document_type AND a
    parsed distribution_date (the reference's constructor contract,
    ReportingDocumentMetadata.java:49-58). Expects columns mandator,
    document_type, distribution_date (already parsed to timestamp).
    """
    ok = (
        ~is_blank(F.col("mandator"))
        & ~is_blank(F.col("document_type"))
        & F.col("distribution_date").isNotNull()
    )
    return df.filter(ok), df.filter(~ok)
