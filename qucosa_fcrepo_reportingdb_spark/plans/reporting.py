"""The reference's domain operators (SURVEY.md §2.1/§2.4) made
oracle-checkable over the driver's synthetic tables: keyed merge upsert,
optimistic-concurrency conditional delete, retention pruning, regex
filtering, and the reporting aggregation surface the fact table exists for.

Each query calls the REAL operator implementation from
operators/maintenance.py — the oracle SQL re-derives the same result
relationally, so the driver's hash compare validates the operator, not a
reimplementation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from qucosa_fcrepo_reportingdb_spark.functions.timestamps import (
    format_oai_request_timestamp,
    parse_xsd_datetime,
)
from qucosa_fcrepo_reportingdb_spark.operators.maintenance import (
    conditional_delete,
    last_wins_dedupe,
    merge_upsert,
    retain_recent,
)
from qucosa_fcrepo_reportingdb_spark.plans.common import dsum, t

CUTOVER = "2024-01-20 00:00:00"


# --- S5/S6 keyed merge upsert -------------------------------------------------
def merge_upsert_user_state(spark: SparkSession, sf_dir: str) -> DataFrame:
    """'Customer last-event state' table maintenance: current = latest event
    per user before the cutover, changes = latest per user after; the merge
    must keep unchanged users and replace updated ones (reference S5:
    INSERT ... ON CONFLICT DO UPDATE)."""
    ev = t(spark, sf_dir, "events").select(
        "user_id", "event_id", "ts", "event_type", "value")

    # newest-per-key = the A4 operator itself, not a local re-derivation:
    # this query exists to exercise the production merge path, so its
    # dedupe must BE the production dedupe
    def latest(df):
        return last_wins_dedupe(df, keys=["user_id"],
                                order_by=["ts", "event_id"])

    current = latest(ev.filter(F.col("ts") < CUTOVER))
    changes = latest(ev.filter(F.col("ts") >= CUTOVER))
    merged = merge_upsert(current, changes, keys=["user_id"],
                          order_by=["ts", "event_id"])
    return merged.orderBy("user_id")


MERGE_SQL = f"""
WITH latest_before AS (
  SELECT user_id, event_id, ts, event_type, value FROM (
    SELECT *, ROW_NUMBER() OVER (PARTITION BY user_id
                                 ORDER BY ts DESC, event_id DESC) AS rn
    FROM events WHERE ts < TIMESTAMP '{CUTOVER}') WHERE rn = 1),
latest_after AS (
  SELECT user_id, event_id, ts, event_type, value FROM (
    SELECT *, ROW_NUMBER() OVER (PARTITION BY user_id
                                 ORDER BY ts DESC, event_id DESC) AS rn
    FROM events WHERE ts >= TIMESTAMP '{CUTOVER}') WHERE rn = 1)
SELECT user_id, event_id, ts, event_type, value FROM latest_before
WHERE user_id NOT IN (SELECT user_id FROM latest_after)
UNION ALL
SELECT user_id, event_id, ts, event_type, value FROM latest_after
ORDER BY user_id
"""


# --- S8 optimistic-concurrency conditional delete -----------------------------
def conditional_delete_clicks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Queue-consumption semantics: 'processed' snapshot deletes only rows
    whose full tuple is unchanged. Rows whose value was 'modified' after the
    snapshot survive (reference S8 DELETE WHERE key AND tuple-equal)."""
    ev = t(spark, sf_dir, "events")
    queue = ev.filter(F.col("event_type") == "click").select(
        "event_id", "user_id", "ts", "value")
    # snapshot read earlier: rows with even event_id, but a third of them
    # were concurrently "modified" (value bumped) -> those must survive
    snapshot = queue.filter(F.col("event_id") % 2 == 0).withColumn(
        "value",
        F.when(F.col("event_id") % 3 == 0, F.col("value") + 1.0)
        .otherwise(F.col("value")),
    )
    cols = ["event_id", "user_id", "ts", "value"]
    remaining = conditional_delete(queue, snapshot.select(*cols), cols)
    return remaining.orderBy("event_id")


CONDDELETE_SQL = """
WITH queue AS (
  SELECT event_id, user_id, ts, value FROM events WHERE event_type = 'click'),
snapshot AS (
  SELECT event_id, user_id, ts,
         CASE WHEN event_id % 3 = 0 THEN value + 1.0 ELSE value END AS value
  FROM queue WHERE event_id % 2 = 0)
SELECT q.event_id, q.user_id, q.ts, q.value
FROM queue q
WHERE NOT EXISTS (SELECT 1 FROM snapshot s
                  WHERE s.event_id = q.event_id AND s.user_id = q.user_id
                    AND s.ts = q.ts AND s.value = q.value)
ORDER BY q.event_id
"""


# --- S9 retention: prune old, always keep newest ------------------------------
def retention_prune_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Checkpoint-retention semantics on the error-event 'run log': drop
    rows older than the cutoff but always keep the newest row (by event_id,
    insertion order) even when it is itself older than the cutoff."""
    log = t(spark, sf_dir, "events").filter(
        (F.col("event_type") == "error") & (F.col("user_id") < 50)
    ).select("event_id", "ts", "user_id", "value")
    kept = retain_recent(log, cutoff="2024-01-15 00:00:00",
                         ts_col="ts", id_col="event_id")
    return kept.orderBy("event_id")


RETENTION_SQL = """
WITH log AS (
  SELECT event_id, ts, user_id, value FROM events
  WHERE event_type = 'error' AND user_id < 50)
SELECT event_id, ts, user_id, value FROM log
WHERE ts > TIMESTAMP '2024-01-15 00:00:00'
   OR event_id = (SELECT MAX(event_id) FROM log)
ORDER BY event_id
"""


# --- A4 last-wins dedupe ------------------------------------------------------
def last_wins_dedupe_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch dedupe before merge: one row per (user, event_type), newest
    wins (ts, then event_id as the deterministic tiebreak)."""
    ev = t(spark, sf_dir, "events").select(
        "user_id", "event_type", "event_id", "ts", "value")
    out = last_wins_dedupe(ev, keys=["user_id", "event_type"],
                           order_by=["ts", "event_id"])
    return out.orderBy("user_id", "event_type")


DEDUPE_SQL = """
SELECT user_id, event_type, event_id, ts, value
FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY user_id, event_type
                                   ORDER BY ts DESC, event_id DESC) AS rn
      FROM events)
WHERE rn = 1
ORDER BY user_id, event_type
"""


# --- F1 regex filter ----------------------------------------------------------
def regex_filter_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The QucosaDocumentFilter pattern on the documents table: keep docs
    whose source matches src<digits ending in 1-3> and whose text mentions
    'merge' — rlike stays JVM-side (no Python)."""
    docs = t(spark, sf_dir, "documents")
    return (
        docs.filter(F.col("source").rlike(r"^src\d*[1-3]$")
                    & F.col("text").rlike(r"\bmerge\b"))
        .select("doc_id", "source", "lang", "n_chars")
        .orderBy("doc_id")
    )


REGEX_SQL = r"""
SELECT doc_id, source, lang, n_chars
FROM documents
WHERE regexp_matches(source, '^src\d*[1-3]$')
  AND regexp_matches(text, '\bmerge\b')
ORDER BY doc_id
"""


# --- reporting aggregation surface (the reason the fact table exists) ---------
def documents_by_mandator_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """counts by mandator/documentType analog: documents per (lang, source)
    with char stats — the §7 reporting query shape."""
    docs = t(spark, sf_dir, "documents")
    return (
        docs.groupBy("lang", "source")
        .agg(F.count(F.lit(1)).alias("n_documents"),
             F.sum("n_chars").alias("total_chars"),
             F.min("doc_id").alias("first_doc"))
        .orderBy("lang", "source")
    )


BY_MANDATOR_SQL = """
SELECT lang, source, COUNT(*) AS n_documents,
       CAST(SUM(n_chars) AS BIGINT) AS total_chars, MIN(doc_id) AS first_doc
FROM documents
GROUP BY lang, source
ORDER BY lang, source
"""


def monthly_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """distributionDate month/year rollup analog over orders."""
    orders = t(spark, sf_dir, "orders")
    return (
        orders.groupBy(
            F.year("o_orderdate").alias("year"),
            F.month("o_orderdate").alias("month"),
        )
        .agg(F.count(F.lit(1)).alias("n_orders"),
             dsum("o_totalprice", "sum_price"))
        .orderBy("year", "month")
    )


MONTHLY_SQL = """
SELECT CAST(year(o_orderdate) AS INT) AS year,
       CAST(month(o_orderdate) AS INT) AS month,
       COUNT(*) AS n_orders,
       CAST(CAST(SUM(CAST(o_totalprice AS DECIMAL(28,4))) AS VARCHAR) AS DOUBLE) AS sum_price
FROM orders
GROUP BY 1, 2
ORDER BY year, month
"""


def backlog_depth_by_day(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Queue-backlog reporting: error events per day (the CDC-queue depth
    query over oai_header's datestamp in production)."""
    ev = t(spark, sf_dir, "events").filter(F.col("event_type") == "error")
    return (
        ev.groupBy(F.date_trunc("day", F.col("ts")).alias("day"))
        .agg(F.count(F.lit(1)).alias("backlog"),
             F.countDistinct("user_id").alias("n_users"))
        .orderBy("day")
    )


BACKLOG_SQL = """
SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS day, COUNT(*) AS backlog,
       COUNT(DISTINCT user_id) AS n_users
FROM events WHERE event_type = 'error'
GROUP BY 1 ORDER BY day
"""


# --- X7/X8/X9 timestamp round-trip -------------------------------------------
def timestamp_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Format timestamps per X9 (normal + FC3 quirk modes) and re-parse with
    the lenient X7/X8 parser; the oracle computes the expected identity.
    Validates the parser against the engine's own formatter output."""
    ev = t(spark, sf_dir, "events").filter(F.col("event_id") < 500)
    sec = F.date_trunc("second", F.col("ts"))
    normal = format_oai_request_timestamp(sec, fc3_compatibility=False)
    fc3 = format_oai_request_timestamp(sec, fc3_compatibility=True)
    return ev.select(
        "event_id",
        normal.alias("formatted_z"),
        fc3.alias("formatted_fc3"),
        parse_xsd_datetime(normal).alias("reparsed_z"),
        parse_xsd_datetime(fc3).alias("reparsed_fc3"),
    ).orderBy("event_id")


ROUNDTRIP_SQL = """
SELECT event_id,
       strftime(date_trunc('second', ts), '%Y-%m-%dT%H:%M:%SZ') AS formatted_z,
       strftime(date_trunc('second', ts), '%Y-%m-%dT%H:%M:%S') AS formatted_fc3,
       date_trunc('second', ts) AS reparsed_z,
       date_trunc('second', ts) AS reparsed_fc3
FROM events WHERE event_id < 500
ORDER BY event_id
"""


# --- X1-X5 XML round-trip -----------------------------------------------------
def xml_roundtrip_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Build an OAI-PMH-shaped document per row, then run the REAL page
    parser (functions/oai_xml.py: from_xml + 3-valued token) over it. The
    oracle computes the identity the round-trip must reproduce — this puts
    the XML extraction operators under the driver's hash check even though
    DuckDB has no XPath."""
    from qucosa_fcrepo_reportingdb_spark.functions.oai_xml import (
        explode_headers,
        parse_oai_pages,
    )
    docs = t(spark, sf_dir, "documents").filter(F.col("doc_id") < 200)
    xml = F.concat(
        F.lit('<OAI-PMH xmlns="http://www.openarchives.org/OAI/2.0/">'
              "<responseDate>2024-01-01T00:00:00Z</responseDate>"
              '<request verb="ListIdentifiers">x</request><ListIdentifiers>'),
        F.lit('<header status="deleted"><identifier>oai:example.org:qucosa:'),
        F.col("doc_id").cast("string"),
        F.lit("</identifier><datestamp>2024-01-02T03:04:05Z</datestamp>"
              "<setSpec>"),
        F.col("lang"),
        F.lit("</setSpec><setSpec>"),
        F.col("source"),
        F.lit("</setSpec></header></ListIdentifiers></OAI-PMH>"),
    )
    pages = parse_oai_pages(docs.select(xml.alias("xml")), "xml")
    headers = explode_headers(pages)
    return headers.select(
        "record_identifier",
        "datestamp",
        F.col("set_spec").getItem(0).alias("spec_lang"),
        F.col("set_spec").getItem(1).alias("spec_source"),
        "status_is_deleted",
    ).orderBy("record_identifier")


XML_ROUNDTRIP_SQL = """
SELECT 'oai:example.org:qucosa:' || CAST(doc_id AS VARCHAR) AS record_identifier,
       TIMESTAMP '2024-01-02 03:04:05' AS datestamp,
       lang AS spec_lang,
       source AS spec_source,
       TRUE AS status_is_deleted
FROM documents WHERE doc_id < 200
ORDER BY record_identifier
"""


QUERIES = {
    "merge_upsert_user_state": merge_upsert_user_state,
    "conditional_delete_clicks": conditional_delete_clicks,
    "retention_prune_events": retention_prune_events,
    "last_wins_dedupe_events": last_wins_dedupe_events,
    "regex_filter_documents": regex_filter_documents,
    "documents_by_mandator_type": documents_by_mandator_type,
    "monthly_distribution": monthly_distribution,
    "backlog_depth_by_day": backlog_depth_by_day,
    "timestamp_roundtrip": timestamp_roundtrip,
    "xml_roundtrip_extract": xml_roundtrip_extract,
}

ORACLES = {
    "merge_upsert_user_state": MERGE_SQL,
    "conditional_delete_clicks": CONDDELETE_SQL,
    "retention_prune_events": RETENTION_SQL,
    "last_wins_dedupe_events": DEDUPE_SQL,
    "regex_filter_documents": REGEX_SQL,
    "documents_by_mandator_type": BY_MANDATOR_SQL,
    "monthly_distribution": MONTHLY_SQL,
    "backlog_depth_by_day": BACKLOG_SQL,
    "timestamp_roundtrip": ROUNDTRIP_SQL,
    "xml_roundtrip_extract": XML_ROUNDTRIP_SQL,
}
