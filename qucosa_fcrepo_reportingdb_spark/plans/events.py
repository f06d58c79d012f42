"""Event-stream query surface: sessionization, tumbling windows, JSON
extraction, latest-per-key — the streaming-shaped operators (SURVEY.md §2.5)
expressed as batch DataFrame plans over the `events` table. The structured-
streaming wrappers in streaming/jobs.py run the same logical plans
incrementally; these batch forms are the oracle-checkable equivalents.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from qucosa_fcrepo_reportingdb_spark.plans.common import dsum, t


# --- sessionization: lag + gap cumsum ----------------------------------------
SESSION_GAP_S = 1800       # single source of truth: plain form, bucketed
SESSION_BUCKET_S = 86400   # form, and the shared SQL oracle all use it


def sessionize_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sessions = gaps > 30 min per user; emits per-session stats.
    Single shuffle on user_id; both windows share the partitioning."""
    ev = t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    with_gap = ev.withColumn(
        "new_session",
        (F.coalesce(
            F.col("ts").cast("long") - F.lag(F.col("ts").cast("long")).over(w),
            F.lit(0),
        ) > SESSION_GAP_S).cast("int"),
    )
    with_sid = with_gap.withColumn(
        "session_seq",
        F.sum("new_session").over(
            w.rowsBetween(Window.unboundedPreceding, 0)),
    )
    return (
        with_sid.groupBy("user_id", "session_seq")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.min("ts").alias("session_start"),
            F.max("ts").alias("session_end"),
            dsum("value", "session_value"),
        )
        .orderBy("user_id", "session_seq")
    )


SESSIONIZE_SQL = f"""
WITH gaps AS (
  -- epoch_us // 1e6, NOT epoch(): DuckDB's epoch() returns a fractional
  -- DOUBLE while the Spark plan truncates CAST(ts AS LONG) to whole
  -- seconds — a gap in (1800, 1801) would split sessions in one engine
  -- only. Integer microseconds floored to seconds match the truncation.
  SELECT user_id, event_id, ts, value,
         CASE WHEN COALESCE((epoch_us(ts) // 1000000)
                   - (epoch_us(LAG(ts) OVER
              (PARTITION BY user_id ORDER BY ts, event_id)) // 1000000), 0)
              > {SESSION_GAP_S}
              THEN 1 ELSE 0 END AS new_session
  FROM events),
sids AS (
  -- CAST: DuckDB SUM(INT) yields HUGEINT which the driver's pandas
  -- canonicalization turns into float64; Spark emits BIGINT.
  SELECT *, CAST(SUM(new_session) OVER
         (PARTITION BY user_id ORDER BY ts, event_id
          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_seq
  FROM gaps)
SELECT user_id, session_seq, COUNT(*) AS n_events,
       MIN(ts) AS session_start, MAX(ts) AS session_end,
       CAST(CAST(SUM(CAST(value AS DECIMAL(28,4))) AS VARCHAR) AS DOUBLE) AS session_value
FROM sids
GROUP BY user_id, session_seq
ORDER BY user_id, session_seq
"""


def sessionize_events_bucketed(spark: SparkSession,
                               sf_dir: str) -> DataFrame:
    """Skew-resilient sessionization: IDENTICAL output to
    sessionize_events (same oracle), different physical shape. The plain
    form shuffles once on user_id — correct, but a hot user (one key
    holding 10% of a 100 TB stream) serializes an entire partition
    through one task's sort+window. This form does the per-EVENT heavy
    work partitioned by (user_id, day bucket), so a hot user spreads
    across ~days tasks, then merges sessions across bucket boundaries on
    the per-SESSION summary rows (orders of magnitude smaller).

    Exactness: within a bucket, lag/cumsum sees the true predecessor;
    the first event of each bucket starts a provisional session (its true
    predecessor lives in the previous bucket), and the boundary decision
    is re-applied at session granularity — consecutive per-user sessions
    merge iff start_i - end_{i-1} <= gap, the same rule, since
    within-bucket consecutive sessions already have gap > threshold by
    construction. Session numbering is restored by ordering merged
    sessions by start time (sessions are disjoint per user), matching
    the cumsum numbering of the plain form. Value sums stay DECIMAL
    through both levels, so the via-string double emission is
    bit-identical to the single-pass form."""
    from qucosa_fcrepo_reportingdb_spark.plans.common import DEC

    ev = t(spark, sf_dir, "events")
    bucket = (F.col("ts").cast("long") / SESSION_BUCKET_S) \
        .cast("long").alias("bucket")
    wb = Window.partitionBy("user_id", "bucket").orderBy("ts", "event_id")
    with_gap = ev.select(
        "user_id", "ts", "event_id", "value", bucket,
    ).withColumn(
        "new_session",
        (F.coalesce(
            F.col("ts").cast("long")
            - F.lag(F.col("ts").cast("long")).over(wb),
            F.lit(0),
        ) > SESSION_GAP_S).cast("int"),
    ).withColumn(
        "local_seq",
        F.sum("new_session").over(
            wb.rowsBetween(Window.unboundedPreceding, 0)),
    )
    local = (
        with_gap.groupBy("user_id", "bucket", "local_seq")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.min("ts").alias("session_start"),
            F.max("ts").alias("session_end"),
            F.sum(F.col("value").cast(DEC)).alias("value_partial"),
        )
    )
    # per-SESSION merge pass: tiny rows (one per provisional session), so
    # the single-partition-per-user window is no longer the bottleneck
    ws = Window.partitionBy("user_id").orderBy("session_start", "bucket")
    merged = (
        local.withColumn(
            "boundary_gap",
            F.col("session_start").cast("long")
            - F.lag(F.col("session_end").cast("long")).over(ws),
        )
        .withColumn(
            "new_session",
            (F.coalesce("boundary_gap", F.lit(SESSION_GAP_S + 1))
             > SESSION_GAP_S).cast("int"),
        )
        .withColumn(
            "session_seq",
            (F.sum("new_session").over(
                ws.rowsBetween(Window.unboundedPreceding, 0)) - 1)
            .cast("long"),
        )
    )
    return (
        merged.groupBy("user_id", "session_seq")
        .agg(
            F.sum("n_events").alias("n_events"),
            F.min("session_start").alias("session_start"),
            F.max("session_end").alias("session_end"),
            F.sum("value_partial").cast("string").cast("double")
            .alias("session_value"),
        )
        .orderBy("user_id", "session_seq")
    )


# --- tumbling window aggregation ---------------------------------------------
def hourly_event_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling 1-hour windows per event type — the batch form of the
    streaming windowed aggregation (streaming/jobs.py runs it with
    withWatermark + window())."""
    ev = t(spark, sf_dir, "events")
    return (
        ev.groupBy(
            F.date_trunc("hour", F.col("ts")).alias("hour"),
            F.col("event_type"),
        )
        .agg(F.count(F.lit(1)).alias("n_events"),
             dsum("value", "sum_value"),
             F.countDistinct("user_id").alias("n_users"))
        .orderBy("hour", "event_type")
    )


HOURLY_SQL = """
SELECT date_trunc('hour', ts) AS hour, event_type,
       COUNT(*) AS n_events,
       CAST(CAST(SUM(CAST(value AS DECIMAL(28,4))) AS VARCHAR) AS DOUBLE) AS sum_value,
       COUNT(DISTINCT user_id) AS n_users
FROM events
GROUP BY 1, 2
ORDER BY hour, event_type
"""


# --- JSON extraction ----------------------------------------------------------
def event_props_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar JSON path extraction (the engine's semi-structured surface
    beyond XML): props -> $.k, aggregated per event type."""
    ev = t(spark, sf_dir, "events")
    k = F.get_json_object(F.col("props"), "$.k").cast("long")
    return (
        ev.select("event_type", k.alias("k"))
        .groupBy("event_type")
        .agg(F.sum("k").alias("sum_k"),
             F.min("k").alias("min_k"),
             F.max("k").alias("max_k"),
             F.count("k").alias("n_with_k"))
        .orderBy("event_type")
    )


PROPS_SQL = """
SELECT event_type,
       CAST(SUM(k) AS BIGINT) AS sum_k, MIN(k) AS min_k, MAX(k) AS max_k,
       COUNT(k) AS n_with_k
FROM (SELECT event_type, CAST(json_extract_string(props, '$.k') AS BIGINT) AS k
      FROM events)
GROUP BY event_type
ORDER BY event_type
"""


# --- latest-per-key (A2/A4 pattern over a stream) -----------------------------
def latest_event_per_user(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A2 'newest by sequence' + A4 last-wins over the event stream: the
    exact pattern the checkpoint reader and merge dedupe use
    (operators/maintenance.py), made oracle-checkable."""
    ev = t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(F.desc("ts"), F.desc("event_id"))
    return (
        ev.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .select("user_id", "event_id", "ts", "event_type", "value")
        .orderBy("user_id")
    )


LATEST_SQL = """
SELECT user_id, event_id, ts, event_type, value
FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY user_id
                                   ORDER BY ts DESC, event_id DESC) AS rn
      FROM events)
WHERE rn = 1
ORDER BY user_id
"""


# --- event-type funnel (conditional aggregation) ------------------------------
def user_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user funnel: did view -> click -> purchase happen, computed with
    conditional aggregation (single pass, single shuffle)."""
    ev = t(spark, sf_dir, "events")
    step = lambda s: F.max((F.col("event_type") == s).cast("int")).alias(f"did_{s}")  # noqa: E731
    return (
        ev.groupBy("user_id")
        .agg(step("view"), step("click"), step("purchase"))
        .groupBy("did_view", "did_click", "did_purchase")
        .agg(F.count(F.lit(1)).alias("n_users"))
        .orderBy("did_view", "did_click", "did_purchase")
    )


FUNNEL_SQL = """
SELECT did_view, did_click, did_purchase, COUNT(*) AS n_users
FROM (SELECT user_id,
             MAX(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS did_view,
             MAX(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS did_click,
             MAX(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS did_purchase
      FROM events GROUP BY user_id)
GROUP BY did_view, did_click, did_purchase
ORDER BY did_view, did_click, did_purchase
"""


# --- time-decayed aggregates --------------------------------------------------
DECAY_MAX_AGE_H = 40  # cap: 2^-40 ~ 1e-12, far below any signal


def time_decayed_user_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recency-weighted per-user value: sum(value * 2^-age_hours), age
    measured back from the newest event — the freshness-weighted score a
    reporting dashboard ranks users by, computable incrementally (old
    contributions just keep decaying by a constant factor per hour).

    Determinism design: the decay base is a POWER OF TWO, so the weight
    (1 / (1 << age)) and the product value * weight are exact IEEE
    operations — no libm exp() whose last bit differs between the JVM
    and DuckDB. The weighted sum itself is order-free split-integer
    accumulation (the IVF-centroid machinery: scale by 2^80, split into
    two DECIMAL(38,0) halves, recombine via string->double), so the
    result is bit-identical regardless of partitioning.

    Scale shape: the 1-row max-timestamp aggregate broadcasts; one
    map-side-combinable shuffle on user_id."""
    ev = t(spark, sf_dir, "events").select("user_id", "ts", "value")
    ref = ev.agg(F.max(F.col("ts").cast("long")).alias("ref_s"))
    pow2_22, pow2_58, pow2_80 = (float(2 ** 22), float(2 ** 58),
                                 float(2 ** 80))
    aged = (
        ev.crossJoin(F.broadcast(ref))
        .selectExpr(
            "user_id",
            f"least(CAST((ref_s - CAST(ts AS LONG)) div 3600 AS INT), "
            f"{DECAY_MAX_AGE_H}) AS age_h",
            "value")
        .selectExpr(
            "user_id",
            "value / CAST(shiftleft(CAST(1 AS BIGINT), age_h) AS DOUBLE)"
            " AS contrib")
    )
    y = F.col("contrib") * F.lit(pow2_22)
    hi = F.floor(y)
    lo = F.floor((y - hi) * F.lit(pow2_58))
    return (
        aged.select("user_id",
                    hi.cast("decimal(38,0)").alias("hi"),
                    lo.cast("decimal(38,0)").alias("lo"))
        .groupBy("user_id")
        .agg(F.sum("hi").alias("sum_hi"), F.sum("lo").alias("sum_lo"),
             F.count(F.lit(1)).alias("n_events"))
        .select(
            "user_id", "n_events",
            ((F.col("sum_hi").cast("string").cast("double") * F.lit(pow2_58)
              + F.col("sum_lo").cast("string").cast("double"))
             / F.lit(pow2_80)).alias("decayed_value"),
        )
        .orderBy("user_id")
    )


TIME_DECAYED_SQL = f"""
WITH ref AS (SELECT MAX(epoch_us(ts) // 1000000) AS ref_s FROM events),
aged AS (
  -- epoch_us // 1e6, NOT CAST(epoch(ts) AS BIGINT): the latter ROUNDS
  -- the fractional-second double (1800.7 -> 1801) while Spark's
  -- CAST(ts AS LONG) truncates — confirmed divergent at sf0.1 (two
  -- events land in adjacent age buckets, users 98/926 hash-mismatch)
  SELECT user_id,
         LEAST(CAST((ref.ref_s - epoch_us(ts) // 1000000) // 3600 AS INT),
               {DECAY_MAX_AGE_H}) AS age_h,
         value
  FROM events, ref),
contribs AS (
  SELECT user_id,
         value / CAST((CAST(1 AS BIGINT) << age_h) AS DOUBLE) AS contrib
  FROM aged),
split AS (
  SELECT user_id,
         CAST(CAST(floor(contrib * {2 ** 22}.0) AS BIGINT)
              AS DECIMAL(38,0)) AS hi,
         CAST(CAST(floor((contrib * {2 ** 22}.0
                          - floor(contrib * {2 ** 22}.0))
                         * {2 ** 58}.0) AS BIGINT) AS DECIMAL(38,0)) AS lo
  FROM contribs)
SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n_events,
       (CAST(CAST(SUM(hi) AS VARCHAR) AS DOUBLE) * {2 ** 58}.0
        + CAST(CAST(SUM(lo) AS VARCHAR) AS DOUBLE)) / {2 ** 80}.0
       AS decayed_value
FROM split
GROUP BY user_id
ORDER BY user_id
"""


# --- Markov transition matrix over per-user event sequences ------------------
def event_transition_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order Markov transitions between consecutive event types per
    user: (from_type, to_type, n, p) with p = n / outgoing(from_type).

    Plan: ONE shuffle on user_id for the lag window (same partitioning
    the sessionizer uses), then a combinable pair-count aggregation and a
    broadcast-sized window over at most |types|^2 rows for the
    denominator. The transition table is bounded by the type-vocabulary
    squared regardless of corpus size, so everything after the first
    aggregation is constant-cost at 100 TB. p is one IEEE division of two
    exact BIGINTs — bit-identical cross-engine."""
    ev = t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    pairs = (
        ev.select("user_id", "ts", "event_id", "event_type")
        .withColumn("prev_type", F.lag("event_type").over(w))
        .filter(F.col("prev_type").isNotNull())
        .groupBy(F.col("prev_type").alias("from_type"),
                 F.col("event_type").alias("to_type"))
        .agg(F.count(F.lit(1)).alias("n"))
    )
    denom = Window.partitionBy("from_type")
    return (
        pairs.withColumn(
            "p",
            F.col("n").cast("double") / F.sum("n").over(denom).cast("double"))
        .orderBy("from_type", "to_type")
    )


TRANSITION_SQL = """
WITH seq AS (
  SELECT user_id, event_type,
         LAG(event_type) OVER (PARTITION BY user_id
                               ORDER BY ts, event_id) AS prev_type
  FROM events),
pairs AS (
  SELECT prev_type AS from_type, event_type AS to_type, COUNT(*) AS n
  FROM seq WHERE prev_type IS NOT NULL
  GROUP BY 1, 2)
SELECT from_type, to_type, n,
       CAST(n AS DOUBLE)
       / CAST(SUM(n) OVER (PARTITION BY from_type) AS DOUBLE) AS p
FROM pairs
ORDER BY from_type, to_type
"""


QUERIES = {
    "sessionize_events": sessionize_events,
    "event_transition_matrix": event_transition_matrix,
    "time_decayed_user_value": time_decayed_user_value,
    "sessionize_events_bucketed": sessionize_events_bucketed,
    "hourly_event_stats": hourly_event_stats,
    "event_props_stats": event_props_stats,
    "latest_event_per_user": latest_event_per_user,
    "user_funnel": user_funnel,
}

ORACLES = {
    "sessionize_events": SESSIONIZE_SQL,
    "event_transition_matrix": TRANSITION_SQL,
    "time_decayed_user_value": TIME_DECAYED_SQL,
    # same oracle on purpose: the bucketed form is a physical-shape
    # variant with identical semantics
    "sessionize_events_bucketed": SESSIONIZE_SQL,
    "hourly_event_stats": HOURLY_SQL,
    "event_props_stats": PROPS_SQL,
    "latest_event_per_user": LATEST_SQL,
    "user_funnel": FUNNEL_SQL,
}


# --- streaming form under the oracle gate ------------------------------------
def streaming_hourly_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The hourly aggregation executed as a Structured Streaming query
    (readStream over the same parquet, watermark + tumbling window,
    complete-mode memory sink) run to completion — proving the incremental
    plan converges to the batch answer under the driver's oracle hash.

    Uses event-time columns only, so the streaming and batch results are
    deterministic and identical."""
    import os
    import tempfile
    import uuid

    from pyspark.sql import types as T

    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    # The driver's events.parquet has shipped with ts as TIMESTAMP(NANOS)
    # (readable only as long under nanosAsLong) and as TIMESTAMP(MICROS,
    # isAdjustedToUTC=false) (inferred NTZ). Probe the batch reader's
    # inferred schema and mirror it for the stream, normalizing to
    # TIMESTAMP after the scan in each case.
    probed = spark.read.parquet(os.path.join(sf_dir, "events.parquet")).schema
    ts_kind = probed["ts"].dataType.simpleString()
    ts_field = {
        "bigint": T.LongType(),
        "timestamp_ntz": T.TimestampNTZType(),
    }.get(ts_kind, T.TimestampType())
    schema = T.StructType([
        T.StructField("event_id", T.LongType()),
        T.StructField("ts", ts_field),
        T.StructField("user_id", T.LongType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("value", T.DoubleType()),
        T.StructField("props", T.StringType()),
    ])
    name = f"stream_hourly_{uuid.uuid4().hex[:8]}"
    src = (
        spark.readStream.schema(schema)
        .option("pathGlobFilter", "events.parquet")  # file source needs a dir
        .parquet(sf_dir)
    )
    if ts_kind == "bigint":  # nanos-as-long: truncate to micros
        src = src.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    else:
        src = src.withColumn("ts", F.col("ts").cast("timestamp"))
    agg = (
        src.withWatermark("ts", "10 minutes")
        .groupBy(F.window("ts", "1 hour").alias("w"), F.col("event_type"))
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(F.col("w.start").alias("hour"), "event_type", "n_events")
    )
    q = (
        agg.writeStream.outputMode("complete")
        .format("memory").queryName(name)
        .option("checkpointLocation",
                os.path.join(tempfile.mkdtemp(), name))
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    return spark.table(name).orderBy("hour", "event_type")


STREAMING_HOURLY_SQL = """
SELECT date_trunc('hour', ts) AS hour, event_type, COUNT(*) AS n_events
FROM events
GROUP BY 1, 2
ORDER BY hour, event_type
"""

QUERIES["streaming_hourly_counts"] = streaming_hourly_counts
ORACLES["streaming_hourly_counts"] = STREAMING_HOURLY_SQL


# --- array-valued aggregation -------------------------------------------------
def user_event_type_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct event types per user, emitted as a '|'-joined SORTED string
    (collect_set + sort for cross-engine determinism) plus first/last
    activity. The string form (not an array column) keeps the result
    canonicalizable by the driver's pandas-based hash compare, which cannot
    sort list-valued columns."""
    ev = t(spark, sf_dir, "events").filter(F.col("user_id") < 100)
    return (
        ev.groupBy("user_id")
        .agg(
            F.array_join(
                F.sort_array(F.collect_set("event_type")), "|"
            ).alias("event_types"),
            F.min("ts").alias("first_seen"),
            F.max("ts").alias("last_seen"),
        )
        .orderBy("user_id")
    )


EVENT_TYPE_SETS_SQL = """
SELECT user_id,
       list_aggregate(list_sort(list(DISTINCT event_type)),
                      'string_agg', '|') AS event_types,
       MIN(ts) AS first_seen, MAX(ts) AS last_seen
FROM events WHERE user_id < 100
GROUP BY user_id
ORDER BY user_id
"""

QUERIES["user_event_type_sets"] = user_event_type_sets
ORACLES["user_event_type_sets"] = EVENT_TYPE_SETS_SQL


# --- cohort retention ---------------------------------------------------------
def user_retention_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly cohort retention (the standard growth-analytics matrix): a
    user's cohort is the Monday-truncated week of their FIRST event;
    n_active counts distinct cohort users active in each later week,
    keyed by week offset from the cohort.

    Scale shape: one aggregation for first-event per user, one distinct
    over (user, week) — both map-side combinable, both shuffling on
    user_id so the join that follows reuses the partitioning; the final
    rollup groups a frame that is O(users x active weeks). Cohort weeks
    stay TIMESTAMP (not DATE): the two engines canonicalize date columns
    through different pandas types."""
    ev = t(spark, sf_dir, "events")
    cohorts = (
        ev.groupBy("user_id")
        .agg(F.min("ts").alias("first_ts"))
        .select("user_id", F.date_trunc("week", "first_ts")
                .alias("cohort_week"))
    )
    activity = ev.select(
        "user_id", F.date_trunc("week", "ts").alias("event_week")
    ).distinct()
    return (
        activity.join(cohorts, "user_id")
        .selectExpr(
            "cohort_week",
            "CAST(datediff(CAST(event_week AS DATE), "
            "CAST(cohort_week AS DATE)) DIV 7 AS BIGINT) AS week_offset",
            "user_id",
        )
        .groupBy("cohort_week", "week_offset")
        .agg(F.countDistinct("user_id").alias("n_active"))
        .orderBy("cohort_week", "week_offset")
    )


RETENTION_SQL = """
WITH cohorts AS (
  SELECT user_id, date_trunc('week', MIN(ts)) AS cohort_week
  FROM events GROUP BY user_id),
activity AS (
  SELECT DISTINCT user_id, date_trunc('week', ts) AS event_week
  FROM events)
SELECT c.cohort_week,
       CAST(date_diff('day', CAST(c.cohort_week AS DATE),
                      CAST(a.event_week AS DATE)) // 7 AS BIGINT)
         AS week_offset,
       CAST(COUNT(DISTINCT a.user_id) AS BIGINT) AS n_active
FROM activity a JOIN cohorts c USING (user_id)
GROUP BY 1, 2
ORDER BY 1, 2
"""

QUERIES["user_retention_cohorts"] = user_retention_cohorts
ORACLES["user_retention_cohorts"] = RETENTION_SQL


# --- CDC snapshot diff --------------------------------------------------------
CDC_LOOKBACK_HOURS = 6


def user_state_cdc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Change-data-capture report between two per-user state snapshots:
    latest event per user as of (max ts - {CDC_LOOKBACK_HOURS} h) vs
    latest overall, classified insert / update / unchanged — the
    incremental-view-maintenance diff a downstream sync consumes.

    Scale shape: each snapshot is a WindowGroupLimit top-1 per user
    (bounded state, map-side partial limit), and the diff is one full
    outer shuffle join on user_id — both windows and the join share the
    user_id partitioning, so AQE coalesces to a single exchange chain.
    The cutoff stays IN-ENGINE as a 1-row broadcast: a collect()/lit()
    round-trip would convert the timestamp through the OS-local
    timezone (PySpark's fromInternal uses datetime.fromtimestamp), so
    on a non-UTC host the re-injected literal — and with DST even the
    6-hour subtraction — could diverge from the oracle's absolute
    MAX(ts) - INTERVAL arithmetic."""
    ev = t(spark, sf_dir, "events")
    cut = ev.agg(
        (F.max("ts") - F.expr(f"INTERVAL {CDC_LOOKBACK_HOURS} HOURS"))
        .alias("cut"))
    from qucosa_fcrepo_reportingdb_spark.operators.maintenance import (
        last_wins_dedupe,
    )

    # newest-per-key via the A4 operator (shared with the merge path)
    def latest(df: DataFrame) -> DataFrame:
        return (last_wins_dedupe(df, keys=["user_id"],
                                 order_by=["ts", "event_id"])
                .select("user_id", "event_id", "event_type", "ts"))

    old = latest(ev.join(F.broadcast(cut))
                 .filter(F.col("ts") <= F.col("cut"))).alias("o")
    new = latest(ev).alias("n")
    return (
        old.join(new, F.col("o.user_id") == F.col("n.user_id"), "full_outer")
        .select(
            F.coalesce(F.col("o.user_id"), F.col("n.user_id"))
            .alias("user_id"),
            F.col("o.event_id").alias("old_event_id"),
            F.col("o.event_type").alias("old_type"),
            F.col("o.ts").alias("old_ts"),
            F.col("n.event_id").alias("new_event_id"),
            F.col("n.event_type").alias("new_type"),
            F.col("n.ts").alias("new_ts"),
            F.when(F.col("o.event_id").isNull(), F.lit("insert"))
            .when(F.col("o.event_id") == F.col("n.event_id"),
                  F.lit("unchanged"))
            .otherwise(F.lit("update")).alias("change_type"),
        )
        .orderBy("user_id")
    )


USER_STATE_CDC_SQL = f"""
WITH cut AS (SELECT MAX(ts) - INTERVAL {CDC_LOOKBACK_HOURS} HOUR AS c
             FROM events),
old AS (
  SELECT user_id, event_id, event_type, ts FROM (
    SELECT *, ROW_NUMBER() OVER (PARTITION BY user_id
                                 ORDER BY ts DESC, event_id DESC) AS r
    FROM events WHERE ts <= (SELECT c FROM cut)) WHERE r = 1),
new AS (
  SELECT user_id, event_id, event_type, ts FROM (
    SELECT *, ROW_NUMBER() OVER (PARTITION BY user_id
                                 ORDER BY ts DESC, event_id DESC) AS r
    FROM events) WHERE r = 1)
SELECT COALESCE(o.user_id, n.user_id) AS user_id,
       o.event_id AS old_event_id, o.event_type AS old_type, o.ts AS old_ts,
       n.event_id AS new_event_id, n.event_type AS new_type, n.ts AS new_ts,
       CASE WHEN o.event_id IS NULL THEN 'insert'
            WHEN o.event_id = n.event_id THEN 'unchanged'
            ELSE 'update' END AS change_type
FROM old o FULL OUTER JOIN new n ON o.user_id = n.user_id
ORDER BY user_id
"""

QUERIES["user_state_cdc"] = user_state_cdc
ORACLES["user_state_cdc"] = USER_STATE_CDC_SQL


# --- sliding-window aggregation ----------------------------------------------
def sliding_active_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Active users per 2-hour window sliding every hour — the overlap
    variant of the tumbling hourly stats (each event lands in exactly
    two windows). Spark's window(ts, '2 hours', '1 hour') generates both
    window memberships scan-side and aggregates once; the oracle states
    the same semantics by exploding each event into its two window
    starts. Same plan budget as a tumbling window: one combinable
    shuffle keyed on (window, nothing skewed)."""
    ev = t(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", "2 hours", "1 hour").alias("w"))
        .agg(F.countDistinct("user_id").alias("n_active_users"),
             F.count(F.lit(1)).alias("n_events"))
        .select(F.col("w.start").alias("win_start"),
                F.col("w.end").alias("win_end"),
                "n_active_users", "n_events")
        .orderBy("win_start")
    )


SLIDING_ACTIVE_SQL = """
WITH mem AS (
  SELECT user_id,
         unnest([date_trunc('hour', ts) - INTERVAL 1 HOUR,
                 date_trunc('hour', ts)]) AS win_start
  FROM events)
SELECT win_start, win_start + INTERVAL 2 HOUR AS win_end,
       COUNT(DISTINCT user_id) AS n_active_users,
       CAST(COUNT(*) AS BIGINT) AS n_events
FROM mem
GROUP BY win_start
ORDER BY win_start
"""

QUERIES["sliding_active_users"] = sliding_active_users
ORACLES["sliding_active_users"] = SLIDING_ACTIVE_SQL


# --- rolling anomaly scores over the aggregated series ------------------------
ANOMALY_TRAIL = 24  # trailing hours in the baseline window


def hourly_anomaly_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per (event_type, hour) anomaly score against the trailing
    24-OBSERVED-HOUR baseline — a ROWS frame over the hourly rollup, so
    hours with zero events do not appear in the series and the baseline
    spans more wall-clock for sparse types. For a strict wall-clock
    baseline, densify first with hourly_gap_fill (zero-filled hours)
    and run the same frame over the spine.
    z = (n - trailing_mean) / sqrt(trailing_var + 1).

    Determinism: the rolling frame aggregates INTEGER counts (sum, count,
    sum of squares are exact BIGINTs in any order); mean and variance
    then come from one fixed sequence of IEEE divisions and a sqrt — no
    order-sensitive float accumulation anywhere. The +1 in the variance
    regularizes the all-equal window instead of dividing by zero.

    Scale shape: the rollup is one combinable shuffle; the rolling
    window runs per event_type over the (tiny) aggregated series — at
    100 TB the series length is hours, not rows, so the window state is
    trivial regardless of event volume. n^2 stays < 2^63 for any hourly
    count below ~3e9."""
    ev = t(spark, sf_dir, "events")
    hourly = (ev.groupBy(F.date_trunc("hour", F.col("ts")).alias("hour"),
                         "event_type")
              .agg(F.count(F.lit(1)).alias("n")))
    w = (Window.partitionBy("event_type").orderBy("hour")
         .rowsBetween(-ANOMALY_TRAIL, -1))
    stats = hourly.select(
        "event_type", "hour", "n",
        F.sum("n").over(w).alias("t_sum"),
        F.count("n").over(w).alias("t_cnt"),
        F.sum(F.col("n") * F.col("n")).over(w).alias("t_sumsq"),
    )
    mean = F.col("t_sum").cast("double") / F.col("t_cnt").cast("double")
    var = (F.col("t_sumsq").cast("double") / F.col("t_cnt").cast("double")
           - mean * mean)
    return (
        stats.filter(F.col("t_cnt") > 0)
        .select(
            "event_type", "hour", "n",
            mean.alias("trailing_mean"),
            ((F.col("n").cast("double") - mean)
             / F.sqrt(var + F.lit(1.0))).alias("z_score"),
        )
        .orderBy("event_type", "hour")
    )


HOURLY_ANOMALY_SQL = f"""
WITH hourly AS (
  SELECT date_trunc('hour', ts) AS hour, event_type,
         CAST(COUNT(*) AS BIGINT) AS n
  FROM events GROUP BY 1, 2),
stats AS (
  SELECT event_type, hour, n,
         CAST(SUM(n) OVER w AS BIGINT) AS t_sum,
         CAST(COUNT(n) OVER w AS BIGINT) AS t_cnt,
         CAST(SUM(n * n) OVER w AS BIGINT) AS t_sumsq
  FROM hourly
  WINDOW w AS (PARTITION BY event_type ORDER BY hour
               ROWS BETWEEN {ANOMALY_TRAIL} PRECEDING AND 1 PRECEDING))
SELECT event_type, hour, n,
       CAST(t_sum AS DOUBLE) / CAST(t_cnt AS DOUBLE) AS trailing_mean,
       (CAST(n AS DOUBLE) - CAST(t_sum AS DOUBLE) / CAST(t_cnt AS DOUBLE))
         / sqrt(CAST(t_sumsq AS DOUBLE) / CAST(t_cnt AS DOUBLE)
                - (CAST(t_sum AS DOUBLE) / CAST(t_cnt AS DOUBLE))
                  * (CAST(t_sum AS DOUBLE) / CAST(t_cnt AS DOUBLE))
                + 1.0) AS z_score
FROM stats
WHERE t_cnt > 0
ORDER BY event_type, hour
"""

QUERIES["hourly_anomaly_scores"] = hourly_anomaly_scores
ORACLES["hourly_anomaly_scores"] = HOURLY_ANOMALY_SQL


# ---------------------------------------------------------------------------
# gap-filled time series (dense hour spine over a sparse signal)
# ---------------------------------------------------------------------------
GAP_FILL_TYPE = "error"
GAP_FILL_MIN_VALUE = 95.0


def hourly_gap_fill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dense hourly series for a sparse signal (high-value '{type}'
    events): generate the complete hour spine between the signal's first
    and last hour, left-join the actual hourly aggregates, and emit
    zero-filled rows with an is_gap marker — the resample/asfreq step
    every monitoring query needs before rolling windows make sense
    (hourly_anomaly_scores' z-scores are biased if empty hours silently
    disappear).

    Scale shape: the spine is one row per hour (time-bounded, tiny),
    exploded from a 1-row min/max aggregate and broadcast into the
    left join against the aggregated (not raw) series."""
    ev = t(spark, sf_dir, "events").filter(
        (F.col("event_type") == GAP_FILL_TYPE)
        & (F.col("value") > GAP_FILL_MIN_VALUE))
    hourly = (ev.groupBy(F.date_trunc("hour", "ts").alias("hour"))
              .agg(F.count(F.lit(1)).alias("n"),
                   dsum("value", "sv")))
    spine = (ev.agg(F.date_trunc("hour", F.min("ts")).alias("h0"),
                    F.date_trunc("hour", F.max("ts")).alias("h1"))
             .selectExpr("explode(sequence(h0, h1, interval 1 hour))"
                         " AS hour"))
    return (
        spine.join(F.broadcast(hourly), "hour", "left")
        .selectExpr("hour",
                    "CAST(coalesce(n, 0) AS BIGINT) AS n_events",
                    "coalesce(sv, 0.0) AS sum_value",
                    "n IS NULL AS is_gap")
        .orderBy("hour")
    )


GAP_FILL_SQL = f"""
WITH ev AS (
  SELECT * FROM events
  WHERE event_type = '{GAP_FILL_TYPE}' AND value > {GAP_FILL_MIN_VALUE}),
hourly AS (
  SELECT date_trunc('hour', ts) AS hour, COUNT(*) AS n,
         CAST(CAST(SUM(CAST(value AS DECIMAL(28,4))) AS VARCHAR) AS DOUBLE)
           AS sv
  FROM ev GROUP BY 1),
spine AS (
  SELECT unnest(generate_series(date_trunc('hour', MIN(ts)),
                                date_trunc('hour', MAX(ts)),
                                INTERVAL 1 HOUR)) AS hour
  FROM ev)
SELECT spine.hour, CAST(COALESCE(n, 0) AS BIGINT) AS n_events,
       COALESCE(sv, 0.0) AS sum_value, n IS NULL AS is_gap
FROM spine LEFT JOIN hourly ON hourly.hour = spine.hour
ORDER BY spine.hour
"""

QUERIES["hourly_gap_fill"] = hourly_gap_fill
ORACLES["hourly_gap_fill"] = GAP_FILL_SQL


# ---------------------------------------------------------------------------
# incremental view maintenance: merge of partial aggregates == recompute
# ---------------------------------------------------------------------------
IVM_CUTOFF = "2024-01-20"


def ivm_hourly_refresh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental refresh of the hourly rollup: aggregate the base
    partition (ts < cutoff) and the delta partition (ts >= cutoff)
    SEPARATELY, then merge by adding partial states — the pattern that
    turns a daily full recompute into an append-only incremental job.
    The oracle recomputes the rollup over all events in one pass, so the
    driver hash-match IS the proof that merge(base, delta) == recompute.

    COUNT and decimal SUM merge by addition (kept decimal until the one
    final via-string cast, so partial merge order cannot change a bit);
    COUNT DISTINCT deliberately does NOT appear — it is not mergeable
    without a sketch, which is exactly what hll_distinct_arith's
    register union exists for.

    Scale shape: each side aggregates map-side-combinably on its own
    pruned scan (the cutoff filter prunes partitions at 100 TB); the
    merge is a full-outer join on the tiny (hour, type) key space."""
    ev = t(spark, sf_dir, "events")

    def part(pred) -> DataFrame:
        return (ev.filter(pred)
                .groupBy(F.date_trunc("hour", "ts").alias("hour"),
                         "event_type")
                .agg(F.count(F.lit(1)).alias("n"),
                     F.sum(F.col("value").cast("decimal(28,4)"))
                     .alias("sv")))

    base = part(F.col("ts") < F.lit(IVM_CUTOFF))
    delta = part(F.col("ts") >= F.lit(IVM_CUTOFF))
    b, d = base.alias("b"), delta.alias("d")
    return (
        b.join(d, ["hour", "event_type"], "full_outer")
        .selectExpr(
            "hour", "event_type",
            "CAST(coalesce(b.n, 0) + coalesce(d.n, 0) AS BIGINT)"
            " AS n_events",
            "CAST(CAST(coalesce(b.sv, CAST(0 AS decimal(28,4)))"
            " + coalesce(d.sv, CAST(0 AS decimal(28,4))) AS STRING)"
            " AS DOUBLE) AS sum_value")
        .orderBy("hour", "event_type")
    )


IVM_SQL = """
SELECT date_trunc('hour', ts) AS hour, event_type,
       CAST(COUNT(*) AS BIGINT) AS n_events,
       CAST(CAST(SUM(CAST(value AS DECIMAL(28,4))) AS VARCHAR) AS DOUBLE)
         AS sum_value
FROM events
GROUP BY 1, 2
ORDER BY hour, event_type
"""

QUERIES["ivm_hourly_refresh"] = ivm_hourly_refresh
ORACLES["ivm_hourly_refresh"] = IVM_SQL


# ---------------------------------------------------------------------------
# native session_window under the oracle gate (batch form)
# ---------------------------------------------------------------------------
def session_window_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The NATIVE session_window operator (not the lag/cumsum rewrite of
    sessionize_events) under the correctness gate: Spark merges an
    event whose ts is <= the previous window's end, so a gap of EXACTLY
    30:00 still merges (inclusive boundary — verified on a 30-second
    grid where exact-gap ties are common; sessionize_events' lag/cumsum
    form uses the same > split). The oracle reproduces the boundary at
    microsecond resolution with epoch_us; session_end = last event +
    gap.

    Scale shape: one shuffle on the grouping key; Spark's
    UpdatingSessionsExec merges windows with O(1) state per open session
    — the same operator the streaming job uses, so a semantics
    regression would break batch and streaming together."""
    ev = t(spark, sf_dir, "events")
    return (
        ev.groupBy(F.session_window("ts", "30 minutes").alias("w"),
                   "user_id")
        .agg(F.count(F.lit(1)).alias("n_events"),
             dsum("value", "session_value"))
        .select("user_id", F.col("w.start").alias("session_start"),
                F.col("w.end").alias("session_end"),
                "n_events", "session_value")
        .orderBy("user_id", "session_start")
    )


SESSION_WINDOW_SQL = """
WITH gaps AS (
  SELECT user_id, ts, value,
         CASE WHEN COALESCE(epoch_us(ts) - epoch_us(LAG(ts) OVER
              (PARTITION BY user_id ORDER BY ts)),
              0) > 1800000000
              THEN 1 ELSE 0 END AS new_session
  FROM events),
sids AS (
  SELECT *, CAST(SUM(new_session) OVER
         (PARTITION BY user_id ORDER BY ts
          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
           AS sid
  FROM gaps)
SELECT user_id, MIN(ts) AS session_start,
       MAX(ts) + INTERVAL 30 MINUTE AS session_end,
       CAST(COUNT(*) AS BIGINT) AS n_events,
       CAST(CAST(SUM(CAST(value AS DECIMAL(28,4))) AS VARCHAR) AS DOUBLE)
         AS session_value
FROM sids
GROUP BY user_id, sid
ORDER BY user_id, session_start
"""

QUERIES["session_window_rollup"] = session_window_rollup
ORACLES["session_window_rollup"] = SESSION_WINDOW_SQL
