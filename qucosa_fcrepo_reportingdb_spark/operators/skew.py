"""Skew mitigation operators.

AQE's skew-join splitting (enabled in session.py) handles most runtime
skew; these explicit forms cover the cases AQE cannot: skewed *aggregation*
keys, and skewed joins where the planner lacks statistics (e.g. freshly
exploded data). Both are pure DataFrame rewrites that preserve results
exactly.

- salted_join: replicate the SMALL side across `n_salt` shards and give
  each large-side row a content-derived shard, so one hot key spreads over
  n_salt tasks instead of one.
- two_phase_agg: partial aggregation under a salt, then final aggregation
  over the partials — the manual form of map-side combine for aggregates
  whose hot group would overflow a single reducer.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

SALT = "__salt"


def _content_salt(df: DataFrame, n_salt: int) -> Column:
    """Per-row shard in [0, n_salt): content hash PLUS the row's physical
    position (partition id + per-partition counter). Content alone
    collapses byte-identical rows — the common shape of a hot key in
    event data — onto ONE shard, paying the full n_salt replication cost
    while spreading nothing. The positional component
    (monotonically_increasing_id) is NONDETERMINISTIC across plan
    changes — it depends on partition count/assignment (AQE, upstream
    coalescing; schemas.py documents the same caveat), so Spark marks
    the stage indeterminate for retry handling. That is acceptable
    precisely because the salt only routes rows to partial groups/join
    partitions: the RESULT of every salted operator is salt-invariant,
    so no layout or retry can change answers — only which reducer did
    the partial work. Callers needing replay-stable routing would derive
    the component from spark_partition_id plus a per-partition key; none
    of the operators here need it."""
    return F.pmod(
        F.xxhash64(*[F.col(c) for c in df.columns],
                   F.monotonically_increasing_id()),
        F.lit(n_salt)).cast("int")


_SALT_SAFE_HOW = {"inner", "left", "leftouter", "left_outer",
                  "left_semi", "leftsemi", "left_anti", "leftanti"}


def salted_join(large: DataFrame, small: DataFrame, on: Sequence[str],
                how: str = "inner", n_salt: int = 16) -> DataFrame:
    """Equi-join where `large` has skewed join keys: join on
    (keys..., salt). Result equals large.join(small, on, how) for
    inner/left-shaped joins (small side is replicated, so no large row
    is lost or duplicated). Right/full-outer are REJECTED: an unmatched
    small-side key would surface once per salt replica — n_salt
    null-extended rows instead of one — a silently wrong result."""
    if how not in _SALT_SAFE_HOW:
        raise ValueError(
            f"salted_join supports {sorted(_SALT_SAFE_HOW)}, got {how!r}: "
            "replicating the small side breaks right/full-outer semantics")
    large_s = large.withColumn(SALT, _content_salt(large, n_salt))
    small_s = small.withColumn(
        SALT, F.explode(F.sequence(F.lit(0), F.lit(n_salt - 1))))
    return (
        large_s.join(small_s, [*on, SALT], how)
        .drop(SALT)
    )


def two_phase_agg(df: DataFrame, keys: Sequence[str],
                  aggs: dict[str, str], n_salt: int = 16) -> DataFrame:
    """Skew-safe aggregation for decomposable aggregates
    (sum/count/min/max): phase 1 aggregates on (keys..., salt); phase 2
    combines the ≤ n_salt partials per key. The hot key's rows spread over
    n_salt reducers in phase 1; phase 2 touches only tiny partials.

    aggs: {column: one of sum|count|min|max} — output column names are
    `<fn>_<col>`."""
    phase1_exprs = []
    phase2_exprs = []
    for col, fn in aggs.items():
        name = f"{fn}_{col}"
        if fn == "count":
            phase1_exprs.append(F.count(col).alias(name))
            phase2_exprs.append(F.sum(name).alias(name))
        elif fn == "sum":
            phase1_exprs.append(F.sum(col).alias(name))
            phase2_exprs.append(F.sum(name).alias(name))
        elif fn == "min":
            phase1_exprs.append(F.min(col).alias(name))
            phase2_exprs.append(F.min(name).alias(name))
        elif fn == "max":
            phase1_exprs.append(F.max(col).alias(name))
            phase2_exprs.append(F.max(name).alias(name))
        else:
            raise ValueError(f"non-decomposable aggregate: {fn}")
    salted = df.withColumn(SALT, _content_salt(df, n_salt))
    partial = salted.groupBy(*keys, SALT).agg(*phase1_exprs)
    return partial.groupBy(*keys).agg(*phase2_exprs)


# ---------------------------------------------------------------------------
# oracle-checked registry entries: the rewrites must EQUAL their plain
# forms, so the oracle is simply the unrewritten SQL — a result-preserving
# proof the pytest equivalence tests can't give (they compare Spark to
# Spark; this compares the rewrite to an independent engine).
# ---------------------------------------------------------------------------
def skew_salted_brand_revenue(spark: "SparkSession", sf_dir: str):
    """Brand revenue via salted_join: lineitem (large, potentially hot
    part keys) joined to part (small, replicated n_salt ways) on
    (partkey, salt). 16x replication of the SMALL side only; the hot
    key's rows spread over 16 tasks. Result identical to the plain
    join — that's what the oracle asserts."""
    from qucosa_fcrepo_reportingdb_spark.plans.common import dsum, t

    large = t(spark, sf_dir, "lineitem").select(
        F.col("l_partkey").alias("partkey"),
        "l_extendedprice", "l_discount")
    small = t(spark, sf_dir, "part").select(
        F.col("p_partkey").alias("partkey"), "p_brand")
    j = salted_join(large, small, ["partkey"])
    return (
        j.groupBy("p_brand")
        .agg(dsum(F.col("l_extendedprice") * (1 - F.col("l_discount")),
                  "revenue"),
             F.count(F.lit(1)).alias("n_items"))
        .orderBy("p_brand")
    )


SKEW_SALTED_SQL = """
SELECT p.p_brand,
       CAST(CAST(SUM(CAST(l.l_extendedprice * (1 - l.l_discount)
                          AS DECIMAL(28,4))) AS VARCHAR) AS DOUBLE)
         AS revenue,
       COUNT(*) AS n_items
FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
GROUP BY p.p_brand
ORDER BY p.p_brand
"""


def skew_two_phase_event_stats(spark: "SparkSession", sf_dir: str):
    """Per-type event stats via two_phase_agg: phase 1 aggregates on
    (event_type, salt) so a hot type spreads over 16 reducers; phase 2
    combines ≤16 partials per type. All aggregates decomposable and
    order-free (count, integer min/max, double min — no float sums), so
    the result is exactly the plain GROUP BY the oracle runs."""
    from qucosa_fcrepo_reportingdb_spark.plans.common import t

    ev = t(spark, sf_dir, "events").select(
        "event_type", "event_id", "value")
    out = two_phase_agg(ev, ["event_type"],
                        {"event_id": "count", "value": "min"})
    return (
        out.select("event_type",
                   F.col("count_event_id").alias("n_events"),
                   F.col("min_value").alias("min_value"))
        .orderBy("event_type")
    )


SKEW_TWO_PHASE_SQL = """
SELECT event_type, CAST(COUNT(event_id) AS BIGINT) AS n_events,
       MIN(value) AS min_value
FROM events
GROUP BY event_type
ORDER BY event_type
"""


QUERIES = {
    "skew_salted_brand_revenue": skew_salted_brand_revenue,
    "skew_two_phase_event_stats": skew_two_phase_event_stats,
}

ORACLES = {
    "skew_salted_brand_revenue": SKEW_SALTED_SQL,
    "skew_two_phase_event_stats": SKEW_TWO_PHASE_SQL,
}
