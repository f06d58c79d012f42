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
    """Deterministic per-row shard in [0, n_salt): hash of the full row, so
    it needs no extra column and replays identically."""
    return F.pmod(F.xxhash64(*[F.col(c) for c in df.columns]),
                  F.lit(n_salt)).cast("int")


def salted_join(large: DataFrame, small: DataFrame, on: Sequence[str],
                how: str = "inner", n_salt: int = 16) -> DataFrame:
    """Equi-join where `large` has skewed join keys: join on
    (keys..., salt). Result equals large.join(small, on, how) for
    inner/left joins (small side is replicated, so no row is lost or
    duplicated)."""
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
