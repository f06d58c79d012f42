"""Skew mitigation: salted join / two-phase agg preserve results exactly
and spread the hot key; AQE skew-join stays enabled in the session."""

from pyspark.sql import functions as F

from qucosa_fcrepo_reportingdb_spark.operators.skew import (
    salted_join,
    two_phase_agg,
)


def skewed_df(spark, n=20000, hot_share=0.9):
    hot = int(n * hot_share)
    return spark.range(n).select(
        F.when(F.col("id") < hot, 0)
        .otherwise((F.col("id") % 100) + 1).alias("k"),
        (F.col("id") * 7 % 1000).alias("v"),
    )


def test_salted_join_equals_plain_join(spark):
    large = skewed_df(spark)
    small = spark.range(101).select(
        F.col("id").alias("k"), (F.col("id") * 2).alias("w"))
    plain = large.join(small, ["k"], "inner")
    salted = salted_join(large, small, ["k"], "inner", n_salt=8)
    assert sorted(map(tuple, plain.collect())) \
        == sorted(map(tuple, salted.collect()))


def test_salted_join_left_preserves_unmatched(spark):
    large = skewed_df(spark, n=1000)
    small = spark.range(5).select(F.col("id").alias("k"),
                                  F.lit("x").alias("w"))
    plain = large.join(small, ["k"], "left")
    salted = salted_join(large, small, ["k"], "left", n_salt=4)
    assert sorted(map(tuple, plain.collect())) \
        == sorted(map(tuple, salted.collect()))


def test_two_phase_agg_matches_direct(spark):
    df = skewed_df(spark)
    direct = {tuple(r)[:1]: tuple(r)[1:] for r in
              df.groupBy("k").agg(F.sum("v").alias("sum_v"),
                                  F.count("v").alias("count_v"),
                                  F.min("v").alias("min_v"),
                                  F.max("v").alias("max_v")).collect()}
    two = {tuple(r)[:1]: tuple(r)[1:] for r in
           two_phase_agg(df, ["k"], {"v": "sum"}, n_salt=8)
           .join(two_phase_agg(df, ["k"], {"v": "count"}, n_salt=8), "k")
           .join(two_phase_agg(df, ["k"], {"v": "min"}, n_salt=8), "k")
           .join(two_phase_agg(df, ["k"], {"v": "max"}, n_salt=8), "k")
           .collect()}
    assert direct == two


def test_salt_spreads_hot_key(spark):
    large = skewed_df(spark)
    from qucosa_fcrepo_reportingdb_spark.operators.skew import (
        SALT,
        _content_salt,
    )
    shards = (large.filter(F.col("k") == 0)
              .withColumn(SALT, _content_salt(large, 8))
              .select(SALT).distinct().count())
    assert shards == 8


def test_salted_join_rejects_outer_joins(spark):
    """Right/full-outer through a salted join would emit one
    null-extended row PER SALT REPLICA for an unmatched small-side key —
    reject instead of silently corrupting."""
    import pytest as _pytest

    from qucosa_fcrepo_reportingdb_spark.operators.skew import salted_join

    big = spark.createDataFrame([(1, "a")], "k long, v string")
    small = spark.createDataFrame([(2, "x")], "k long, w string")
    with _pytest.raises(ValueError):
        salted_join(big, small, ["k"], how="full")
    with _pytest.raises(ValueError):
        salted_join(big, small, ["k"], how="right")


def test_content_salt_spreads_identical_rows(spark):
    """Byte-identical rows of a hot key (the common event-data shape)
    must spread across salt shards, not collapse onto one."""
    from qucosa_fcrepo_reportingdb_spark.operators.skew import _content_salt

    df = spark.range(0, 1000).selectExpr("CAST(1 AS LONG) AS k",
                                         "'same' AS v")
    n = df.select(_content_salt(df, 16).alias("s")) \
        .select("s").distinct().count()
    assert n > 4   # identical content, still spread over shards
